package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/**
 * Streaming twins of the corpus-prep operators (batch: `d01`/`p01`):
 * documents arrive continuously, get quality-gated (stateless narrow
 * filter) and exactly deduplicated with bounded state.
 *
 * Dedup state is the crux at scale: a naive `dropDuplicates` keeps
 * every key forever. `dropDuplicatesWithinWatermark` drops state once
 * the watermark passes a key's event time — the right contract for
 * crawl ingestion, where re-fetches of the same document cluster in
 * time and a trailing batch dedup pass (d01) catches stragglers.
 */
object CorpusStream {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** First arrival of each text wins; later copies within the
    * watermark horizon are dropped, state expires after it. */
  def dedupStream(docs: Dataset[Doc], watermark: String = "1 hour"): Dataset[Doc] =
    docs.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text")

  /** Stateless quality gate — same predicate as the batch p01 pipeline,
    * usable on a stream because it is a narrow per-row filter. */
  def qualityGate(docs: DataFrame, minTokens: Int = 20,
      maxStopRatio: Double = 0.3): DataFrame =
    docs.filter(
      TextAnalysis.tokenCount(col("text")) >= minTokens &&
        TextAnalysis.stopwordRatio(col("text")) <= maxStopRatio)

  /**
   * Streaming DECONTAMINATION gate — dc01's benchmark-overlap hygiene
   * pass as a stateless ingest filter (the crawl-frontier posture st15
   * argues for images, applied to eval contamination): documents
   * sharing any word `n`-gram with the benchmark set are DROPPED at
   * ingest, before they ever reach storage or dedup state.
   *
   * Shape: `benchSet` is the benchmark's distinct n-gram set collapsed
   * to ONE row (eval suites are model-sized next to the corpus — the
   * same broadcast-the-benchmark rule every batch contamination op
   * here follows); the stream cross-joins that single broadcast row
   * and the overlap test is a row-local `arrays_overlap` against the
   * doc's own n-gram array built by the batch `wordNGrams` expression
   * — so the whole plan is a narrow STATELESS append: no state store,
   * no watermark, nothing held back (spec-asserted). Docs with fewer
   * than `n` words have no n-grams and pass, exactly like batch.
   */
  def contaminationGate(docs: DataFrame, textCol: String,
      benchSet: DataFrame, n: Int): DataFrame =
    docs.crossJoin(broadcast(benchSet))
      .filter(!arrays_overlap(
        TextAnalysis.wordNGrams(col(textCol), n), col("bench_set")))
      .drop("bench_set")

  /**
   * Streaming GRADED contamination scoring — t23's WIMBD-style
   * overlap audit as a stateless per-row annotation at ingest: where
   * [[contaminationGate]] gives the binary drop/keep verdict, this
   * tags every arriving doc (with ≥ n words, like batch) with
   * (n_grams, n_hits, overlap_ppm) — the input to thresholded
   * filtering and per-source contamination dashboards, computed the
   * moment the doc arrives. OCCURRENCES are counted, not distinct
   * grams (the batch `contaminationScore` contract): hits = the
   * row-local count of the doc's own n-gram array elements found in
   * the fixed benchmark set, via the native hashed [[graftshim
   * .SetHitCount]] probe — one HashSet lookup per gram inside
   * codegen, where an `array_contains` HOF lambda would scan the
   * whole set per gram, interpreted (measured 43.6 s → 4.0 s on the
   * sf0.1 sweep entry, the residue being MemoryStream harness
   * constants st18 pays identically). The set ships like a broadcast: once per
   * task, hashed once per executor. ppm = floor(1e6·hits/total),
   * integer end to end. Stateless append: no state store, no
   * watermark (spec-asserted).
   */
  def contaminationScoreStream(docs: DataFrame, idCol: String,
      textCol: String, benchGrams: Seq[String], n: Int): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.wordNGrams(col(textCol), n).as("g"))
      .filter(size(col("g")) > 0)
      .select(col(idCol), size(col("g")).cast("long").as("n_grams"),
        graft.functions.VectorExpressions.setHitCount(col("g"), benchGrams)
          .cast("long").as("n_hits"))
      .select(col(idCol), col("n_grams"), col("n_hits"),
        expr("(n_hits * CAST(1000000 AS BIGINT)) div n_grams")
          .as("overlap_ppm"))

  /** The one-row broadcast side of [[contaminationGate]]: the
    * benchmark's DISTINCT word n-grams as a single set-valued row. */
  def benchmarkNGramSet(benchmark: DataFrame, textCol: String,
      n: Int): DataFrame =
    benchmark
      .select(explode(TextAnalysis.wordNGrams(col(textCol), n)).as("g"))
      .agg(collect_set(col("g")).as("bench_set"))

  /**
   * Streaming LEARNED-quality scoring — t25's distilled classifier
   * applied at ingest (train-offline / score-at-ingest, st08's
   * deployment shape for the CCNet-style document filter): each
   * arriving doc is featurized, L2-normalized and scored ROW-LOCALLY
   * against the frozen weight vector, so the plan is a STATELESS
   * append — no state store, no watermark, and the model is `dim`
   * doubles in the plan itself.
   *
   * Bit-parity with the batch scorer: the featurization IS the same
   * native [[org.apache.spark.sql.graftshim.HashingTfVec]] expression
   * `TextAnalysis.hashingTf` runs — one codegen'd token scan into one
   * mutable dim-array per row (an earlier round folded this through an
   * `aggregate`/`transform` HOF chain: O(tokens × dim) interpreted
   * lambda evals and a fresh dim-array allocation per token, the same
   * bug class the st19 SetHitCount fix killed) — and the normalize →
   * dot → sigmoid chain reuses the identical expressions t25 runs,
   * making stream ≡ batch row-identical (spec-asserted) and the t25
   * DuckDB oracle valid for the drained sink.
   */
  def learnedQualityStream(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double], dim: Int): DataFrame = {
    val v = graft.functions.VectorExpressions.hashingTfVec(col(textCol), dim)
    val nTok = size(split(col(textCol), " "))
    val alphaRatio =
      (length(col(textCol)) - length(regexp_replace(col(textCol), "[A-Za-z ]", "")))
        .cast("double") / length(col(textCol))
    val stopHits = size(filter(split(col(textCol), " "),
      t => t.isin("the", "a", "of", "and", "to", "in", "is", "it")))
    val label = (nTok.between(10, 100000) && alphaRatio >= 0.6 &&
      stopHits >= lit(2)).cast("int").cast("double")
    docs
      .select(col(idCol), label.as("label"), v.as("tf_vec"))
      .withColumn("nrm", sqrt(
        graft.functions.VectorExpressions.dot(col("tf_vec"), col("tf_vec"))))
      .filter(col("nrm") > 0)
      .select(col(idCol), col("label"),
        transform(col("tf_vec"), e => e / col("nrm")).as("v"))
      .select(col(idCol), col("label"),
        // queries.fround's floor(x·1e6 + 0.5)/1e6 inlined — streaming
        // stays independent of the queries package
        (floor((lit(1.0) / (lit(1.0) +
          exp(-graft.functions.VectorExpressions.dot(col("v"),
            typedlit(weights))))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("score"))
  }

  /** Deterministic md5 train/val/test assignment — the p06 buckets,
    * stateless, so the same doc_id lands in the same split whether it
    * arrives on the stream or in a batch backfill. */
  def withSplit(docs: DataFrame): DataFrame = {
    docs.withColumn("split", TextAnalysis.hashSplit(col("doc_id")))
  }

  /**
   * Streaming twin of the p07 capstone: gate → watermarked exact dedup
   * → split assignment → running per-(split) doc/token accounting.
   * Run with OutputMode.Update; state = the dedup keys inside the
   * watermark horizon plus three running-count rows.
   */
  def prepPipeline(docs: Dataset[Doc], watermark: String = "1 hour",
      minTokens: Int = 20, maxStopRatio: Double = 0.3): DataFrame = {
    val gated = qualityGate(docs.toDF(), minTokens, maxStopRatio)
      .as[Doc](docs.encoder)
    withSplit(dedupStream(gated, watermark).toDF())
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"))
  }

  /** One arriving document for [[quotaAdmission]]. */
  /**
   * Streaming LM-perplexity scoring — t29's frozen add-one bigram LM
   * applied at ingest (the CCNet deployment: the LM is a shipped
   * artifact, every arriving doc scored row-locally, so the plan is a
   * STATELESS append — no state store, no watermark). The scorer is
   * ONE native token scan per row
   * ([[org.apache.spark.sql.graftshim.BigramLmScore]]: per-bigram q
   * precomputed at plan build, hot loop = one hash probe per token),
   * the st21/HashingTfVec discipline — never an interpreted HOF fold.
   * Bit-parity with `TextAnalysis.bigramLmScore` over the same slice
   * is spec-asserted, making the batch DuckDB oracle valid for the
   * drained sink. Docs under 2 tokens route out (no bigram evidence),
   * exactly the batch path's `size(w) >= 2`.
   */
  /**
   * Streaming DSIR annotation — t31's frozen λ table applied at ingest
   * (the selection-at-crawl deployment: fit offline on the trusted
   * slice, ship the B-long array, annotate every arriving doc with its
   * importance weight). One native token scan per row
   * ([[org.apache.spark.sql.graftshim.DsirScore]]: md5 bucket probe +
   * λ array index per token), stateless append, no state store. Docs
   * with zero non-empty tokens route out (no evidence — the batch
   * groupBy produces no row for them either), keeping the drained sink
   * hash-valid against the capped t31 oracle.
   */
  def dsirScoringStream(docs: DataFrame, idCol: String, textCol: String,
      lam: Array[Long]): DataFrame =
    docs
      .select(col(idCol),
        graft.functions.VectorExpressions.dsirScore(col(textCol), lam).as("r"))
      .filter(col("r").isNotNull)
      .select(col(idCol), element_at(col("r"), 1).as("n_tokens"),
        element_at(col("r"), 2).as("dsir_unats"))

  /**
   * Ingest-time Gopher gate — the SCALAR rule subset of t30's battery
   * applied as a stateless per-row annotation (flags, not a drop: the
   * storage tier decides, and a rejected doc's flag vector says WHICH
   * rule fired). Shares [[TextAnalysis.gopherScalarFlags]] with the
   * batch audit so ingest and audit can never disagree on thresholds.
   * The repetition family (per-doc n-gram censuses) is deliberately
   * deferred to the batch pass — at ingest the gate must stay one
   * narrow scan per row, no per-doc grouping state.
   */
  def gopherGateStream(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val flags = TextAnalysis.gopherScalarFlags(col(textCol))
    docs.select(col(idCol) +: flags.map { case (nm, c) => c.as(nm) }: _*)
      .withColumn("scalar_pass",
        flags.map(f => col(f._1)).reduce(_ * _).cast("int"))
  }

  /**
   * Ingest-time BOILERPLATE probe — the frozen banned-chunk set
   * (fitted batch-side by `Dedup.boilerplateChunkRemoval`'s census,
   * shipped via `boilerplateBannedFreeze`) applied to every arriving
   * document as a stateless annotation: `[n_chunks, n_banned]` in one
   * native scan (`ChunkHashHits` — boundary walk + one MD5 per chunk
   * + binary-search probe, zero interpreted HOFs). Annotate, don't
   * rewrite: the removal pass stays batch-side where the census
   * lives; ingest only needs to know HOW MUCH of a doc is boilerplate
   * to route it.
   */
  def boilerplateGateStream(docs: DataFrame, idCol: String, textCol: String,
      banned: Array[Long], w: Int = 10): DataFrame =
    docs
      .select(col(idCol),
        graft.functions.VectorExpressions
          .chunkHashHits(col(textCol), w, banned).as("r"))
      .select(col(idCol), element_at(col("r"), 1).as("n_chunks"),
        element_at(col("r"), 2).as("n_banned"))

  def lmScoringStream(docs: DataFrame, idCol: String, textCol: String,
      lm: TextAnalysis.FrozenBigramLm): DataFrame =
    docs
      .filter(size(split(col(textCol), " ")) >= 2)
      .select(col(idCol),
        graft.functions.VectorExpressions.bigramLmScore(col(textCol), lm)
          .as("r"))
      .select(col(idCol), element_at(col("r"), 1).as("n_bigrams"),
        element_at(col("r"), 2).as("nll_unats"))

  /** st29's stateless KN scoring — [[lmScoringStream]]'s twin under
    * the Kneser-Ney model (the KenLM/CCNet production smoothing). */
  def knScoringStream(docs: DataFrame, idCol: String, textCol: String,
      lm: TextAnalysis.KnFrozenLm): DataFrame =
    docs
      .filter(size(split(col(textCol), " ")) >= 2)
      .select(col(idCol),
        graft.functions.VectorExpressions.knLmScore(col(textCol), lm).as("r"))
      .select(col(idCol), element_at(col("r"), 1).as("n_bigrams"),
        element_at(col("r"), 2).as("kn_nll_unats"))

  /** st30's stateless TRIGRAM KN scoring — [[knScoringStream]] at
    * KenLM's minimum production order: the frozen trigram model
    * (t34's fit) applied per arriving document in one native token
    * scan, two map probes + ln per trigram. Stateless append; the
    * model rides the closure exactly like every frozen twin. */
  def kn3ScoringStream(docs: DataFrame, idCol: String, textCol: String,
      lm: TextAnalysis.Kn3FrozenLm): DataFrame =
    docs
      .filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol),
        graft.functions.VectorExpressions.kn3LmScore(col(textCol), lm).as("r"))
      .select(col(idCol), element_at(col("r"), 1).as("n_trigrams"),
        element_at(col("r"), 2).as("kn3_nll_unats"))

  /** One arriving document for [[packingStream]] (token count only —
    * the writer packs token BUDGETS; text stays with the writer task). */
  final case class PackInDoc(doc_id: Long, source: String, n_tokens: Long)

  /** Per-sub-shard packing state: the running token offset — ONE long
    * per (source, bucket) however many documents stream through. */
  final case class PackState(off: Long)

  final case class PackedChunk(source: String, bucket: Int, doc_id: Long,
      n_tokens: Long, first_chunk: Long, last_chunk: Long)

  /**
   * STREAMING sequence packing — `Packing.packChunks` at ingest: each
   * (source, hash-bucket) sub-shard carries its running token offset
   * as `flatMapGroupsWithState` state (one long per sub-shard) and
   * assigns every arriving document its chunk span
   * [⌊off/budget⌋, ⌊(off+n−1)/budget⌋] — the writer-side packing a
   * streaming ingestion pipeline runs so causal-LM chunks close as
   * data lands instead of waiting for a batch repack. Documents sort
   * by doc_id WITHIN each microbatch group; with an id-ordered feed
   * (the append-log contract every st harness replays) the drained
   * assignment is BIT-IDENTICAL to the batch window cumsum — spec'd,
   * and the oracle replays p05's SQL under the cap. State is
   * sub-shard-count-sized (sources × buckets longs), the smallest
   * state of any stateful stream here.
   */
  def packingStream(docs: Dataset[PackInDoc], budget: Int,
      buckets: Int): Dataset[PackedChunk] = {
    require(budget > 0 && buckets > 0, s"budget=$budget buckets=$buckets")
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val outEnc = org.apache.spark.sql.Encoders.product[PackedChunk]
    implicit val stEnc = org.apache.spark.sql.Encoders.product[PackState]
    implicit val keyEnc =
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaInt)
    docs.groupByKey(d =>
        (d.source, graft.ops.Packing.shardBucketLocal(d.doc_id, buckets)))
      .flatMapGroupsWithState[PackState, PackedChunk](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((source, bucket), it, state) =>
          var off = if (state.exists) state.get.off else 0L
          val out = Seq.newBuilder[PackedChunk]
          for (d <- it.toArray.sortBy(_.doc_id)) {
            out += PackedChunk(source, bucket, d.doc_id, d.n_tokens,
              off / budget, (off + d.n_tokens - 1) / budget)
            off += d.n_tokens
          }
          state.update(PackState(off))
          out.result().iterator
      }
  }

  final case class SourcedDoc(doc_id: Long, source: String)

  /** Per-source admission counter — [[quotaAdmission]]'s WHOLE state:
    * one int per source, regardless of stream volume. */
  final case class QuotaState(admitted: Int)

  /** An admitted document. */
  final case class AdmittedDoc(doc_id: Long, source: String)

  /**
   * Streaming per-source QUOTA ADMISSION — the online twin of p04's
   * corpus quotas, enforced AT INGEST (the crawl-frontier posture:
   * once a source has contributed its cap, later fetches are dropped
   * before they cost storage or dedup state; p04 then picks the
   * weighted mix offline). Admission is FIRST-`quota`-BY-ARRIVAL:
   * `flatMapGroupsWithState` keyed by source admits each arriving doc
   * while the source's counter is below its cap, where p04 ranks by
   * hash — the two are complementary (online admission control vs.
   * offline mix selection). Within a micro-batch the group's slice is
   * ordered by doc_id before admitting (the harness feeds id-ordered
   * batches, so this IS arrival order — and it makes the operator
   * deterministic under shuffle-order nondeterminism, the d02 rule).
   *
   * State per source: ONE integer, never expiring (quotas are
   * lifetime caps; a windowed variant would add a timeout) — the
   * minimal-state end of the streaming family's spectrum. The quota
   * table rides in the closure (model-sized, like st08's GP and
   * st21's weights). Unknown sources admit up to `defaultQuota`.
   */
  def quotaAdmission(docs: Dataset[SourcedDoc], quotas: Map[String, Int],
      defaultQuota: Int): Dataset[AdmittedDoc] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val outEnc = org.apache.spark.sql.Encoders.product[AdmittedDoc]
    implicit val stEnc = org.apache.spark.sql.Encoders.product[QuotaState]
    implicit val keyEnc = org.apache.spark.sql.Encoders.STRING
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[QuotaState, AdmittedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source, it, state) =>
          val cap = quotas.getOrElse(source, defaultQuota)
          var n = if (state.exists) state.get.admitted else 0
          val out = Seq.newBuilder[AdmittedDoc]
          for (d <- it.toArray.sortBy(_.doc_id) if n < cap) {
            n += 1
            out += AdmittedDoc(d.doc_id, d.source)
          }
          state.update(QuotaState(n))
          out.result().iterator
      }
  }
}
