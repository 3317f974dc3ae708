package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for LLM training-data pipelines.
 *
 * Everything here is built from `org.apache.spark.sql.functions` column
 * expressions (no UDFs on the hot path) so plans stay inside Tungsten
 * and scale linearly with no shuffle: each feature is a narrow map over
 * the `text` column.
 */
object TextAnalysis {

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /**
   * THE deterministic train/val/test rule (p06's contract, shared by
   * every batch and streaming consumer — d15's leakage audit computes
   * it directly on candidate-pair ids, so the thresholds must never
   * drift between call sites): md5 of the decimal id, first two hex
   * chars as a 256-way bucket; < 'cd' (204) train ~80%, < 'e6' (230)
   * val ~10%, rest test. Pure hash arithmetic — no rand, no shuffle,
   * reproducible at any scale in any engine.
   */
  def hashSplit(id: Column): Column = {
    val bucket = substring(md5(id.cast("string").cast("binary")), 1, 2)
    when(bucket < "cd", "train").when(bucket < "e6", "val").otherwise("test")
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Ratio of stopword tokens to all tokens (0 when empty). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(StopWords: _*))
    when(size(toks) === 0, lit(0.0)).otherwise(size(stops).cast("double") / size(toks))
  }

  /** Ratio of non-alphanumeric, non-space characters to all characters. */
  def punctRatio(text: Column): Column = {
    val cleaned = regexp_replace(text, "[A-Za-z0-9\\s]", "")
    when(length(text) === 0, lit(0.0))
      .otherwise(length(cleaned).cast("double") / length(text))
  }

  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, " ", "")).cast("double") / size(toks))
  }

  /**
   * 62-bit order-sensitive document fingerprint: two independent
   * polynomial rolling hashes modulo Mersenne-ish primes, packed into
   * one long. Modular form keeps every intermediate < 2^52, so it is
   * safe under ANSI arithmetic (a plain wrapping `acc*k ^ h` would
   * throw ARITHMETIC_OVERFLOW on Spark 4). One NATIVE byte scan
   * ([[org.apache.spark.sql.graftshim.Fingerprint62]] — earlier
   * rounds folded this through an `aggregate` HOF: one interpreted
   * lambda step and a fresh two-field struct per token); identical
   * token sequences — and only those — collide (w.h.p.).
   */
  def fingerprint(text: Column): Column =
    graft.functions.VectorExpressions.fingerprint62(text)

  /** Word n-grams (as space-joined strings) of a text column — one
    * native byte scan per row ([[graftshim.WordNGrams]]; the previous
    * `transform(sequence(...))` HOF re-ran `split(text)` inside the
    * interpreted lambda for every element of every n-gram). */
  def wordNGrams(text: Column, n: Int): Column =
    graft.functions.VectorExpressions.wordNGrams(text, n)

  /**
   * Character n-gram language identification.
   *
   * Trains per-language trigram profiles from a labeled corpus (one
   * aggregation, top-`profileSize` trigrams each, broadcast via a join
   * on the exploded trigram), then scores each document by the number of
   * profile hits per language. Output: doc_id, predicted, actual.
   *
   * Scale: the profile is O(langs × profileSize) — broadcast; documents
   * stream through one explode + aggregation keyed by doc_id.
   */
  def langId(docs: DataFrame, profileSize: Int = 300,
      profileSampleMod: Int = 10): DataFrame = {
    // Trigrams come from explode(sequence) + substring with column
    // args — codegen'd, unlike HOF lambdas.
    val positions = when(length(col("text")) >= 3,
      sequence(lit(1), length(col("text")) - 2)).otherwise(array().cast("array<int>"))
    def grams(d: DataFrame) = d
      .select(col("doc_id"), col("lang"), col("text"), explode(positions).as("pos"))
      .select(col("doc_id"), col("lang"),
        expr("substring(text, pos, 3)").as("gram"))
    // Profiles train on a deterministic 1/profileSampleMod sample — at
    // corpus scale you never profile every document; the sample subtree
    // reads a fraction of the data instead of recomputing the full
    // gram pipeline a second time. Weights are per-language gram
    // FREQUENCIES (count / language total): raw counts would make every
    // document score highest for whichever language has the most
    // training text (majority-class collapse).
    val langWindow = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    val profiles = grams(docs.filter(pmod(col("doc_id"), lit(profileSampleMod)) === 0))
      .groupBy("lang", "gram").agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("weight", col("cnt") / sum("cnt").over(langWindow))
      .withColumn("rnk", row_number().over(
        langWindow.orderBy(col("weight").desc, col("gram"))))
      .filter(col("rnk") <= profileSize)
      .select(col("lang").as("profile_lang"), col("gram"), col("weight"))
    // Scoring: the trained profile is model-sized (langs × profileSize)
    // — collect it once, broadcast it, and classify each document in a
    // single narrow pass (trigram hash-lookup + per-language
    // accumulator, argmax with smallest-language tie-break). No explode,
    // no join, no shuffle of per-gram rows: at corpus scale this is one
    // map over the documents, the same shape as GP model prediction.
    // (The exploded-join variant shuffles every gram occurrence and
    // measured 3× slower at sf0.1.)
    //
    // Weights are quantized to integer picounits before scoring: the
    // double weights are bit-identical across engines (exact integer
    // ratios) so the quantization is too, and LONG sums are exact in
    // any order — the argmax can never flip on a floating-point
    // near-tie between this pass and the oracle's re-aggregation.
    val profRows = profiles.collect()
    val langs: Array[String] = profRows.map(_.getString(0)).distinct.sorted
    val table = new java.util.HashMap[String, Array[Long]]()
    profRows.foreach { r =>
      table.computeIfAbsent(r.getString(1), _ => new Array[Long](langs.length))(
        java.util.Arrays.binarySearch(langs.asInstanceOf[Array[AnyRef]], r.getString(0))) =
        math.floor(r.getDouble(2) * 1e12 + 0.5).toLong
    }
    val bc = docs.sparkSession.sparkContext.broadcast((table, langs))
    val predictUdf = udf { (text: String) =>
      val (tbl, ls) = bc.value
      val scores = new Array[Long](ls.length)
      val n = if (text == null) 0 else text.length
      var i = 0
      while (i + 3 <= n) {
        val w = tbl.get(text.substring(i, i + 3))
        if (w != null) {
          var j = 0
          while (j < w.length) { scores(j) += w(j); j += 1 }
        }
        i += 1
      }
      var best = -1
      var bestS = 0L
      var j = 0
      while (j < scores.length) {
        if (scores(j) > bestS) { best = j; bestS = scores(j) }
        j += 1
      }
      if (best < 0) null else ls(best)
    }
    docs
      .select(col("doc_id"), predictUdf(col("text")).as("predicted"), col("lang").as("actual"))
      .filter(col("predicted").isNotNull)
  }

  /** Character n-grams of a text column. */
  def charNGrams(text: Column, n: Int): Column = {
    val count = length(text) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), count), i => text.substr(i, lit(n))))
  }

  /**
   * Benchmark decontamination: ids of corpus documents sharing any word
   * n-gram with the benchmark set — the standard pretraining hygiene
   * pass (training text overlapping an eval suite inflates its score,
   * so overlapping documents are dropped).
   *
   * Scale posture: eval benchmarks are tiny next to the corpus, so the
   * benchmark's DISTINCT n-gram set is model-sized and BROADCAST; the
   * corpus side is one narrow explode pass (doc_id + n-gram only, the
   * n-gram built by codegen'd slice/concat, not an interpreted HOF)
   * into a broadcast LEFT-SEMI probe — the corpus never shuffles, only
   * the surviving contaminated ids do (for the distinct).
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    def ngrams(df: DataFrame, keep: Column*): DataFrame = {
      val positions = when(size(col("w")) >= n, sequence(lit(1), size(col("w")) - (n - 1)))
        .otherwise(array().cast("array<int>"))
      df.select(keep :+ tokens(col(textCol)).as("w"): _*)
        .select(keep :+ explode(positions).as("pos") :+ col("w"): _*)
        .select(keep :+ concat_ws(" ", slice(col("w"), col("pos"), lit(n))).as("ngram"): _*)
    }
    val benchGrams = ngrams(benchmark).select("ngram").distinct()
    ngrams(corpus, col(idCol))
      .join(broadcast(benchGrams), Seq("ngram"), "left_semi")
      .select(idCol).distinct()
  }

  /**
   * GRADED contamination: where `decontaminate` gives the binary
   * remove/keep verdict, this scores every corpus doc by the FRACTION
   * of its word n-gram occurrences found in the benchmark set (the
   * WIMBD-style overlap audit — "how contaminated", feeding thresholded
   * filtering or per-source contamination reports). Output one row per
   * corpus doc with ≥ n words: (id, n_grams, n_hits, overlap_ppm) with
   * overlap_ppm = floor(1e6 · hits / total) — integer end to end.
   *
   * 100 TB posture: identical to `decontaminate` — the benchmark n-gram
   * set is model-sized and broadcast, the corpus side is one narrow
   * explode, and the only shuffle is the per-doc count keyed by id
   * (map-side combinable). Occurrences, not distinct grams, are
   * counted, so no (id, ngram)-wide distinct shuffle exists.
   */
  def contaminationScore(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def ngrams(df: DataFrame, keep: Column*): DataFrame = {
      val positions = when(size(col("w")) >= n, sequence(lit(1), size(col("w")) - (n - 1)))
        .otherwise(array().cast("array<int>"))
      df.select(keep :+ tokens(col(textCol)).as("w"): _*)
        .select(keep :+ explode(positions).as("pos") :+ col("w"): _*)
        .select(keep :+ concat_ws(" ", slice(col("w"), col("pos"), lit(n))).as("ngram"): _*)
    }
    val benchGrams = ngrams(benchmark).select("ngram").distinct()
      .withColumn("__hit", lit(1))
    ngrams(corpus, col(idCol))
      .join(broadcast(benchGrams), Seq("ngram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
      .select(col(idCol), col("n_grams"), col("n_hits"),
        expr("(n_hits * CAST(1000000 AS BIGINT)) div n_grams").as("overlap_ppm"))
  }

  /**
   * Signed hashing-trick TF featurizer (Weinberger et al. 2009 feature
   * hashing — the text→vector stage the ANN/semantic-dedup queries
   * otherwise consume pre-computed): each whitespace token lands in
   * bucket md5_52("tfb:" ⧺ tok) mod `dim` carrying sign ± from
   * md5_52("tfs:" ⧺ tok) mod 2, and a document's vector is the
   * per-bucket SIGNED token count. The ± construction keeps the
   * hashed dot product an unbiased estimator of the true TF dot
   * product (the property that makes downstream cosine meaningful);
   * every entry is an exact small integer, so a DuckDB oracle replays
   * the featurization bit-for-bit — no floats until a consumer
   * divides.
   *
   * Scale shape: ONE narrow per-row pass — the native codegen'd
   * [[org.apache.spark.sql.graftshim.HashingTfVec]] expression folds
   * the whole token scan into one mutable dim-array (no explode, no
   * shuffle, no vocabulary, no fit, nothing broadcast; earlier rounds
   * ran this as explode → two keyed aggregates, which shuffled a
   * (doc, bucket, count) cell per distinct bucket — correct but two
   * exchanges where zero are needed). Token-free documents (empty or
   * all-space text, like null text) produce NO row, matching the
   * explode semantics this formulation replaced.
   * Output: (idCol, tf_vec: array<double> of integral values).
   */
  def hashingTf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 1, s"hashingTf: dim must be >= 1 (got $dim)")
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        graft.functions.VectorExpressions.hashingTfVec(col(textCol), dim)
          .as("tf_vec"))
  }

  /**
   * Gopher-style within-document repetition signals (Rae et al. 2021,
   * "Scaling Language Models", Table A1) as exact integer ppm:
   *
   *  - `top2_ppm` / `top3_ppm` — characters covered by the single
   *    most-covering word 2-gram / 3-gram, over total characters. A
   *    looping or templated document concentrates a large character
   *    mass in one short phrase; Gopher gates at 20% / 18%.
   *  - `dup5_ppm` — characters covered by ALL word 5-grams occurring
   *    more than once (count × gram length summed over duplicated
   *    grams), over total characters; Gopher's "duplicate n-gram"
   *    family. Overlapping occurrences are counted per occurrence
   *    (the count-based form), so the ratio can exceed 1e6 on
   *    pathologically repetitive text — it is a score, not a
   *    probability.
   *
   * Complements [[graft.queries.CorpusOps]]'s t15 (distinct/total
   * trigram ratio): t15 measures how much of the document is repeated
   * AT ALL; these measure how much character mass the WORST offenders
   * carry. Every quantity is integer end to end — cover = count ×
   * length(gram) in characters, ppm = cover · 1e6 div length(text) —
   * so the aggregation order cannot move a hash and any engine
   * reproduces the numbers exactly.
   *
   * Scale shape: one positional-explode pass per n (narrow, no token
   * shuffle — the t15/t04 shape) into a (doc, gram) count aggregate
   * and a per-doc max/sum, all map-side combinable; the three
   * family frames join back to the doc spine on the id key. Docs too
   * short for a family score 0 via the left joins, not a filter.
   */
  def ngramCoverage(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(
      docs.filter(length(col(textCol)) > 0)
        .select(col(idCol), split(col(textCol), " ").as("w"),
          length(col(textCol)).cast("long").as("n_chars")))
    def gramCounts(n: Int): DataFrame = base
      .where(size(col("w")) >= n)
      .select(col(idCol), col("w"),
        explode(sequence(lit(1), size(col("w")) - (n - 1))).as("i"))
      .select(col(idCol), concat_ws(" ",
        (0 until n).map(j => element_at(col("w"), col("i") + j)): _*).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
    def topCover(n: Int, out: String): DataFrame = gramCounts(n)
      .groupBy(col(idCol))
      .agg(max(col("cnt") * length(col("g")).cast("long")).as(out))
    val dup5 = gramCounts(5)
      .where(col("cnt") >= 2)
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * length(col("g")).cast("long")).as("c5"))
    base.select(col(idCol), col("n_chars"))
      .join(topCover(2, "c2"), Seq(idCol), "left")
      .join(topCover(3, "c3"), Seq(idCol), "left")
      .join(dup5, Seq(idCol), "left")
      .select(col(idCol),
        expr("coalesce(c2, 0L) * 1000000L div n_chars").as("top2_ppm"),
        expr("coalesce(c3, 0L) * 1000000L div n_chars").as("top3_ppm"),
        expr("coalesce(c5, 0L) * 1000000L div n_chars").as("dup5_ppm"))
  }

  /**
   * Exact Mann–Whitney AUC as one integer census row — the
   * threshold-free ranking metric every learned-filter evaluation
   * reports, computed WITHOUT a per-pair join: counts group by the
   * (already-quantized) score FIRST, so with scores on the 1e-6 grid
   * in [0, 1] the rank window runs over ≤ 1e6+1 distinct values
   * however large the scored set — bounded at any corpus size — and
   * ties weight half via U×2 = Σ_s p_s·(2·cum_neg_below(s) + g_s),
   * all exact longs. Returns (n_test, n_pos, auc_ppm) with auc_ppm =
   * U×2 · 1e6 div (2·n_pos·n_neg), NULL when a class is absent.
   * `labelCol` must be 0/1 (numeric).
   */
  def aucPpm(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val byScore = scored.groupBy(scoreCol)
      .agg(sum(col(labelCol).cast("double")).cast("long").as("p"),
        sum(lit(1.0) - col(labelCol).cast("double")).cast("long").as("g"))
    val cum = org.apache.spark.sql.expressions.Window
      .orderBy(scoreCol).rowsBetween(Long.MinValue, -1)
    byScore
      .select(col("p"), col("g"),
        coalesce(sum(col("g")).over(cum), lit(0L)).as("cn"))
      .agg(sum(col("p")).as("np"), sum(col("g")).as("ng"),
        sum(col("p") * (lit(2L) * col("cn") + col("g"))).as("u2"))
      .select((col("np") + col("ng")).as("n_test"), col("np").as("n_pos"),
        expr("CASE WHEN np * ng = 0 THEN NULL " +
          "ELSE u2 * CAST(1000000 AS BIGINT) div (2 * np * ng) END")
          .as("auc_ppm"))
  }

  /** Email-address pattern, identical under Java regex and RE2 (plain
    * character classes, no backreferences). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"

  /** ID-like digit-run pattern (4+ digits: phone fragments, SSN/account
    * numbers, zip+4 — the usual scrub-list denominator). */
  val DigitRunPattern = "[0-9][0-9][0-9][0-9]+"

  /** Text with PII spans masked: emails → `<EMAIL>`, 4+-digit runs →
    * `<NUM>`. Pure codegen'd `regexp_replace` — one narrow pass, no
    * UDF; patterns are RE2-compatible so a DuckDB oracle replays them
    * exactly (`regexp_replace(..., 'g')`). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      DigitRunPattern, "<NUM>")

  /** Number of PII spans [[redactPii]] would mask: emails in the
    * original text, plus digit runs AFTER email masking (a digit run
    * inside an email is one email redaction, not two spans). */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        lit(DigitRunPattern), lit(0)))).cast("int")

  /**
   * Fixed-step, quantized logistic-regression fit — the learned
   * document-filter shape every curation pipeline runs (CCNet trains a
   * linear model over hashed text features to score crawl documents,
   * Wenzek et al. 2019; GPT-3's quality classifier is the same idea,
   * Brown et al. 2020 App. A) under `GPCore.gdHyperFit`'s
   * unrolled-oracle discipline: `steps` full-batch GD iterations on
   * MEAN logistic loss, the aggregated per-dimension mean gradient
   * snapped to the 1e-6 grid before each update and the updated weight
   * re-snapped, so a SQL oracle replaying the same closed forms lands
   * on bit-identical weights. Mean (not summed) gradients make the
   * step size corpus-size-invariant — the same `lr` learns at every
   * SF. Returns the weight trajectory w0..w_steps (w0 = 0, so step 1's
   * probabilities are exactly 0.5 — the first gradient is pure
   * rational arithmetic in any engine).
   *
   * Scale shape: `steps` map-side-combinable treeAggregate passes over
   * a feature frame the caller should wrap in
   * [[org.apache.spark.sql.graftshim.InternalFrame.sharedScan]] (one
   * featurization, steps+1 consumers); per pass the model (dim
   * doubles) broadcasts out and ONE dim-vector per partition comes
   * back — no shuffle touches the corpus. The fit is O(steps) scans at
   * 100 TB and the trajectory is driver-sized.
   */
  def logisticFitGd(feats: DataFrame, vecCol: String, labelCol: String,
      dim: Int, steps: Int, lr: Double): Seq[Array[Double]] = {
    require(dim >= 1 && steps >= 0 && lr > 0,
      s"logisticFitGd: bad dim=$dim steps=$steps lr=$lr")
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = feats
      .select(col(vecCol).cast("array<double>"), col(labelCol).cast("double"))
      .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val n = rows.count().toDouble
    require(n > 0, "logisticFitGd: empty feature frame")
    var w = Array.fill(dim)(0.0)
    val traj = scala.collection.mutable.ArrayBuffer(w.clone())
    for (_ <- 1 to steps) {
      val bw = w
      val g = rows.treeAggregate(Array.fill(dim)(0.0))(
        seqOp = { case (acc, (x, y)) =>
          var m = 0.0
          var j = 0
          while (j < dim) { m += bw(j) * x(j); j += 1 }
          val p = 1.0 / (1.0 + math.exp(-m))
          j = 0
          while (j < dim) { acc(j) += x(j) * (p - y); j += 1 }
          acc
        },
        combOp = { (a, b) =>
          var j = 0; while (j < dim) { a(j) += b(j); j += 1 }; a
        },
        depth = 2)
      w = Array.tabulate(dim)(j => q6(w(j) - lr * q6(g(j) / n)))
      traj += w.clone()
    }
    traj.toSeq
  }

  /**
   * Frozen add-one bigram language model — the CCNet quality-filter
   * shape (Wenzek et al. 2020: score every document by its perplexity
   * under a small LM trained on a trusted reference slice; keep the
   * low-perplexity head). The model is THREE model-sized frames, each
   * bounded by the `minCount` vocabulary cap rather than by corpus
   * size — the knob that keeps it broadcastable at 100 TB, where the
   * reference slice is a fixed curated artifact anyway:
   *   vocab(tok)        — words with reference count >= minCount
   *   pair(m1, m2, c2)  — bigram counts over the VOCAB-MAPPED stream
   *                       (OOV -> "<unk>"), <= |V|^2 rows
   *   hist(m1, c1)      — history counts, derived c1 = SUM_w2 c2(m1,w2)
   *                       so P(w2|w1) = (c2+1)/(c1+V) is self-consistent
   *   vsz(v)            — |V| + 1 (the <unk> row), kept IN-PLAN so the
   *                       fit is one job with zero driver round-trips
   * Bigrams never cross a document boundary (positional pairs from the
   * per-doc token array — t15's narrow explode shape, no token shuffle;
   * the only exchanges aggregate model-sized count frames).
   */
  final case class BigramLm(vocab: DataFrame, hist: DataFrame,
      pair: DataFrame, vsz: DataFrame)

  /** Adjacent vocab-mapped token pairs of `textCol`, one row per bigram,
    * carrying `keep` extra columns; docs under 2 tokens drop (they carry
    * no bigram evidence). Assembly is narrow; mapping is two broadcast
    * left joins against the model-sized vocab. */
  private def mappedPairs(docs: DataFrame, textCol: String,
      keep: Seq[Column], vocab: DataFrame): DataFrame = {
    val unk = lit("<unk>")
    docs
      .select(keep :+ tokens(col(textCol)).as("w"): _*)
      .where(size(col("w")) >= 2)
      .select(keep :+ col("w") :+
        explode(sequence(lit(1), size(col("w")) - 1)).as("i"): _*)
      .select(keep :+ element_at(col("w"), col("i")).as("t1") :+
        element_at(col("w"), col("i") + 1).as("t2"): _*)
      .join(broadcast(vocab.select(col("tok").as("t1"), lit(1).as("iv1"))),
        Seq("t1"), "left")
      .join(broadcast(vocab.select(col("tok").as("t2"), lit(1).as("iv2"))),
        Seq("t2"), "left")
      .select(keep :+ when(col("iv1") === 1, col("t1")).otherwise(unk).as("m1")
        :+ when(col("iv2") === 1, col("t2")).otherwise(unk).as("m2"): _*)
  }

  /** Fit the bigram LM on a reference frame (pass the quality-gated
    * slice; determinism needs no sampling — the gate IS the slice).
    *
    * Deliberately NOT sharedScan-pinned: an r13 experiment pinned the
    * vocab/pair frames to save the repeated reference-slice census,
    * and the 10× sweep promptly reproduced the l16 failure mode — in
    * THESE queries the "reference slice" is the gate survivors of the
    * whole corpus, so the pinned frames grow with SF (the sf1 sweep
    * read +200 s concentrated in the alphabetically-later x-family,
    * the same block-manager starvation l16 caused). Within one query
    * Spark's ReuseExchange already dedups the identical census
    * subtrees at runtime; a production deployment with a FIXED
    * curated slice should fit once, [[bigramLmFreeze]], and ship the
    * arrays — the frozen path never re-scans anything. */
  def bigramLmFit(ref: DataFrame, textCol: String, minCount: Int = 5): BigramLm = {
    require(minCount >= 1, s"bigramLmFit: minCount=$minCount")
    val vocab = ref
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select("tok")
    val pair = mappedPairs(ref, textCol, Seq.empty, vocab)
      .groupBy("m1", "m2").agg(count(lit(1)).as("c2"))
    val hist = pair.groupBy("m1").agg(sum("c2").as("c1"))
    val vsz = vocab.agg((count(lit(1)) + 1).as("v"))
    BigramLm(vocab, hist, pair, vsz)
  }

  /**
   * Score documents under the frozen LM: per bigram,
   * `q = floor(ln((c2+1)/(c1+V)) * 1e6 + 0.5)` (always <= 0 — the
   * smoothed probability never exceeds 1 because c2 <= c1 and V >= 1,
   * so the final integer division is engine-portable), then
   * `nll_unats = (-SUM q) div n_bigrams` — average negative log
   * likelihood in micro-nats per bigram, exact in any fold order
   * (t17's quantize-before-sum discipline; perplexity = e^(nll/1e6)
   * for human eyes, kept off the hash surface). Corpus side is ONE
   * narrow pipeline (pair assembly + three broadcast probes) into one
   * map-side-combinable per-doc aggregate — no shuffle ever carries
   * text or tokens, so the scan scales linearly to 100 TB while the
   * model rides the broadcast plane.
   */
  /** The frozen LM as plain arrays — the deployed-artifact form the
    * native row-local scorer consumes (see graftshim.BigramLmScore for
    * the layout: `terms(i)` has id i+1, id 0 = <unk>). */
  final case class FrozenBigramLm(terms: Array[String], hist: Array[Long],
      pairKeys: Array[Long], pairCounts: Array[Long], vSize: Long)

  /**
   * Collect the model frames to driver arrays (model-sized by the
   * minCount cap — the score-at-ingest deployment ships exactly this
   * artifact). A literal `"<unk>"` TOKEN in the reference text is
   * indistinguishable from the OOV symbol after mapping (both engines
   * merge them in string space), so it is excluded from `terms` and
   * folds onto id 0 — keeping the frozen scorer bit-parity with the
   * broadcast-join path. V is taken from the BATCH fit's `vsz` frame,
   * NOT re-derived as `terms.length + 1`: when the literal token
   * "<unk>" itself passes the minCount gate the batch V counts it as
   * a vocab entry while `terms` folds it away, and a recomputed V
   * would silently shift every smoothed denominator off the batch
   * scorer by one (stream ≡ batch parity is spec'd on exactly this
   * corpus).
   */
  def bigramLmFreeze(lm: BigramLm): FrozenBigramLm = {
    val terms = lm.vocab.filter(col("tok") =!= "<unk>").orderBy("tok")
      .collect().map(_.getString(0))
    val id = terms.iterator.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val v = lm.vsz.head.getLong(0)
    val hist = new Array[Long](terms.length + 1)
    lm.hist.collect().foreach { r =>
      hist(id.getOrElse(r.getString(0), 0)) += r.getLong(1) }
    val pairs = lm.pair.collect()
      .map { r => (id.getOrElse(r.getString(0), 0).toLong * v +
        id.getOrElse(r.getString(1), 0), r.getLong(2)) }
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      .toArray.sortBy(_._1)
    FrozenBigramLm(terms, hist, pairs.map(_._1), pairs.map(_._2), v)
  }

  /**
   * INTERPOLATED KNESER-NEY bigram scoring (Kneser & Ney 1995; Chen &
   * Goodman 1999's interpolated form) — the smoothing KenLM ships and
   * CCNet's production filter actually runs, upgrading t29's add-one
   * baseline: P(w2|w1) = max(c2 − D, 0)/c1 + D·N1+(w1·)/c1 · Pcont(w2),
   * with the continuation distribution Pcont(w2) ∝ how many DISTINCT
   * contexts w2 follows (the "San Francisco" insight: frequent-but-
   * bound words score low as continuations). D = 3/4 exactly, so with
   * add-one smoothing on Pcont every probability is ONE exact integer
   * ratio:
   *
   *   c1 > 0:  num = max(4·c2−3, 0)·(ct+V) + 3·n1·(cont2+1)
   *            den = 4·c1·(ct+V)
   *   c1 = 0:  num = cont2+1, den = ct+V      (pure continuation)
   *
   * (ct = distinct bigram types, V = |vocab|+1, n1 = distinct
   * continuations of w1, cont2 = distinct contexts of w2). P ≤ 1
   * always (n1 ≤ c1−c2+1 gives P ≤ (0.25·c2 + 0.75·c1)/c1), so
   * q = ⌊ln(num/den)·1e6⌉ ≤ 0 and the per-doc fold matches t29's sign
   * discipline. num/den stay exact in doubles up to ~2^53 — beyond
   * the reference-slice scale by construction (the model is fitted on
   * the gated slice, not the corpus); all four model frames ride the
   * broadcast plane, the corpus scan is t29's narrow pipeline.
   */
  def knBigramScore(docs: DataFrame, idCol: String, textCol: String,
      lm: BigramLm): DataFrame = {
    val n1 = lm.pair.groupBy("m1").agg(count(lit(1)).as("n1"))
    val cont = lm.pair.groupBy("m2").agg(count(lit(1)).as("cont"))
    val ctot = lm.pair.agg(count(lit(1)).as("ct"))
    val c2v = coalesce(col("c2"), lit(0L))
    val c1v = coalesce(col("c1"), lit(0L))
    val n1v = coalesce(col("n1"), lit(0L))
    val contv = coalesce(col("cont"), lit(0L))
    val ctv = col("ct") + col("v")
    val num = when(c1v > 0,
      greatest(c2v * 4 - 3, lit(0L)) * ctv + lit(3L) * n1v * (contv + 1))
      .otherwise(contv + 1)
    val den = when(c1v > 0, lit(4L) * c1v * ctv).otherwise(ctv)
    mappedPairs(docs, textCol, Seq(col(idCol)), lm.vocab)
      .join(broadcast(lm.pair), Seq("m1", "m2"), "left")
      .join(broadcast(lm.hist), Seq("m1"), "left")
      .join(broadcast(n1), Seq("m1"), "left")
      .join(broadcast(cont), Seq("m2"), "left")
      .crossJoin(broadcast(ctot)).crossJoin(broadcast(lm.vsz))
      .select(col(idCol),
        floor(log(num.cast("double") / den.cast("double")) * 1e6 + lit(0.5))
          .cast("long").as("q"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("q"))).as("s"))
      .select(col(idCol), col("n_bigrams"),
        expr("s div n_bigrams").as("kn_nll_unats"))
  }

  /** The frozen KN model as plain arrays ([[graftshim.KnLmScore]]'s
    * layout: `terms(i)` has id i+1, id 0 = <unk>; c1/n1/cont are
    * id-indexed, `pairKeys(k) = id1·V + id2` sorted with `pairC2`
    * aligned). */
  final case class KnFrozenLm(terms: Array[String], c1: Array[Long],
      n1: Array[Long], cont: Array[Long], ct: Long,
      pairKeys: Array[Long], pairC2: Array[Long], vSize: Long)

  /** Collect the KN model frames to driver arrays — model-sized by the
    * minCount cap, the score-at-ingest artifact (st26/st25's
    * freeze-and-ship convention; the literal-"<unk>" exclusion and
    * batch-vsz rules of [[bigramLmFreeze]] apply identically). */
  def knFreeze(lm: BigramLm): KnFrozenLm = {
    val terms = lm.vocab.filter(col("tok") =!= "<unk>").orderBy("tok")
      .collect().map(_.getString(0))
    val id = terms.iterator.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val v = lm.vsz.head.getLong(0)
    val c1 = new Array[Long](terms.length + 1)
    lm.hist.collect().foreach { r =>
      c1(id.getOrElse(r.getString(0), 0)) += r.getLong(1) }
    val rawPairs = lm.pair.collect()
      .map { r => (id.getOrElse(r.getString(0), 0).toLong * v +
        id.getOrElse(r.getString(1), 0), r.getLong(2)) }
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      .toArray.sortBy(_._1)
    // type counts AFTER the <unk> fold, so the frozen model and the
    // broadcast-join path see the same distinct-pair universe
    val n1 = new Array[Long](terms.length + 1)
    val cont = new Array[Long](terms.length + 1)
    rawPairs.foreach { case (k, _) =>
      n1((k / v).toInt) += 1; cont((k % v).toInt) += 1 }
    KnFrozenLm(terms, c1, n1, cont, rawPairs.length.toLong,
      rawPairs.map(_._1), rawPairs.map(_._2), v)
  }

  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
      lm: BigramLm): DataFrame =
    mappedPairs(docs, textCol, Seq(col(idCol)), lm.vocab)
      .join(broadcast(lm.pair), Seq("m1", "m2"), "left")
      .join(broadcast(lm.hist), Seq("m1"), "left")
      .crossJoin(broadcast(lm.vsz))
      .select(col(idCol),
        floor(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))
          * 1e6 + lit(0.5)).cast("long").as("q"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("q"))).as("s"))
      .select(col(idCol), col("n_bigrams"),
        expr("s div n_bigrams").as("nll_unats"))

  /**
   * Frozen TRIGRAM Kneser-Ney model: the vocab (shared with the bigram
   * fits), the trigram count frame over the vocab-mapped stream (OOV →
   * "<unk>", trigrams never cross a document boundary), and |V|+1 —
   * everything [[knTrigramScore]] needs; every lower-order statistic
   * (history counts, type counts, continuation counts) derives from
   * `tri` inside the score plan, so the two levels can never disagree
   * with their own training data. Model-sized by the `minCount` cap:
   * `tri` ≤ (distinct trigram types of the reference slice) rows, the
   * broadcastable deployed artifact at 100 TB.
   */
  final case class TrigramLm(vocab: DataFrame, tri: DataFrame, vsz: DataFrame)

  /** Adjacent vocab-mapped token TRIPLES of `textCol`, one row per
    * trigram, carrying `keep` extra columns; docs under 3 tokens drop
    * (no trigram evidence). Same narrow positional-explode shape as
    * [[mappedPairs]] — three broadcast vocab probes, no token shuffle. */
  private def mappedTriples(docs: DataFrame, textCol: String,
      keep: Seq[Column], vocab: DataFrame): DataFrame = {
    val unk = lit("<unk>")
    docs
      .select(keep :+ tokens(col(textCol)).as("w"): _*)
      .where(size(col("w")) >= 3)
      .select(keep :+ col("w") :+
        explode(sequence(lit(1), size(col("w")) - 2)).as("i"): _*)
      .select(keep :+ element_at(col("w"), col("i")).as("t1") :+
        element_at(col("w"), col("i") + 1).as("t2") :+
        element_at(col("w"), col("i") + 2).as("t3"): _*)
      .join(broadcast(vocab.select(col("tok").as("t1"), lit(1).as("iv1"))),
        Seq("t1"), "left")
      .join(broadcast(vocab.select(col("tok").as("t2"), lit(1).as("iv2"))),
        Seq("t2"), "left")
      .join(broadcast(vocab.select(col("tok").as("t3"), lit(1).as("iv3"))),
        Seq("t3"), "left")
      .select(keep :+ when(col("iv1") === 1, col("t1")).otherwise(unk).as("m1")
        :+ when(col("iv2") === 1, col("t2")).otherwise(unk).as("m2")
        :+ when(col("iv3") === 1, col("t3")).otherwise(unk).as("m3"): _*)
  }

  /** Fit the trigram KN model on a reference frame (pass the
    * quality-gated slice — [[bigramLmFit]]'s convention; the vocab rule
    * is IDENTICAL so t29/t33/t34 share one vocabulary per gate). */
  def trigramLmFit(ref: DataFrame, textCol: String,
      minCount: Int = 5): TrigramLm = {
    require(minCount >= 1, s"trigramLmFit: minCount=$minCount")
    // NOT sharedScan-pinned — see [[bigramLmFit]]'s note: the frames
    // grow with the gated corpus, so pinning them reproduces the l16
    // block-manager starvation at 10×; ReuseExchange dedups the
    // identical census subtrees within the query, and the deployment
    // path is fit-once → kn3Freeze → ship arrays.
    val vocab = ref
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select("tok")
    val tri = mappedTriples(ref, textCol, Seq.empty, vocab)
      .groupBy("m1", "m2", "m3").agg(count(lit(1)).as("c3"))
    val vsz = vocab.agg((count(lit(1)) + 1).as("v"))
    TrigramLm(vocab, tri, vsz)
  }

  /**
   * INTERPOLATED KNESER-NEY **trigram** scoring — t33's smoothing at
   * KenLM's minimum production order (order ≥ 3): one more backoff
   * level, same exact-integer-ratio discipline. With D = 3/4 at both
   * levels and add-one smoothing on the deepest continuation
   * distribution (t33's floor), every probability is ONE exact integer
   * num/den:
   *
   *   level 2 (continuation bigram, estimated on TYPE counts — the KN
   *   insight applied to the middle order: c'(w2,w3) = N1+(·w2w3)):
   *     bch > 0:  num2 = max(4·bcf−3, 0)·(ct+V) + 3·bn1·(cont3+1)
   *               den2 = 4·bch·(ct+V)
   *     bch = 0:  num2 = cont3+1, den2 = ct+V
   *   level 3:
   *     c2h > 0:  num3 = max(4·c3−3, 0)·den2 + 3·n1h·num2
   *               den3 = 4·c2h·den2
   *     c2h = 0:  num3 = num2, den3 = den2
   *
   * where c3 = trigram count, c2h = Σ_w3 c3 (self-consistent history
   * mass), n1h = N1+(w1w2·) distinct continuations of the history,
   * bcf = N1+(·w2w3) distinct left-contexts of the bigram,
   * bch = N1+(·w2·) = Σ_w3 bcf, bn1 = distinct w3 in (w2,·) TYPE space,
   * cont3 = N1+(·w3) distinct type-level predecessors of w3 over the
   * (m2,m3) type universe, ct = |{(m2,m3) types}|, V = |vocab|+1.
   * P ≤ 1 always (bcf ≤ bch, bn1 ≤ bch, cont3 < ct+V, c3 ≤ c2h,
   * n1h ≤ c2h — each level is a convex-ish mixture of ≤1 terms), so
   * q = ⌊ln(num3/den3)·1e6⌉ ≤ 0: t29/t33's sign discipline, and
   * `kn3_nll_unats = (−Σq) div n_trigrams` is engine-portable in any
   * fold order. Magnitudes: num3 ≤ 4·c3·den2 ≈ 16·c3·bch·(ct+V) —
   * exact in longs and in the long→double conversion both engines
   * apply, far below 2^53 at reference-slice scale (the model is
   * fitted on the GATED slice, never the corpus).
   *
   * Scale shape: all six model frames derive from `tri` (model-sized,
   * broadcast); the corpus side is one narrow triple-assembly pipeline
   * (positional explode, three broadcast vocab probes) into five
   * broadcast model probes and a map-side-combinable per-doc aggregate
   * — no shuffle ever carries text or tokens.
   */
  def knTrigramScore(docs: DataFrame, idCol: String, textCol: String,
      lm: TrigramLm): DataFrame = {
    val h3 = lm.tri.groupBy("m1", "m2")
      .agg(sum("c3").as("c2h"), count(lit(1)).as("n1h"))
    val bcf = lm.tri.groupBy("m2", "m3").agg(count(lit(1)).as("bcf"))
    val mid = bcf.groupBy("m2")
      .agg(sum("bcf").as("bch"), count(lit(1)).as("bn1"))
    val cont3 = bcf.groupBy("m3").agg(count(lit(1)).as("cont3"))
    val ctot = bcf.agg(count(lit(1)).as("ct"))
    val c3v = coalesce(col("c3"), lit(0L))
    val c2hv = coalesce(col("c2h"), lit(0L))
    val n1hv = coalesce(col("n1h"), lit(0L))
    val bcfv = coalesce(col("bcf"), lit(0L))
    val bchv = coalesce(col("bch"), lit(0L))
    val bn1v = coalesce(col("bn1"), lit(0L))
    val cont3v = coalesce(col("cont3"), lit(0L))
    val ctv = col("ct") + col("v")
    val num2 = when(bchv > 0,
      greatest(bcfv * 4 - 3, lit(0L)) * ctv + lit(3L) * bn1v * (cont3v + 1))
      .otherwise(cont3v + 1)
    val den2 = when(bchv > 0, lit(4L) * bchv * ctv).otherwise(ctv)
    val num3 = when(c2hv > 0,
      greatest(c3v * 4 - 3, lit(0L)) * den2 + lit(3L) * n1hv * num2)
      .otherwise(num2)
    val den3 = when(c2hv > 0, lit(4L) * c2hv * den2).otherwise(den2)
    mappedTriples(docs, textCol, Seq(col(idCol)), lm.vocab)
      .join(broadcast(lm.tri), Seq("m1", "m2", "m3"), "left")
      .join(broadcast(h3), Seq("m1", "m2"), "left")
      .join(broadcast(bcf), Seq("m2", "m3"), "left")
      .join(broadcast(mid), Seq("m2"), "left")
      .join(broadcast(cont3), Seq("m3"), "left")
      .crossJoin(broadcast(ctot)).crossJoin(broadcast(lm.vsz))
      .select(col(idCol),
        floor(log(num3.cast("double") / den3.cast("double")) * 1e6 + lit(0.5))
          .cast("long").as("q"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"), (-sum(col("q"))).as("s"))
      .select(col(idCol), col("n_trigrams"),
        expr("s div n_trigrams").as("kn3_nll_unats"))
  }

  /** The frozen trigram KN model as plain arrays
    * ([[graftshim.Kn3LmScore]]'s layout: `terms(i)` has id i+1, id 0 =
    * <unk>; `histKeys(k) = id1·V + id2` sorted with c2h/n1h aligned;
    * `triKeys(k) = (id1·V + id2)·V + id3` sorted with c3 aligned;
    * bch/bn1 indexed by id2, cont3 by id3). */
  final case class Kn3FrozenLm(terms: Array[String],
      histKeys: Array[Long], histC2h: Array[Long], histN1h: Array[Long],
      bch: Array[Long], bn1: Array[Long], cont3: Array[Long], ct: Long,
      triKeys: Array[Long], triC3: Array[Long], vSize: Long)

  /** Collect the trigram KN frames to driver arrays — model-sized by
    * the minCount cap, the score-at-ingest artifact. All type counts
    * are taken AFTER the literal-"<unk>" fold ([[bigramLmFreeze]]'s
    * rule) and V comes from the BATCH fit's `vsz` frame (its other
    * rule — a recomputed `terms.length + 1` drifts by one when the
    * literal "<unk>" token itself clears minCount) so the frozen
    * scorer is bit-parity with the broadcast-join path. */
  def kn3Freeze(lm: TrigramLm): Kn3FrozenLm = {
    // overflow guard FIRST — vsz is a 1-row aggregate, so the refusal
    // on a 2M-term vocabulary is O(1), not a 2M-string driver collect
    val v = lm.vsz.head.getLong(0)
    require(v < 2097151L, s"kn3Freeze: |V|+1=$v overflows the packed " +
      "triple key (id1*V^2 bound) — raise minCount")
    val terms = lm.vocab.filter(col("tok") =!= "<unk>").orderBy("tok")
      .collect().map(_.getString(0))
    val id = terms.iterator.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val rawTris = lm.tri.collect()
      .map { r => ((id.getOrElse(r.getString(0), 0).toLong * v +
        id.getOrElse(r.getString(1), 0)) * v +
        id.getOrElse(r.getString(2), 0), r.getLong(3)) }
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      .toArray.sortBy(_._1)
    val hists = rawTris.groupBy(_._1 / v)
      .map { case (h, g) => (h, g.map(_._2).sum, g.length.toLong) }
      .toArray.sortBy(_._1)
    val bch = new Array[Long](terms.length + 1)
    val bn1 = new Array[Long](terms.length + 1)
    val cont3 = new Array[Long](terms.length + 1)
    // (m2,m3) TYPE universe after the fold: distinct low-two-id pairs
    val pairTypes = rawTris.map(t => t._1 % (v * v)).distinct.sorted
    val perMid = pairTypes.groupBy(k => (k / v).toInt)
    perMid.foreach { case (m2, ks) => bn1(m2) = ks.length.toLong }
    rawTris.foreach { case (k, _) => bch(((k % (v * v)) / v).toInt) += 1 }
    pairTypes.foreach { k => cont3((k % v).toInt) += 1 }
    Kn3FrozenLm(terms, hists.map(_._1), hists.map(_._2), hists.map(_._3),
      bch, bn1, cont3, pairTypes.length.toLong,
      rawTris.map(_._1), rawTris.map(_._2), v)
  }

  /**
   * DSIR hashed-bucket importance weights (Xie et al. 2023, "Data
   * Selection for Language Models via Importance Resampling"): score
   * every document by how much more likely its hashed token-bucket
   * stream is under a TARGET distribution (the trusted/domain slice)
   * than under the RAW corpus distribution; resample/filter by the
   * weight. `dsirFit` builds the per-bucket log-ratio table λ_b in ONE
   * census pass over the corpus — each token's bucket is
   * `md5Hash52(tok) % buckets` (the engine-portable hash plane every
   * dedup oracle already replays), and the two add-one-smoothed
   * distributions share the pass because target membership is just a
   * boolean column:
   *
   *   λ_b = ⌊ln((ct_b+1)/(Nt+B))·1e6⌉ − ⌊ln((cr_b+1)/(Nr+B))·1e6⌉
   *
   * Each log quantizes to integer micro-nats SEPARATELY (t17's
   * quantize-before-fold discipline), so λ is exact integer and the
   * per-doc weight `dsir_unats = Σ_tokens λ_bucket(token)` folds
   * identically in any engine and any order. The λ table is B rows
   * however large the corpus — the broadcast plane; the scoring scan
   * is one narrow token explode into a map-side-combinable per-doc
   * aggregate. Totals (Nt, Nr) stay IN-PLAN (crossJoin of a 1-row
   * aggregate — zero driver round-trips, the t29 shape).
   */
  def dsirFit(docs: DataFrame, textCol: String, targetFilter: Column,
      buckets: Int = 512): DataFrame = {
    require(buckets >= 1, s"dsirFit: buckets=$buckets")
    import graft.functions.VectorExpressions.md5Hash52
    // tgt is projected ALONE first so the gate evaluates once per DOC:
    // projected alongside the explode, Catalyst keeps raw text through
    // the Generate and re-evaluates the full gate (regexp + HOF over
    // the whole text) per TOKEN row — measured 5× the entire fit
    val toks = docs
      .select(targetFilter.cast("long").as("tgt"),
        tokens(col(textCol)).as("w"))
      .select(col("tgt"), explode(col("w")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("tgt"), (md5Hash52(col("tok")) % buckets).as("b"))
    // census feeds BOTH the totals aggregate and the spine join; shared
    // so the token scan runs once (B rows pinned, bucket-bounded)
    val census = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(
      toks.groupBy("b")
        .agg(sum(col("tgt")).as("ct"), count(lit(1)).as("cr")))
    val totals = census.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val spine = docs.sparkSession.range(buckets).select(col("id").as("b"))
    spine.join(census, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (floor(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
           (col("nt") + buckets).cast("double")) * 1e6 + lit(0.5)).cast("long")
         - floor(log((coalesce(col("cr"), lit(0L)) + 1).cast("double") /
             (col("nr") + buckets).cast("double")) * 1e6 + lit(0.5)).cast("long"))
          .as("lam"))
  }

  /** Score documents under a fitted λ table: one token explode, one
    * broadcast bucket probe, one map-side-combinable per-doc fold.
    * Documents with zero non-empty tokens produce no row (no evidence —
    * the bigram-LM convention). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      lambda: DataFrame, buckets: Int): DataFrame = {
    import graft.functions.VectorExpressions.md5Hash52
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), (md5Hash52(col("tok")) % buckets).as("b"))
      .join(broadcast(lambda), "b")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("lam").as("dsir_unats"))
  }

  /** Collect λ to the deployed-artifact array the native row-local
    * scorer consumes (`lam(b)` = the bucket-b log-ratio; B-sized by
    * construction — the score-at-ingest deployment ships exactly
    * this). */
  def dsirFreeze(lambda: DataFrame, buckets: Int): Array[Long] = {
    val out = new Array[Long](buckets)
    lambda.collect().foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /**
   * The SCALAR Gopher rule flags (Rae et al. 2021, Table A1) as int
   * columns over `text` — the row-local subset of t30's battery (word
   * count, mean word length, alphabetic-word share, distinct-stopword
   * presence). One definition shared by the batch audit (t30) and the
   * ingest-time gate (st27) so thresholds can never drift between the
   * two deployments (d15's leakage-audit rule applied to quality
   * gates). The repetition family (t24's n-gram coverage) is NOT here:
   * it needs per-doc gram censuses, which the batch audit joins in and
   * an ingest gate defers to the batch pass.
   *
   * Integer forms throughout: chars = len − n + 1 under single-space
   * joining, 3n <= chars <= 10n for mean word length in [3,10];
   * 5·n_alpha >= 4·n for the 80% alphabetic-word share — no float ever
   * enters the flags, so any engine replays them exactly.
   */
  def gopherScalarFlags(text: Column): Seq[(String, Column)] = {
    val w = split(text, " ")
    val n = size(w).cast("long")
    val chars = length(text).cast("long") - n + 1
    val nAlpha = regexp_count(text, lit("(?:^| )[^ ]*[A-Za-z][^ ]*")).cast("long")
    val stops = typedlit(Seq("the", "a", "of", "and", "to", "in", "is", "it"))
    Seq(
      "wc_ok" -> n.between(50, 100000).cast("int"),
      "mwl_ok" -> (chars >= n * 3 && chars <= n * 10).cast("int"),
      "alpha_ok" -> (nAlpha * 5 >= n * 4).cast("int"),
      "stop_ok" -> (size(array_intersect(w, stops)) >= 2).cast("int"))
  }
}
