package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis._
import graft.tables.Tables

/** Text-analysis pack over the `documents` table. */
object TextQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "t01_token_counts",
      (s, dir) => {
        Tables(s, dir).documents
          .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "t02_quality_score",
      (s, dir) => {
        Tables(s, dir).documents
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            fround(avgTokenLen(col("text")), 2).as("avg_token_len"),
            fround(stopwordRatio(col("text")), 4).as("stop_ratio"),
            fround(punctRatio(col("text")), 4).as("punct_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  floor(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) * 100.0 + 0.5) / 100.0 AS avg_token_len,
             |  floor(len(list_filter(string_split(text, ' '),
             |      x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0
             |    / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
             |  floor(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
             |    / length(text) * 10000.0 + 0.5) / 10000.0 AS punct_ratio
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "t03_lang_distribution",
      (s, dir) => {
        Tables(s, dir).documents
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("cnt"), fround(avg("n_chars"), 2).as("avg_chars"))
          .orderBy("lang", "source")
      },
      Some("""SELECT lang, source, count(*) AS cnt, floor(avg(n_chars) * 100.0 + 0.5) / 100.0 AS avg_chars
             |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    Q(
      "t04_bigram_freq",
      (s, dir) => {
        // Array-retained positional explode: bigram assembly is a
        // narrow codegen'd map (no token shuffle/sort, no interpreted
        // HOF lambda); the only exchange is the partial-aggregated
        // bigram counts.
        val positions = when(size(col("toks")) >= 2,
          sequence(lit(1), size(col("toks")) - 1)).otherwise(array().cast("array<int>"))
        Tables(s, dir).documents
          .select(split(col("text"), " ").as("toks"))
          .select(col("toks"), explode(positions).as("pos"))
          .select(concat_ws(" ",
            element_at(col("toks"), col("pos")),
            element_at(col("toks"), col("pos") + 1)).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("bigram"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |expl AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS tok FROM toks)
             |SELECT a.tok || ' ' || b.tok AS bigram, count(*) AS cnt
             |FROM expl a JOIN expl b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             |GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin)),

    Q(
      "t07_regex_tokens",
      (s, dir) => {
        // BPE-style pre-tokenization count: alpha runs, digit runs, and
        // individual punctuation marks each count as one token (the
        // split a byte-pair tokenizer applies before merges). The
        // character-class-only pattern evaluates identically in Java
        // regex (Spark) and RE2 (DuckDB).
        val pattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
        Tables(s, dir).documents
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("text"), lit(pattern), lit(0))).as("n_subtokens"),
            tokenCount(col("text")).as("n_ws_tokens"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS n_subtokens,
             |  len(string_split(text, ' ')) AS n_ws_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "t05_lang_id",
      (s, dir) => langId(Tables(s, dir).documents).orderBy("doc_id"),
      // The whole train-and-score pipeline is relational: the profile
      // weights are bit-identical in both engines (one exact-integer
      // division each), scoring quantizes them to integer picounits
      // and sums LONGs — exact in any aggregation order — and ties
      // break deterministically, so DuckDB reproduces the classifier
      // with no floating-point near-tie exposure.
      Some("""WITH g AS (SELECT doc_id, lang,
             |    unnest(list_transform(range(1, greatest(length(text) - 1, 1)),
             |      p -> substr(text, p, 3))) AS gram
             |  FROM documents WHERE length(text) >= 3),
             |prof_counts AS (SELECT lang, gram, CAST(count(*) AS DOUBLE) AS cnt
             |  FROM g WHERE doc_id % 10 = 0 GROUP BY 1, 2),
             |prof_w AS (SELECT lang, gram,
             |    cnt / sum(cnt) OVER (PARTITION BY lang) AS weight
             |  FROM prof_counts),
             |prof AS (SELECT lang AS profile_lang, gram, weight
             |  FROM (SELECT lang, gram, weight,
             |          row_number() OVER (PARTITION BY lang ORDER BY weight DESC, gram) AS rnk
             |        FROM prof_w)
             |  WHERE rnk <= 300),
             |scores AS (SELECT g.doc_id, g.lang, p.profile_lang,
             |    sum(CAST(floor(p.weight * 1e12 + 0.5) AS BIGINT)) AS score
             |  FROM g JOIN prof p USING (gram)
             |  GROUP BY 1, 2, 3)
             |SELECT doc_id, profile_lang AS predicted, lang AS actual
             |FROM (SELECT doc_id, lang, profile_lang,
             |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rnk
             |      FROM scores)
             |WHERE rnk = 1 ORDER BY doc_id""".stripMargin)),

    Q(
      "t10_approx_distinct",
      (s, dir) => {
        // Native HyperLogLog (p=12) over the portable poly-hash of each
        // token: per-language approximate distinct-token counts next to
        // the exact ones. The fixed 4 KB register buffer per group is
        // what a distinct count costs at 100 TB; and because every step
        // is deterministic hash math, DuckDB reproduces the ESTIMATE
        // itself bit-for-bit — an oracle-checked approximation.
        val toks = Tables(s, dir).documents
          .select(col("lang"), explode(tokens(col("text"))).as("tok"))
          .select(col("lang"),
            graft.functions.VectorExpressions.md5Hash52(col("tok")).as("h"),
            col("tok"))
        toks.groupBy("lang")
          .agg(
            fround(graft.functions.VectorExpressions.hllDistinct(col("h")), 2)
              .as("approx_distinct"),
            countDistinct(col("tok")).as("exact_distinct"))
          .orderBy("lang")
      },
      // hash = first 13 md5 hex chars as a 52-bit int; DuckDB folds the
      // identical digits, then replays registers + harmonic sum +
      // linear-counting branch — the ESTIMATE itself hash-matches
      Some(s"""WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |h AS (SELECT lang, tok,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(13), j ->
             |        CAST(strpos('0123456789abcdef', substr(md5(tok), j + 1, 1)) - 1 AS BIGINT))),
             |      (a, c) -> a * 16 + c) AS x
             |  FROM toks),
             |r AS (SELECT lang, x % 4096 AS b,
             |    max(CASE WHEN (x // 4096) = 0 THEN 41
             |             ELSE 41 - length(bin(x // 4096)) END) AS reg
             |  FROM h GROUP BY 1, 2),
             |regs AS (SELECT l.lang, t.range AS b, coalesce(r.reg, 0) AS reg
             |  FROM (SELECT DISTINCT lang FROM toks) l
             |  CROSS JOIN range(4096) t
             |  LEFT JOIN r ON r.lang = l.lang AND r.b = t.range),
             |s AS (SELECT lang,
             |    list_sum(list_transform(list(reg ORDER BY b), g -> pow(2.0, -g))) AS z,
             |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v
             |  FROM regs GROUP BY lang),
             |est AS (SELECT lang,
             |    CASE WHEN (0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 / z) <= 2.5 * 4096
             |           AND v > 0
             |         THEN 4096 * ln(4096 / v)
             |         ELSE 0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 / z END AS e
             |  FROM s),
             |ex AS (SELECT lang, count(DISTINCT tok) AS exact_distinct FROM toks GROUP BY 1)
             |SELECT est.lang AS lang, floor(e * 100.0 + 0.5) / 100.0 AS approx_distinct,
             |  exact_distinct
             |FROM est JOIN ex ON est.lang = ex.lang
             |ORDER BY est.lang""".stripMargin)),

    Q(
      "t11_cms_heavy_hitters",
      (s, dir) => {
        // Count-Min heavy hitters: ONE 5×8192 sketch over every bigram
        // occurrence (fixed 320 KB buffer however large the corpus),
        // then point estimates for the exact top-10 — estimate = min
        // over rows via plain element_at arithmetic, no UDF. The same
        // deterministic coefficient table is embedded in the oracle, so
        // the ESTIMATES hash-match DuckDB (cf. t10's HLL).
        import graft.functions.VectorExpressions.{cmsEstimate, cmsSketch, polyHash}
        val positions = when(size(col("toks")) >= 2,
          sequence(lit(1), size(col("toks")) - 1)).otherwise(array().cast("array<int>"))
        val bigrams = Tables(s, dir).documents
          .select(split(col("text"), " ").as("toks"))
          .select(col("toks"), explode(positions).as("pos"))
          .select(concat_ws(" ",
            element_at(col("toks"), col("pos")),
            element_at(col("toks"), col("pos") + 1)).as("bigram"))
        val sketch = bigrams.agg(cmsSketch(polyHash(col("bigram"))).as("sk"))
        bigrams.groupBy("bigram").agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("bigram"))
          .limit(10)
          .crossJoin(broadcast(sketch))
          .select(col("bigram"), col("exact_cnt"),
            cmsEstimate(col("sk"), polyHash(col("bigram"))).as("est_cnt"))
          .orderBy(col("exact_cnt").desc, col("bigram"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |expl AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS tok FROM toks),
             |big AS (SELECT a.tok || ' ' || b.tok AS bigram
             |  FROM expl a JOIN expl b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
             |counts AS (SELECT bigram, count(*) AS cnt,
             |    ${OracleSql.polyFold("bigram")} % 4294967296 AS x32
             |  FROM big GROUP BY bigram),
             |cp AS (SELECT ${OracleSql.coeffPairsLiteral(5, 99L)} AS c),
             |buckets AS (SELECT i.range AS r,
             |    ((c[i.range + 1][1] * x32 + c[i.range + 1][2]) % 2147483647) % 8192 AS bucket,
             |    CAST(sum(cnt) AS BIGINT) AS ctr
             |  FROM counts CROSS JOIN range(5) i CROSS JOIN cp
             |  GROUP BY 1, 2),
             |top AS (SELECT bigram, cnt, x32 FROM counts
             |        ORDER BY cnt DESC, bigram LIMIT 10)
             |SELECT t.bigram, t.cnt AS exact_cnt, min(b.ctr) AS est_cnt
             |FROM top t CROSS JOIN range(5) i CROSS JOIN cp
             |  JOIN buckets b ON b.r = i.range
             |    AND b.bucket = ((c[i.range + 1][1] * t.x32 + c[i.range + 1][2]) % 2147483647) % 8192
             |GROUP BY 1, 2 ORDER BY exact_cnt DESC, bigram""".stripMargin)),

    Q(
      "t12_quantile_sketch",
      (s, dir) => {
        // Mergeable KLL quantile sketch (k=200): per-language document-
        // length percentiles next to the exact ones. The sketch buffer
        // is O(k·log n) doubles per group with level-wise partial
        // merge — q23's exact `percentile` sorts every row of the
        // group, this ships kilobytes at 100 TB. Rows-only: compaction
        // depends on arrival order, so no cross-engine oracle; the
        // KllSpec asserts the rank-error bound against exact
        // percentiles instead.
        val lens = Tables(s, dir).documents
          .select(col("lang"), length(col("text")).cast("double").as("len"))
        lens.groupBy("lang")
          .agg(graft.functions.VectorExpressions
            .kllQuantiles(col("len"), Seq(0.25, 0.5, 0.75, 0.95)).as("qs"))
          .select(col("lang"),
            col("qs")(0).as("q25"), col("qs")(1).as("q50"),
            col("qs")(2).as("q75"), col("qs")(3).as("q95"))
          .orderBy("lang")
      },
      None),

    Q(
      "t09_bm25",
      (s, dir) => {
        // BM25 retrieval (k1=1.2, b=0.75) for a fixed query over the
        // corpus: tf per (doc, term) from one explode pass, df/idf are
        // model-sized broadcasts, doc stats one aggregate; the global
        // top-20 goes through the native TopKPerGroup heap (empty
        // grouping = global top-k, shuffle carries 20 rows/partition).
        // Scores are fround(4) BEFORE ranking so rank order is
        // identical across engines despite summation-order ulps.
        val terms = Seq("join", "filter", "vector")
        val d = Tables(s, dir).documents
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        val lens = d.select(col("doc_id"), size(col("toks")).as("len"))
        val stats = lens.agg(count(lit(1)).as("n_docs"), avg("len").as("avgdl"))
        val tf = d.select(col("doc_id"), explode(col("toks")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val scored = tf
          .join(broadcast(dfreq), "term")
          .join(lens, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"),
            (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
              * (col("tf") * lit(2.2))
              / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avgdl"))))
              .as("s"))
          .groupBy("doc_id").agg(fround(sum("s"), 4).as("score"))
        graft.plans.TopK.perGroup(scored, Seq.empty, col("score"), col("doc_id"), k = 20)
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |lens AS (SELECT doc_id, len(w) AS len FROM toks),
             |stats AS (SELECT count(*) AS n_docs, avg(len) AS avgdl FROM lens),
             |tf AS (SELECT doc_id, term, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(w) AS term FROM toks)
             |  WHERE term IN ('join', 'filter', 'vector') GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |scored AS (SELECT doc_id,
             |    sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))) AS s
             |  FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
             |  GROUP BY doc_id)
             |SELECT doc_id, floor(s * 10000.0 + 0.5) / 10000.0 AS score
             |FROM scored
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    Q(
      "p01_corpus_pipeline",
      (s, dir) => {
        // End-to-end training-data prep: quality gate -> exact dedup
        // (keep lowest doc_id per text) -> per-language corpus stats.
        val d = Tables(s, dir).documents
        val quality = d.filter(
          tokenCount(col("text")) >= 20 &&
            stopwordRatio(col("text")) <= lit(0.3))
        val deduped = quality
          .groupBy("text")
          .agg(min("doc_id").as("doc_id"), first("lang").as("lang"))
        deduped
          .groupBy("lang")
          .agg(
            count(lit(1)).as("docs"),
            sum(tokenCount(col("text"))).cast("long").as("total_tokens"),
            fround(avg(tokenCount(col("text"))), 2).as("avg_tokens"))
          .orderBy("lang")
      },
      Some("""WITH quality AS (
             |  SELECT * FROM documents
             |  WHERE len(string_split(text, ' ')) >= 20
             |    AND len(list_filter(string_split(text, ' '),
             |          x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0
             |        / len(string_split(text, ' ')) <= 0.3),
             |deduped AS (
             |  SELECT min(doc_id) AS doc_id, any_value(lang) AS lang, text
             |  FROM quality GROUP BY text)
             |SELECT lang, count(*) AS docs,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             |  floor(avg(len(string_split(text, ' '))) * 100.0 + 0.5) / 100.0 AS avg_tokens
             |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin)),

    Q(
      "p02_stratified_sample",
      (s, dir) => {
        // Deterministic stratified sampling for corpus curation: 5 docs
        // per language, "randomized" by the portable poly-hash of the
        // text (reproducible across engines and runs, unlike rand()),
        // selected with the native TopKPerGroup operator — shuffle
        // carries 5 rows per (partition, lang), not the corpus.
        val d = Tables(s, dir).documents
          .select(col("lang"), col("doc_id"),
            graft.functions.VectorExpressions.polyHash(col("text")).as("h"))
        graft.plans.TopK.perGroup(d, Seq(col("lang")), col("h"), col("doc_id"), k = 5)
          .select("lang", "doc_id")
          .orderBy("lang", "doc_id")
      },
      Some(s"""SELECT lang, doc_id
             |FROM (SELECT lang, doc_id,
             |        row_number() OVER (PARTITION BY lang
             |          ORDER BY ${OracleSql.polyFold("text")} DESC, doc_id) AS rn
             |      FROM documents)
             |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin)),

    Q(
      "p04_source_quota",
      (s, dir) => {
        // Per-source corpus quotas — the pretraining-mix primitive:
        // each source contributes at most its own cap (a weighted mix,
        // e.g. books oversampled vs. crawl), selected deterministically
        // by the portable poly-hash. The quota table is model-sized and
        // broadcast onto the corpus; selection runs through the native
        // TopKPerGroup in quota mode, so the map-side heap pass bounds
        // every partition to the group's own quota BEFORE the exchange
        // — shuffle volume is O(partitions × Σ quota), not the corpus.
        val quotas = s.createDataFrame(
          (0 until 20).map(i => (s"src$i", 5 * (i % 4 + 1)))).toDF("source", "quota")
        val d = Tables(s, dir).documents
          .select(col("source"), col("doc_id"),
            graft.functions.VectorExpressions.polyHash(col("text")).as("h"))
          .join(broadcast(quotas), "source")
        graft.plans.TopK.perGroupQuota(
            d, Seq(col("source")), col("h"), col("doc_id"), col("quota"), maxK = 64)
          .select("source", "doc_id")
          .orderBy("source", "doc_id")
      },
      Some(s"""WITH quotas(source, quota) AS (VALUES
             |  ${(0 until 20).map(i => s"('src$i', ${5 * (i % 4 + 1)})").mkString(", ")}),
             |ranked AS (SELECT d.source, d.doc_id, q.quota,
             |    row_number() OVER (PARTITION BY d.source
             |      ORDER BY ${OracleSql.polyFold("d.text")} DESC, d.doc_id) AS rn
             |  FROM documents d JOIN quotas q ON d.source = q.source)
             |SELECT source, doc_id FROM ranked
             |WHERE rn <= quota ORDER BY source, doc_id""".stripMargin)),

    Q(
      "dc01_decontamination",
      (s, dir) => {
        // Benchmark decontamination: corpus docs sharing any word
        // 4-gram with the "benchmark" slice (doc_id % 23 — standing in
        // for an eval suite) are flagged for removal. The benchmark
        // n-gram set is model-sized and broadcast; the corpus side is
        // one narrow explode + left-semi probe — the corpus never
        // shuffles, only the contaminated ids do.
        val d = Tables(s, dir).documents
        val bench = d.filter(col("doc_id") % 23 === 0)
        val corpus = d.filter(col("doc_id") % 23 =!= 0)
        decontaminate(corpus, bench, "doc_id", "text", n = 4)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |ng AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 4 + 2),
             |         i -> list_aggregate(w[i:i+3], 'string_agg', ' '))) AS ngram
             |       FROM toks WHERE len(w) >= 4),
             |bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 23 = 0)
             |SELECT DISTINCT n.doc_id FROM ng n JOIN bench b ON n.ngram = b.ngram
             |WHERE n.doc_id % 23 <> 0 ORDER BY doc_id""".stripMargin)),

    Q(
      "st18_stream_decontamination",
      (s, dir) => {
        // STREAMING decontamination under the DuckDB oracle — dc01's
        // hygiene pass as an ingest gate (the crawl-frontier posture):
        // contaminated docs are DROPPED the moment they arrive, before
        // they reach storage or dedup state. The benchmark's distinct
        // 4-gram set collapses to ONE broadcast row; the overlap test
        // is a row-local arrays_overlap against the doc's own n-gram
        // array — so the streaming plan is a narrow STATELESS append:
        // no state store, no watermark, nothing held back
        // (spec-asserted). The sink holds the CLEAN side — dc01's
        // complement over the corpus slice — and hash-matches the
        // batch semantics; docs with < 4 words cannot be contaminated
        // and pass, exactly like batch. The benchmark set is COLLECTED
        // ONCE and re-enters as a local one-row relation — a frozen
        // gate model, like st08's GP and st17's centers — so no
        // micro-batch ever re-runs the benchmark aggregation. BOTH
        // slices cap at doc_id < 2000, ABSOLUTE bounds (st13's
        // discipline): a real eval benchmark is a FIXED external
        // artifact that does not grow with the corpus, and the feed
        // cap keeps the artifact measuring the gate, not MemoryStream
        // volume. collect() is the MemoryStream feeding harness + the
        // model-sized benchmark fetch.
        import graft.streaming.CorpusStream
        implicit val sqlCtx = s.sqlContext
        implicit val rowEnc =
          org.apache.spark.sql.Encoders.product[(Long, String)]
        import s.implicits._
        val d = Tables(s, dir).documents
        val grams = CorpusStream.benchmarkNGramSet(
            d.filter(col("doc_id") % 23 === 0 && col("doc_id") < 2000),
            "text", n = 4)
          .collect()(0).getSeq[String](0)
        val benchSet = Seq(Tuple1(grams)).toDF("bench_set")
        val rows = d.filter(col("doc_id") % 23 =!= 0 && col("doc_id") < 2000)
          .orderBy("doc_id")
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val q = CorpusStream.contaminationGate(
            stream.toDS().toDF("doc_id", "text"), "text", benchSet, n = 4)
          .select("doc_id")
          .writeStream.format("memory").queryName("st18_clean")
          .outputMode("append").start()
        try {
          val chunk = math.max(1, (rows.length + 1) / 2)
          rows.grouped(chunk).foreach { batch =>
            stream.addData(batch.toIndexedSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        s.table("st18_clean").orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |ng AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 4 + 2),
             |         i -> list_aggregate(w[i:i+3], 'string_agg', ' '))) AS ngram
             |       FROM toks WHERE len(w) >= 4),
             |bench AS (SELECT DISTINCT ngram FROM ng
             |          WHERE doc_id % 23 = 0 AND doc_id < 2000),
             |dirty AS (SELECT DISTINCT n.doc_id FROM ng n
             |          JOIN bench b ON n.ngram = b.ngram
             |          WHERE n.doc_id % 23 <> 0)
             |SELECT doc_id FROM documents
             |WHERE doc_id % 23 <> 0 AND doc_id < 2000
             |  AND doc_id NOT IN (SELECT doc_id FROM dirty)
             |ORDER BY doc_id""".stripMargin)),

    Q(
      "st19_stream_contamination_score",
      (s, dir) => {
        // STREAMING graded contamination under the DuckDB oracle —
        // t23's WIMBD-style overlap_ppm as an ingest-time annotation
        // (st18 drops; this MEASURES, feeding thresholded filters and
        // per-source dashboards): every arriving doc with >= 4 words
        // is tagged with its n-gram occurrence-overlap against the
        // one-row broadcast benchmark set, row-locally — a narrow
        // STATELESS append, no state store, no watermark
        // (spec-asserted). Integer ppm end to end, hash-matching the
        // batch contaminationScore contract on the same slices (both
        // capped at doc_id < 2000, st18's fixed-benchmark /
        // bounded-feed discipline). collect() is the MemoryStream
        // feeding harness + the model-sized benchmark fetch.
        import graft.streaming.CorpusStream
        implicit val sqlCtx = s.sqlContext
        implicit val rowEnc =
          org.apache.spark.sql.Encoders.product[(Long, String)]
        import s.implicits._
        val d = Tables(s, dir).documents
        val grams = CorpusStream.benchmarkNGramSet(
            d.filter(col("doc_id") % 23 === 0 && col("doc_id") < 2000),
            "text", n = 4)
          .collect()(0).getSeq[String](0)
        val rows = d.filter(col("doc_id") % 23 =!= 0 && col("doc_id") < 2000)
          .orderBy("doc_id")
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val q = CorpusStream.contaminationScoreStream(
            stream.toDS().toDF("doc_id", "text"), "doc_id", "text",
            grams, n = 4)
          .writeStream.format("memory").queryName("st19_scores")
          .outputMode("append").start()
        try {
          val chunk = math.max(1, (rows.length + 1) / 2)
          rows.grouped(chunk).foreach { batch =>
            stream.addData(batch.toIndexedSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        s.table("st19_scores").orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |ng AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 4 + 2),
             |         i -> list_aggregate(w[i:i+3], 'string_agg', ' '))) AS ngram
             |       FROM toks WHERE len(w) >= 4),
             |bench AS (SELECT DISTINCT ngram FROM ng
             |          WHERE doc_id % 23 = 0 AND doc_id < 2000),
             |scored AS (SELECT n.doc_id, count(*) AS n_grams,
             |    count(b.ngram) AS n_hits
             |  FROM ng n LEFT JOIN bench b ON n.ngram = b.ngram
             |  WHERE n.doc_id % 23 <> 0 AND n.doc_id < 2000
             |  GROUP BY n.doc_id)
             |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
             |  CAST(n_hits AS BIGINT) AS n_hits,
             |  CAST((n_hits * 1000000) // n_grams AS BIGINT) AS overlap_ppm
             |FROM scored ORDER BY doc_id""".stripMargin)),

    Q(
      "t13_pii_redact",
      (s, dir) => {
        // PII scrubbing: emails -> <EMAIL>, 4+-digit runs -> <NUM>,
        // as pure codegen'd regexp_replace (no UDF, one narrow pass).
        // The synthetic corpus contains no PII by construction, so the
        // oracle hash-checks ENGINE PARITY of the full redaction math
        // (identical RE2/Java character-class patterns over every doc);
        // behavior on planted emails/numbers is spec'd in PiiSpec.
        Tables(s, dir).documents
          .select(col("doc_id"),
            piiCount(col("text")).as("n_pii"),
            redactPii(col("text")).as("redacted"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+'))
             |    + len(regexp_extract_all(
             |        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
             |        '[0-9][0-9][0-9][0-9]+')) AS INT) AS n_pii,
             |  regexp_replace(
             |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
             |    '[0-9][0-9][0-9][0-9]+', '<NUM>', 'g') AS redacted
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "t23_ngram_overlap",
      (s, dir) => {
        // GRADED contamination (WIMBD-style audit): dc01 answers
        // "remove or keep"; this scores every corpus doc by the ppm
        // FRACTION of its word 4-gram occurrences found in the
        // benchmark slice — the input to thresholded filtering and
        // per-source contamination reports. Same broadcast-bench /
        // narrow-explode shape as dc01; the only shuffle is the
        // map-side-combinable per-doc count. Integer end to end.
        val d = Tables(s, dir).documents
        val bench = d.filter(col("doc_id") % 23 === 0)
        val corpus = d.filter(col("doc_id") % 23 =!= 0)
        graft.ops.TextAnalysis.contaminationScore(
          corpus, bench, "doc_id", "text", n = 4)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |ng AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 4 + 2),
             |         i -> list_aggregate(w[i:i+3], 'string_agg', ' '))) AS ngram
             |       FROM toks WHERE len(w) >= 4),
             |bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 23 = 0),
             |scored AS (SELECT n.doc_id, count(*) AS n_grams,
             |    count(b.ngram) AS n_hits
             |  FROM ng n LEFT JOIN bench b ON n.ngram = b.ngram
             |  WHERE n.doc_id % 23 <> 0 GROUP BY n.doc_id)
             |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
             |  CAST(n_hits AS BIGINT) AS n_hits,
             |  CAST((n_hits * 1000000) // n_grams AS BIGINT) AS overlap_ppm
             |FROM scored ORDER BY doc_id""".stripMargin)),

    Q(
      "p05_sequence_packing",
      (s, dir) => {
        // Causal-LM sequence packing over (source, hash-bucket)
        // sub-shards — the cumsum window, bucket arithmetic, and the
        // why (5 sources must not mean 5 sequential cumsums at 100 TB)
        // live in ops/Packing; buckets is the writer-parallelism
        // parameter, spec'd in PackingSpec.
        val budget = 512
        val buckets = 4
        graft.ops.Packing.packChunks(
          Tables(s, dir).documents
            .select(col("source"), col("doc_id"),
              tokenCount(col("text")).cast("long").as("n_tokens")),
          "source", "doc_id", "n_tokens", budget, buckets)
          .select("source", "bucket", "doc_id", "n_tokens", "first_chunk", "last_chunk")
          .orderBy("source", "bucket", "doc_id")
      },
      Some(s"""WITH keyed AS (SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST(${OracleSql.md5Fold52("'pack:' || CAST(doc_id AS VARCHAR)")} % 4 AS INT) AS bucket
             |  FROM documents)
             |SELECT source, bucket, doc_id, n_tokens,
             |  CAST(floor(off / 512) AS BIGINT) AS first_chunk,
             |  CAST(floor((off + n_tokens - 1) / 512) AS BIGINT) AS last_chunk
             |FROM (SELECT source, bucket, doc_id, n_tokens,
             |        coalesce(sum(n_tokens) OVER (
             |          PARTITION BY source, bucket ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
             |      FROM keyed)
             |ORDER BY source, bucket, doc_id""".stripMargin)),

    Q(
      "st31_stream_packing",
      (s, dir) => {
        // STREAMING sequence packing — p05's writer-side packing at
        // ingest (CorpusStream.packingStream): each (source, bucket)
        // sub-shard carries its running token offset as ONE long of
        // flatMapGroupsWithState state and assigns chunk spans as
        // documents land. The id-ordered feed (the append-log
        // contract) makes the drained assignment bit-identical to the
        // batch cumsum, so p05's oracle replays it verbatim under the
        // cap. Universe capped absolute (st25's discipline).
        implicit val sqlCtx = s.sqlContext
        implicit val rowEnc =
          org.apache.spark.sql.Encoders.product[
            graft.streaming.CorpusStream.PackInDoc]
        val rows = Tables(s, dir).documents.filter(col("doc_id") < 2000)
          .select(col("doc_id"), col("source"),
            tokenCount(col("text")).cast("long").as("n_tokens"))
          .orderBy("doc_id").collect()
          .map(r => graft.streaming.CorpusStream.PackInDoc(
            r.getLong(0), r.getString(1), r.getLong(2)))
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[graft.streaming.CorpusStream.PackInDoc]
        val q = Q.withHarnessPartitions(s) {
          graft.streaming.CorpusStream
            .packingStream(stream.toDS(), budget = 512, buckets = 4)
            .toDF()
            .writeStream.format("memory").queryName("st31_packed")
            .outputMode("append").start()
        }
        try {
          val chunk = math.max(1, (rows.length + 1) / 2)
          rows.grouped(chunk).foreach { batch =>
            stream.addData(batch.toIndexedSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        s.table("st31_packed")
          .select("source", "bucket", "doc_id", "n_tokens",
            "first_chunk", "last_chunk")
          .orderBy("source", "bucket", "doc_id")
      },
      Some(s"""WITH keyed AS (SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST(${OracleSql.md5Fold52("'pack:' || CAST(doc_id AS VARCHAR)")} % 4 AS INT) AS bucket
             |  FROM documents WHERE doc_id < 2000)
             |SELECT source, bucket, doc_id, n_tokens,
             |  CAST(floor(off / 512) AS BIGINT) AS first_chunk,
             |  CAST(floor((off + n_tokens - 1) / 512) AS BIGINT) AS last_chunk
             |FROM (SELECT source, bucket, doc_id, n_tokens,
             |        coalesce(sum(n_tokens) OVER (
             |          PARTITION BY source, bucket ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
             |      FROM keyed)
             |ORDER BY source, bucket, doc_id""".stripMargin)),

    Q(
      "t06_fingerprint",
      (s, dir) => {
        Tables(s, dir).documents
          .select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
             |  list_transform(string_split(text, ' '),
             |    tok -> ${OracleSql.polyFold("tok")} % 2147483647) AS hs
             |  FROM documents)
             |SELECT doc_id,
             |  (list_reduce(list_prepend(CAST(17 AS BIGINT), hs),
             |     (a, h) -> (a * 1000003 + h) % 2147483629) * 2147483648
             |   + list_reduce(list_prepend(CAST(19 AS BIGINT), hs),
             |     (b, h) -> (b * 1000033 + h) % 2147483647)) AS fingerprint
             |FROM t ORDER BY doc_id""".stripMargin)),

    Q(
      "st06_stream_approx_distinct",
      (s, dir) => {
        // The STREAMING HLL twin under the DuckDB oracle: t10's
        // per-language approximate distinct-token count computed as a
        // real streaming AGGREGATION (complete mode) over two id-ordered
        // MemoryStream micro-batches. The streaming state per (lang) is
        // the aggregate's own 4 KB register buffer — and because HLL
        // merge is an elementwise MAX (commutative + idempotent), the
        // final registers equal the batch aggregate's bit-for-bit under
        // ANY micro-batching or arrival order: the rare sketch whose
        // streaming estimate is hash-exact, not merely within error.
        // Corpus = the 500 base docs (SF-independent; ScaleGen replicas
        // sit at r*1e7). collect() is the MemoryStream feeding harness;
        // production uses readStream.
        import graft.functions.VectorExpressions.{hllDistinct, md5Hash52}
        implicit val sqlCtx = s.sqlContext
        implicit val rowEnc = org.apache.spark.sql.Encoders.product[(String, String)]
        val rows = Tables(s, dir).documents
          .filter(col("doc_id") < 500)
          .select(col("doc_id"), col("lang"), col("text"))
          .orderBy("doc_id")
          .collect().map(r => (r.getString(1), r.getString(2)))
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(String, String)]
        val q = Q.withHarnessPartitions(s) {
          stream.toDS().toDF("lang", "text")
            .select(col("lang"), explode(tokens(col("text"))).as("tok"))
            .select(col("lang"), md5Hash52(col("tok")).as("h"))
            .groupBy("lang")
            .agg(fround(hllDistinct(col("h")), 2).as("approx_distinct"))
            .writeStream.format("memory").queryName("st06_hll")
            .outputMode("complete").start()
        }
        try {
          val chunk = math.max(1, (rows.length + 1) / 2)
          rows.grouped(chunk).foreach { batch =>
            stream.addData(batch.toIndexedSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        // complete mode: the table IS the final snapshot
        s.table("st06_hll").orderBy("lang")
      },
      // t10's register/harmonic-sum/linear-counting replay, restricted
      // to the streamed slice and without the exact column (streaming
      // aggregations cannot do COUNT(DISTINCT))
      Some(s"""WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
             |  FROM documents WHERE doc_id < 500),
             |h AS (SELECT lang, tok,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(13), j ->
             |        CAST(strpos('0123456789abcdef', substr(md5(tok), j + 1, 1)) - 1 AS BIGINT))),
             |      (a, c) -> a * 16 + c) AS x
             |  FROM toks),
             |r AS (SELECT lang, x % 4096 AS b,
             |    max(CASE WHEN (x // 4096) = 0 THEN 41
             |             ELSE 41 - length(bin(x // 4096)) END) AS reg
             |  FROM h GROUP BY 1, 2),
             |regs AS (SELECT l.lang, t.range AS b, coalesce(r.reg, 0) AS reg
             |  FROM (SELECT DISTINCT lang FROM toks) l
             |  CROSS JOIN range(4096) t
             |  LEFT JOIN r ON r.lang = l.lang AND r.b = t.range),
             |s AS (SELECT lang,
             |    list_sum(list_transform(list(reg ORDER BY b), g -> pow(2.0, -g))) AS z,
             |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v
             |  FROM regs GROUP BY lang),
             |est AS (SELECT lang,
             |    CASE WHEN (0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 / z) <= 2.5 * 4096
             |           AND v > 0
             |         THEN 4096 * ln(4096 / v)
             |         ELSE 0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 / z END AS e
             |  FROM s)
             |SELECT lang, floor(e * 100.0 + 0.5) / 100.0 AS approx_distinct
             |FROM est ORDER BY lang""".stripMargin)),

    Q(
      "st07_stream_cms_heavy_hitters",
      (s, dir) => {
        // The STREAMING Count-Min twin under the DuckDB oracle: t11's
        // global 5×8192 bigram sketch built as a streaming aggregation
        // (complete mode) over two id-ordered micro-batches — state is
        // the aggregate's own 320 KB counter buffer, and CMS merge is
        // an elementwise ADD (commutative), so the drained sketch
        // equals the batch aggregate bit-for-bit under any
        // micro-batching. The drained state is then probed for the
        // slice's exact top-10 bigrams (batch-side post-processing of
        // the sink, like st05's rollup); estimates hash-match t11's
        // register replay restricted to the slice. Corpus = the 500
        // base docs (SF-independent); collect() is the MemoryStream
        // feeding harness.
        import graft.functions.VectorExpressions.{cmsEstimate, cmsSketch, polyHash}
        implicit val sqlCtx = s.sqlContext
        val rows = Tables(s, dir).documents
          .filter(col("doc_id") < 500)
          .select(col("doc_id"), col("text"))
          .orderBy("doc_id")
          .collect().map(_.getString(1))
        val stream = {
          import s.implicits._
          org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
        }
        val positions = when(size(col("toks")) >= 2,
          sequence(lit(1), size(col("toks")) - 1)).otherwise(array().cast("array<int>"))
        def bigramsOf(df: org.apache.spark.sql.DataFrame) = df
          .select(split(col("text"), " ").as("toks"))
          .select(col("toks"), explode(positions).as("pos"))
          .select(concat_ws(" ",
            element_at(col("toks"), col("pos")),
            element_at(col("toks"), col("pos") + 1)).as("bigram"))
        val q = Q.withHarnessPartitions(s) {
          bigramsOf(stream.toDS().toDF("text"))
            .agg(cmsSketch(polyHash(col("bigram"))).as("sk"))
            .writeStream.format("memory").queryName("st07_cms")
            .outputMode("complete").start()
        }
        try {
          val chunk = math.max(1, (rows.length + 1) / 2)
          rows.grouped(chunk).foreach { batch =>
            stream.addData(batch.toIndexedSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        bigramsOf(Tables(s, dir).documents.filter(col("doc_id") < 500))
          .groupBy("bigram").agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("bigram"))
          .limit(10)
          .crossJoin(broadcast(s.table("st07_cms")))
          .select(col("bigram"), col("exact_cnt"),
            cmsEstimate(col("sk"), polyHash(col("bigram"))).as("est_cnt"))
          .orderBy(col("exact_cnt").desc, col("bigram"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |expl AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS tok FROM toks),
             |big AS (SELECT a.tok || ' ' || b.tok AS bigram
             |  FROM expl a JOIN expl b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
             |counts AS (SELECT bigram, count(*) AS cnt,
             |    ${OracleSql.polyFold("bigram")} % 4294967296 AS x32
             |  FROM big GROUP BY bigram),
             |cp AS (SELECT ${OracleSql.coeffPairsLiteral(5, 99L)} AS c),
             |buckets AS (SELECT i.range AS r,
             |    ((c[i.range + 1][1] * x32 + c[i.range + 1][2]) % 2147483647) % 8192 AS bucket,
             |    CAST(sum(cnt) AS BIGINT) AS ctr
             |  FROM counts CROSS JOIN range(5) i CROSS JOIN cp
             |  GROUP BY 1, 2),
             |top AS (SELECT bigram, cnt, x32 FROM counts
             |        ORDER BY cnt DESC, bigram LIMIT 10)
             |SELECT t.bigram, t.cnt AS exact_cnt, min(b.ctr) AS est_cnt
             |FROM top t CROSS JOIN range(5) i CROSS JOIN cp
             |  JOIN buckets b ON b.r = i.range
             |    AND b.bucket = ((c[i.range + 1][1] * t.x32 + c[i.range + 1][2]) % 2147483647) % 8192
             |GROUP BY 1, 2 ORDER BY exact_cnt DESC, bigram""".stripMargin))
  )
}
