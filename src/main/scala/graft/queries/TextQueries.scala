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
        // posexplode + windowed lead keeps bigram assembly codegen'd
        // (the HOF wordNGrams variant interprets a lambda per token).
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        Tables(s, dir).documents
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .select(col("doc_id"), col("w"), lead(col("w"), 1).over(w).as("w1"))
          .filter(col("w1").isNotNull)
          .select(concat_ws(" ", col("w"), col("w1")).as("bigram"))
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
      "t05_lang_id",
      (s, dir) => langId(Tables(s, dir).documents).orderBy("doc_id")),

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
      "t06_fingerprint",
      (s, dir) => {
        Tables(s, dir).documents
          .select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))
          .orderBy("doc_id")
      })
  )
}
