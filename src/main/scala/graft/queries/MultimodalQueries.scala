package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Similarity
import graft.tables.Tables

/** Multimodal pack — binary payload plumbing with a stubbed decoder. */
object MultimodalQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "mm01_binary_features",
      (s, dir) => {
        val media = Multimodal.packAsMedia(Tables(s, dir).documents, "doc_id", "text")
        Multimodal.extractFeatures(media)
          .toDF()
          .select(
            col("media_id"), col("kind"), col("n_bytes"),
            fround(Similarity.norm(col("feature")), 6).as("feature_norm"))
          .orderBy("media_id")
      },
      // The stub decoder is deterministic byte math, so even it is
      // oracle-checkable: the corpus is ASCII, so UTF-8 payload bytes
      // == codepoints and DuckDB reproduces the 8-bin histogram
      // features (same left-to-right summation order) exactly.
      Some("""WITH codes AS (SELECT doc_id,
             |    list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))) AS cs,
             |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |    greatest(length(text), 1) AS n
             |  FROM documents),
             |f AS (SELECT doc_id, n_bytes,
             |    list_transform(range(8), j ->
             |      coalesce(list_sum(list_transform(list_filter(cs, c -> c % 8 = j),
             |        c -> c / 255.0)), 0.0) / n) AS feats
             |  FROM codes)
             |SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
             |  n_bytes,
             |  floor(sqrt(list_sum(list_transform(feats, x -> x * x))) * 1000000.0 + 0.5)
             |    / 1000000.0 AS feature_norm
             |FROM f ORDER BY media_id""".stripMargin))
  )
}
