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
      })
  )
}
