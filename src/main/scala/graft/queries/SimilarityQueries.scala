package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Similarity._
import graft.tables.Tables

/** Similarity-search pack over the `embeddings` table. */
object SimilarityQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "a01_knn_bruteforce",
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        knnBruteForce(
          e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
          "vec_id", "embedding", k = 5)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
             |           FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
             |      FROM embeddings WHERE vec_id >= 10),
             |sims AS (SELECT qid, nid,
             |    list_sum(list_transform(list_zip(qv, cv), x -> x[1] * x[2]))
             |      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
             |         * sqrt(list_sum(list_transform(cv, x -> x * x)))) AS cos
             |  FROM q, c)
             |SELECT qid AS query_id, CAST(rn AS INT) AS rank, nid AS neighbor_id
             |FROM (SELECT qid, nid,
             |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
             |      FROM sims)
             |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q(
      "a02_knn_lsh",
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        knnLsh(
          e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
          "vec_id", "embedding", k = 5, dim = 64)
          .select(col("query_id"), col("rank"), col("neighbor_id"), fround(col("cos"), 4).as("cos"))
          .orderBy("query_id", "rank")
      })
  )
}
