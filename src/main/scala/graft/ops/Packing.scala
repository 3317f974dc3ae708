package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Causal-LM sequence packing (concat-and-chunk): documents concatenate
 * in id order and cut every `budget` tokens; a document whose running
 * offset is `off` spans chunks [floor(off/budget),
 * floor((off+len-1)/budget)].
 *
 * Scale posture: the running offset is a window partitioned by
 * (shard, hash-bucket), NOT by shard alone — a corpus with 5 sources
 * would otherwise pack as 5 sequential global cumsums however many
 * executors exist. The sub-shard key adds a deterministic hash bucket
 * of the document id (`buckets` is the parallelism parameter: size it
 * to writer-task count), so every sub-shard packs independently and
 * chunk boundaries stay capacity-exact WITHIN each sub-shard — which
 * is the semantics real pipelines want anyway: each writer task owns a
 * self-contained stream of full `budget`-token chunks (only the last
 * chunk of each sub-shard runs short). The bucket is pure hash
 * arithmetic over the stable id (engine/rerun reproducible, no rand).
 */
object Packing {

  /** Salted portable hash bucket in [0, buckets). */
  def shardBucket(idCol: org.apache.spark.sql.Column, buckets: Int) =
    pmod(graft.functions.VectorExpressions.md5Hash52(
      concat(lit("pack:"), idCol.cast("string"))), lit(buckets.toLong)).cast("int")

  /** Scala-side twin of [[shardBucket]] for typed streaming groupers
    * (st31's `groupByKey` runs on deserialized rows, not columns) —
    * bit-identical: the first 52 bits of md5("pack:" + id) mod
    * `buckets`, the d15 no-drift rule applied to the packing plane. */
  def shardBucketLocal(id: Long, buckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pack:$id".getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) |
      ((d(2) & 0xffL) << 28) | ((d(3) & 0xffL) << 20) |
      ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) | ((d(6) & 0xf0L) >>> 4)
    (h % buckets).toInt
  }

  /**
   * `docs` (shardCol, idCol, tokensCol) + (bucket, first_chunk,
   * last_chunk): within each (shardCol, bucket) sub-shard, documents
   * concatenate in idCol order and cut every `budget` tokens.
   */
  def packChunks(docs: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, budget: Int, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0, s"budget=$budget buckets=$buckets")
    val w = Window.partitionBy(col(shardCol), col("bucket")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("bucket", shardBucket(col(idCol), buckets))
      .withColumn("off", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("first_chunk", floor(col("off") / budget).cast("long"))
      .withColumn("last_chunk",
        floor((col("off") + col(tokensCol) - 1) / budget).cast("long"))
  }
}
