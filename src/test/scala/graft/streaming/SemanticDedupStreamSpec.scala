package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.streaming.SemanticDedupStream._

class SemanticDedupStreamSpec extends SparkTestBase {

  private val Dim = 16

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** Random unit-ish vectors plus planted near-duplicates (tiny
    * perturbations of earlier rows — cosine ≈ 1 ≫ τ). */
  private def corpus(): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(17)
    val base = (0L until 40L).map { i =>
      (i, Array.fill(Dim)(rnd.nextGaussian()))
    }
    val dups = base.take(8).map { case (i, v) =>
      (1000L + i, v.map(x => x + rnd.nextGaussian() * 1e-3))
    }
    base ++ dups
  }

  test("row-local bucketKey bit-matches the native HyperplaneKey column") {
    import spark.implicits._
    val data = corpus()
    val df = data.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
    for (t <- 0 until 3) {
      val seed = 5L + t
      val batch = df.select(col("vec_id"),
        graft.ops.Similarity.hyperplaneKey(col("v"), Dim, planes = 6, seed = seed)
          .as("bucket"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val planes = graft.ops.Similarity.hyperplaneCoeffs(Dim, 6, seed)
        .map(_.toArray).toArray
      data.foreach { case (id, v) =>
        assert(bucketKey(v, planes) == batch(id), s"bucket mismatch for vec $id table $t")
      }
    }
  }

  test("streaming candidates across micro-batches equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = corpus()
    val (first, second) = all.splitAt(44) // dups of vecs 4..7 arrive later
    val stream = MemoryStream[Vec]
    val query = candidatePairs(stream.toDS(), threshold = 0.3, dim = Dim,
        planes = 6, tables = 4, seed = 5L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sem_cand").outputMode("append").start()
    try {
      stream.addData(first.map { case (id, v) => Vec(id, v, ts(1)) })
      query.processAllAvailable()
      stream.addData(second.map { case (id, v) => Vec(id, v, ts(2)) })
      query.processAllAvailable()

      val got = spark.table("sem_cand")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batchDf = all.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
      val want = graft.ops.Dedup.cosineCandidatePairs(batchDf, "vec_id", "v",
        threshold = 0.3, dim = Dim, planes = 6, tables = 4, seed = 5L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"stream=${got.size} batch=${want.size} " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      // the planted near-dups were found, including the cross-batch ones
      for (i <- 4L until 8L) assert(got.contains((i, 1000L + i)), s"missing pair $i")
    } finally query.stop()
  }

  test("oversized bucket stars to the minimum with bounded emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one shared direction -> everything lands in the same bucket in
    // every table; cap 4 forces the star path for rows 4..19
    val rnd = new scala.util.Random(3)
    val dir = Array.fill(Dim)(rnd.nextGaussian())
    val all = (0L until 20L).map { i =>
      (i, dir.map(x => x * (1.0 + 1e-4 * i)))
    }
    val stream = MemoryStream[Vec]
    val query = candidatePairs(stream.toDS(), threshold = 0.3, dim = Dim,
        planes = 4, tables = 1, seed = 5L, watermark = "10 minutes", maxBucket = 4)
      .writeStream.format("memory").queryName("sem_star").outputMode("append").start()
    try {
      // min id arrives first, so the streaming star anchor (current
      // membership minimum) equals the batch anchor (global minimum)
      stream.addData(all.map { case (id, v) => Vec(id, v, ts(1)) })
      query.processAllAvailable()
      val got = spark.table("sem_star")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // full membership would be C(20,2)=190 pairs; capped: C(4,2)=6
      // in-bucket pairs + 16 star edges to id 0
      val star = (4L until 20L).map(i => (0L, i)).toSet
      val inBucket = (for (a <- 0L until 4L; b <- (a + 1) until 4L) yield (a, b)).toSet
      assert(got == star ++ inBucket, s"got ${got.size} pairs: $got")
      // still connects every row into one component despite the cap
      val comp = graft.ops.Dedup.connectedComponents(
        spark.table("sem_star").select("id_a", "id_b").distinct())
      assert(comp.select("component").distinct().count() == 1L)
    } finally query.stop()
  }
}
