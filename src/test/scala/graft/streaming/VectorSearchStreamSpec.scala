package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Similarity

/**
 * Streaming ANN serving must be indistinguishable from the batch IVF
 * operator it serves: same centers, same probing, same scores, same
 * ranks — and it must add ZERO streaming state (the plan is explode →
 * stream-static join → row-local shard top-k; nothing watermarked,
 * nothing held back).
 */
class VectorSearchStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(83)
  private def vec(): Array[Double] = Array.fill(8)(rnd.nextDouble() - 0.5)

  test("streamed shard-local candidates merge to knnIvfWithCenters " +
      "row-identically; the plan holds zero streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (100L until 180L).map(i => (i, vec()))
    val queries = (0L until 6L).map(i => (i, vec()))
    val centers = corpus.take(5).map(_._2).toArray
    val corpusDf = corpus.toDF("vec_id", "v")

    val batch = Similarity.knnIvfWithCenters(
        queries.toDF("vec_id", "v"), corpusDf, "vec_id", "v",
        k = 3, centers, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val lists = VectorSearchStream.invertedLists(
      corpusDf, "vec_id", "v", centers)
    val input = MemoryStream[(Long, Array[Double])]
    val q = VectorSearchStream.probeStream(
        input.toDS().toDF("vec_id", "v"), "vec_id", "v",
        lists, centers, nprobe = 2, k = 3)
      .writeStream.format("memory").queryName("vss_hits")
      .outputMode("append").start()
    try {
      queries.grouped(3).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      // stateless: no stateful operator registered at all
      val state = q.lastProgress.stateOperators
      assert(state == null || state.isEmpty,
        s"streaming state leaked: ${state.mkString(",")}")
    } finally q.stop()

    val merged = spark.table("vss_hits").groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), col("cos"), 3).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(merged == batch,
      s"missing=${(batch -- merged).take(5)} extra=${(merged -- batch).take(5)}")
    assert(batch.nonEmpty)
  }

  test("shard-local truncation loses nothing: per-cell top-k covers the " +
      "global top-k even when one cell holds all winners") {
    implicit val sqlCtx = spark.sqlContext
    // all corpus vectors near +e1 land in one cell; the query near +e1
    // must get its global top-3 entirely from that cell's local top-3
    val e1 = Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val corpus = (100L until 140L).map { i =>
      (i, Array.tabulate(8)(d => (if (d == 0) 1.0 else 0.0) +
        0.01 * ((i * 7 + d) % 13)))
    }
    val centers = Array(e1, Array.fill(8)(-1.0))
    val lists = VectorSearchStream.invertedLists(
      corpus.toDF("vec_id", "v"), "vec_id", "v", centers)
    val input = MemoryStream[(Long, Array[Double])]
    val q = VectorSearchStream.probeStream(
        input.toDS().toDF("vec_id", "v"), "vec_id", "v",
        lists, centers, nprobe = 1, k = 3)
      .writeStream.format("memory").queryName("vss_hot")
      .outputMode("append").start()
    try {
      input.addData((0L, e1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("vss_hot").collect()
    assert(got.length == 3, s"shard-local top-3 expected, got ${got.length}")
    // candidates arrive cos-descending under the struct(-cos, id) sort
    val cosSeq = spark.table("vss_hot").orderBy(col("cos").desc)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    val brute = Similarity.knnBruteForce(
        Seq((0L, e1)).toDF("vec_id", "v"),
        corpus.toDF("vec_id", "v"), "vec_id", "v", k = 3)
      .orderBy("rank").select("neighbor_id")
      .collect().map(_.getLong(0)).toSeq
    assert(cosSeq == brute, s"got $cosSeq want $brute")
  }
}
