package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.graftshim.KllState

import graft.SparkTestBase
import graft.streaming.StatsStream._

class StatsStreamSpec extends SparkTestBase {

  test("running quantiles accumulate across micro-batches within KLL rank error") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // two keys with different scales; values arrive over three batches
    val a = Array.fill(3000)(rnd.nextDouble() * 100.0)
    val b = Array.fill(3000)(50.0 + rnd.nextDouble() * 1000.0)
    val batches = (a.map(Measure("a", _)) ++ b.map(Measure("b", _)))
      .grouped(2000).toSeq

    val input = MemoryStream[Measure]
    val query = runningQuantiles(input.toDS())
      .writeStream.format("memory").queryName("quants").outputMode("update").start()
    try {
      batches.foreach { batch => input.addData(batch.toSeq); query.processAllAvailable() }

      // the LAST update per key is the full-stream estimate
      val last = spark.table("quants").as[QuantileEstimate].collect()
        .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.n) }
      assert(last("a").n == 3000L && last("b").n == 3000L)

      def rankOf(xs: Array[Double], v: Double): Double =
        xs.count(_ <= v).toDouble / xs.length
      for ((key, xs) <- Seq("a" -> a, "b" -> b)) {
        val est = last(key)
        for ((p, v) <- Seq(0.5 -> est.p50, 0.9 -> est.p90, 0.99 -> est.p99))
          assert(math.abs(rankOf(xs, v) - p) <= 0.03,
            s"$key p$p estimate $v at rank ${rankOf(xs, v)}")
      }
    } finally query.stop()
  }

  test("streaming state bytes seed the batch sketch (shared format)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Measure]
    val query = runningQuantiles(input.toDS(), k = 64)
      .writeStream.format("memory").queryName("seeded").outputMode("update").start()
    try {
      input.addData((1 to 500).map(i => Measure("k", i.toDouble)))
      query.processAllAvailable()
      val est = spark.table("seeded").as[QuantileEstimate].collect().maxBy(_.n)
      // round-trip through the shared byte format preserves the estimate
      val st = KllState.fromBytes(KllState.toBytes({
        val s = new KllState(64); (1 to 500).foreach(i => s.insert(i.toDouble)); s
      }))
      assert(math.abs(st.quantiles(Array(0.5))(0) - est.p50) <= 500 * 0.1,
        "batch-built and stream-built sketches must agree to within rank error")
    } finally query.stop()
  }
}
