package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.gp.GPRegressor
import graft.gp.kernel.Kernels._

/**
 * A fitted GP model is an O(m²) broadcast object applied row-locally,
 * so `model.transform` composes directly with Structured Streaming —
 * train offline, score the stream. This is the deployment shape for
 * continuous scoring at ingest.
 */
class StreamingPredictSpec extends SparkTestBase {

  test("fitted GP model scores a structured stream row-identically to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(19)
    val train = Seq.tabulate(300) { i =>
      val x = 3.0 * i / 300.0
      (Array(x), math.sin(x) + 0.05 * rnd.nextGaussian())
    }.toDF("features", "label")
    val model = new GPRegressor()
      .setKernel(() => 1.0 * rbf(1.0)).setNoise(1e-3)
      .setExpertSize(100).setInducingSize(20).setMaxIter(15)
      .fit(train)

    val input = MemoryStream[(Long, Array[Double])]
    val scored = model.transform(
      input.toDF().toDF("id", "features"))
    val query = scored.writeStream.format("memory").queryName("gp_stream")
      .outputMode("append").start()
    try {
      val batch = Seq.tabulate(50)(i => (i.toLong, Array(3.0 * i / 50.0)))
      input.addData(batch: _*)
      query.processAllAvailable()
      val streamed = spark.table("gp_stream")
        .select("id", "prediction").as[(Long, Double)].collect().toMap
      val direct = model.transform(batch.toDF("id", "features"))
        .select("id", "prediction").as[(Long, Double)].collect().toMap
      assert(streamed == direct)
      assert(streamed.size == 50)
    } finally query.stop()
  }
}
