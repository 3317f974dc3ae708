package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev diagnostic: decompose ONE streaming query's wall time into its
 * harness phases (batch-side census/feed collects, stream start,
 * per-micro-batch, stop, sink drain) so optimization targets the phase
 * that actually costs. Hand-instrumented per query — st19's shape here
 * stands for the stateless-append family (st18/20/21/25-30/34/37/38).
 * Usage: StProfile [sfDir]
 */
object StProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.TmpWork.install("graft_stprof_")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.TmpWork.diskTmp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }

    def ph[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // ---- st19 decomposition, run twice (cold + warm) ----
    for (rep <- 1 to 2) {
      println(s"=== st19 rep $rep ===")
      import graft.streaming.CorpusStream
      implicit val sqlCtx = spark.sqlContext
      implicit val rowEnc =
        org.apache.spark.sql.Encoders.product[(Long, String)]
      import spark.implicits._
      val d = graft.tables.Tables(spark, sfDir).documents
      val grams = ph("benchmark census collect") {
        CorpusStream.benchmarkNGramSet(
            d.filter(col("doc_id") % 23 === 0 && col("doc_id") < 2000),
            "text", n = 4)
          .collect()(0).getSeq[String](0)
      }
      println(s"[info] grams.size = ${grams.size}")
      val rows = ph("feed collect") {
        d.filter(col("doc_id") % 23 =!= 0 && col("doc_id") < 2000)
          .orderBy("doc_id")
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
      }
      println(s"[info] feed rows = ${rows.length}")
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = ph("stream start") {
        CorpusStream.contaminationScoreStream(
            stream.toDS().toDF("doc_id", "text"), "doc_id", "text",
            grams, n = 4)
          .writeStream.format("memory").queryName(s"stp_scores_$rep")
          .outputMode("append").start()
      }
      try {
        val chunk = math.max(1, (rows.length + 1) / 2)
        var i = 0
        rows.grouped(chunk).foreach { batch =>
          i += 1
          ph(s"micro-batch $i") {
            stream.addData(batch.toIndexedSeq)
            q.processAllAvailable()
          }
        }
      } finally {
        q.recentProgress.foreach { p =>
          println(s"[progress] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}")
        }
        ph("stream stop") { q.stop() }
      }
      ph("sink drain count") {
        spark.table(s"stp_scores_$rep").orderBy("doc_id").count()
      }
    }

    // ---- st33 decomposition (stream-stream left outer join) ----
    for (rep <- 1 to 2) {
      println(s"=== st33 rep $rep ===")
      import graft.streaming.EventStreams
      implicit val sqlCtx = spark.sqlContext
      implicit val evEnc = org.apache.spark.sql.Encoders.product[EventStreams.Event]
      val ev = graft.tables.Tables(spark, sfDir).events
        .filter(col("user_id") < 500)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val clicks = ph("clicks collect") {
        ev.filter(col("event_type") === "click")
          .orderBy("ts", "event_id").as[EventStreams.Event](evEnc).collect()
      }
      val purchases = ph("purchases collect") {
        ev.filter(col("event_type") === "purchase")
          .orderBy("ts", "event_id").as[EventStreams.Event](evEnc).collect()
      }
      println(s"[info] clicks=${clicks.length} purchases=${purchases.length}")
      val allTs = (clicks.map(_.ts.getTime) ++ purchases.map(_.ts.getTime)).sorted
      val thr = allTs(allTs.length / 2)
      val maxTs = allTs.last
      val cStream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStreams.Event]
      val pStream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStreams.Event]
      val ckpt = java.nio.file.Files.createTempDirectory("stp33_ckpt").toString
      val q = graft.queries.Q.withHarnessPartitions(spark) {
        EventStreams.attributionJoin(cStream.toDF(), pStream.toDF(),
            leftOuter = true)
          .writeStream.format("memory").queryName(s"stp33_pairs_$rep")
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
      }
      try {
        var i = 0
        Seq(true, false).foreach { firstHalf =>
          i += 1
          ph(s"data round $i") {
            cStream.addData(clicks.filter(c => (c.ts.getTime <= thr) == firstHalf).toSeq)
            pStream.addData(purchases.filter(p => (p.ts.getTime <= thr) == firstHalf).toSeq)
            q.processAllAvailable()
          }
        }
        for (off <- Seq(72L, 73L)) {
          i += 1
          ph(s"sentinel round $i") {
            val sentinel = EventStreams.Event(-1L,
              new java.sql.Timestamp(maxTs + off * 3600L * 1000L), -1L, "noop", 0.0)
            cStream.addData(IndexedSeq(sentinel))
            pStream.addData(IndexedSeq(sentinel))
            q.processAllAvailable()
          }
        }
      } finally {
        q.recentProgress.foreach { p =>
          println(s"[progress] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}")
        }
        ph("stream stop") { q.stop() }
        graft.queries.deleteRecursively(ckpt)
      }
      ph("sink drain") {
        spark.table(s"stp33_pairs_$rep").filter(col("user_id") >= 0).count()
      }
    }
    spark.stop()
  }
}
