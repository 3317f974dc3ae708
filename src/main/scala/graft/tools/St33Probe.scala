package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r14 verdict's st33 cost question: is the 4.9 s
  * idle reading the OUTER-JOIN OPERATOR or the sentinel-flush harness
  * constant? Runs st33's exact MemoryStream harness (same slice, same
  * time-split feed, same 4-partition cap, same tmpfs checkpoint)
  * three ways and prints each wall time + micro-batch count:
  *   full    — 2 data batches + 2 sentinel flush batches (st33 as-is)
  *   nosent  — the 2 data batches only (operator cost; outer rows
  *             withheld, so the result is incomplete BY DESIGN)
  *   empty   — sentinels only on empty streams (pure batch/commit
  *             constant: state stores spin up, nothing flows)
  * Usage: St33Probe [sfDir]. */
object St33Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.TmpWork.install("graft_st33probe_")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", graft.TmpWork.diskTmp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.range(100000).selectExpr("sum(id)").collect()

    import graft.streaming.EventStreams
    implicit val sqlCtx = s.sqlContext
    implicit val evEnc = org.apache.spark.sql.Encoders.product[EventStreams.Event]
    val ev = graft.tables.Tables(s, dir).events.filter(col("user_id") < 500)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .orderBy("ts", "event_id").as[EventStreams.Event](evEnc).collect()
    val purchases = ev.filter(col("event_type") === "purchase")
      .orderBy("ts", "event_id").as[EventStreams.Event](evEnc).collect()
    val allTs = (clicks.map(_.ts.getTime) ++ purchases.map(_.ts.getTime)).sorted
    val thr = allTs(allTs.length / 2)
    val maxTs = allTs.last

    def run(tag: String, feedData: Boolean, feedSentinels: Boolean): Unit = {
      val cStream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStreams.Event]
      val pStream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStreams.Event]
      val ckpt = java.nio.file.Files.createTempDirectory("st33probe_").toString
      val t0 = System.nanoTime()
      val q = graft.queries.Q.withHarnessPartitions(s) {
        EventStreams.attributionJoin(cStream.toDF(), pStream.toDF(),
            leftOuter = true)
          .writeStream.format("memory").queryName(s"st33probe_$tag")
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
      }
      try {
        if (feedData) Seq(true, false).foreach { firstHalf =>
          cStream.addData(clicks.filter(c => (c.ts.getTime <= thr) == firstHalf).toSeq)
          pStream.addData(purchases.filter(p => (p.ts.getTime <= thr) == firstHalf).toSeq)
          q.processAllAvailable()
        }
        if (feedSentinels) for (off <- Seq(72L, 73L)) {
          val sentinel = EventStreams.Event(-1L,
            new java.sql.Timestamp(maxTs + off * 3600L * 1000L), -1L, "noop", 0.0)
          cStream.addData(IndexedSeq(sentinel))
          pStream.addData(IndexedSeq(sentinel))
          q.processAllAvailable()
        }
        val rows = s.table(s"st33probe_$tag").count()
        val batches = q.recentProgress.length
        println(f"$tag%-7s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
          f"$rows%6d rows  $batches batches")
      } finally {
        q.stop()
        graft.queries.deleteRecursively(ckpt)
      }
    }
    // warm the streaming machinery once so the first measured run does
    // not pay one-time class-load/codegen costs
    run("warm", feedData = false, feedSentinels = true)
    run("full", feedData = true, feedSentinels = true)
    run("nosent", feedData = true, feedSentinels = false)
    run("empty", feedData = false, feedSentinels = true)
    s.stop()
  }
}
