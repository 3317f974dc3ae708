package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreams._

class EventStreamsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("windowed counts aggregate per 10-minute window and type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(1), 10, "view", 1.0),
        Event(2, ts(4), 10, "view", 2.0),
        Event(3, ts(11), 11, "click", 5.0),
        Event(4, ts(12), 10, "view", 3.0))
      query.processAllAvailable()
      val rows = spark.table("wc")
        .select(col("window.start").cast("string"), col("event_type"), col("cnt"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "view", 2L, 3.0),
        ("2024-01-01 10:10:00", "click", 1L, 5.0),
        ("2024-01-01 10:10:00", "view", 1L, 3.0)))
    } finally query.stop()
  }

  test("sessionize splits on 30-minute gaps and closes timed-out sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // session 0: two events close together; then a >30min gap -> session 1
      input.addData(
        Event(1, tsH(10, 0), 7, "view", 1.0),
        Event(2, tsH(10, 5), 7, "click", 1.0))
      query.processAllAvailable()
      input.addData(Event(3, tsH(11, 0), 7, "view", 1.0))
      query.processAllAvailable()
      // advance the watermark far ahead so user 7's state times out
      input.addData(Event(9, tsH(15, 0), 99, "view", 1.0))
      query.processAllAvailable()
      input.addData(Event(10, tsH(16, 0), 99, "view", 1.0))
      query.processAllAvailable()

      val rows = spark.table("sess").as[SessionUpdate].collect()
      val u7 = rows.filter(_.user_id == 7)
      // open update for session 0, closed session 0, open+closed session 1
      assert(u7.contains(SessionUpdate(7, 0, 2, closed = false)))
      assert(u7.contains(SessionUpdate(7, 0, 2, closed = true)))
      assert(u7.exists(u => u.session_id == 1 && u.n_events == 1))
      assert(u7.exists(u => u.session_id == 1 && u.closed))
    } finally query.stop()
  }
}
