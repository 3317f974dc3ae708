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

  test("enrichedSegmentTotals: cross-batch window merge, non-member drop, cents exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "AUTO"), (11L, "HOUSE")).toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[Event]
    val query = enrichedSegmentTotals(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      // batch 1: two AUTO + one HOUSE in hour 10; user 99 not in the
      // dim — the inner join must drop it
      input.addData(
        Event(1, tsH(10, 5), 10, "view", 1.004),  // 100 cents (floor .4)
        Event(2, tsH(10, 40), 10, "view", 2.006), // 201 cents (round .6)
        Event(3, tsH(10, 20), 11, "view", 5.0),
        Event(4, tsH(10, 30), 99, "view", 100.0))
      query.processAllAvailable()
      // batch 2: hour 10 gets a LATE-batch AUTO contribution (state
      // must merge across the feed boundary), hour 11 opens
      input.addData(
        Event(5, tsH(10, 55), 10, "view", 0.5),
        Event(6, tsH(11, 10), 11, "view", 3.0))
      query.processAllAvailable()
      // flush: advance the watermark past every real window (emission
      // uses the previous batch's watermark — two steps, st09's move)
      input.addData(Event(7, tsH(20, 0), 10, "flush", 0.0))
      query.processAllAvailable()
      input.addData(Event(8, tsH(21, 0), 10, "flush", 0.0))
      query.processAllAvailable()
      val rows = spark.table("enrich")
        .as[(String, Long, Long, Long)].collect().toSet
      def us(h: Int): Long =
        tsH(h, 0).getTime * 1000L
      assert(rows == Set(
        ("AUTO", us(10), 3L, 351L),  // 100 + 201 + 50, both batches
        ("HOUSE", us(10), 1L, 500L),
        ("HOUSE", us(11), 1L, 300L)), s"got $rows")
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

  test("stream-stream attribution join matches the batch join across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = attributionJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      // clicks and purchases arrive in DIFFERENT micro-batches; the
      // purchase at 10:30 must still see the 10:00 click (within 1h)
      clicks.addData(
        Event(1, tsH(10, 0), 7, "click", 0.0),
        Event(2, tsH(10, 20), 7, "click", 0.0),
        Event(3, tsH(9, 0), 7, "click", 0.0), // >1h before: excluded
        Event(4, tsH(10, 10), 8, "click", 0.0)) // other user: excluded
      query.processAllAvailable()
      purchases.addData(Event(10, tsH(10, 30), 7, "purchase", 42.0))
      query.processAllAvailable()
      val got = spark.table("attr")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L), (10L, 2L)))

      // batch twin over the same rows produces the identical pair set
      val all = Seq(
        Event(1, tsH(10, 0), 7, "click", 0.0), Event(2, tsH(10, 20), 7, "click", 0.0),
        Event(3, tsH(9, 0), 7, "click", 0.0), Event(4, tsH(10, 10), 8, "click", 0.0),
        Event(10, tsH(10, 30), 7, "purchase", 42.0))
      val df = all.toDF()
      val batch = df.filter(col("event_type") === "purchase").as("p")
        .join(df.filter(col("event_type") === "click").as("c"),
          expr("""c.user_id = p.user_id AND
                  c.ts >= p.ts - INTERVAL 3600 SECONDS AND c.ts <= p.ts"""))
        .select(col("p.event_id"), col("c.event_id")).as[(Long, Long)].collect().toSet
      assert(batch == got)
    } finally query.stop()
  }

  test("streaming quality audit: per-type counters equal the batch audit " +
      "across micro-batches; orphans count instead of dropping") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(7L, 8L, 9L).toDF("c_custkey")
    // planted: event 2 is an fk orphan (user 99), event 3 a range
    // violation, event 5 BOTH — across two micro-batches
    val evs = Seq(
      Event(1, ts(1), 7, "view", 1.0), Event(2, ts(2), 99, "view", 2.0),
      Event(3, ts(3), 8, "click", -5.0), Event(4, ts(4), 9, "click", 0.5),
      Event(5, ts(5), 42, "view", -1.0), Event(6, ts(6), 7, "purchase", 3.0))
    val input = MemoryStream[Event]
    def audit(df: org.apache.spark.sql.DataFrame) = df
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("fk_orphans"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("range_violations"))
    val query = audit(input.toDF())
      .writeStream.format("memory").queryName("sq_audit")
      .outputMode("complete").start()
    try {
      input.addData(evs.take(3))
      query.processAllAvailable()
      input.addData(evs.drop(3))
      query.processAllAvailable()
      val got = spark.table("sq_audit").orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // exact planted classes: view has 3 events / 2 orphans / 1 neg,
      // click 2/0/1, purchase 1/0/0 — the orphan rows were COUNTED,
      // not dropped by the dim join
      assert(got.toSeq == Seq(("click", 2L, 0L, 1L), ("purchase", 1L, 0L, 0L),
        ("view", 3L, 2L, 1L)))
      // batch twin on the same rows is identical
      val batch = audit(evs.toDF()).orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(batch.toSeq == got.toSeq, "stream snapshot must equal batch audit")
    } finally query.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases after watermark expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = attributionJoin(clicks.toDF(), purchases.toDF(), leftOuter = true)
      .writeStream.format("memory").queryName("attr_lo").outputMode("append").start()
    try {
      purchases.addData(Event(20, tsH(10, 0), 9, "purchase", 7.0)) // no click ever
      clicks.addData(Event(21, tsH(10, 1), 11, "click", 0.0))
      query.processAllAvailable()
      // nothing can be emitted for the unmatched purchase until the
      // watermark passes its window
      assert(!spark.table("attr_lo").as[(Long, Long, Timestamp, Double, java.lang.Long, Timestamp)]
        .collect().exists(_._2 == 20L))
      // advance both watermarks far beyond 10:00 + tolerance
      purchases.addData(Event(30, tsH(15, 0), 99, "purchase", 1.0))
      clicks.addData(Event(31, tsH(15, 0), 99, "click", 0.0))
      query.processAllAvailable()
      purchases.addData(Event(32, tsH(16, 0), 99, "purchase", 1.0))
      clicks.addData(Event(33, tsH(16, 0), 99, "click", 0.0))
      query.processAllAvailable()
      val unmatched = spark.table("attr_lo")
        .filter(col("purchase_id") === 20L).collect()
      assert(unmatched.length == 1)
      assert(unmatched.head.isNullAt(4), "click_id must be null-padded")
    } finally query.stop()
  }

  /** Run markovCensusStream over the given micro-batches (plus the
    * two watermark-advancing sentinel close-out batches) and return
    * the drained edge BAG as a sorted seq. */
  private def markovBag(name: String,
      batches: Seq[Seq[Event]]): Seq[(Long, String, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = markovCensusStream(input.toDS(),
        channels = Seq("click", "error", "signup", "view"))
      .toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        query.processAllAvailable()
      }
      // st09's flush pattern: the first sentinel advances the
      // watermark past every journey's close-out, the second's
      // processing fires the timeouts; 'noop' is ignored in-operator
      for (h <- Seq(18, 19)) {
        input.addData(Event(-1, tsH(h, 0), -1L, "noop", 0.0))
        query.processAllAvailable()
      }
      spark.table(name).as[(Long, String, String)].collect().toSeq.sorted
    } finally query.stop()
  }

  test("markovCensusStream: gap split, conversion absorption, timeout " +
      "drop edges — and the census is micro-batch-cut invariant") {
    // time-ordered feed (the append-log contract):
    //   10:00 u10 view | 10:01 u12 purchase | 10:05 u11 click
    //   10:10 u11 purchase | 10:20 u11 view | 10:30 u10 click
    //   12:40 u10 view
    // u10: the 2h10m gap closes journey 1 with click->drop; journey 2
    //      (the 12:40 view) ends view->drop at timeout.
    // u11: converts at 10:10; the 10:20 view is absorbed forever.
    // u12: lone purchase -> start->conv, no drop.
    val evs = Seq(
      Event(1, tsH(10, 0), 10, "view", 0.0),
      Event(7, tsH(10, 1), 12, "purchase", 0.0),
      Event(4, tsH(10, 5), 11, "click", 0.0),
      Event(5, tsH(10, 10), 11, "purchase", 0.0),
      Event(6, tsH(10, 20), 11, "view", 0.0),
      Event(2, tsH(10, 30), 10, "click", 0.0),
      Event(3, tsH(12, 40), 10, "view", 0.0))
    val expected = Seq(
      (10L, "start", "view"), (10L, "view", "click"), (10L, "click", "drop"),
      (10L, "start", "view"), (10L, "view", "drop"),
      (11L, "start", "click"), (11L, "click", "conv"),
      (12L, "start", "conv")).sorted
    val oneBatch = markovBag("mk_one", Seq(evs))
    assert(oneBatch == expected, s"got $oneBatch")
    // the SAME census when the feed cuts mid-journey (after 10:10 and
    // after 10:30 — both inside running journeys): the in-fold gap
    // check + per-user state carry make the cuts invisible
    val threeBatches = markovBag("mk_three",
      Seq(evs.take(4), evs.slice(4, 6), evs.drop(6)))
    assert(threeBatches == oneBatch,
      s"micro-batch cut moved the census: $threeBatches vs $oneBatch")
  }

  test("markovCensusStream: a batch of only ignored event types must NOT " +
      "cancel an open journey's close-out timeout (GroupState re-arm)") {
    // u20 opens a journey; a later batch delivers ONLY an in-operator-
    // ignored 'noop' row for u20 — GroupState clears a stored timeout
    // on any invocation that does not re-set it, so without the
    // re-arm the view->drop edge would silently never emit
    val got = markovBag("mk_noop", Seq(
      Seq(Event(1, tsH(10, 0), 20, "view", 0.0)),
      Seq(Event(2, tsH(10, 10), 20, "noop", 0.0))))
    assert(got == Seq((20L, "start", "view"), (20L, "view", "drop")).sorted,
      s"got $got")
  }
}
