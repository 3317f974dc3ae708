package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.AsOfStream._

class AsOfStreamSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def micros(minute: Int): Long = ts(minute).getTime * 1000L

  test("streaming as-of attaches the latest reference at or before each probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Probe]
    val refs = MemoryStream[Ref]
    val query = asofJoin(probes.toDS(), refs.toDS())
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      // batch 1: two refs then probes around them
      refs.addData(Ref(1, ts(0), 100.0), Ref(1, ts(10), 110.0), Ref(2, ts(5), 5.5))
      probes.addData(
        Probe(1, ts(4), 41L),   // -> ref at :00
        Probe(1, ts(10), 42L),  // -> ref at :10 (inclusive)
        Probe(1, ts(15), 43L),  // -> ref at :10
        Probe(2, ts(4), 44L),   // before any ref of key 2 -> null match
        Probe(3, ts(4), 45L))   // key with no refs at all -> null match
      query.processAllAvailable()

      // batch 2: ref state persists across batches; newer ref wins
      refs.addData(Ref(1, ts(20), 120.0))
      probes.addData(Probe(1, ts(25), 46L), Probe(2, ts(6), 47L))
      query.processAllAvailable()

      val got = spark.table("asof")
        .as[Match].collect().map(m => m.probe_id -> ((m.ref_ts_micros, m.ref_payload))).toMap
      assert(got(41L) == ((Some(micros(0)), Some(100.0))))
      assert(got(42L) == ((Some(micros(10)), Some(110.0))))
      assert(got(43L) == ((Some(micros(10)), Some(110.0))))
      assert(got(44L) == ((None, None)))
      assert(got(45L) == ((None, None)))
      assert(got(46L) == ((Some(micros(20)), Some(120.0))))
      assert(got(47L) == ((Some(micros(5)), Some(5.5))))
      assert(got.size == 7)
    } finally query.stop()
  }

  test("tolerance nulls out stale references, matching the batch contract") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Probe]
    val refs = MemoryStream[Ref]
    val query = asofJoin(probes.toDS(), refs.toDS(), toleranceSec = Some(5 * 60L))
      .writeStream.format("memory").queryName("asoftol").outputMode("append").start()
    try {
      refs.addData(Ref(1, ts(0), 100.0), Ref(1, ts(12), 112.0))
      probes.addData(
        Probe(1, ts(4), 41L),   // 4 min after :00 ref -> within tolerance
        Probe(1, ts(9), 42L),   // 9 min after :00 ref -> stale, null match
        Probe(1, ts(12), 43L),  // exactly at :12 ref -> within
        Probe(1, ts(17), 44L))  // 5 min after :12 -> boundary, within
      query.processAllAvailable()
      val got = spark.table("asoftol")
        .as[Match].collect().map(m => m.probe_id -> m.ref_payload).toMap
      assert(got(41L) == Some(100.0))
      assert(got(42L) == None, "match older than the tolerance must be nulled")
      assert(got(43L) == Some(112.0))
      assert(got(44L) == Some(112.0))
    } finally query.stop()
  }

  test("reference buffer prunes below the watermark but keeps the newest usable ref") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Probe]
    val refs = MemoryStream[Ref]
    // short watermark so the horizon advances within the test
    val query = asofJoin(probes.toDS(), refs.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_prune").outputMode("append").start()
    try {
      refs.addData(Ref(1, ts(0), 100.0), Ref(1, ts(2), 102.0))
      probes.addData(Probe(1, ts(3), 1L))
      query.processAllAvailable()
      // advance event time far past the old refs; the newest-at-or-below
      // -horizon ref (=:02) must still be matchable for later probes
      refs.addData(Ref(1, ts(40), 140.0))
      probes.addData(Probe(1, ts(39), 2L))
      query.processAllAvailable()
      probes.addData(Probe(1, ts(41), 3L))
      query.processAllAvailable()

      val got = spark.table("asof_prune")
        .as[Match].collect().map(m => m.probe_id -> m.ref_payload).toMap
      assert(got(1L) == Some(102.0))
      assert(got(2L) == Some(102.0)) // pruning must not lose the prevailing ref
      assert(got(3L) == Some(140.0))
    } finally query.stop()
  }

  test("emitFinal applies a late reference that arrives after the probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Probe]
    val refs = MemoryStream[Ref]
    val query = asofJoin(probes.toDS(), refs.toDS(), watermark = "5 minutes",
      emitFinal = true)
      .writeStream.format("memory").queryName("asof_final").outputMode("append").start()
    try {
      // probe arrives FIRST; in arrival-order mode it would match :00
      refs.addData(Ref(1, ts(0), 100.0))
      probes.addData(Probe(1, ts(10), 1L))
      query.processAllAvailable()
      assert(spark.table("asof_final").isEmpty,
        "probe must stay buffered until the watermark passes its event time")
      // the BETTER reference (:08 <= :10) arrives later, within watermark
      refs.addData(Ref(1, ts(8), 108.0))
      query.processAllAvailable()
      // advance BOTH streams (the union watermark is their MIN) past the
      // probe's event time, then one more batch so the new watermark
      // takes effect and flushes
      refs.addData(Ref(1, ts(40), 140.0))
      probes.addData(Probe(1, ts(40), 2L))
      query.processAllAvailable()
      refs.addData(Ref(1, ts(55), 155.0))
      probes.addData(Probe(1, ts(55), 3L))
      query.processAllAvailable()

      val got = spark.table("asof_final")
        .as[Match].collect().map(m => m.probe_id -> m.ref_payload).toMap
      assert(got.contains(1L), s"buffered probe must flush, got $got")
      assert(got(1L) == Some(108.0),
        s"late ref must win under event-time semantics, got ${got(1L)}")
    } finally query.stop()
  }

  test("emitFinal keeps the reference buffer across a probe-flush timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Probe]
    val refs = MemoryStream[Ref]
    val query = asofJoin(probes.toDS(), refs.toDS(), watermark = "5 minutes",
      emitFinal = true)
      .writeStream.format("memory").queryName("asof_keepref").outputMode("append").start()
    try {
      // ref + pending probe; later batches advance the watermark, the
      // probe flushes via the short wake — the REF must survive that
      // timeout for later probes of the same key
      refs.addData(Ref(1, ts(0), 100.0))
      probes.addData(Probe(1, ts(10), 1L))
      query.processAllAvailable()
      refs.addData(Ref(2, ts(30), 230.0))
      probes.addData(Probe(2, ts(30), 2L))
      query.processAllAvailable()
      refs.addData(Ref(2, ts(45), 245.0))
      probes.addData(Probe(2, ts(45), 3L))
      query.processAllAvailable()
      // a much later probe for key 1: its only ref is the old one
      refs.addData(Ref(2, ts(56), 256.0))
      probes.addData(Probe(1, ts(56), 4L))
      query.processAllAvailable()
      refs.addData(Ref(2, ts(59), 259.0))
      probes.addData(Probe(2, ts(59), 5L))
      query.processAllAvailable()
      // push the watermark past probe 4's event time so it flushes
      refs.addData(Ref(2, Timestamp.valueOf("2024-01-01 11:05:00"), 300.0))
      probes.addData(Probe(2, Timestamp.valueOf("2024-01-01 11:05:00"), 6L))
      query.processAllAvailable()
      probes.addData(Probe(2, Timestamp.valueOf("2024-01-01 11:06:00"), 7L))
      refs.addData(Ref(2, Timestamp.valueOf("2024-01-01 11:06:00"), 301.0))
      query.processAllAvailable()

      val got = spark.table("asof_keepref")
        .as[Match].collect().map(m => m.probe_id -> m.ref_payload).toMap
      assert(got.get(1L).contains(Some(100.0)), s"probe 1: $got")
      assert(got.get(4L).contains(Some(100.0)),
        s"key 1's ref must survive the flush timeout, got $got")
    } finally query.stop()
  }

  test("idleExpiryHours bounds state retention: stale key expires at 24h, survives at 90d") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same feed through both horizons: key 1's only ref is 3 event-days
    // older than its probe, and other-key traffic advances the watermark
    // past key 1's idle timeout BEFORE the probe arrives
    def run(name: String, expiryHours: Long): Option[Double] = {
      val probes = MemoryStream[Probe]
      val refs = MemoryStream[Ref]
      val query = asofJoin(probes.toDS(), refs.toDS(), watermark = "5 minutes",
        idleExpiryHours = expiryHours)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        refs.addData(Ref(1, ts(0), 100.0))
        refs.addData(Ref(2, Timestamp.valueOf("2024-01-03 12:00:00"), 200.0))
        probes.addData(Probe(2, Timestamp.valueOf("2024-01-03 12:00:00"), 1L))
        query.processAllAvailable() // watermark now ~2 days past key 1's ref
        probes.addData(Probe(1, Timestamp.valueOf("2024-01-04 12:00:00"), 2L))
        query.processAllAvailable()
        spark.table(name).as[Match].collect()
          .find(_.probe_id == 2L).flatMap(_.ref_payload)
      } finally query.stop()
    }
    assert(run("asof_exp24", 24L).isEmpty,
      "24h retention must have dropped the 3-day-old ref buffer")
    assert(run("asof_exp90d", 90L * 24L).contains(100.0),
      "a 90-day horizon must keep the stale ref matchable")
  }

  test("a key whose buffer sits far below the watermark survives (timeout clamps)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Probe]
    val refs = MemoryStream[Ref]
    val query = asofJoin(probes.toDS(), refs.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_clamp").outputMode("append").start()
    try {
      // key 1's only ref stays at t0 while other-key traffic advances
      // the global watermark days past it; key-1 probes keep the key
      // alive, so its timeout is re-set while the buffer's newest time
      // sits far below the watermark — without the clamp Spark rejects
      // that timeout ("cannot be earlier than watermark") and the
      // query dies
      refs.addData(Ref(1, ts(0), 100.0))
      probes.addData(Probe(1, ts(1), 1L))
      query.processAllAvailable()
      val twoDaysOn = Timestamp.valueOf("2024-01-03 12:00:00")
      refs.addData(Ref(2, twoDaysOn, 200.0))
      probes.addData(Probe(2, twoDaysOn, 2L),
        Probe(1, Timestamp.valueOf("2024-01-03 12:00:30"), 3L))
      query.processAllAvailable()
      probes.addData(Probe(1, Timestamp.valueOf("2024-01-03 12:01:00"), 4L))
      query.processAllAvailable()

      val got = spark.table("asof_clamp")
        .as[Match].collect().map(m => m.probe_id -> m.ref_payload).toMap
      assert(got(1L) == Some(100.0))
      assert(got(2L) == Some(200.0))
      assert(got(3L) == Some(100.0))
      assert(got(4L) == Some(100.0)) // key 1's old ref still prevails
    } finally query.stop()
  }
}
