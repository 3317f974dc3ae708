package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming twins of the batch event queries
 * (`graft.queries.Events`): the same logic expressed over `readStream`
 * sources, with watermarks bounding state.
 *
 * Scale posture: state is per-key and bounded — the windowed aggregate
 * keeps one row per (window, event_type) until the watermark passes;
 * the sessionizer keeps one small SessionState per active user and
 * expires it via event-time timeout. Both survive arbitrary input
 * volume because expired state is dropped, never accumulated.
 */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(sessionId: Long, lastTsMicros: Long, nEvents: Long)

  final case class SessionUpdate(user_id: Long, session_id: Long, n_events: Long,
      closed: Boolean)

  /**
   * Tumbling-window event counts per type with a watermark: the batch
   * twin is `e01_event_funnel` (daily buckets there, parameterized here).
   */
  def windowedCounts(events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))

  /**
   * STREAM-STREAM interval join: purchases join the same user's clicks
   * from the trailing `toleranceSec` window — the streaming twin of the
   * batch attribution predicate behind `e06_attribution` (all qualifying
   * clicks; the as-of "latest only" reduction lives in `AsOfStream`).
   *
   * This is Spark's native watermarked stream-stream join: both sides
   * watermark their event time and the join carries an explicit time
   * constraint, so the state store retains each click only until the
   * purchase-side watermark passes `click_ts + toleranceSec` and each
   * purchase only until its own watermark — state is bounded by the
   * watermark horizon × arrival rate, never by stream lifetime.
   * `leftOuter = true` additionally emits unmatched purchases (value
   * attribution "organic") once their watermark expires — same state
   * bound, append-mode semantics.
   */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      toleranceSec: Long = 3600L, watermark: String = "1 hour",
      leftOuter: Boolean = false): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      expr(s"""c_user = p_user AND
               click_ts >= purchase_ts - INTERVAL $toleranceSec SECONDS AND
               click_ts <= purchase_ts"""),
      if (leftOuter) "leftOuter" else "inner")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"), col("click_id"), col("click_ts"))
  }

  /**
   * STREAM-STATIC enrichment: the canonical "join the clickstream to
   * the profile/catalog dimension, aggregate on the enriched
   * attribute" pipeline — the third streaming join shape next to
   * `AsOfStream.asofJoin` (stream-stream as-of) and `attributionJoin`
   * (stream-stream interval). The dimension is a bounded BATCH frame
   * re-read per micro-batch; `broadcast()` marks it explicitly, so the
   * stream side never shuffles for the join — on a 1000-executor
   * cluster the dim ships once per batch and each event enriches
   * locally. Inner-join rows then aggregate per (window, enriched
   * attribute) under the watermark; per-row values quantize to integer
   * cents BEFORE the sum (t09's move) so the windowed totals are
   * engine-exact.
   *
   * State bound: one row per (window, segment) until the watermark
   * passes — the dimension adds ZERO streaming state (it is not
   * buffered by the state store at all; that is the point of the
   * stream-static form vs a stream-stream join against a slowly-
   * changing dim, which `AsOfStream` covers).
   */
  def enrichedSegmentTotals(events: DataFrame, dim: DataFrame,
      windowLen: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100.0 + lit(0.5)).cast("long")).as("value_cents"))
      .select(col("c_mktsegment").as("segment"),
        unix_micros(col("w.start")).as("start_us"),
        col("n_events"), col("value_cents"))

  /**
   * Gap-based sessionization with explicit state — the batch twin is
   * `e02_sessionize` (30-minute gap there too). Emits an update per
   * processed event-batch and a closing record when a session times out.
   */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[SessionUpdate] = {
    val gapMicros = gapMinutes * 60L * 1000000L
    implicit val updEnc = Encoders.product[SessionUpdate]
    implicit val stEnc = Encoders.product[SessionState]

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            // Keep a tombstone (no timeout) instead of removing the state:
            // removal would restart session numbering at 0 when the user
            // returns, colliding with the closed session's key. State is
            // bounded by the number of distinct users.
            state.update(SessionState(st.sessionId + 1, Long.MinValue, 0L))
            Iterator.single(SessionUpdate(userId, st.sessionId, st.nEvents, closed = true))
          } else {
            // MICROsecond event time: getTime is millis only — the
            // sub-ms component lives in getNanos, and the batch twin
            // (e02) compares gaps at micro precision, so truncating
            // here would split sessions differently near the gap
            // boundary on real (micro-resolution) timestamps
            def micros(t: Timestamp): Long =
              math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            val out = Seq.newBuilder[SessionUpdate]
            sorted.foreach { e =>
              val tsMicros = micros(e.ts)
              if (st.lastTsMicros != Long.MinValue && tsMicros - st.lastTsMicros > gapMicros) {
                out += SessionUpdate(userId, st.sessionId, st.nEvents, closed = true)
                st = SessionState(st.sessionId + 1, tsMicros, 1L)
              } else {
                st = SessionState(st.sessionId, tsMicros, st.nEvents + 1)
              }
            }
            if (sorted.nonEmpty) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastTsMicros / 1000L + gapMinutes * 60L * 1000L)
              out += SessionUpdate(userId, st.sessionId, st.nEvents, closed = false)
            }
            out.result().iterator
          }
      }
  }
}
