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

  final case class MarkovState(lastLabel: String, converted: Boolean,
      lastTsMicros: Long)

  /** One journey edge of the streaming Markov census (user_id rides
    * along so the harness can exclude its watermark-sentinel user;
    * the census itself aggregates on (src, dst) only). */
  final case class MarkovEdge(user_id: Long, src: String, dst: String)

  /**
   * STREAMING SESSION-SCOPED Markov-attribution census — the live-
   * attribution-dashboard deployment of e17's model: journey edges
   * are extracted AT INGEST, the edge counters accumulate as events
   * arrive, and the dashboard re-runs the driver-side removal-effect
   * walk over the drained channels²-sized census whenever it
   * refreshes. State is ONE small row per active user (last journey
   * label + converted flag + last event time) — the [[sessionize]]
   * bound.
   *
   * Journey semantics (the sessionized-attribution convention — a
   * stream has no "end of data", so e17's journeys-end-at-end-of-
   * data rule becomes an explicit inactivity close-out, exactly as
   * e02 sessionizes what a batch would treat as one unbroken
   * sequence):
   *   - events outside `channels` + "purchase" are IGNORED
   *     in-operator (not just pre-filtered), so watermark-advancing
   *     sentinel rows ride the feed without touching the census;
   *   - a journey's FIRST event emits start→label; each later event
   *     emits lastLabel→label, ordered by (event-time micros,
   *     event_id) within a batch — the e02 sub-millisecond
   *     discipline — and by arrival across batches (the append-log
   *     contract);
   *   - an event-time gap > `gapMinutes` CLOSES the running journey
   *     with its lastLabel→drop edge and restarts from 'start' —
   *     checked IN-FOLD against the state's last event time, so the
   *     split lands identically wherever the micro-batch boundary
   *     falls (stream ≡ batch bit-exactly; the oracle replays the
   *     same gap rule with a window cumulative sum);
   *   - "purchase" maps to the absorbing conv edge and the USER
   *     truncates — every later event of that user drops forever
   *     (e17's rn ≤ pn rule: post-conversion behavior is out of
   *     attribution scope);
   *   - a non-converted journey quiet past `gapMinutes` with NO
   *     further events ever gets its drop edge from the event-time
   *     timeout (the only case the in-fold check cannot see).
   *
   * Scale: the output is an append stream of (src, dst) edges — the
   * downstream census is a channels²-sized aggregate, and the walk
   * is driver arithmetic over that matrix (e17's posture); nothing
   * anywhere holds per-event state beyond the one row per user.
   */
  def markovCensusStream(events: Dataset[Event], channels: Seq[String],
      gapMinutes: Int = 60, watermark: String = "1 hour"): Dataset[MarkovEdge] = {
    implicit val outEnc = Encoders.product[MarkovEdge]
    implicit val stEnc = Encoders.product[MarkovState]
    val chan = channels.toSet
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[MarkovState, MarkovEdge](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[MarkovState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            if (st.converted) {
              // a stray timeout set before conversion: stay absorbed —
              // the batch census truncates at the FIRST purchase, so a
              // converted user never re-enters the journey space
              state.update(st)
              Iterator.empty
            } else {
              // close out the quiet journey with its drop edge; the
              // user restarts from 'start' (tombstone, no timeout —
              // the sessionize rule: state stays bounded by distinct
              // users, never grows per event)
              state.update(MarkovState("start", converted = false, Long.MinValue))
              if (st.lastLabel != "start")
                Iterator.single(MarkovEdge(userId, st.lastLabel, "drop"))
              else Iterator.empty
            }
          } else {
            def micros(t: Timestamp): Long =
              math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
            val gapMicros = gapMinutes * 60L * 1000000L
            val counted = batch
              .filter(e => chan.contains(e.event_type) || e.event_type == "purchase")
              .toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption
              .getOrElse(MarkovState("start", converted = false, Long.MinValue))
            val out = Seq.newBuilder[MarkovEdge]
            counted.foreach { e =>
              if (!st.converted) {
                val tsMic = micros(e.ts)
                // in-fold gap split: the running journey closes with
                // its drop edge BEFORE this event starts a new one —
                // state carries the last event time, so the split is
                // identical wherever the micro-batch boundary falls
                if (st.lastLabel != "start" &&
                    st.lastTsMicros != Long.MinValue &&
                    tsMic - st.lastTsMicros > gapMicros) {
                  out += MarkovEdge(userId, st.lastLabel, "drop")
                  st = MarkovState("start", converted = false, Long.MinValue)
                }
                val dst = if (e.event_type == "purchase") "conv" else e.event_type
                out += MarkovEdge(userId, st.lastLabel, dst)
                st = MarkovState(dst, converted = dst == "conv", tsMic)
              }
            }
            // GroupState CLEARS a stored timeout on every invocation
            // that does not re-set it — and this function is invoked
            // even when the batch holds only ignored event types for
            // the key (the filter is in-operator), so the timeout
            // must be re-armed from whatever state stands or an open
            // journey would silently never close. Clamped to the
            // current watermark: a just-due journey whose re-arm
            // would otherwise throw closes at the next opportunity.
            def armTimeout(cur: MarkovState): Unit =
              if (!cur.converted && cur.lastTsMicros != Long.MinValue)
                state.setTimeoutTimestamp(math.max(
                  cur.lastTsMicros / 1000L + gapMinutes * 60L * 1000L,
                  state.getCurrentWatermarkMs() + 1))
            if (counted.nonEmpty) {
              state.update(st)
              armTimeout(st)
            } else state.getOption.foreach(armTimeout)
            out.result().iterator
          }
      }
  }

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
