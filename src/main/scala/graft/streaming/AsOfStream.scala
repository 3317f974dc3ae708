package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming as-of join: attach to every probe event the LATEST
 * reference row with `ref.ts <= probe.ts` for the same key — the
 * streaming twin of `graft.ops.AsOf.asofJoin` (e.g. enrich a trade
 * stream with the prevailing quote).
 *
 * Structured Streaming's stream-stream interval join emits EVERY
 * reference row in the time range, not the latest, so this is custom
 * state: both inputs are tagged and unioned (same trick as the batch
 * composition), keyed by join key, and a `flatMapGroupsWithState`
 * keeps, per key, a small time-sorted buffer of reference rows.
 * References from a micro-batch are absorbed before probes are matched,
 * so within-batch ordering is deterministic.
 *
 * Two emission modes:
 *  - `emitFinal = false` (default, lowest latency): probes are matched
 *    and emitted in the micro-batch they ARRIVE. Caveat (by design): a
 *    reference that arrives in a LATER batch — still inside the
 *    watermark — with `ref.ts <= probe.ts` is never applied to the
 *    already-emitted probe, so the "latest reference" contract holds
 *    per ARRIVAL order, not per event time.
 *  - `emitFinal = true` (event-time-exact): probes are buffered in
 *    state until the watermark passes their event time, so every
 *    reference that can legally arrive (within the watermark) is
 *    already absorbed when the probe is matched — results equal the
 *    batch `asofJoin` on the same data, at the cost of the watermark
 *    delay before each emission (standard Append-mode late-data
 *    handling, like windowed aggregates).
 *
 * Scale posture: state per key is bounded — the reference buffer is
 * pruned to everything newer than the newest reference at or below the
 * watermark (no future probe can prefer an older one), and in
 * `emitFinal` mode the probe buffer holds only probes inside the
 * watermark horizon. Probes with no usable reference emit a null match
 * (left-join semantics), matching the batch operator.
 */
object AsOfStream {

  final case class Probe(key: Long, ts: Timestamp, probe_id: Long)
  final case class Ref(key: Long, ts: Timestamp, payload: Double)

  /** Tagged union row; `ref_payload` is meaningful only when isRef. */
  final case class Tagged(key: Long, ts: Timestamp, isRef: Boolean,
      probe_id: Long, ref_payload: Double)

  /** Per-key state: time-sorted reference buffer + (emitFinal mode)
    * pending probes, all as parallel arrays. `flushWake` records which
    * KIND of timeout is armed — a short probe-flush wake (references
    * must survive it) vs the idle expiry (state may be dropped). */
  final case class AsOfState(
      refTimes: Array[Long], refPayloads: Array[Double],
      probeTimes: Array[Long], probeIds: Array[Long],
      flushWake: Boolean)

  private val emptyState =
    AsOfState(Array.empty, Array.empty, Array.empty, Array.empty, flushWake = false)

  final case class Match(key: Long, probe_id: Long, ts_micros: Long,
      ref_ts_micros: Option[Long], ref_payload: Option[Double])

  /** Match one probe time against the sorted ref buffer (latest ≤ t,
    * and — when a tolerance is set — no older than `tolMicros`). */
  private def matchProbe(key: Long, probeId: Long, t: Long,
      refT: Array[Long], refP: Array[Double], tolMicros: Long): Match = {
    var lo = 0; var hi = refT.length - 1; var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (refT(mid) <= t) { best = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (best < 0 || t - refT(best) > tolMicros) Match(key, probeId, t, None, None)
    else Match(key, probeId, t, Some(refT(best)), Some(refP(best)))
  }

  /** Drop refs older than the newest ref at/below `horizonMicros` —
    * only that newest one can still win for a future probe. */
  private def pruneRefs(st: AsOfState, horizonMicros: Long): AsOfState = {
    var cut = 0
    while (cut < st.refTimes.length - 1 && st.refTimes(cut + 1) <= horizonMicros)
      cut += 1
    if (cut <= 0) st
    else st.copy(refTimes = st.refTimes.drop(cut), refPayloads = st.refPayloads.drop(cut))
  }

  /** @param toleranceSec max probe.ts − ref.ts; older references are
    *        nulled out (same contract as the batch op's `tolerance`)
    * @param idleExpiryHours drop a key's state this long (event time)
    *        past its newest activity. This is the state-RETENTION
    *        policy, distinct from the watermark (late-data bound): a
    *        key idle longer than this loses its reference buffer, so
    *        a later probe of that key nulls where the batch operator
    *        (unbounded lookback) would still match. Size it to the
    *        longest ref-to-probe gap the workload must honor. */
  def asofJoin(probes: Dataset[Probe], refs: Dataset[Ref],
      watermark: String = "1 hour", emitFinal: Boolean = false,
      toleranceSec: Option[Long] = None,
      idleExpiryHours: Long = 24L): Dataset[Match] = {
    val tolMicros = toleranceSec.map(_ * 1000000L).getOrElse(Long.MaxValue)
    implicit val tagEnc = Encoders.product[Tagged]
    implicit val stEnc = Encoders.product[AsOfState]
    implicit val outEnc = Encoders.product[Match]

    val taggedProbes = probes.withWatermark("ts", watermark)
      .select(col("key"), col("ts"), lit(false).as("isRef"),
        col("probe_id"), lit(0.0).as("ref_payload")).as[Tagged]
    val taggedRefs = refs.withWatermark("ts", watermark)
      .select(col("key"), col("ts"), lit(true).as("isRef"),
        lit(-1L).as("probe_id"), col("payload").as("ref_payload")).as[Tagged]

    taggedProbes.union(taggedRefs)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[AsOfState, Match](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, batch: Iterator[Tagged], state: GroupState[AsOfState]) =>
          val rows = if (state.hasTimedOut) Array.empty[Tagged] else batch.toArray
          val st0 = state.getOption.getOrElse(emptyState)
          val horizonMicros = state.getCurrentWatermarkMs() * 1000L

          // 1. absorb every reference of the batch (merge keeps order)
          val incoming = rows.filter(_.isRef)
            .map(r => (r.ts.getTime * 1000L, r.ref_payload)).sortBy(_._1)
          val st1 =
            if (incoming.isEmpty) st0
            else {
              val ts = st0.refTimes ++ incoming.map(_._1)
              val ps = st0.refPayloads ++ incoming.map(_._2)
              val order = ts.indices.sortBy(ts(_))
              st0.copy(refTimes = order.map(ts).toArray,
                refPayloads = order.map(ps).toArray)
            }

          // 2. gather probes: this batch's (+ the buffer in final mode),
          //    split into ready-to-emit and still-pending. STRICT `<`:
          //    Spark only drops rows strictly below the watermark, so a
          //    reference AT the watermark can still legally arrive — a
          //    probe at that exact time must keep waiting for it.
          val arrived = rows.filter(!_.isRef)
            .map(p => (p.ts.getTime * 1000L, p.probe_id))
          val all = (st1.probeTimes.zip(st1.probeIds) ++ arrived).sorted
          val (ready, pending) =
            if (emitFinal) all.partition(_._1 < horizonMicros)
            else (all, Array.empty[(Long, Long)])
          val out = ready.iterator.map { case (t, id) =>
            matchProbe(key, id, t, st1.refTimes, st1.refPayloads, tolMicros)
          }.toVector

          // 3. prune refs and write back (or expire). A timeout only
          // drops state when it is the IDLE expiry — a probe-flush wake
          // (flushWake) must leave the reference buffer intact for
          // later probes of this key.
          val idleExpiry = state.hasTimedOut && !st0.flushWake
          val pruned = pruneRefs(st1, horizonMicros)
            .copy(probeTimes = pending.map(_._1), probeIds = pending.map(_._2))
          if (pending.isEmpty && (idleExpiry ||
              (pruned.refTimes.isEmpty && rows.isEmpty))) {
            state.remove()
          } else {
            val watermarkMs = state.getCurrentWatermarkMs()
            if (pending.nonEmpty) {
              // pending probes: wake at the first watermark advance so
              // they flush promptly (timeout must sit above the
              // watermark by contract)
              state.update(pruned.copy(flushWake = true))
              state.setTimeoutTimestamp(watermarkMs + 1L)
            } else {
              // Expire idle keys `idleExpiryHours` past the newest
              // activity. The
              // newest BUFFERED ref can sit far below the global
              // watermark (probes kept it alive without refreshing it),
              // and Spark rejects timeouts set before the watermark —
              // so clamp to max(buffer, this batch's rows, watermark).
              val newest = math.max(
                math.max(
                  if (pruned.refTimes.nonEmpty) pruned.refTimes.last / 1000L
                  else Long.MinValue,
                  if (rows.nonEmpty) rows.map(_.ts.getTime).max else Long.MinValue),
                watermarkMs)
              state.update(pruned.copy(flushWake = false))
              state.setTimeoutTimestamp(newest + idleExpiryHours * 3600L * 1000L)
            }
          }
          out.iterator
      }
  }
}
