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
 * Scale posture: state per key is bounded — the buffer is pruned to
 * references newer than (watermark − nothing): everything at or below
 * the newest reference that is still ≤ the watermark is droppable
 * except that newest one, because no future probe (ts ≥ watermark) can
 * ever prefer an older reference. Probes arriving with no usable
 * reference emit a null match (left-join semantics), matching the
 * batch operator.
 */
object AsOfStream {

  final case class Probe(key: Long, ts: Timestamp, probe_id: Long)
  final case class Ref(key: Long, ts: Timestamp, payload: Double)

  /** Tagged union row; `ref_payload` is meaningful only when isRef. */
  final case class Tagged(key: Long, ts: Timestamp, isRef: Boolean,
      probe_id: Long, ref_payload: Double)

  /** Per-key reference buffer, ascending by time (parallel arrays). */
  final case class RefBuffer(times: Array[Long], payloads: Array[Double])

  final case class Match(key: Long, probe_id: Long, ts_micros: Long,
      ref_ts_micros: Option[Long], ref_payload: Option[Double])

  def asofJoin(probes: Dataset[Probe], refs: Dataset[Ref],
      watermark: String = "1 hour"): Dataset[Match] = {
    implicit val tagEnc = Encoders.product[Tagged]
    implicit val bufEnc = Encoders.product[RefBuffer]
    implicit val outEnc = Encoders.product[Match]

    val taggedProbes = probes.withWatermark("ts", watermark)
      .select(col("key"), col("ts"), lit(false).as("isRef"),
        col("probe_id"), lit(0.0).as("ref_payload")).as[Tagged]
    val taggedRefs = refs.withWatermark("ts", watermark)
      .select(col("key"), col("ts"), lit(true).as("isRef"),
        lit(-1L).as("probe_id"), col("payload").as("ref_payload")).as[Tagged]

    taggedProbes.union(taggedRefs)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[RefBuffer, Match](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, batch: Iterator[Tagged], state: GroupState[RefBuffer]) =>
          if (state.hasTimedOut) {
            // No traffic for this key since the horizon: drop the buffer.
            state.remove()
            Iterator.empty
          } else {
            val rows = batch.toArray
            val buf = state.getOption.getOrElse(RefBuffer(Array.empty, Array.empty))

            // 1. absorb every reference of the batch (merge keeps order)
            val incoming = rows.filter(_.isRef)
              .map(r => (r.ts.getTime * 1000L, r.ref_payload)).sortBy(_._1)
            val merged =
              if (incoming.isEmpty) buf
              else {
                val ts = (buf.times ++ incoming.map(_._1)).toArray
                val ps = (buf.payloads ++ incoming.map(_._2)).toArray
                val order = ts.indices.sortBy(ts(_))
                RefBuffer(order.map(ts).toArray, order.map(ps).toArray)
              }

            // 2. match probes (deterministic: sorted by ts then id)
            val out = rows.filter(!_.isRef)
              .sortBy(p => (p.ts.getTime, p.probe_id)).iterator.map { p =>
                val t = p.ts.getTime * 1000L
                // last index with times(i) <= t
                var lo = 0; var hi = merged.times.length - 1; var best = -1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (merged.times(mid) <= t) { best = mid; lo = mid + 1 }
                  else hi = mid - 1
                }
                if (best < 0) Match(key, p.probe_id, t, None, None)
                else Match(key, p.probe_id, t,
                  Some(merged.times(best)), Some(merged.payloads(best)))
              }.toVector

            // 3. prune: only the newest ref at/below the watermark can
            // still win for a future probe — drop everything older.
            val horizonMicros = state.getCurrentWatermarkMs() * 1000L
            var cut = 0
            while (cut < merged.times.length - 1 && merged.times(cut + 1) <= horizonMicros)
              cut += 1
            val pruned =
              if (cut <= 0) merged
              else RefBuffer(merged.times.drop(cut), merged.payloads.drop(cut))

            if (pruned.times.nonEmpty || rows.nonEmpty) {
              state.update(pruned)
              // Expire idle keys a day past the newest activity. The
              // newest BUFFERED ref can sit far below the global
              // watermark (probes kept it alive without refreshing it),
              // and Spark rejects timeouts set before the watermark —
              // so clamp to max(buffer, this batch's rows, watermark).
              val newest = math.max(
                math.max(
                  if (pruned.times.nonEmpty) pruned.times.last / 1000L else Long.MinValue,
                  if (rows.nonEmpty) rows.map(_.ts.getTime).max else Long.MinValue),
                state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(newest + 24L * 3600L * 1000L)
            }
            out.iterator
          }
      }
  }
}
