package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming exact long-span duplication detection — the streaming twin
 * of `graft.ops.Dedup.spanCensus` (the Lee et al. 2021 signal): as
 * documents arrive, emit (h, doc_id) for every (span-hash, document)
 * pair whose span is shared by at least one OTHER document seen so far
 * — the incremental boilerplate detector a daily-ingest pipeline runs
 * instead of re-censusing the whole corpus.
 *
 * Shape: span extraction is ROW-LOCAL (a document arrives whole, so
 * the batch operator's positional explode collapses to one in-row
 * pass with the IDENTICAL portable 52-bit md5 math — spec'd
 * bit-for-bit). The only state is per-span-hash membership in
 * `flatMapGroupsWithState`, expired by event-time timeout after a
 * full watermark horizon of inactivity.
 *
 * Emission contract (gives batch parity): when a hash's distinct-doc
 * count transitions 1→2, BOTH the stored first document and the new
 * one are emitted; every later distinct document emits itself once.
 * Grouping the output by doc therefore reproduces the batch census's
 * `n_shared` exactly, however the corpus is micro-batched.
 *
 * Scale posture: the shuffle carries (hash, id) pairs — never text —
 * and a hash's state is ≤ `maxSpanDocs` ids. A VIRAL span (the exact
 * phenomenon span-dedup hunts) stops deduplicating arrivals beyond
 * the cap and emits each at-least-once with O(1) state — the
 * streaming analogue of the batch operator's map-side-combinable
 * census (and the same at-least-once stance as DedupStream's
 * oversized buckets); `.dropDuplicates` downstream restores
 * exactly-once when needed.
 */
object SpanStream {

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)
  final case class SpanHit(h: Long, doc_id: Long, ts: Timestamp)
  final case class SharedSpan(h: Long, doc_id: Long)
  final case class SpanState(ids: Array[Long], emitted: Boolean, newestMs: Long)

  /** Row-local distinct `w`-token span hashes — bit-identical to the
    * batch `md5Hash52(concat_ws(" ", window))`: first 13 hex chars of
    * the md5 digest folded as a base-16 integer (52 bits). */
  def spanHashes(text: String, w: Int = 6): Array[Long] = {
    val toks = text.split(" ")
    if (toks.length < w) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= toks.length - w) {
      val span = toks.slice(i, i + w).mkString(" ")
      md.reset()
      val digest = md.digest(span.getBytes("UTF-8"))
      // first 13 hex chars = first 6 bytes + the high nibble of byte 7
      var h = 0L
      var j = 0
      while (j < 6) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      h = (h << 4) | ((digest(6) & 0xf0L) >> 4)
      out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  /**
   * @param docs        streaming (doc_id, text, ts)
   * @param watermark   how late a document may arrive; span state is
   *                    expired after one full horizon of inactivity
   * @param maxSpanDocs membership cap per span hash — beyond it,
   *                    arrivals emit at-least-once with O(1) state
   */
  def sharedSpans(docs: Dataset[Doc], watermark: String = "1 hour",
      w: Int = 6, maxSpanDocs: Int = 4096): Dataset[SharedSpan] = {
    require(maxSpanDocs >= 2, s"maxSpanDocs must be >= 2, got $maxSpanDocs")
    implicit val hitEnc = Encoders.product[SpanHit]
    implicit val stEnc = Encoders.product[SpanState]
    implicit val outEnc = Encoders.product[SharedSpan]
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    val horizonMs = math.max(1L,
      iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L)
    // watermark goes on the exploded hits: the typed flatMap re-derives
    // the ts column, which would shed a watermark applied upstream
    val hits = docs
      .flatMap(d => spanHashes(d.text, w).map(h => SpanHit(h, d.doc_id, d.ts)))
      .withWatermark("ts", watermark)
    hits
      .groupByKey(_.h)(Encoders.scalaLong)
      .flatMapGroupsWithState[SpanState, SharedSpan](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h: Long, batch: Iterator[SpanHit], state: GroupState[SpanState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(SpanState(Array.empty, false, Long.MinValue))
            var ids = st.ids
            var emitted = st.emitted
            var newest = st.newestMs
            val out = Vector.newBuilder[SharedSpan]
            // deterministic in-batch order (MemoryStream/batch parity)
            batch.toArray.sortBy(sh => (sh.ts.getTime, sh.doc_id)).foreach { sh =>
              newest = math.max(newest, sh.ts.getTime)
              if (!ids.contains(sh.doc_id)) {
                if (ids.length == 1 && !emitted) {
                  // 1 → 2 distinct docs: the span just became shared —
                  // emit the stored first doc retroactively too
                  out += SharedSpan(h, ids(0))
                  out += SharedSpan(h, sh.doc_id)
                  emitted = true
                  ids = ids :+ sh.doc_id
                } else {
                  if (emitted) out += SharedSpan(h, sh.doc_id)
                  if (ids.length < maxSpanDocs) ids = ids :+ sh.doc_id
                  // beyond the cap: membership stays bounded, later
                  // re-deliveries of capped-out docs emit at-least-once
                }
              }
            }
            state.update(SpanState(ids, emitted, newest))
            val base = math.max(newest, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(base + horizonMs)
            out.result().iterator
          }
      }
  }
}
