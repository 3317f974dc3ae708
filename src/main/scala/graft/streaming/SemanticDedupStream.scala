package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming SEMANTIC near-duplicate candidate stream — the streaming
 * twin of `graft.ops.Dedup.cosineCandidatePairs` (the d08 batch path):
 * as embedding rows arrive, emit (id_a, id_b) pairs whose exact cosine
 * clears the threshold, candidates formed only inside a shared
 * random-hyperplane LSH bucket across `tables` independent tables.
 *
 * Shape: bucketing is ROW-LOCAL — [[bucketKey]] replays the native
 * `HyperplaneKey` expression's fused sign-bit loop over the identical
 * seeded coefficient matrix, and [[cosine]] replays `ArrayCosine`'s
 * fused dot/norm loop, so streaming buckets and similarity decisions
 * are bit-identical to the batch operator (spec'd). The only state is
 * per-(table, bucket) membership: ids AND their vectors (the cosine
 * recheck needs the vector — state is ≤ maxBucket × dim doubles per
 * bucket), expired by event-time timeout one watermark horizon after
 * the bucket goes idle.
 *
 * Scale posture mirrors the batch count-and-split rule: a bucket at
 * its occupancy cap stops enumerating and STARS each new arrival to
 * the current bucket-minimum id (cosine-rechecked like every other
 * candidate), so a degenerate hot bucket emits O(1) pairs per arrival.
 * A τ-similar pair colliding in several tables is emitted once per
 * table (at-least-once; component resolution downstream is insensitive
 * to duplicate edges, `.dropDuplicates` restores exactly-once).
 */
object SemanticDedupStream {

  final case class Vec(vec_id: Long, v: Array[Double], ts: Timestamp)
  final case class KeyedVec(tbl: Int, bucket: Long, vec_id: Long,
      v: Array[Double], ts: Timestamp)
  final case class BucketVecState(ids: Array[Long], vecs: Array[Array[Double]],
      newestMs: Long)

  /** Row-local twin of the native `HyperplaneKey` fused loop: bit `p`
    * set iff `planes(p) · v > 0`, products summed left-to-right — the
    * identical float order, so buckets bit-match the batch column. */
  def bucketKey(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var s = 0.0
      var i = 0
      val n = math.min(plane.length, v.length)
      while (i < n) { s += plane(i) * v(i); i += 1 }
      if (s > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Row-local twin of the native `ArrayCosine` fused loop (same
    * accumulation order; 0.0 for zero vectors, like the expression). */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    if (a.length != b.length) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /**
   * @param vecs      streaming (vec_id, v, ts) embedding rows
   * @param threshold exact-cosine acceptance threshold τ
   * @param dim       embedding dimensionality (coefficient table width)
   * @param planes    sign bits per table — 2^planes buckets, the
   *                  scaling knob, sized to the corpus like batch
   * @param tables    independent LSH tables (recall)
   * @param watermark lateness bound; bucket state expires after one
   *                  full horizon of inactivity
   * @param maxBucket occupancy cap per (table, bucket) — at the cap,
   *                  arrivals star to the bucket-minimum id
   */
  def candidatePairs(vecs: Dataset[Vec], threshold: Double, dim: Int,
      planes: Int, tables: Int = 4, seed: Long = 5L,
      watermark: String = "1 hour",
      maxBucket: Int = graft.ops.Dedup.MaxBucketDefault): Dataset[DedupStream.CandidatePair] = {
    implicit val keyedEnc = Encoders.product[KeyedVec]
    implicit val stEnc = Encoders.product[BucketVecState]
    implicit val outEnc = Encoders.product[DedupStream.CandidatePair]
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    val horizonMs = math.max(1L,
      iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L)
    // one model-sized coefficient matrix per table, shipped in the
    // closure — identical seeds to the batch operator
    val planeTables: Array[Array[Array[Double]]] = (0 until tables).map(t =>
      graft.ops.Similarity.hyperplaneCoeffs(dim, planes, seed + t)
        .map(_.toArray).toArray).toArray
    // watermark goes on the KEYED output: the typed flatMap re-derives
    // the ts column, which would shed a watermark applied upstream
    val keyed = vecs
      .flatMap { r =>
        planeTables.indices.map { t =>
          KeyedVec(t, bucketKey(r.v, planeTables(t)), r.vec_id, r.v, r.ts)
        }
      }
      .withWatermark("ts", watermark)
    val tau = threshold
    keyed
      .groupByKey(kv => (kv.tbl, kv.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketVecState, DedupStream.CandidatePair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), batch: Iterator[KeyedVec], state: GroupState[BucketVecState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(
              BucketVecState(Array.empty, Array.empty, Long.MinValue))
            var ids = st.ids
            var vs = st.vecs
            var newest = st.newestMs
            val out = Vector.newBuilder[DedupStream.CandidatePair]
            // deterministic in-batch order (MemoryStream/batch parity)
            batch.toArray.sortBy(kv => (kv.ts.getTime, kv.vec_id)).foreach { kv =>
              // every arrival refreshes the timeout base — a bucket
              // under steady re-delivery is live traffic
              newest = math.max(newest, kv.ts.getTime)
              if (!ids.contains(kv.vec_id)) {
                if (ids.length < maxBucket) {
                  var i = 0
                  while (i < ids.length) {
                    if (cosine(vs(i), kv.v) >= tau) {
                      out += DedupStream.CandidatePair(
                        math.min(ids(i), kv.vec_id), math.max(ids(i), kv.vec_id))
                    }
                    i += 1
                  }
                  ids = ids :+ kv.vec_id
                  vs = vs :+ kv.v
                } else {
                  // star rule: anchor to the bucket-minimum member,
                  // cosine-rechecked — membership stays capped
                  var mi = 0
                  var i = 1
                  while (i < ids.length) { if (ids(i) < ids(mi)) mi = i; i += 1 }
                  if (ids(mi) != kv.vec_id && cosine(vs(mi), kv.v) >= tau) {
                    out += DedupStream.CandidatePair(
                      math.min(ids(mi), kv.vec_id), math.max(ids(mi), kv.vec_id))
                  }
                }
              }
            }
            state.update(BucketVecState(ids, vs, newest))
            val base = math.max(newest, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(base + horizonMs)
            out.result().iterator
          }
      }
  }
}
