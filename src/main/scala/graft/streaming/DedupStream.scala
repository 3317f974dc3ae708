package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import org.apache.spark.sql.graftshim.{StringPolyHash, UniversalHash}

/**
 * Streaming MinHash-LSH near-duplicate CANDIDATE stream — the streaming
 * twin of `graft.ops.Dedup.minHashCandidatePairs`: as documents arrive,
 * emit (id_a, id_b) candidate pairs against everything previously seen
 * that shares an LSH band bucket.
 *
 * Shape: signature and banding are ROW-LOCAL (a whole document arrives
 * as one row, so the per-shingle explode/aggregate the batch operator
 * needs for distributed signing collapses to one in-row pass with the
 * IDENTICAL portable math — same poly-hash, same splitmix coefficient
 * table, same md5 band digest, so streaming and batch candidates agree
 * bit-for-bit, spec'd). The only state is per-(band, bucket) membership:
 * a bounded id list in `flatMapGroupsWithState`, expired by event-time
 * timeout once the bucket has been idle a full watermark horizon.
 *
 * Scale posture: the shuffle carries (band, bucket, id) — never text;
 * state per bucket is ≤ `maxBucket` ids. An OVERSIZED bucket (mass
 * duplication) stops enumerating pairs and STARS each arrival to the
 * bucket minimum — the same cap/star rule as the batch operator, so a
 * degenerate hot bucket emits O(1) pairs per arrival instead of O(n).
 * A pair sharing several buckets is emitted once per bucket
 * (at-least-once semantics — downstream component resolution is
 * insensitive to duplicate edges; `.dropDuplicates` restores
 * exactly-once when needed).
 */
object DedupStream {

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)
  final case class BandedDoc(band: Int, bucket: String, doc_id: Long, ts: Timestamp)
  final case class CandidatePair(id_a: Long, id_b: Long)
  final case class BucketState(ids: Array[Long], newestMs: Long)

  /** Row-local MinHash signature — bit-identical to the batch
    * `shingleHashes` → `minHashSignatures` pipeline: word-trigram
    * shingles, portable 55-bit poly-hash, Kirsch–Mitzenmacher two-hash
    * minima hᵢ = (h₁ + i·h₂) mod P (the same scheme `MinHashAgg` runs).
    * None when the document has fewer than `n` words (no shingles). */
  def signature(text: String, numHashes: Int = 128, seed: Long = 42L,
      n: Int = 3): Option[Array[Long]] =
    signatureWith(text, numHashes, UniversalHash.coefficients(2, seed), n)

  /** [[signature]] with the precomputed h₁/h₂ coefficient pairs (the
    * hot path reuses one table per executor instead of rebuilding it
    * per row). */
  def signatureWith(text: String, numHashes: Int, coeffs: Array[(Long, Long)],
      n: Int = 3): Option[Array[Long]] = {
    val toks = text.split(" ")
    if (toks.length < n) return None
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val P = UniversalHash.P
    var i = 0
    while (i <= toks.length - n) {
      val shingle = toks.slice(i, i + n).mkString(" ")
      val bytes = shingle.getBytes("UTF-8")
      var h = 0L
      var bi = 0
      while (bi < bytes.length) {
        h = (h * StringPolyHash.Mult + (bytes(bi) & 0xff)) % StringPolyHash.Prime
        bi += 1
      }
      val h32 = h & 0xffffffffL
      var v = (coeffs(0)._1 * h32 + coeffs(0)._2) % P
      val h2 = (coeffs(1)._1 * h32 + coeffs(1)._2) % P
      var j = 0
      while (j < numHashes) {
        if (v < sig(j)) sig(j) = v
        v += h2
        if (v >= P) v -= P
        j += 1
      }
      i += 1
    }
    Some(sig)
  }

  /** (band, md5-bucket) keys of a signature — the batch `lshBands`
    * digest (comma-joined band slice, lowercase md5 hex). */
  def bandKeys(sig: Array[Long], bands: Int = 32): Seq[(Int, String)] = {
    require(sig.length % bands == 0, s"bands ($bands) must divide ${sig.length}")
    val rows = sig.length / bands
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until bands).map { b =>
      val slice = sig.slice(b * rows, (b + 1) * rows).mkString(",")
      md.reset()
      val digest = md.digest(slice.getBytes("UTF-8"))
      (b, digest.map("%02x".format(_)).mkString)
    }
  }

  /**
   * @param docs      streaming (doc_id, text, ts)
   * @param watermark how late a document may arrive; bucket state is
   *                  expired after one full horizon of inactivity
   * @param maxBucket occupancy cap per (band, bucket) — above it,
   *                  arrivals star to the bucket minimum
   */
  /**
   * Streaming EXACT first-seen dedup — the streaming twin of batch
   * `d01`: each document keys on the md5 of its text and only the
   * first arrival per fingerprint survives, duplicates arriving within
   * the watermark horizon are dropped. Built on Spark's OWN
   * `dropDuplicatesWithinWatermark` stateful operator (state = one
   * fingerprint key + event-time per distinct text, expired once the
   * watermark passes it) rather than custom fMGWS state — the built-in
   * already has exactly these semantics, RocksDB-backed state and
   * watermark GC included.
   *
   * Scale posture: the shuffle and the state store carry (fp, ts) —
   * 24 B + 32 hex chars per DISTINCT document inside the horizon,
   * never the text; a duplicate storm on one fingerprint is absorbed
   * by state-lookup-and-drop, emitting nothing.
   */
  def firstSeen(docs: Dataset[Doc], watermark: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.toDF()
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("fp"))
  }

  def candidatePairs(docs: Dataset[Doc], watermark: String = "1 hour",
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L,
      maxBucket: Int = graft.ops.Dedup.MaxBucketDefault): Dataset[CandidatePair] = {
    implicit val bandedEnc = Encoders.product[BandedDoc]
    implicit val stEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[CandidatePair]
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    val horizonMs = math.max(1L,
      iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L)
    val coeffs = UniversalHash.coefficients(2, seed)
    // watermark goes on the BANDED output: a typed flatMap re-derives
    // the ts column, which would shed a watermark applied upstream
    val banded = docs
      .flatMap { d =>
        signatureWith(d.text, numHashes, coeffs).toSeq.flatMap(sig =>
          bandKeys(sig, bands).map { case (b, digest) =>
            BandedDoc(b, digest, d.doc_id, d.ts)
          })
      }
      .withWatermark("ts", watermark)
    banded
      .groupByKey(bd => (bd.band, bd.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.STRING))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), batch: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(BucketState(Array.empty, Long.MinValue))
            var ids = st.ids
            var newest = st.newestMs
            val out = Vector.newBuilder[CandidatePair]
            // deterministic in-batch order (MemoryStream/batch parity)
            batch.toArray.sortBy(bd => (bd.ts.getTime, bd.doc_id)).foreach { bd =>
              // EVERY arrival (seen or not) refreshes the timeout base:
              // a bucket under steady re-delivery of known docs is live
              // traffic and must not expire mid-stream
              newest = math.max(newest, bd.ts.getTime)
              if (!ids.contains(bd.doc_id)) {
                if (ids.length < maxBucket) {
                  ids.foreach { e =>
                    out += CandidatePair(math.min(e, bd.doc_id), math.max(e, bd.doc_id))
                  }
                  ids = ids :+ bd.doc_id
                } else {
                  // star rule: the oversized bucket is one dup cluster
                  val m = math.min(ids.min, bd.doc_id)
                  val x = math.max(ids.min, bd.doc_id)
                  if (m != x) out += CandidatePair(m, x)
                  // membership stays capped; the min anchors the star
                }
              }
            }
            state.update(BucketState(ids, newest))
            val base = math.max(newest, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(base + horizonMs)
            out.result().iterator
          }
      }
  }
}
