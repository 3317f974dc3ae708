package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.streaming.DedupStream._

class DedupStreamSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def corpus(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu")
    val base = (0L until 40L).map { i =>
      (i, Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.take(8).map { case (i, t) =>
      (1000L + i, t.split(" ").dropRight(2).mkString(" "))
    }
    base ++ dups
  }

  test("row-local signature/banding matches the batch pipeline bit-for-bit") {
    import spark.implicits._
    val docs = corpus().toDF("doc_id", "text")
    val batchSigs = graft.ops.Dedup.minHashSignatures(
      graft.ops.Dedup.shingleHashes(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    corpus().foreach { case (id, text) =>
      val local = signature(text)
      assert(local.isDefined == batchSigs.contains(id))
      local.foreach(sig => assert(sig.toSeq == batchSigs(id).toSeq,
        s"signature mismatch for doc $id"))
    }
    // band digests agree with the batch lshBands md5 bucketing
    val batchBands = graft.ops.Dedup.lshBands(
      graft.ops.Dedup.minHashSignatures(
        graft.ops.Dedup.shingleHashes(docs, "doc_id", "text"), "doc_id"),
      "sig", bands = 32, "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val localBands = corpus().flatMap { case (id, text) =>
      signature(text).toSeq.flatMap(sig =>
        bandKeys(sig).map { case (b, digest) => (id, b, digest) })
    }.toSet
    assert(localBands == batchBands)
  }

  test("streaming candidates across micro-batches equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = corpus()
    val (first, second) = all.splitAt(44) // dups of docs 4..7 arrive later
    val stream = MemoryStream[Doc]
    val query = candidatePairs(stream.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_cand").outputMode("append").start()
    try {
      stream.addData(first.map { case (id, t) => Doc(id, t, ts(1)) })
      query.processAllAvailable()
      stream.addData(second.map { case (id, t) => Doc(id, t, ts(2)) })
      query.processAllAvailable()

      val got = spark.table("dedup_cand")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = graft.ops.Dedup.minHashCandidatePairs(
        all.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"stream=${got.size} batch=${want.size} " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      // the planted near-dups were found, including cross-batch ones
      for (i <- 0L until 8L) assert(got.contains((i, 1000L + i)), s"missing pair $i")
    } finally query.stop()
  }

  test("oversized buckets star to the minimum instead of quadratic emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val stream = MemoryStream[Doc]
    val query = candidatePairs(stream.toDS(), watermark = "10 minutes", maxBucket = 4)
      .writeStream.format("memory").queryName("dedup_star").outputMode("append").start()
    try {
      stream.addData((0L until 40L).map(i => Doc(i, text, ts(1))))
      query.processAllAvailable()
      val pairs = spark.table("dedup_star")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // full expansion among the first 4 members (6 pairs) + a star pair
      // per later arrival (36) — far from C(40,2)=780
      assert(pairs.size == 6 + 36, s"got ${pairs.size} pairs")
      assert(pairs.count(_._1 == 0L) >= 36, "stars must anchor at the bucket min")
      // connectivity preserved: one component covers all 40 docs
      val cc = graft.ops.Dedup.connectedComponents(
        pairs.toSeq.toDF("id_a", "id_b"))
      assert(cc.select("component").distinct().count() == 1L)
      assert(cc.count() == 40L)
    } finally query.stop()
  }

  test("firstSeen drops exact duplicates across micro-batches, keeps the first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val query = firstSeen(stream.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_first").outputMode("append").start()
    try {
      // batch 1: three distinct texts; batch 2: two replays under new
      // ids + one genuinely new text — only the new one may survive
      stream.addData(Seq(Doc(1, "aa bb cc", ts(1)), Doc(2, "dd ee ff", ts(1)),
        Doc(3, "gg hh ii", ts(1))))
      query.processAllAvailable()
      stream.addData(Seq(Doc(11, "aa bb cc", ts(2)), Doc(12, "dd ee ff", ts(2)),
        Doc(13, "jj kk ll", ts(2))))
      query.processAllAvailable()
      val kept = spark.table("dedup_first").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 3L, 13L), s"kept: $kept")
    } finally query.stop()
  }
}
