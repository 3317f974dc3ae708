package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * d21/st40's machinery: sliding n-gram md5-52 shingles
 * (`Dedup.ngramHashes52`), the batch census
 * (`Dedup.benchmarkDecontamination`) and the native ingest probe
 * (`NgramHashHits` via `VectorExpressions.ngramHashHits`) — the three
 * must agree on the SAME 52-bit plane, distinct-counted per document.
 */
class DecontaminationSpec extends SparkTestBase {

  /** Reference md5-52 of a string — the first 13 hex chars of md5 as a
    * long, independently of both the native probe and the SQL conv. */
  private def h52(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >>> 4)
  }

  /** Reference sliding windows (single-space split, empties kept). */
  private def refWindows(text: String, n: Int): Seq[Long] = {
    val w = text.split(" ", -1)
    if (w.length < n) Seq.empty
    else (0 to w.length - n).map(i => h52(w.slice(i, i + n).mkString(" ")))
  }

  test("ngramHashes52 matches the reference windows; short docs " +
      "produce no rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "one two three"),
      (3L, "x y"),                 // shorter than n → no rows
      (4L, "p q r s"))             // exactly n → one row
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.ngramHashes52(df, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val want = docs.map { case (id, t) => id -> refWindows(t, 4).sorted }
      .filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("native NgramHashHits: 200-doc differential vs the reference " +
      "scan — distinct and dirty counts identical, short docs [0,0]") {
    import spark.implicits._
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps")
    val rnd = new scala.util.Random(7)
    val docs = (1L to 200L).map { id =>
      val len = 1 + rnd.nextInt(30)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val n = 13
    // banned = every 3rd distinct window of the corpus itself, so hits
    // are guaranteed and non-hits abound
    val allH = docs.flatMap(d => refWindows(d._2, n)).distinct.sorted
    val banned = allH.zipWithIndex.collect { case (h, i) if i % 3 == 0 => h }.toArray
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.VectorExpressions
        .ngramHashHits(col("text"), n, banned).as("nh"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val bset = banned.toSet
    docs.foreach { case (id, t) =>
      val ws = refWindows(t, n).distinct
      val want = Seq(ws.length.toLong, ws.count(bset).toLong)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("a repeated dirty n-gram is ONE contamination: distinct " +
      "counting in both the native probe and the batch census") {
    import spark.implicits._
    val block = (1 to 13).map(i => s"w$i").mkString(" ")
    val doc = block + " " + block   // 26 tokens, window 1 == window 14
    val h = h52(block)
    val native = spark.createDataset(Seq((1L, doc))).toDF("doc_id", "text")
      .select(graft.functions.VectorExpressions
        .ngramHashHits(col("text"), 13, Array(h)).as("nh"))
      .collect()(0).getSeq[Long](0)
    assert(native == Seq(13L, 1L)) // 14 raw windows, 13 distinct, 1 dirty
    val census = Dedup.benchmarkDecontamination(
        Seq((1L, doc)).toDF("doc_id", "text"),
        Seq((9L, block)).toDF("doc_id", "text"),
        "doc_id", "text", n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(census.toSeq == Seq((1L, 13L, 1L)))
  }

  test("benchmarkDecontamination flags exactly the straddling doc and " +
      "the frozen artifact drives the native probe to the same answer") {
    import spark.implicits._
    val shared = (1 to 13).map(i => s"s$i").mkString(" ")
    val train = Seq(
      (1L, "lead in " + shared + " tail words"),   // contaminated
      (2L, (1 to 20).map(i => s"c$i").mkString(" ")), // clean
      (3L, "too short"))
    val eval = Seq((100L, "prefix " + shared))
    val batch = Dedup.benchmarkDecontamination(
        train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
        "doc_id", "text", n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch.toSeq == Seq((1L, 5L, 1L))) // 17 tokens → 5 windows, 1 dirty
    val banned = Dedup.evalShingleFreeze(
      eval.toDF("doc_id", "text"), "doc_id", "text", n = 13)
    assert(banned.length == 2) // eval doc: 14 tokens → 2 windows
    val streamed = train.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.VectorExpressions
        .ngramHashHits(col("text"), 13, banned).as("nh"))
      .select(col("doc_id"), element_at(col("nh"), 1).as("total"),
        element_at(col("nh"), 2).as("dirty"))
      .filter(col("dirty") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == Seq((1L, 5L, 1L)))
  }
}
