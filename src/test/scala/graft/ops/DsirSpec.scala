package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * t31/st26's DSIR hashed importance weights (Xie et al. 2023): the λ
 * table replays the published formula exactly in integer micro-nats,
 * the per-doc weight is the fold of λ over the doc's hashed buckets,
 * and the frozen native row-local scorer (graftshim.DsirScore via
 * dsirFreeze) is bit-parity with the batch broadcast-join path — the
 * property that makes t31's oracle valid for st26's drained sink.
 */
class DsirSpec extends SparkTestBase {
  import TextAnalysis._

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Driver-side replay of the add-one quantized log-ratio. */
  private def lamFormula(ct: Long, nt: Long, cr: Long, nr: Long, b: Int): Long =
    math.floor(math.log((ct + 1.0) / (nt + b)) * 1e6 + 0.5).toLong -
      math.floor(math.log((cr + 1.0) / (nr + b)) * 1e6 + 0.5).toLong

  test("dsirFit: λ replays the add-one quantized log-ratio per bucket; " +
      "empty buckets carry the smoothed prior; table is exactly B rows") {
    val B = 16
    val docs = docsDf(
      0L -> "alpha beta gamma alpha",
      1L -> "beta delta",
      2L -> "epsilon zeta eta theta iota")
    val tgt = col("doc_id") < 2 // docs 0-1 are the target slice
    val lam = dsirFit(docs, "text", tgt, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lam.size == B && lam.keySet == (0L until B).toSet)

    // independent census: same hash plane, driver-side fold
    import graft.functions.VectorExpressions.md5Hash52
    val census = docs
      .select((col("doc_id") < 2).cast("long").as("t"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("t"), (md5Hash52(col("tok")) % B).as("b"))
      .groupBy("b").agg(sum("t").as("ct"), count(lit(1)).as("cr"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nt = census.values.map(_._1).sum // 6 target tokens
    val nr = census.values.map(_._2).sum // 11 total tokens
    assert(nt == 6L && nr == 11L)
    (0L until B).foreach { b =>
      val (ct, cr) = census.getOrElse(b, (0L, 0L))
      assert(lam(b) == lamFormula(ct, nt, cr, nr, B),
        s"bucket $b: λ=${lam(b)} formula=${lamFormula(ct, nt, cr, nr, B)}")
    }
    // a bucket seen only in the raw slice must score NEGATIVE (it is
    // evidence against the target); target-heavy buckets positive
    val rawOnly = census.collect { case (b, (0L, cr)) if cr > 0 => b }
    assert(rawOnly.nonEmpty && rawOnly.forall(b => lam(b) < 0))
  }

  test("frozen native scorer is bit-parity with the batch scorer; " +
      "empty/whitespace docs yield no row on either path") {
    val B = 32
    val base = (0L until 50L).map { i =>
      i -> (s"w${i % 9} w${(i * 4) % 9} rare$i w${(i + 2) % 9} w${(i * 7) % 9}")
    }
    // double space (empty segment), trailing space, and no-token docs
    val docs = docsDf(base ++ Seq(
      100L -> "w1  w2 w3 ", 101L -> "", 102L -> "   "): _*)
    val lamDf = dsirFit(docs, "text", col("doc_id") % 3 === 0, buckets = B)
    val frozen = dsirFreeze(lamDf, B)
    assert(frozen.length == B)

    val batch = dsirWeights(docs, "doc_id", "text", lamDf, B)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val native = docs
      .select(col("doc_id"),
        graft.functions.VectorExpressions.dsirScore(col("text"), frozen).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"), element_at(col("r"), 1), element_at(col("r"), 2))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch.length == 51 && batch.toSeq == native.toSeq)
    // the no-token docs carry no evidence on either path
    assert(!batch.exists(t => t._1 == 101L || t._1 == 102L))
    // doc 100's empty segments are skipped: 3 tokens, not 5
    assert(batch.find(_._1 == 100L).get._2 == 3L)
  }

  test("target-slice documents outrank off-target ones on the weight " +
      "(the importance-resampling selection property)") {
    val B = 64
    // target vocabulary and raw vocabulary are disjoint; mixed docs
    // score in between
    val docs = docsDf(
      (0L until 20L).map(i => i -> "med gene cell trial dose") ++
        (20L until 40L).map(i => i -> "spam click buy cheap now") ++
        Seq(40L -> "med gene spam click"): _*)
    val tgt = col("doc_id") < 20
    val lamDf = dsirFit(docs, "text", tgt, buckets = B)
    val w = dsirWeights(docs, "doc_id", "text", lamDf, B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(0L) > w(40L) && w(40L) > w(20L),
      s"ordering violated: tgt=${w(0L)} mixed=${w(40L)} raw=${w(20L)}")
    assert(w(0L) > 0 && w(20L) < 0)
  }
}
