package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * t34/st30's Kneser-Ney TRIGRAM LM: batch/frozen-native bit-parity
 * (the property that makes the t34 oracle valid for st30's drained
 * sink), the in-domain-perplexity dominance over the bigram KN model
 * (the reason order-3 is KenLM's production minimum), and the edge
 * cases of the mapping plane (empty tokens, literal <unk>, all-OOV,
 * sub-3-token docs).
 */
class Kn3LmSpec extends SparkTestBase {
  import TextAnalysis._

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-computed two-level ratio on a tiny reference") {
    // ref: "a b c a b c a b d" — vocab at minCount=2: a(3) b(3) c(2);
    // d is OOV -> <unk>. Mapped trigram types and counts:
    //   (a,b,c) x2, (b,c,a) x2, (c,a,b) x2, (a,b,<unk>) x1
    // h3: (a,b): c2h=3, n1h=2; (b,c): 2,1; (c,a): 2,1
    // bcf: (b,c)=1 (a,b,c), (c,a)=1, (a,b)=1, (b,<unk>)=1
    // mid (by m2): b: bch=2 (types (a,b,*)x2: (a,b,c),(a,b,<unk>))...
    // derive instead from the (m2,m3) type universe:
    //   types: (b,c), (c,a), (a,b), (b,<unk>) -> ct=4
    //   bch(b)=2, bch(c)=1, bch(a)=1; bn1(b)=2, bn1(c)=1, bn1(a)=1
    //   cont3(c)=1, cont3(a)=1, cont3(b)=1, cont3(<unk>)=1
    val ref = docsDf(0L -> "a b c a b c a b d")
    val lm = trigramLmFit(ref, "text", minCount = 2)
    val v = lm.vsz.collect()(0).getLong(0)
    assert(v == 4) // a, b, c, <unk>
    val tri = lm.tri.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(tri == Map(("a", "b", "c") -> 2L, ("b", "c", "a") -> 2L,
      ("c", "a", "b") -> 2L, ("a", "b", "<unk>") -> 1L))
    // score "a b c": one trigram, seen c3=2 with c2h=3, n1h=2;
    // level 2 for (b,c): bcf=1, bch(b)=2, bn1(b)=2, cont3(c)=1, ct=4
    //   ctv = 4 + 4 = 8
    //   num2 = max(4*1-3,0)*8 + 3*2*(1+1) = 8 + 12 = 20; den2 = 4*2*8 = 64
    //   num3 = max(4*2-3,0)*64 + 3*2*20 = 320 + 120 = 440
    //   den3 = 4*3*64 = 768
    val expQ = math.floor(math.log(440.0 / 768.0) * 1e6 + 0.5).toLong
    val got = knTrigramScore(docsDf(1L -> "a b c"), "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, -expQ)), s"got ${got.toSeq}")
  }

  test("frozen native scorer is bit-parity with the batch trigram scorer") {
    val base = (0L until 60L).map { i =>
      i -> (s"tok${i % 7} tok${(i * 3) % 7} rare$i tok${(i + 1) % 7} " +
        s"tok${(i * 5) % 7} tok${i % 7} tok${(i * 2) % 7}")
    }
    // mapping edge cases: double space (empty token), literal <unk>,
    // all-OOV text, exactly-3-token and sub-3-token docs
    val docs = docsDf(base ++ Seq(
      100L -> "tok1  tok2 <unk> tok3",
      101L -> "zz qq oov words only here",
      102L -> "tok1 tok2 tok3",
      103L -> "tok1 tok2",
      104L -> "solo"): _*)
    val lm = trigramLmFit(docs, "text", minCount = 5)
    val frozen = kn3Freeze(lm)
    assert(frozen.terms.nonEmpty && !frozen.terms.contains("<unk>"))
    val batch = knTrigramScore(docs, "doc_id", "text", lm)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val native = docs
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        graft.functions.VectorExpressions.kn3LmScore(col("text"), frozen).as("r"))
      .select(col("doc_id"), element_at(col("r"), 1), element_at(col("r"), 2))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch.nonEmpty && batch.toSeq == native.toSeq)
    // sub-3-token docs carry no trigram evidence on either path
    assert(!batch.exists(r => r._1 == 103L || r._1 == 104L))
    // every probability <= 1: nll >= 0 on every doc
    assert(batch.forall(_._3 >= 0L), "q <= 0 sign discipline violated")
  }

  test("frozen V follows the batch vsz when the literal <unk> token " +
      "clears the minCount gate") {
    // '<unk>' occurs 4x >= minCount=2 — a vocab entry in the batch fit,
    // folded onto id 0 in the frozen arrays; the frozen V must still be
    // the batch vsz or every smoothed denominator shifts by one.
    val ref = docsDf(
      0L -> "the <unk> cat sat on the <unk> mat and the cat ran",
      1L -> "a <unk> dog sat on a <unk> rug and a dog ran")
    val lm = trigramLmFit(ref, "text", minCount = 2)
    assert(lm.vocab.collect().map(_.getString(0)).contains("<unk>"),
      "test premise: <unk> must clear the gate")
    val frozen = kn3Freeze(lm)
    assert(!frozen.terms.contains("<unk>"))
    assert(frozen.vSize == frozen.terms.length + 2L &&
      frozen.vSize == lm.vsz.head.getLong(0),
      s"vSize ${frozen.vSize} must count the folded <unk> vocab entry")
    val docs = docsDf(10L -> "the <unk> cat sat on a rug",
      11L -> "<unk> <unk> <unk> <unk>", 12L -> "zz qq oov text")
    val batch = knTrigramScore(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val native = docs.select(col("doc_id"),
        graft.functions.VectorExpressions.kn3LmScore(col("text"), frozen).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"), element_at(col("r"), 1), element_at(col("r"), 2))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(native == batch, s"native $native != batch $batch")
  }

  test("kn3Freeze fails LOUDLY when |V|+1 overflows the packed triple " +
      "key instead of silently wrapping ids") {
    // a vocabulary at the 2^21-1 bound: id1*V^2 with V = 2^21 would
    // exceed Long range for the largest ids, so the freeze must refuse
    // — the minCount knob is the documented way back under the bound.
    // The frames are constructed directly (fitting a 2M-term corpus in
    // a spec is not the point; the guard is).
    import spark.implicits._
    val vocab = spark.range(2097151L)
      .selectExpr("concat('t', id) AS tok")
    val tri = Seq.empty[(String, String, String, Long)]
      .toDF("m1", "m2", "m3", "c3")
    val vsz = vocab.agg((org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)) + 1).as("v"))
    val lm = TextAnalysis.TrigramLm(vocab, tri, vsz)
    val e = intercept[IllegalArgumentException] { kn3Freeze(lm) }
    assert(e.getMessage.contains("overflows the packed"),
      s"wrong failure: ${e.getMessage}")
  }

  test("native scorer nulls out on sub-3-token and empty texts") {
    val ref = docsDf(0L -> "a b c a b c a b c a b c")
    val frozen = kn3Freeze(trigramLmFit(ref, "text", minCount = 2))
    val out = docsDf(1L -> "x y z", 2L -> "a b", 3L -> "")
      .select(col("doc_id"),
        graft.functions.VectorExpressions.kn3LmScore(col("text"), frozen).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.toMap.view.mapValues(_.isDefined).toMap ==
      Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("trigram KN perplexity <= bigram KN perplexity on in-domain text " +
      "(the reason KenLM ships order >= 3)") {
    // real corpus, real gate: fit both models on the sf0.001 t16
    // survivors, score the SAME slice (in-domain by construction),
    // compare mean per-event nll. More context must not hurt on the
    // training slice.
    val d = graft.tables.Tables(spark, "/root/testdata/sf0.001").documents
    val nTok = size(split(col("text"), " "))
    val alphaRatio =
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z ]", "")))
        .cast("double") / length(col("text"))
    val stopHits = size(filter(split(col("text"), " "),
      t => t.isin("the", "a", "of", "and", "to", "in", "is", "it")))
    val gated = d.filter(nTok.between(10, 100000) && alphaRatio >= 0.6 &&
      stopHits >= lit(2))
    val lm2 = bigramLmFit(gated, "text", minCount = 5)
    val lm3 = trigramLmFit(gated, "text", minCount = 5)
    val nll2 = knBigramScore(gated, "doc_id", "text", lm2)
      .agg(avg("kn_nll_unats")).collect()(0).getDouble(0)
    val nll3 = knTrigramScore(gated, "doc_id", "text", lm3)
      .agg(avg("kn3_nll_unats")).collect()(0).getDouble(0)
    assert(nll3 <= nll2,
      s"trigram in-domain nll $nll3 must not exceed bigram nll $nll2")
  }
}
