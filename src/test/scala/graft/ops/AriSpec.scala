package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/**
 * a30's census: `Similarity.ariMicro` must equal the independent
 * pair-category ARI formulation on random labelings (the two forms
 * are equal by the Hubert–Arabie identity — computing both is the
 * cross-check), score identical clusterings at exactly 1, be
 * invariant to label permutation, and sit near 0 on independent
 * labelings.
 */
class AriSpec extends AnyFunSuite {

  private def contingency(a: Seq[Int], b: Seq[Int]): Seq[(Int, Int, Long)] =
    a.zip(b).groupBy(identity).map { case ((x, y), g) =>
      (x, y, g.size.toLong) }.toSeq

  /** Independent ARI via pair categories: over all unordered pairs,
    * n11 same-same, n10 same-diff, n01 diff-same, n00 diff-diff;
    * ARI = 2(n11·n00 − n10·n01) /
    *       ((n11+n10)(n10+n00) + (n11+n01)(n01+n00)). */
  private def pairAriMicro(a: Seq[Int], b: Seq[Int]): Long = {
    var n11, n10, n01, n00 = BigInt(0)
    for (i <- a.indices; j <- (i + 1) until a.length) {
      val sa = a(i) == a(j)
      val sb = b(i) == b(j)
      if (sa && sb) n11 += 1
      else if (sa) n10 += 1
      else if (sb) n01 += 1
      else n00 += 1
    }
    val denom = (n11 + n10) * (n10 + n00) + (n11 + n01) * (n01 + n00)
    if (denom == 0) 0L
    else (BigInt(2000000) * (n11 * n00 - n10 * n01) / denom).toLong
  }

  test("ariMicro equals the independent pair-category formulation on " +
      "random labelings, including near-zero and negative cases") {
    val rnd = new scala.util.Random(30)
    (1 to 25).foreach { t =>
      val n = 30 + rnd.nextInt(40)
      val a = Seq.fill(n)(rnd.nextInt(3))
      val b = Seq.fill(n)(rnd.nextInt(4))
      val got = Similarity.ariMicro(contingency(a, b))._5
      val want = pairAriMicro(a, b)
      // the two closed forms are algebraically equal; the only slack
      // is the independent truncating divisions (±1 micro)
      assert(math.abs(got - want) <= 1L, s"trial $t: $got vs $want")
    }
  }

  test("identical clusterings score exactly 1, permuted labels leave " +
      "ARI invariant, independent balanced labels sit near 0") {
    val rnd = new scala.util.Random(31)
    val a = Seq.fill(60)(rnd.nextInt(4))
    assert(Similarity.ariMicro(contingency(a, a))._5 == 1000000L)
    val perm = Map(0 -> 2, 1 -> 3, 2 -> 0, 3 -> 1)
    val b = Seq.fill(60)(rnd.nextInt(3))
    assert(Similarity.ariMicro(contingency(a, b))._5 ==
      Similarity.ariMicro(contingency(a.map(perm), b))._5)
    // independent balanced product table: expectation-corrected to 0
    val prod = for (i <- 0 until 2; j <- 0 until 2) yield (i, j, 25L)
    assert(math.abs(Similarity.ariMicro(prod)._5) < 20000L)
  }
}
