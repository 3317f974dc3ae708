package graft.queries

import graft.SparkTestBase

/** Invariant checks for the round-16 survival additions (e29
  * three-covariate Cox via pivoted elimination). The driver oracle
  * covers the end-to-end replay; these specs pin the STATISTICS and
  * the SOLVER — the kernel must recover planted hazard ratios, and
  * the pivoted elimination must agree with an independent closed-form
  * solve including on systems that force a row swap. */
class Wave9Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  /** Independent 3×3 solve via Cramer's rule — the closed-form the
    * pivoted elimination must reproduce (up to fp noise) wherever the
    * system is well-conditioned. */
  private def cramer(m: Array[Array[Double]]): (Double, Double, Double) = {
    def det3(a: Array[Double], b: Array[Double], c: Array[Double],
        i: Int, j: Int, k: Int): Double =
      a(i) * (b(j) * c(k) - b(k) * c(j)) -
        a(j) * (b(i) * c(k) - b(k) * c(i)) +
        a(k) * (b(i) * c(j) - b(j) * c(i))
    val (r0, r1, r2) = (m(0), m(1), m(2))
    val d = det3(r0, r1, r2, 0, 1, 2)
    def col(ci: Int): Double = {
      def rep(r: Array[Double]) =
        Array.tabulate(3)(j => if (j == ci) r(3) else r(j))
      det3(rep(r0), rep(r1), rep(r2), 0, 1, 2) / d
    }
    (col(0), col(1), col(2))
  }

  test("e29 kernel: exactly proportional 8-cell deaths recover the " +
      "planted (2, 1.5, 3) hazard-ratio triple to micro precision") {
    // d_g/n_g = 1%·2^x1·1.5^x2·3^x3 EXACTLY in every cell at every
    // time ⇒ all three Breslow scores vanish term-for-term at
    // β = (ln2, ln1.5, ln3) — the MLE by algebra, not approximation
    // (the e24/e27 planting argument, one covariate further).
    // 2·factor(g) for g = 4x1+2x2+x3, factor = 2^x1·1.5^x2·3^x3
    def row(n: Long, dBase: Long) = Survival.Cox3Row(
      IndexedSeq(2L, 6L, 3L, 9L, 4L, 12L, 6L, 18L).map(_ * dBase / 2),
      IndexedSeq.fill(8)(n))
    val spine = Seq(row(24000L, 240L), row(12000L, 120L))
    val steps = Survival.coxNewton3(spine)
    val (b1, b2, b3) = (steps.last._2, steps.last._3, steps.last._4)
    assert(math.abs(b1 - 693147L) <= 30L, s"b1 $b1 must sit at ln2")
    assert(math.abs(b2 - 405465L) <= 30L, s"b2 $b2 must sit at ln1.5")
    assert(math.abs(b3 - 1098612L) <= 30L, s"b3 $b3 must sit at ln3")
    // quadratic convergence: the final scores collapse vs step 1
    assert(math.abs(steps.last._5) < math.abs(steps.head._5) / 100,
      "final |ua| must be << step 1's")
    assert(math.abs(steps.last._7) < math.abs(steps.head._7) / 100,
      "final |uc| must be << step 1's")
  }

  test("solve3 matches the independent Cramer solve, including on " +
      "systems that force a pivot row swap") {
    // forced swap: |col 0| maximal at row 1, then stage 2 swaps again
    val swap = Array(
      Array(1.0, 5.0, 0.0, 2.0),
      Array(5.0, 2.0, 1.0, 1.0),
      Array(0.0, 1.0, 3.0, 4.0))
    val got = Survival.solve3(swap.map(_.clone)).get
    val want = cramer(swap)
    assert(math.abs(got._1 - want._1) < 1e-9 &&
      math.abs(got._2 - want._2) < 1e-9 &&
      math.abs(got._3 - want._3) < 1e-9, s"$got vs $want")
    // randomized SPD-ish systems (A = M + 10·I keeps pivots healthy)
    val rnd = new scala.util.Random(2929)
    (1 to 200).foreach { _ =>
      val base = Array.fill(3, 3)(rnd.nextDouble() * 4 - 2)
      val a = Array.tabulate(3, 3)((i, j) =>
        (base(i)(j) + base(j)(i)) / 2 + (if (i == j) 10.0 else 0.0))
      val rhs = Array.fill(3)(rnd.nextDouble() * 10 - 5)
      val m = Array.tabulate(3)(i => a(i) :+ rhs(i))
      val got = Survival.solve3(m.map(_.clone)).get
      val want = cramer(m)
      assert(math.abs(got._1 - want._1) < 1e-8 &&
        math.abs(got._2 - want._2) < 1e-8 &&
        math.abs(got._3 - want._3) < 1e-8, s"$got vs $want")
    }
  }

  test("solve3 returns None on singular systems and the kernel " +
      "fail-softs a degenerate spine at beta = 0") {
    assert(Survival.solve3(Array(
      Array(2.0, 0.0, 0.0, 1.0),
      Array(0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0))).isEmpty)
    // spine where ONLY x1 varies: the x2/x3 information rows are all
    // zero, stage-2 pivoting finds no nonzero pivot, every update is
    // skipped and the trajectory stays pinned at the origin
    val spine = Seq(Survival.Cox3Row(
      IndexedSeq(100L, 0L, 0L, 0L, 150L, 0L, 0L, 0L),
      IndexedSeq(10000L, 0L, 0L, 0L, 10000L, 0L, 0L, 0L)))
    Survival.coxNewton3(spine).foreach { st =>
      assert(st._2 == 0L && st._3 == 0L && st._4 == 0L,
        s"degenerate spine must keep beta at 0: $st")
    }
  }

  test("e30: the running integral telescopes exactly from its own " +
      "curve columns, stays monotone, and its group gap agrees with " +
      "e22's direction") {
    val rows = run("e30_rmst").collect()
    assert(rows.nonEmpty)
    // exact telescoping: rmst(i) − rmst(i−1) = surv(i−1)·gap — the
    // integral IS the curve it rides, recomputed from outputs alone
    var prevT = 0L
    var prevA = 1000000L
    var prevB = 1000000L
    var accA = 0L
    var accB = 0L
    rows.foreach { r =>
      val t = r.getLong(0)
      accA += prevA * (t - prevT)
      accB += prevB * (t - prevT)
      assert(r.getLong(5) == accA && r.getLong(6) == accB,
        s"rmst must telescope at t=$t: got ${r.getLong(5)}/${r.getLong(6)}")
      assert(r.getLong(3) <= prevA && r.getLong(4) <= prevB,
        "KM curves are non-increasing")
      assert(r.getLong(7) == r.getLong(5) - r.getLong(6))
      prevT = t; prevA = r.getLong(3); prevB = r.getLong(4)
    }
    // first row: S = 1 before the first conversion, so RMST = tau
    assert(rows.head.getLong(5) == rows.head.getLong(0) * 1000000L)
    // direction: group a converting LESS (e22's O−E < 0) means its
    // time-to-conversion survival rides higher, so rmst_a > rmst_b
    val oe = run("e22_logrank").collect().last.getLong(7)
    assert(oe != 0L)
    assert((rows.last.getLong(7) > 0) == (oe < 0),
      "the RMST gap must sit on the side e22's O−E dictates")
  }

  test("e31: weights replay the pooled KM S(t−) exactly from e22's " +
      "columns and the weighted terms are exact integer products") {
    val e22 = run("e22_logrank").collect()
    val e31 = run("e31_fleming_harrington").collect()
    assert(e31.length == e22.length, "same spine, same rows")
    // independent integer replay of S(t−) from e22's published
    // (d_a, n_a, d_b, n_b): pooled ln-micro cumulated EXCLUDING the
    // current row, one exp quantized to micro — then the truncating
    // products; every value must match e31's bit-for-bit
    var cumLn = 0L
    var zeros = 0L
    var woeCum = 0L
    var wvCum = 0L
    e22.zip(e31).foreach { case (a, b) =>
      val (nA, dA, nB, dB) = (a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4))
      val (d, n) = (dA + dB, nA + nB)
      val w = if (zeros > 0) 0L
        else math.floor(StrictMath.exp(cumLn / 1e6) * 1e6 + 0.5).toLong
      assert(b.getLong(3) == w, s"w_micro at ${b.getLong(0)}: ${b.getLong(3)} vs $w")
      val ea = d * nA * 1000000L / n
      val v = if (n > 1) math.floor(
        d.toDouble * nA * nB * (n - d) / (n.toDouble * n * (n - 1))
          * 1e6 + 0.5).toLong else 0L
      val woe = w * (dA * 1000000L - ea) / 1000000L
      val wv = (w * w / 1000000L) * v / 1000000L
      assert(b.getLong(4) == woe && b.getLong(5) == wv,
        s"weighted terms at ${b.getLong(0)}")
      woeCum += woe; wvCum += wv
      assert(b.getLong(6) == woeCum && b.getLong(7) == wvCum)
      if (d > 0 && d < n)
        cumLn += math.floor(StrictMath.log(1.0 - d.toDouble / n) * 1e6 + 0.5).toLong
      else if (d >= n) zeros += 1
    }
    // the first conversion time carries weight exactly 1
    assert(e31.head.getLong(3) == 1000000L)
    // rho = 1 down-weights the tail: weights are non-increasing
    e31.map(_.getLong(3)).sliding(2).foreach { p =>
      assert(p(1) <= p(0), "S(t−) weights must be non-increasing")
    }
  }

  test("e32: residuals total e24's final score bit-for-bit and the " +
      "Mann-Kendall statistic recomputes brute-force from the rows") {
    val rows = run("e32_ph_test").collect()
    assert(rows.nonEmpty)
    // the residuals are e24's per-time score terms at the FINAL beta
    // (one evaluation past e24's step-6 score, which uses the step-6
    // ENTRY weight): replay each bit-for-bit from e22's published
    // (n_a, d_a, n_b, d_b) and e24's published final hr_micro
    val e24 = run("e24_cox").collect()
    val w = e24.last.getLong(5)
    val e22 = run("e22_logrank").collect()
    assert(e22.length == rows.length)
    e22.zip(rows).foreach { case (a, b) =>
      val (nA, dA, nB, dB) = (a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4))
      val r1 = (w.toDouble * nA) / (w.toDouble * nA + 1000000.0 * nB)
      val want = dA * 1000000L -
        math.floor((dA + dB) * r1 * 1000000.0 + 0.5).toLong
      assert(b.getLong(3) == want, s"residual at ${b.getLong(0)}")
    }
    // the MLE property: the residual TOTAL (the score at beta-hat)
    // has collapsed far below the step-1 score
    assert(math.abs(rows.map(_.getLong(3)).sum) <
      math.abs(e24.head.getLong(2)) / 1000,
      "sum of residuals must be ~0 at the fitted beta")
    // brute-force MK replay from the output rows themselves
    val rs = rows.map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    var sS = 0L
    for (i <- rs.indices; j <- (i + 1) until rs.length)
      sS += java.lang.Long.signum(rs(j)._2 - rs(i)._2)
    val n = rs.length.toLong
    val tie18 = rs.groupBy(_._2).values.map(_.size.toLong)
      .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie18
    val z = if (var18 <= 0 || sS == 0) 0L
      else if (sS > 0) math.floor(
        (sS - 1) / math.sqrt(var18 / 18.0) * 1000000.0 + 0.5).toLong
      else math.floor(
        (sS + 1) / math.sqrt(var18 / 18.0) * 1000000.0 + 0.5).toLong
    rows.foreach { r =>
      assert(r.getLong(4) == n && r.getLong(5) == sS &&
        r.getLong(6) == var18 && r.getLong(7) == z,
        s"global MK stat must ride every row: $r vs ($n, $sS, $var18, $z)")
    }
  }

  test("e29 on testdata: trajectory invariants and agreement with " +
      "e24/e27 on the shared covariates") {
    val steps = run("e29_cox3").collect()
    assert(steps.length == 6)
    assert(steps.map(_.getLong(0)).toSeq == (1L to 6L))
    steps.foreach { r =>
      (1 to 3).foreach { j =>
        val b = r.getLong(j)
        val hr = r.getLong(12 + j)
        assert(hr == math.floor(StrictMath.exp(b / 1e6) * 1e6 + 0.5).toLong,
          s"hr$j must replay exp(b$j) under the micro quantum")
      }
      // the information matrix stays positive on the diagonal
      assert(r.getLong(7) > 0 && r.getLong(10) > 0 && r.getLong(12) > 0)
    }
    val b1 = steps.last.getLong(1)
    val b2 = steps.last.getLong(2)
    // e24's single-covariate view effect and e27's two-covariate fit
    // must agree with e29 in SIGN (b1) and closely in VALUE for the
    // shared covariates — adding x3 shifts, it cannot flip
    val e24b = run("e24_cox").collect().last.getLong(4)
    assert((e24b < 0) == (b1 < 0), "e29 b1 must keep e24's sign")
    val e27 = run("e27_cox2").collect().last
    assert(math.abs(e27.getLong(1) - b1) < 100000L,
      s"e29 b1 $b1 must sit near e27's ${e27.getLong(1)}")
    assert(math.abs(e27.getLong(2) - b2) < 50000L,
      s"e29 b2 $b2 must sit near e27's ${e27.getLong(2)}")
  }
}
