package graft.queries

import graft.SparkTestBase

/** Invariant checks for the round-17 survival additions: e33
  * Harrell's concordance (planted-separation recovery, the exact
  * subject-level pair census as an independent reference, the
  * C + (1−C) symmetry), e34 Efron ties (BIT-FOR-BIT Breslow identity
  * on a tie-free spine; closer-to-planted-β than Breslow under heavy
  * ties — the property that distinguishes the estimators), and e35
  * Greenwood (the band recomputes from its own published columns).
  * The driver oracle covers the end-to-end SQL replay; these pin the
  * STATISTICS. */
class Wave10Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  /** Subjects → the (dA, d, nA, nB) spine rows (d > 0 times only,
    * ascending) the kernels and census consume. */
  private def spineOf(subs: Seq[(Long, Boolean, Boolean)])
      : Seq[(Long, Long, Long, Long)] = {
    val times = subs.map(_._1).distinct.sorted
    times.flatMap { t =>
      val dA = subs.count(s => s._1 == t && s._2 && s._3)
      val dB = subs.count(s => s._1 == t && !s._2 && s._3)
      val nA = subs.count(s => s._1 >= t && s._2)
      val nB = subs.count(s => s._1 >= t && !s._2)
      if (dA + dB > 0) Some((dA.toLong, (dA + dB).toLong, nA.toLong, nB.toLong))
      else None
    }
  }

  /** The DEFINITION, enumerated: over all ordered subject pairs
    * (i, j), comparable iff (t_i < t_j and i an event) or (t_i = t_j,
    * i an event, j censored); doubled-numerator credit 2 when the
    * failing subject carries the strictly higher risk weight, 1 on a
    * risk tie. */
  private def bruteCensus(subs: Seq[(Long, Boolean, Boolean)], w: Long)
      : (Long, Long) = {
    var comp = 0L
    var num2 = 0L
    for (i <- subs; j <- subs if i != j) {
      val usable = (i._1 < j._1 && i._3) || (i._1 == j._1 && i._3 && !j._3)
      if (usable) {
        comp += 1
        val ri = if (i._2) w else 1000000L
        val rj = if (j._2) w else 1000000L
        num2 += (if (ri > rj) 2L else if (ri == rj) 1L else 0L)
      }
    }
    (comp, num2)
  }

  test("e33 C division is 128-bit: totals past the Long product bound " +
      "divide exactly, and the census kernel wraps loudly, never silently") {
    // the r17 two-decade panel's regime: 1.47e13 comparable pairs —
    // num2·5e5 needs 2^63.7, so a Long product would go negative
    assert(Survival.cIndexMicro(22000000000000L, 14666282740000L) ==
      BigInt(22000000000000L) * 500000 / BigInt(14666282740000L))
    assert(Survival.cIndexMicro(Long.MaxValue - 1, Long.MaxValue / 2)
      == 1000000L, "C = 1 exactly at the extreme BIGINT edge " +
      "(num2 = 2·comp with comp = Long.MaxValue/2)")
    assert(Survival.cIndexMicro(0L, 0L) == 0L)
    // a per-time cell whose pair product cannot fit 2^63 must throw,
    // not wrap into a wrong census
    intercept[ArithmeticException] {
      // d·(pa+pb) = 3e9·5e9 = 1.5e19 > 2^63
      Survival.harrellCensus(1500000000L, 3000000000L, 4000000000L,
        4000000000L, 2000000L)
    }
  }

  test("e33 census: matches the subject-level pair enumeration on " +
      "random censored data at every weight regime") {
    val rnd = new scala.util.Random(3333)
    val subs = Seq.fill(300)((rnd.nextInt(12).toLong + 1,
      rnd.nextBoolean(), rnd.nextDouble() < 0.7))
    val spine = spineOf(subs)
    for (w <- Seq(400000L, 1000000L, 2500000L)) {
      val got = spine.map { case (dA, d, nA, nB) =>
        Survival.harrellCensus(dA, d, nA, nB, w) }
        .foldLeft((0L, 0L)) { case ((c, n), (c2, n2)) => (c + c2, n + n2) }
      assert(got == bruteCensus(subs, w),
        s"spine census must equal the pair enumeration at w=$w")
    }
  }

  test("e33 census: perfect separation gives C = 1, the flipped sign " +
      "gives 1 - C, and the two always sum to 1 exactly") {
    // group a all fails at t=1, group b all at t=10: every comparable
    // pair is cross-group with the a-subject failing first — spine
    // rows (dA, d, nA, nB) at the two death times
    val spine = Seq((5L, 5L, 5L, 5L), (0L, 5L, 0L, 5L))
    def c(w: Long): Long = {
      val (comp, num2) = spine.map { case (dA, d, nA, nB) =>
        Survival.harrellCensus(dA, d, nA, nB, w) }
        .foldLeft((0L, 0L)) { case ((a, b), (x, y)) => (a + x, b + y) }
      num2 * 500000L / comp
    }
    assert(c(2000000L) == 1000000L, "higher-risk-fails-first must score C = 1")
    assert(c(500000L) == 0L, "the flipped sign must score 1 - C = 0")
    // symmetry on a random spine: num2(w>) + num2(w<) = 2·comp, so
    // C(w>) + C(w<) = 1 up to the one truncating division
    val rnd = new scala.util.Random(331)
    val subs = Seq.fill(200)((rnd.nextInt(9).toLong + 1,
      rnd.nextBoolean(), rnd.nextDouble() < 0.8))
    val sp = spineOf(subs)
    val tot = { (w: Long) =>
      sp.map { case (dA, d, nA, nB) =>
        Survival.harrellCensus(dA, d, nA, nB, w) }
        .foldLeft((0L, 0L)) { case ((a, b), (x, y)) => (a + x, b + y) } }
    val (compHi, numHi) = tot(1700000L)
    val (compLo, numLo) = tot(300000L)
    assert(compHi == compLo && numHi + numLo == 2 * compHi,
      "concordant and discordant must swap exactly under a sign flip")
  }

  test("e33 on testdata: rows replay from e22's spine and e24's " +
      "fitted weight; the global C rides every row and is > 1/2") {
    val e22 = run("e22_logrank").collect()
    val w = run("e24_cox").collect().last.getLong(5)
    val rows = run("e33_concordance").collect()
    assert(rows.length == e22.length)
    var compCum = 0L
    var num2Cum = 0L
    e22.zip(rows).foreach { case (a, b) =>
      val (nA, dA, nB, dB) = (a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4))
      val (comp, num2) = Survival.harrellCensus(dA, dA + dB, nA, nB, w)
      compCum += comp; num2Cum += num2
      assert(b.getLong(1) == dA && b.getLong(2) == dB &&
        b.getLong(3) == comp && b.getLong(4) == num2 &&
        b.getLong(5) == compCum && b.getLong(6) == num2Cum,
        s"census row at ${b.getLong(0)}")
    }
    val c = num2Cum * 500000L / compCum
    rows.foreach(r => assert(r.getLong(7) == c, "global C must ride every row"))
    // the model was FIT on this spine: its own discrimination cannot
    // be anti-concordant
    assert(c >= 500000L, s"C $c must be >= 1/2 on the training spine")
    assert(c < 1000000L, "and the testdata is not perfectly separated")
  }

  test("e34 kernel: Efron reproduces Breslow BIT-FOR-BIT on a " +
      "tie-free spine") {
    val rnd = new scala.util.Random(3434)
    // distinct times, one death each, shrinking risk sets
    var nA = 700L
    var nB = 900L
    val rows = (1 to 300).map { t =>
      val a = rnd.nextBoolean()
      val r = (if (a) 1L else 0L, 1L, nA, nB)
      if (a) nA -= 1 else nB -= 1
      // random extra censoring between event times
      nA -= rnd.nextInt(2); nB -= rnd.nextInt(2)
      r
    }
    assert(Survival.coxNewtonEfron(rows) == Events.coxNewton(rows),
      "every step tuple must match exactly when no time carries a tie")
  }

  test("e34 kernel: under heavy ties Efron lands closer to the " +
      "planted beta than Breslow, which attenuates toward zero") {
    val bTrue = 1.0
    val rnd = new scala.util.Random(3435)
    // exponential times, group-a rate e^bTrue-fold higher, CEILed to
    // a coarse integer grid so most mass piles into a few tied values
    def draw(rate: Double) =
      math.max(1L, math.ceil(-math.log(rnd.nextDouble()) / rate).toLong)
    val subs = Seq.fill(4000)((draw(0.5 * math.exp(bTrue)), true, true)) ++
      Seq.fill(4000)((draw(0.5), false, true))
    val spine = spineOf(subs)
    assert(spine.map(_._2).max >= 100L, "the grid must actually create heavy ties")
    val bE = Survival.coxNewtonEfron(spine).last._5 / 1e6
    val bB = Events.coxNewton(spine).last._5 / 1e6
    assert(math.abs(bB) < math.abs(bE),
      s"Breslow ($bB) must attenuate below Efron ($bE) under heavy ties")
    assert(math.abs(bE - bTrue) < math.abs(bB - bTrue),
      s"Efron $bE must sit closer to the planted $bTrue than Breslow $bB")
  }

  test("e34 on testdata: the Breslow column replays e24 exactly and " +
      "the tie divergence is real and step-monotone in the tail") {
    val e24 = run("e24_cox").collect()
    val rows = run("e34_cox_efron").collect()
    assert(rows.length == 6)
    rows.zip(e24).foreach { case (r, b) =>
      assert(r.getLong(6) == b.getLong(4),
        s"breslow_beta at step ${r.getLong(0)} must equal e24's")
      assert(r.getLong(7) == r.getLong(4) - r.getLong(6))
      assert(r.getLong(5) ==
        math.floor(StrictMath.exp(r.getLong(4) / 1e6) * 1e6 + 0.5).toLong,
        "hr must replay exp(beta) under the micro quantum")
    }
    // minute-grain ties are heavy on this corpus: the estimators
    // genuinely diverge, in Breslow's attenuation direction
    val diff = rows.last.getLong(7)
    assert(math.abs(diff) > 10000L, s"final divergence $diff must be real")
    assert(math.abs(rows.last.getLong(4)) > math.abs(rows.last.getLong(6)),
      "|Efron beta| must exceed the attenuated |Breslow beta|")
  }

  test("e35: the band recomputes from its own published columns and " +
      "the curve/variance obey their monotonicities") {
    val rows = run("e35_km_greenwood").collect()
    assert(rows.nonEmpty)
    var prevS = 1000000L
    var prevG = 0L
    rows.foreach { r =>
      val (d, n, s, g, se, lo, hi) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(s <= prevS, "KM is non-increasing")
      assert(g >= prevG, "the Greenwood accumulator is non-decreasing")
      val gTerm = if (d >= n) 0L else d * 1000000000000L / (n * (n - d))
      assert(g == prevG + gTerm, "g_pico must telescope from (d, n)")
      assert(se == math.floor(s * math.sqrt(g / 1e12) + 0.5).toLong,
        s"se at ${r.getLong(0)} must replay s*sqrt(g)")
      assert(lo == math.max(0L, s - se * 196L / 100L) &&
        hi == math.min(1000000L, s + se * 196L / 100L),
        "the band is an exact integer product of its own se column")
      assert(lo <= s && s <= hi)
      prevS = s; prevG = g
    }
    // same spine as e22: (d, n) must agree column-for-column
    val e22 = run("e22_logrank").collect()
    assert(e22.length == rows.length)
    e22.zip(rows).foreach { case (a, b) =>
      assert(a.getLong(2) + a.getLong(4) == b.getLong(1) &&
        a.getLong(1) + a.getLong(3) == b.getLong(2),
        "e35 rides e22's exact pooled spine")
    }
  }
}
