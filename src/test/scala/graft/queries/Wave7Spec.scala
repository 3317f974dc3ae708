package graft.queries

import graft.SparkTestBase

/** Invariant checks for the round-14 late pack (e21 Kaplan–Meier,
  * t36 KMV overlap — st33's outer-join emission semantics live in
  * EventStreamsSpec, and the driver oracle covers its batch parity). */
class Wave7Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  test("e21: KM bookkeeping telescopes and survival recomputes from the outputs") {
    val out = run("e21_kaplan_meier").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    // subjects are e02's sessions — the census must cover each exactly once
    val sessions = run("e02_sessionize").count()
    assert(out.map(t => t._4 + t._5).sum == sessions,
      "every session appears in exactly one (cohort, duration) cell")
    assert(out.map(_._4).sum > 0 && out.map(_._5).sum > 0,
      "both conversions and censored sessions must exist — the corpus " +
        "genuinely right-censors at this grain")
    out.groupBy(_._1).foreach { case (cohort, rows0) =>
      val rows = rows0.sortBy(_._2)
      // at-risk telescopes: next n = n - churned - censored, first n = cohort size
      rows.zip(rows.tail).foreach { case (a, b) =>
        assert(b._3 == a._3 - a._4 - a._5, s"$cohort: at_risk must telescope")
      }
      assert(rows.head._3 == rows.map(t => t._4 + t._5).sum,
        s"$cohort: first at_risk must equal the cohort size")
      // survival recomputes from (churned, at_risk) under the quantized-ln rule
      var cum = 0L
      var zeros = 0
      rows.foreach { case (_, _, n, d, _, surv) =>
        if (d >= n) zeros += 1
        else if (d > 0)
          cum += math.floor(math.log(1.0 - d.toDouble / n) * 1e6 + 0.5).toLong
        val expect =
          if (zeros > 0) 0.0
          else math.floor(math.exp(cum / 1e6) * 1e6 + 0.5) / 1e6
        assert(surv == expect, s"$cohort: surv $surv != recomputed $expect")
        assert(surv >= 0.0 && surv <= 1.0)
      }
      val survs = rows.map(_._6)
      assert(survs.zip(survs.tail).forall { case (a, b) => b <= a },
        s"$cohort: survival must be non-increasing")
    }
  }

  test("e23: hazard/variance telescope exactly and Fleming–Harrington " +
      "dominates Kaplan–Meier row-for-row") {
    val na = run("e23_nelson_aalen").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(na.nonEmpty)
    na.groupBy(_._1).foreach { case (cohort, rows0) =>
      val rows = rows0.sortBy(_._2)
      var h = 0L
      var v = 0L
      rows.foreach { case (_, dur, n, d, hc, vc, sfh) =>
        assert(d > 0, s"$cohort/$dur: only event times emit")
        h += d * 1000000L / n
        v += d * 1000000000L / (n * n)
        assert(hc == h && vc == v, s"$cohort/$dur: cumulative terms must telescope")
        val expect = math.floor(math.exp(-h / 1e6) * 1e6 + 0.5) / 1e6
        assert(sfh == expect, s"$cohort/$dur: surv_fh $sfh != $expect")
      }
    }
    // exp(−d/n) ≥ 1 − d/n per step, so S_FH ≥ S_KM everywhere — the
    // textbook dominance, checked against e21's independent output
    val km = run("e21_kaplan_meier").collect()
      .map(r => ((r.getDate(0).toString, r.getLong(1)), r.getDouble(5))).toMap
    na.foreach { case (cohort, dur, _, _, _, _, sfh) =>
      val sKm = km((cohort, dur))
      assert(sfh >= sKm - 1e-6,
        s"$cohort/$dur: S_FH $sfh must dominate S_KM $sKm")
    }
  }

  test("e22: hypergeometric terms and the running chi-square recompute " +
      "from the row outputs") {
    val out = run("e22_logrank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getDouble(9)))
    assert(out.nonEmpty)
    var oeCum = 0L
    var vCum = 0L
    out.foreach { case (dur, nA, dA, nB, dB, eaMicro, vMicro, oeC, vC, chi2) =>
      val d = dA + dB
      val n = nA + nB
      assert(d > 0, s"$dur: only conversion times appear")
      assert(dA <= nA && dB <= nB, s"$dur: observed cannot exceed at-risk")
      assert(eaMicro == d * nA * 1000000L / n, s"$dur: E_A mismatch")
      if (n > 1) {
        val v = math.floor(d.toDouble * nA * nB * (n - d)
          / (n.toDouble * n * (n - 1)) * 1e6 + 0.5).toLong
        assert(vMicro == v, s"$dur: V mismatch")
      }
      oeCum += dA * 1000000L - eaMicro
      vCum += vMicro
      assert(oeC == oeCum && vC == vCum, s"$dur: cumulative sums must telescope")
      val expect =
        if (vCum > 0)
          math.floor((oeCum / 1e6) * (oeCum / 1e6) / (vCum / 1e6) * 1e6 + 0.5) / 1e6
        else 0.0
      assert(chi2 == expect, s"$dur: chi2 $chi2 != recomputed $expect")
    }
  }

  test("kmv: below k the sketch is the whole set — planted overlap is EXACT") {
    import spark.implicits._
    // A = w0..w29 (28 shingle starts), B = w20..w49 (28); shared shingles
    // are exactly the starts w20..w27 → |A∩B| = 8, |A∪B| = 48 < k = 128,
    // so the union sketch holds everything and every output is truth.
    def text(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")
    val docs = Seq(("A", text(0, 29)), ("B", text(20, 49))).toDF("source", "text")
    val out = graft.ops.Dedup.kmvSourceOverlap(docs, "source", "text").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("ku") == 48L)
    assert(r.getAs[Long]("matches") == 8L)
    assert(r.getAs[Double]("n_a") == 28.0 && r.getAs[Double]("n_b") == 28.0)
    assert(math.abs(r.getAs[Double]("jaccard") - 8.0 / 48.0) < 2e-6)
    assert(math.abs(r.getAs[Double]("inter_est") - 8.0) < 0.01)
  }

  test("kmv union screen: below k every number is exact truth") {
    import spark.implicits._
    // same planted frame as the pairwise test: |A| = |B| = 28 shingles,
    // |A∪B| = 48 < k — the union sketch IS the union, so containment is
    // the exact ppm fraction and n_union the exact distinct count
    def text(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")
    val docs = Seq(("A", text(0, 29)), ("B", text(20, 49))).toDF("source", "text")
    val out = graft.ops.Dedup.kmvUnionScreen(
      graft.ops.Dedup.kmvSourceSketches(docs, "source", "text"), k = 128)
      .collect().map(r => (r.getString(0), r.getAs[Long]("matches"),
        r.getAs[Long]("contain_ppm"), r.getAs[Double]("n_union")))
    assert(out.length == 2)
    out.foreach { case (src, matches, ppm, nUnion) =>
      assert(matches == 28L, s"$src: whole sketch sits inside the union")
      assert(ppm == 28L * 1000000L / 48L, s"$src: containment must be exact")
      assert(nUnion == 48.0, s"$src: union estimate must be exact below k")
    }
  }

  test("kmv buffer: set semantics, cap, and commutative merge") {
    val a = new org.apache.spark.sql.graftshim.KmvBuffer(4)
    Seq(9L, 5L, 9L, 7L, 5L, 3L, 8L, 3L).foreach(a.add)
    assert(a.elements == Seq(3L, 5L, 7L, 8L), "duplicates absorb, k smallest kept")
    val b = new org.apache.spark.sql.graftshim.KmvBuffer(4)
    Seq(1L, 7L, 2L).foreach(b.add)
    val ab = new org.apache.spark.sql.graftshim.KmvBuffer(4)
    ab.addAll(a); ab.addAll(b)
    val ba = new org.apache.spark.sql.graftshim.KmvBuffer(4)
    ba.addAll(b); ba.addAll(a)
    assert(ab.elements == Seq(1L, 2L, 3L, 5L) && ba.elements == ab.elements,
      "merge is a commutative set union trimmed to k")
  }

  test("kmv: estimator regime tracks planted overlap within sketch error") {
    import spark.implicits._
    // A = w0..w599 (598 shingles), B = w300..w899 (598); intersection =
    // starts w300..w597 = 298, union = 898 — all beyond k = 128, so every
    // number is an order-statistics ESTIMATE. k=128 KMV: σ(n̂)/n ≈ 9%,
    // σ(Ĵ) ≈ √(J(1−J)/k) ≈ 0.042 — the asserts sit at ~4σ. The hash
    // seed is fixed, so this is a deterministic regression pin, not a
    // flaky statistical test.
    def text(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")
    val docs = Seq(("A", text(0, 599)), ("B", text(300, 899))).toDF("source", "text")
    val r = graft.ops.Dedup.kmvSourceOverlap(docs, "source", "text").collect().head
    val trueJ = 298.0 / 898.0
    assert(r.getAs[Long]("ku") == 128L)
    assert(math.abs(r.getAs[Double]("n_a") - 598.0) < 0.35 * 598.0,
      s"n_a ${r.getAs[Double]("n_a")} too far from 598")
    assert(math.abs(r.getAs[Double]("n_b") - 598.0) < 0.35 * 598.0,
      s"n_b ${r.getAs[Double]("n_b")} too far from 598")
    assert(math.abs(r.getAs[Double]("jaccard") - trueJ) < 0.17,
      s"jaccard ${r.getAs[Double]("jaccard")} too far from $trueJ")
    assert(math.abs(r.getAs[Double]("inter_est") - 298.0) < 0.5 * 298.0,
      s"inter_est ${r.getAs[Double]("inter_est")} too far from 298")
  }
}
