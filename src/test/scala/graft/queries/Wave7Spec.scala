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
    val users = graft.tables.Tables(spark, dir).events
      .select("user_id").distinct().count()
    assert(out.map(t => t._4 + t._5).sum == users,
      "every user appears in exactly one (cohort, duration) cell")
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
