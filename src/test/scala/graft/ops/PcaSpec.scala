package graft.ops

import breeze.linalg.{DenseMatrix => BDM}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {

  /** Synthetic data with planted structure: 2 high-variance directions
    * inside an 8-dim space plus isotropic noise. */
  private def data(n: Int, seed: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val a = rnd.nextGaussian() * 5.0
      val b = rnd.nextGaussian() * 2.0
      Array.tabulate(8) { i =>
        val signal = a * (if (i < 4) 0.5 else 0.0) + b * (if (i >= 4) 0.5 else 0.0)
        signal + rnd.nextGaussian() * 0.1 + (if (i == 0) 3.0 else 0.0) // offset mean
      }
    }
  }

  test("fit recovers orthonormal components with descending variance") {
    import spark.implicits._
    val df = data(2000, 7).toDF("v")
    val m = PCA.fit(df, "v", k = 3)
    assert(m.variance(0) >= m.variance(1) && m.variance(1) >= m.variance(2))
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"components $i,$j not orthonormal: $dot")
    }
    // the two planted directions dominate: top-2 variance >> 3rd (noise)
    assert(m.variance(1) > 10 * m.variance(2),
      s"planted structure not recovered: ${m.variance.toSeq}")
    // sign fix: every component's largest-|coeff| entry is positive
    m.components.foreach { c =>
      assert(c(c.indices.maxBy(j => math.abs(c(j)))) > 0)
    }
  }

  test("fitRandomized recovers the exact fit's top subspace without the d^2 accumulator") {
    import spark.implicits._
    val rows = data(3000, 29)
    val df = rows.toDF("v").repartition(8)
    val exact = PCA.fit(df, "v", k = 2)
    val sketch = PCA.fitRandomized(df, "v", k = 2, oversample = 4, powerIters = 1)
    // per-component alignment (strong planted eigengap -> vectors match,
    // not just the subspace), sign-fix makes the dot positive
    exact.components.zip(sketch.components).zipWithIndex.foreach { case ((e, s), i) =>
      val dot = e.zip(s).map { case (a, b) => a * b }.sum
      assert(dot > 0.999, s"component $i misaligned: dot=$dot")
    }
    exact.variance.zip(sketch.variance).foreach { case (ve, vs) =>
      assert(math.abs(ve - vs) / ve < 0.02, s"variance off: $ve vs $vs")
    }
    // orthonormal + sign-fixed like the exact model
    for (i <- 0 until 2; j <- 0 until 2) {
      val dot = sketch.components(i).zip(sketch.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    sketch.components.foreach(c => assert(c(c.indices.maxBy(j => math.abs(c(j)))) > 0))
    // deterministic: the seeded test matrix is part of the model identity
    val again = PCA.fitRandomized(df, "v", k = 2, oversample = 4, powerIters = 1)
    assert(again.components.map(_.toSeq).toSeq == sketch.components.map(_.toSeq).toSeq)
    // the same projectColumn serves both models
    val p = PCA.transform(df.limit(5), "v", sketch, "p").select("p").collect()
    assert(p.forall(_.getSeq[Double](0).length == 2))
  }

  test("distributed moments match the driver-side covariance exactly enough") {
    import spark.implicits._
    val rows = data(500, 13)
    val m = PCA.fit(rows.toDF("v").repartition(8), "v", k = 2)
    // driver reference: breeze eigSym of the sample covariance
    val n = rows.length
    val d = 8
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val cov = BDM.tabulate(d, d) { (i, j) =>
      rows.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / (n - 1.0)
    }
    val es = breeze.linalg.eigSym(cov)
    val top = (0 until d).sortBy(i => -es.eigenvalues(i)).take(2)
    top.zipWithIndex.foreach { case (ei, ci) =>
      assert(math.abs(es.eigenvalues(ei) - m.variance(ci)) < 1e-6 * (1 + es.eigenvalues(ei)))
      val ref = es.eigenvectors(::, ei).toArray
      val cos = math.abs(ref.zip(m.components(ci)).map { case (a, b) => a * b }.sum)
      assert(cos > 1.0 - 1e-9, s"component $ci direction off (|cos|=$cos)")
    }
    // partitioning must not change the fit (exact same moments)
    val m1 = PCA.fit(rows.toDF("v").repartition(1), "v", k = 2)
    top.indices.foreach { ci =>
      val cos = m1.components(ci).zip(m.components(ci)).map { case (a, b) => a * b }.sum
      assert(cos > 1.0 - 1e-9)
    }
  }

  test("covSketch equals the densely-formed covariance times omega") {
    import spark.implicits._
    val rows = data(400, 31)
    val d = rows.head.length
    val rnd = new java.util.Random(5L)
    val omega = Array.fill(d, 3)(rnd.nextGaussian())
    val (n, mean, s) = PCA.covSketch(rows.toDF("v"), "v", omega)
    assert(n == 400L)
    // dense reference: C·Ω from driver-side moments
    val mu = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    mean.zip(mu).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    for (i <- 0 until d; j <- 0 until 3) {
      val ref = (0 until d).map { q =>
        val cij = rows.map(r => (r(i) - mu(i)) * (r(q) - mu(q))).sum / (n - 1.0)
        cij * omega(q)(j)
      }.sum
      assert(math.abs(s(i, j) - ref) < 1e-7 * (1 + math.abs(ref)),
        s"sketch ($i,$j): ${s(i, j)} vs dense $ref")
    }
  }

  test("transform projects onto the components, preserving planted variance") {
    import spark.implicits._
    val df = data(2000, 21).toDF("v")
    val m = PCA.fit(df, "v", k = 2)
    val proj = PCA.transform(df, "v", m, "p")
      .select(element_at(col("p"), 1).as("p1"), element_at(col("p"), 2).as("p2"))
    val stats = proj.agg(
      avg("p1"), variance("p1"), variance("p2")).head()
    assert(math.abs(stats.getDouble(0)) < 0.2, "projection must be centered")
    assert(math.abs(stats.getDouble(1) - m.variance(0)) < 0.1 * m.variance(0))
    assert(math.abs(stats.getDouble(2) - m.variance(1)) < 0.1 * m.variance(1))
  }
}
