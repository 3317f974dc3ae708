package graft.ops

import breeze.linalg.{eigSym, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA over an embedding column (`array<float|double>`) —
 * the whitening / dimension-reduction step an embedding pipeline runs
 * before cosine dedup or ANN indexing.
 *
 * Scale posture: fitting is ONE `treeAggregate` of the sufficient
 * moments (n, Σx, Σxxᵀ) — a d + d² accumulator (d=64 → ~33 KB) merged
 * map-side, no row leaves its partition — followed by a driver-side
 * eigendecomposition of the d×d covariance (microseconds; a
 * distributed eigensolver for d ≤ a few thousand is scheduler overhead,
 * the same argument as the IVF quantizer). Projection broadcasts the
 * k×d component matrix and is a narrow codegen-friendly map.
 */
object PCA {

  /** Principal components, largest variance first; `components(i)` is a
    * unit d-vector, sign-fixed so each component's largest-|coefficient|
    * entry is positive (eigenvectors are sign-ambiguous; fixing makes
    * fits reproducible run-to-run and engine-to-engine). */
  final case class PCAModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      variance: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** Fit a k-component PCA on `vecCol`. One pass, one job. */
  def fit(df: DataFrame, vecCol: String, k: Int): PCAModel = {
    val rows = df.select(col(vecCol).cast("array<double>")).na.drop()
      .rdd.map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    require(k >= 1 && k <= d, s"k=$k must be in [1, $d]")
    val (n, sx, sxx) = rows.treeAggregate(
      (0L, new Array[Double](d), new Array[Double](d * d)))(
      seqOp = { case ((cnt, s, ss), x) =>
        var i = 0
        while (i < d) {
          s(i) += x(i)
          var j = 0
          val row = i * d
          while (j < d) { ss(row + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        (cnt + 1L, s, ss)
      },
      combOp = { case ((n1, s1, ss1), (n2, s2, ss2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { ss1(i) += ss2(i); i += 1 }
        (n1 + n2, s1, ss1)
      })
    require(n > 1, "PCA needs at least 2 rows")
    val mean = sx.map(_ / n)
    val cov = BDM.tabulate(d, d) { (i, j) =>
      (sxx(i * d + j) - n * mean(i) * mean(j)) / (n - 1.0)
    }
    val es = eigSym(cov) // ascending eigenvalues
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { i =>
      val v = es.eigenvectors(::, i).toArray
      val m = v.indices.maxBy(j => math.abs(v(j)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PCAModel(mean, comps, order.map(i => math.max(es.eigenvalues(i), 0.0)).toArray)
  }

  /**
   * Randomized-sketch PCA (Halko, Martinsson & Tropp 2011): the scale
   * path for WIDE embeddings, where `fit`'s d² moment accumulator stops
   * being model-sized (d = 4096 → 134 MB per task; the sketch is d×l ≈
   * 10 MB at l = k+8). Never forms the covariance:
   *
   *   pass 1:  T = Σ x·(xᵀΩ)  (+ Σx, n) — ONE treeAggregate of d×l
   *            S = (T − n·μ(μᵀΩ))/(n−1) = C·Ω;  Q ← qr(S)
   *   power:   q extra passes sharpen the range (Ω ← Q each round) —
   *            spectra with slow decay need q ≥ 1
   *   pass 3:  B = QᵀCQ via the SAME accumulator shape at l×l;
   *            eig(B) → top-k pairs, components = Q·wᵢ
   *
   * Ω is seeded Box–Muller Gaussian — deterministic run-to-run, so two
   * fits on the same partitioning are identical (the test matrix is
   * part of the model's identity, like the LSH hyperplanes). Driver
   * work is a d×l QR + l×l eig — model-sized for d up to ~10⁵.
   * Components come back sign-fixed like `fit`'s, and the same
   * `projectColumn` serves both models.
   */
  // (n, Σx, Σ x·(xᵀM)) for a broadcast d×lm probe matrix M
  private def momentPass(rows: org.apache.spark.rdd.RDD[Array[Double]],
      d: Int, m: BDM[Double]): (Long, Array[Double], BDM[Double]) = {
    val lm = m.cols
    val bc = rows.sparkContext.broadcast(m)
    val (n, sx, t) = rows.treeAggregate(
      (0L, new Array[Double](d), BDM.zeros[Double](d, lm)))(
      seqOp = { case ((cnt, s, acc), x) =>
        val mm = bc.value
        val xv = BDV(x)
        val proj = mm.t * xv // lm
        var i = 0
        while (i < d) {
          s(i) += x(i)
          var j = 0
          while (j < lm) { acc(i, j) += x(i) * proj(j); j += 1 }
          i += 1
        }
        (cnt + 1L, s, acc)
      },
      combOp = { case ((n1, s1, a1), (n2, s2, a2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        (n1 + n2, s1, a1 += a2)
      })
    bc.destroy()
    (n, sx, t)
  }

  // C·M without forming C: (T − n·μ(μᵀM))/(n−1)
  private def covTimesRdd(rows: org.apache.spark.rdd.RDD[Array[Double]],
      d: Int, m: BDM[Double]): (Long, Array[Double], BDM[Double]) = {
    val (n, sx, t) = momentPass(rows, d, m)
    require(n > 1, "PCA needs at least 2 rows")
    val mu = BDV(sx.map(_ / n))
    val s = (t - (mu * (mu.t * m)) * n.toDouble) / (n - 1.0)
    (n, sx, s)
  }

  /**
   * The randomized range-finder's SKETCH pass in isolation: S = C·Ω
   * for a caller-supplied d×l probe matrix, never forming the d×d
   * covariance — ONE treeAggregate carrying a d×l accumulator
   * (`fitRandomized`'s pass 1, exposed so the a22 gate can replay the
   * multiply under the DuckDB oracle with Ω embedded as literals).
   * Returns (n, mean, S).
   */
  def covSketch(df: DataFrame, vecCol: String,
      omega: Array[Array[Double]]): (Long, Array[Double], BDM[Double]) = {
    val rows = df.select(col(vecCol).cast("array<double>")).na.drop()
      .rdd.map(_.getSeq[Double](0).toArray)
    val d = omega.length
    val m = BDM.tabulate(d, omega.head.length)((i, j) => omega(i)(j))
    val (n, sx, s) = covTimesRdd(rows, d, m)
    (n, sx.map(_ / n), s)
  }

  def fitRandomized(df: DataFrame, vecCol: String, k: Int,
      oversample: Int = 8, powerIters: Int = 1, seed: Long = 7L): PCAModel = {
    val rows = df.select(col(vecCol).cast("array<double>")).na.drop()
      .rdd.map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    require(k >= 1 && k <= d, s"k=$k must be in [1, $d]")
    val l = math.min(d, k + oversample)
    def covTimes(m: BDM[Double]): (Long, Array[Double], BDM[Double]) =
      covTimesRdd(rows, d, m)

    // seeded Box–Muller Gaussian test matrix
    val rnd = new java.util.Random(seed)
    var probe = BDM.tabulate(d, l)((_, _) => rnd.nextGaussian())
    for (_ <- 0 to powerIters) { // range pass + powerIters sharpening passes
      val (_, _, s) = covTimes(probe)
      probe = breeze.linalg.qr.reduced(s).q
    }
    val q = probe
    // small projected problem B = QᵀCQ (l×l)
    val (n, sx, cq) = covTimes(q)
    val b = q.t * cq
    val es = eigSym((b + b.t) / 2.0) // symmetrize ulps before eig
    val order = (0 until l).sortBy(i => -es.eigenvalues(i)).take(k)
    val mean = sx.map(_ / n)
    val comps = order.map { i =>
      val v = (q * es.eigenvectors(::, i)).toArray
      val m = v.indices.maxBy(j => math.abs(v(j)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PCAModel(mean, comps, order.map(i => math.max(es.eigenvalues(i), 0.0)).toArray)
  }

  /** Projection column: the centered input dotted with each component —
    * `array<double>` of length k. Each coordinate is ONE native codegen'd
    * dot against a literal component vector (dot(x−m, w) = dot(x, w) −
    * m·w, with m·w folded to a plan constant); the model ships as plan
    * literals, like the LSH hyperplanes. */
  def projectColumn(vec: Column, model: PCAModel): Column = {
    val v = vec.cast("array<double>")
    array(model.components.map { comp =>
      val offset = comp.zip(model.mean).map { case (w, m) => w * m }.sum
      graft.functions.VectorExpressions.dot(v, typedlit(comp.toSeq)) - lit(offset)
    }.toIndexedSeq: _*)
  }

  /** `df` plus `outCol` with the k-dim projection of `vecCol`. */
  def transform(df: DataFrame, vecCol: String, model: PCAModel,
      outCol: String = "pca"): DataFrame =
    df.withColumn(outCol, projectColumn(col(vecCol), model))
}
