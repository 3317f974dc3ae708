package graft.gp

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Inducing-set (active-set) selection strategies for the Projected
 * Process Approximation — reference spark-gp `ActiveSetProvider.scala`.
 */
object InducingPoints {

  /** Uniform random sample of `m` inputs (reference
    * `RandomActiveSetProvider`). */
  def random(points: RDD[Array[Double]], m: Int, seed: Long): Array[Array[Double]] =
    points.takeSample(withReplacement = false, m, seed)

  /** K-means centroids as inducing inputs (reference
    * `KMeansActiveSetProvider`): better coverage of the input density
    * for the same m. */
  def kmeans(spark: SparkSession, points: RDD[Array[Double]], m: Int, seed: Long,
      maxIter: Int = 20): Array[Array[Double]] = {
    import spark.implicits._
    val df = points.toDF("raw").select(array_to_vector(col("raw")).as("features"))
    new KMeans()
      .setK(m)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .fit(df)
      .clusterCenters
      .map(_.toArray)
  }

  /**
   * Greedy farthest-point (k-center) selection: repeatedly add the
   * training points farthest from the current inducing set.
   *
   * This is graft's deliberate deviation (SURVEY.md §6) from the
   * reference's likelihood-driven greedy (`GreedilyOptimizingActiveSet
   * Provider`, Seeger et al. 2003): same role — inducing points that
   * cover the input space — at O(m·n/batch) narrow passes with no
   * per-step kernel solves, which is what survives a 100 TB corpus.
   * Each round broadcasts only the `batch` new points and keeps a
   * cached (point, min-distance) RDD; lineage is cut every round by
   * persisting the new state and unpersisting the old.
   */
  def greedy(points: RDD[Array[Double]], m: Int, seed: Long,
      batch: Int = 8): Array[Array[Double]] = {
    val sc = points.sparkContext
    val first = points.takeSample(withReplacement = false, 1, seed)
    require(first.nonEmpty, "empty training set")
    val active = scala.collection.mutable.ArrayBuffer[Array[Double]](first(0))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val firstBC = sc.broadcast(first(0))
    var state = points.map(p => (p, d2(p, firstBC.value)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    while (active.size < m) {
      val take = math.min(batch, m - active.size)
      val newPts = state.top(take)(Ordering.by(_._2)).map(_._1)
      active ++= newPts
      val bc = sc.broadcast(newPts)
      val next = state.map { case (p, d) =>
        var best = d
        bc.value.foreach { q => val dd = d2(p, q); if (dd < best) best = dd }
        (p, best)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent
      state.unpersist(blocking = false)
      state = next
    }
    state.unpersist(blocking = false)
    active.take(m).toArray
  }

  /**
   * Likelihood-greedy forward selection (Seeger, Williams & Lawrence
   * 2003, "Fast Forward Selection to Speed Up Sparse Gaussian Process
   * Regression" — the reference's `GreedilyOptimizingActiveSetProvider`
   * role): starting from one seeded point, repeatedly add the candidate
   * whose inclusion most increases the approximate log marginal
   * likelihood Δᵢ of the projected-process model.
   *
   * Scale posture: the reference recomputes per-candidate scores with a
   * full pass over every expert for every one of the m additions —
   * O(m × full-data) distributed rounds. Here candidates AND the
   * scoring set are ONE bounded sample (≤ `poolSize`, default
   * min(2048, max(4m, 256))) taken in a single pass; all m greedy steps
   * are then driver-side dense algebra on that sample — the same
   * likelihood-driven selection, with cost independent of corpus size
   * (the selection needs the coarse shape of the data, not every row —
   * the same argument as the IVF quantizer sample).
   *
   * @param fitted kernel with the OPTIMIZED hyperparameters (selection
   *               quality depends on scoring under the fitted prior)
   */
  def likelihoodGreedy(data: RDD[(Array[Double], Double)], m: Int, seed: Long,
      fitted: graft.gp.kernel.Kernel, poolSize: Int = 0): Array[Array[Double]] = {
    import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
    val target = if (poolSize > 0) poolSize else math.min(2048, math.max(4 * m, 256))
    val pool = data.takeSample(withReplacement = false, target, seed)
    require(pool.nonEmpty, "empty training set")
    val n = pool.length
    val xs = pool.map(_._1)
    val ys = BDV(pool.map(_._2))
    val sigma2 = math.max(fitted.noiseVar, 1e-12)
    val sigma = math.sqrt(sigma2)
    // Seeger's formulas take the NOISE-FREE prior K plus an explicit
    // σ²; `fitted` is the full kernel whose gram/self diagonals already
    // carry the white term (exactly σ², zero off-diagonal) — subtract
    // it so the noise isn't double-counted in l_i, p_i, q_i.
    val kDiag = BDV(xs.map(x => fitted.self(x) - fitted.noiseVar): _*)

    val active = scala.collection.mutable.ArrayBuffer[Int](0) // takeSample already shuffles
    val inActive = scala.collection.mutable.HashSet[Int](0)
    while (active.size < math.min(m, n)) {
      val s = active.toArray
      val zx = s.map(xs)
      val kmm = fitted.gram(new graft.gp.kernel.ExpertData(zx, new Array[Double](s.length)))
      var d = 0
      // tiny jitter keeps the noise-free gram factorizable when active
      // points are near-duplicates
      while (d < s.length) { kmm(d, d) += 1e-10 - fitted.noiseVar; d += 1 }
      val kmn = fitted.cross(zx, xs)
      val lmm = GPCore.cholOrThrow(kmm)
      val b = (kmm *:* sigma2) + (kmn * kmn.t)
      val lb = GPCore.cholOrThrow(b)
      val w = LinAlg.cholSolve(lb, kmn * ys)
      val kinv = LinAlg.cholInverse(lmm)
      val binv = LinAlg.cholInverse(lb)
      var bestI = -1
      var bestDelta = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!inActive.contains(i)) {
          val delta = seegerDelta(kmn(::, i), ys(i), kDiag(i), kinv, binv, w, sigma, sigma2)
          if (delta > bestDelta) { bestDelta = delta; bestI = i }
        }
        i += 1
      }
      if (bestI < 0) return active.map(xs).toArray // numerically saturated pool
      active += bestI
      inActive += bestI
    }
    active.map(xs).toArray
  }

  /** Seeger's one-candidate likelihood gain Δᵢ (shared by the sampled
    * and the full-pool selector — identical math, different iteration).
    * Returns -∞ for numerically saturated candidates. */
  private def seegerDelta(c: breeze.linalg.DenseVector[Double], y: Double,
      kDiagI: Double, kinv: breeze.linalg.DenseMatrix[Double],
      binv: breeze.linalg.DenseMatrix[Double], w: breeze.linalg.DenseVector[Double],
      sigma: Double, sigma2: Double): Double = {
    val pi = c dot (kinv * c)
    val qi = c dot (binv * c)
    val mui = c dot w
    val li2 = kDiagI - pi
    if (li2 <= 1e-12) return Double.NegativeInfinity
    val li = math.sqrt(li2)
    val r = sigma / li
    val ksii = 1.0 / (r * r + 1.0 - qi)
    if (ksii <= 0) return Double.NegativeInfinity
    val kappai = ksii * (1.0 + 2.0 * r * r)
    val resid = y - mui
    val delta = -math.log(r) -
      (math.log(ksii) + ksii * (1.0 - kappai) / sigma2 * resid * resid
        - kappai + 2.0) / 2.0
    if (delta.isNaN) Double.NegativeInfinity else delta
  }

  /**
   * Full-pool likelihood-greedy selection — the reference's exact
   * semantics (ref `ActiveSetProvider.scala:63`: every candidate in the
   * data is scored on every iteration), distributed instead of sampled.
   *
   * Per greedy step the active set's factorizations are model-sized
   * (m×m), so they broadcast; the data-sized work is two narrow passes:
   *  1. `treeAggregate` of M = Σᵢ cᵢcᵢᵀ (m×m) and v = Σᵢ cᵢyᵢ, where
   *     cᵢ = k(Z, xᵢ) is computed row-locally against the broadcast
   *     active inputs — the Σ that `likelihoodGreedy` forms as kmn·kmnᵀ
   *     on its driver pool;
   *  2. a map of every candidate to its Seeger Δᵢ and a max `reduce`.
   * Total: O(m) scheduler rounds, shuffle-free, cost O(m·n·m) kernel
   * evaluations — the reference's own complexity class. Use the sampled
   * [[likelihoodGreedy]] (strategy `greedy-likelihood`) when selection
   * quality per token matters more than fidelity; this variant
   * (`greedy-likelihood-full`) when the selection must see every row.
   */
  def likelihoodGreedyFull(data: RDD[(Array[Double], Double)], m: Int, seed: Long,
      fitted: graft.gp.kernel.Kernel): Array[Array[Double]] = {
    import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
    val sc = data.sparkContext
    val first = data.takeSample(withReplacement = false, 1, seed)
    require(first.nonEmpty, "empty training set")
    val sigma2 = math.max(fitted.noiseVar, 1e-12)
    val sigma = math.sqrt(sigma2)
    val active = scala.collection.mutable.ArrayBuffer[Array[Double]](first(0)._1)
    var exhausted = false
    while (active.size < m && !exhausted) {
      val zx = active.toArray
      val s = zx.length
      val kmm = fitted.gram(new graft.gp.kernel.ExpertData(zx, new Array[Double](s)))
      var d = 0
      while (d < s) { kmm(d, d) += 1e-10 - fitted.noiseVar; d += 1 }
      val bcZ = sc.broadcast(zx)
      val bcK = sc.broadcast(fitted)
      // pass 1: the active-set sufficient statistics over ALL rows
      val (mAgg, vAgg) = data.treeAggregate((BDM.zeros[Double](s, s), BDV.zeros[Double](s)))(
        seqOp = { case ((mm, vv), (x, y)) =>
          val c = bcK.value.cross(bcZ.value, Array(x))(::, 0)
          (mm += c * c.t, vv += c * y)
        },
        combOp = { case ((m1, v1), (m2, v2)) => (m1 += m2, v1 += v2) })
      val b = (kmm *:* sigma2) + mAgg
      val lmm = GPCore.cholOrThrow(kmm)
      val lb = GPCore.cholOrThrow(b)
      val w = LinAlg.cholSolve(lb, vAgg)
      val kinv = LinAlg.cholInverse(lmm)
      val binv = LinAlg.cholInverse(lb)
      val bcScore = sc.broadcast((kinv, binv, w))
      // pass 2: score every candidate, keep the argmax. Already-active
      // points score -∞ through the li² guard (pi saturates kDiag).
      val best = data.map { case (x, y) =>
        val (ki, bi, ww) = bcScore.value
        val kern = bcK.value
        val c = kern.cross(bcZ.value, Array(x))(::, 0)
        val kd = kern.self(x) - kern.noiseVar
        (seegerDelta(c, y, kd, ki, bi, ww, sigma, sigma2), x)
      }.reduce((a, b) => if (a._1 >= b._1) a else b)
      if (best._1 == Double.NegativeInfinity) exhausted = true
      else active += best._2
      bcZ.destroy(); bcK.destroy(); bcScore.destroy()
    }
    active.take(m).toArray
  }

  def select(strategy: String, spark: SparkSession, points: RDD[Array[Double]],
      m: Int, seed: Long): Array[Array[Double]] = strategy match {
    case "random" => random(points, m, seed)
    case "kmeans" => kmeans(spark, points, m, seed)
    case "greedy" => greedy(points, m, seed)
    case other => throw new IllegalArgumentException(
      s"unknown inducing strategy '$other' (expected random|kmeans|greedy)")
  }

  /** [[select]] plus the strategies that need labels and the fitted
    * kernel (`greedy-likelihood`). */
  def selectWithData(strategy: String, spark: SparkSession,
      data: RDD[(Array[Double], Double)], m: Int, seed: Long,
      fitted: graft.gp.kernel.Kernel): Array[Array[Double]] = strategy match {
    case "greedy-likelihood" => likelihoodGreedy(data, m, seed, fitted)
    case "greedy-likelihood-full" => likelihoodGreedyFull(data, m, seed, fitted)
    case other => select(other, spark, data.map(_._1), m, seed)
  }
}
