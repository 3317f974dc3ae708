package graft.gp

import breeze.linalg.{eigSym, DenseMatrix}

/**
 * Gauss–Hermite expectation of a function of a normal variable:
 * E[g(X)], X ~ N(mean, variance) — averages the sigmoid link over the
 * latent predictive distribution in GP classification (same capability
 * as spark-gp `commons/util/Integrator.scala:9`, different construction:
 * the rule is computed here from scratch by Golub–Welsch instead of
 * delegating to commons-math3).
 *
 * Golub & Welsch (1969): the nodes of an n-point Gaussian rule are the
 * eigenvalues of the symmetric tridiagonal Jacobi matrix of the
 * orthogonal-polynomial recurrence, and each weight is proportional to
 * the squared first component of the corresponding eigenvector. For
 * Hermite polynomials (weight e^{-x²}) the recurrence has zero diagonal
 * and off-diagonal β_k = √(k/2). Normalizing the weights by √π turns
 * the rule directly into probabilities for N(0, 1/2), so the quadrature
 * reads as a finite mixture: E[g] = Σ pᵢ g(mean + √(2·var)·xᵢ).
 */
final class GaussHermite(points: Int) extends Serializable {
  require(points >= 1, s"need at least one quadrature point, got $points")

  /** (standard-normal-ish nodes, probability weights summing to 1). */
  private val (nodes, probs): (Array[Double], Array[Double]) = {
    val jacobi = DenseMatrix.zeros[Double](points, points)
    var k = 1
    while (k < points) {
      val beta = math.sqrt(k / 2.0)
      jacobi(k - 1, k) = beta
      jacobi(k, k - 1) = beta
      k += 1
    }
    val decomp = eigSym(jacobi)
    val xs = decomp.eigenvalues.toArray
    val ps = Array.tabulate(points) { i =>
      val first = decomp.eigenvectors(0, i)
      first * first // w_i/√π; eigenvectors are unit-norm so Σ = 1
    }
    (xs, ps)
  }

  /** The quadrature rule itself: (nodes, probability weights), in the
    * accumulation order `expectation` uses — callers embedding the rule
    * elsewhere (e.g. the gp13 oracle's SQL literals) replay the exact
    * same finite mixture. */
  def rule: (Array[Double], Array[Double]) = (nodes.clone(), probs.clone())

  /**
   * E[g(X)] for X ~ N(mean, variance); exact when g is a polynomial of
   * degree < 2·points.
   */
  def expectation(mean: Double, variance: Double, g: Double => Double): Double = {
    val scale = math.sqrt(2.0 * (variance max 0.0))
    var acc = 0.0
    var i = 0
    while (i < nodes.length) {
      acc += probs(i) * g(mean + scale * nodes(i))
      i += 1
    }
    acc
  }
}
