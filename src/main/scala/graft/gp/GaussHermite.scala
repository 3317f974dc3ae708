package graft.gp

import org.apache.commons.math3.analysis.UnivariateFunction
import org.apache.commons.math3.analysis.integration.gauss.GaussIntegratorFactory

/**
 * Gauss–Hermite expectation of a function of a normal variable:
 * E[g(X)], X ~ N(mean, variance) — used to average the sigmoid link
 * over the latent predictive distribution in GP classification.
 * Reference: spark-gp `commons/util/Integrator.scala`.
 */
final class GaussHermite(points: Int) extends Serializable {
  @transient private lazy val integrator =
    new GaussIntegratorFactory().hermite(points)

  def expectation(mean: Double, variance: Double, g: Double => Double): Double = {
    val sd = math.sqrt(variance max 0.0)
    integrator.integrate(new UnivariateFunction {
      override def value(t: Double): Double = g(math.sqrt(2.0) * sd * t + mean)
    }) / math.sqrt(math.Pi)
  }
}
