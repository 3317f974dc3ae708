package graft.gp.kernel

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import breeze.numerics.exp

/**
 * Covariance-function algebra for the graft Gaussian Process engine.
 *
 * Unlike the reference's mutable set-state kernels
 * (spark-gp `commons/kernel/Kernel.scala:12` binds training vectors and
 * hyperparameters into the kernel object), graft kernels are IMMUTABLE
 * value objects: data is always passed explicitly and `withHypers`
 * returns a new instance. That makes them safe to broadcast once and
 * reuse across stages/threads at any scale.
 *
 * Hyperparameters are concatenated depth-first across composite kernels,
 * each with box bounds for L-BFGS-B.
 */
trait Kernel extends Serializable {
  def numHypers: Int
  def hypers: BDV[Double]
  def withHypers(h: BDV[Double]): Kernel
  /** (lower, upper) element-wise box bounds for the hyperparameters. */
  def bounds: (BDV[Double], BDV[Double])
  /** Total white-noise variance contributed by this kernel (σ² terms). */
  def noiseVar: Double

  /** Gram matrix over the rows of `x` (includes any white-noise diagonal). */
  def gram(x: ExpertData): BDM[Double]
  /** Gram matrix plus per-hyperparameter partial derivatives. */
  def gramWithGrad(x: ExpertData): (BDM[Double], Array[BDM[Double]])
  /** Cross-covariance: rows = `a`, cols = `b`. White noise contributes 0. */
  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double]
  /** k(x, x) for a single point (includes white noise, as the reference's
    * `EyeKernel.selfKernel` does — spark-gp `Kernel.scala:151`). */
  def self(x: Array[Double]): Double

  def +(other: Kernel): Kernel = new SumKernel(this, other)
  def *(c: Double): Kernel = new ScaledKernel(this, c, trainable = false, c, c)
}

/**
 * Per-expert training slice with a cached pairwise squared-distance
 * matrix. `@transient lazy` so the cache is rebuilt at most once per
 * executor after deserialization and then lives with the persisted
 * partition — hyperparameter optimization re-evaluates the Gram many
 * times without recomputing distances.
 */
final class ExpertData(val x: Array[Array[Double]], val y: Array[Double])
    extends Serializable {
  def size: Int = x.length

  @transient lazy val sqDists: BDM[Double] = {
    val n = x.length
    val m = BDM.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val d = Kernels.sqDist(x(i), x(j))
        m(i, j) = d
        m(j, i) = d
        j += 1
      }
      i += 1
    }
    m
  }

  /** Warm-start latent mode for GP classification (persists with the
    * cached partition between optimizer iterations). */
  @transient lazy val latent: BDV[Double] = BDV.zeros[Double](y.length)
}

object Kernels {
  def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** RBF with lengthscale ℓ: k(a,b) = exp(-‖a-b‖² / (2ℓ²)). */
  def rbf(lengthscale: Double = 1.0, lower: Double = 1e-6,
      upper: Double = Double.PositiveInfinity): Kernel =
    new RBFKernel(lengthscale, lower, upper)

  /** ARD RBF: k(a,b) = exp(-½ Σ_j (a_j-b_j)²/ℓ_j²), one ℓ per dim. */
  def ardRbf(dim: Int, lengthscale: Double = 1.0, lower: Double = 1e-6,
      upper: Double = Double.PositiveInfinity): Kernel =
    new ARDRBFKernel(
      BDV.fill(dim)(lengthscale), BDV.fill(dim)(lower), BDV.fill(dim)(upper))

  /** Matérn ν=3/2: k(a,b) = (1+√3r/ℓ)·exp(−√3r/ℓ), r = ‖a−b‖ —
    * once-differentiable sample paths, the standard choice for rough
    * physical processes where RBF's infinite smoothness over-smooths. */
  def matern32(lengthscale: Double = 1.0, lower: Double = 1e-6,
      upper: Double = Double.PositiveInfinity): Kernel =
    new MaternKernel(3, lengthscale, lower, upper)

  /** Matérn ν=5/2: k(a,b) = (1+√5r/ℓ+5r²/3ℓ²)·exp(−√5r/ℓ) —
    * twice-differentiable, the default covariance in much of the
    * Bayesian-optimization literature. */
  def matern52(lengthscale: Double = 1.0, lower: Double = 1e-6,
      upper: Double = Double.PositiveInfinity): Kernel =
    new MaternKernel(5, lengthscale, lower, upper)

  /** ARD Matérn ν=5/2: per-dimension lengthscales in the scaled
    * distance r² = Σⱼ(aⱼ−bⱼ)²/ℓⱼ², k = (1+√5r+5r²/3)·exp(−√5r) —
    * feature-relevance learning with Matérn smoothness. */
  def ardMatern52(dim: Int, lengthscale: Double = 1.0, lower: Double = 1e-6,
      upper: Double = Double.PositiveInfinity): Kernel =
    new ARDMatern52Kernel(
      BDV.fill(dim)(lengthscale), BDV.fill(dim)(lower), BDV.fill(dim)(upper))

  /** Rational quadratic: k(a,b) = (1 + ‖a−b‖²/(2αℓ²))^−α — an infinite
    * scale mixture of RBFs (α → ∞ recovers RBF); hypers (ℓ, α). The
    * covariance for processes that vary on SEVERAL lengthscales at
    * once. */
  def rationalQuadratic(lengthscale: Double = 1.0, alpha: Double = 1.0,
      lower: Double = 1e-6, upper: Double = Double.PositiveInfinity): Kernel =
    new RationalQuadraticKernel(lengthscale, alpha, lower, upper)

  /** Periodic (ExpSineSquared): k = exp(−2·sin²(π‖a−b‖/p)/ℓ²), hypers
    * (ℓ, p) — exactly repeating structure (seasonality); compose with
    * RBF/Matérn sums for quasi-periodic processes. */
  def periodic(lengthscale: Double = 1.0, period: Double = 1.0,
      lower: Double = 1e-6, upper: Double = Double.PositiveInfinity): Kernel =
    new PeriodicKernel(lengthscale, period, lower, upper)

  /** Dot-product (linear) kernel: k = σ₀² + a·b, hyper σ₀ — Bayesian
    * linear regression as a GP; sum with RBF for trend + residual. */
  def dotProduct(sigma0: Double = 1.0, lower: Double = 0.0,
      upper: Double = Double.PositiveInfinity): Kernel =
    new DotProductKernel(sigma0, lower, upper)

  /** Non-trainable white noise: k = σ²·1[a==b]. */
  def white(variance: Double): Kernel = new WhiteKernel(variance)

  /** Trainable amplitude: c·k with c optimized in [lower, upper]. */
  def scaled(k: Kernel, c: Double, lower: Double = 0.0,
      upper: Double = Double.PositiveInfinity): Kernel =
    new ScaledKernel(k, c, trainable = true, lower, upper)

  implicit final class KernelScalarOps(private val c: Double) extends AnyVal {
    /** `2.0 * k` — trainable amplitude starting at 2.0. */
    def *(k: Kernel): Kernel = scaled(k, c)
  }
}

/** Isotropic RBF kernel; hyperparameter = lengthscale ℓ. */
final class RBFKernel(ell: Double, lo: Double, hi: Double) extends Kernel {
  require(ell > 0, "lengthscale must be positive")
  def numHypers = 1
  def hypers: BDV[Double] = BDV(ell)
  def withHypers(h: BDV[Double]): Kernel = new RBFKernel(h(0), lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = (BDV(lo), BDV(hi))
  def noiseVar: Double = 0.0

  def gram(e: ExpertData): BDM[Double] = {
    val k = e.sqDists / (-2.0 * ell * ell)
    exp.inPlace(k)
    k
  }

  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val k = gram(e)
    // ∂k/∂ℓ = k · ‖a-b‖² / ℓ³
    val g = (e.sqDists *:* k) / (ell * ell * ell)
    (k, Array(g))
  }

  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] = {
    val m = BDM.zeros[Double](a.length, b.length)
    val c = -2.0 * ell * ell
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        m(i, j) = math.exp(Kernels.sqDist(a(i), b(j)) / c)
        j += 1
      }
      i += 1
    }
    m
  }

  def self(x: Array[Double]): Double = 1.0
  override def toString = f"rbf(ℓ=$ell%.4g)"
}

/** ARD RBF kernel; hyperparameters = per-dimension lengthscales. */
final class ARDRBFKernel(ells: BDV[Double], lo: BDV[Double], hi: BDV[Double])
    extends Kernel {
  def numHypers: Int = ells.length
  def hypers: BDV[Double] = ells
  def withHypers(h: BDV[Double]): Kernel = new ARDRBFKernel(h, lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = (lo, hi)
  def noiseVar: Double = 0.0

  private def k(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < a.length) {
      val d = (a(j) - b(j)) / ells(j)
      s += d * d
      j += 1
    }
    math.exp(-0.5 * s)
  }

  def gram(e: ExpertData): BDM[Double] = {
    val n = e.size
    val m = BDM.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val v = k(e.x(i), e.x(j))
        m(i, j) = v; m(j, i) = v
        j += 1
      }
      i += 1
    }
    m
  }

  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val n = e.size
    val km = gram(e)
    // ∂k/∂ℓ_j = k · (a_j-b_j)² / ℓ_j³
    val grads = Array.fill(numHypers)(BDM.zeros[Double](n, n))
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val kij = km(i, j)
        var d = 0
        while (d < numHypers) {
          val diff = e.x(i)(d) - e.x(j)(d)
          val g = kij * diff * diff / (ells(d) * ells(d) * ells(d))
          grads(d)(i, j) = g; grads(d)(j, i) = g
          d += 1
        }
        j += 1
      }
      i += 1
    }
    (km, grads)
  }

  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] = {
    val m = BDM.zeros[Double](a.length, b.length)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) { m(i, j) = k(a(i), b(j)); j += 1 }
      i += 1
    }
    m
  }

  def self(x: Array[Double]): Double = 1.0
  override def toString = s"ardRbf(ℓ=${ells.toArray.map(v => f"$v%.3g").mkString(",")})"
}

/**
 * Matérn kernel for half-integer ν (order 3 ⇒ ν=3/2, order 5 ⇒ ν=5/2);
 * hyperparameter = lengthscale ℓ. With s = √order·r/ℓ:
 *   ν=3/2: k = (1+s)e⁻ˢ,        ∂k/∂ℓ = s²e⁻ˢ/ℓ
 *   ν=5/2: k = (1+s+s²/3)e⁻ˢ,  ∂k/∂ℓ = s²(1+s)e⁻ˢ/(3ℓ)
 * (∂k/∂ℓ = dk/ds · (−s/ℓ); both forms verified against finite
 * differences in KernelSpec). A beyond-reference addition: spark-gp
 * ships RBF/ARD/Eye only, but Matérn is the standard covariance when
 * RBF's infinite smoothness over-smooths.
 */
final class MaternKernel(order: Int, ell: Double, lo: Double, hi: Double)
    extends Kernel {
  require(order == 3 || order == 5, s"order must be 3 or 5 (ν=order/2), got $order")
  require(ell > 0, "lengthscale must be positive")
  private val sq = math.sqrt(order.toDouble)

  def numHypers = 1
  def hypers: BDV[Double] = BDV(ell)
  def withHypers(h: BDV[Double]): Kernel = new MaternKernel(order, h(0), lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = (BDV(lo), BDV(hi))
  def noiseVar: Double = 0.0

  private def kOfS(s: Double): Double =
    if (order == 3) (1.0 + s) * math.exp(-s)
    else (1.0 + s + s * s / 3.0) * math.exp(-s)

  private def kOfSqDist(d2: Double): Double = kOfS(sq * math.sqrt(d2) / ell)

  def gram(e: ExpertData): BDM[Double] = e.sqDists.map(kOfSqDist)

  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val n = e.size
    val km = BDM.zeros[Double](n, n)
    val g = BDM.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val s = sq * math.sqrt(e.sqDists(i, j)) / ell
        val es = math.exp(-s)
        val (kv, gv) =
          if (order == 3) ((1.0 + s) * es, s * s * es / ell)
          else ((1.0 + s + s * s / 3.0) * es, s * s * (1.0 + s) * es / (3.0 * ell))
        km(i, j) = kv; km(j, i) = kv
        g(i, j) = gv; g(j, i) = gv
        j += 1
      }
      i += 1
    }
    (km, Array(g))
  }

  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] = {
    val m = BDM.zeros[Double](a.length, b.length)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        m(i, j) = kOfSqDist(Kernels.sqDist(a(i), b(j)))
        j += 1
      }
      i += 1
    }
    m
  }

  def self(x: Array[Double]): Double = 1.0
  override def toString = f"matern${order}2(ℓ=$ell%.4g)"
}

/**
 * ARD Matérn ν=5/2; hyperparameters = per-dimension lengthscales.
 * With r² = Σⱼ dⱼ²/ℓⱼ² and s = √5·r:
 *   k = (1 + s + s²/3)·e⁻ˢ
 *   ∂k/∂ℓⱼ = (5/3)·(1 + s)·e⁻ˢ · dⱼ²/ℓⱼ³
 * (from dk/ds = −s(1+s)e⁻ˢ/3 and ∂s/∂ℓⱼ = −√5·dⱼ²/(ℓⱼ³·r), the r
 * factors cancel so the gradient is well-defined at r = 0 too;
 * verified against finite differences in KernelSpec).
 */
final class ARDMatern52Kernel(ells: BDV[Double], lo: BDV[Double], hi: BDV[Double])
    extends Kernel {
  def numHypers: Int = ells.length
  def hypers: BDV[Double] = ells
  def withHypers(h: BDV[Double]): Kernel = new ARDMatern52Kernel(h, lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = (lo, hi)
  def noiseVar: Double = 0.0

  private def scaledSqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < a.length) {
      val d = (a(j) - b(j)) / ells(j)
      s += d * d
      j += 1
    }
    s
  }

  private def kOfR2(r2: Double): Double = {
    val s = math.sqrt(5.0 * r2)
    (1.0 + s + s * s / 3.0) * math.exp(-s)
  }

  def gram(e: ExpertData): BDM[Double] = cross(e.x, e.x)

  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val n = e.size
    val km = BDM.zeros[Double](n, n)
    val grads = Array.fill(numHypers)(BDM.zeros[Double](n, n))
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val r2 = scaledSqDist(e.x(i), e.x(j))
        val s = math.sqrt(5.0 * r2)
        val es = math.exp(-s)
        val kv = (1.0 + s + s * s / 3.0) * es
        km(i, j) = kv; km(j, i) = kv
        val base = 5.0 / 3.0 * (1.0 + s) * es
        var d = 0
        while (d < numHypers) {
          val diff = e.x(i)(d) - e.x(j)(d)
          val g = base * diff * diff / (ells(d) * ells(d) * ells(d))
          grads(d)(i, j) = g; grads(d)(j, i) = g
          d += 1
        }
        j += 1
      }
      i += 1
    }
    (km, grads)
  }

  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] = {
    val m = BDM.zeros[Double](a.length, b.length)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        m(i, j) = kOfR2(scaledSqDist(a(i), b(j)))
        j += 1
      }
      i += 1
    }
    m
  }

  def self(x: Array[Double]): Double = 1.0
  override def toString =
    s"ardMatern52(ℓ=${ells.toArray.map(v => f"$v%.3g").mkString(",")})"
}

/**
 * Rational-quadratic kernel; hyperparameters = (lengthscale ℓ, α).
 * With u = 1 + d²/(2αℓ²):
 *   k = u^−α
 *   ∂k/∂ℓ = u^(−α−1) · d²/ℓ³
 *   ∂k/∂α = u^−α · (−ln u + d²/(2αℓ²u))
 * (both verified against finite differences in KernelSpec). Beyond the
 * reference's surface, like Matérn.
 */
final class RationalQuadraticKernel(ell: Double, alpha: Double,
    lo: Double, hi: Double) extends Kernel {
  require(ell > 0, "lengthscale must be positive")
  require(alpha > 0, "alpha must be positive")

  def numHypers = 2
  def hypers: BDV[Double] = BDV(ell, alpha)
  def withHypers(h: BDV[Double]): Kernel =
    new RationalQuadraticKernel(h(0), h(1), lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = (BDV(lo, lo), BDV(hi, hi))
  def noiseVar: Double = 0.0

  private def kOfSqDist(d2: Double): Double =
    math.pow(1.0 + d2 / (2.0 * alpha * ell * ell), -alpha)

  def gram(e: ExpertData): BDM[Double] = e.sqDists.map(kOfSqDist)

  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val n = e.size
    val km = BDM.zeros[Double](n, n)
    val gl = BDM.zeros[Double](n, n)
    val ga = BDM.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val d2 = e.sqDists(i, j)
        val u = 1.0 + d2 / (2.0 * alpha * ell * ell)
        val kv = math.pow(u, -alpha)
        val glv = math.pow(u, -alpha - 1.0) * d2 / (ell * ell * ell)
        val gav = kv * (-math.log(u) + d2 / (2.0 * alpha * ell * ell * u))
        km(i, j) = kv; km(j, i) = kv
        gl(i, j) = glv; gl(j, i) = glv
        ga(i, j) = gav; ga(j, i) = gav
        j += 1
      }
      i += 1
    }
    (km, Array(gl, ga))
  }

  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] = {
    val m = BDM.zeros[Double](a.length, b.length)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        m(i, j) = kOfSqDist(Kernels.sqDist(a(i), b(j)))
        j += 1
      }
      i += 1
    }
    m
  }

  def self(x: Array[Double]): Double = 1.0
  override def toString = f"rq(ℓ=$ell%.4g, α=$alpha%.4g)"
}

/**
 * Periodic (ExpSineSquared) kernel; hyperparameters = (ℓ, period p).
 * PER-DIMENSION form — the product of 1-D periodic kernels:
 *   k = exp(−2·Σⱼ sin²(π|aⱼ−bⱼ|/p) / ℓ²)
 * The popular euclidean-distance variant exp(−2sin²(π‖a−b‖/p)/ℓ²) is
 * NOT positive semi-definite beyond one dimension (a 12-point 2-D gram
 * shows eigenvalues at −0.97 — caught by KernelSpec); the per-dim sum
 * is PSD as a product of valid 1-D kernels and coincides with it in
 * 1-D. With θⱼ = π·dⱼ/p, sⱼ = sin θⱼ, S = Σⱼ sⱼ²:
 *   ∂k/∂ℓ = k · 4S/ℓ³
 *   ∂k/∂p = k · (4π/(ℓ²p²)) · Σⱼ dⱼ·sⱼ·cosθⱼ
 * (verified against finite differences in KernelSpec).
 */
final class PeriodicKernel(ell: Double, period: Double, lo: Double, hi: Double)
    extends Kernel {
  require(ell > 0, "lengthscale must be positive")
  require(period > 0, "period must be positive")

  def numHypers = 2
  def hypers: BDV[Double] = BDV(ell, period)
  def withHypers(h: BDV[Double]): Kernel = new PeriodicKernel(h(0), h(1), lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = (BDV(lo, lo), BDV(hi, hi))
  def noiseVar: Double = 0.0

  private def sinSqSum(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < a.length) {
      val sj = math.sin(math.Pi * math.abs(a(j) - b(j)) / period)
      s += sj * sj
      j += 1
    }
    s
  }

  private def k(a: Array[Double], b: Array[Double]): Double =
    math.exp(-2.0 * sinSqSum(a, b) / (ell * ell))

  def gram(e: ExpertData): BDM[Double] = cross(e.x, e.x)

  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val n = e.size
    val km = BDM.zeros[Double](n, n)
    val gl = BDM.zeros[Double](n, n)
    val gp = BDM.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var ss = 0.0
        var dsc = 0.0
        var d = 0
        while (d < e.x(i).length) {
          val dj = math.abs(e.x(i)(d) - e.x(j)(d))
          val th = math.Pi * dj / period
          val s = math.sin(th)
          ss += s * s
          dsc += dj * s * math.cos(th)
          d += 1
        }
        val kv = math.exp(-2.0 * ss / (ell * ell))
        val glv = kv * 4.0 * ss / (ell * ell * ell)
        val gpv = kv * 4.0 * math.Pi * dsc / (ell * ell * period * period)
        km(i, j) = kv; km(j, i) = kv
        gl(i, j) = glv; gl(j, i) = glv
        gp(i, j) = gpv; gp(j, i) = gpv
        j += 1
      }
      i += 1
    }
    (km, Array(gl, gp))
  }

  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] = {
    val m = BDM.zeros[Double](a.length, b.length)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) { m(i, j) = k(a(i), b(j)); j += 1 }
      i += 1
    }
    m
  }

  def self(x: Array[Double]): Double = 1.0
  override def toString = f"periodic(ℓ=$ell%.4g, p=$period%.4g)"
}

/**
 * Dot-product (linear) kernel; hyperparameter = σ₀ (bias scale):
 * k(a,b) = σ₀² + a·b, ∂k/∂σ₀ = 2σ₀. Unlike the stationary kernels,
 * self(x) = σ₀² + ‖x‖².
 */
final class DotProductKernel(sigma0: Double, lo: Double, hi: Double)
    extends Kernel {
  require(sigma0 >= 0, "sigma0 must be non-negative")

  def numHypers = 1
  def hypers: BDV[Double] = BDV(sigma0)
  def withHypers(h: BDV[Double]): Kernel = new DotProductKernel(h(0), lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = (BDV(lo), BDV(hi))
  def noiseVar: Double = 0.0

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def gram(e: ExpertData): BDM[Double] = {
    val n = e.size
    val m = BDM.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val v = sigma0 * sigma0 + dot(e.x(i), e.x(j))
        m(i, j) = v; m(j, i) = v
        j += 1
      }
      i += 1
    }
    m
  }

  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val n = e.size
    val g = BDM.fill(n, n)(2.0 * sigma0)
    (gram(e), Array(g))
  }

  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] = {
    val m = BDM.zeros[Double](a.length, b.length)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        m(i, j) = sigma0 * sigma0 + dot(a(i), b(j))
        j += 1
      }
      i += 1
    }
    m
  }

  def self(x: Array[Double]): Double = sigma0 * sigma0 + dot(x, x)
  override def toString = f"dot(σ₀=$sigma0%.4g)"
}

/** Non-trainable white-noise kernel σ²·I. */
final class WhiteKernel(variance: Double) extends Kernel {
  require(variance >= 0, "noise variance must be non-negative")
  def numHypers = 0
  def hypers: BDV[Double] = BDV[Double]()
  def withHypers(h: BDV[Double]): Kernel = this
  def bounds: (BDV[Double], BDV[Double]) = (BDV[Double](), BDV[Double]())
  def noiseVar: Double = variance
  def gram(e: ExpertData): BDM[Double] = BDM.eye[Double](e.size) *:* variance
  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) =
    (gram(e), Array.empty)
  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] =
    BDM.zeros[Double](a.length, b.length)
  def self(x: Array[Double]): Double = variance
  override def toString = f"white($variance%.3g)"
}

/** c·k with optionally trainable c (prepended to the hyper vector). */
final class ScaledKernel(inner: Kernel, c: Double, trainable: Boolean,
    lo: Double, hi: Double) extends Kernel {
  require(c >= 0, "amplitude must be non-negative")
  def numHypers: Int = (if (trainable) 1 else 0) + inner.numHypers
  def hypers: BDV[Double] =
    if (trainable) BDV(c +: inner.hypers.toArray: _*) else inner.hypers
  def withHypers(h: BDV[Double]): Kernel =
    if (trainable)
      new ScaledKernel(inner.withHypers(h(1 until h.length)), h(0), trainable, lo, hi)
    else new ScaledKernel(inner.withHypers(h), c, trainable, lo, hi)
  def bounds: (BDV[Double], BDV[Double]) = {
    val (l, u) = inner.bounds
    if (trainable)
      (BDV(lo +: l.toArray: _*), BDV(hi +: u.toArray: _*))
    else (l, u)
  }
  def noiseVar: Double = c * inner.noiseVar
  def gram(e: ExpertData): BDM[Double] = inner.gram(e) *:* c
  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val (k, g) = inner.gramWithGrad(e)
    val scaledG = g.map(_ *:* c)
    if (trainable) (k *:* c, k +: scaledG) else (k *:* c, scaledG)
  }
  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] =
    inner.cross(a, b) *:* c
  def self(x: Array[Double]): Double = c * inner.self(x)
  override def toString = f"$c%.3g * $inner"
}

/** k₁ + k₂ with concatenated hyperparameters. */
final class SumKernel(k1: Kernel, k2: Kernel) extends Kernel {
  def numHypers: Int = k1.numHypers + k2.numHypers
  def hypers: BDV[Double] = BDV(k1.hypers.toArray ++ k2.hypers.toArray: _*)
  def withHypers(h: BDV[Double]): Kernel =
    new SumKernel(
      k1.withHypers(h(0 until k1.numHypers)),
      k2.withHypers(h(k1.numHypers until h.length)))
  def bounds: (BDV[Double], BDV[Double]) = {
    val (l1, u1) = k1.bounds
    val (l2, u2) = k2.bounds
    (BDV(l1.toArray ++ l2.toArray: _*), BDV(u1.toArray ++ u2.toArray: _*))
  }
  def noiseVar: Double = k1.noiseVar + k2.noiseVar
  def gram(e: ExpertData): BDM[Double] = k1.gram(e) + k2.gram(e)
  def gramWithGrad(e: ExpertData): (BDM[Double], Array[BDM[Double]]) = {
    val (m1, g1) = k1.gramWithGrad(e)
    val (m2, g2) = k2.gramWithGrad(e)
    (m1 + m2, g1 ++ g2)
  }
  def cross(a: Array[Array[Double]], b: Array[Array[Double]]): BDM[Double] =
    k1.cross(a, b) + k2.cross(a, b)
  def self(x: Array[Double]): Double = k1.self(x) + k2.self(x)
  override def toString = s"$k1 + $k2"
}
