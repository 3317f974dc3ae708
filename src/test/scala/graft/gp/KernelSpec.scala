package graft.gp

import breeze.linalg.{sum, DenseMatrix => BDM, DenseVector => BDV}
import org.scalatest.funsuite.AnyFunSuite

import graft.gp.kernel._
import graft.gp.kernel.Kernels._

class KernelSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def randomData(n: Int, d: Int): ExpertData = {
    val x = Array.fill(n)(Array.fill(d)(rnd.nextGaussian()))
    val y = Array.fill(n)(rnd.nextGaussian())
    new ExpertData(x, y)
  }

  private def checkGradient(k: Kernel, e: ExpertData): Unit = {
    val h = k.hypers.copy
    val (_, grads) = k.withHypers(h).gramWithGrad(e)
    val eps = 1e-6
    for (j <- 0 until k.numHypers) {
      val hp = h.copy; hp(j) += eps
      val hm = h.copy; hm(j) -= eps
      val kp = k.withHypers(hp).gram(e)
      val km = k.withHypers(hm).gram(e)
      val fd = (kp - km) / (2 * eps)
      val err = sum(breeze.numerics.abs(fd - grads(j))) / (e.size * e.size)
      assert(err < 1e-5, s"gradient mismatch for hyper $j of $k: $err")
    }
  }

  test("rbf gram is symmetric PSD with unit diagonal") {
    val e = randomData(20, 3)
    val g = rbf(1.3).gram(e)
    assert(breeze.linalg.max(breeze.numerics.abs(g - g.t)) < 1e-12)
    for (i <- 0 until 20) assert(math.abs(g(i, i) - 1.0) < 1e-12)
    val eig = breeze.linalg.eigSym(g + BDM.eye[Double](20) *:* 1e-9).eigenvalues
    assert(breeze.linalg.min(eig) > -1e-8)
  }

  test("rbf gradient matches finite differences") {
    checkGradient(rbf(0.9), randomData(15, 3))
  }

  test("ard gradient matches finite differences") {
    checkGradient(ardRbf(4, 1.2), randomData(12, 4))
  }

  test("composite kernel concatenates hypers and matches finite differences") {
    val k = scaled(rbf(1.1), 2.0) + scaled(ardRbf(3, 0.8), 0.5)
    assert(k.numHypers == 1 + 1 + 1 + 3)
    checkGradient(k, randomData(10, 3))
  }

  test("matern kernels: symmetric PSD unit-diagonal grams, finite-diff gradients") {
    val e = randomData(15, 3)
    for (k <- Seq(matern32(1.1), matern52(0.8))) {
      val g = k.gram(e)
      assert(breeze.linalg.max(breeze.numerics.abs(g - g.t)) < 1e-12, k.toString)
      for (i <- 0 until e.size) assert(math.abs(g(i, i) - 1.0) < 1e-12, k.toString)
      val eig = breeze.linalg.eigSym(g + BDM.eye[Double](e.size) *:* 1e-9).eigenvalues
      assert(breeze.linalg.min(eig) > -1e-8, k.toString)
      checkGradient(k, e)
      assert(breeze.linalg.max(breeze.numerics.abs(g - k.cross(e.x, e.x))) < 1e-12)
    }
    // smoothness ordering at moderate distance: rougher kernels decay
    // faster than smoother ones near ℓ (matern32 < matern52 < rbf)
    val a = Array(0.0, 0.0); val b = Array(0.9, 0.0)
    val k32 = matern32(1.0).cross(Array(a), Array(b))(0, 0)
    val k52 = matern52(1.0).cross(Array(a), Array(b))(0, 0)
    val krbf = rbf(1.0).cross(Array(a), Array(b))(0, 0)
    assert(k32 < k52 && k52 < krbf, s"$k32 $k52 $krbf")
  }

  test("ARD matern-5/2: PSD gram, per-dim finite-diff gradients, isotropic agreement") {
    val e = randomData(12, 4)
    val k = ardMatern52(4, 1.3)
    val g = k.gram(e)
    assert(breeze.linalg.max(breeze.numerics.abs(g - g.t)) < 1e-12)
    for (i <- 0 until e.size) assert(math.abs(g(i, i) - 1.0) < 1e-12)
    val eig = breeze.linalg.eigSym(g + BDM.eye[Double](e.size) *:* 1e-9).eigenvalues
    assert(breeze.linalg.min(eig) > -1e-8)
    checkGradient(k, e)
    // equal lengthscales == the isotropic matern52 at that scale
    val iso = matern52(1.3).gram(e)
    assert(breeze.linalg.max(breeze.numerics.abs(g - iso)) < 1e-12)
  }

  test("rational-quadratic kernel: PSD gram, finite-diff gradients, RBF limit") {
    val e = randomData(12, 3)
    val k = rationalQuadratic(1.2, 0.7)
    val g = k.gram(e)
    assert(breeze.linalg.max(breeze.numerics.abs(g - g.t)) < 1e-12)
    for (i <- 0 until e.size) assert(math.abs(g(i, i) - 1.0) < 1e-12)
    val eig = breeze.linalg.eigSym(g + BDM.eye[Double](e.size) *:* 1e-9).eigenvalues
    assert(breeze.linalg.min(eig) > -1e-8)
    checkGradient(k, e)
    assert(breeze.linalg.max(breeze.numerics.abs(g - k.cross(e.x, e.x))) < 1e-12)
    // α → ∞ recovers RBF
    val big = rationalQuadratic(1.2, 1e7).gram(e)
    val ref = rbf(1.2).gram(e)
    assert(breeze.linalg.max(breeze.numerics.abs(big - ref)) < 1e-5)
  }

  test("periodic kernel: PSD gram, finite-diff gradients, exact periodicity") {
    val e = randomData(12, 2)
    val k = periodic(1.1, 0.9)
    val g = k.gram(e)
    assert(breeze.linalg.max(breeze.numerics.abs(g - g.t)) < 1e-12)
    for (i <- 0 until e.size) assert(math.abs(g(i, i) - 1.0) < 1e-12)
    val eig = breeze.linalg.eigSym(g + BDM.eye[Double](e.size) *:* 1e-9).eigenvalues
    assert(breeze.linalg.min(eig) > -1e-8)
    checkGradient(k, e)
    // points one full period apart have covariance 1
    val v = k.cross(Array(Array(0.0)), Array(Array(0.9)))(0, 0)
    assert(math.abs(v - 1.0) < 1e-10, s"period-apart covariance $v")
  }

  test("dot-product kernel: gram, gradient, non-stationary self") {
    val e = randomData(10, 3)
    val k = dotProduct(0.5)
    checkGradient(k, e)
    val g = k.gram(e)
    for (i <- 0 until e.size)
      assert(math.abs(g(i, i) - k.self(e.x(i))) < 1e-12)
    assert(math.abs(k.self(Array(1.0, 2.0, 2.0)) - (0.25 + 9.0)) < 1e-12)
    assert(breeze.linalg.max(breeze.numerics.abs(g - k.cross(e.x, e.x))) < 1e-12)
  }

  test("white kernel contributes noiseVar on the diagonal only") {
    val e = randomData(8, 2)
    val k = rbf(1.0) + white(0.25)
    val g = k.gram(e)
    assert(math.abs(g(0, 0) - 1.25) < 1e-12)
    assert(k.noiseVar === 0.25)
    assert(sum(breeze.numerics.abs(k.cross(e.x, e.x) -
      rbf(1.0).cross(e.x, e.x))) < 1e-12)
  }

  test("scalar DSL builds trainable amplitude") {
    val k = 3.0 * rbf(1.0)
    assert(k.numHypers == 2)
    assert(k.hypers(0) == 3.0)
    val k2 = k.withHypers(BDV(5.0, 2.0))
    assert(k2.hypers(0) == 5.0 && k2.hypers(1) == 2.0)
  }

  test("cross kernel agrees with gram on identical inputs") {
    val e = randomData(9, 3)
    for (k <- Seq(rbf(0.7), ardRbf(3, 1.4), scaled(rbf(2.0), 1.5))) {
      val g = k.gram(e)
      val c = k.cross(e.x, e.x)
      assert(breeze.linalg.max(breeze.numerics.abs(g - c)) < 1e-12, k.toString)
    }
  }
}
