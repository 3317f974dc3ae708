package graft.gp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.gp.kernel.Kernels._

class GPSpec extends SparkTestBase {

  test("GPRegressor recovers a smooth function") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = Seq.tabulate(400) { i =>
      val x = 4.0 * i / 400.0
      (Array(x), math.sin(2 * x) + 0.05 * rnd.nextGaussian())
    }
    val df = data.toDF("features", "label")

    val model = new GPRegressor()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-3)
      .setExpertSize(100)
      .setInducingSize(40)
      .setMaxIter(40)
      .setPredStdCol("std")
      .fit(df)

    val scored = model.transform(df)
    val rmse = math.sqrt(
      scored.select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    assert(rmse < 0.1, s"rmse=$rmse")

    val stds = scored.select(min("std"), max("std")).head()
    assert(stds.getDouble(0) >= 0.0)
    assert(stds.getDouble(1) < 1.0, "predictive std should be small inside the data")
  }

  test("GPRegressor with kmeans inducing points and ARD kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val data = Seq.fill(300) {
      val x = Array(rnd.nextDouble() * 2, rnd.nextDouble() * 2)
      (x, x(0) * x(0) - x(1) + 0.02 * rnd.nextGaussian())
    }
    val df = data.toDF("features", "label")
    val model = new GPRegressor()
      .setKernel(() => 1.0 * ardRbf(2, 1.0))
      .setNoise(1e-3)
      .setExpertSize(75)
      .setInducingSize(50)
      .setInducingStrategy("kmeans")
      .setMaxIter(30)
      .fit(df)
    val rmse = math.sqrt(model.transform(df)
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    assert(rmse < 0.15, s"rmse=$rmse")
  }

  test("GPRegressor trains end-to-end with a Matern-5/2 kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val data = Seq.tabulate(300) { i =>
      val x = 4.0 * i / 300.0
      (Array(x), math.sin(2 * x) + 0.05 * rnd.nextGaussian())
    }
    val df = data.toDF("features", "label")
    val model = new GPRegressor()
      .setKernel(() => 1.0 * matern52(1.0))
      .setNoise(1e-3)
      .setExpertSize(75)
      .setInducingSize(40)
      .setMaxIter(30)
      .fit(df)
    val rmse = math.sqrt(model.transform(df)
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    assert(rmse < 0.12, s"rmse=$rmse")
  }

  test("GPClassifier separates two blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(300) {
      val label = if (rnd.nextBoolean()) 1.0 else 0.0
      val cx = if (label > 0.5) 1.5 else -1.5
      (Array(cx + 0.6 * rnd.nextGaussian(), 0.6 * rnd.nextGaussian()), label)
    }
    val df = data.toDF("features", "label")
    val model = new GPClassifier()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-4)
      .setExpertSize(100)
      .setInducingSize(40)
      .setMaxIter(20)
      .fit(df)
    val scored = model.transform(df)
    val acc = scored.select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > 0.95, s"accuracy=$acc")

    val probRange = scored.select(min("probability"), max("probability")).head()
    assert(probRange.getDouble(0) >= 0.0 && probRange.getDouble(1) <= 1.0)
  }

  test("GPClassifier integrated probabilities stay calibrated-ish") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val data = Seq.fill(200) {
      val label = if (rnd.nextBoolean()) 1.0 else 0.0
      val cx = if (label > 0.5) 1.0 else -1.0
      (Array(cx + 0.8 * rnd.nextGaussian()), label)
    }
    val df = data.toDF("features", "label")
    val model = new GPClassifier()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-4)
      .setExpertSize(100)
      .setInducingSize(30)
      .setMaxIter(15)
      .setProbabilityMode("integrated")
      .fit(df)
    val acc = model.transform(df)
      .select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > 0.85, s"accuracy=$acc")
  }

  test("greedy inducing points cover all clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val centers = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0), Array(10.0, 10.0))
    val pts = Seq.fill(400) {
      val c = centers(rnd.nextInt(4))
      Array(c(0) + 0.3 * rnd.nextGaussian(), c(1) + 0.3 * rnd.nextGaussian())
    }
    val rdd = spark.sparkContext.parallelize(pts, 4)
    val z = InducingPoints.greedy(rdd, 12, seed = 7L, batch = 3)
    assert(z.length == 12)
    // every cluster center must have an inducing point within its spread
    centers.foreach { c =>
      val nearest = z.map(p => math.hypot(p(0) - c(0), p(1) - c(1))).min
      assert(nearest < 2.0, s"cluster at ${c.toSeq} uncovered (nearest $nearest)")
    }
  }

  test("likelihood-greedy inducing selection beats random at equal m") {
    import spark.implicits._
    // Uneven input density: most mass in a flat region, the interesting
    // wiggle in a sparsely-sampled one — random selection underweights
    // the wiggle, likelihood-driven selection must not.
    val rnd = new scala.util.Random(31)
    val data =
      Seq.tabulate(360) { _ =>
        val x = rnd.nextDouble() * 3.0 // dense flat region
        (Array(x), 0.1 * x + 0.02 * rnd.nextGaussian())
      } ++ Seq.tabulate(40) { _ =>
        val x = 3.0 + rnd.nextDouble() * 1.5 // sparse wiggly region
        (Array(x), math.sin(4.0 * x) + 0.02 * rnd.nextGaussian())
      }
    val df = data.toDF("features", "label")
    def fitWith(strategy: String): Double = {
      val model = new GPRegressor()
        .setKernel(() => 1.0 * rbf(0.5))
        .setNoise(1e-3).setExpertSize(80).setInducingSize(10)
        .setInducingStrategy(strategy).setMaxIter(25)
        .fit(df)
      math.sqrt(model.transform(df)
        .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    }
    val rmseGreedy = fitWith("greedy-likelihood")
    val rmseRandom = fitWith("random")
    assert(rmseGreedy <= rmseRandom,
      s"likelihood-greedy rmse=$rmseGreedy should beat random rmse=$rmseRandom")
    assert(rmseGreedy < 0.15, s"rmse=$rmseGreedy")
  }

  test("full-pool likelihood-greedy is deterministic and beats random at equal m") {
    import spark.implicits._
    // Direct selection: same seed must reproduce the identical set (the
    // scoring pass is a commutative max-reduce, so partitioning must not
    // leak into the selection).
    val rnd = new scala.util.Random(13)
    val small = Seq.tabulate(200) { _ =>
      val x = rnd.nextDouble() * 4.0
      (Array(x), math.sin(2.0 * x) + 0.05 * rnd.nextGaussian())
    }
    val rdd = spark.sparkContext.parallelize(small, 8)
    val kern = 1.0 * rbf(0.7) + white(1e-3)
    val z1 = InducingPoints.likelihoodGreedyFull(rdd, 8, seed = 5L, kern)
    val z2 = InducingPoints.likelihoodGreedyFull(rdd, 8, seed = 5L, kern)
    assert(z1.length == 8)
    assert(z1.map(_.toSeq).toSeq == z2.map(_.toSeq).toSeq)
    assert(z1.map(_.toSeq).distinct.length == 8, "selected points must be distinct")

    // Same uneven-density scenario as the sampled variant: scoring every
    // candidate every step must still favor the sparse wiggly region.
    val rnd2 = new scala.util.Random(31)
    val data =
      Seq.tabulate(360) { _ =>
        val x = rnd2.nextDouble() * 3.0
        (Array(x), 0.1 * x + 0.02 * rnd2.nextGaussian())
      } ++ Seq.tabulate(40) { _ =>
        val x = 3.0 + rnd2.nextDouble() * 1.5
        (Array(x), math.sin(4.0 * x) + 0.02 * rnd2.nextGaussian())
      }
    val df = data.toDF("features", "label")
    def fitWith(strategy: String): Double = {
      val model = new GPRegressor()
        .setKernel(() => 1.0 * rbf(0.5))
        .setNoise(1e-3).setExpertSize(80).setInducingSize(10)
        .setInducingStrategy(strategy).setMaxIter(25)
        .fit(df)
      math.sqrt(model.transform(df)
        .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    }
    val rmseFull = fitWith("greedy-likelihood-full")
    assert(rmseFull <= fitWith("random"),
      s"full-pool likelihood-greedy rmse=$rmseFull should beat random")
    assert(rmseFull < 0.15, s"rmse=$rmseFull")
  }

  test("GPRegressor with greedy inducing strategy trains end-to-end") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val data = Seq.tabulate(250) { i =>
      val x = 4.0 * i / 250.0
      (Array(x), math.cos(1.5 * x) + 0.05 * rnd.nextGaussian())
    }
    val df = data.toDF("features", "label")
    val model = new GPRegressor()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-3)
      .setExpertSize(80)
      .setInducingSize(25)
      .setInducingStrategy("greedy")
      .setMaxIter(25)
      .fit(df)
    val rmse = math.sqrt(model.transform(df)
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    assert(rmse < 0.12, s"rmse=$rmse")
  }

  test("model save/load round-trips predictions exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val df = Seq.tabulate(200) { i =>
      val x = 3.0 * i / 200.0
      (Array(x), math.sin(x) + 0.05 * rnd.nextGaussian())
    }.toDF("features", "label")
    val model = new GPRegressor()
      .setKernel(() => 1.0 * rbf(1.0)).setNoise(1e-3)
      .setExpertSize(100).setInducingSize(20).setMaxIter(15)
      .setPredStdCol("std")
      .fit(df)
    val dir = java.nio.file.Files.createTempDirectory("gpmodel").toString
    GPModelIO.save(model, s"$dir/m")
    val loaded = GPModelIO.loadRegression(spark, s"$dir/m")
    val a = model.transform(df).select("prediction", "std").collect().map(_.toSeq)
    val b = loaded.transform(df).select("prediction", "std").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("one-vs-rest classifies three blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val centers = Map(0.0 -> (-2.0, 0.0), 1.0 -> (2.0, 0.0), 2.0 -> (0.0, 2.5))
    val df = Seq.fill(360) {
      val l = rnd.nextInt(3).toDouble
      val (cx, cy) = centers(l)
      (Array(cx + 0.5 * rnd.nextGaussian(), cy + 0.5 * rnd.nextGaussian()), l)
    }.toDF("features", "label")
    val template = new GPClassifier()
      .setKernel(() => 1.0 * rbf(1.0)).setNoise(1e-4)
      .setExpertSize(120).setInducingSize(30).setMaxIter(15)
    val fitted = GPOneVsRest.fit(template, df)
    assert(fitted.labels == Seq(0.0, 1.0, 2.0))
    val out = fitted.transform(df)
    val acc = out.select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > 0.93, s"accuracy=$acc")
    val conf = out.agg(min("confidence"), max("confidence")).head()
    assert(conf.getDouble(0) >= 0.0 && conf.getDouble(1) <= 1.0)

    // ensemble persistence round-trips predictions exactly
    val dir = java.nio.file.Files.createTempDirectory("gpovr").toString
    GPModelIO.save(fitted, s"$dir/ovr")
    val loaded = GPModelIO.loadOneVsRest(spark, s"$dir/ovr")
    assert(loaded.labels == fitted.labels)
    val a = out.select("prediction", "confidence").collect().map(_.toSeq)
    val b = loaded.transform(df).select("prediction", "confidence").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("Gauss-Hermite expectation matches closed forms") {
    val gh = new GaussHermite(32)
    assert(math.abs(gh.expectation(1.0, 4.0, x => x * x) - 5.0) < 1e-8)
    assert(math.abs(gh.expectation(2.0, 0.25, x => x) - 2.0) < 1e-8)
    assert(math.abs(gh.expectation(0.0, 1.0, _ => 1.0) - 1.0) < 1e-8)
  }

  test("Standardizer zeroes means and unit-scales stds") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(500)(Array(5.0 + 2.0 * rnd.nextGaussian(), -3.0 + 0.5 * rnd.nextGaussian()))
      .toDF("features")
    val out = Standardizer.standardize(df, "features")
    val (m2, s2) = Standardizer.fit(out, "features")
    assert(m2.forall(v => math.abs(v) < 1e-9))
    assert(s2.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("gdHyperFit decreases the NLL and matches a driver-side replay") {
    import breeze.linalg.{DenseVector => BDV}
    import graft.gp.kernel.ExpertData
    val rnd = new scala.util.Random(11)
    val experts = Seq.tabulate(40) { i =>
      val a = Array.fill(4)(rnd.nextGaussian())
      val b = Array.fill(4)(rnd.nextGaussian())
      def f(v: Array[Double]) = math.sin(v.sum)
      new ExpertData(Array(a, b), Array(f(a), f(b)))
    }
    val kern = 1.0 * rbf(1.0) + white(0.01)
    val traj = GPCore.gdHyperFit(
      spark.sparkContext.parallelize(experts, 4), kern,
      GPCore.regressionObjective, steps = 3, lr = 1e-3)
    assert(traj.map(_._1) == Seq(0, 1, 2, 3))
    // NLL strictly decreases along the trajectory
    val nlls = traj.map(_._3)
    assert(nlls.zip(nlls.tail).forall { case (a, b) => b < a }, nlls.toString)
    // driver-side sequential replay of the same quantized GD recursion
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    var k = kern
    for (step <- 0 to 3) {
      val (nll, grad) = experts.foldLeft((0.0, BDV.zeros[Double](2))) {
        case ((v, g), e) =>
          val (ev, eg) = GPCore.regressionObjective(e, k)
          (v + ev, g + eg)
      }
      val (st, h, qnll) = traj(step)
      assert(st == step)
      // treeAggregate sums floats in a different order than the fold;
      // agreement is up to the quantization grid, not bit-exact
      assert(math.abs(q6(nll) - qnll) <= 2e-6, s"nll at step $step")
      assert((0 until 2).forall(i => math.abs(h(i) - k.hypers(i)) <= 2e-6),
        s"hypers at step $step: ${h} vs ${k.hypers}")
      if (step < 3) {
        val (lo, hi) = k.bounds
        k = k.withHypers(BDV.tabulate(2) { i =>
          q6(math.min(hi(i), math.max(lo(i), k.hypers(i) - 1e-3 * q6(grad(i)))))
        })
      }
    }
  }
}
