package graft.gp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.gp.kernel.Kernels._

class LocalityExpertsSpec extends SparkTestBase {

  test("locality experts partition the data, bound sizes, and stay within cells") {
    val rnd = new scala.util.Random(11)
    // two well-separated blobs: locality experts must not mix them
    val pts = Seq.tabulate(600) { i =>
      val center = if (i % 2 == 0) 0.0 else 50.0
      (Array(center + rnd.nextGaussian(), center + rnd.nextGaussian()), i.toDouble)
    }
    val rdd = spark.sparkContext.parallelize(pts, 8)
    val experts = GPCore.buildExpertsByLocality(rdd, expertSize = 50, seed = 1L,
      cellFactor = 2, maxCells = 8).collect()

    // partition: every input row appears exactly once
    assert(experts.map(_.size).sum == 600)
    assert(experts.flatMap(_.y).sorted.toSeq == pts.map(_._2).sorted)
    // balanced-split bound: chunking can't exceed the target size
    assert(experts.forall(_.size <= 50), experts.map(_.size).mkString(","))
    // locality: no expert spans the two blobs (centers 50 apart)
    experts.foreach { e =>
      val xs = e.x.map(_(0))
      assert(xs.max - xs.min < 25.0,
        s"expert mixes blobs: spread=${xs.max - xs.min}")
    }
  }

  test("GPRegressor fits end-to-end with kmeans expert assignment") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
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
      .setExpertAssignment("kmeans")
      .fit(df)
    val rmse = math.sqrt(model.transform(df)
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    assert(rmse < 0.1, s"rmse=$rmse")
  }
}
