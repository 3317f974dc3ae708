package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gp.{GPClassifier, GPRegressor}
import graft.gp.kernel.Kernels._

/**
 * Runnable tour of the graft GP API (the reference ships the same kind
 * of examples under `regression/examples` and `classification/examples`).
 *
 * Usage: GPExample [random|kmeans|greedy]
 */
object GPExample {
  def main(args: Array[String]): Unit = {
    val strategy = args.headOption.getOrElse("greedy")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(1)
    val reg = Seq.tabulate(500) { i =>
      val x = 5.0 * i / 500.0
      (Array(x), math.sin(2 * x) + 0.05 * rnd.nextGaussian())
    }.toDF("features", "label")

    val gpr = new GPRegressor()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-3)
      .setExpertSize(100)
      .setInducingSize(30)
      .setInducingStrategy(strategy)
      .setMaxIter(30)
      .setPredStdCol("std")
      .fit(reg)
    val rmse = math.sqrt(gpr.transform(reg)
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    println(f"[regression/$strategy] rmse=$rmse%.12f")

    val cls = Seq.fill(400) {
      val label = if (rnd.nextBoolean()) 1.0 else 0.0
      val c = if (label > 0.5) 1.2 else -1.2
      (Array(c + 0.7 * rnd.nextGaussian(), 0.7 * rnd.nextGaussian()), label)
    }.toDF("features", "label")
    val gpc = new GPClassifier()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-4)
      .setExpertSize(100)
      .setInducingSize(30)
      .setInducingStrategy(strategy)
      .setMaxIter(20)
      .fit(cls)
    val acc = gpc.transform(cls)
      .select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    println(f"[classification/$strategy] accuracy=$acc%.12f")

    spark.stop()
  }
}
