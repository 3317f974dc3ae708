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

    // persistence round-trip
    val dir = java.nio.file.Files.createTempDirectory("gp-example").toString
    graft.gp.GPModelIO.save(gpr, s"$dir/gpr")
    val loaded = graft.gp.GPModelIO.loadRegression(spark, s"$dir/gpr")
    val rmse2 = math.sqrt(loaded.transform(reg)
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    println(f"[persistence] reloaded-model rmse=$rmse2%.12f (must equal fit rmse)")

    // multiclass one-vs-rest
    val rnd3 = new scala.util.Random(9)
    val multi = Seq.fill(300) {
      val l = rnd3.nextInt(3).toDouble
      val (cx, cy) = Seq((-2.0, 0.0), (2.0, 0.0), (0.0, 2.5))(l.toInt)
      (Array(cx + 0.5 * rnd3.nextGaussian(), cy + 0.5 * rnd3.nextGaussian()), l)
    }.toDF("features", "label")
    val ovr = graft.gp.GPOneVsRest.fit(
      new GPClassifier().setKernel(() => 1.0 * rbf(1.0)).setNoise(1e-4)
        .setExpertSize(100).setInducingSize(25).setMaxIter(15), multi)
    val accM = ovr.transform(multi)
      .select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    println(f"[one-vs-rest 3-class] accuracy=$accM%.4f")

    spark.stop()
  }
}
