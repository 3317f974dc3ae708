package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gp.{GPRegressor, Standardizer}
import graft.gp.kernel.Kernels._

/**
 * CSV-source regression walkthrough — the workflow of the reference's
 * Airfoil example (spark-gp `examples/Airfoil.scala`: csv → scale →
 * fit → RMSE), on a generated csv so the run is self-contained.
 *
 * Usage: CsvRegressionExample [csvPath]  (generates one if absent)
 */
object CsvRegressionExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = args.headOption.getOrElse {
      val p = java.nio.file.Files.createTempDirectory("gp-csv").resolve("data.csv")
      val rnd = new scala.util.Random(5)
      val rows = Seq.tabulate(1200) { i =>
        val a = rnd.nextDouble() * 10; val b = rnd.nextDouble() * 4 - 2
        val c = rnd.nextDouble() * 100
        val y = math.sin(a) + 0.5 * b * b + 0.01 * c + 0.05 * rnd.nextGaussian()
        f"$a%.6f,$b%.6f,$c%.6f,$y%.6f"
      }
      java.nio.file.Files.writeString(p, ("f1,f2,f3,label" +: rows).mkString("\n"))
      p.toString
    }

    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val assembled = raw.select(
      array(col("f1"), col("f2"), col("f3")).cast("array<double>").as("features"),
      col("label").cast("double").as("label"))
    val scaled = Standardizer.standardize(assembled, "features")

    val model = new GPRegressor()
      .setKernel(() => 1.0 * ardRbf(3, 1.0))
      .setNoise(1e-3)
      .setExpertSize(100)
      .setInducingSize(60)
      .setInducingStrategy("kmeans")
      .setMaxIter(30)
      .fit(scaled)

    val rmse = math.sqrt(model.transform(scaled)
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    val std = scaled.select(stddev("label")).head().getDouble(0)
    println(f"[csv-regression] rmse=$rmse%.4f vs label-std=$std%.4f (noise floor 0.05)")
    spark.stop()
  }
}
