package graft.examples

import org.apache.spark.ml.classification.OneVsRest
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gp.{GPBinaryClassifier, Standardizer}
import graft.gp.kernel.Kernels._

/**
 * MNIST-style FILE-BASED multiclass flow — the reference's second
 * front-door example (spark-gp `examples/MNIST.scala:13-41`): a
 * label-first CSV of digit rows → feature scaling → label re-indexing
 * (the reference's `labels201`: raw class codes need not be contiguous
 * 0..k-1, so they're re-mapped through a model-sized dictionary) →
 * a GP classifier under a STOCK `TrainValidationSplit` scored by
 * `MulticlassClassificationEvaluator`.
 *
 * graft differences from the Iris flow (`IrisExample`): 10 classes
 * instead of 3, `TrainValidationSplit` (one 80/20 split) instead of
 * `CrossValidator`, scaling through `Standardizer` (one aggregation
 * pass + pure column arithmetic vs. the reference's two-pass RDD
 * `Scaling`), and the multiclass reduction is the stock `OneVsRest`
 * over graft's `ProbabilisticClassifier` — the composition the
 * reference bakes into its own classifier.
 *
 * Usage: MnistExample [csvPath]  (generates a digits-like CSV if absent)
 */
object MnistExample {

  /** Run the full file-based flow; returns the held-out validation
    * accuracy. CSV layout matches the reference: `_c0` = class code,
    * `_c1.._cN` = features. */
  def flow(spark: SparkSession, path: String, expertSize: Int = 40,
      inducingSize: Int = 20, maxIter: Int = 10): Double = {
    val raw = spark.read.csv(path)
    val featCols = raw.columns.filter(_ != "_c0").sortBy(_.drop(2).toInt)

    // features: CSV strings -> double array -> standardized (one
    // aggregation pass; applied as pure zip_with arithmetic) -> vector
    val arrayed = raw.select(
      col("_c0").cast("double").as("raw_label"),
      array(featCols.map(c => col(c).cast("double")): _*).as("f"))
    val scaled = Standardizer.standardize(arrayed, "f")

    // labels201: the distinct raw codes (model-sized) re-index to
    // 0..k-1 through a broadcast-sized when-chain
    val codes = scaled.select("raw_label").distinct().collect()
      .map(_.getDouble(0)).sorted
    val idxCol = codes.zipWithIndex.foldLeft(lit(-1.0)) { case (acc, (c, i)) =>
      when(col("raw_label") === c, lit(i.toDouble)).otherwise(acc)
    }
    val dataset = scaled.select(
      array_to_vector(col("f")).as("features"), idxCol.as("label"))

    val gp = new GPBinaryClassifier()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-2).setExpertSize(expertSize)
      .setInducingSize(inducingSize).setMaxIter(maxIter)

    val tvs = new TrainValidationSplit()
      .setEstimator(new OneVsRest().setClassifier(gp))
      .setEvaluator(new MulticlassClassificationEvaluator().setMetricName("accuracy"))
      .setEstimatorParamMaps(new ParamGridBuilder().build())
      .setTrainRatio(0.8)
      .setSeed(13L)

    tvs.fit(dataset).validationMetrics.head
  }

  /** Digits-like CSV: `classes` gaussian blobs in `dim` dimensions,
    * per-dimension scale ramp (so standardization matters) and
    * NON-CONTIGUOUS class codes (so re-indexing matters). */
  def writeSampleCsv(path: java.nio.file.Path, classes: Int = 10,
      perClass: Int = 40, dim: Int = 16, seed: Int = 31): Unit = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(classes, dim)(rnd.nextGaussian() * 2.0)
    val rows = Seq.tabulate(classes * perClass) { i =>
      val c = i % classes
      // class code 3, 5, 7, ... — deliberately not 0..k-1
      val code = 2 * c + 3
      val f = Array.tabulate(dim)(j =>
        (centers(c)(j) + 0.4 * rnd.nextGaussian()) * (j + 1))
      code.toString + "," + f.map(v => f"$v%.5f").mkString(",")
    }
    java.nio.file.Files.write(path, rows.mkString("\n").getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = args.headOption.getOrElse {
      val p = java.nio.file.Files.createTempDirectory("gp-mnist").resolve("digits.csv")
      writeSampleCsv(p)
      p.toString
    }
    println("Validation accuracy: " + flow(spark, path))
    spark.stop()
  }
}
