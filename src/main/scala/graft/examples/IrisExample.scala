package graft.examples

import org.apache.spark.ml.classification.OneVsRest
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gp.GPBinaryClassifier
import graft.gp.kernel.Kernels._

/**
 * Iris-style multiclass flow — the reference's front door
 * (spark-gp `examples/Iris.scala`: csv → labeled vectors → GP binary
 * classifier under STOCK `OneVsRest` inside a STOCK `CrossValidator`
 * scored by `MulticlassClassificationEvaluator`). The CSV is generated
 * (three species-like gaussian blobs over four measurements) so the run
 * is self-contained.
 *
 * Usage: IrisExample [csvPath]  (generates one if absent)
 */
object IrisExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = args.headOption.getOrElse {
      val p = java.nio.file.Files.createTempDirectory("gp-iris").resolve("iris.csv")
      val rnd = new scala.util.Random(11)
      // three classes, four features: distinct means, mild overlap
      val means = Array(
        Array(5.0, 3.4, 1.5, 0.2), // "setosa"
        Array(5.9, 2.8, 4.3, 1.3), // "versicolor"
        Array(6.6, 3.0, 5.6, 2.0)) // "virginica"
      val names = Array("iris-a", "iris-b", "iris-c")
      val rows = Seq.tabulate(240) { i =>
        val c = i % 3
        val f = means(c).map(m => m + 0.25 * rnd.nextGaussian())
        f.map(v => f"$v%.4f").mkString(",") + "," + names(c)
      }
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toString
    }

    val raw = spark.read.csv(path)
      .toDF("c0", "c1", "c2", "c3", "species")
    val name2idx = raw.select("species").distinct().collect()
      .map(_.getString(0)).sorted.zipWithIndex.toMap
    val idxCol = name2idx.foldLeft(lit(-1.0)) { case (acc, (n, i)) =>
      when(col("species") === n, lit(i.toDouble)).otherwise(acc)
    }
    val dataset = raw.select(
      array_to_vector(array(
        col("c0").cast("double"), col("c1").cast("double"),
        col("c2").cast("double"), col("c3").cast("double"))).as("features"),
      idxCol.as("label"))

    val gp = new GPBinaryClassifier()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-2).setExpertSize(30).setInducingSize(30)
      .setMaxIter(20)
    val ovr = new OneVsRest().setClassifier(gp)

    val cv = new CrossValidator()
      .setEstimator(ovr)
      .setEvaluator(new MulticlassClassificationEvaluator().setMetricName("accuracy"))
      .setEstimatorParamMaps(new ParamGridBuilder().build())
      .setNumFolds(3)
      .setSeed(7L)

    println("CV accuracy: " + cv.fit(dataset).avgMetrics.toList)
    spark.stop()
  }
}
