package graft.examples

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gp.GPBinaryClassifier
import graft.gp.kernel.Kernels._
import graft.ops.TextAnalysis

/**
 * Cross-domain showcase: train the GP classifier ON the corpus-quality
 * signal — the "learned quality filter" pattern (a hand-rules gate
 * labels a seed set; a probabilistic model generalizes it and its
 * probabilities become a soft corpus-filter score).
 *
 * Features are graft's own text statistics (token count, mean token
 * length, stopword ratio, punctuation ratio — one narrow codegen'd
 * pass), labels are the t16-style rule gate, and the model is
 * `GPBinaryClassifier`, so `transform` adds calibrated `probability`
 * usable as a threshold: exactly how a pipeline upgrades from
 * hard rules to scored filtering.
 *
 * Usage: QualityModelExample [sfDir]
 */
object QualityModelExample {

  /** Featurize + rule-label `documents`; returns (features, label). */
  def labeled(docs: DataFrame): DataFrame = {
    val nTok = TextAnalysis.tokenCount(col("text")).cast("double")
    val stop = TextAnalysis.stopwordRatio(col("text"))
    docs.select(
      col("doc_id"),
      array_to_vector(array(
        nTok / lit(100.0),
        TextAnalysis.avgTokenLen(col("text")) / lit(10.0),
        stop,
        TextAnalysis.punctRatio(col("text")))).as("features"),
      (nTok >= 20.0 && stop <= 0.3).cast("double").as("label"))
  }

  /** Fit on a sample, score everything; returns (model accuracy on the
    * held-out rows, scored frame with `probability`). */
  def flow(spark: SparkSession, sfDir: String,
      expertSize: Int = 60, maxIter: Int = 15): (Double, DataFrame) = {
    val data = labeled(spark.read.parquet(s"$sfDir/documents.parquet"))
    val Array(train, test) = data.randomSplit(Array(0.7, 0.3), seed = 11L)
    val model = new GPBinaryClassifier()
      .setKernel(() => 1.0 * rbf(1.0))
      .setNoise(1e-2)
      .setExpertSize(expertSize)
      .setInducingSize(30)
      .setMaxIter(maxIter)
      .fit(train)
    val scored = model.transform(test)
    val acc = scored
      .select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    (acc, scored)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (acc, scored) = flow(spark, sfDir)
    println(f"held-out accuracy: $acc%.3f")
    scored.select("doc_id", "label", "prediction", "probability").show(10, truncate = false)
    spark.stop()
  }
}
