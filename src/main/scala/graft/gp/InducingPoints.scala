package graft.gp

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Inducing-set (active-set) selection strategies for the Projected
 * Process Approximation — reference spark-gp `ActiveSetProvider.scala`.
 */
object InducingPoints {

  /** Uniform random sample of `m` inputs (reference
    * `RandomActiveSetProvider`). */
  def random(points: RDD[Array[Double]], m: Int, seed: Long): Array[Array[Double]] =
    points.takeSample(withReplacement = false, m, seed)

  /** K-means centroids as inducing inputs (reference
    * `KMeansActiveSetProvider`): better coverage of the input density
    * for the same m. */
  def kmeans(spark: SparkSession, points: RDD[Array[Double]], m: Int, seed: Long,
      maxIter: Int = 20): Array[Array[Double]] = {
    import spark.implicits._
    val df = points.toDF("raw").select(array_to_vector(col("raw")).as("features"))
    new KMeans()
      .setK(m)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .fit(df)
      .clusterCenters
      .map(_.toArray)
  }

  def select(strategy: String, spark: SparkSession, points: RDD[Array[Double]],
      m: Int, seed: Long): Array[Array[Double]] = strategy match {
    case "random" => random(points, m, seed)
    case "kmeans" => kmeans(spark, points, m, seed)
    case other => throw new IllegalArgumentException(
      s"unknown inducing strategy '$other' (expected random|kmeans)")
  }
}
