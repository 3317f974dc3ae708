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

  /**
   * Greedy farthest-point (k-center) selection: repeatedly add the
   * training points farthest from the current inducing set.
   *
   * This is graft's deliberate deviation (SURVEY.md §6) from the
   * reference's likelihood-driven greedy (`GreedilyOptimizingActiveSet
   * Provider`, Seeger et al. 2003): same role — inducing points that
   * cover the input space — at O(m·n/batch) narrow passes with no
   * per-step kernel solves, which is what survives a 100 TB corpus.
   * Each round broadcasts only the `batch` new points and keeps a
   * cached (point, min-distance) RDD; lineage is cut every round by
   * persisting the new state and unpersisting the old.
   */
  def greedy(points: RDD[Array[Double]], m: Int, seed: Long,
      batch: Int = 8): Array[Array[Double]] = {
    val sc = points.sparkContext
    val first = points.takeSample(withReplacement = false, 1, seed)
    require(first.nonEmpty, "empty training set")
    val active = scala.collection.mutable.ArrayBuffer[Array[Double]](first(0))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val firstBC = sc.broadcast(first(0))
    var state = points.map(p => (p, d2(p, firstBC.value)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    while (active.size < m) {
      val take = math.min(batch, m - active.size)
      val newPts = state.top(take)(Ordering.by(_._2)).map(_._1)
      active ++= newPts
      val bc = sc.broadcast(newPts)
      val next = state.map { case (p, d) =>
        var best = d
        bc.value.foreach { q => val dd = d2(p, q); if (dd < best) best = dd }
        (p, best)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent
      state.unpersist(blocking = false)
      state = next
    }
    state.unpersist(blocking = false)
    active.take(m).toArray
  }

  def select(strategy: String, spark: SparkSession, points: RDD[Array[Double]],
      m: Int, seed: Long): Array[Array[Double]] = strategy match {
    case "random" => random(points, m, seed)
    case "kmeans" => kmeans(spark, points, m, seed)
    case "greedy" => greedy(points, m, seed)
    case other => throw new IllegalArgumentException(
      s"unknown inducing strategy '$other' (expected random|kmeans|greedy)")
  }
}
