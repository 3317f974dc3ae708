package graft.gp

import org.apache.spark.sql.SparkSession

import graft.gp.kernel.Kernels._

/**
 * GP training throughput benchmark — the graft counterpart of the
 * reference's `regression/benchmark/PerformanceBenchmark.scala`
 * (same workload shape: n uniform 3-d points, y = sin(Σx/1000), RBF
 * kernel, expert size = inducing size).
 *
 * Usage: GPBenchmark [threads] [expertSize] [sampleSize]
 * Prints one line: GPBENCH n=<n> expert=<s> fitSec=<t>
 */
object GPBenchmark {
  def main(args: Array[String]): Unit = {
    val threads = if (args.length > 0) args(0).toInt else 8
    val expertSize = if (args.length > 1) args(1).toInt else 100
    val n = if (args.length > 2) args(2).toInt else 100000
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val parallelism = threads * 4
    val df = spark.sparkContext.parallelize(0 until parallelism, parallelism)
      .flatMap { index =>
        val rnd = new scala.util.Random(13 * index)
        Iterator.fill(n / parallelism) {
          val x = Array.fill(3)(rnd.nextDouble())
          (x, math.sin(x.sum / 1000.0))
        }
      }.toDF("features", "label").cache()
    df.count()

    val gp = new GPRegressor()
      .setKernel(() => rbf(0.1))
      .setExpertSize(expertSize)
      .setInducingSize(expertSize)
      .setSeed(13L)
      .setNoise(1e-3)

    val t0 = System.nanoTime()
    gp.fit(df)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"GPBENCH n=$n expert=$expertSize fitSec=$sec%.2f")
    spark.stop()
  }
}
