package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev diagnostic (r18, VERDICT item 5): measure the two graph edge-prep
 * shapes — r16's aggregate-FIRST (`groupBy(src,dst).agg → groupBy(src)
 * .agg → join → repartition(src)`) vs r17's repartition-HOIST
 * (`repartition(src) → groupBy(src,dst).agg → ...` on the raw
 * multiset) — on (a) the real sf0.1 trade edges and (b) a deliberately
 * SKEWED synthetic multiset where one hot src carries ~20% of all edge
 * occurrences (the popular-product shape guide §2.5 warns about).
 * Each shape is noop-timed (guide §1.4), 3 reps, min reported.
 *
 * Usage: GraphPrepProbe [sfDir]
 */
object GraphPrepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.TmpWork.install("graft_gprobe_")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.TmpWork.diskTmp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time3(label: String)(df: => DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-44s min=${ts.min}%.3f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
      ts.min
    }

    // aggregate-first (r16, shipped): partial map-side agg before ANY
    // exchange, repartition(src) on the deduped result
    def aggFirst(edges: DataFrame): DataFrame = {
      val e = edges.groupBy("src", "dst").agg(sum("w").as("w"))
      val outw = e.groupBy("src").agg(sum("w").as("ow"))
      e.join(outw, "src").repartition(col("src"))
    }
    // repartition-hoist (r17, reverted): the raw multiset is shuffled
    // hash(src) with no combine; every aggregate reuses that exchange
    def hoist(edges: DataFrame): DataFrame = {
      val e = edges.repartition(col("src"))
        .groupBy("src", "dst").agg(sum("w").as("w"))
      val outw = e.groupBy("src").agg(sum("w").as("ow"))
      e.join(outw, "src")
    }

    // (a) the real trade-graph edge multiset (x01's input, pre-agg)
    val t = graft.tables.Tables(spark, sfDir)
    val trade = t.orders.join(t.lineitem,
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1000000000L) + col("l_suppkey")).as("dst"), lit(1L).as("w"))
    println(s"== real trade edges (sf: $sfDir, rows=${trade.count()}) ==")
    time3("trade agg-first")(aggFirst(trade))
    time3("trade hoist")(hoist(trade))

    // (b) skewed synthetic: 4M edge occurrences, ONE src (id 0) owns
    // 20% of them; dst spread over 50k; deterministic (no rand())
    val n = 4000000L
    val skewed = spark.range(n).select(
      when(col("id") % 5 === 0, 0L)
        .otherwise(pmod(expr("xxhash64(id)"), lit(100000L)) + 1L).as("src"),
      pmod(expr("xxhash64(id + 7)"), lit(50000L)).as("dst"),
      lit(1L).as("w"))
    println(s"== skewed synthetic (n=$n, hot src = 20%) ==")
    time3("skewed agg-first")(aggFirst(skewed))
    time3("skewed hoist")(hoist(skewed))

    spark.stop()
  }
}
