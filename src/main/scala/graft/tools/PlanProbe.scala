package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the Exchange/Broadcast skeleton of named queries'
  * executed plans — the `.explain("formatted")` audit the SURVEY
  * discipline requires, reduced to the lines that matter at 100 TB
  * (every Exchange is a shuffle; model-frame joins must read
  * BroadcastExchange). Usage: PlanProbe <sfDir> <query>... */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q01_pricing_summary")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.map(_.trim)
        .filter(l => l.contains("Exchange")).toSeq
      val shuffles = ex.count(!_.contains("Broadcast"))
      val bcasts = ex.count(_.contains("Broadcast"))
      println(s"== $n: $shuffles shuffle Exchange(s), $bcasts BroadcastExchange(s)")
      ex.foreach(l => println("   " + l.take(150)))
    }
    spark.stop()
  }
}
