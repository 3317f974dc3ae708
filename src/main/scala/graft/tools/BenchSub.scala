package graft.tools
import org.apache.spark.sql.SparkSession
object BenchSub {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    graft.TmpWork.install("graft_benchsub_")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", graft.TmpWork.diskTmp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.range(100000).selectExpr("sum(id)").collect()
    val qs = graft.SparkEntry.queries
    for (n <- names) {
      val t0 = System.nanoTime()
      val c = qs(n)(s, dir).count()
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s ($c rows)")
    }
    s.stop()
  }
}
