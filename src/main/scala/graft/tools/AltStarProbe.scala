package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: rounds + wall clock of the alt-star CC loop on d07b's
  * planted graph (5-stars + every-25th-center chain), isolated from the
  * driver sweep. Not part of the driver contract. */
object AltStarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val ids = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val stars = ids.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") - col("doc_id") % 5).as("id_b"))
    for (cap <- Seq(Long.MaxValue, 500L, 250L, 150L)) {
      val chain = ids.filter(col("doc_id") % 25 === 0 && col("doc_id") >= 25 &&
          col("doc_id") <= cap)
        .select(col("doc_id").as("id_a"), (col("doc_id") - 25).as("id_b"))
      val edges = stars.union(chain)
      println(s"  cap=$cap  edges: ${edges.count()}")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val (labels, rounds) = graft.ops.Dedup.connectedComponentsAltStar(edges)
        val n = labels.select("component").distinct().count()
        println(f"    run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rounds=$rounds  components=$n")
      }
    }
    spark.stop()
  }
}
