package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decomposes d07/d08-style query time into the candidate
  * pipeline vs the connected-components rounds (count + seconds), so CC
  * round-cost work can be A/B'd in isolation from sketch math. Not part
  * of the driver contract. */
object CCProbe {
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

    // job-level timing: where does each CC round's wall clock go?
    val jobLog = new scala.collection.mutable.ArrayBuffer[String]()
    val starts = new scala.collection.mutable.HashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.synchronized { starts(j.jobId) = (System.nanoTime(), j.stageInfos.size) }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach { case (t0, nStages) =>
            jobLog += f"    job ${j.jobId}%3d: ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($nStages stages)"
          }
        }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // d07's edge pipeline
    import graft.ops.Dedup._
    val docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      d.union(d.filter(col("doc_id") < 50).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), lit(1),
          greatest(size(split(col("text"), " ")) - 3, lit(1)))).as("text")))
    }
    val pairs = minHashCandidatePairs(docs, "doc_id", "text")
    val cached = time("minhash pairs materialize") {
      val c = pairs.persist(); c.count(); c
    }
    println(s"  edge count: ${cached.count()}  partitions: ${cached.rdd.getNumPartitions}")
    jobLog.clear()
    val (labels, rounds) = time("CC total") {
      val lr = connectedComponentsWithRounds(cached)
      lr._1.count(); lr
    }
    jobLog.foreach(println)
    println(s"  rounds: $rounds  components: ${labels.select("component").distinct().count()}")
    cached.unpersist()
    spark.stop()
  }
}
