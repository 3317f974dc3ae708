package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev diagnostic: time isolated fragments of the expensive batch
 * queries (noop-sink writes, guide §1.4) so optimization targets the
 * fragment that costs. Usage: BatchProfile [sfDir]
 */
object BatchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.TmpWork.install("graft_bprof_")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.TmpWork.diskTmp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }

    def ph[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val t = graft.tables.Tables(spark, sfDir)

    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      // r04 fragments (edJoin2 on customer names)
      val names = t.customer.select(col("c_custkey"), col("c_name"))
      ph("r04 names scan") { noop(names) }
      // the delete2Keys explode alone
      val lk = names.select(col("c_custkey"),
        explode(graft.ops.FuzzyJoin.delete2KeysForProfile(col("c_name"))).as("__k"))
      ph("r04 delete2Keys explode") { noop(lk) }
      // r03 fragments (edJoin1)
      ph("r03 full edJoin1") {
        noop(graft.ops.FuzzyJoin.edJoin1(
          names.toDF("idL", "sL"), "idL", "sL",
          names.toDF("idR", "sR"), "idR", "sR"))
      }
      // x18-style edges build
      val pairs = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (lit(1000000000L) + col("l_suppkey")).as("p"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .union(pairs.select(col("p").as("src"), col("c").as("dst")))
      ph("x edges build") { noop(edges) }
      val joined = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (lit(1000000000L) + col("l_suppkey")).as("p"))
      ph("x join only") { noop(joined) }
      ph("x join+distinct") { noop(joined.distinct()) }
      // edge-prep exchange fusion candidates
      val prepOld = edges.distinct().repartition(col("src"))
      val prepNew = edges.repartition(col("src")).dropDuplicates(Seq("src", "dst"))
      ph("edge prep OLD (distinct->repart)") { noop(prepOld) }
      ph("edge prep NEW (repart->dedupe)") { noop(prepNew) }
      if (rep == 2) {
        println("---- OLD prep plan"); prepOld.explain("formatted")
        println("---- NEW prep plan"); prepNew.explain("formatted")
      }
      // a19 fragments
      val d = t.documents.filter(col("doc_id") < 5000)
      val vecs = graft.ops.TextAnalysis.hashingTf(d, "doc_id", "text", dim = 64)
      ph("a19 featurize") { noop(vecs) }
      ph("a19 full") {
        noop(graft.ops.Dedup.cosineCandidatePairs(
          org.apache.spark.sql.graftshim.InternalFrame.sharedScan(vecs),
          "doc_id", "tf_vec", threshold = 0.9, dim = 64, planes = 12,
          tables = 4, seed = 5).distinct())
      }
      // a19 internals: bucket occupancy + raw pair volume
      val sv = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(vecs)
      val base19 = sv.select(col("doc_id").cast("long").as("id"),
        col("tf_vec").cast("array<double>").as("v"))
      val tbls19 = (0 until 4).map(tt => struct(lit(tt).as("tbl"),
        graft.ops.Similarity.hyperplaneKey(col("v"), 64, 12, 5 + tt).as("bucket")))
      val keyed19 = base19
        .select(col("id"), col("v"), explode(array(tbls19: _*)).as("tb"))
        .select(col("id"), col("v"), col("tb.tbl").as("tbl"),
          col("tb.bucket").as("bucket"))
      val sizes19 = keyed19.groupBy("tbl", "bucket")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      ph("a19 sizes agg") {
        val r = sizes19.agg(sum(expr("n * (n - 1) / 2")), max("n"), count(lit(1))).head()
        println(s"[info] a19 pairs=${r.get(0)} maxBucket=${r.get(1)} buckets=${r.get(2)}")
      }
    }
    spark.stop()
  }
}
