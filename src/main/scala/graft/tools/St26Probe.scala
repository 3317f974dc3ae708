package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object St26Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    s.range(100000).selectExpr("sum(id)").collect()
    graft.tables.Tables(s, dir).documents.count()
    val nTok = size(split(col("text"), " "))
    val alphaRatio = (length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z ]", ""))).cast("double") / length(col("text"))
    val stopHits = size(filter(split(col("text"), " "), x => x.isin("the","a","of","and","to","in","is","it")))
    val gate = nTok.between(10, 100000) && alphaRatio >= 0.6 && stopHits >= lit(2)
    import graft.functions.VectorExpressions.md5Hash52
    val d = graft.tables.Tables(s, dir).documents.filter(col("doc_id") < 2000)
    val toks = d.select(gate.cast("long").as("tgt"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("tgt"), (md5Hash52(col("tok")) % 512).as("b"))
    val census = toks.groupBy("b").agg(sum(col("tgt")).as("ct"), count(lit(1)).as("cr"))
    val totals = census.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    totals.explain(true)
    t("totals collect 1")(totals.collect())
    t("totals collect 2")(totals.collect())
    // variant: per-doc gate behind an explicit alias + no collapse
    val perDoc = d.select((gate.cast("long")).as("tgt"), split(col("text"), " ").as("w"))
    val toks2 = perDoc.select(col("tgt"), explode(col("w")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("tgt"), (md5Hash52(col("tok")) % 512).as("b"))
    val census2 = toks2.groupBy("b").agg(sum(col("tgt")).as("ct"), count(lit(1)).as("cr"))
    val totals2 = census2.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    t("variant collect 1")(totals2.collect())
    t("variant collect 2")(totals2.collect())
    s.stop()
  }
}
