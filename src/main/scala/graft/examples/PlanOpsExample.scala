package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{BloomPrune, Dedup, RangeJoin}
import graft.plans.TopK
import graft.tables.Tables

/**
 * Runnable tour of the plan-level operators:
 *   - grouped top-k whole-operator (custom logical node → heap execs)
 *   - the window-idiom auto-rewrite that plans into it
 *   - bloom-filter join pruning
 *   - binned range join
 *   - connected-components dedup resolution
 *
 * Usage: runMain graft.examples.PlanOpsExample [sfDir]
 */
object PlanOpsExample {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, dir)

    println("== TopK.perGroup: top-2 orders per priority (heap plan, no sort)")
    val top = TopK.perGroup(
      t.orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq(col("o_orderpriority")), col("o_totalprice"), col("o_orderkey"), k = 2)
    top.show(6, truncate = false)
    top.explain()

    println("== the row_number window idiom auto-rewrites into the same operator")
    // Parquet columns are OPTIONAL, and the rewrite's semantics-exact
    // guard requires a NON-NULLABLE tie column (null ties order
    // differently) — pinch nullability off the key first, as any
    // not-null-constrained pipeline would.
    t.orders
      .withColumn("ok", coalesce(col("o_orderkey"), lit(-1L)))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("ok"))))
      .filter(col("rn") <= 2)
      .select("o_orderpriority", "ok")
      .explain()

    println("== BloomPrune: lineitem rows surviving the part-key bloom filter")
    val redParts = t.part.filter(col("p_name").like("red%")).select("p_partkey")
    val pruned = BloomPrune.filterByKeys(
      t.lineitem.select("l_partkey", "l_quantity"),
      "l_partkey", redParts, "p_partkey", expectedKeys = 10000L)
    println(s"pruned to ${pruned.count()} of ${t.lineitem.count()} lineitem rows")

    println("== RangeJoin: lineitems priced within 5% of a part's retail price")
    RangeJoin.pointInInterval(
      t.lineitem.select("l_extendedprice"), "l_extendedprice",
      t.part.limit(20).select(col("p_partkey"),
        (col("p_retailprice") * 0.95).as("lo"), (col("p_retailprice") * 1.05).as("hi")),
      "lo", "hi", binWidth = 100.0)
      .groupBy("p_partkey").count().orderBy("p_partkey").show(5)

    println("== connectedComponents: near-dup clusters from MinHash pairs")
    val docs = t.documents.select("doc_id", "text")
    // planted-duplicate ids offset far past any real doc_id (same
    // +1e6 convention as the dedup query pack) so they can't collide
    // with genuine documents at larger scale factors
    val corpus = docs.union(docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val pairs = Dedup.minHashCandidatePairs(corpus, "doc_id", "text")
    Dedup.connectedComponents(pairs)
      .groupBy("component").count().orderBy("component").show(5)

    spark.stop()
  }
}
