package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  test("isExchangeFree detects every shuffle flavor") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 7, i.toLong)).toDF("key", "id")
    assert(Layout.isExchangeFree(df))
    assert(!Layout.isExchangeFree(df.repartition(4)))            // round-robin
    assert(!Layout.isExchangeFree(df.orderBy("key")))            // range
    assert(!Layout.isExchangeFree(df.groupBy("key").count()))    // hash
  }

  test("co-bucketed tables join without any exchange") {
    import spark.implicits._
    val facts = (0L until 5000L).map(i => (i % 97, i, i * 2.0)).toDF("key", "id", "v")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("key", "name")
    Layout.writeBucketed(facts, "graft_bucketed_facts", "key", 8, Seq("key"))
    Layout.writeBucketed(dims, "graft_bucketed_dims", "key", 8, Seq("key"))
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_facts")
        .join(spark.table("graft_bucketed_dims"), "key")
      assert(Layout.isExchangeFree(joined), "bucketed join should not shuffle:\n" +
        joined.queryExecution.executedPlan)
      assert(joined.count() == 5000L)
      // sanity: the same join over unbucketed data DOES shuffle
      val plain = facts.join(dims, "key")
      assert(!Layout.isExchangeFree(plain), "plain join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_dims")
    }
  }

  test("partitioned writes prune directories at planning time") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 10, i.toLong)).toDF("part", "id")
    val dir = java.nio.file.Files.createTempDirectory("graft-layout")
    try {
      Layout.writePartitioned(df, s"$dir/t", Seq("part"))
      val read = spark.read.parquet(s"$dir/t").filter(col("part") === 3)
      val scan = read.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") || scan.contains("partitionFilters"),
        s"expected partition filters in plan:\n$scan")
      assert(read.count() == 100L)
      // NOTE: Dataset.inputFiles lists the relation's full file index
      // (pre-pruning), so it cannot evidence pruning; the PartitionFilters
      // entry on the scan above IS the planning-time pruning guarantee.
      assert(scan.contains("part"), s"partition column missing from scan:\n$scan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
