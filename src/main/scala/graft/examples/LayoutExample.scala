package graft.examples

import org.apache.spark.sql.SparkSession

import graft.ops.Layout

/** Demonstrates bucketed co-located joins and partition pruning. */
object LayoutExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val facts = (0L until 100000L).map(i => (i % 997, i, i * 2.0)).toDF("key", "id", "v")
    val dims = (0L until 997L).map(k => (k, s"dim_$k")).toDF("key", "name")
    Layout.writeBucketed(facts, "ex_facts", "key", 16, Seq("key"))
    Layout.writeBucketed(dims, "ex_dims", "key", 16, Seq("key"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("ex_facts").join(spark.table("ex_dims"), "key")
    println("bucketed join exchange-free: " + Layout.isExchangeFree(joined))
    println("rows: " + joined.count())
    val plain = facts.join(dims, "key")
    println("plain join exchange-free: " + Layout.isExchangeFree(plain))
    spark.sql("DROP TABLE ex_facts")
    spark.sql("DROP TABLE ex_dims")
    spark.stop()
  }
}
