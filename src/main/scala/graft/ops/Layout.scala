package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Physical-layout helpers for 100 TB table design:
 *
 * - **Bucketing** pre-shuffles a table ONCE at write time; two tables
 *   bucketed on the same key with the same bucket count join with NO
 *   exchange on either side (verified in LayoutSpec by asserting the
 *   joined plan is exchange-free). This is how a fact-fact join that
 *   would shuffle 100 TB per query becomes a local zip of buckets.
 * - **Partitioning** prunes whole directories at planning time; a
 *   predicate on the partition column never touches excluded files.
 */
object Layout {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Write `df` as a directory-partitioned parquet dataset. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** True iff the executed plan of `df` contains no shuffle exchange
    * (hash, range, single-partition or round-robin; broadcast exchanges
    * are allowed — they are not data shuffles). */
  def isExchangeFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    val shuffle = ("Exchange (hashpartitioning|rangepartitioning|SinglePartition|" +
      "RoundRobinPartitioning)").r
    shuffle.findFirstIn(plan).isEmpty
  }
}
