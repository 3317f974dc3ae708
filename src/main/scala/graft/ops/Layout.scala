package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
 * - **Z-ordering** clusters rows so that every file covers a small
 *   hyper-rectangle of SEVERAL columns at once: parquet min/max stats
 *   then skip most files for predicates on ANY of the z columns —
 *   the multi-column analogue of sorting, for scans too big to read.
 */
object Layout {

  /**
   * Bit-interleaved Z-value of `cols`, each linearly binned into
   * 2^`bits` buckets over its caller-supplied [lo, hi] range (layout
   * jobs know their column ranges; out-of-range values clamp to the
   * edge bins). Pure codegen'd arithmetic — shifts and ORs — so the
   * z-computation adds one narrow projection to the write.
   */
  def zValue(cols: Seq[(Column, Double, Double)], bits: Int = 10): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits ($bits) x columns (${cols.length}) must fit a long")
    val n = cols.length
    val top = (1 << bits) - 1
    val bins = cols.map { case (c, lo, hi) =>
      require(hi > lo, s"invalid range [$lo, $hi]")
      least(lit(top), greatest(lit(0),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(1 << bits)).cast("int")))
    }
    var z: Column = lit(0L)
    for (b <- 0 until bits; i <- 0 until n) {
      val bit = shiftright(bins(i), b).bitwiseAND(lit(1)).cast("long")
      z = z.bitwiseOR(shiftleft(bit, b * n + i))
    }
    z
  }

  /**
   * Write `df` z-ordered on `cols` into `files` parquet files: range
   * partition on the z-value (each output file owns one contiguous
   * z-curve segment = one small multi-column bounding box), sort within
   * partitions so row groups inherit the same locality, drop the helper
   * column. One exchange total — the same cost as any clustered write.
   */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[(String, Double, Double)],
      files: Int, bits: Int = 10): Unit = {
    df.withColumn("__z", zValue(cols.map { case (c, lo, hi) => (col(c), lo, hi) }, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Write `df` directory-partitioned on `partCol` AND z-ordered on
   * `zCols` within each partition: one range exchange on
   * (partCol, z-value) gives every output task a contiguous z-curve
   * segment of one partition value, so each parquet file lands in its
   * partition directory with a small multi-column bounding box. Reads
   * then compose BOTH prunings: a `partCol` predicate drops whole
   * directories at planning time, and predicates on any z column skip
   * most surviving files via row-group min/max stats.
   */
  def writePartitionedZOrdered(df: DataFrame, path: String, partCol: String,
      zCols: Seq[(String, Double, Double)], files: Int, bits: Int = 10): Unit = {
    df.withColumn("__z", zValue(zCols.map { case (c, lo, hi) => (col(c), lo, hi) }, bits))
      .repartitionByRange(files, col(partCol), col("__z"))
      .sortWithinPartitions(col(partCol), col("__z"))
      .drop("__z")
      .write.mode("overwrite").partitionBy(partCol).parquet(path)
  }

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

  /**
   * Deterministic compaction PLAN over a file inventory: next-fit
   * binning on the (bytes desc, path) total order — running byte sum,
   * `bin = floor((cumsum - bytes) / target)` — so every bin closes at
   * ≤ target + one file and the assignment replays as plain SQL window
   * arithmetic (no first-fit backtracking, which is inherently
   * sequential AND order-fragile). The global window here is over the
   * FILE INVENTORY, not data: at 100 TB with 128 MB files that is
   * ~10⁶ metadata rows on one task — the same driver-scale listing
   * every table-maintenance system (Iceberg/Delta compaction planning)
   * already holds in memory. Output: (path, bytes, bin).
   */
  /**
   * Snapshot DIFF (change-data-capture between two versions of a
   * dimension): full outer join on the key, classify each key as
   * inserted / deleted / changed / unchanged by whole-row struct
   * comparison of the non-key columns. The SCD/merge-ingest primitive:
   * its output drives both an SCD2 history append and an incremental
   * MERGE.
   *
   * Scale shape: one co-partitioned equi-join on the key (bucket both
   * snapshots on the key — l02's layout — and it is exchange-free);
   * the struct comparison is codegen'd per row, nothing widens, and
   * the `unchanged` majority can be filtered before any downstream
   * shuffle. Returns (key, action) plus the old/new structs for
   * downstream column-level auditing.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      key: String): DataFrame = {
    val valCols = oldDf.columns.filterNot(_ == key)
    require(newDf.columns.filterNot(_ == key).sameElements(valCols),
      "snapshots must share a schema")
    val o = oldDf.select(col(key),
      struct(valCols.map(col).toSeq: _*).as("old_row"))
    val n = newDf.select(col(key),
      struct(valCols.map(col).toSeq: _*).as("new_row"))
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("old_row").isNull, "inserted")
          .when(col("new_row").isNull, "deleted")
          .when(col("old_row") =!= col("new_row"), "changed")
          .otherwise("unchanged").as("action"),
        col("old_row"), col("new_row"))
  }

  /**
   * Snapshot MERGE — the APPLY half of the CDC primitive
   * [[snapshotDiff]] starts: consume a change set (rows of
   * `(key, action, new_row)`, i.e. the diff with the `unchanged`
   * majority filtered out — passing an unfiltered diff is also
   * accepted) and produce the NEXT table state:
   *
   *   next = (old ⟕̸ touched-keys)  ∪  changed-new  ∪  inserted
   *
   * — surviving old rows come through a left-anti join on the touched
   * keys (deleted and changed keys drop; inserted keys were never in
   * `old`), and the upserts re-expand from the carried `new_row`
   * struct. This is the daily merge-ingest every long-lived 100 TB
   * dimension runs (Delta/Iceberg MERGE INTO, expressed relationally).
   *
   * Scale shape: ONE keys-only anti-join plus a union — and under
   * l02's layout (both `old` and the change set bucketed on the key
   * with the same bucket count) the whole merge plans with NO exchange
   * on either side (asserted in LayoutSpec with broadcast disabled),
   * so applying a day's changes to a 100 TB dimension never shuffles
   * the dimension. The change set is |changes|-sized, never
   * |table|-sized; the output can be written straight back bucketed on
   * the same key, keeping the layout invariant for tomorrow's merge.
   */
  def applyDiff(oldDf: DataFrame, diff: DataFrame, key: String): DataFrame = {
    val changes = diff.filter(col("action") =!= "unchanged")
    val upserts = changes.filter(col("action").isin("inserted", "changed"))
      .select(col(key) +: oldDf.columns.filterNot(_ == key)
        .map(c => col(s"new_row.$c").as(c)).toSeq: _*)
    val touched = changes.select(col(key))
    oldDf.join(touched, Seq(key), "left_anti").unionByName(upserts)
  }

  def compactionPlan(files: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(bytesCol).desc, col(pathCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files.select(col(pathCol).as("path"), col(bytesCol).as("bytes"))
      .withColumn("bin",
        floor((sum("bytes").over(w) - col("bytes")) / lit(targetBytes)).cast("long"))
  }

  /**
   * Rewrite a parquet directory's small files into ~`targetBytes`
   * outputs — the small-file compaction every long-lived 100 TB table
   * needs (each streaming micro-batch / incremental append leaves
   * files far under the scan-efficient size; metadata and open costs
   * then dominate reads). File count comes from the REAL on-disk byte
   * total (Hadoop FS listing — metadata-sized driver work, like every
   * table-maintenance planner); rows are range-partitioned on
   * `sortCols` and sorted within partitions, so the rewrite restores
   * clustering (parquet min/max file skipping) at the same time, or
   * round-robin'd when no sort is requested. Returns the output file
   * count. Writes to `outPath` — compaction swaps directories
   * atomically at the table layer, it never rewrites in place.
   */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, sortCols: Seq[String] = Seq.empty): Int = {
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    out.write.mode("overwrite").parquet(outPath)
    fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
