package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Bridge to Spark's internal-row execution surface for iterative
 * operators that materialize a frame every round (connected components).
 *
 * `df.rdd` deserializes every InternalRow into an external Row and
 * `createDataFrame` re-encodes it back — two full ser/deser passes of
 * the iterated state per round, pure overhead at any scale. These
 * helpers persist the UnsafeRow bytes as-is and re-expose them as a
 * [[LogicalRDD]] leaf, the same mechanism `Dataset.checkpoint` uses.
 */
object InternalFrame {

  /** The query's InternalRow RDD (no external-Row conversion). Rows are
    * NOT defensively copied — callers that retain them across iterator
    * steps (persist, collect-to-buffer) must `.map(_.copy())` first;
    * shuffle readers recycle one UnsafeRow per partition. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd

  /** A twin of `df` whose UnsafeRow stream is persisted on first
    * compute: MULTIPLE consumers inside one plan (e.g. a census
    * aggregate joined back onto its own input) then scan the upstream
    * pipeline ONCE and read cached blocks after — without a
    * cache-manager entry (`df.persist` leaks one per call; round 2's
    * bug), and without an eager materialization job (the first action
    * that touches either consumer fills the cache). Blocks are
    * reclaimed by the ContextCleaner once the returned frame is
    * unreferenced. No statistics are attached: the callers that need
    * this are corpus-sized, where the honest plan is a shuffle join —
    * never a broadcast. */
  def sharedScan(df: DataFrame): DataFrame = {
    // copy before retaining: shuffle readers recycle one UnsafeRow
    val rdd = toInternalRdd(df).map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ofInternalRdd(df, rdd)
  }

  /** Wrap an InternalRow RDD whose rows match `like`'s schema into a
    * DataFrame leaf (no re-encoding, lineage truncated at the RDD).
    *
    * When the caller knows the materialized size (`rowCount` ≥ 0 with
    * `rowBytes` per row), it is passed as the leaf's statistics —
    * without them a LogicalRDD advertises `defaultSizeInBytes`
    * (integer max), so every subsequent join plans as a full
    * shuffle-merge and only AQE's runtime stats can demote it; with
    * honest stats a small iterated frame broadcasts at PLAN time. */
  def ofInternalRdd(like: DataFrame, rdd: RDD[InternalRow],
      rowCount: Long = -1L, rowBytes: Int = 32): DataFrame = {
    val session = like.asInstanceOf[classic.Dataset[_]].sparkSession
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(like.schema)
    val stats =
      if (rowCount < 0L) None
      else Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(rowCount) * rowBytes,
        rowCount = Some(BigInt(rowCount))))
    classic.Dataset.ofRows(session,
      LogicalRDD(attrs, rdd)(session, originStats = stats))
  }
}
