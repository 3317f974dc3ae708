package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (point-in-interval) join: pair every left row whose `point`
 * falls inside a right row's `[lo, hi]` interval.
 *
 * Spark plans a plain `p BETWEEN lo AND hi` join with no equi-key as a
 * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, a non-starter at
 * scale. This operator BINS the domain: each interval explodes into the
 * bins it covers, each point maps to its bin, and the join becomes
 * equi-keyed on the bin with the exact predicate re-checked after — the
 * standard trick Databricks ships as a range-join hint. Comparisons
 * drop to O(|L| + Σ interval_width/binWidth + matches); the shuffle
 * carries (bin, row) pairs, co-partitioned like any equi-join.
 *
 * `binWidth` tunes the tradeoff: narrower bins = more interval
 * duplication, fewer false candidates. Intervals are duplicated
 * ceil(width/binWidth)+1 times — choose binWidth near the median
 * interval width so duplication stays O(1) per interval.
 */
object RangeJoin {

  /**
   * @param left     probe side with a numeric `pointCol`
   * @param right    interval side with numeric `loCol`/`hiCol` (inclusive)
   * @param binWidth bin size in the point's units (> 0)
   * @return every (left × matching right) row pair's columns
   */
  def pointInInterval(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    // ill-formed intervals (hi < lo) match nothing, like BETWEEN
    val intervals = right
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val points = left.withColumn("__bin", bin(col(pointCol)))
    points.join(intervals, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /**
   * Interval × interval OVERLAP join: pair every left `[lLo, lHi]` with
   * every right `[rLo, rHi]` that intersects it (inclusive ends). Same
   * binning scheme as [[pointInInterval]] — both sides explode into
   * covered bins and the join is equi-keyed on the bin. A candidate
   * pair can share many bins, but each overlapping pair is emitted from
   * exactly ONE: the bin containing the overlap's start
   * `max(lLo, rLo)` (both sides cover it by definition) — so no
   * `distinct` pass is needed and the output streams.
   */
  def intervalOverlap(left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) >= col(lo))
      .withColumn("__bin", explode(sequence(bin(col(lo)), bin(col(hi)))))
    binned(left, lLoCol, lHiCol)
      .join(binned(right, rLoCol, rHiCol), Seq("__bin"))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        col("__bin") === bin(greatest(col(lLoCol), col(rLoCol))))
      .drop("__bin")
  }
}
