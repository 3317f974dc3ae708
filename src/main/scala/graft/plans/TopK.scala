package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftshim.TopKPerGroupApi

/**
 * Public API of the grouped top-k whole-operator (custom Catalyst
 * `LogicalPlan` + optimizer `Rule` + `SparkStrategy` + two-phase
 * `SparkPlan`, see `org.apache.spark.sql.graftshim.TopKPerGroup`).
 *
 * `TopK.perGroup(df, groups, score, tie, k)` keeps, per group, the k
 * rows with the highest `score` (ties: lowest `tie` wins) — equivalent
 * to the `row_number() ... <= k` window pattern but with map-side heap
 * reduction: the shuffle carries at most k rows per (partition, group)
 * instead of every row, and nothing is ever sorted.
 */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[Column], score: Column, tie: Column,
      k: Int): DataFrame =
    TopKPerGroupApi.perGroup(df, groupCols, score, tie, k)

  /**
   * Weighted-quota variant — the pretraining-mix primitive: keep
   * `min(maxK, quota)` rows per group where `quota` is an integral
   * column constant within its group (broadcast-join a model-sized
   * quota table on the group key to attach it). Same two-heap-pass
   * physical plan; the map-side pass already bounds each partition to
   * the group's own quota, so the shuffle carries at most
   * `partitions × Σ quota` rows. Null quota → `maxK`; quota <= 0 drops
   * the group entirely.
   */
  def perGroupQuota(df: DataFrame, groupCols: Seq[Column], score: Column, tie: Column,
      quota: Column, maxK: Int): DataFrame =
    TopKPerGroupApi.perGroupQuota(df, groupCols, score, tie, quota, maxK)
}
