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
}
