package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/**
 * Window-function pack. Every frame is ordered by a unique key suffix
 * (orderkey / event_id) so running aggregates are deterministic under
 * any partitioning.
 */
object Windows {

  val queries: Seq[Q] = Seq(
    Q(
      "w01_running_total",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.orders
          .select(
            col("o_custkey"), col("o_orderkey"),
            fround(sum("o_totalprice").over(w), 2).as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  floor(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS running_total
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q(
      "w02_rank_in_group",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy("c_mktsegment").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t.orders
          .join(t.customer.select("c_custkey", "c_mktsegment"),
            col("o_custkey") === col("c_custkey"))
          .select(
            col("c_mktsegment"), col("o_orderkey"),
            fround(col("o_totalprice"), 2).as("totalprice"),
            rank().over(w).as("rnk"))
          .filter(col("rnk") <= 3)
          .orderBy("c_mktsegment", "rnk")
      },
      Some("""SELECT * FROM (
             |  SELECT c_mktsegment, o_orderkey, floor(o_totalprice * 100.0 + 0.5) / 100.0 AS totalprice,
             |    CAST(rank() OVER (PARTITION BY c_mktsegment
             |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
             |  FROM orders JOIN customer ON o_custkey = c_custkey)
             |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin)),

    Q(
      "w03_lag_delta",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t.events
          .select(
            col("user_id"), col("event_id"),
            (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("delta_us"))
          .filter(col("delta_us").isNotNull)
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, delta_us FROM (
             |  SELECT user_id, event_id,
             |    date_diff('microsecond',
             |      lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS delta_us
             |  FROM events)
             |WHERE delta_us IS NOT NULL ORDER BY user_id, event_id""".stripMargin))
  )
}
