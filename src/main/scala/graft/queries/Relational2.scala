package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/**
 * Second TPC-H-shaped pack: correlated/scalar subqueries, view-over-
 * aggregate, disjunctive pushdown, multi-exists — the shapes Q9, Q11,
 * Q15, Q17, Q19, Q21 exercise, adapted to this schema (no partsupp /
 * commitdate columns), plus JSON extraction over `events.props`.
 */
object Relational2 {

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val queries: Seq[Q] = Seq(
    Q(
      "q09_product_profit",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(broadcast(t.part.filter(col("p_name").contains("red"))
            .select("p_partkey")), col("l_partkey") === col("p_partkey"))
          .join(t.supplier.select("s_suppkey", "s_nationkey"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation.select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .join(t.orders.select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(fround(sum(rev), 2).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS sum_profit
             |FROM lineitem
             |  JOIN part ON l_partkey = p_partkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |WHERE p_name LIKE '%red%'
             |GROUP BY n_name, CAST(year(o_orderdate) AS INT)
             |ORDER BY nation, o_year DESC""".stripMargin)),

    Q(
      "q11_important_parts",
      (s, dir) => {
        val t = Tables(s, dir)
        val partValue = t.lineitem.groupBy("l_partkey")
          .agg(sum(col("l_extendedprice")).as("value"))
        val threshold = t.lineitem
          .agg((sum(col("l_extendedprice")) * 0.0005).as("thr"))
        partValue.crossJoin(broadcast(threshold))
          .filter(col("value") > col("thr"))
          .select(col("l_partkey"), fround(col("value"), 2).as("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""SELECT l_partkey, floor(value * 100.0 + 0.5) / 100.0 AS value
             |FROM (SELECT l_partkey, sum(l_extendedprice) AS value
             |      FROM lineitem GROUP BY l_partkey)
             |WHERE value > (SELECT sum(l_extendedprice) * 0.0005 FROM lineitem)
             |ORDER BY value DESC, l_partkey""".stripMargin)),

    Q(
      "q15_top_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val srev = t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
          .groupBy("l_suppkey")
          .agg(sum(rev).as("total_revenue"))
        val top = srev.agg(max("total_revenue").as("mx"))
        // >= mx − ε, not exact fp equality: the srev subtree is computed
        // twice (group-by + max) and distributed sum order can differ in
        // the last ulp between evaluations and between engines.
        srev.crossJoin(broadcast(top))
          .filter(col("total_revenue") >= col("mx") - 1e-6)
          .join(t.supplier.select("s_suppkey", "s_name"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), fround(col("total_revenue"), 2).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""WITH srev AS (
             |  SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name,
             |  floor(total_revenue * 100.0 + 0.5) / 100.0 AS total_revenue
             |FROM srev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_revenue >= (SELECT max(total_revenue) FROM srev) - 1e-6
             |ORDER BY s_suppkey""".stripMargin)),

    Q(
      "q17_small_quantity",
      (s, dir) => {
        val t = Tables(s, dir)
        val partAvg = t.lineitem.groupBy(col("l_partkey").as("avg_partkey"))
          .agg((avg("l_quantity") * 0.5).as("half_avg"))
        t.lineitem
          .join(broadcast(t.part.filter(col("p_brand") === "Brand#3").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(partAvg, col("l_partkey") === col("avg_partkey"))
          .filter(col("l_quantity") < col("half_avg"))
          .agg(fround(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
      },
      Some("""SELECT floor(sum(l_extendedprice) / 7.0 * 100.0 + 0.5) / 100.0 AS avg_yearly
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand = 'Brand#3'
             |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
             |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin)),

    Q(
      "q19_disjunctive",
      (s, dir) => {
        val t = Tables(s, dir)
        val li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        val p = broadcast(t.part.select("p_partkey", "p_brand", "p_size"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
              col("l_quantity").between(1, 15)) ||
              (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
                col("l_quantity").between(10, 25)) ||
              (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
                col("l_quantity").between(20, 35)))
          .agg(fround(sum(rev), 2).as("revenue"))
      },
      Some("""SELECT floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 25)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 20 AND 35)""".stripMargin)),

    Q(
      "q21_waiting_suppliers",
      (s, dir) => {
        // "the only late supplier in a multi-supplier F-order" needs no
        // EXISTS / NOT-EXISTS self-joins of lineitem: both predicates
        // are per-order facts, so ONE pass — aggregate lineitem by
        // (order, supplier), then by order — replaces the two extra
        // shuffles of the whole fact table (2× faster at sf0.1, and the
        // self-join inputs don't have to co-shuffle at 100 TB).
        val t = Tables(s, dir)
        val ord = t.orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
              .as("is_late"))
        val perSupp = li.groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("is_late")).as("supp_late"),
            sum(when(col("is_late"), 1L).otherwise(0L)).as("supp_late_rows"))
        val perOrder = perSupp.groupBy("l_orderkey")
          .agg(
            count(lit(1)).as("n_supps"),
            sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supps"),
            max(when(col("supp_late"), col("l_suppkey"))).as("late_supp"),
            sum(when(col("supp_late"), col("supp_late_rows")).otherwise(0L))
              .as("late_rows"))
          .filter(col("n_late_supps") === 1 && col("n_supps") >= 2)
        perOrder
          .join(broadcast(t.supplier.select("s_suppkey", "s_name")),
            col("late_supp") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(coalesce(sum("late_rows"), lit(0L)).cast("long").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH late AS (
             |  SELECT l_orderkey AS lo, l_suppkey AS ls
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F'
             |    AND l_shipdate > o_orderdate + INTERVAL 100 DAY)
             |SELECT s_name, count(*) AS numwait
             |FROM late
             |  JOIN supplier ON ls = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = lo AND l2.l_suppkey <> ls)
             |  AND NOT EXISTS (SELECT 1 FROM late l3
             |                  WHERE l3.lo = late.lo AND l3.ls <> late.ls)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    Q(
      "q26_min_cost_supplier",
      (s, dir) => {
        // TPC-H Q2 SHAPE on the available star (no partsupp table in
        // this corpus): for each sampled part, the EUROPE supplier(s)
        // achieving the region-wide minimum lineitem price — a
        // correlated-min subquery decorrelated into an aggregate +
        // equi-join back, with the dim chain (nation⋈region) broadcast.
        val t = Tables(s, dir)
        val euroSupp = t.supplier.select("s_suppkey", "s_name", "s_nationkey")
          .join(broadcast(t.nation.select("n_nationkey", "n_regionkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region.filter(col("r_name") === "EUROPE")
            .select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "n_name")
        val offers = t.lineitem
          .filter(pmod(col("l_partkey"), lit(25)) === 0)
          .select("l_partkey", "l_suppkey", "l_extendedprice")
          .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
        val minPrice = offers.groupBy(col("l_partkey").as("mp_partkey"))
          .agg(min("l_extendedprice").as("min_price"))
        offers
          .join(minPrice, col("l_partkey") === col("mp_partkey") &&
            col("l_extendedprice") === col("min_price"))
          .join(t.part.select("p_partkey", "p_name"),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"), fround(col("min_price"), 2).as("min_price"))
          .distinct()
          .orderBy(col("min_price").desc, col("p_partkey"), col("s_name"))
          .limit(50)
      },
      Some("""WITH euro AS (
             |  SELECT s_suppkey, s_name, n_name
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |       JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |offers AS (
             |  SELECT l_partkey, l_extendedprice, s_name, n_name
             |  FROM lineitem JOIN euro ON l_suppkey = s_suppkey
             |  WHERE l_partkey % 25 = 0)
             |SELECT DISTINCT p_partkey, p_name, s_name, n_name,
             |  floor(l_extendedprice * 100.0 + 0.5) / 100.0 AS min_price
             |FROM offers JOIN part ON l_partkey = p_partkey
             |WHERE l_extendedprice = (SELECT min(o2.l_extendedprice)
             |                         FROM offers o2 WHERE o2.l_partkey = offers.l_partkey)
             |ORDER BY min_price DESC, p_partkey, s_name LIMIT 50""".stripMargin)),

    Q(
      "e03_json_extract",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("event_type")
          .agg(
            count(col("k")).as("n"),
            fround(avg("k"), 2).as("avg_k"),
            max("k").cast("int").as("max_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(k) AS n,
             |  floor(avg(k) * 100.0 + 0.5) / 100.0 AS avg_k, CAST(max(k) AS INT) AS max_k
             |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
