package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/**
 * TPC-H-shaped relational/OLAP pack over the testdata star schema.
 *
 * Scale posture: dimension tables (`region`, `nation`, and filtered
 * `customer`/`supplier`/`part` slices) are broadcast explicitly; fact-fact
 * joins shuffle only after projection so the exchange carries the minimal
 * row. Filters sit directly on the scan so parquet pushdown applies.
 * All float outputs go through `fround` (see package.scala) so the DuckDB
 * oracle computes bit-identical values.
 */
object Relational {

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val queries: Seq[Q] = Seq(
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") <= lit("2000-12-01"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            fround(sum("l_quantity"), 2).as("sum_qty"),
            fround(sum("l_extendedprice"), 2).as("sum_base_price"),
            fround(sum(rev), 2).as("sum_disc_price"),
            fround(avg("l_quantity"), 2).as("avg_qty"),
            fround(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty,
             |  floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sum_base_price,
             |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
             |  floor(avg(l_quantity) * 100.0 + 0.5) / 100.0 AS avg_qty,
             |  floor(avg(l_discount) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    Q(
      "q02_revenue_forecast",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(
            col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
              col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.07) &&
              col("l_quantity") < lit(24.0))
          .agg(fround(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
      },
      Some("""SELECT floor(sum(l_extendedprice * l_discount) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin)),

    Q(
      "q03_shipping_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = t.orders
          .filter(col("o_orderdate") < lit("1998-06-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = t.lineitem
          .filter(col("l_shipdate") > lit("1998-06-01"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(fround(sum(rev), 2).as("revenue"))
          .select(
            col("l_orderkey"),
            col("revenue"),
            to_date(col("o_orderdate")).as("orderdate"),
            col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue,
             |  CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-01'
             |  AND l_shipdate > TIMESTAMP '1998-06-01'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    Q(
      "q04_order_priority",
      (s, dir) => {
        // EXISTS via a broadcast-driven probe, not a semi-join that
        // sorts the fact table: a left-semi with lineitem as the build
        // side cannot broadcast the SMALL side (Spark only builds the
        // right of a LeftSemi), so at 10× it flipped to a sort-merge
        // over every lineitem row (0.6 → 15 s). Instead the 3-month
        // order slice (a bounded window — broadcastable by
        // construction) broadcasts INTO one lineitem scan, and the
        // distinct on (orderkey, priority) combines map-side, so the
        // fact table is never sorted or shuffled.
        val t = Tables(s, dir)
        val ord = t.orders.filter(
          col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-04-01"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        t.lineitem.select("l_orderkey", "l_shipdate")
          .join(broadcast(ord),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select("o_orderkey", "o_orderpriority").distinct()
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q(
      "q05_local_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val dims = broadcast(
          t.nation
            .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name"))
        val ord = t.orders
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
          .select("o_orderkey", "o_custkey")
        t.lineitem
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
          .join(
            t.supplier.select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(dims, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(fround(sum(rev), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    Q(
      "q07_volume_shipping",
      (s, dir) => {
        val t = Tables(s, dir)
        val n1 = broadcast(t.nation.select(
          col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation")))
        val n2 = broadcast(t.nation.select(
          col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation")))
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
          .join(t.supplier.select("s_suppkey", "s_nationkey"), col("l_suppkey") === col("s_suppkey"))
          .join(t.orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
          .join(t.customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
          .join(n1, col("s_nationkey") === col("supp_nk"))
          .join(n2, col("c_nationkey") === col("cust_nk"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(fround(sum(rev), 2).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS INT) AS l_year,
             |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    Q(
      "q10_returned_items",
      (s, dir) => {
        val t = Tables(s, dir)
        val ord = t.orders
          .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-07-01"))
          .select("o_orderkey", "o_custkey")
        t.lineitem
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(fround(sum(rev), 2).as("revenue"))
          .select(
            col("c_custkey"), col("c_name"), fround(col("c_acctbal"), 2).as("acctbal"),
            col("n_name"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, floor(c_acctbal * 100.0 + 0.5) / 100.0 AS acctbal, n_name,
             |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    Q(
      "q12_priority_case_agg",
      (s, dir) => {
        val t = Tables(s, dir)
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
          .select("l_orderkey", "l_returnflag")
          .join(t.orders.select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(high, 1).otherwise(0)).cast("long").as("high_line_count"),
            sum(when(!high, 1).otherwise(0)).cast("long").as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q(
      "q13_customer_distribution",
      (s, dir) => {
        val t = Tables(s, dir)
        val ord = t.orders
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey")
        t.customer
          .select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT JOIN orders
             |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             |      GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    Q(
      "q14_promo_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-03-01") && col("l_shipdate") < lit("1997-09-01"))
          .select("l_partkey", "l_extendedprice", "l_discount")
          .join(broadcast(t.part.select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(
            fround(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) * 100.0 / sum(rev), 2)
              .as("promo_revenue"))
      },
      Some("""SELECT floor(
             |    sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
             |      * 100.0 / sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-09-01'""".stripMargin)),

    Q(
      "q16_parts_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val badSupp = t.supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        t.lineitem
          .select("l_partkey", "l_suppkey")
          .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(t.part.filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 25)
            .select("p_partkey", "p_brand", "p_type", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
          .limit(20)
      },
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_size <= 25
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20""".stripMargin)),

    Q(
      "q18_large_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.lineitem
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 250.0)
        t.orders
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(t.customer.select("c_custkey", "c_name"), col("o_custkey") === col("c_custkey"))
          .select(
            col("c_name"), col("c_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("orderdate"),
            fround(col("o_totalprice"), 2).as("totalprice"),
            fround(col("sum_qty"), 2).as("sum_qty"))
          .orderBy(col("totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
             |  floor(o_totalprice * 100.0 + 0.5) / 100.0 AS totalprice,
             |  floor(sum_qty * 100.0 + 0.5) / 100.0 AS sum_qty
             |FROM orders
             |  JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             |        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0) big
             |    ON o_orderkey = big.l_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    Q(
      "q22_global_sales",
      (s, dir) => {
        val t = Tables(s, dir)
        val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
          .agg(avg("c_acctbal").as("avg_bal"))
        val recentOrders = t.orders
          .filter(col("o_orderdate") >= lit("2000-01-01"))
          .select("o_custkey")
        t.customer
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recentOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"), fround(sum("c_acctbal"), 2).as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS numcust,
             |  floor(sum(c_acctbal) * 100.0 + 0.5) / 100.0 AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    Q(
      "g01_rollup",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .rollup("l_returnflag", "l_linestatus")
          .agg(fround(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty, count(*) AS cnt
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    Q(
      "g03_grouping_sets",
      (s, dir) => {
        // Explicit GROUPING SETS (not expressible as one rollup/cube):
        // totals by (flag, status), by flag alone, and the grand total —
        // skipping the status-alone set a cube would add.
        val t = Tables(s, dir)
        t.lineitem
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(fround(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty, count(*) AS cnt
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    Q(
      "g04_pivot",
      (s, dir) => {
        // PIVOT: per-source doc counts spread across one column per
        // language. The value list is explicit (Spark then skips its
        // distinct-discovery pass — the form that scales: an implicit
        // pivot first scans the corpus for distinct keys), and the
        // oracle is the portable conditional-aggregation equivalent.
        Tables(s, dir).documents
          .groupBy("source")
          .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("source")
      },
      Some("""SELECT source,
             |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
             |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
             |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
             |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
             |  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    Q(
      "g05_unpivot",
      (s, dir) => {
        // UNPIVOT (melt): the wide per-priority order counts fold back
        // into (status, priority, cnt) rows via the native unpivot node
        // — the inverse reshaping, one narrow pass over the wide frame.
        val wide = Tables(s, dir).orders
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .na.fill(0L)
        wide.unpivot(
            Array(col("o_orderstatus")),
            Array(col("`1-URGENT`"), col("`2-HIGH`"), col("`3-MEDIUM`"),
              col("`4-NOT SPECIFIED`"), col("`5-LOW`")),
            "priority", "cnt")
          .filter(col("cnt") > 0) // fill(0) pads combos the oracle's GROUP BY never emits
          .orderBy("o_orderstatus", "priority")
      },
      Some("""SELECT o_orderstatus, o_orderpriority AS priority,
             |  count(*) AS cnt
             |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, priority""".stripMargin)),

    Q(
      "g02_cube",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"), fround(sum("o_totalprice"), 2).as("sum_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             |  floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS sum_price
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    Q(
      "s01_union",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.select(col("c_nationkey").as("nk"))
          .union(t.supplier.select(col("s_nationkey").as("nk")))
          .distinct()
          .orderBy("nk")
      },
      Some("""SELECT c_nationkey AS nk FROM customer
             |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin)),

    Q(
      "s02_intersect",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.filter(col("c_acctbal") > 9000.0).select(col("c_nationkey").as("nk"))
          .intersect(t.supplier.select(col("s_nationkey").as("nk")))
          .orderBy("nk")
      },
      Some("""SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000.0
             |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin)),

    Q(
      "s03_except",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.select(col("n_nationkey").as("nk"))
          .except(t.supplier.filter(col("s_acctbal") > 5000.0).select(col("s_nationkey").as("nk")))
          .orderBy("nk")
      },
      Some("""SELECT n_nationkey AS nk FROM nation
             |EXCEPT SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000.0
             |ORDER BY nk""".stripMargin))
  )
}
