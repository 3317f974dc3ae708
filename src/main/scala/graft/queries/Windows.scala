package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Additional window/aggregate surface: explicit frames, exact
  * percentiles, statistical aggregates. */
object Windows2 {

  val queries: Seq[Q] = Seq(
    Q(
      "w04_moving_avg",
      (s, dir) => {
        // explicit ROWS frame (w01 covers the default running frame):
        // 7-row trailing average of daily order totals
        val t = Tables(s, dir)
        val daily = t.orders
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum("o_totalprice").as("total"))
        daily
          .select(col("day"), fround(avg("total").over(
            Window.orderBy("day").rowsBetween(-6, 0)), 2).as("avg7"))
          .orderBy("day")
      },
      Some("""SELECT day, floor(avg(total) OVER (ORDER BY day
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS avg7
             |FROM (SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS total
             |      FROM orders GROUP BY 1)
             |ORDER BY day""".stripMargin)),

    Q(
      "q23_percentiles",
      (s, dir) => {
        // exact interpolating percentiles (Spark `percentile` ==
        // DuckDB `quantile_cont`), grouped
        Tables(s, dir).lineitem
          .groupBy("l_returnflag")
          .agg(
            fround(expr("percentile(l_quantity, 0.5)"), 2).as("p50_qty"),
            fround(expr("percentile(l_quantity, 0.9)"), 2).as("p90_qty"),
            fround(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  floor(quantile_cont(l_quantity, 0.5) * 100.0 + 0.5) / 100.0 AS p50_qty,
             |  floor(quantile_cont(l_quantity, 0.9) * 100.0 + 0.5) / 100.0 AS p90_qty,
             |  floor(quantile_cont(l_extendedprice, 0.99) * 100.0 + 0.5) / 100.0 AS p99_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q(
      "q24_stats",
      (s, dir) => {
        // statistical aggregate surface: correlation, sample
        // stddev/covariance per group
        Tables(s, dir).lineitem
          .groupBy("l_returnflag")
          .agg(
            fround(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
            fround(stddev_samp(col("l_discount")), 4).as("sd_discount"),
            fround(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  floor(corr(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS corr_qty_price,
             |  floor(stddev_samp(l_discount) * 10000.0 + 0.5) / 10000.0 AS sd_discount,
             |  floor(covar_samp(l_quantity, l_discount) * 10000.0 + 0.5) / 10000.0 AS cov_qty_disc
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q(
      "w05_rank_functions",
      (s, dir) => {
        // remaining rank-function family: quartiles, relative rank,
        // cumulative distribution per group
        val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables(s, dir).orders
          .filter(col("o_orderkey") % 100 === 0)
          .select(
            col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            fround(percent_rank().over(w), 6).as("pct_rank"),
            fround(cume_dist().over(w), 6).as("cume"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
             |  floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
             |FROM orders WHERE o_orderkey % 100 = 0
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    Q(
      "t08_normalize",
      (s, dir) => {
        // canonical text normalization for exact dedup: lowercase,
        // strip non-alphanumerics, collapse runs of spaces, trim —
        // plain character classes so Java regex and RE2 agree
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "  +", " "))
        Tables(s, dir).documents
          .select(col("doc_id"), norm.as("norm_text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             |       '  +', ' ', 'g')) AS norm_text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "q25_listagg",
      (s, dir) => {
        // list aggregation with deterministic ordering: per market
        // segment, the sorted distinct order priorities + order count
        val t = Tables(s, dir)
        t.customer.select("c_custkey", "c_mktsegment")
          .join(t.orders.select("o_custkey", "o_orderpriority"),
            col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"),
            count(lit(1)).as("cnt"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities,
             |  count(*) AS cnt
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q(
      "s05_except_all",
      (s, dir) => {
        // multiset EXCEPT: multiplicities subtract (a customer with 3
        // big orders and 1 F-status order keeps 2 rows) — completes
        // the set-op family's ALL forms next to s04
        val t = Tables(s, dir)
        val a = t.orders.filter(col("o_totalprice") > 100000).select("o_custkey")
        val b = t.orders.filter(col("o_orderstatus") === "F").select("o_custkey")
        a.exceptAll(b)
          .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS cnt FROM (
             |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
             |  EXCEPT ALL
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    Q(
      "s04_intersect_all",
      (s, dir) => {
        // multiset (ALL) set-op semantics — s02/s03 cover the DISTINCT
        // forms; duplicates must be preserved up to the min multiplicity
        val t = Tables(s, dir)
        val a = t.orders.filter(col("o_totalprice") > 100000).select("o_custkey")
        val b = t.orders.filter(col("o_orderstatus") === "F").select("o_custkey")
        a.intersectAll(b)
          .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS cnt FROM (
             |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
             |  INTERSECT ALL
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    Q(
      "w10_interpolate",
      (s, dir) => {
        // LINEAR interpolation over the densified calendar (w06 fills
        // gaps with zeros; resampling a time series wants the line
        // between the neighboring observations — the standard
        // pre-model step for sensor/forecast pipelines). Exactness
        // discipline: per-event values quantize to integer CENTS
        // before any sum (w09), and the interpolated value is
        // prev + floor((next−prev)·(d−pd)/(nd−pd)) — all-integer
        // inputs through one float division then floor, identical in
        // both engines. Neighbor discovery uses NO ignore-nulls
        // windows (engine-specific semantics): the prev/next KNOWN day
        // comes from max/min-over-frame of the known-day column, and
        // the known (day, cents) frame joins back by that day — the
        // windows and joins all run over the CALENDAR-sized densified
        // frame (days, not events; SF-independent), so the
        // single-partition window is by construction model-sized.
        val t = Tables(s, dir)
        val daily = t.events
          .filter(col("event_type") === "purchase" && pmod(col("user_id"), lit(500)) === 0)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
        val calendar = daily.agg(min("day").as("lo"), max("day").as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val joined = calendar.join(daily, Seq("day"), "left")
          .withColumn("day_num", datediff(col("day"), lit("1992-01-01").cast("date")))
        val wPrev = Window.orderBy("day_num")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window.orderBy("day_num")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val flagged = joined
          .withColumn("pd", max(when(col("cents").isNotNull, col("day_num"))).over(wPrev))
          .withColumn("nd", min(when(col("cents").isNotNull, col("day_num"))).over(wNext))
        val known = joined.filter(col("cents").isNotNull)
          .select(col("day_num").as("kd"), col("cents").as("kc"))
        flagged
          .join(known.select(col("kd").as("pd"), col("kc").as("prev_c")), Seq("pd"), "left")
          .join(known.select(col("kd").as("nd"), col("kc").as("next_c")), Seq("nd"), "left")
          .select(col("day"),
            when(col("cents").isNotNull, col("cents"))
              .otherwise(col("prev_c") + floor((col("next_c") - col("prev_c"))
                * (col("day_num") - col("pd")) * lit(1.0)
                / (col("nd") - col("pd"))).cast("long"))
              .as("cents_filled"),
            when(col("cents").isNotNull, lit("obs")).otherwise(lit("interp")).as("src"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase' AND user_id % 500 = 0
             |  GROUP BY 1),
             |cal AS (SELECT CAST(unnest(generate_series(
             |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
             |    INTERVAL 1 DAY)) AS DATE) AS day),
             |j AS (SELECT day, cents,
             |    date_diff('day', DATE '1992-01-01', day) AS day_num
             |  FROM cal LEFT JOIN daily USING (day)),
             |f AS (SELECT *,
             |    max(CASE WHEN cents IS NOT NULL THEN day_num END)
             |      OVER (ORDER BY day_num ROWS BETWEEN UNBOUNDED PRECEDING
             |            AND CURRENT ROW) AS pd,
             |    min(CASE WHEN cents IS NOT NULL THEN day_num END)
             |      OVER (ORDER BY day_num ROWS BETWEEN CURRENT ROW
             |            AND UNBOUNDED FOLLOWING) AS nd
             |  FROM j)
             |SELECT f.day,
             |  CASE WHEN f.cents IS NOT NULL THEN f.cents
             |       ELSE pc.cents + CAST(floor((nc.cents - pc.cents)
             |         * (f.day_num - f.pd) * 1.0 / (f.nd - f.pd)) AS BIGINT) END
             |    AS cents_filled,
             |  CASE WHEN f.cents IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
             |FROM f
             |LEFT JOIN (SELECT day_num, cents FROM j WHERE cents IS NOT NULL) pc
             |  ON pc.day_num = f.pd
             |LEFT JOIN (SELECT day_num, cents FROM j WHERE cents IS NOT NULL) nc
             |  ON nc.day_num = f.nd
             |ORDER BY day""".stripMargin)),

    Q(
      "w11_ewma",
      (s, dir) => {
        // EXPONENTIAL moving average (the smoothing every monitoring/
        // forecast pipeline runs; w04's flat 7-row mean weights a
        // week-old day like yesterday). α = 1/2 truncated at 8 lags
        // makes every weight a power of two — ewma·256 = cents·128 +
        // lag1·64 + … + lag7·1 is EXACT integer arithmetic (a float
        // recurrence's engine-order ulps could never hash), and the
        // truncation error is bounded by max|x|/256. Per-order totals
        // quantize to cents BEFORE the daily sum (w09's move). The
        // window partitions by market segment over the DAYS-sized
        // pre-aggregated frame — model-sized per partition; the
        // data-sized work is the map-side-combinable daily groupBy and
        // the broadcast dim join. Row-based lags: both engines replay
        // the identical ordered frame, day unique within segment.
        val t = Tables(s, dir)
        val daily = t.orders
          .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"),
            to_date(col("o_orderdate")).as("day"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("cents"))
        val w = Window.partitionBy("segment").orderBy("day")
        val ema256 = (1 to 7).map(j =>
            coalesce(lag(col("cents"), j).over(w), lit(0L)) * lit(1L << (7 - j)))
          .foldLeft(col("cents") * lit(128L))(_ + _)
        daily
          .select(col("segment"), col("day"), col("cents"), ema256.as("e"))
          .select(col("segment"), col("day"), col("cents"),
            expr("e div 256").as("ewma_cents"))
          .orderBy("segment", "day")
      },
      Some("""WITH daily AS (SELECT c.c_mktsegment AS segment,
             |    CAST(o_orderdate AS DATE) AS day,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2)
             |SELECT segment, day, cents,
             |  CAST((cents * 128
             |    + COALESCE(lag(cents, 1) OVER w, 0) * 64
             |    + COALESCE(lag(cents, 2) OVER w, 0) * 32
             |    + COALESCE(lag(cents, 3) OVER w, 0) * 16
             |    + COALESCE(lag(cents, 4) OVER w, 0) * 8
             |    + COALESCE(lag(cents, 5) OVER w, 0) * 4
             |    + COALESCE(lag(cents, 6) OVER w, 0) * 2
             |    + COALESCE(lag(cents, 7) OVER w, 0)) // 256 AS BIGINT) AS ewma_cents
             |FROM daily WINDOW w AS (PARTITION BY segment ORDER BY day)
             |ORDER BY segment, day""".stripMargin))
  )
}

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
      "w06_gap_fill",
      (s, dir) => {
        // Calendar gap-fill (time-series densification): a sparse daily
        // revenue series (one user cohort's purchases) left-joined onto
        // the dense day range so missing days surface as explicit 0s —
        // the standard pre-step for window math over time series. The
        // calendar derives from a 1-row min/max aggregate (days-sized,
        // broadcast); nothing data-sized shuffles twice.
        val t = Tables(s, dir)
        val daily = t.events
          .filter(col("event_type") === "purchase" && pmod(col("user_id"), lit(500)) === 0)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum("value").as("rev"))
        val calendar = daily.agg(min("day").as("lo"), max("day").as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        calendar.join(daily, Seq("day"), "left")
          .select(col("day"), fround(coalesce(col("rev"), lit(0.0)), 2).as("rev"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS rev
             |  FROM events WHERE event_type = 'purchase' AND user_id % 500 = 0
             |  GROUP BY 1),
             |cal AS (SELECT CAST(unnest(generate_series(
             |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
             |    INTERVAL 1 DAY)) AS DATE) AS day)
             |SELECT day, floor(coalesce(rev, 0.0) * 100.0 + 0.5) / 100.0 AS rev
             |FROM cal LEFT JOIN daily USING (day) ORDER BY day""".stripMargin)),

    Q(
      "w07_range_window",
      (s, dir) => {
        // RANGE frame over a value axis (w04 covers ROWS): per customer,
        // the trailing-30-DAY spend — the frame is defined by day
        // DISTANCE, so bursty/sparse order dates aggregate correctly
        // where a row-count frame would not (and date peers are included
        // by value, not by arbitrary tie order). Prices fold to exact
        // integer cents before the windowed sum, so both engines sum
        // identical integers in any order — no float drift in any frame.
        val t = Tables(s, dir)
        val w = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-29, 0)
        t.orders
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")).as("day_num"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
          .select(col("o_custkey"), col("o_orderkey"), col("day_num"),
            (sum("cents").over(w).cast("double") / lit(100.0)).as("spend30"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, day_num,
             |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day_num
             |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS spend30
             |FROM (SELECT o_custkey, o_orderkey,
             |        date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_num,
             |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |      FROM orders)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

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
             |WHERE delta_us IS NOT NULL ORDER BY user_id, event_id""".stripMargin)),

    Q(
      "w08_first_last_nth",
      (s, dir) => {
        // Positional value functions over a whole-partition frame
        // (completing the window family: w02 ranks, w03 lag, w05
        // distribution): each customer's first, latest, and second order
        // key in (date, key) order. Frames partition by customer — the
        // window's working set is one customer's orders, never the
        // stream — and the tie-break makes every value deterministic.
        // second_key is NULL for single-order customers in both engines.
        val t = Tables(s, dir)
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t.orders
          .select(col("o_custkey"),
            first("o_orderkey").over(w).as("first_key"),
            last("o_orderkey").over(w).as("last_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
          .distinct()
          .orderBy("o_custkey")
      },
      Some("""SELECT DISTINCT o_custkey,
             |  first_value(o_orderkey) OVER w AS first_key,
             |  last_value(o_orderkey) OVER w AS last_key,
             |  nth_value(o_orderkey, 2) OVER w AS second_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey""".stripMargin)),

    Q(
      "w09_pareto_deciles",
      (s, dir) => {
        // Revenue-concentration (Pareto) curve per market segment: the
        // "top decile of customers drives X% of revenue" table. Order
        // totals quantize to integer CENTS per row BEFORE any sum, so
        // customer ranking is exact integer arithmetic — a float sum's
        // engine-order ulp could otherwise flip two near-tied
        // customers across a decile boundary. ntile is SQL-standard in
        // both engines; the window sorts one segment's CUSTOMERS (the
        // pre-aggregated frame, not orders) — at extreme scale
        // pre-bucket by revenue range first, same refinement as t14's
        // heap note.
        val t = Tables(s, dir)
        val rev = t.orders
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy("o_custkey").agg(sum("cents").as("rc"))
          .join(broadcast(t.customer.select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment"))), "o_custkey")
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("rc").desc, col("o_custkey"))
        val byDec = rev.withColumn("decile", ntile(10).over(w))
          .groupBy("c_mktsegment", "decile")
          .agg(count(lit(1)).as("n_customers"), sum("rc").as("dec_cents"))
        val segTot = byDec.groupBy("c_mktsegment")
          .agg(sum("dec_cents").as("seg_cents"))
        byDec.join(broadcast(segTot), "c_mktsegment")
          .select(col("c_mktsegment"), col("decile"), col("n_customers"),
            col("dec_cents"),
            fround(col("dec_cents").cast("double") / col("seg_cents"), 4)
              .as("rev_share"))
          .orderBy("c_mktsegment", "decile")
      },
      Some("""WITH rev AS (SELECT o_custkey,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rc
             |  FROM orders GROUP BY 1),
             |seg AS (SELECT rev.o_custkey, rc, c_mktsegment
             |  FROM rev JOIN customer ON c_custkey = o_custkey),
             |dec AS (SELECT c_mktsegment,
             |    ntile(10) OVER (PARTITION BY c_mktsegment
             |      ORDER BY rc DESC, o_custkey) AS decile,
             |    rc FROM seg),
             |byd AS (SELECT c_mktsegment, CAST(decile AS INT) AS decile,
             |    count(*) AS n_customers, CAST(sum(rc) AS BIGINT) AS dec_cents
             |  FROM dec GROUP BY 1, 2),
             |tot AS (SELECT c_mktsegment, CAST(sum(dec_cents) AS BIGINT) AS seg_cents
             |  FROM byd GROUP BY 1)
             |SELECT b.c_mktsegment, b.decile, b.n_customers, b.dec_cents,
             |  floor(b.dec_cents * 1.0 / t.seg_cents * 10000.0 + 0.5) / 10000.0 AS rev_share
             |FROM byd b JOIN tot t USING (c_mktsegment)
             |ORDER BY c_mktsegment, decile""".stripMargin)),

    Q(
      "w12_theilsen_trend",
      (s, dir) => {
        // THEIL-SEN robust trend per event type — the median of all
        // pairwise day-slopes (Theil 1950; Sen 1968), the trend
        // estimator monitoring teams use where one promo-day outlier
        // would wreck least squares (w11's EWMA smooths level, this
        // estimates drift). Exactness: per-event values quantize to
        // integer CENTS before any sum (w09's discipline — a float
        // day-total's engine-order ulp could flip a near-tied pair's
        // slope sign), each pair slope is floor((Δcents·1e6)/Δdays)
        // via explicit floor on the exact double ratio (both engines
        // floor toward −∞ — integer `div` truncates negatives and
        // would disagree), and the median is the LOWER median by
        // (slope, d1, d2) total order — deterministic, no averaging.
        // The pair join is days² per type (~4k pairs here) — the
        // audit grain; at 100 TB you run it on the daily AGGREGATE
        // (365 rows/type/year), never raw events, so days² stays
        // tiny however large the event log.
        val shared = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(
          dailyCents(s, dir))
        val pairs = shared.as("a").join(shared.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .select(col("a.event_type").as("event_type"),
            col("a.day").as("d1"), col("b.day").as("d2"),
            floor(((col("b.v") - col("a.v")) * 1000000L).cast("double") /
              datediff(col("b.day"), col("a.day"))).cast("long").as("slope"))
        val ranked = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(
          pairs.withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("event_type")
              .orderBy("slope", "d1", "d2"))))
        val counts = ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"))
        val nDays = shared.groupBy("event_type").agg(count(lit(1)).as("n_days"))
        ranked.join(counts, "event_type")
          .filter(col("rn") === expr("(n_pairs + 1) div 2"))
          .join(nDays, "event_type")
          .select(col("event_type"), col("n_days"), col("n_pairs"),
            col("slope").as("ts_slope_ucents"))
          .orderBy("event_type")
      },
      Some(s"""WITH $dailyCentsSql,
             |pairs AS (SELECT a.event_type, a.day AS d1, b.day AS d2,
             |    CAST(floor((b.v - a.v) * 1000000 * 1.0
             |      / date_diff('day', a.day, b.day)) AS BIGINT) AS slope
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.day < b.day),
             |ranked AS (SELECT *, row_number() OVER (PARTITION BY event_type
             |      ORDER BY slope, d1, d2) AS rn
             |  FROM pairs),
             |counts AS (SELECT event_type, count(*) AS n_pairs
             |  FROM ranked GROUP BY 1),
             |nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
             |SELECT r.event_type, nd.n_days, c.n_pairs,
             |  r.slope AS ts_slope_ucents
             |FROM ranked r JOIN counts c USING (event_type)
             |JOIN nd USING (event_type)
             |WHERE r.rn = (c.n_pairs + 1) // 2
             |ORDER BY r.event_type""".stripMargin)),

    Q(
      "w13_mann_kendall",
      (s, dir) => {
        // MANN–KENDALL trend test per event type (Mann 1945; Kendall
        // 1975) — w12's significance sibling: Theil–Sen SAYS the
        // slope, MK says whether the monotone trend is REAL. Shares
        // w12's EXACT daily integer-cents frame (one `dailyCents`
        // helper, one SQL CTE — the d15 no-drift rule). S = Σ_{i<j}
        // sign(v_j − v_i) is pure integer (the sign CASE, not
        // float signum); the tie-corrected variance stays in exact
        // integer 18ths (var18 = n(n−1)(2n+5) − Σ_tied t(t−1)(2t+5))
        // and the z statistic ((S∓1)/√(var18/18)) quantizes to
        // integer micro — sqrt is IEEE-correctly-rounded, so the one
        // float step is deterministic in both engines. The pair join
        // is days² per type on the daily AGGREGATE (w12's audit-grain
        // argument: 365 rows/type/year at any corpus size).
        val shared = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(
          dailyCents(s, dir))
        val sStat = shared.as("a").join(shared.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .groupBy(col("a.event_type").as("event_type"))
          .agg(sum(when(col("b.v") > col("a.v"), 1L)
            .when(col("b.v") < col("a.v"), -1L).otherwise(0L))
            .cast("long").as("s_stat"))
        val nd = shared.groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_days"))
        val ties = shared.groupBy("event_type", "v")
          .agg(count(lit(1)).as("t")).filter(col("t") > 1)
          .groupBy("event_type")
          .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).cast("long").as("tie18"))
        nd.join(sStat, Seq("event_type"), "left")
          .join(ties, Seq("event_type"), "left")
          .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
          .withColumn("var18",
            (expr("n_days * (n_days - 1) * (2 * n_days + 5)")
              - coalesce(col("tie18"), lit(0L))).cast("long"))
          .withColumn("z_micro",
            when(col("var18") <= 0 || col("s_stat") === 0, lit(0L))
              .when(col("s_stat") > 0, floor(
                (col("s_stat") - 1) / sqrt(col("var18") / lit(18.0))
                  * 1000000.0 + 0.5).cast("long"))
              .otherwise(floor(
                (col("s_stat") + 1) / sqrt(col("var18") / lit(18.0))
                  * 1000000.0 + 0.5).cast("long")))
          .select(col("event_type"), col("n_days"), col("s_stat"),
            col("var18"), col("z_micro"))
          .orderBy("event_type")
      },
      Some(s"""WITH $dailyCentsSql,
             |s AS (SELECT a.event_type,
             |    CAST(sum(CASE WHEN b.v > a.v THEN 1
             |                  WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.day < b.day
             |  GROUP BY 1),
             |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
             |  FROM daily GROUP BY 1),
             |ties AS (SELECT event_type,
             |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
             |  FROM (SELECT event_type, v, count(*) AS t
             |        FROM daily GROUP BY 1, 2) WHERE t > 1 GROUP BY 1),
             |f AS (SELECT nd.event_type, nd.n_days,
             |    coalesce(s.s_stat, 0) AS s_stat,
             |    CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
             |      - coalesce(t.tie18, 0) AS BIGINT) AS var18
             |  FROM nd LEFT JOIN s USING (event_type)
             |  LEFT JOIN ties t USING (event_type))
             |SELECT event_type, n_days, CAST(s_stat AS BIGINT) AS s_stat, var18,
             |  CAST(CASE WHEN var18 <= 0 OR s_stat = 0 THEN 0
             |    WHEN s_stat > 0 THEN floor(
             |      (s_stat - 1) / sqrt(var18 / 18.0) * 1000000.0 + 0.5)
             |    ELSE floor(
             |      (s_stat + 1) / sqrt(var18 / 18.0) * 1000000.0 + 0.5)
             |    END AS BIGINT) AS z_micro
             |FROM f ORDER BY event_type""".stripMargin))
  )

  /** The daily integer-cents frame shared by w12 (Theil–Sen) and w13
    * (Mann–Kendall) — one helper, one SQL CTE, the d15 no-drift rule:
    * per-event values quantize to cents BEFORE the day sum (w09's
    * discipline). */
  private def dailyCents(s: SparkSession, dir: String) =
    Tables(s, dir).events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("v"))

  /** DuckDB twin of [[dailyCents]] — the `daily` CTE. */
  private def dailyCentsSql: String =
    """daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin
}
