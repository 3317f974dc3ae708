package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.BloomPrune
import graft.tables.Tables

/**
 * Queries exercising graft's plan-level operators: the grouped top-k
 * whole-operator (`graft.plans.TopK`) and bloom-filter join pruning
 * (`graft.ops.BloomPrune`), plus the two remaining classic TPC-H join
 * shapes (Q8 market share, Q20 supplier threshold).
 */
object PlanQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "k01_topk_per_group",
      (s, dir) => {
        // Native grouped top-k: top-3 orders by price per priority
        // class, via the custom LogicalPlan/Strategy/Exec pipeline —
        // the oracle is the row_number window it replaces.
        graft.plans.TopK.perGroup(
          Tables(s, dir).orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
          Seq(col("o_orderpriority")), col("o_totalprice"), col("o_orderkey"), k = 3)
          .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice
             |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_orderpriority
             |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin)),

    Q(
      "k02_salted_join",
      (s, dir) => {
        // Skew-salted fact⋈dim join: the big side's rows are spread
        // over `salt` sub-keys and the small side is replicated once
        // per sub-key, so one hot order key becomes 8 evenly-sized
        // shuffle partitions instead of one straggler task. Result is
        // identical to the plain join (oracle below IS the plain join).
        val t = Tables(s, dir)
        val big = t.lineitem.select(col("l_orderkey").as("orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        val small = t.orders.select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
        graft.ops.Skew.saltedJoin(big, small, "orderkey", salt = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), fround(sum(col("rev")), 2).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q(
      "q08_market_share",
      (s, dir) => {
        // TPC-H Q8 shape: NATION_3's share of ECONOMY-part volume sold
        // to AMERICA customers, by order year. Dims broadcast; the two
        // nation roles are separate broadcast copies.
        val t = Tables(s, dir)
        val volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val america = t.region.filter(col("r_name") === "AMERICA").select("r_regionkey")
        val custNation = t.nation.select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
        val suppNation = t.nation.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        t.lineitem
          .join(broadcast(t.part.filter(col("p_type") === "ECONOMY").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(t.orders.filter(col("o_orderdate").between("1995-01-01", "1996-12-31"))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          // the narrow (key, nationkey) customer projection is a
          // 12 B/row dimension — broadcast explicitly: at 10× the
          // auto-threshold flipped it to a sort-merge that re-sorted
          // the whole lineitem⋈orders intermediate
          .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
          .join(broadcast(america), col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .select(year(col("o_orderdate")).as("o_year"), volume.as("volume"), col("supp_nation"))
          .groupBy("o_year")
          .agg(fround(
            sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(lit(0.0)))
              / sum(col("volume")), 4).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT year(o_orderdate) AS o_year,
             |  floor(sum(CASE WHEN n2.n_name = 'NATION_3'
             |                 THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
             |    / sum(l_extendedprice * (1.0 - l_discount)) * 10000.0 + 0.5) / 10000.0 AS mkt_share
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
             |  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
             |GROUP BY 1 ORDER BY o_year""".stripMargin)),

    Q(
      "r01_range_join",
      (s, dir) => {
        // Binned range join: lineitems whose extended price falls in a
        // ±5% band of a sampled part's retail price, counted per part.
        // Plain BETWEEN with no equi-key would plan as a nested-loop
        // join; the binning makes it an equi-join on the bin.
        val t = Tables(s, dir)
        val bands = t.part.filter(pmod(col("p_partkey"), lit(50)) === 0)
          .select(col("p_partkey"),
            (col("p_retailprice") * 0.95).as("lo"),
            (col("p_retailprice") * 1.05).as("hi"))
        graft.ops.RangeJoin.pointInInterval(
          t.lineitem.select("l_extendedprice"), "l_extendedprice",
          bands, "lo", "hi", binWidth = 100.0)
          .groupBy("p_partkey").agg(count(lit(1)).as("cnt"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, count(*) AS cnt
             |FROM part JOIN lineitem
             |  ON l_extendedprice BETWEEN p_retailprice * 0.95 AND p_retailprice * 1.05
             |WHERE p_partkey % 50 = 0
             |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin)),

    Q(
      "r02_interval_overlap",
      (s, dir) => {
        // Interval×interval overlap via the binned equi-join: price
        // bands of two part samples that intersect. A bare overlap
        // predicate has no equi-key and would plan as a nested loop.
        val t = Tables(s, dir)
        val a = t.part.filter(pmod(col("p_partkey"), lit(50)) === 0)
          .select(col("p_partkey").as("a_key"),
            (col("p_retailprice") * 0.95).as("a_lo"),
            (col("p_retailprice") * 1.05).as("a_hi"))
        val b = t.part.filter(pmod(col("p_partkey"), lit(30)) === 0)
          .select(col("p_partkey").as("b_key"),
            (col("p_retailprice") * 0.97).as("b_lo"),
            (col("p_retailprice") * 1.03).as("b_hi"))
        graft.ops.RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
          binWidth = 100.0)
          .select("a_key", "b_key")
          .orderBy("a_key", "b_key")
      },
      Some("""SELECT a.p_partkey AS a_key, b.p_partkey AS b_key
             |FROM part a JOIN part b
             |  ON a.p_retailprice * 0.95 <= b.p_retailprice * 1.03
             | AND b.p_retailprice * 0.97 <= a.p_retailprice * 1.05
             |WHERE a.p_partkey % 50 = 0 AND b.p_partkey % 30 = 0
             |ORDER BY a_key, b_key""".stripMargin)),

    Q(
      "r03_fuzzy_join",
      (s, dir) => {
        // Edit-distance-1 self-join on customer names (entity
        // resolution): the symmetric-delete signature turns the
        // no-equi-key levenshtein predicate into an equi-join on
        // deletion keys with the exact DP recheck on candidates only —
        // a nested loop would run |C|² DPs. Zero-padded names differing
        // in one digit are exactly the planted near-matches.
        val t = Tables(s, dir)
        val c = t.customer.select("c_custkey", "c_name")
        graft.ops.FuzzyJoin.edJoin1(
          c.toDF("id_a", "name_a"), "id_a", "name_a",
          c.toDF("id_b", "name_b"), "id_b", "name_b")
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
             |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
             |WHERE levenshtein(a.c_name, b.c_name) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    Q(
      "r04_fuzzy_join_ed2",
      (s, dir) => {
        // Edit-distance-2 self-join (edJoin2): the budget real
        // person/org-name entity resolution needs — one typo is not
        // enough. Radius-2 symmetric-delete signatures (identity +
        // |s| single + C(|s|,2) double deletions) make the
        // no-equi-key predicate an equi-join on (key, id) pairs —
        // ids only, strings re-join AFTER the candidate distinct —
        // with Spark's banded levenshtein(l, r, 2) recheck on
        // candidate pairs (radius-2 keys admit true distances up to
        // 4, so the DP is load-bearing here). Every 7th customer:
        // zero-padded names make the ED-2 neighborhood DENSE (any
        // two digit substitutions match), so thinning keeps the
        // planted-match count linear in SF instead of quadratic in
        // digit-group density — coverage still spans the whole id
        // range at every SF.
        val t = Tables(s, dir)
        val c = t.customer.filter(col("c_custkey") % 7 === 0)
          .select("c_custkey", "c_name")
        graft.ops.FuzzyJoin.edJoin2(
          c.toDF("id_a", "name_a"), "id_a", "name_a",
          c.toDF("id_b", "name_b"), "id_b", "name_b")
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
             |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
             |WHERE a.c_custkey % 7 = 0 AND b.c_custkey % 7 = 0
             |  AND levenshtein(a.c_name, b.c_name) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    Q(
      "r05_entity_clusters",
      (s, dir) => {
        // Entity-resolution CAPSTONE over part names: resolve the
        // DISTINCT VALUE SPACE first (the MDM blocking discipline —
        // and the 100 TB shape: the fuzzy machinery runs on the
        // vocabulary-sized frame, records map back via one keys-only
        // aggregate), then r03's ED-1 symmetric-delete join produces
        // match pairs among distinct names, connected components
        // merges transitive matches into entities (A~B, B~C ⇒ one
        // entity even when ED(A,C)=2), and every name — matched or
        // not — lands in an entity via coalesce(component, own id).
        // The component label converges to the cluster-min id, so the
        // canonical name is one id-equi join back to the record of
        // the label itself. Identical spellings collapse in the
        // census (ED-0), near-spellings via the join — the published
        // table is entities × (variant count, record count, name).
        val t = Tables(s, dir)
        val p = t.part.select(col("p_partkey").as("id"), col("p_name").as("name"))
        val names = p.groupBy("name")
          .agg(min("id").as("id"), count(lit(1)).as("n_recs"))
        val pairs = graft.ops.FuzzyJoin.edJoin1(
          names.select(col("id").as("id_a"), col("name").as("name_a")), "id_a", "name_a",
          names.select(col("id").as("id_b"), col("name").as("name_b")), "id_b", "name_b")
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
        val labels = graft.ops.Dedup.connectedComponents(pairs)
        names.join(labels, Seq("id"), "left")
          .select(coalesce(col("component"), col("id")).as("entity_id"),
            col("n_recs"))
          .groupBy("entity_id")
          .agg(count(lit(1)).as("n_variants"), sum("n_recs").as("n_members"))
          .join(names.select(col("id").as("entity_id"),
            col("name").as("canonical_name")), "entity_id")
          .select("entity_id", "n_variants", "n_members", "canonical_name")
          .orderBy("entity_id")
      },
      Some("""WITH RECURSIVE names AS (
             |  SELECT p_name AS name, min(p_partkey) AS id, count(*) AS n_recs
             |  FROM part GROUP BY 1),
             |pairs AS (
             |  SELECT a.id AS id_a, b.id AS id_b
             |  FROM names a JOIN names b ON a.id < b.id
             |  WHERE levenshtein(a.name, b.name) <= 1),
             |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |        UNION ALL SELECT id_b, id_a FROM pairs),
             |cc AS (
             |  SELECT DISTINCT src AS id, src AS lbl FROM sym
             |  UNION
             |  SELECT s.src, cc.lbl FROM sym s JOIN cc ON s.dst = cc.id),
             |lbl AS (SELECT id, min(lbl) AS comp FROM cc GROUP BY id),
             |ent AS (SELECT n.id, n.n_recs, coalesce(l.comp, n.id) AS entity_id
             |  FROM names n LEFT JOIN lbl l ON l.id = n.id),
             |rolled AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_variants,
             |    CAST(sum(n_recs) AS BIGINT) AS n_members
             |  FROM ent GROUP BY 1)
             |SELECT r.entity_id, r.n_variants, r.n_members,
             |  n.name AS canonical_name
             |FROM rolled r JOIN names n ON n.id = r.entity_id
             |ORDER BY entity_id""".stripMargin)),

    Q(
      "l13_constraint_audit",
      (s, dir) => {
        // Deequ-style CONSTRAINT audit (the data-quality gate every
        // production table runs beside l11's statistics): primary-key
        // uniqueness, foreign-key orphans, non-null, and value-range
        // checks over an orders snapshot, reported as one
        // (check_name, violations) table. The clean corpus would
        // trivially report zeros, so the audited snapshot carries
        // l07's deterministic-mutation trick: %83 keys point their
        // custkey at -1 (orphans), %97 null their date, %101 negate
        // their price, %89 rows appear twice (pk dups) — each check
        // must count exactly its planted class. Scale: pk check is a
        // keys-only count aggregate, fk check a keys-only anti-join
        // (broadcastable dim), null/range narrow scans — four
        // map-side-combinable passes, 1-row frames unioned.
        val t = Tables(s, dir)
        val o = t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val m = o.select(
            col("o_orderkey"),
            when(col("o_orderkey") % 83 === 0, lit(-1L))
              .otherwise(col("o_custkey")).as("o_custkey"),
            when(col("o_orderkey") % 97 === 0, lit(null).cast("timestamp"))
              .otherwise(col("o_orderdate")).as("o_orderdate"),
            when(col("o_orderkey") % 101 === 0, -col("o_totalprice"))
              .otherwise(col("o_totalprice")).as("o_totalprice"))
          .union(o.filter(col("o_orderkey") % 89 === 0))
        val ck = t.customer.select(col("c_custkey"))
        def row(name: String, v: org.apache.spark.sql.DataFrame) =
          v.select(lit(name).as("check_name"), col("v").cast("long").as("violations"))
        row("fk_orphans_o_custkey",
            m.join(ck, m("o_custkey") === ck("c_custkey"), "left_anti")
              .agg(count(lit(1)).as("v")))
          .unionAll(row("not_null_o_orderdate",
            m.filter(col("o_orderdate").isNull).agg(count(lit(1)).as("v"))))
          .unionAll(row("pk_unique_o_orderkey",
            m.groupBy("o_orderkey").count().filter(col("count") > 1)
              .agg(count(lit(1)).as("v"))))
          .unionAll(row("range_o_totalprice",
            m.filter(col("o_totalprice") < 0).agg(count(lit(1)).as("v"))))
          .orderBy("check_name")
      },
      Some("""WITH m AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 83 = 0 THEN -1 ELSE o_custkey END AS o_custkey,
             |    CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate,
             |    CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
             |  FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
             |  FROM orders WHERE o_orderkey % 89 = 0)
             |SELECT * FROM (
             |  SELECT 'fk_orphans_o_custkey' AS check_name,
             |    CAST(count(*) AS BIGINT) AS violations
             |  FROM m WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
             |  UNION ALL
             |  SELECT 'not_null_o_orderdate', CAST(count(*) AS BIGINT)
             |  FROM m WHERE o_orderdate IS NULL
             |  UNION ALL
             |  SELECT 'pk_unique_o_orderkey', CAST(count(*) AS BIGINT)
             |  FROM (SELECT 1 FROM m GROUP BY o_orderkey HAVING count(*) > 1)
             |  UNION ALL
             |  SELECT 'range_o_totalprice', CAST(count(*) AS BIGINT)
             |  FROM m WHERE o_totalprice < 0)
             |ORDER BY check_name""".stripMargin)),

    Q(
      "l01_layout_prune",
      (s, dir) => {
        // §2.8 layout surface, driver-visible: write lineitem
        // partitioned by returnflag and z-ordered on (quantity, price),
        // read it back with a multi-column predicate, return the
        // filtered aggregate. Relayout moves rows, never changes them,
        // so the oracle computes the same aggregate straight from the
        // source table; what the layout buys lives in the read plan —
        // the returnflag predicate prunes whole directories at planning
        // time and the z-clustering gives each file a small
        // (qty, price) bounding box so row-group stats skip most files
        // (both plan effects asserted in LayoutSpec).
        val t = Tables(s, dir)
        val path = s"${sys.props("java.io.tmpdir")}/graft_l01_${math.abs(dir.hashCode)}"
        graft.ops.Layout.writePartitionedZOrdered(
          t.lineitem.select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"), col("l_orderkey")),
          path, "l_returnflag",
          Seq(("l_quantity", 0.0, 55.0), ("l_extendedprice", 0.0, 120000.0)),
          files = 16)
        s.read.parquet(path)
          .filter(col("l_returnflag").isin("A", "R") &&
            col("l_quantity").between(10.0, 20.0) &&
            col("l_extendedprice").between(20000.0, 40000.0))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("cnt"), fround(sum("l_extendedprice"), 2).as("revenue"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM lineitem
             |WHERE l_returnflag IN ('A', 'R')
             |  AND l_quantity BETWEEN 10.0 AND 20.0
             |  AND l_extendedprice BETWEEN 20000.0 AND 40000.0
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q(
      "l04_orc_source",
      (s, dir) => {
        // §2.8 source-format coverage beyond parquet/CSV: ORC as a
        // native interchange sink/source. An orders slice is persisted
        // through Spark's ORC writer sorted within files by
        // o_orderdate (tight per-stripe min/max), then read back with
        // a year predicate + 3-column projection — both reach the ORC
        // scan (PushedFilters / ReadSchema, asserted in LayoutSpec).
        // Relayout to another FORMAT moves rows, never changes them,
        // so the oracle computes the identical aggregate from the
        // parquet source table.
        val t = Tables(s, dir)
        val path = s"${sys.props("java.io.tmpdir")}/graft_l04_${math.abs(dir.hashCode)}"
        t.orders.select("o_orderkey", "o_orderdate", "o_totalprice")
          .sortWithinPartitions("o_orderdate")
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1996-01-01"))
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            fround(sum("o_totalprice"), 2).as("revenue"))
          .orderBy("month")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |  count(*) AS n_orders,
             |  floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM orders
             |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
             |GROUP BY month ORDER BY month""".stripMargin)),

    Q(
      "l06_jsonl_roundtrip",
      (s, dir) => {
        // §2.8 source-format coverage: JSON-lines as interchange
        // sink/source (the crawl-dump format every corpus pipeline
        // ingests). A documents slice round-trips through Spark's JSON
        // writer/reader with an EXPLICIT schema on read (schema
        // inference is a second full scan and type-unstable — never at
        // 100 TB); text fidelity is proven by re-deriving n_chars from
        // the round-tripped text, which must equal the stored column
        // the oracle reads from parquet.
        val t = Tables(s, dir)
        val path = s"${sys.props("java.io.tmpdir")}/graft_l06_${math.abs(dir.hashCode)}"
        t.documents.filter(col("doc_id") < 200)
          .select("doc_id", "text", "lang", "source")
          .write.mode("overwrite").json(path)
        s.read.schema("doc_id LONG, text STRING, lang STRING, source STRING")
          .json(path)
          .select(col("doc_id"), col("lang"), col("source"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, length(text) AS n_chars
             |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    Q(
      "l07_snapshot_diff",
      (s, dir) => {
        // Dimension snapshot DIFF (the CDC / SCD / merge-ingest
        // primitive): yesterday's customer dimension vs a
        // deterministically mutated today — %11 keys deleted, %7 keys
        // rebalanced (+100), %13 keys re-inserted under shifted ids —
        // classified inserted/deleted/changed by whole-row struct
        // comparison through one key-equi full outer join (bucket both
        // snapshots on the key and it is exchange-free, l02's layout).
        // The unchanged majority filters out before anything else.
        val t = Tables(s, dir)
        val old = t.customer
        val mutated = old.filter(col("c_custkey") % 11 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100)
              .otherwise(col("c_acctbal")))
        val inserts = old.filter(col("c_custkey") % 13 === 0)
          .withColumn("c_custkey", col("c_custkey") + 2000000)
        graft.ops.Layout.snapshotDiff(old, mutated.unionByName(inserts), "c_custkey")
          .filter(col("action") =!= "unchanged")
          .select(col("c_custkey"), col("action"),
            fround(col("old_row.c_acctbal"), 2).as("old_bal"),
            fround(col("new_row.c_acctbal"), 2).as("new_bal"))
          .orderBy("c_custkey")
      },
      Some("""WITH nw AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
             |         ELSE c_acctbal END AS c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 11 <> 0
             |  UNION ALL
             |  SELECT c_custkey + 2000000, c_name, c_nationkey, c_acctbal,
             |    c_mktsegment FROM customer WHERE c_custkey % 13 = 0),
             |d AS (SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             |    CASE WHEN o.c_custkey IS NULL THEN 'inserted'
             |         WHEN n.c_custkey IS NULL THEN 'deleted'
             |         WHEN (o.c_name, o.c_nationkey, o.c_acctbal, o.c_mktsegment)
             |           <> (n.c_name, n.c_nationkey, n.c_acctbal, n.c_mktsegment)
             |           THEN 'changed'
             |         ELSE 'unchanged' END AS action,
             |    o.c_acctbal AS ob, n.c_acctbal AS nb
             |  FROM customer o FULL OUTER JOIN nw n ON o.c_custkey = n.c_custkey)
             |SELECT c_custkey, action,
             |  floor(ob * 100.0 + 0.5) / 100.0 AS old_bal,
             |  floor(nb * 100.0 + 0.5) / 100.0 AS new_bal
             |FROM d WHERE action <> 'unchanged'
             |ORDER BY c_custkey""".stripMargin)),

    Q(
      "l08_merge_apply",
      (s, dir) => {
        // The APPLY half of l07's CDC primitive: the same deterministic
        // dimension mutation (%11 deleted, %7 rebalanced, %13
        // re-inserted shifted) is diffed, the change set and the old
        // snapshot are WRITTEN BUCKETED on the key (l02's layout), and
        // `Layout.applyDiff` merges them — one keys-only anti-join plus
        // a union, exchange-free under the co-bucketed layout (plan
        // asserted in LayoutSpec with broadcast disabled). The oracle
        // recomputes the merged state straight from the raw table: a
        // correct merge reproduces today's snapshot exactly, row for
        // row — the diff/apply round-trip is the identity.
        val t = Tables(s, dir)
        Seq("graft_l08_old", "graft_l08_changes").foreach { tbl =>
          s.sql(s"DROP TABLE IF EXISTS $tbl")
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), tbl)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
        val old = t.customer
        val mutated = old.filter(col("c_custkey") % 11 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100)
              .otherwise(col("c_acctbal")))
        val inserts = old.filter(col("c_custkey") % 13 === 0)
          .withColumn("c_custkey", col("c_custkey") + 2000000)
        val diff = graft.ops.Layout
          .snapshotDiff(old, mutated.unionByName(inserts), "c_custkey")
          .filter(col("action") =!= "unchanged")
          .select("c_custkey", "action", "new_row")
        graft.ops.Layout.writeBucketed(old, "graft_l08_old",
          "c_custkey", buckets = 8)
        graft.ops.Layout.writeBucketed(diff, "graft_l08_changes",
          "c_custkey", buckets = 8)
        graft.ops.Layout.applyDiff(s.table("graft_l08_old"),
            s.table("graft_l08_changes"), "c_custkey")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            fround(col("c_acctbal"), 2).as("acctbal"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
             |  floor(c_acctbal * 100.0 + 0.5) / 100.0 AS acctbal,
             |  c_mktsegment
             |FROM (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
             |         ELSE c_acctbal END AS c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 11 <> 0
             |  UNION ALL
             |  SELECT c_custkey + 2000000, c_name, c_nationkey, c_acctbal,
             |    c_mktsegment FROM customer WHERE c_custkey % 13 = 0)
             |ORDER BY c_custkey""".stripMargin)),

    Q(
      "l09_csv_source",
      (s, dir) => {
        // §2.8 source-format coverage, CSV leg (the flat-file
        // interchange format; the reference's own Airfoil flow ingests
        // CSV — ref examples/Airfoil.scala): a documents slice
        // round-trips through Spark's CSV writer/reader. The text is
        // first salted with a delimiter-bearing suffix (comma +
        // escaped double-quote) so the round-trip actually exercises
        // RFC-4180 quoting/escaping, not just happy-path tokens; the
        // reader gets an EXPLICIT schema (inference = a second full
        // scan, type-unstable at 100 TB) and the default single-line
        // mode, which keeps the files SPLITTABLE — embedded newlines
        // would force multiLine=true and one-task-per-file parsing, so
        // a production corpus escapes them at write time. Fidelity is
        // proven by re-deriving the char count from the round-tripped
        // salted text against the parquet-read oracle.
        val t = Tables(s, dir)
        val path = s"${sys.props("java.io.tmpdir")}/graft_l09_${math.abs(dir.hashCode)}"
        t.documents.filter(col("doc_id") < 200)
          .select(col("doc_id"),
            concat(col("text"), lit(",\"")).as("text"),
            col("lang"), col("source"))
          .write.mode("overwrite")
          .option("header", "true").option("escape", "\"")
          .csv(path)
        s.read.schema("doc_id LONG, text STRING, lang STRING, source STRING")
          .option("header", "true").option("escape", "\"")
          .csv(path)
          .select(col("doc_id"), col("lang"), col("source"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, length(text) + 2 AS n_chars
             |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    Q(
      "l02_bucketed_incremental",
      (s, dir) => {
        // dc02's documented 100 TB layout made real: both snapshot
        // key-sets are WRITTEN bucketed on the dedup key, so the daily
        // anti-join reads co-bucketed tables and plans with no exchange
        // on either side (the exchange-free property is asserted in
        // LayoutSpec with broadcast disabled; at this SF the dim side
        // may broadcast — same result). Result = dc02's survivors,
        // independently hash-checked.
        import graft.tables.Tables
        // a managed table whose LOCATION survives from a previous
        // session (in-memory catalog, on-disk warehouse) blocks
        // saveAsTable(Overwrite) — drop catalog entry AND location
        Seq("graft_l02_old", "graft_l02_batch").foreach { tbl =>
          s.sql(s"DROP TABLE IF EXISTS $tbl")
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), tbl)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
        val normText = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "  +", " "))
        val keyed = Tables(s, dir).documents
          .select(col("doc_id"), md5(normText.cast("binary")).as("k"))
        graft.ops.Layout.writeBucketed(
          keyed.where(pmod(col("doc_id"), lit(5)) =!= 0).select("k").distinct(),
          "graft_l02_old", "k", buckets = 8)
        graft.ops.Layout.writeBucketed(
          keyed.where(pmod(col("doc_id"), lit(5)) === 0)
            .groupBy("k").agg(min("doc_id").as("doc_id")),
          "graft_l02_batch", "k", buckets = 8)
        s.table("graft_l02_batch")
          .join(s.table("graft_l02_old"), Seq("k"), "left_anti")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH keyed AS (SELECT doc_id,
             |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             |      '  +', ' ', 'g'))) AS k
             |  FROM documents),
             |old AS (SELECT DISTINCT k FROM keyed WHERE doc_id % 5 <> 0),
             |batch AS (SELECT k, min(doc_id) AS doc_id FROM keyed WHERE doc_id % 5 = 0
             |  GROUP BY k)
             |SELECT doc_id FROM batch WHERE k NOT IN (SELECT k FROM old)
             |ORDER BY doc_id""".stripMargin)),

    Q(
      "q20_bloom_semijoin",
      (s, dir) => {
        // TPC-H Q20 shape: suppliers who shipped > 100 units of 'red%'
        // parts in 1997. The lineitem scan is pre-pruned by a broadcast
        // bloom filter on the qualifying part keys — the exact
        // broadcast join afterwards removes false positives, so the
        // result is identical to the unpruned plan while only the
        // matching fraction of lineitem reaches the join/aggregate.
        val t = Tables(s, dir)
        val redParts = t.part.filter(col("p_name").like("red%")).select("p_partkey")
        BloomPrune.filterByKeys(
          t.lineitem.filter(year(col("l_shipdate")) === 1997)
            .select("l_partkey", "l_suppkey", "l_quantity"),
          "l_partkey", redParts, "p_partkey", expectedKeys = 100000L)
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey")
          .agg(sum("l_quantity").as("qty"))
          .filter(col("qty") > 100.0)
          .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), fround(col("qty"), 2).as("qty"))
          .orderBy("s_name")
      },
      Some("""SELECT s_name, floor(qty * 100.0 + 0.5) / 100.0 AS qty
             |FROM (SELECT l_suppkey, sum(l_quantity) AS qty
             |      FROM lineitem JOIN part ON l_partkey = p_partkey
             |      WHERE p_name LIKE 'red%' AND year(l_shipdate) = 1997
             |      GROUP BY l_suppkey HAVING sum(l_quantity) > 100.0)
             |JOIN supplier ON l_suppkey = s_suppkey
             |ORDER BY s_name""".stripMargin)),

    Q(
      "l03_ann_layout",
      (s, dir) => {
        // The ANN index AS STORAGE LAYOUT: a05's IVF cell becomes a
        // parquet PARTITION column, so probing is planning-time
        // directory pruning — a cold ANN query reads nprobe partitions,
        // not the corpus (at 100 TB: cells ≫ nprobe, the scan touches
        // nprobe/cells of the data; here 16 cells make the effect
        // visible, not dramatic). The probed cell set is model-sized
        // (queries × nprobe ids) and lands in the filter as literals;
        // rerank is a05's exact heap machinery, so results — and the
        // oracle — are IDENTICAL to a05: relayout moves rows, never
        // changes them (l01's contract).
        import graft.functions.VectorExpressions.{cellArgmin, cellProbes, cosine, topKByScore}
        val e = Tables(s, dir).embeddings
        val centers = e.filter(col("vec_id") >= 10 && col("vec_id") < 26)
          .orderBy("vec_id")
          .select(col("embedding").cast("array<double>"))
          .collect().map(_.getSeq[Double](0).toArray)
        val path = s"${sys.props("java.io.tmpdir")}/graft_l03_${math.abs(dir.hashCode)}"
        e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("neighbor_id"),
            col("embedding").cast("array<double>").as("cv"))
          .withColumn("cell", cellArgmin(col("cv"), centers))
          .write.mode("overwrite").partitionBy("cell").parquet(path)
        val probes = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"),
            col("embedding").cast("array<double>").as("qv"))
          .withColumn("cell", explode(cellProbes(col("qv"), centers, 6)))
        val probedCells = probes.select("cell").distinct()
          .collect().map(_.getInt(0)).sorted // model-sized: ≤ queries×nprobe
        s.read.parquet(path)
          .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
          .join(broadcast(probes), Seq("cell"))
          .select(col("query_id"), col("neighbor_id"),
            cosine(col("qv"), col("cv")).as("cos"))
          .groupBy("query_id")
          .agg(topKByScore(col("neighbor_id"), col("cos"), 5).as("topk"))
          .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
          .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
            col("nb.id").as("neighbor_id"), fround(col("nb.score"), 4).as("cos"))
          .orderBy("query_id", "rank")
      },
      // a05's oracle verbatim: the layout cannot change the answer
      Some(AnnOracle)),

    Q(
      "l10_ann_incremental",
      (s, dir) => {
        // INCREMENTAL maintenance of l03's ANN-as-layout index (the
        // daily-arrivals story dc02/dc03 tell for dedup, told for the
        // vector index): yesterday's index holds 3/4 of the corpus
        // partitioned by IVF cell; today's arrivals are assigned cells
        // by the SAME frozen broadcast centroids (one narrow map over
        // the arrivals only) and APPENDED into the existing cell
        // directories. The base corpus is never read, rewritten, or
        // shuffled — maintenance is O(arrivals), and at 100 TB the
        // daily cost is the delta's size, not the index's. Probing the
        // merged table must answer EXACTLY as if the index had been
        // built whole (l03/a05's answer — the oracle is byte-identical
        // to l03's), because per-vector cell assignment is
        // deterministic and order-free: append-then-probe ≡
        // build-whole-then-probe.
        import graft.functions.VectorExpressions.{cellArgmin, cellProbes, cosine, topKByScore}
        val e = Tables(s, dir).embeddings
        val centers = e.filter(col("vec_id") >= 10 && col("vec_id") < 26)
          .orderBy("vec_id")
          .select(col("embedding").cast("array<double>"))
          .collect().map(_.getSeq[Double](0).toArray)
        val path = s"${sys.props("java.io.tmpdir")}/graft_l10_${math.abs(dir.hashCode)}"
        val corpus = e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("neighbor_id"),
            col("embedding").cast("array<double>").as("cv"))
          .withColumn("cell", cellArgmin(col("cv"), centers))
        // yesterday's index: 3/4 of the corpus, built whole
        corpus.filter(col("neighbor_id") % 4 =!= 0)
          .write.mode("overwrite").partitionBy("cell").parquet(path)
        // today's delta: assigned by the frozen centroids, appended
        corpus.filter(col("neighbor_id") % 4 === 0)
          .write.mode("append").partitionBy("cell").parquet(path)
        val probes = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"),
            col("embedding").cast("array<double>").as("qv"))
          .withColumn("cell", explode(cellProbes(col("qv"), centers, 6)))
        val probedCells = probes.select("cell").distinct()
          .collect().map(_.getInt(0)).sorted // model-sized: ≤ queries×nprobe
        s.read.parquet(path)
          .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
          .join(broadcast(probes), Seq("cell"))
          .select(col("query_id"), col("neighbor_id"),
            cosine(col("qv"), col("cv")).as("cos"))
          .groupBy("query_id")
          .agg(topKByScore(col("neighbor_id"), col("cos"), 5).as("topk"))
          .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
          .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
            col("nb.id").as("neighbor_id"), fround(col("nb.score"), 4).as("cos"))
          .orderBy("query_id", "rank")
      },
      // l03's oracle verbatim: incremental append ≡ whole build
      Some(AnnOracle)),

    Q(
      "l14_ann_tombstones",
      (s, dir) => {
        // DELETION support for the ANN-as-layout index — the vector-DB
        // lifecycle leg l10's appends left open (GDPR erasure, content
        // takedowns, re-crawl invalidation): deletes land as an
        // ids-only TOMBSTONE SET, the live index stays immutable, and
        // every probe masks tombstoned rows with one broadcast
        // anti-join (O(deletes) memory, zero index rewrite — the
        // LSM/Lucene delete posture). When the tombstone fraction
        // justifies it, COMPACTION rewrites only the affected cell
        // partitions minus their dead rows and the mask drops. The
        // query probes BOTH phases — masked-live and compacted — and
        // emits both under a phase column: they must agree row-for-row
        // with the delete-aware oracle (relayout and masking never
        // change the answer, l01's contract; quantizer centroids stay
        // frozen — deletion doesn't retrain, a17 gauges staleness).
        import graft.functions.VectorExpressions.{cellArgmin, cellProbes, cosine, topKByScore}
        val e = Tables(s, dir).embeddings
        val centers = e.filter(col("vec_id") >= 10 && col("vec_id") < 26)
          .orderBy("vec_id")
          .select(col("embedding").cast("array<double>"))
          .collect().map(_.getSeq[Double](0).toArray)
        // per-run unique scratch (the l12 discipline), cleaned on exit
        val base = java.nio.file.Files
          .createTempDirectory("graft_l14_").toString
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          deleteRecursively(base)))
        val live = s"$base/live"
        val compacted = s"$base/compact"
        e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("neighbor_id"),
            col("embedding").cast("array<double>").as("cv"))
          .withColumn("cell", cellArgmin(col("cv"), centers))
          .write.mode("overwrite").partitionBy("cell").parquet(live)
        val tombstones = e.filter(col("vec_id") >= 10 && col("vec_id") % 7 === 0)
          .select(col("vec_id").as("neighbor_id"))
        val probes = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"),
            col("embedding").cast("array<double>").as("qv"))
          .withColumn("cell", explode(cellProbes(col("qv"), centers, 6)))
        val probedCells = probes.select("cell").distinct()
          .collect().map(_.getInt(0)).sorted // model-sized: ≤ queries×nprobe
        def search(idx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = idx
          .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
          .join(broadcast(probes), Seq("cell"))
          .select(col("query_id"), col("neighbor_id"),
            cosine(col("qv"), col("cv")).as("cos"))
          .groupBy("query_id")
          .agg(topKByScore(col("neighbor_id"), col("cos"), 5).as("topk"))
          .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
          .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
            col("nb.id").as("neighbor_id"), fround(col("nb.score"), 4).as("cos"))
        val masked = search(s.read.parquet(live)
          .join(broadcast(tombstones), Seq("neighbor_id"), "left_anti"))
        // compaction: rewrite cells minus dead rows, then probe unmasked
        s.read.parquet(live)
          .join(broadcast(tombstones), Seq("neighbor_id"), "left_anti")
          .write.mode("overwrite").partitionBy("cell").parquet(compacted)
        val post = search(s.read.parquet(compacted))
        masked.select(lit("masked").as("phase"), col("*"))
          .unionByName(post.select(lit("compacted").as("phase"), col("*")))
          .orderBy("phase", "query_id", "rank")
      },
      // the delete-aware a05 replay, emitted once per phase: masking
      // the live index and probing the compacted one are the same query
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cents AS (SELECT vec_id - 10 AS cell, v AS cv FROM e
             |          WHERE vec_id >= 10 AND vec_id < 26),
             |assign AS (SELECT neighbor_id, v, cell FROM (
             |    SELECT c.vec_id AS neighbor_id, c.v, t.cell,
             |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
             |        list_sum(list_transform(list_zip(c.v, t.cv),
             |          p -> (p[1] - p[2]) * (p[1] - p[2]))), t.cell) AS rn
             |    FROM (SELECT * FROM e WHERE vec_id >= 10 AND vec_id % 7 <> 0) c,
             |      cents t)
             |  WHERE rn = 1),
             |probes AS (SELECT query_id, qv, cell FROM (
             |    SELECT q.vec_id AS query_id, q.v AS qv, t.cell,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_sum(list_transform(list_zip(q.v, t.cv),
             |          p -> (p[1] - p[2]) * (p[1] - p[2]))), t.cell) AS rn
             |    FROM (SELECT * FROM e WHERE vec_id < 10) q, cents t)
             |  WHERE rn <= 6),
             |hits AS (SELECT p.query_id, a.neighbor_id,
             |    list_sum(list_transform(list_zip(p.qv, a.v), x -> x[1] * x[2]))
             |      / (sqrt(list_sum(list_transform(p.qv, x -> x * x)))
             |         * sqrt(list_sum(list_transform(a.v, x -> x * x)))) AS cos
             |  FROM probes p JOIN assign a ON p.cell = a.cell),
             |res AS (SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id,
             |    floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
             |  FROM (SELECT query_id, neighbor_id, cos,
             |          row_number() OVER (PARTITION BY query_id
             |            ORDER BY cos DESC, neighbor_id) AS rn
             |        FROM hits)
             |  WHERE rn <= 5)
             |SELECT ph.phase, r.query_id, r.rank, r.neighbor_id, r.cos
             |FROM (SELECT unnest(['masked', 'compacted']) AS phase) ph
             |CROSS JOIN res r
             |ORDER BY phase, query_id, rank""".stripMargin)),

    Q(
      "l11_column_stats",
      (s, dir) => {
        // ANALYZE-style table statistics (the maintenance pass feeding
        // every cost-based planner: row counts, per-column null
        // counts, min/max bounds, NDV): ONE aggregate pass over
        // lineitem, unpivoted to a per-column stats row. Exact NDVs
        // ride Spark's multi-distinct Expand (one scan, 3× expand) for
        // the audit; the production path at 100 TB is the fixed-4 KB
        // HLL register estimate, gated here on l_partkey and
        // oracle-checked BIT-FOR-BIT via t10's register replay — the
        // approximation itself is under the hash gate, so "ANALYZE
        // with sketches" needs no exact pass to be trusted. Output is
        // columns-sized: this never returns data, only bounds.
        import graft.functions.VectorExpressions.{md5Hash52, hllDistinct}
        val li = Tables(s, dir).lineitem
        // TWO aggregates, not one: mixing the object-typed HLL
        // aggregate with multi-DISTINCT forces the whole plan off
        // hash aggregation onto a SortAggregate over the 4×-Expanded
        // rows (measured 7.2 s vs 1.0 s for this split at sf0.1).
        // Both results are 1-row frames; the crossJoin is a broadcast.
        val sketchSide = li.agg(
          count(lit(1)).as("n"),
          sum(when(col("l_orderkey").isNull, 1).otherwise(0)).cast("long").as("nulls_ok"),
          min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"),
          sum(when(col("l_partkey").isNull, 1).otherwise(0)).cast("long").as("nulls_pk"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          fround(hllDistinct(md5Hash52(col("l_partkey").cast("string"))), 2)
            .as("hll_pk"),
          sum(when(col("l_quantity").isNull, 1).otherwise(0)).cast("long").as("nulls_q"),
          min(col("l_quantity").cast("long")).as("min_q"),
          max(col("l_quantity").cast("long")).as("max_q"))
        val distinctSide = li.agg(
          countDistinct(col("l_orderkey")).as("ndv_ok"),
          countDistinct(col("l_partkey")).as("ndv_pk"),
          countDistinct(col("l_quantity").cast("long")).as("ndv_q"))
        sketchSide.crossJoin(broadcast(distinctSide))
          .select(expr("""stack(3,
            'l_orderkey', n, nulls_ok, min_ok, max_ok, ndv_ok, cast(null as double),
            'l_partkey',  n, nulls_pk, min_pk, max_pk, ndv_pk, hll_pk,
            'l_quantity', n, nulls_q, min_q, max_q, ndv_q, cast(null as double))
            as (col_name, n_rows, n_nulls, min_v, max_v, ndv, approx_ndv)"""))
          .orderBy("col_name")
      },
      // per-column aggregates + t10's HLL register replay for the
      // l_partkey estimate — the sketch value itself must hash-match
      Some("""WITH b AS (SELECT count(*) AS n,
             |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ok,
             |    min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
             |    count(DISTINCT l_orderkey) AS ndv_ok,
             |    CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_pk,
             |    min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
             |    count(DISTINCT l_partkey) AS ndv_pk,
             |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_q,
             |    min(CAST(l_quantity AS BIGINT)) AS min_q,
             |    max(CAST(l_quantity AS BIGINT)) AS max_q,
             |    count(DISTINCT CAST(l_quantity AS BIGINT)) AS ndv_q
             |  FROM lineitem),
             |hx AS (SELECT DISTINCT list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(13), j ->
             |        CAST(strpos('0123456789abcdef',
             |          substr(md5(CAST(l_partkey AS VARCHAR)), j + 1, 1)) - 1 AS BIGINT))),
             |      (a, c) -> a * 16 + c) AS x
             |  FROM lineitem WHERE l_partkey IS NOT NULL),
             |r AS (SELECT x % 4096 AS bkt,
             |    max(CASE WHEN (x // 4096) = 0 THEN 41
             |             ELSE 41 - length(bin(x // 4096)) END) AS reg
             |  FROM hx GROUP BY 1),
             |regs AS (SELECT t.range AS bkt, coalesce(r.reg, 0) AS reg
             |  FROM range(4096) t LEFT JOIN r ON r.bkt = t.range),
             |sm AS (SELECT
             |    list_sum(list_transform(list(reg ORDER BY bkt), g -> pow(2.0, -g))) AS z,
             |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v
             |  FROM regs),
             |est AS (SELECT
             |    CASE WHEN (0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 / z) <= 2.5 * 4096
             |           AND v > 0
             |         THEN 4096 * ln(4096 / v)
             |         ELSE 0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 / z END AS e
             |  FROM sm)
             |SELECT col_name, n AS n_rows, n_nulls, min_v, max_v, ndv, approx_ndv
             |FROM b CROSS JOIN est CROSS JOIN (VALUES
             |  ('l_orderkey', 0), ('l_partkey', 1), ('l_quantity', 2)) cols(col_name, i)
             |CROSS JOIN LATERAL (SELECT
             |    CASE i WHEN 0 THEN nulls_ok WHEN 1 THEN nulls_pk ELSE nulls_q END AS n_nulls,
             |    CASE i WHEN 0 THEN min_ok WHEN 1 THEN min_pk ELSE min_q END AS min_v,
             |    CASE i WHEN 0 THEN max_ok WHEN 1 THEN max_pk ELSE max_q END AS max_v,
             |    CASE i WHEN 0 THEN ndv_ok WHEN 1 THEN ndv_pk ELSE ndv_q END AS ndv,
             |    CASE i WHEN 1 THEN floor(e * 100.0 + 0.5) / 100.0
             |           ELSE CAST(NULL AS DOUBLE) END AS approx_ndv) v
             |ORDER BY col_name""".stripMargin)),

    Q(
      "l12_compaction",
      (s, dir) => {
        // Small-file COMPACTION under the gate (the maintenance pass
        // every long-lived table needs — each streaming micro-batch /
        // incremental append leaves files far below the scan-efficient
        // size, and at 100 TB open/metadata cost then dominates reads):
        // an orders slice is deliberately fragmented into 48 files,
        // then Layout.compactParquet rewrites it into ~targetBytes
        // outputs range-partitioned and sorted on o_orderdate —
        // compaction RESTORES date clustering (tight per-file min/max
        // for skipping) at the same time it fixes the file count
        // (planned count + row fidelity + re-sort asserted in
        // LayoutSpec). Relayout moves rows, never changes them, so the
        // gate reads the COMPACTED directory back under a date
        // predicate and the oracle computes the same aggregate from
        // the raw table.
        val t = Tables(s, dir)
        // per-RUN unique scratch root (not a hash of the data dir, which
        // can collide across dirs and RACES concurrent runs over the
        // same dir — one process deleting/rewriting $base while the
        // other's returned frame still lazily reads it), deleted on JVM
        // exit so repeated runs don't accumulate orders copies in tmpdir
        val base = java.nio.file.Files.createTempDirectory("graft_l12_")
          .toAbsolutePath.toString
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try deleteRecursively(base) catch { case _: Throwable => () }))
        val slice = t.orders
          .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        slice.repartition(48).write.mode("overwrite").parquet(s"$base/small")
        graft.ops.Layout.compactParquet(
          s, s"$base/small", s"$base/compact",
          targetBytes = 512L * 1024, sortCols = Seq("o_orderdate"))
        // compactParquet consumed the fragmented input eagerly — drop it
        // so repeated runs against distinct data dirs don't accumulate
        // orders copies in the tmpdir (the compacted dir must outlive
        // this function: the returned frame reads it lazily, l01's
        // lifecycle)
        deleteRecursively(s"$base/small")
        s.read.parquet(s"$base/compact")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
          .agg(count(lit(1)).as("cnt"),
            fround(sum("o_totalprice"), 2).as("revenue"))
      },
      Some("""SELECT count(*) AS cnt,
             |  floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'""".stripMargin)),

    Q(
      "k03_skew_stats",
      (s, dir) => {
        // The "should I salt?" diagnostic k02 acts on: the join key's
        // per-key-count distribution (cardinality, exact p50/p99, max,
        // hottest key) in one pass over key counts. The counts frame
        // feeds both the summary aggregate and the hot-key top-1
        // through ONE shared scan (InternalFrame.sharedScan — the
        // per-key aggregation runs once, not once per branch); both
        // branches reduce to 1-row frames joined by broadcast.
        import org.apache.spark.sql.graftshim.InternalFrame
        val counts = InternalFrame.sharedScan(
          Tables(s, dir).events.groupBy("user_id").agg(count(lit(1)).as("c")))
        val summary = counts.agg(
          count(lit(1)).as("n_keys"),
          fround(expr("percentile(c, 0.5)"), 2).as("p50_c"),
          fround(expr("percentile(c, 0.99)"), 2).as("p99_c"),
          max("c").as("max_c"))
        val hot = counts.orderBy(col("c").desc, col("user_id")).limit(1)
          .select(col("user_id").as("hot_key"), col("c").as("hot_c"))
        summary.crossJoin(broadcast(hot))
      },
      Some("""WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
             |s AS (SELECT count(*) AS n_keys,
             |    floor(quantile_cont(c, 0.5) * 100.0 + 0.5) / 100.0 AS p50_c,
             |    floor(quantile_cont(c, 0.99) * 100.0 + 0.5) / 100.0 AS p99_c,
             |    CAST(max(c) AS BIGINT) AS max_c FROM c),
             |h AS (SELECT user_id AS hot_key, c AS hot_c FROM c
             |      ORDER BY c DESC, user_id LIMIT 1)
             |SELECT * FROM s CROSS JOIN h""".stripMargin)),

    Q(
      "l05_compaction_plan",
      (s, dir) => {
        // Small-file compaction PLANNING (the maintenance pass every
        // long-lived 100 TB table needs): documents stand in as the
        // file inventory (path = doc_id, bytes = octet_length), and
        // `Layout.compactionPlan` bins them next-fit on the
        // (bytes desc, path) total order via one running-sum window —
        // inventory-sized metadata work, deterministic, so DuckDB
        // replays the exact assignment. The per-bin rollup shows every
        // bin lands at ≤ target + one file. The physical rewrite twin
        // (`Layout.compactParquet`, real FS listing + range-partitioned
        // rewrite) is spec-gated in LayoutSpec.
        val t = Tables(s, dir)
        val inv = t.documents.select(
          col("doc_id").cast("string").as("path"),
          octet_length(col("text")).cast("long").as("bytes"))
        graft.ops.Layout.compactionPlan(inv, "path", "bytes", targetBytes = 16384L)
          .groupBy("bin")
          .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"))
          .orderBy("bin")
      },
      Some("""WITH f AS (SELECT CAST(doc_id AS VARCHAR) AS path,
             |    CAST(strlen(text) AS BIGINT) AS bytes FROM documents),
             |b AS (SELECT path, bytes,
             |    CAST(floor((sum(bytes) OVER (ORDER BY bytes DESC, path
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes)
             |      / 16384.0) AS BIGINT) AS bin
             |  FROM f)
             |SELECT bin, count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes
             |FROM b GROUP BY 1 ORDER BY bin""".stripMargin)),

    Q(
      "l16_prune_advisor",
      (s, dir) => {
        // Partition-column ADVISOR — "which column should this table
        // partition by, for THIS workload": for each candidate layout
        // (returnflag dirs, ship-month dirs, partkey÷100 buckets) and
        // each workload predicate, the fraction of rows a min/max-
        // pruning reader must scan — partition read iff its [min,max]
        // of the predicate column overlaps the predicate range, the
        // exact skipping rule parquet row-groups and Delta/Iceberg
        // file stats implement. The numbers quantify l01's effect
        // BEFORE paying any rewrite: a layout that prunes nothing for
        // the workload is visible as scan_ppm ≈ 1e6. Each layout costs
        // one partitions-sized aggregate (at 100 TB this harvests from
        // l11's stats pass, not the data); the 9-way sweep is 9
        // aggregates over 3 small shared partition frames. The FACT
        // projection deliberately re-scans parquet per layout (3
        // narrow pushed-down scans) instead of sharedScan-caching it:
        // pinning a fact-sized block set for a stats pass starves the
        // block manager for everything after it in a long-lived
        // session — measured as a 10-38x inflation of the queries
        // that FOLLOWED this one in the sf1 sweep before the cache
        // was dropped. Integer end-to-end: row counts and floor-ppm.
        val li = Tables(s, dir).lineitem.select(
          col("l_returnflag").as("rf"),
          date_format(col("l_shipdate"), "yyyy-MM").as("sm"),
          col("l_partkey").as("pk"), col("l_quantity").as("qty"),
          col("l_extendedprice").as("price"))
        val layouts = Seq(
          "1_returnflag" -> col("rf"),
          "2_ship_month" -> col("sm"),
          "3_partkey_b100" -> expr("pk div 100").cast("string"))
        val preds: Seq[(String, org.apache.spark.sql.Column)] = Seq(
          "qty_lt_5" -> (col("qmin") < 5.0),
          "price_gt_90k" -> (col("pmax") > 90000.0),
          "partkey_500_520" -> (col("kmin") <= 520L && col("kmax") >= 500L))
        layouts.map { case (lname, key) =>
          val parts = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(
            li.groupBy(key.as("k")).agg(count(lit(1)).as("rows"),
              min("qty").as("qmin"), max("qty").as("qmax"),
              min("price").as("pmin"), max("price").as("pmax"),
              min("pk").as("kmin"), max("pk").as("kmax")))
          preds.map { case (pname, hit) =>
            parts.agg(count(lit(1)).as("parts_total"),
              sum(when(hit, 1L).otherwise(0L)).as("parts_read"),
              sum(col("rows")).as("total_rows"),
              sum(when(hit, col("rows")).otherwise(0L)).as("rows_read"))
              .select(lit(lname).as("layout"), lit(pname).as("predicate"),
                col("parts_read"), col("parts_total"),
                expr("rows_read * 1000000 div total_rows").as("scan_ppm"))
          }.reduce(_.unionAll(_))
        }.reduce(_.unionAll(_)).orderBy("layout", "predicate")
      },
      Some("""WITH li AS (SELECT l_returnflag AS rf,
             |    strftime(l_shipdate, '%Y-%m') AS sm,
             |    CAST(l_partkey AS BIGINT) AS pk, l_quantity AS qty,
             |    l_extendedprice AS price FROM lineitem),
             |sweeps(layout, predicate) AS (VALUES
             |  ('1_returnflag', 'qty_lt_5'), ('1_returnflag', 'price_gt_90k'),
             |  ('1_returnflag', 'partkey_500_520'),
             |  ('2_ship_month', 'qty_lt_5'), ('2_ship_month', 'price_gt_90k'),
             |  ('2_ship_month', 'partkey_500_520'),
             |  ('3_partkey_b100', 'qty_lt_5'), ('3_partkey_b100', 'price_gt_90k'),
             |  ('3_partkey_b100', 'partkey_500_520')),
             |parts AS (
             |  SELECT '1_returnflag' AS layout, rf AS k, count(*) AS rows,
             |      min(qty) AS qmin, max(price) AS pmax,
             |      min(pk) AS kmin, max(pk) AS kmax
             |    FROM li GROUP BY 2
             |  UNION ALL
             |  SELECT '2_ship_month', sm, count(*), min(qty), max(price),
             |      min(pk), max(pk) FROM li GROUP BY 2
             |  UNION ALL
             |  SELECT '3_partkey_b100', CAST(pk // 100 AS VARCHAR), count(*),
             |      min(qty), max(price), min(pk), max(pk) FROM li GROUP BY 2),
             |hits AS (SELECT s.layout, s.predicate, p.rows,
             |    CASE s.predicate
             |      WHEN 'qty_lt_5' THEN CASE WHEN p.qmin < 5.0 THEN 1 ELSE 0 END
             |      WHEN 'price_gt_90k' THEN CASE WHEN p.pmax > 90000.0 THEN 1 ELSE 0 END
             |      ELSE CASE WHEN p.kmin <= 520 AND p.kmax >= 500 THEN 1 ELSE 0 END
             |    END AS hit
             |  FROM sweeps s JOIN parts p ON p.layout = s.layout)
             |SELECT layout, predicate,
             |  CAST(sum(hit) AS BIGINT) AS parts_read,
             |  CAST(count(*) AS BIGINT) AS parts_total,
             |  CAST(sum(hit * rows) * 1000000 // sum(rows) AS BIGINT) AS scan_ppm
             |FROM hits GROUP BY 1, 2 ORDER BY layout, predicate""".stripMargin))
  )

  /** a05's probe-and-rerank oracle, shared VERBATIM by l03 (index
    * built whole) and l10 (index built incrementally): neither the
    * layout nor its maintenance schedule may change the answer.
    * (A `def`, not a `val`: `queries` above initializes first, and a
    * forward `val` reference would silently capture null.) */
  private def AnnOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (SELECT vec_id - 10 AS cell, v AS cv FROM e
      |          WHERE vec_id >= 10 AND vec_id < 26),
      |assign AS (SELECT neighbor_id, v, cell FROM (
      |    SELECT c.vec_id AS neighbor_id, c.v, t.cell,
      |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(c.v, t.cv),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))), t.cell) AS rn
      |    FROM (SELECT * FROM e WHERE vec_id >= 10) c, cents t)
      |  WHERE rn = 1),
      |probes AS (SELECT query_id, qv, cell FROM (
      |    SELECT q.vec_id AS query_id, q.v AS qv, t.cell,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(q.v, t.cv),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))), t.cell) AS rn
      |    FROM (SELECT * FROM e WHERE vec_id < 10) q, cents t)
      |  WHERE rn <= 6),
      |hits AS (SELECT p.query_id, a.neighbor_id,
      |    list_sum(list_transform(list_zip(p.qv, a.v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(p.qv, x -> x * x)))
      |         * sqrt(list_sum(list_transform(a.v, x -> x * x)))) AS cos
      |  FROM probes p JOIN assign a ON p.cell = a.cell)
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id,
      |  floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
      |FROM (SELECT query_id, neighbor_id, cos,
      |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      |      FROM hits)
      |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin
}
