package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant checks for the round-12 fifth pack (d20/l16/e17/a27): the
  * DuckDB oracle pins values; these pin the algorithmic properties —
  * cluster-mass conservation, pruning dominance, planted removal
  * effects, and the SQ8 quantization error bound. */
class Wave5Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  test("d20: planted near-dup copies share a multi-member cluster; " +
      "weights are exactly 1e6 div size") {
    val out = run("d20_softdedup_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, c, w) => w == 1000000L / c })
    val byId = out.map(t => t._1 -> t._2).toMap
    // every planted copy (id >= 1e6) clusters with its base doc
    val copies = out.filter(_._1 >= 1000000L)
    assert(copies.nonEmpty)
    copies.foreach { case (id, c, _) =>
      assert(c >= 2, s"copy $id should cluster with its base")
      assert(byId(id - 1000000L) >= 2, s"base of $id should be clustered")
    }
    // every row keeps positive weight and no row exceeds full weight
    assert(out.forall { case (_, _, w) => w >= 1L && w <= 1000000L })
  }

  test("l16: a layout keyed on the predicate column prunes at least as " +
      "well as unrelated layouts") {
    val out = run("l16_prune_advisor").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 9)
    assert(out.forall { case (_, _, pr, pt, ppm) =>
      pr <= pt && ppm >= 0 && ppm <= 1000000L })
    def ppm(layout: String, pred: String) =
      out.find(t => t._1 == layout && t._2 == pred).get._5
    // the partkey-bucketed layout must dominate the others on the
    // partkey equality-range predicate
    assert(ppm("3_partkey_b100", "partkey_500_520") <=
      ppm("1_returnflag", "partkey_500_520"))
    assert(ppm("3_partkey_b100", "partkey_500_520") <=
      ppm("2_ship_month", "partkey_500_520"))
    // and it genuinely prunes: the 21-key range fits few 100-key buckets
    assert(ppm("3_partkey_b100", "partkey_500_520") < 1000000L)
  }

  test("e17: planted chain — a channel on every converting path has " +
      "full removal effect") {
    // journeys: start→view→click→conv (twice), start→view→drop:
    // T(start,view)=1e6, T(view,click)=666666, T(view,drop)=333333,
    // T(click,conv)=1e6. Removing click (or view) kills all conversion.
    val t = Map(
      ("start", "view") -> 1000000L, ("view", "click") -> 666666L,
      ("view", "drop") -> 333333L, ("click", "conv") -> 1000000L)
    val states = Seq("start", "view", "click", "conv", "drop")
    val base = Events.markovWalk(t, states, Set.empty)
    assert(base == 666666L, s"base $base")
    assert(Events.markovWalk(t, states, Set("click")) == 0L)
    assert(Events.markovWalk(t, states, Set("view")) == 0L)
    // and on the real table: effects in [0, 1e6], attribution sums to
    // ~1e6 (floor slack), base consistent across rows
    val out = run("e17_markov_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._2).distinct.length == 1, "base must be one scalar")
    assert(out.forall { case (_, b, rm, e, _) =>
      rm <= b && e >= 0 && e <= 1000000L })
    val attrSum = out.map(_._5).sum
    assert(attrSum <= 1000000L && attrSum >= 1000000L - out.length,
      s"attribution must sum to 1e6 minus floor slack: $attrSum")
  }

  test("e20: depth-2 path dependence — order-2 misattributes a channel " +
      "two steps back, order-3 separates the histories exactly") {
    // two planted journeys: click→view→signup→CONV and
    // error→view→signup→DROP. Whether signup converts depends on the
    // channel TWO steps back; the order-2 state 'view|signup' MIXES
    // both histories (it converts half the time), so removing 'error'
    // appears to cost half the click-path conversions too. Order-3
    // states 'click|view|signup' vs 'error|view|signup' separate them:
    // removing 'error' has EXACTLY zero effect.
    val M = 1000000L
    val t2 = Map(
      ("start", "start|click") -> M / 2, ("start", "start|error") -> M / 2,
      ("start|click", "click|view") -> M, ("start|error", "error|view") -> M,
      ("click|view", "view|signup") -> M, ("error|view", "view|signup") -> M,
      ("view|signup", "conv") -> M / 2, ("view|signup", "drop") -> M / 2)
    val s2 = Seq("start", "start|click", "start|error", "click|view",
      "error|view", "view|signup", "conv", "drop")
    val base2 = Events.markovWalk(t2, s2, Set.empty)
    val rm2 = Events.markovWalk(t2, s2,
      s2.filter(_.endsWith("|error")).toSet)
    assert(base2 == 500000L && rm2 == 250000L,
      s"order-2 blames error for half the click conversions: $base2/$rm2")
    val t3 = Map(
      ("start", "start|start|click") -> M / 2,
      ("start", "start|start|error") -> M / 2,
      ("start|start|click", "start|click|view") -> M,
      ("start|start|error", "start|error|view") -> M,
      ("start|click|view", "click|view|signup") -> M,
      ("start|error|view", "error|view|signup") -> M,
      ("click|view|signup", "conv") -> M,
      ("error|view|signup", "drop") -> M)
    val s3 = Seq("start", "start|start|click", "start|start|error",
      "start|click|view", "start|error|view", "click|view|signup",
      "error|view|signup", "conv", "drop")
    val base3 = Events.markovWalk(t3, s3, Set.empty)
    val rm3 = Events.markovWalk(t3, s3,
      s3.filter(_.endsWith("|error")).toSet)
    assert(base3 == 500000L && rm3 == 500000L,
      s"order-3 must assign error ZERO effect: $base3/$rm3")
    // and removing 'click' kills exactly the converting path at both orders
    assert(Events.markovWalk(t3, s3,
      s3.filter(_.endsWith("|click")).toSet) == 0L)
    // on the real table: same invariants as e17/e19
    val out = run("e20_markov3_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 4 && out.map(_._2).distinct.length == 1)
    assert(out.forall { case (_, b, rm, e, _) =>
      rm <= b && e >= 0 && e <= 1000000L })
    val attrSum = out.map(_._5).sum
    assert(attrSum <= 1000000L && attrSum >= 1000000L - out.length)
  }

  test("a27: SQ8 reconstruction error is bounded by half the " +
      "quantization step; centroid-exact at mx=0") {
    import spark.implicits._
    import graft.functions.VectorExpressions.{cellResidualSq8, sq8Decode}
    val centers = Array(Array(0.0, 0.0, 0.0), Array(10.0, 10.0, 10.0))
    val vecs = Seq(
      (1L, Seq(0.4, -0.2, 0.1)), (2L, Seq(9.7, 10.3, 10.0)),
      (3L, Seq(10.0, 10.0, 10.0)), // exactly the centroid: mx = 0
      (4L, Seq(5.1, 4.9, 5.0))).toDF("id", "v")
    val out = vecs.select(col("id"),
        col("v").cast("array<double>").as("v"),
        cellResidualSq8(col("v").cast("array<double>"), centers).as("z"))
      .select(col("id"), col("v"), col("z.cell").as("cell"),
        col("z.mx").as("mx"), sq8Decode(col("z"), centers).as("vhat"))
      .collect()
    out.foreach { r =>
      val v = r.getSeq[Double](1)
      val mx = r.getDouble(3)
      val vhat = r.getSeq[Double](4)
      val step = if (mx == 0.0) 0.0 else mx / 127.0
      v.zip(vhat).foreach { case (a, b) =>
        assert(math.abs(a - b) <= step / 2 + 1e-12,
          s"id ${r.getLong(0)}: |$a - $b| > ${step / 2}")
      }
    }
    val exact = out.find(_.getLong(0) == 3L).get
    assert(exact.getDouble(3) == 0.0)
    assert(exact.getSeq[Double](4) == Seq(10.0, 10.0, 10.0))
    assert(exact.getInt(2) == 1)
    // and the full operator: ADC top-1 of a query sitting on a corpus
    // point recovers that point
    val recall = run("a27_knn_ivf_sq8")
    assert(recall.filter(col("rank") === 1).count() == 10)
  }
}
