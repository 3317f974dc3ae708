package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  test("binned range join matches the naive cross-join-filter exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val points = Seq.tabulate(500)(i => (i.toLong, rnd.nextDouble() * 100.0))
      .toDF("pid", "p")
    val intervals = Seq.tabulate(40) { i =>
      val lo = rnd.nextDouble() * 90.0
      (1000L + i, lo, lo + rnd.nextDouble() * 15.0)
    }.toDF("iid", "lo", "hi")

    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 7.0)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("interval overlap join matches the naive cross-join, with no duplicate pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def mk(n: Int, idBase: Long) = Seq.tabulate(n) { i =>
      val lo = rnd.nextDouble() * 90.0
      (idBase + i, lo, lo + rnd.nextDouble() * 20.0)
    }.toDF(if (idBase == 0) "a_key" else "b_key",
      if (idBase == 0) "a_lo" else "b_lo",
      if (idBase == 0) "a_hi" else "b_hi")
    val a = mk(60, 0L)
    val b = mk(50, 1000L)
    val rows = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", binWidth = 8.0)
      .select("a_key", "b_key")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // one-bin emission rule: every overlapping pair appears exactly once
    assert(rows.length == rows.toSet.size, "overlap join must not duplicate pairs")
    val want = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_key", "b_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.toSet == want)
    assert(want.nonEmpty)
  }

  test("binning plans as an equi-join, not a nested loop") {
    import spark.implicits._
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val intervals = Seq((2L, 1.0, 9.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("degenerate intervals (hi < lo) match nothing; boundaries are inclusive") {
    import spark.implicits._
    val points = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "p")
    val intervals = Seq((7L, 10.0, 20.0), (8L, 30.0, 25.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 4.0)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L), (2L, 7L)))
  }
}
