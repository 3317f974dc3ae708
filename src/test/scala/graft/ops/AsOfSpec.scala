package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {

  test("asof join picks latest right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", 100L), // matches r at 90
      (2L, "k1", 50L),  // matches r at 50 (equal time)
      (3L, "k1", 10L),  // no right row at/before 10 -> null
      (4L, "k2", 100L)  // other key: matches r at 100
    ).toDF("id", "key", "t")
    val right = Seq(
      ("k1", 50L, 900L), ("k1", 90L, 901L), ("k1", 120L, 902L),
      ("k2", 100L, 903L)
    ).toDF("key", "t", "rid")

    val out = AsOf.asofJoin(left, right, "key", "t", Seq("rid"))
      .select("id", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(901L))
    assert(out(2L).contains(900L))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(903L))
  }

  test("asof join keeps the matched row atomic when payload fields are null") {
    import spark.implicits._
    val left = Seq((1L, "k", 100L)).toDF("id", "key", "t")
    // latest right row at t=90 has a NULL rid; the match must yield NULL,
    // not fall back to the older row's rid=900
    val right = Seq(("k", 50L, Option(900L)), ("k", 90L, Option.empty[Long]))
      .toDF("key", "t", "rid")
    val out = AsOf.asofJoin(left, right, "key", "t", Seq("rid")).select("rid").head()
    assert(out.isNullAt(0), s"expected NULL payload from the t=90 row, got $out")
  }

  test("salted join rejects right/full outer join types") {
    import spark.implicits._
    val df = Seq(("k", 1L)).toDF("key", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df.withColumnRenamed("v", "w"), "key", 4, "right")
    }
  }

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    // 90% of big rows share one hot key
    val big = (0 until 2000).map { i =>
      (if (rnd.nextDouble() < 0.9) "hot" else s"k${rnd.nextInt(20)}", i.toLong)
    }.toDF("key", "v")
    val small = (Seq("hot") ++ (0 until 20).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, i * 100) }.toDF("key", "w")
    val plain = big.join(small, Seq("key")).select("key", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "key", salt = 8)
      .select("key", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("forward asof picks the EARLIEST right row at or after left time; " +
      "forward tolerance bounds the look-ahead") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", 100L), // next right: 120
      (2L, "k1", 50L),  // equal time matches: 50
      (3L, "k1", 130L), // nothing after -> null
      (4L, "k2", 90L)   // other key: 100
    ).toDF("id", "key", "t")
    val right = Seq(
      ("k1", 50L, 900L), ("k1", 90L, 901L), ("k1", 120L, 902L),
      ("k2", 100L, 903L)
    ).toDF("key", "t", "rid")
    val out = AsOf.asofJoin(left, right, "key", "t", Seq("rid"),
        direction = "forward")
      .select("id", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(902L))
    assert(out(2L).contains(900L))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(903L))
    // tolerance is the FORWARD gap: right at 120 is 70 ahead of 50
    val tol = AsOf.asofJoin(left.filter($"id" === 1L), right, "key", "t",
        Seq("rid"), Some(lit(10L)), direction = "forward")
      .select("rid").head()
    assert(tol.isNullAt(0), "120 is 20 ahead of 100 — outside tol 10")
  }

  test("tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, "k", 100L), (2L, "k", 500L)).toDF("id", "key", "t")
    val right = Seq(("k", 90L, 7L)).toDF("key", "t", "rid")
    val out = AsOf.asofJoin(left, right, "key", "t", Seq("rid"), Some(lit(50L)))
      .select("id", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(7L))  // 10 ticks back, within 50
    assert(out(2L).isEmpty)       // 410 ticks back, stale
  }
}
