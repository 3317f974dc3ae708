package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKSpec extends SparkTestBase {

  private def sample() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1L to 2000L).map(i => (i, s"g${rnd.nextInt(13)}", rnd.nextInt(500).toDouble))
      .toDF("id", "grp", "score")
  }

  test("TopK.perGroup matches the row_number window form exactly") {
    val df = sample()
    val got = TopK.perGroup(df, Seq(col("grp")), col("score"), col("id"), k = 7)
      .select("id", "grp", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 7).drop("rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("empty grouping = global top-k; k larger than group passes all rows") {
    val df = sample()
    val global = TopK.perGroup(df, Seq.empty, col("score"), col("id"), k = 3)
      .collect()
    assert(global.length == 3)
    val all = TopK.perGroup(df.filter(col("grp") === "g1"), Seq(col("grp")),
      col("score"), col("id"), k = 1000000).count()
    assert(all == df.filter(col("grp") === "g1").count())
  }

  test("adjacent TopK nodes collapse to min-k in the optimized plan") {
    val df = sample()
    val twice = TopK.perGroup(
      TopK.perGroup(df, Seq(col("grp")), col("score"), col("id"), k = 9),
      Seq(col("grp")), col("score"), col("id"), k = 4)
    val optimized = twice.queryExecution.optimizedPlan
    val topks = optimized.collect {
      case t: org.apache.spark.sql.graftshim.TopKPerGroup => t
    }
    assert(topks.length == 1, s"expected 1 collapsed node, got:\n$optimized")
    assert(topks.head.k == 4)
  }

  test("property: equals the window form on arbitrary data (incl. ties/negatives)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // small score domain forces heavy ties; groups of wildly different sizes
    val rowsGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0, 5), Gen.choose(-3.0, 3.0).map(v => math.rint(v * 2) / 2)))
    val prop = forAll(rowsGen, Gen.choose(1, 6)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((g, s), i) => (i.toLong, s"g$g", s) }
        .toDF("id", "grp", "score")
      val got = TopK.perGroup(df, Seq(col("grp")), col("score"), col("id"), k)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = df.withColumn("rn", row_number().over(
          Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
        .filter(col("rn") <= k).select("id")
        .collect().map(_.getLong(0)).toSet
      got == want
    }
    val res = check(Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("long scores above 2^53 rank exactly (no lossy double cast)") {
    import spark.implicits._
    val big = 1L << 54
    // the two scores collide under double rounding; exact ordering must
    // pick the larger one, matching the row_number window
    val df = Seq((1L, "g", big + 2L), (2L, "g", big)).toDF("id", "grp", "score")
    val got = TopK.perGroup(df, Seq(col("grp")), col("score"), col("id"), k = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"expected the exactly-larger score to win, got $got")
  }

  test("NaN scores rank first under desc, like the window sort") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, Double.NaN))
      .toDF("id", "score").withColumn("grp", lit("g"))
    val got = TopK.perGroup(df, Seq(col("grp")), col("score"), col("id"), k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want && got == Set(3L, 4L), s"got $got, window says $want")
  }

  test("fractional ties compare exactly (no truncating cast)") {
    import spark.implicits._
    // same score; ties 1.9 vs 1.2 truncate to the same long — the exact
    // comparison must keep the LOWER tie (1.2), like the window form
    val df = Seq((1L, "g", 5.0, 1.9), (2L, "g", 5.0, 1.2))
      .toDF("id", "grp", "score", "tie")
    val got = TopK.perGroup(df, Seq(col("grp")), col("score"), col("tie"), k = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L), s"fractional tie must win exactly, got $got")
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("tie"))))
      .filter(col("rn") <= 1).select("id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("string ties order lexicographically") {
    import spark.implicits._
    val df = Seq((1L, "g", 5.0, "zz"), (2L, "g", 5.0, "aa"))
      .toDF("id", "grp", "score", "tie")
    val got = TopK.perGroup(df, Seq(col("grp")), col("score"), col("tie"), k = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L), s"lexicographically-lower tie must win, got $got")
  }

  test("buffer-backed ties survive row reuse (shuffled input, equal scores)") {
    import spark.implicits._
    // shuffle readers recycle one UnsafeRow; retained string ties must
    // be deep-copied or they all mutate to the last row's bytes
    val df = spark.sparkContext.parallelize(
      (0L until 2000L).map(i => (i, "g", 1.0, f"t-${(i * 769) % 2000}%05d")), 8)
      .toDF("id", "grp", "score", "tie")
    val got = TopK.perGroup(df, Seq(col("grp")), col("score"), col("tie"), k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("tie"))))
      .filter(col("rn") <= 10).select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"got $got want $want")
  }

  test("RewriteWindowTopK turns the row_number idiom into the native operator") {
    org.apache.spark.sql.graftshim.TopKPerGroupApi.ensureInjected(spark)
    val df = sample()
    val windowed = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 7)
      .select("id", "grp", "score")
    val optimized = windowed.queryExecution.optimizedPlan
    assert(optimized.collect {
      case t: org.apache.spark.sql.graftshim.TopKPerGroup => t
    }.nonEmpty, s"window idiom should rewrite to TopKPerGroup:\n$optimized")

    val got = windowed.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = TopK.perGroup(df, Seq(col("grp")), col("score"), col("id"), k = 7)
      .select("id", "grp", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("RewriteWindowTopK leaves ineligible windows alone") {
    org.apache.spark.sql.graftshim.TopKPerGroupApi.ensureInjected(spark)
    val df = sample()
    // rank column kept in the output -> must NOT rewrite
    val keepsRank = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 3)
      .select("id", "rn")
    assert(keepsRank.queryExecution.optimizedPlan.collect {
      case t: org.apache.spark.sql.graftshim.TopKPerGroup => t
    }.isEmpty)
    // ascending score -> ordering contract doesn't hold -> no rewrite
    val ascScore = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score"), col("id"))))
      .filter(col("rn") <= 3)
      .select("id", "grp")
    assert(ascScore.queryExecution.optimizedPlan.collect {
      case t: org.apache.spark.sql.graftshim.TopKPerGroup => t
    }.isEmpty)
  }

  test("perGroupQuota matches the window form with a per-group limit") {
    import spark.implicits._
    val df = sample()
    // quota per group: g0..g12 -> 1..13, attached via broadcast join
    val quotas = (0 until 13).map(i => (s"g$i", i + 1)).toDF("grp", "quota")
    val joined = df.join(broadcast(quotas), "grp")
    val got = TopK.perGroupQuota(joined, Seq(col("grp")), col("score"), col("id"),
        col("quota"), maxK = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = joined.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= col("quota")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("perGroupQuota: zero quota drops the group, null quota falls back to maxK") {
    import spark.implicits._
    val df = sample()
    // g0 gets quota 0 (dropped); g1 gets null (falls back to maxK=2);
    // everything else quota 3
    val quotas = Seq(("g0", Some(0)), ("g1", None)) ++
      (2 until 13).map(i => (s"g$i", Some(3)))
    val qdf = quotas.toDF("grp", "quota")
    val joined = df.join(broadcast(qdf), "grp")
    val got = TopK.perGroupQuota(joined, Seq(col("grp")), col("score"), col("id"),
        col("quota"), maxK = 2)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("g0"), s"zero-quota group must vanish, got $got")
    assert(got("g1") == 2L, s"null quota must fall back to maxK, got $got")
    assert((2 until 13).forall(i => got(s"g$i") == 2L),
      s"maxK must cap quotas above it, got $got") // min(maxK=2, quota=3) = 2
  }

  test("perGroupQuota partial pass bounds map-side output like the final") {
    import spark.implicits._
    val quotas = Seq(("a", 2), ("b", 5)).toDF("grp", "quota")
    val df = spark.sparkContext.parallelize(
      (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b", (i % 97).toDouble)), 8)
      .toDF("id", "grp", "score")
      .join(broadcast(quotas), "grp")
    val out = TopK.perGroupQuota(df, Seq(col("grp")), col("score"), col("id"),
        col("quota"), maxK = 64)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 5L), s"got $out")
  }

  test("physical plan is partial heap -> exchange -> final heap (map-side reduction)") {
    val df = sample()
    val plan = TopK.perGroup(df, Seq(col("grp")), col("score"), col("id"), k = 5)
      .queryExecution.executedPlan
    val s = plan.toString
    val execs = "TopKPerGroup \\[".r.findAllIn(s).length
    assert(execs == 2, s"expected partial+final execs in:\n$s")
    assert(s.contains("Exchange"), s"expected an exchange between phases in:\n$s")
    // the partial phase (trailing ", true") must run BELOW the exchange,
    // the final (", false") above it
    val exchangeIdx = s.indexOf("Exchange")
    assert(s.indexOf(", true") > exchangeIdx, s"partial should sit under the exchange in:\n$s")
    assert(s.indexOf(", false") < exchangeIdx, s"final should sit above the exchange in:\n$s")
  }
}
