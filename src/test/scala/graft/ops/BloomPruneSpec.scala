package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BloomPruneSpec extends SparkTestBase {

  test("bloom-pruned exact join is result-identical to the plain join") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val probe = Seq.tabulate(2000)(i => (i.toLong, rnd.nextInt(500).toLong))
      .toDF("row_id", "k")
    val build = Seq.tabulate(40)(i => (i * 7L))
      .toDF("bk")

    val pruned = BloomPrune.filterByKeys(probe, "k", build, "bk", expectedKeys = 1000L)
      .join(build, col("k") === col("bk"))
      .select("row_id").collect().map(_.getLong(0)).toSet
    val plain = probe.join(build, col("k") === col("bk"))
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("no false negatives: every joinable row survives the filter") {
    import spark.implicits._
    val probe = (0L until 300L).map(i => (i, i)).toDF("row_id", "k")
    val build = (0L until 300L by 3).toDF("bk")
    val survivors = BloomPrune.filterByKeys(probe, "k", build, "bk", expectedKeys = 100L)
      .select("k").collect().map(_.getLong(0)).toSet
    val mustSurvive = (0L until 300L by 3).toSet
    assert(mustSurvive.subsetOf(survivors),
      s"missing: ${(mustSurvive -- survivors).take(5)}")
  }
}
