package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant checks for the round-12 sixth pack (e18/p18/st28 — st28's
  * stream/batch parity lives in CorpusStreamSpec). */
class Wave6Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  test("e18: ranked census is contiguous, ordered, and 4-step-capped") {
    val out = run("e18_session_paths").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.map(_._1).toSeq == (1 to out.length), "rank must be contiguous")
    val counts = out.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "census must be count-descending")
    assert(out.forall(_._2.split(">").length <= 4),
      "paths must truncate at 4 steps")
    assert(out.forall(t => t._2.nonEmpty && t._3 >= 1))
  }

  test("p18: shards partition the corpus and the curriculum is ordered") {
    val out = run("p18_curriculum_shards").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).sorted.toSeq == (0 until 8))
    assert(out.map(_._1).toSeq == (1 to 8), "positions must be contiguous")
    val means = out.map(_._4)
    assert(means.zip(means.tail).forall { case (a, b) => a >= b },
      "curriculum must be quality-descending")
    val total = graft.tables.Tables(spark, dir).documents.count()
    assert(out.map(_._3).sum == total, "shards must partition the corpus")
  }

  test("mm15: positions are clip-relative ppm, flag matches the skew rule") {
    val out = run("mm15_av_sync_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(out.length == 300)
    out.foreach { case (id, v, a, skew, f) =>
      assert(v >= 0 && v <= 1000000 && a >= 0 && a <= 1000000, s"$id")
      assert(skew == math.abs(v - a), s"$id: skew $skew != |$v - $a|")
      assert(f == (if (skew > 500000) 1 else 0), s"$id: flag $f at skew $skew")
    }
    // both flagged and unflagged clips exist at this corpus (the audit
    // discriminates, it doesn't rubber-stamp)
    assert(out.exists(_._5 == 1) && out.exists(_._5 == 0))
  }

  test("w12: pair counts are exact and the median slope is the lower median") {
    val out = run("w12_theilsen_trend").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (et, nDays, nPairs, _) =>
      assert(nPairs == nDays * (nDays - 1) / 2, s"$et: $nPairs vs $nDays days")
    }
    // driver-side replay of one type: quantize, pair, floor-slope, sort
    val et = out.head._1
    val daily = graft.tables.Tables(spark, dir).events
      .filter(col("event_type") === et)
      .select(to_date(col("ts")).as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("day").agg(sum("c").as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
      dd = daily(j)._1.toEpochDay - daily(i)._1.toEpochDay
    } yield math.floor((daily(j)._2 - daily(i)._2) * 1000000.0 / dd).toLong)
      .sorted
    val ref = slopes((slopes.length + 1) / 2 - 1)
    assert(out.head._4 == ref, s"$et: query ${out.head._4} != reference $ref")
  }
}
