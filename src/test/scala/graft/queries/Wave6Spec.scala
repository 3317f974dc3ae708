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
}
