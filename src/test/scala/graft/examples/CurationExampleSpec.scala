package graft.examples

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationExampleSpec extends SparkTestBase {

  test("curation flow gates junk, removes dups, packs every train doc") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // letter-only vocabulary (digits would fail the alpha-ratio gate)
    val vocab = Vector.tabulate(300)(i =>
      s"${(97 + i % 26).toChar}${(97 + (i / 26) % 26).toChar}x")
    def doc() = Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val good = (0L until 80L).map(i => (i, "web", doc()))
    val dups = good.take(10).map { case (i, s, t) => (500L + i, s, t) }
    val junkShort = (600L until 605L).map(i => (i, "web", "too short"))
    val junkSymbols = (700L until 705L).map(i =>
      (i, "web", Seq.fill(40)("@#$%").mkString(" ")))
    val docs = (good ++ dups ++ junkShort ++ junkSymbols)
      .toDF("doc_id", "source", "text")
    val (packed, counts) = CurationExample.curate(docs, budget = 64, buckets = 4)
    assert(counts("input") == 100L)
    assert(counts("gated") == 90L, s"gate kept ${counts("gated")}")
    assert(counts("deduped") == 80L, s"dedup kept ${counts("deduped")}")
    // every train doc packs exactly once, with valid chunk spans
    val rows = packed.collect()
    assert(rows.length == counts("packed_docs"))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    assert(rows.forall(r =>
      r.getAs[Long]("first_chunk") <= r.getAs[Long]("last_chunk")))
    // the split is deterministic: rerunning packs the same docs
    val (packed2, _) = CurationExample.curate(docs, budget = 64, buckets = 4)
    assert(packed2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      rows.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }
}
