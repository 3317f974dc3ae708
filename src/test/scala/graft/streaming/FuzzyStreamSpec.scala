package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.FuzzyStream._

class FuzzyStreamSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** Driver-side replay of the per-key min-owner star semantics. */
  private def refMatches(recs: Seq[(Long, String)]): Set[(Long, Long, Int)] = {
    val els = recs.flatMap { case (id, s) =>
      elements(Rec(id, s, ts(0))).map(e => (e.key, e.pos, e.ch, id))
    }
    els.groupBy(_._1).values.flatMap { group =>
      val owner = group.map(_._4).min
      val ownEls = group.filter(_._4 == owner)
      group.filter(_._4 > owner).flatMap { case (_, pos, ch, id) =>
        val ds = ownEls.flatMap { case (_, opos, och, _) =>
          if (opos == 0 && pos == 0) Some(0)
          else if (opos == pos && och != ch) Some(1)
          else if ((opos == 0) != (pos == 0)) Some(1)
          else None
        }
        if (ds.isEmpty) None else Some((owner, id, ds.min))
      }
    }.toSet
  }

  test("streaming fuzzy matches across micro-batches equal the min-owner replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // substitutions (cat/cut/cot), insert/delete chains (car/cart/carts),
    // an exact duplicate name under a later id, and an unrelated decoy
    val recs = Seq(
      1L -> "cat", 2L -> "car", 3L -> "cart", 4L -> "dog",
      5L -> "cut", 6L -> "cot", 7L -> "carts", 8L -> "cat", 9L -> "zebra")
    val (first, second) = recs.splitAt(5) // cot/carts/cat-dup arrive later
    val stream = MemoryStream[Rec]
    val query = matches(stream.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("fuzzy_matches")
      .outputMode("append").start()
    try {
      stream.addData(first.map { case (id, s) => Rec(id, s, ts(1)) })
      query.processAllAvailable()
      stream.addData(second.map { case (id, s) => Rec(id, s, ts(2)) })
      query.processAllAvailable()
      val got = spark.table("fuzzy_matches").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = refMatches(recs)
      assert(got == want, s"missing=${want -- got} extra=${got -- want}")
      // cross-batch: cot (batch 2) attaches to cat's key-owner state
      assert(got.contains((1L, 6L, 1)), "cat→cot crosses the batch boundary")
      // exact duplicate name under a later id reads distance 0
      assert(got.contains((1L, 8L, 0)), "duplicate name scores dist 0")
      // insert chain: cart (batch 1) owns carts (batch 2)
      assert(got.contains((3L, 7L, 1)), "cart→carts insertion")
      assert(!got.exists(m => m._1 == 9L || m._2 == 9L), "decoy matches nothing")
    } finally query.stop()
  }
}
