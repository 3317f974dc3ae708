package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.TextAnalysis._

/** Behavior specs for the corpus-pipeline text ops (decontamination,
  * PII redaction, sequence packing) on planted inputs — the oracle
  * checks engine parity on the synthetic corpus; these check the
  * semantics the corpus can't exercise. */
class TextPipelineSpec extends SparkTestBase {

  test("hashingTf: buckets/signs/counts replay the driver-side md5; " +
      "collisions sum signed; token-free docs drop") {
    import spark.implicits._
    def h52(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    def vec(toks: Seq[String], dim: Int): Seq[Double] = {
      val v = Array.fill(dim)(0.0)
      toks.foreach { t =>
        val j = (h52("tfb:" + t) % dim).toInt
        v(j) += (if (h52("tfs:" + t) % 2 == 0) 1 else -1)
      }
      v.toSeq
    }
    // dim=4 forces bucket collisions so the signed sums actually mix
    val docs = Seq((1L, "aa bb aa cc dd ee"), (2L, "bb"), (3L, ""),
      (4L, "  "), (5L, "aa aa aa")).toDF("doc_id", "text")
    val got = TextAnalysis.hashingTf(docs, "doc_id", "text", dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == vec(Seq("aa", "bb", "aa", "cc", "dd", "ee"), 4))
    assert(got(2L) == vec(Seq("bb"), 4))
    assert(got(5L) == vec(Seq("aa", "aa", "aa"), 4))
    assert(!got.contains(3L) && !got.contains(4L),
      "token-free docs have no vector")
    // repeated tokens accumulate: |entry| for doc 5's bucket is 3
    assert(got(5L).map(math.abs).max == 3.0)
  }

  test("hashingTf plans as ONE narrow pass — zero exchanges") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val plan = TextAnalysis.hashingTf(docs, "doc_id", "text", dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the native HashingTfVec featurizer must not shuffle:\n$plan")
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a quick brown fox jumps into view"), // shares "quick brown fox jumps"
      (2L, "the lazy dog sleeps all day"),       // shares no 4-gram
      (3L, "over the lazy dog and beyond"),      // shares "over the lazy dog"
      (4L, "completely unrelated text here"),
      (5L, "too short")                          // < n tokens
    ).toDF("doc_id", "text")
    val got = decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L), s"got $got")
  }

  test("decontaminate broadcasts the benchmark n-gram side") {
    import spark.implicits._
    val bench = Seq((100L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val corpus = Seq((1L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val plan = decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side must broadcast:\n$plan")
  }

  test("contaminationScore: occurrence-fraction ppm, short docs absent, clean docs zero") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // all 4-gram occurrences contaminated (a verbatim benchmark slice)
      (1L, "quick brown fox jumps over the lazy"), // 4 grams, 4 hits
      // partially contaminated: 5 grams, hits = "over the lazy dog" only
      (2L, "sleeps over the lazy dog all day wow"),
      (3L, "completely unrelated text right here"), // 0 hits
      (4L, "too short")                             // < n words: no row
    ).toDF("doc_id", "text")
    val got = contaminationScore(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"got ${got.keySet}")
    assert(got(1L) == ((4L, 4L, 1000000L)), s"got ${got(1L)}")
    assert(got(2L) == ((5L, 1L, 200000L)), s"got ${got(2L)}")
    assert(got(3L) == ((2L, 0L, 0L)), s"got ${got(3L)}")
  }

  test("contaminationScore broadcasts the benchmark n-gram side") {
    import spark.implicits._
    val bench = Seq((100L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val corpus = Seq((1L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val plan = contaminationScore(corpus, bench, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side must broadcast:\n$plan")
  }

  test("redactPii masks emails and digit runs; piiCount counts spans once") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact john.doe+spam@mail-host.example.com today"),
      (2L, "card 4111111111111111 pin 1234 ok 123"),  // two runs; 123 too short
      (3L, "reach a1234@b.org or 5678"),              // digits inside email = 1 email + 1 run
      (4L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), redactPii(col("text")).as("r"),
        piiCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) == ("contact <EMAIL> today", 1))
    assert(got(2L) == ("card <NUM> pin <NUM> ok 123", 2))
    assert(got(3L) == ("reach <EMAIL> or <NUM>", 2), s"got ${got(3L)}")
    assert(got(4L) == ("nothing sensitive here", 0))
  }

  test("sequence packing: chunks are contiguous and capacity-exact per shard") {
    import spark.implicits._
    val budget = 10
    val rnd = new scala.util.Random(5)
    val docs = (0L until 60L).map { i =>
      (s"shard${i % 3}", i, Seq.fill(1 + rnd.nextInt(7))("tok").mkString(" "))
    }.toDF("source", "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val packed = docs
      .select(col("source"), col("doc_id"), tokenCount(col("text")).cast("long").as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("n"), col("off"),
        floor(col("off") / budget).cast("long").as("first_chunk"),
        floor((col("off") + col("n") - 1) / budget).cast("long").as("last_chunk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    for ((src, rows) <- packed.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      // offsets are the exact running concatenation per shard
      sorted.foldLeft(0L) { case (expect, (_, id, n, off, first, last)) =>
        assert(off == expect, s"$src doc $id offset $off != $expect")
        // chunk ids follow from the concat positions
        assert(first == off / budget && last == (off + n - 1) / budget)
        off + n
      }
      // every chunk boundary is crossed by exactly the doc spanning it
      val total = sorted.map(_._3).sum
      val lastChunk = sorted.last._6
      assert(lastChunk == (total - 1) / budget)
    }
  }

  test("ngramCoverage: hand-computed covers on planted repetition; " +
      "short docs score 0; duplicated-gram mass can exceed 1e6 ppm") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y"),                    // 11 chars
      (2L, "a b c d e a b c d e a b c d e"),  // 29 chars, looping 5-gram
      (3L, "hi"),                             // 1 token: all zero
      (4L, "a b"),                            // exactly one 2-gram
      (5L, "")                                // empty: filtered out
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramCoverage(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: "x y"×3 covers 9 chars of 11; "x y x"×2 covers 10; no
    // 5-gram repeats (the two distinct 5-grams appear once each)
    assert(got(1L) == (9L * 1000000 / 11, 10L * 1000000 / 11, 0L))
    // doc 2: top 2-gram "a b"(or tie) ×3 → 9 chars; top 3-gram
    // "a b c"×3 → 15; duplicated 5-grams: "a b c d e"×3 (27 chars) +
    // 4 wrap grams ×2 each (72 chars) = 99 of 29 chars → > 1e6 ppm
    assert(got(2L) == (9L * 1000000 / 29, 15L * 1000000 / 29, 99L * 1000000 / 29))
    assert(got(2L)._3 > 1000000L, "count-based dup mass exceeds 1e6 by design")
    assert(got(3L) == (0L, 0L, 0L))
    assert(got(4L) == (1000000L, 0L, 0L))
    assert(!got.contains(5L), "empty text is filtered, not scored")
  }
}
