package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** WordPiece tokenizer invariants: trainer pin (the BpeMerges1k
  * discipline), the likelihood-score ranking that distinguishes
  * WordPiece from BPE, greedy longest-match-first semantics against
  * an independent recursive reference, the whole-word [UNK] rule,
  * the census overflow guard, and apply partition-independence. */
class WordPieceSpec extends SparkTestBase {

  private def vs(pieces: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    pieces.foreach(s.add)
    s
  }

  /** Independent recursive reference of the greedy rule: longest
    * match at the current position, recurse on the rest; any failure
    * anywhere collapses the WHOLE word to [UNK]. */
  private def refCount(w: String, vocab: Set[String], maxLen: Int): (Long, Long) = {
    def go(j: Int): Option[Long] =
      if (j >= w.length) Some(0L)
      else (math.min(maxLen, w.length - j) to 1 by -1).collectFirst {
        case l if vocab.contains(
          if (j == 0) w.substring(0, l) else "##" + w.substring(j, j + l)) => l
      } match {
        case Some(l) => go(j + l).map(_ + 1L)
        case None => None
      }
    go(0).map((_, 0L)).getOrElse((1L, 1L))
  }

  test("training ranks pairs by likelihood score, not raw count — the " +
      "defining WordPiece property") {
    // (a,##b) occurs 10 times but both symbols are frequent
    // (count(a)=100, count(##b)=10 → score 10/1000); (c,##d) occurs
    // only 9 times but its symbols occur NOWHERE else (score 9/81).
    // BPE's count ranking would merge ab first; WordPiece must merge
    // cd first.
    val wf = Map("ab" -> 10L, "a" -> 90L, "cd" -> 9L)
    val vocabOne = WordPiece.train(wf, numMerges = 1)
    assert(vocabOne.contains("cd") && !vocabOne.contains("ab"),
      s"likelihood ranking must merge cd before ab: $vocabOne")
    assert(Bpe.train(wf, 1) == Seq("a" -> "b"),
      "cross-check: BPE's count ranking picks the other pair")
  }

  test("tie-break is lexicographic and training is deterministic") {
    // two pairs with identical counts and identical symbol counts:
    // (a,##b) and (c,##d) both occur 5 times, all four symbols occur
    // exactly 5 times → equal scores; the lexicographically smaller
    // pair (a,##b) must win.
    val wf = Map("ab" -> 5L, "cd" -> 5L)
    val v1 = WordPiece.train(wf, numMerges = 1)
    assert(v1.contains("ab") && !v1.contains("cd"), v1.toString)
    assert(WordPiece.train(wf, 3) == WordPiece.train(wf, 3))
    // saturation: once every word is one symbol no pair remains;
    // training stops rather than looping
    val all = WordPiece.train(wf, 1000)
    assert(all.sorted == Seq("##b", "##d", "a", "ab", "c", "cd"), all.toString)
  }

  test("greedy apply is longest-match-FIRST, not best-segmentation") {
    // vocab {a, abc-prefix pieces}: 'ab' matches longer than 'a' at
    // position 0 even though taking 'a' would allow fewer pieces via
    // '##bcd'; greedy must take 'ab' then fail through '##c','##d'.
    val v = vs("a", "ab", "##bcd", "##c", "##d")
    assert(WordPiece.greedyCount("abcd", v, 8) == (3L, 0L),
      "greedy takes ab + ##c + ##d (3), never a + ##bcd (2)")
    // continuation marking: position 0 must NOT match ##-pieces and
    // later positions must ONLY match ##-pieces
    assert(WordPiece.greedyCount("bcd", v, 8) == (1L, 1L),
      "no word-initial piece for b → whole word is [UNK]")
    assert(WordPiece.greedyCount("aa", vs("a"), 8) == (1L, 1L),
      "bare 'a' cannot match at position 1 without '##a'")
    assert(WordPiece.greedyCount("aa", vs("a", "##a"), 8) == (2L, 0L))
  }

  test("whole-word [UNK]: one unmatchable position discards the " +
      "matched prefix") {
    val v = vs("cust", "##om", "##er")
    assert(WordPiece.greedyCount("customer", v, 8) == (3L, 0L))
    assert(WordPiece.greedyCount("customex", v, 8) == (1L, 1L),
      "x has no continuation piece → (1 piece, 1 unk), not 2+fail")
  }

  test("greedy apply equals the independent recursive reference on " +
      "random vocabularies") {
    val rnd = new scala.util.Random(1717)
    (1 to 80).foreach { _ =>
      val alphabet = "abcd"
      val nPieces = 3 + rnd.nextInt(10)
      val pieces = (1 to nPieces).map { _ =>
        val len = 1 + rnd.nextInt(3)
        val body = (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString
        if (rnd.nextBoolean()) body else "##" + body
      }.toSet
      val hs = new java.util.HashSet[String]()
      pieces.foreach(hs.add)
      (1 to 20).foreach { _ =>
        val w = (1 to 1 + rnd.nextInt(8))
          .map(_ => alphabet(rnd.nextInt(4))).mkString
        assert(WordPiece.greedyCount(w, hs, 3) == refCount(w, pieces, 3),
          s"word '$w' vocab $pieces")
      }
    }
  }

  test("pinned 530-piece vocabulary IS the trainer's output on the " +
      "sf0.01 customer-name sample") {
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(
      spark, "/root/testdata/sf0.01")
    val trained = WordPiece.train(
      Bpe.wordFreq(src, "text"), numMerges = 512)
    assert(trained == graft.queries.WordPieceQueries.WordPieceVocab,
      "pinned WordPiece vocabulary drifted from trainer output — " +
        "regenerate with graft.tools.WordPieceDump 512")
    assert(graft.queries.WordPieceQueries.MaxPieceLen == 8,
      "oracle arc bound must match the pinned vocabulary")
  }

  test("pinned vocabulary fully covers its training domain: zero " +
      "unknowns and sane fertility on the sf0.01 name sample") {
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(
      spark, "/root/testdata/sf0.01")
    val counts = WordPiece.tokenCounts(src.withColumn("id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      "id", "text", graft.queries.WordPieceQueries.WordPieceVocab,
      graft.queries.WordPieceQueries.MaxPieceLen).collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      assert(r.getLong(4) == 0L,
        "the trained alphabet must cover every training word — no [UNK]")
      assert(r.getLong(3) >= r.getLong(1) && r.getLong(3) <= r.getLong(2),
        "per-doc pieces must sit between word count and char count")
    }
  }

  test("census overflow guard fails loudly") {
    intercept[IllegalArgumentException] {
      WordPiece.train(Map("abcdefghij" -> 300000L), numMerges = 1)
    }
  }

  test("tokenCounts is partition-independent and zero-fills empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Customer#001 says HELLO"),
      (2L, "!!!"),
      (3L, "customer customer"),
      (4L, "zzz qqq")).toDF("id", "text")
    val vocab = Seq("c", "customer", "##ustomer", "##0", "##1",
      "s", "##ays", "h", "##ello", "##01")
    def run(n: Int) = WordPiece.tokenCounts(
        docs.repartition(n), "id", "text", vocab, 8)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val one = run(1)
    assert(run(7) == one, "partitioning must not change the census")
    assert(one(1) == ((2L, 0L, 0L, 0L, 0L)), s"empty doc zero-fills: ${one(1)}")
    // doc 1 aggregates the per-word greedy counts of its three words
    assert(one(0)._4 == {
      val hs = new java.util.HashSet[String]()
      vocab.foreach(hs.add)
      Seq("customer001", "says", "hello")
        .map(w => WordPiece.greedyCount(w, hs, 8)._1).sum
    })
    assert(one(3) == ((4L, 2L, 6L, 2L, 2L)),
      s"both unknown words count 1 piece + 1 unk: ${one(3)}")
  }
}
