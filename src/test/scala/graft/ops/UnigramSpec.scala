package graft.ops

import graft.SparkTestBase

/** Unigram-LM tokenizer invariants: trainer pin (the BpeMerges1k
  * discipline), Viterbi correctness against brute-force enumeration,
  * the packed tie-break, unk fallback, guards, and apply
  * partition-independence. */
class UnigramSpec extends SparkTestBase {

  private def lpMap(pieces: Seq[(String, Long)]) = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (s, v) => m.put(s, v) }
    m
  }

  /** Brute-force optimum: enumerate EVERY segmentation, score with the
    * same micro-nat table (+ unk for unknown single chars), return the
    * max (score, then fewest pieces) as the packed long. */
  private def bruteBest(w: String, pieces: Map[String, Long], maxLen: Int): Long = {
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        segs(s.substring(l)).map(s.substring(0, l) +: _)
      }
    segs(w).flatMap { seg =>
      val scores = seg.map { p =>
        pieces.get(p).orElse(
          if (p.length == 1) Some(Unigram.UnkLpMicro) else None)
      }
      if (scores.exists(_.isEmpty)) None
      else Some(64L * scores.map(_.get).sum - seg.length)
    }.max
  }

  test("pinned 82-piece table IS the trainer's output on the sf0.01 " +
      "customer-name sample") {
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(
      spark, "/root/testdata/sf0.01")
    val trained = Unigram.train(Bpe.wordFreq(src, "text"), vocabSize = 64)
    assert(trained.count(_._1.length > 1) <= 64, "vocab target respected")
    assert(trained == graft.queries.UnigramQueries.UnigramPieces,
      "pinned unigram table drifted from trainer output — regenerate " +
        "with graft.tools.UnigramDump 64")
  }

  test("trainer finds the MLE vocabulary in both regimes: redundant long " +
      "pieces die, genuinely atomic pieces survive whole") {
    // Compositional corpus: 'abab' is exactly ab+ab, so the global MLE
    // gives 'ab' probability ~1 (P(abab)=p(ab)^2 ~ 1 AND P(ab) ~ 1) and
    // the redundant 'abab' piece must be pruned away, not kept.
    val comp = Unigram.train(Map("abab" -> 100L, "ab" -> 50L), vocabSize = 2)
    assert(!comp.exists(_._1 == "abab"),
      s"'abab' is redundant under p(ab)~1 and must be pruned: $comp")
    val abLp = comp.find(_._1 == "ab").get._2
    assert(abLp > -100000L, s"'ab' must carry ~all mass, got lp $abLp: $comp")
    // Atomic corpus: 'abc' occurring alongside 'ab' and 'bc' words CANNOT
    // be explained compositionally without splitting probability mass
    // across competing sub-pieces — the MLE keeps 'abc' whole.
    val atom = Unigram.train(
      Map("abc" -> 100L, "ab" -> 10L, "bc" -> 10L), vocabSize = 3)
    assert(atom.exists(_._1 == "abc"), s"table must keep 'abc': $atom")
    val packed = Unigram.viterbiPacked("abc", lpMap(atom), 8)
    assert((-packed) % 64 == 1,
      s"'abc' must tokenize to ONE piece under $atom, got ${(-packed) % 64}")
  }

  test("viterbiPacked equals brute-force enumeration on random piece tables") {
    val rnd = new scala.util.Random(4242)
    (1 to 60).foreach { trial =>
      val alphabet = "abcd"
      // random multi-char pieces over a tiny alphabet force dense tie
      // structure; scores are multiples the packed radix must order
      val multis = (1 to 6).map { _ =>
        val len = 2 + rnd.nextInt(3)
        (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.distinct
      val pieces = (alphabet.map(_.toString) ++ multis).distinct
        .map(p => p -> -(1L + rnd.nextInt(5000000)).toLong).toMap
      val w = (1 to (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(4))).mkString
      val got = Unigram.viterbiPacked(w, lpMap(pieces.toSeq), 8)
      val want = bruteBest(w, pieces, 8)
      assert(got == want, s"trial $trial word $w: $got != $want")
    }
  }

  test("equal-score ties break to FEWER pieces by the packed radix") {
    // 'ab' scores exactly a+b, so both segmentations tie on score;
    // the packed long must prefer the single piece
    val pieces = Seq("a" -> -1000000L, "b" -> -2000000L, "ab" -> -3000000L)
    val packed = Unigram.viterbiPacked("ab", lpMap(pieces), 8)
    assert((-packed) % 64 == 1, "tie must resolve to one piece")
    assert(-((-packed) / 64) == -3000000L)
  }

  test("unknown single chars score UnkLpMicro; unknown multi-chars never used") {
    val pieces = Seq("a" -> -1000000L)
    val packed = Unigram.viterbiPacked("axa", lpMap(pieces), 8)
    assert((-packed) % 64 == 3)
    assert(-((-packed) / 64) == -2000000L + Unigram.UnkLpMicro)
  }

  test("words beyond 63 chars raise loudly (packed-radix bound)") {
    val pieces = Seq("a" -> -1000000L)
    intercept[IllegalArgumentException] {
      Unigram.viterbiPacked("a" * 64, lpMap(pieces), 8)
    }
    ()
  }

  test("pieceCounts is partition-independent and 0s empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Customer#000000042"),
      (2L, "Customer#000000042 Customer#000000042"),
      (3L, "###"),
      (4L, "")).toDF("id", "text")
    val table = graft.queries.UnigramQueries.UnigramPieces
    val one = Unigram.pieceCounts(docs.repartition(1), "id", "text", table)
      .orderBy("id").collect().map(_.toSeq)
    val many = Unigram.pieceCounts(docs.repartition(7), "id", "text", table)
      .orderBy("id").collect().map(_.toSeq)
    assert(one.toSeq == many.toSeq, "partitioning must not change results")
    val byId = one.map(r => r.head -> r).toMap
    assert(byId(3L)(1) == 0L && byId(4L)(1) == 0L, "empty docs → 0 words")
    // doc 2 = two names: exactly double doc 1's piece/char/lp accounting
    assert(byId(2L)(3) == 2L * byId(1L)(3).asInstanceOf[Long])
    assert(byId(2L)(4) == 2L * byId(1L)(4).asInstanceOf[Long])
  }

  /** Brute-force n-best: enumerate EVERY segmentation (the bruteBest
    * enumerator kept whole), packed-score each, top-n WITH
    * multiplicity. */
  private def bruteNbest(w: String, pieces: Map[String, Long],
      maxLen: Int, n: Int): Seq[Long] = {
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        segs(s.substring(l)).map(s.substring(0, l) +: _)
      }
    segs(w).flatMap { seg =>
      val scores = seg.map { p =>
        pieces.get(p).orElse(
          if (p.length == 1) Some(Unigram.UnkLpMicro) else None)
      }
      if (scores.exists(_.isEmpty)) None
      else Some(64L * scores.map(_.get).sum - seg.length)
    }.sorted(Ordering.Long.reverse).take(n)
  }

  test("nbestPacked equals brute-force enumeration (multiset top-4) on " +
      "random piece tables") {
    val rnd = new scala.util.Random(1717)
    (1 to 60).foreach { trial =>
      val alphabet = "abcd"
      val multis = (1 to 6).map { _ =>
        val len = 2 + rnd.nextInt(3)
        (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.distinct
      val pieces = (alphabet.map(_.toString) ++ multis).distinct
        .map(p => p -> -(1L + rnd.nextInt(5000000)).toLong).toMap
      val w = (1 to (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(4))).mkString
      val got = Unigram.nbestPacked(w, lpMap(pieces.toSeq), 8, 4).toSeq
      val want = bruteNbest(w, pieces, 8, 4)
      assert(got == want, s"trial $trial word $w: $got != $want")
      assert(got.head == Unigram.viterbiPacked(w, lpMap(pieces.toSeq), 8),
        "slot 0 must be the Viterbi optimum")
    }
  }

  test("samplePacked: draws stay inside the n-best, the diverse flag " +
      "tracks the value, and the empirical pick rate matches the " +
      "alpha-weights on a planted two-way lattice") {
    // every 2-char word over a..z has EXACTLY two segmentations with
    // identical scores: [c1c2] at −3e6 (the Viterbi slot) and [c1, c2]
    // at −4e6 — weight ratio 1e6 : floor(e^{−0.5}·1e6 + .5) = 606531,
    // so P(alt) = 606531 / 1606531 ≈ 0.37755. The 676 deterministic
    // hash draws are i.i.d.-like across spellings; σ ≈ 0.0186, the
    // assert sits at ~4σ. Fixed seed → a regression pin, not flaky.
    val chars = ('a' to 'z').map(c => c.toString -> -2000000L)
    val bigrams = for (a <- 'a' to 'z'; b <- 'a' to 'z')
      yield s"$a$b" -> -3000000L
    val table = chars ++ bigrams
    val lp = lpMap(table)
    val (ua, ub) = graft.ops.Dedup.hashCoefficients(1, 91L).head
    val words = for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$a$b"
    var alt = 0
    words.foreach { w =>
      val (np, sc, dv) = Unigram.samplePacked(w, lp, 8, 4, ua, ub)
      val nbest = Unigram.nbestPacked(w, lp, 8, 4)
      val packed = 64L * sc - np
      assert(nbest.contains(packed), s"$w: sample must come from the n-best")
      assert((dv == 1L) == (packed != nbest.head),
        s"$w: diverse flag must track the packed value")
      if (dv == 1L) {
        alt += 1
        assert(np == 2L && sc == -4000000L, s"$w: the alternative is [c1,c2]")
      } else assert(np == 1L && sc == -3000000L)
    }
    val frac = alt.toDouble / words.size
    val expected = 606531.0 / 1606531.0
    assert(math.abs(frac - expected) < 0.075,
      s"empirical alternative rate $frac must sit near $expected")
  }

  test("samplePacked: an unambiguous word always returns Viterbi") {
    val pieces = Seq("a" -> -1000000L)
    val (ua, ub) = graft.ops.Dedup.hashCoefficients(1, 91L).head
    val (np, sc, dv) = Unigram.samplePacked("aaa", lpMap(pieces), 8, 4, ua, ub)
    assert(np == 3L && sc == -3000000L && dv == 0L,
      "a single-path lattice leaves nothing to sample")
  }

  test("pieceCountsSampled is partition-independent (the draw is a pure " +
      "function of the word)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"Customer#0000000$i 42pack"))
      .toDF("id", "text")
    val table = graft.queries.UnigramQueries.UnigramPieces
    val one = Unigram.pieceCountsSampled(docs.repartition(1), "id", "text", table)
      .orderBy("id").collect().map(_.toSeq)
    val many = Unigram.pieceCountsSampled(docs.repartition(7), "id", "text", table)
      .orderBy("id").collect().map(_.toSeq)
    assert(one.toSeq == many.toSeq, "partitioning must not change the draws")
  }
}
