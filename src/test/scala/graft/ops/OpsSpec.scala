package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import TextAnalysis._

  test("token and ratio features") {
    import spark.implicits._
    val df = Seq((1L, "the quick fox"), (2L, "a a a b!")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), tokenCount(col("text")),
      stopwordRatio(col("text")), punctRatio(col("text"))).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getInt(1) == 3)
    assert(math.abs(r1.getDouble(2) - 1.0 / 3) < 1e-12)
    assert(r1.getDouble(3) == 0.0)
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getInt(1) == 4)
    assert(math.abs(r2.getDouble(2) - 0.75) < 1e-12)
    assert(math.abs(r2.getDouble(3) - 1.0 / 8) < 1e-12)
  }

  test("aucPpm: exact Mann-Whitney with half-weight ties — perfect " +
      "separation 1e6, constant score 500000, mixed case hand-checked") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Double)]): (Long, Long, Option[Long]) = {
      val r = aucPpm(rows.toDF("y", "score"), "y", "score").collect()(0)
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    // every positive above every negative
    assert(auc(Seq((1.0, 0.9), (1.0, 0.8), (0.0, 0.2), (0.0, 0.1)))
      == ((4L, 2L, Some(1000000L))))
    // one constant score: all ties at half weight
    assert(auc(Seq((1.0, 0.5), (1.0, 0.5), (0.0, 0.5)))
      == ((3L, 2L, Some(500000L))))
    // hand-check: pos at .9/.3, neg at .5/.3 ->
    // U2 = (.9: 2*2+0=4) + (.3 tie: 2*0+1=1) = 5; 5*1e6/(2*2*2) floor
    assert(auc(Seq((1.0, 0.9), (1.0, 0.3), (0.0, 0.5), (0.0, 0.3)))
      == ((4L, 2L, Some(625000L))))
    // a class absent -> NULL
    assert(auc(Seq((1.0, 0.7), (1.0, 0.2))) == ((2L, 2L, None)))
  }

  test("SetHitCount: hashed membership counts OCCURRENCES and equals the " +
      "HOF array_contains formulation") {
    import spark.implicits._
    import graft.functions.VectorExpressions.setHitCount
    val df = Seq(
      (1L, Seq("a", "b", "a", "c")),   // a counted twice, c once
      (2L, Seq.empty[String]),
      (3L, Seq("x", "y"))).toDF("id", "g")
    val got = df.select(col("id"), setHitCount(col("g"), Seq("a", "c", "zz")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 0, 3L -> 0))
    // empty set: always zero
    val z = df.select(setHitCount(col("g"), Seq.empty).as("h"))
      .collect().map(_.getInt(0)).toSeq
    assert(z == Seq(0, 0, 0))
    // random cross-check vs the interpreted filter/array_contains form
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 50).map(i => s"w$i")
    val docs = (0L until 40L).map(i =>
      (i, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))))
    val set = rnd.shuffle(vocab).take(17)
    val ddf = docs.toDF("id", "g")
    val native = ddf.select(col("id"), setHitCount(col("g"), set).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hof = ddf.select(col("id"),
        size(filter(col("g"), x => array_contains(typedlit(set), x))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == hof)
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("wordNGrams produces sliding windows") {
    import spark.implicits._
    val out = Seq(("w1 w2 w3 w4")).toDF("text")
      .select(wordNGrams(col("text"), 3).as("g")).head().getSeq[String](0)
    assert(out == Seq("w1 w2 w3", "w2 w3 w4"))
  }

  test("native wordNGrams matches the split/concat_ws HOF formulation bit-for-bit") {
    import spark.implicits._
    // The HOF form the native expression replaced: tokens =
    // split(text, " ") (trailing empties kept), n-grams re-joined
    // with " ". Edge cases on purpose: double spaces (empty tokens),
    // leading/trailing spaces, too-short docs, empty string, multibyte
    // UTF-8, and a null text (native: null out, like the HOF).
    def hofNGrams(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(text, " ")
      val count = size(toks) - (n - 1)
      when(count <= 0, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), count),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
    }
    val texts = Seq("a b c d e", "a  b c", " a b ", "ab", "", "é ü 漢 字 x",
      "one two", "x  ", "  x").map(Tuple1(_)).toDF("text")
    for (n <- Seq(1, 2, 3, 4)) {
      val rows = texts.select(
          wordNGrams(col("text"), n).as("nat"), hofNGrams(col("text"), n).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n row=$r")
      }
    }
    val nullRow = Seq(Tuple1[String](null)).toDF("text")
      .select(wordNGrams(col("text"), 3)).head()
    assert(nullRow.isNullAt(0))
  }

  test("langId runs end-to-end and predicts a known lang") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      // two artificial 'languages' with disjoint character inventories
      if (i % 2 == 0) (i.toLong, "aaab aabb abab aaab abba", "aa")
      else (i.toLong, "zzzy zzyy zyzy zzzy zyyz", "zz")
    }.toDF("doc_id", "text", "lang")
    // profileSampleMod=1: profile every doc — this tiny corpus alternates
    // langs by parity, so the default mod-10 sample would see one lang only
    val out = TextAnalysis.langId(docs, profileSize = 50, profileSampleMod = 1)
    val acc = out.select(avg(when(col("predicted") === col("actual"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0, s"accuracy $acc")
  }
}

class DedupSpec extends SparkTestBase {
  import Dedup._

  private def corpusWithDups() = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu")
    val base = (0L until 60L).map { i =>
      (i, Seq.fill(100)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // ids 1000+i are near-dups of i (first 10 docs, last 2 words dropped)
    val dups = base.take(10).map { case (i, t) =>
      (1000L + i, t.split(" ").dropRight(2).mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("softDedupWeights: weight 1e6/c per member, cluster mass ≈ one doc, partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa"), (2L, "aaa"), (3L, "aaa"), // 3-way cluster
      (4L, "bbb"), (5L, "bbb"),              // pair
      (6L, "ccc")                            // unique
    ).toDF("doc_id", "text")
    val got = softDedupWeights(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((3L, 333333L)), 2L -> ((3L, 333333L)), 3L -> ((3L, 333333L)),
      4L -> ((2L, 500000L)), 5L -> ((2L, 500000L)),
      6L -> ((1L, 1000000L))), s"got $got")
    // every input doc survives (soft, not hard, dedup) and cluster mass
    // sums to ≤ 1e6 with the floor deficit bounded by c
    assert(got.size == 6)
    assert(got.values.filter(_._1 == 3L).map(_._2).sum == 999999L)
    val repart = softDedupWeights(docs.repartition(7), "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(repart == got)
  }

  test("paragraphDedup: first occurrence wins, rewrites are positional, partition-invariant") {
    import spark.implicits._
    // doc 1: chunks A B; doc 2: chunks B C (B repeats cross-doc);
    // doc 3: full copy of doc 1 (all chunks lost); doc 4: unique
    val A = (1 to 4).map(i => s"a$i").mkString(" ")
    val B = (1 to 4).map(i => s"b$i").mkString(" ")
    val C = (1 to 4).map(i => s"c$i").mkString(" ")
    val D = (1 to 4).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, s"$A $B"), (2L, s"$B $C"), (3L, s"$A $B"), (4L, D))
      .toDF("doc_id", "text")
    val got = paragraphDedup(docs, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 2L, s"$A $B"))) // first occurrence keeps all
    assert(got(2L) === ((2L, 1L, C)))        // B was doc 1's; C survives
    assert(got(3L) === ((2L, 0L, "")))       // full duplicate: empty
    assert(got(4L) === ((1L, 1L, D)))
    // ragged tail chunk (len not divisible by w) still round-trips
    val ragged = Seq((9L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val rag = paragraphDedup(ragged, "doc_id", "text", w = 4)
      .collect().head
    assert(rag.getLong(1) === 2L && rag.getString(3) === "x1 x2 x3 x4 x5 x6")
    // partition invariance (winner rule is a total order, not arrival order)
    val again = paragraphDedup(docs.repartition(7), "doc_id", "text", w = 4)
      .collect().map(r => r.toSeq).toSet
    assert(again === paragraphDedup(docs, "doc_id", "text", w = 4)
      .collect().map(_.toSeq).toSet)
  }

  test("dupSpanRemoval: overlapping-window grain removes embedded spans " +
      "the disjoint-chunk pass misses; first occurrence survives; " +
      "within-doc repeats removed; partition-invariant") {
    import spark.implicits._
    // doc 1 holds the 6-token span S; doc 2 embeds S mid-document
    // between unique filler; doc 3 repeats a 4-window WITHIN itself;
    // doc 4 shares nothing. w = 4.
    val S = (1 to 6).map(i => s"s$i").mkString(" ")
    val R = (1 to 4).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"p1 p2 $S p3"),
      (2L, s"q1 q2 q3 $S q4 q5"),
      (3L, s"$R m1 m2 $R"),
      (4L, "z1 z2 z3 z4 z5")).toDF("doc_id", "text")
    val got = dupSpanRemoval(docs, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    // doc 1 is the first occurrence of every S-window: untouched
    assert(got(1L) === ((9L, 0L, s"p1 p2 $S p3")))
    // doc 2 loses exactly the 6 embedded S positions, fillers survive
    // (a chunk-grain pass with the span straddling a boundary would
    // have left parts of S behind)
    assert(got(2L) === ((11L, 6L, "q1 q2 q3 q4 q5")))
    // doc 3's second R occurrence (within the SAME doc) is removed
    assert(got(3L) === ((10L, 4L, s"$R m1 m2")))
    assert(got(4L) === ((5L, 0L, "z1 z2 z3 z4 z5")))
    // shorter than w: no windows, returned intact
    val short = dupSpanRemoval(Seq((9L, "x1 x2")).toDF("doc_id", "text"),
      "doc_id", "text", w = 4).collect().head
    assert(short.getLong(1) === 2L && short.getLong(2) === 0L &&
      short.getString(4) === "x1 x2")
    // partition invariance (winner rule is a total order)
    val again = dupSpanRemoval(docs.repartition(7), "doc_id", "text", w = 4)
      .collect().map(_.toSeq).toSet
    assert(again === dupSpanRemoval(docs, "doc_id", "text", w = 4)
      .collect().map(_.toSeq).toSet)
  }

  test("dupSpanRemoval: reassembly is linear on a heavily-duplicated LONG " +
      "doc (the merge-scan bound), and the result is the exact rewrite") {
    import spark.implicits._
    // 4,000-token doc that is ONE span repeated 400 times: coverage c is
    // ~n, the worst case for the old O(n·c) per-token array_contains
    // probe (~1.6e7 interpreted compares here; 1e8 at 10k tokens). The
    // native sorted merge-scan walks tokens and cov once each — this
    // must complete in seconds, and the rewrite must keep exactly the
    // FIRST occurrence of the repeated unit.
    val unit = (1 to 10).map(i => s"u$i").mkString(" ")
    val longDoc = Seq.fill(400)(unit).mkString(" ")
    val t0 = System.nanoTime()
    val row = dupSpanRemoval(Seq((1L, longDoc)).toDF("doc_id", "text"),
      "doc_id", "text", w = 8).collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(row.getLong(1) === 4000L)
    // every window past the first unit repeats -> all but the first-
    // occurrence prefix is covered; the survivor is the leading tokens
    // whose positions no later window claimed
    assert(row.getString(4) === unit, s"survivor was '${row.getString(4)}'")
    assert(row.getLong(2) === 3990L)
    assert(secs < 30.0, f"reassembly took $secs%.1f s — n·c shape is back")
  }

  test("charSpanRemoval: catches a short boilerplate snippet BELOW the " +
      "token-window grain that dupSpanRemoval is blind to; first " +
      "occurrence survives; partition-invariant") {
    import spark.implicits._
    // the 24-char snippet is ~4 words — under d16's 8-token grain —
    // embedded mid-doc between unique text; w=20 char windows inside
    // it repeat, so char-grain removal excises it exactly
    val snippet = "accept all cookies now!" // 23 chars
    val docs = Seq(
      (1L, s"first page $snippet body one unique aaa"),
      (2L, s"other page text $snippet more unique bbb"),
      (3L, "completely unrelated content here zzz")).toDF("doc_id", "text")
    val got = Dedup.charSpanRemoval(docs, "doc_id", "text", w = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(4)))).toMap
    // doc 1 holds the global first occurrence: untouched
    assert(got(1L)._1 === 0L && got(1L)._2 ===
      s"first page $snippet body one unique aaa")
    // doc 2 loses a contiguous char span covering the snippet (the
    // union of its repeated 20-char windows, which may extend into
    // the identical surrounding spaces); the unique tail survives
    assert(got(2L)._2.endsWith("more unique bbb") &&
      !got(2L)._2.contains("cookies"), s"got '${got(2L)._2}'")
    assert(got(2L)._1 >= snippet.length.toLong)
    assert(got(3L) === ((0L, "completely unrelated content here zzz")))
    // the TOKEN grain at w=8 sees no repeated 8-token window here
    val tokenGrain = Dedup.dupSpanRemoval(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tokenGrain.values.forall(_ == 0L),
      s"8-token grain must be blind to the 4-word snippet: $tokenGrain")
    val again = Dedup.charSpanRemoval(docs.repartition(5),
      "doc_id", "text", w = 20).collect().map(_.toSeq).toSet
    assert(again === Dedup.charSpanRemoval(docs, "doc_id", "text", w = 20)
      .collect().map(_.toSeq).toSet)
  }

  test("dupSpanRemoval/paragraphDedup: order-key pack overflow fails " +
      "LOUDLY instead of silently colliding keys") {
    import spark.implicits._
    // id past Long.Max/10^6: the packed key id*10^6+i would collide/
    // overflow; the in-plan guard must raise, not mis-deduplicate
    val bigId = Long.MaxValue / 1000000L + 1L
    val docs = Seq((bigId, (1 to 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      dupSpanRemoval(docs, "doc_id", "text", w = 4).collect()
    }
    assert(e1.getMessage != null || e1.getCause != null)
    val e2 = intercept[Exception] {
      paragraphDedup(docs, "doc_id", "text", w = 4).collect()
    }
    assert(e2.getMessage != null || e2.getCause != null)
  }

  test("boilerplateChunkRemoval: a chunk at/over minOcc is removed from " +
      "EVERY doc including the first occurrence (the C4 cleaning rule " +
      "paragraphDedup's keep-global-first is not); under-threshold " +
      "repeats survive; partition-invariant") {
    import spark.implicits._
    // banner B is exactly one w=4 chunk, prepended to docs 1-3 (3
    // occurrences = minOcc); pair P repeats only twice (docs 4-5,
    // chunk-aligned) and must SURVIVE at minOcc=3
    val B = "accept all cookies now"
    val P = "only two copies here"
    val docs = Seq(
      (1L, s"$B a1 a2 a3 a4"),
      (2L, s"$B b1 b2 b3 b4"),
      (3L, s"$B c1 c2 c3 c4"),
      (4L, s"$P d1 d2 d3 d4"),
      (5L, s"$P e1 e2 e3 e4"),
      (6L, "f1 f2 f3 f4")).toDF("doc_id", "text")
    val got = Dedup.boilerplateChunkRemoval(docs, "doc_id", "text",
        w = 4, minOcc = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the banner is gone from ALL THREE docs — first occurrence too
    assert(got(1L) === ((2L, 1L, "a1 a2 a3 a4")))
    assert(got(2L) === ((2L, 1L, "b1 b2 b3 b4")))
    assert(got(3L) === ((2L, 1L, "c1 c2 c3 c4")))
    // two occurrences is below threshold: both copies intact
    assert(got(4L) === ((2L, 2L, s"$P d1 d2 d3 d4")))
    assert(got(5L) === ((2L, 2L, s"$P e1 e2 e3 e4")))
    assert(got(6L) === ((1L, 1L, "f1 f2 f3 f4")))
    val again = Dedup.boilerplateChunkRemoval(docs.repartition(7),
        "doc_id", "text", w = 4, minOcc = 3)
      .collect().map(_.toSeq).toSet
    assert(again === got.map { case (id, (nc, nk, t)) =>
      Seq(id, nc, nk, t) }.toSet)
  }

  test("minhash LSH finds planted near-duplicates") {
    val pairs = minHashCandidatePairs(corpusWithDups(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until 10L)
      assert(pairs.contains((i, 1000L + i)), s"missing planted pair $i")
  }

  test("simhash banding finds planted near-duplicates with small hamming") {
    val pairs = simHashCandidatePairs(corpusWithDups(), "doc_id", "text")
      .filter(col("hamming") <= 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0L until 10L).count(i => pairs.contains((i, 1000L + i)))
    assert(found >= 7, s"only $found/10 planted pairs found")
  }

  test("connected components resolve chains and separate clusters") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter forces several propagation rounds),
    // pair 10-11, isolated-by-edge 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val cc = connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L), cc.toString)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L && cc(21L) == 20L)
    assert(cc.size == 9)
  }

  test("pointer doubling converges in log rounds on a 1000-node path") {
    import spark.implicits._
    // worst case for plain min-propagation: a path needs diameter (999)
    // rounds; doubling needs ~log2
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // localSolve off: this spec pins the DISTRIBUTED doubling loop's
    // round count (the 2000-row edge state would otherwise take the
    // partition-local fast path)
    val (labels, rounds) = connectedComponentsWithRounds(edges, maxIter = 15,
      localSolve = false)
    val comps = labels.select("component").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq == Seq(0L), s"components: ${comps.toSeq}")
    assert(labels.count() == 1000L)
    // ≤10 label-changing rounds + 1 convergence probe
    assert(rounds <= 11, s"took $rounds rounds")
  }

  test("dedupeCorpus keeps one representative per exact and near-dup group") {
    import spark.implicits._
    // wide vocabulary so distinct originals are GENUINELY dissimilar
    // (the 12-word corpusWithDups vocab makes chance near-dups possible,
    // which is correct dedup behavior but wrong for this assertion)
    val rnd = new scala.util.Random(47)
    val vocab = Vector.tabulate(500)(i => s"w$i")
    val base = (0L until 60L).map { i =>
      (i, Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = base.take(10).map { case (i, t) =>
      (1000L + i, t.split(" ").dropRight(2).mkString(" "))
    }
    val exactDups = base.slice(20, 22).map { case (i, t) => (2000L + i, t) }
    val corpus = (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
    val out = Dedup.dedupeCorpus(corpus, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    // every original survives; every planted copy is removed
    assert((0L until 60L).forall(out.contains), "an original was dropped")
    for (i <- 0L until 10L) assert(!out.contains(1000L + i), s"near-dup $i survived")
    assert(!out.contains(2020L) && !out.contains(2021L), "exact copy survived")
    assert(out.size == 60, s"${out.size} survivors")
  }

  test("clusterRepresentatives crowns the highest-score member, not the min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size, split}
    val rnd = new scala.util.Random(43)
    val vocab = Vector.tabulate(500)(i => s"w$i")
    val base = (0L until 30L).map { i =>
      (i, Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // truncated copies sit at LOWER ids than their originals, so the
    // two policies genuinely disagree: min-id-wins (dedupeCorpus, and
    // the component LABEL) picks the truncation, score-wins must pick
    // the 80-token original at the high id
    val originals = base.map { case (i, t) => (10000L + i, t) }
    val truncated = base.take(8).map { case (i, t) =>
      (i, t.split(" ").dropRight(3).mkString(" "))
    }
    val reps = Dedup.clusterRepresentatives(
        (originals ++ truncated).toDF("doc_id", "text"), "doc_id", "text",
        score = size(split(col("text"), " ")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(reps.keySet === (0L until 8L).toSet,
      s"components label by their min id: ${reps.keySet}")
    for (i <- 0L until 8L) {
      val (rep, score, sz) = reps(i)
      assert(rep == 10000L + i, s"cluster $i crowned $rep, want ${10000L + i}")
      assert(score == 80L, s"rep score $score")
      assert(sz == 2L, s"cluster $i size $sz")
    }
  }

  test("span census survives a viral span and plans no window") {
    import spark.implicits._
    // the degenerate case spanCensus must survive at scale: ONE 6-token
    // boilerplate span planted in every document (plus a unique tail per
    // doc). A window-over-span-hash formulation would put all 2000
    // (doc, hash) rows of the viral hash into one unsplittable window
    // task; the two-level aggregate shrinks it map-side and the
    // join-back is AQE-skew-splittable.
    val viral = "v1 v2 v3 v4 v5 v6"
    val docs = (0L until 2000L)
      .map(i => (i, s"$viral u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))
      .toDF("doc_id", "text")
    val out = Dedup.spanCensus(docs, "doc_id", "text", w = 6)
    // 12 tokens -> 7 windows/doc; only the pure-viral window is shared
    val rows = out.collect()
    assert(rows.length == 2000, s"${rows.length} rows")
    assert(rows.forall(_.getLong(1) == 7L), "expected 7 spans per doc")
    assert(rows.forall(_.getLong(2) == 1L), "expected exactly 1 shared span per doc")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"census must not plan a window:\n$plan")
  }

  test("full-width span keys separate a narrow-key collision") {
    import spark.implicits._
    // Two DIFFERENT spans in two docs that collide on the narrow 52-bit
    // plane (h) but differ on the second plane (h2) — the planted
    // collision the 104-bit key must separate. censusOverKeys is the
    // exact census machinery spanCensus runs after hashing; planting at
    // the key level is the only honest option (a genuine md5-52
    // collision needs ~2^26 hash evaluations).
    val spans = Seq(
      (1L, 777L, 10L), // doc 1, span A: h = 777, h2 = 10
      (2L, 777L, 20L), // doc 2, span B: h = 777 (collision!), h2 = 20
      (1L, 111L, 30L), // unshared filler spans
      (2L, 222L, 40L))
      .toDF("doc_id", "h", "h2")
    val narrow = Dedup.censusOverKeys(spans.select("doc_id", "h"), "doc_id", Seq("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // narrow key: the collision reads as a shared span in both docs
    assert(narrow == Map(1L -> 1L, 2L -> 1L), s"narrow: $narrow")
    val wide = Dedup.censusOverKeys(spans, "doc_id", Seq("h", "h2")).collect()
    assert(wide.isEmpty, s"wide key must separate the collision: ${wide.toSeq}")
  }

  test("fullWidthKeys census agrees with the default at collision-free scale") {
    import spark.implicits._
    val docs = (0L until 200L).map { i =>
      val shared = "s1 s2 s3 s4 s5 s6"
      if (i % 3 == 0) (i, s"$shared a${i}b c${i}d e${i}f g${i}h i${i}j k${i}l")
      else (i, s"x${i}a x${i}b x${i}c x${i}d x${i}e x${i}f x${i}g")
    }.toDF("doc_id", "text")
    val base = Dedup.spanCensus(docs, "doc_id", "text", w = 6)
      .orderBy("doc_id").collect().toSeq
    val full = Dedup.spanCensus(docs, "doc_id", "text", w = 6, fullWidthKeys = true)
      .orderBy("doc_id").collect().toSeq
    assert(base.nonEmpty && base == full)
  }

  test("multi-level union-find contraction resolves an E >> V graph without shuffles") {
    import spark.implicits._
    // 3M edges over 1000 nodes (the mass-duplication regime): random
    // bulk edges within each parity class plus a deterministic spine
    // guaranteeing exactly two components (evens -> 0, odds -> 1).
    // 6M symmetric rows > one 2M-row loop partition, so the CONTRACTION
    // path must run multiple narrow levels — not the one-partition
    // fast path and not the doubling loop.
    val bulk = spark.range(0, 3000000L).select(
      (col("id") % 500 * 2 + col("id") % 2).as("id_a"),
      ((col("id") * 7919) % 500 * 2 + col("id") % 2).as("id_b"))
    val spine = spark.range(0, 499L)
      .select((col("id") * 2).as("id_a"), (col("id") * 2 + 2).as("id_b"))
      .union(spark.range(0, 499L)
        .select((col("id") * 2 + 1).as("id_a"), (col("id") * 2 + 3).as("id_b")))
    val (labels, levels) = connectedComponentsWithRounds(bulk.union(spine))
    val cc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 1000, s"${cc.size} nodes labeled")
    assert(cc.forall { case (id, c) => c == id % 2 },
      s"bad labels: ${cc.filterNot { case (id, c) => c == id % 2 }.take(5)}")
    assert(levels >= 2, s"expected multi-level contraction, got $levels")
  }

  test("alt-star CC produces identical labels and comparable rounds") {
    import spark.implicits._
    // same graph as the doubling spec: chain + two pairs
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val cc = connectedComponentsAltStar(edges)._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L), cc.toString)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L && cc(21L) == 20L)
    assert(cc.size == 9)
    // 1000-node path: the simulated round parity with pointer doubling
    // (11 incl. the convergence probe)
    val path = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = connectedComponentsAltStar(path, maxIter = 20)
    val comps = labels.select("component").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq == Seq(0L), s"components: ${comps.toSeq}")
    assert(labels.count() == 1000L)
    assert(rounds <= 12, s"took $rounds rounds")
  }

  test("alt-star over MinHash candidate pairs matches the doubling labels") {
    import spark.implicits._
    // planted near-dup corpus: 3 clusters of word-level near-copies plus
    // unrelated singletons — the composition d07b used to drive before
    // switching its driver gate to a generated graph
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs for the long trip home",
      "how vexingly quick daft zebras jump across the wide open plains")
    val docs = base.zipWithIndex.flatMap { case (t, i) =>
      val words = t.split(" ")
      Seq((i * 10L, t), (i * 10L + 1, words.dropRight(1).mkString(" ")),
        (i * 10L + 2, words.dropRight(2).mkString(" ")))
    } ++ Seq((900L, "completely unrelated text about spark query planning"),
      (901L, "another disjoint document mentioning gaussian process kernels"))
    val pairs = minHashCandidatePairs(docs.toDF("doc_id", "text"), "doc_id", "text")
    assert(pairs.count() >= 3, "planted near-dups must produce candidates")
    val viaAlt = connectedComponentsAltStar(pairs)._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDoubling = connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAlt == viaDoubling)
  }

  test("connectedComponents leaves no cache entries behind") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val cc = connectedComponents(edges)
    cc.count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "connectedComponents must not leak persisted frames")
  }

  test("oversized LSH buckets star-collapse instead of exploding quadratically") {
    import spark.implicits._
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (0L until 100L).map(i => (i, text)).toDF("doc_id", "text")
    // cap of 8 ≪ 100 identical docs: every band bucket holds all 100 ids,
    // so pairs must be the 99-edge star to the min id, not C(100,2)=4950
    val capped = minHashCandidatePairs(docs, "doc_id", "text", maxBucket = 8)
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 99, s"expected 99 star pairs, got ${pairs.size}")
    assert(pairs.forall(_._1 == 0L), "star pairs must anchor at the bucket min")
    // connectivity is preserved: one cluster holding every doc
    val cc = connectedComponents(capped.sparkSession
      .createDataFrame(pairs.toSeq.map(p => (p._1, p._2))).toDF("id_a", "id_b"))
    assert(cc.select("component").distinct().count() == 1L)
    // under the cap, expansion is exhaustive as before
    val small = (0L until 5L).map(i => (i, text)).toDF("doc_id", "text")
    assert(minHashCandidatePairs(small, "doc_id", "text").count() == 10L)
  }

  test("cosineCandidatePairs bounds mass-duplicate buckets with a cosine-checked star") {
    import spark.implicits._
    val dim = 8
    // 100 identical embeddings — every table puts them all in ONE
    // bucket, far over the cap of 8; the streamed star must bound the
    // expansion at n-1 pairs (not C(100,2) = 4950)
    val dup = (0L until 100L).map(i => (i, Array.tabulate(dim)(d => 1.0 + d)))
    // axis-aligned singletons (one per axis): pairwise cosine 0, never candidates
    val others = (100L until 108L).map(i =>
      (i, Array.tabulate(dim)(d => if (d == (i % dim).toInt) -5.0 else 0.0)))
    // one genuine near-dup pair through the SMALL-bucket path, in an
    // alternating-sign direction (cosine ≈ -0.1 to the dup block, so
    // they can never pair with it)
    val near = Seq(
      (200L, Array.tabulate(dim)(d => if (d % 2 == 0) 3.0 else -3.0)),
      (201L, Array.tabulate(dim)(d => (if (d % 2 == 0) 3.0 else -3.0) + 0.001 * d)))
    val df = (dup ++ others ++ near).toDF("id", "v")
    val pairs = cosineCandidatePairs(df, "id", "v", threshold = 0.9,
      dim = dim, planes = 4, tables = 2, seed = 1, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val starPairs = pairs.filter(_._2 < 100L)
    assert(starPairs == (1L until 100L).map(x => (0L, x)).toSet,
      s"oversized bucket must star to its min id (got ${starPairs.size} pairs)")
    assert(pairs.contains((200L, 201L)), "small-bucket near-dup pair missed")
    // no false positives: every other pair failed the exact cosine recheck
    assert(pairs == starPairs + ((200L, 201L)), s"unexpected pairs: ${pairs -- starPairs - ((200L, 201L))}")
  }

  test("native CosinePairsGE matches the explode(unorderedPairs)+cosine-filter formulation") {
    import spark.implicits._
    // Random buckets incl. identical vectors (cosine exactly 1), a zero
    // vector (denom 0 -> never passes), a mismatched-length vector
    // (cosine null in the old filter -> never passes), and thresholds
    // straddling typical scores. The old formulation is rebuilt inline
    // and the two pair sets must agree bucket-for-bucket.
    val rnd = new scala.util.Random(7)
    def vec(d: Int) = Array.fill(d)(rnd.nextInt(5).toDouble - 2.0)
    val entries = (0L until 40L).map { i =>
      val v = if (i == 7L) Array.fill(6)(0.0)           // zero vector
        else if (i == 11L) vec(4)                        // wrong length
        else if (i % 10 == 3) Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0) // dups
        else vec(6)
      (i, v)
    }
    val df = entries.toDF("id", "v")
      .groupBy((col("id") % 3).as("g"))
      .agg(collect_list(struct(col("id"), col("v"))).as("ids"))
    for (thr <- Seq(0.0, 0.5, 0.9, 1.0)) {
      val native = df.select(explode(
          graft.functions.VectorExpressions.cosinePairsGE(col("ids"), thr)).as("p"))
        .select(col("p.a"), col("p.b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the pre-CosinePairsGE formulation, verbatim
      val hofPairs = flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, greatest(size(col("ids")) - i - 1, lit(0))), b =>
          struct(least(a, b).as("a"), greatest(a, b).as("b")))))
      val old = df.select(explode(hofPairs).as("p"))
        .select(col("p.a.id").as("id_a"), col("p.a.v").as("va"),
          col("p.b.id").as("id_b"), col("p.b.v").as("vb"))
        .filter(graft.functions.VectorExpressions.cosine(col("va"), col("vb")) >= thr)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(native == old, s"thr=$thr native=$native old=$old")
    }
  }

  test("jaccard matches hand computation") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(math.abs(j - 2.0 / 4.0) < 1e-12)
  }

  test("shingleHashes drops short docs and hashes trigrams") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val rows = shingleHashes(df, "doc_id", "text").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    assert(rows.length == 2) // "a b c", "b c d"
  }
}

class HllSpec extends SparkTestBase {

  test("HLL estimate lands within 5% of the exact distinct count") {
    import spark.implicits._
    import graft.functions.VectorExpressions.{hllDistinct, md5Hash52}
    // 40 partitions force partial buffers + serialize/merge; values
    // repeat so exact-distinct (30k) != row count (120k)
    val df = spark.sparkContext.parallelize(
      (0L until 120000L).map(i => s"value-${i % 30000}"), 40).toDF("s")
    val est = df.agg(hllDistinct(md5Hash52(org.apache.spark.sql.functions.col("s"))))
      .head().getDouble(0)
    assert(math.abs(est - 30000.0) / 30000.0 < 0.05, s"estimate $est vs 30000")
  }

  test("HLL is insensitive to duplication and partitioning") {
    import spark.implicits._
    import graft.functions.VectorExpressions.{hllDistinct, md5Hash52}
    import org.apache.spark.sql.functions.col
    def estimate(copies: Int, partitions: Int): Double = spark.sparkContext
      .parallelize((0 until copies).flatMap(_ => (0L until 5000L).map(i => s"x$i")), partitions)
      .toDF("s").agg(hllDistinct(md5Hash52(col("s")))).head().getDouble(0)
    // same distinct set -> identical registers -> identical estimate
    assert(estimate(copies = 1, partitions = 3) == estimate(copies = 4, partitions = 17))
  }
}

class KllSpec extends SparkTestBase {
  import org.apache.spark.sql.functions.col

  test("KLL quantile estimates stay within rank-error bound of exact") {
    import spark.implicits._
    // a shuffled 0..n-1 permutation: value == true rank, so the rank
    // error of an estimate reads off directly; 16 partitions force
    // partial-buffer merges through the whole level stack
    val n = 60000
    val xs = new scala.util.Random(7).shuffle((0 until n).toVector).map(_.toDouble)
    val df = spark.sparkContext.parallelize(xs, 16).toDF("x")
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = df.agg(graft.functions.VectorExpressions
      .kllQuantiles(col("x"), probs, k = 200).as("qs")).head().getSeq[Double](0)
    probs.zip(est).foreach { case (q, e) =>
      assert(math.abs(e / n - q) <= 0.02,
        s"rank error over 2% at q=$q: estimate $e (true ${q * n})")
    }
  }

  test("KLL is exact below the compaction threshold") {
    import spark.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("x")
    val est = df.agg(graft.functions.VectorExpressions
      .kllQuantiles(col("x"), Seq(0.5), k = 200).as("qs")).head().getSeq[Double](0)
    // 10 values all retained at level 0: the 0.5-quantile is the first
    // value whose cumulative weight reaches 5 — exactly 5.0
    assert(est.head == 5.0, s"expected exact median 5.0, got ${est.head}")
  }
}

class CmsSpec extends SparkTestBase {

  test("CMS estimates are exact-or-over, and tight for heavy hitters") {
    import spark.implicits._
    import graft.functions.VectorExpressions.{cmsEstimate, cmsSketch, polyHash}
    import org.apache.spark.sql.functions._
    // zipf-ish: item k appears 12000/k times; 33 partitions force
    // partial sketches + elementwise-add merge
    val rows = (1 to 300).flatMap(k => Seq.fill(12000 / k)(s"item-$k"))
    val df = spark.sparkContext.parallelize(rows, 33).toDF("s")
    val sketch = df.agg(cmsSketch(polyHash(col("s"))).as("sk"))
    val got = df.groupBy("s").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("s"), col("exact"),
        cmsEstimate(col("sk"), polyHash(col("s"))).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (s, exact, est) =>
      assert(est >= exact, s"CMS must never underestimate: $s $est < $exact")
    }
    val (_, e1, g1) = got.find(_._1 == "item-1").get
    assert(g1 - e1 <= e1 / 100, s"heavy hitter estimate too loose: $g1 vs $e1")
  }
}

class SimilaritySpec extends SparkTestBase {
  import Similarity._

  test("native expressions survive strict codegen and SQL registration") {
    import spark.implicits._
    // fail hard if the generated Java doesn't compile
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      val r = df.select(dot(col("a"), col("b")), cosine(col("a"), col("b")),
        sqDist(col("a"), col("b"))).head()
      assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
      assert(math.abs(r.getDouble(2) - 27.0) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")

    graft.spark.GraftExtensions.ensureRegistered(spark)
    val viaSql = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0)
    assert(math.abs(viaSql - 11.0) < 1e-12)

    // every sketch aggregate is reachable from plain SQL, kll included
    val kllSql = spark.range(1, 1001)
      .selectExpr("graft_kll(CAST(id AS DOUBLE), 200, array(0.5d)) AS q")
      .selectExpr("q[0]").head().getDouble(0)
    assert(math.abs(kllSql - 500.0) <= 1000 * 0.02, s"median via SQL was $kllSql")

    // int8 quantization: strict-codegen path and SQL registration
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val q = Seq(Seq(0.5, -1.0, 0.25), Seq(0.0, 0.0, 0.0)).toDF("v")
        .select(graft.functions.VectorExpressions.int8Quantize(col("v")).as("q"))
        .collect().map(_.getSeq[Int](0))
      assert(q(0) == Seq(64, -127, 32), q(0).toString)   // floor(x*127+0.5)
      assert(q(1) == Seq(0, 0, 0), "zero vector must quantize to zeros")
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    val int8Sql = spark.sql("SELECT graft_int8(array(1.0d, -0.5d))").head().getSeq[Int](0)
    assert(int8Sql == Seq(127, -63), int8Sql.toString)  // floor(-63.5+0.5) = -63
  }

  test("graft_topk aggregate survives partial aggregation and breaks ties by id") {
    import spark.implicits._
    import graft.functions.VectorExpressions.topKByScore
    // 40 partitions force partial heaps + serialize/merge; two groups;
    // deliberate score ties (score = v/10 truncated) broken by lower id
    val df = spark.sparkContext.parallelize(
      (0L until 400L).map(i => (i % 2, i, (i / 10L).toDouble)), 40)
      .toDF("g", "id", "score")
    val rows = df.groupBy("g")
      .agg(topKByScore(col("id"), col("score"), 3).as("topk"))
      .select(col("g"), col("topk")).collect()
    val byG = rows.map(r => r.getLong(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getDouble(1)))).toMap
    // group 0: even ids; max score 39.0 from ids 390..398, lowest ids win
    assert(byG(0L) == Seq((390L, 39.0), (392L, 39.0), (394L, 39.0)), byG(0L).toString)
    assert(byG(1L) == Seq((391L, 39.0), (393L, 39.0), (395L, 39.0)), byG(1L).toString)
  }

  test("native expressions return NULL on array length mismatch") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(dot(col("a"), col("b")), cosine(col("a"), col("b")),
      sqDist(col("a"), col("b"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"length mismatch must not silently truncate: $r")
  }

  test("cosine and sqDist match hand computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 2.0)), (Seq(1.0, 1.0), Seq(2.0, 2.0)))
      .toDF("a", "b")
    val rows = df.select(cosine(col("a"), col("b")), sqDist(col("a"), col("b"))).collect()
    assert(math.abs(rows(0).getDouble(0) - 0.0) < 1e-12)
    assert(math.abs(rows(0).getDouble(1) - 5.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - 2.0) < 1e-12)
  }

  test("brute-force knn returns exact neighbors in rank order") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val corpus = (100L until 400L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val queries = (0L until 5L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val got = knnBruteForce(qdf, cdf, "vec_id", "v", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = queries.flatMap { case (qid, qv) =>
      corpus.map { case (cid, cv) => (qid, cid, cos(qv, cv)) }
        .sortBy { case (_, cid, c) => (-c, cid) }
        .take(3).zipWithIndex.map { case ((_, cid, _), r) => (qid, r + 1, cid) }
    }.toSet
    assert(got == want)
  }

  test("rangeSearch returns exactly the at-or-above-tau pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val corpus = (100L until 400L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val queries = (0L until 5L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val tau = 0.3
    val got = rangeSearch(queries.toDF("vec_id", "v"), corpus.toDF("vec_id", "v"),
        "vec_id", "v", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (qid, qv) <- queries; (cid, cv) <- corpus if cos(qv, cv) >= tau
    } yield (qid, cid)).toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
    assert(want.nonEmpty, "fixture must produce hits for the test to bite")
  }

  test("MIPS top-k via norm augmentation equals true inner-product ranking") {
    import spark.implicits._
    // unnormalized vectors with wildly different norms — exactly the
    // regime where cosine top-k and inner-product top-k DISAGREE, so
    // the reduction (not the cosine machinery) is what's under test
    val rnd = new scala.util.Random(71)
    val corpus = (100L until 400L).map { i =>
      val scale = 0.1 + 5.0 * rnd.nextDouble()
      (i, Seq.fill(8)(rnd.nextGaussian() * scale))
    }
    val queries = (0L until 6L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val got = mipsBruteForce(queries.toDF("vec_id", "v"), corpus.toDF("vec_id", "v"),
      "vec_id", "v", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = queries.flatMap { case (qid, qv) =>
      corpus.map { case (cid, cv) =>
        (qid, cid, qv.zip(cv).map { case (x, y) => x * y }.sum)
      }.sortBy { case (_, cid, ip) => (-ip, cid) }
        .take(4).zipWithIndex.map { case ((_, cid, _), r) => (qid, r + 1, cid) }
    }.toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // sanity: plain cosine top-k DIFFERS here (norms matter for MIPS)
    val cosTop = knnBruteForce(queries.toDF("vec_id", "v"), corpus.toDF("vec_id", "v"),
      "vec_id", "v", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(cosTop != got, "test regime too easy: cosine and MIPS rankings coincide")
  }

  test("LSH MIPS achieves reasonable recall against exact MIPS") {
    import spark.implicits._
    // clustered directions (buckets meaningful — the cosine-LSH spec's
    // regime) with per-vector norm variation (the MIPS regime: top
    // inner products = aligned AND large-norm)
    val rnd = new scala.util.Random(83)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double], scale: Double) =
      c.map(x => (x + 0.3 * rnd.nextGaussian()) * scale).toSeq
    val corpus = (100L until 600L).map(i =>
      (i, near(centers((i % 5).toInt), 0.5 + 2.5 * rnd.nextDouble())))
    val queries = (0L until 10L).map(i => (i, near(centers((i % 5).toInt), 1.0)))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val exact = mipsBruteForce(qdf, cdf, "vec_id", "v", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = mipsLsh(qdf, cdf, "vec_id", "v", k = 5, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("IVF knn achieves high recall on clustered data") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 600L).map(i => (i, near(centers((i % 5).toInt))))
    val queries = (0L until 10L).map(i => (i, near(centers((i % 5).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val exact = knnBruteForce(qdf, cdf, "vec_id", "v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = knnIvf(qdf, cdf, "vec_id", "v", 5, clusters = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("replayable IVF quantizer: deterministic, quantized, high recall on clustered data") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 600L).map(i => (i, near(centers((i % 5).toInt))))
    val queries = (0L until 10L).map(i => (i, near(centers((i % 5).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val fit1 = Similarity.ivfQuantizerReplayable(cdf, "vec_id", "v", clusters = 8)
    val fit2 = Similarity.ivfQuantizerReplayable(
      cdf.repartition(7), "vec_id", "v", clusters = 8)
    assert(fit1.map(_.toSeq).toSeq == fit2.map(_.toSeq).toSeq,
      "quantizer must not depend on partitioning")
    // every coordinate lands on the 1e-6 grid (the cross-engine determinism contract)
    fit1.flatten.foreach { x =>
      assert(math.abs(x * 1e6 - math.rint(x * 1e6)) < 1e-7, s"unquantized coord $x")
    }
    val exact = knnBruteForce(qdf, cdf, "vec_id", "v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.knnIvfWithCenters(qdf, cdf, "vec_id", "v", 5, fit1, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("LSH knn achieves reasonable recall against exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    // clustered corpus so buckets are meaningful
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 600L).map(i => (i, near(centers((i % 5).toInt))))
    val queries = (0L until 10L).map(i => (i, near(centers((i % 5).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val exact = knnBruteForce(qdf, cdf, "vec_id", "v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = knnLsh(qdf, cdf, "vec_id", "v", 5, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("knnGraph: planted clusters stay intra-cluster, mutual filter symmetric, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    // two tight clusters far apart: every node's true neighbors are
    // cluster-mates, so the LSH graph must never cross clusters
    val c1 = Array.fill(16)(rnd.nextGaussian() * 3)
    val c2 = c1.map(-_)
    def near(c: Array[Double]) = c.map(_ + 0.05 * rnd.nextGaussian()).toSeq
    val rows = (0L until 20L).map(i => (i, near(if (i < 10) c1 else c2)))
    val df = rows.toDF("vec_id", "v")
    val g = Similarity.knnGraph(df, "vec_id", "v", k = 3, dim = 16,
      planes = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(g.nonEmpty)
    assert(g.forall { case (s, d) => (s < 10) == (d < 10) },
      s"cross-cluster edge in $g")
    // mutual graph is a symmetric subset of the directed graph
    val m = Similarity.knnGraph(df, "vec_id", "v", k = 3, dim = 16,
      planes = 4, tables = 4, mutual = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(m.subsetOf(g))
    assert(m.forall { case (s, d) => m.contains((d, s)) }, s"asymmetric: $m")
    // partitioning must not change either result
    val again = Similarity.knnGraph(df.repartition(7), "vec_id", "v", k = 3,
      dim = 16, planes = 4, tables = 4, mutual = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === m)
  }

  test("int8-quantized knn preserves high recall vs exact float knn") {
    import spark.implicits._
    import graft.functions.VectorExpressions.int8Quantize
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 600L).map(i => (i, near(centers((i % 5).toInt))))
    val queries = (0L until 10L).map(i => (i, near(centers((i % 5).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val exact = knnBruteForce(qdf, cdf, "vec_id", "v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def quant(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), int8Quantize(col("v")).as("q"))
    val q8 = knnBruteForce(quant(qdf), quant(cdf), "vec_id", "q", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(q8.contains).toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall")
  }

  test("PQ knn: trained codebooks, cluster precision, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 600L).map(i => (i, near(centers((i % 5).toInt))))
    val queries = (0L until 10L).map(i => (i, near(centers((i % 5).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val cb = Similarity.pqCodebooks(cdf, "vec_id", "v", m = 4, kcode = 16)
    // training must not depend on partitioning (ordered sample, seeded init)
    val cb2 = Similarity.pqCodebooks(cdf.repartition(7), "vec_id", "v", m = 4, kcode = 16)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq,
      "PQ codebooks must not depend on partitioning")
    // PQ's guarantee is COARSE geometry: quantization error is bounded
    // by per-subspace cell size, so neighbors come from the query's
    // planted cluster even though within-cluster ranking (points closer
    // together than the quantization grid) is approximate by design.
    val approx = Similarity.knnPq(qdf, cdf, "vec_id", "v", k = 5, cb)
    val got = approx.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => (q, rs.map(_._2).toSet) }
    val inCluster = got.toSeq.map { case (q, nbs) =>
      nbs.count(n => n % 5 == q % 5)
    }.sum
    val precision = inCluster.toDouble / (got.size * 5)
    assert(precision >= 0.9, s"PQ cluster precision $precision")
    // every reported distance is nonnegative and on the 1e-6 grid
    approx.collect().foreach { r =>
      val d = r.getDouble(3)
      assert(d >= 0.0 && math.abs(d * 1e6 - math.rint(d * 1e6)) < 1e-5, s"bad adist $d")
    }
    // the whole operator is partition-invariant (quantized ranking keys)
    val again = Similarity.knnPq(qdf.repartition(3), cdf.repartition(7),
      "vec_id", "v", k = 5, cb).collect().map(_.toSeq).toSet
    assert(again == approx.collect().map(_.toSeq).toSet, "partition-variant PQ result")
  }

  test("PQ rerank: full-width shortlist is exact even under degenerate " +
      "codebooks; narrow shortlist recall dominates raw ADC ranking") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 400L).map(i => (i, near(centers((i % 5).toInt))))
    val queries = (0L until 8L).map(i => (i, near(centers((i % 5).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val exact = knnBruteForce(qdf, cdf, "vec_id", "v", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val exactSet = exact.map(t => (t._1, t._3)).toSet
    // 1. kShort = |corpus| ⇒ stage 2 sees everything: the result is the
    //    exact ranking REGARDLESS of the codebooks — even adversarially
    //    useless ones (a single zero centroid per subspace, so every
    //    ADC distance ties and the shortlist order is id order).
    val junk = Array.fill(4)(Array(Array.fill(4)(0.0)))
    val full = Similarity.knnPqRerank(qdf, cdf, "vec_id", "v",
      k = 5, kShort = corpus.size, junk)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(full.sorted.toSeq == exact.sorted.toSeq,
      "full-width rerank must equal exact search under any codebooks")
    // 2. trained codebooks + narrow shortlist: recall@5 of the reranked
    //    result at least matches raw ADC's (the shortlist can only keep
    //    true neighbors ADC already ranked in, and reorders them right)
    val cb = Similarity.pqCodebooks(cdf, "vec_id", "v", m = 4, kcode = 16)
    val raw = Similarity.knnPq(qdf, cdf, "vec_id", "v", k = 5, cb)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rr = Similarity.knnPqRerank(qdf, cdf, "vec_id", "v",
      k = 5, kShort = 40, cb)
    val rrSet = rr.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rawRecall = exactSet.count(raw.contains).toDouble / exactSet.size
    val rrRecall = exactSet.count(rrSet.contains).toDouble / exactSet.size
    assert(rrRecall >= rawRecall,
      s"rerank recall $rrRecall must dominate raw ADC recall $rawRecall")
    assert(rrRecall >= 0.9, s"rerank recall $rrRecall")
    // 3. partition invariance (quantized rerank keys, deterministic heap)
    val again = Similarity.knnPqRerank(qdf.repartition(3), cdf.repartition(7),
      "vec_id", "v", k = 5, kShort = 40, cb).collect().map(_.toSeq).toSet
    assert(again == rr.collect().map(_.toSeq).toSet,
      "partition-variant rerank result")
  }

  test("binary kNN: packed-word Hamming equals the sign-disagreement " +
      "count; full-width shortlist is exact; recall holds on clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 300L).map(i => (i, near(centers((i % 4).toInt))))
    val queries = (0L until 8L).map(i => (i, near(centers((i % 4).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    val exact = knnBruteForce(qdf, cdf, "vec_id", "v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 1. full-width shortlist ⇒ the rerank sees everything: exact
    //    ranking regardless of how lossy the 1-bit sketch is
    val full = Similarity.knnBinary(qdf, cdf, "vec_id", "v",
        k = 5, kShort = corpus.size)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full == exact, "full-width binary rerank must equal exact search")
    // 2. shortlist sized past the same-cluster tie plateau (all ~50
    //    same-cluster members sit at near-zero Hamming, so a shortlist
    //    narrower than the cluster cuts on the id tie-break, not
    //    similarity — kShort must exceed the expected tie-bucket)
    val got = Similarity.knnBinary(qdf, cdf, "vec_id", "v", k = 5, kShort = 60)
    val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(gotSet.contains).toDouble / exact.size
    assert(recall >= 0.9, s"binary recall $recall")
    // 3. partition invariance (integer Hamming keys, quantized rerank)
    val again = Similarity.knnBinary(qdf.repartition(3), cdf.repartition(7),
      "vec_id", "v", k = 5, kShort = 60).collect().map(_.toSeq).toSet
    assert(again == got.collect().map(_.toSeq).toSet,
      "partition-variant binary kNN result")
  }

  test("binary kNN: dim contract raises in-plan on short and long vectors") {
    import spark.implicits._
    val ok = (0L until 4L).map(i => (i, Seq.fill(8)(i.toDouble + 0.5)))
    val cdf = ok.toDF("vec_id", "v")
    // short vector in the corpus: would zero-pad phantom sign bits
    val short = (cdf.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      :+ (99L, Seq.fill(5)(1.0))).toSeq.toDF("vec_id", "v")
    val eShort = intercept[Exception] {
      Similarity.knnBinary(cdf, short, "vec_id", "v",
        k = 2, kShort = 4, dim = 8).collect()
    }
    assert(eShort.getMessage.contains("!= dim=8"), eShort.getMessage)
    // long vector on the query side: Hamming would silently truncate
    val long = (ok :+ (98L, Seq.fill(12)(1.0))).toDF("vec_id", "v")
    val eLong = intercept[Exception] {
      Similarity.knnBinary(long, cdf, "vec_id", "v",
        k = 2, kShort = 4, dim = 8).collect()
    }
    assert(eLong.getMessage.contains("!= dim=8"), eLong.getMessage)
    // matching dim still goes through untouched
    val fine = Similarity.knnBinary(cdf, cdf, "vec_id", "v",
      k = 2, kShort = 4, dim = 8)
    assert(fine.count() == 8L)
  }

  test("IVF-PQ composite: probed-cell pruning + ADC keep cluster precision") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val planted = Array.fill(5)(Array.fill(16)(rnd.nextGaussian() * 2))
    def near(c: Array[Double]) = c.map(_ + 0.3 * rnd.nextGaussian()).toSeq
    val corpus = (100L until 600L).map(i => (i, near(planted((i % 5).toInt))))
    val queries = (0L until 10L).map(i => (i, near(planted((i % 5).toInt))))
    val cdf = corpus.toDF("vec_id", "v")
    val qdf = queries.toDF("vec_id", "v")
    // coarse quantizer = the planted centers themselves; PQ codebooks trained
    val cb = Similarity.pqCodebooks(cdf, "vec_id", "v", m = 4, kcode = 16)
    val approx = Similarity.knnIvfPq(qdf, cdf, "vec_id", "v", k = 5,
      planted, nprobe = 2, cb)
    val got = approx.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => (q, rs.map(_._2).toSet) }
    assert(got.size == 10, "every query must return neighbors")
    val inCluster = got.toSeq.map { case (q, nbs) =>
      nbs.count(n => n % 5 == q % 5)
    }.sum
    val precision = inCluster.toDouble / (got.size * 5)
    assert(precision >= 0.9, s"IVF-PQ cluster precision $precision")
    // partition invariance of the composed operator
    val again = Similarity.knnIvfPq(qdf.repartition(3), cdf.repartition(7),
      "vec_id", "v", k = 5, planted, nprobe = 2, cb)
      .collect().map(_.toSeq).toSet
    assert(again == approx.collect().map(_.toSeq).toSet,
      "partition-variant IVF-PQ result")
  }

  test("distributed k-means recovers planted clusters and matches a driver replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val trueCenters = Array.fill(3)(Array.fill(8)(rnd.nextGaussian() * 4))
    val pts = (0L until 300L).map(i =>
      (i, trueCenters((i % 3).toInt).map(_ + 0.2 * rnd.nextGaussian()).toSeq))
    val df = pts.toDF("id", "v").repartition(7)
    val centers = kmeansFitDistributed(df, "id", "v", k = 3, iters = 3)
    // every fitted center sits close to one distinct true center
    val matched = centers.map { c =>
      trueCenters.zipWithIndex.minBy { case (t, _) =>
        t.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum }._2
    }
    assert(matched.toSet.size == 3, s"centers collapsed: ${matched.toList}")
    centers.zip(matched).foreach { case (c, ti) =>
      val d = math.sqrt(trueCenters(ti).zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d < 0.5, s"center off by $d")
    }
    // partition count must not affect the fit (quantized update ⇒ the
    // aggregate, not aggregation order, defines the next centers)
    val centers1 = kmeansFitDistributed(df.repartition(1), "id", "v", k = 3, iters = 3)
    assert(centers.flatten.toSeq == centers1.flatten.toSeq)
    // driver replay of the same quantized Lloyd recursion agrees exactly
    val data = pts.map { case (i, v) => (i, v.toArray) }.sortBy(_._1)
    var ref: Array[Array[Double]] = data.take(3).map(_._2).toArray
    for (_ <- 0 until 3) {
      val assign = data.map { case (_, x) =>
        ref.zipWithIndex.minBy { case (c, ci) =>
          (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, ci) }._2 }
      ref = ref.indices.map { c =>
        val members = data.zip(assign).collect { case ((_, x), a) if a == c => x }
        if (members.isEmpty) ref(c)
        else Array.tabulate(8)(j =>
          math.floor(members.map(_(j)).sum / members.length * 1e6 + 0.5) / 1e6)
      }.toArray
    }
    assert(centers.flatten.toSeq == ref.flatten.toSeq)
  }

  test("annRecall: per-query intersection counts, zero-hit queries kept, ppm exact") {
    import spark.implicits._
    val exact = Seq( // two queries, k = 4
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L))
      .toDF("query_id", "neighbor_id")
    val ann = Seq( // q1 recovers 3/4; q2 recovers nothing (all wrong ids)
      (1L, 10L), (1L, 11L), (1L, 13L), (1L, 99L),
      (2L, 90L), (2L, 91L), (2L, 92L), (2L, 93L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.annRecall(ann, exact, k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 750000L)), 2L -> ((0L, 0L))), s"got $got")
    // duplicate retrieved ids (LSH multi-table artifacts) must not
    // double-count: the semi-join grades set membership
    val annDup = ann.union(Seq((1L, 10L)).toDF("query_id", "neighbor_id"))
    val dedup = Similarity.annRecall(annDup, exact, k = 4)
      .filter(col("query_id") === 1L).collect().head
    assert((dedup.getLong(1), dedup.getLong(2)) == ((3L, 750000L)))
  }

  test("knnGraphSearch: the beam walks a monotone-improving chain from a " +
      "poor entry to the true NN; partition-invariant; beam >= k enforced") {
    import spark.implicits._
    // corpus on the unit circle at shrinking angles from the query
    // (1, 0): cos improves 1 -> 2 -> 3 -> 4. The graph is ONLY the
    // chain 1->2->3->4, so reaching the true NN (4) from entry 1
    // requires three expand/score/trim rounds — exactly what beam
    // search provides and a flat bucket probe would miss.
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)),
      math.sin(math.toRadians(deg)))
    val corpus = Seq((1L, at(60)), (2L, at(40)), (3L, at(20)), (4L, at(5)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, at(0))).toDF("vec_id", "embedding")
    val graph = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Similarity.knnGraphSearch(queries, corpus, "vec_id",
        "embedding", graph, entries = Seq(1L), k = 2, beam = 2, rounds = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSortedByRank
    assert(got == Seq((1, 4L), (2, 3L)),
      s"beam must reach the true NN through the chain, got $got")
    // fewer rounds than the chain is long: the horizon honestly truncates
    val shallow = Similarity.knnGraphSearch(queries, corpus, "vec_id",
        "embedding", graph, entries = Seq(1L), k = 1, beam = 2, rounds = 1)
      .collect().map(_.getLong(2)).toSeq
    assert(shallow == Seq(2L), s"1 round reaches only the entry's edge: $shallow")
    // partition invariance (floor-quantized scores + id tie-breaks)
    val again = Similarity.knnGraphSearch(queries, corpus.repartition(5),
        "vec_id", "embedding", graph.repartition(3), entries = Seq(1L),
        k = 2, beam = 2, rounds = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSortedByRank
    assert(again == got)
    intercept[IllegalArgumentException] {
      Similarity.knnGraphSearch(queries, corpus, "vec_id", "embedding",
        graph, entries = Seq(1L), k = 3, beam = 2, rounds = 1)
    }
  }

  test("MatVecMul matches a driver-side replay; the Hadamard rotation is " +
      "orthonormal (distances preserved), so OPQ ranking semantics hold") {
    import spark.implicits._
    val h = Array.tabulate(64, 64)((r, i) =>
      if (java.lang.Integer.bitCount(r & i) % 2 == 0) 0.125 else -0.125)
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(5)(Array.fill(64)(rnd.nextGaussian()))
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")
    val got = df.select(col("id"),
        graft.functions.VectorExpressions.matVecMul(col("v"), h).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // bit-identical to the same sequential loop on the driver
    for ((v, i) <- vs.zipWithIndex) {
      val want = h.map(row => {
        var s = 0.0; var j = 0
        while (j < 64) { s += row(j) * v(j); j += 1 }; s
      })
      assert(got(i.toLong) == want.toSeq, s"row $i diverged")
    }
    // orthonormal: pairwise squared distances preserved to fp tolerance
    def sq(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- 0 until 4) {
      val before = sq(vs(i).toSeq, vs(i + 1).toSeq)
      val after = sq(got(i.toLong), got((i + 1).toLong))
      assert(math.abs(before - after) < 1e-9 * math.max(1.0, before))
    }
    // the composed OPQ pipeline: k rows per query, partition-invariant
    val corpus = (10L to 49L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian()).toSeq)).toDF("vec_id", "embedding")
    val queries = (0L to 2L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian()).toSeq)).toDF("vec_id", "embedding")
    val seeds = corpus.orderBy("vec_id").limit(16)
      .select(graft.functions.VectorExpressions.matVecMul(
        col("embedding").cast("array<double>"), h))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Array.tabulate(4)(j =>
      seeds.map(v => java.util.Arrays.copyOfRange(v, j * 16, (j + 1) * 16)))
    val res = Similarity.knnOpq(queries, corpus, "vec_id", "embedding",
      k = 3, h, cbs).collect()
    assert(res.length == 9 && res.map(_.getLong(0)).distinct.length == 3)
    val again = Similarity.knnOpq(queries.repartition(4),
      corpus.repartition(7), "vec_id", "embedding", k = 3, h, cbs)
      .collect().map(_.toSeq).toSet
    assert(again == res.map(_.toSeq).toSet)
  }

  test("kmeansParallelInit: picks one center per planted blob, never " +
      "duplicates a candidate, and is partition-invariant") {
    import spark.implicits._
    // 4 tight, well-separated blobs of 25 points each: the weighted
    // Gonzalez recluster over oversampled candidates must land exactly
    // one chosen center in each blob (k-means||'s whole point)
    val rnd = new scala.util.Random(11)
    def blobCenter(b: Int): Array[Double] =
      Array.tabulate(8)(i => if (i == b * 2) 50.0 else 0.0)
    val pts = for (b <- 0 until 4; j <- 0 until 25) yield {
      val c = blobCenter(b)
      ((b * 25 + j).toLong, c.map(_ + rnd.nextGaussian() * 0.5).toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val centers = Similarity.kmeansParallelInit(
      df, "vec_id", "embedding", k = 4, rounds = 2, ell = 8)
    assert(centers.length == 4)
    def nearestBlob(v: Array[Double]): Int =
      (0 until 4).minBy(b => v.zip(blobCenter(b))
        .map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(centers.map(nearestBlob).toSet == Set(0, 1, 2, 3),
      "each planted blob must own exactly one chosen center")
    // candidates never duplicate: every center is one of the input
    // points (cost-0 self-exclusion means re-sampling a candidate is
    // impossible, so all four are distinct corpus vectors)
    assert(centers.map(_.toSeq).distinct.length == 4)
    val again = Similarity.kmeansParallelInit(
      df.repartition(13), "vec_id", "embedding", k = 4, rounds = 2, ell = 8)
    assert(again.map(_.toSeq).toSeq == centers.map(_.toSeq).toSeq,
      "init must not depend on partitioning")
  }

  test("knnGraphSearch: beam expansion and corpus probes are BROADCAST " +
      "joins — the graph and vector sides never shuffle") {
    import spark.implicits._
    val corpus = (1L to 40L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val graph = (1L to 39L).map(i => (i, i + 1)).toDF("src", "dst")
    val plan = Similarity.knnGraphSearch(queries, corpus, "vec_id",
        "embedding", graph, entries = Seq(1L), k = 1, beam = 2, rounds = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"beam/candidate sides must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join in the search path:\n$plan")
  }

  private implicit class RankSort(rs: Array[(Int, Long)]) {
    def toSortedByRank: Seq[(Int, Long)] = rs.sortBy(_._1).toSeq
  }
}

class MultimodalSpec extends SparkTestBase {
  import Multimodal._

  test("packAsMedia + extractFeatures produce deterministic features") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "zzz"))
      .toDF("doc_id", "text")
    val media = packAsMedia(docs, "doc_id", "text")
    val feats = extractFeatures(media, batchSize = 2).collect()
    assert(feats.length == 3)
    val f1 = feats.find(_.media_id == 1L).get
    val f2 = feats.find(_.media_id == 2L).get
    val f3 = feats.find(_.media_id == 3L).get
    assert(f1.feature.toSeq == f2.feature.toSeq)
    assert(f1.feature.toSeq != f3.feature.toSeq)
    assert(f1.n_bytes == "hello world".getBytes("UTF-8").length)
    assert(f1.feature.length == 8)
    assert(f1.kind == "audio" && f2.kind == "image")
  }

  test("Arrow-batched decode path is row-identical to the mapPartitions twin") {
    import spark.implicits._
    // non-ASCII included: both paths must act on identical UTF-8 bytes
    val docs = (0L until 120L).map(i => (i, s"doc $i payload ż${i % 7}"))
      .toDF("doc_id", "text")
    val media = packAsMedia(docs, "doc_id", "text")
    def canon(rows: Array[Multimodal.MediaFeatures]) =
      rows.sortBy(_.media_id).map(f =>
        (f.media_id, f.kind, f.n_bytes, f.feature.toSeq)).toSeq
    val viaArrow = canon(extractFeaturesArrow(media).collect())
    val viaPartitions = canon(extractFeatures(media).collect())
    assert(viaArrow == viaPartitions)
  }

  test("ImageIO decode recovers exact RGB pixels from synthesized PNGs") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 5L, 17L).toDF("doc_id")
    val pngs = synthesizePngs(ids, "doc_id").collect()
    assert(pngs.length == 5)
    // PNG magic bytes prove these are genuine encoded images, not fakes
    pngs.foreach { r =>
      assert((r.img(0) & 0xff) == 0x89 && r.img(1) == 'P' && r.img(2) == 'N' && r.img(3) == 'G')
    }
    // per-pixel round trip: decode each blob and compare every RGB value
    pngs.foreach { r =>
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.img))
      val (w, h) = Multimodal.imageDims(r.media_id)
      assert(im.getWidth == w && im.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((im.getRGB(x, y) & 0xffffff) == Multimodal.pixelRgb(r.media_id, x, y),
          s"pixel ($x,$y) of image ${r.media_id}")
    }
  }

  test("decodeImages emits formula-exact channel sums and drops corrupt blobs") {
    import spark.implicits._
    val ids = (0L until 20L).toDF("doc_id")
    val good = synthesizePngs(ids, "doc_id")
    val corrupt = Seq(ImageRow(99L, Array[Byte](1, 2, 3, 4))).toDS()
    val stats = decodeImages(good.union(corrupt), batchSize = 7).collect()
    assert(stats.length == 20 && !stats.exists(_.media_id == 99L))
    stats.foreach { st =>
      val (w, h) = Multimodal.imageDims(st.media_id)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.pixelRgb(st.media_id, x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      assert(st.width == w && st.height == h)
      assert((st.sum_r, st.sum_g, st.sum_b) == ((sr, sg, sb)), s"image ${st.media_id}")
    }
  }

  test("downsampleImages: floor-mean 2x2 box filter is block-exact; corrupt blobs drop") {
    import spark.implicits._
    val ids = (0L until 20L).toDF("doc_id")
    val good = synthesizePngs(ids, "doc_id")
    val corrupt = Seq(ImageRow(99L, Array[Byte](9, 9, 9))).toDS()
    val stats = downsampleImages(good.union(corrupt), factor = 2, batchSize = 7).collect()
    assert(stats.length == 20 && !stats.exists(_.media_id == 99L))
    stats.foreach { st =>
      val (w, h) = Multimodal.imageDims(st.media_id)
      assert(st.width == w / 2 && st.height == h / 2)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (yy <- 0 until h / 2; xx <- 0 until w / 2) {
        var ar = 0; var ag = 0; var ab = 0
        for (dy <- 0 until 2; dx <- 0 until 2) {
          val p = Multimodal.pixelRgb(st.media_id, xx * 2 + dx, yy * 2 + dy)
          ar += (p >> 16) & 0xff; ag += (p >> 8) & 0xff; ab += p & 0xff
        }
        sr += ar / 4; sg += ag / 4; sb += ab / 4
      }
      assert((st.sum_r, st.sum_g, st.sum_b) == ((sr, sg, sb)), s"image ${st.media_id}")
    }
  }

  test("JPEG decode path: real lossy codec recovers dimensions") {
    // JPEG is lossy so sums aren't formula-exact — but the decode is the
    // same real ImageIO call, and dimensions must survive the round trip.
    val jpeg = Multimodal.encodePng(42L, format = "jpg")
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8) // JPEG SOI marker
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    val (w, h) = Multimodal.imageDims(42L)
    assert(im != null && im.getWidth == w && im.getHeight == h)
  }

  test("JPEG decode path: lossy channel stats stay within tolerance " +
      "of the lossless ground truth") {
    // The lossy path's evidence beyond dimension recovery: JPEG's DCT
    // preserves per-block DC terms, so the per-channel MEAN through the
    // SAME decodeImages operator must land within a few intensity units
    // of the formula-exact PNG truth — a real bound on a real codec,
    // not a bit-exact replay (which lossy coding cannot give).
    import spark.implicits._
    val ids = Seq(7L, 13L, 42L)
    val jpegs = ids.map(id =>
      ImageRow(id, Multimodal.encodePng(id, format = "jpg"))).toDS()
    val stats = decodeImages(jpegs, batchSize = 2).collect()
    assert(stats.length == ids.length)
    stats.foreach { st =>
      val (w, h) = Multimodal.imageDims(st.media_id)
      assert(st.width == w && st.height == h)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.pixelRgb(st.media_id, x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      val n = (w * h).toDouble
      for (((got, want), ch) <- Seq((st.sum_r, sr), (st.sum_g, sg),
          (st.sum_b, sb)).zip(Seq("R", "G", "B"))) {
        val drift = math.abs(got / n - want / n)
        assert(drift <= 4.0,
          s"$ch mean drift $drift on image ${st.media_id} " +
            s"(got ${got / n}, want ${want / n})")
      }
    }
  }

  test("imageAHash: engine hash equals the driver-side integer replay; " +
      "brightness jitter mostly survives; corrupt blobs drop") {
    import spark.implicits._
    def refAHash(seed: Long, jitter: Int): Long = {
      val (w, h) = Multimodal.imageDims(seed)
      val bw = w / 4; val bh = h / 4
      val ms = Array.tabulate(16) { bi =>
        val gx = bi % 4; val gy = bi / 4
        var s = 0L
        for (dy <- 0 until bh; dx <- 0 until bw) {
          val p = Multimodal.pixelRgb(seed, gx * bw + dx, gy * bh + dy, jitter)
          s += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        }
        s / (bw * bh)
      }
      val mean = ms.sum / 16
      ms.zipWithIndex.collect { case (m, i) if m >= mean => 1L << i }.sum
    }
    val seeds = 0L until 40L
    val rows = seeds.map(id => (id, id, 0)) ++ seeds.map(id => (id + 1000L, id, 1))
    val imgs = Multimodal.synthesizePngsSeeded(
      rows.toDF("media_id", "seed", "jit"), "media_id", "seed", "jit")
    val corrupt = Seq(Multimodal.ImageRow(9999L, Array[Byte](1, 2, 3))).toDS()
    val got = Multimodal.imageAHash(imgs.union(corrupt), batchSize = 7)
      .collect().map(r => r.media_id -> r.ahash).toMap
    assert(!got.contains(9999L), "corrupt blob must drop")
    // bit-exact vs the replay, both jittered and not (PNG is lossless)
    seeds.foreach { id =>
      assert(got(id) == refAHash(id, 0), s"base $id")
      assert(got(id + 1000L) == refAHash(id, 1), s"jittered $id")
    }
    // the perceptual property: a +1 saturating red shift keeps most
    // hashes identical (block means move < 1 intensity unit)
    val kept = seeds.count(id => got(id) == got(id + 1000L))
    assert(kept >= 35, s"only $kept/40 jittered copies kept their hash")
  }

  test("AudioSystem decode recovers exact PCM samples from synthesized WAVs") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 5L, 17L).toDF("doc_id")
    val wavs = synthesizeWavs(ids, "doc_id").collect()
    assert(wavs.length == 5)
    // RIFF/WAVE magic proves these are genuine containers, not fakes
    wavs.foreach { r =>
      assert(new String(r.wav.take(4), "US-ASCII") == "RIFF" &&
        new String(r.wav.slice(8, 12), "US-ASCII") == "WAVE")
    }
    // per-sample round trip through the real parser
    wavs.foreach { r =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.wav))
      val (rate, n) = Multimodal.audioParams(r.media_id)
      assert(in.getFormat.getSampleRate.toInt == rate && in.getFrameLength == n)
      val bytes = in.readAllBytes()
      for (i <- 0 until n) {
        val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        assert(v == Multimodal.sampleValue(r.media_id, i),
          s"sample $i of clip ${r.media_id}")
      }
    }
  }

  test("decodeWavs emits formula-exact sample stats and drops corrupt blobs") {
    import spark.implicits._
    val ids = (0L until 20L).toDF("doc_id")
    val good = synthesizeWavs(ids, "doc_id")
    val corrupt = Seq(AudioRow(99L, Array[Byte](1, 2, 3, 4))).toDS()
    val stats = decodeWavs(good.union(corrupt), batchSize = 7).collect()
    assert(stats.length == 20 && !stats.exists(_.media_id == 99L))
    stats.foreach { st =>
      val (rate, n) = Multimodal.audioParams(st.media_id)
      var sum = 0L; var sumAbs = 0L; var maxAbs = 0
      for (i <- 0 until n) {
        val v = Multimodal.sampleValue(st.media_id, i)
        sum += v; sumAbs += math.abs(v); maxAbs = math.max(maxAbs, math.abs(v))
      }
      assert(st.sample_rate == rate && st.n_samples == n)
      assert((st.sum_s, st.sum_abs, st.max_abs) == ((sum, sumAbs, maxAbs)),
        s"clip ${st.media_id}")
    }
  }

  test("decodeWavs normalizes 8-bit, stereo and big-endian AIFF inputs") {
    import javax.sound.sampled._
    import spark.implicits._
    def container(pcm: Array[Byte], fmt: AudioFormat,
        tpe: AudioFileFormat.Type): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt,
        pcm.length / fmt.getFrameSize), tpe, out)
      out.toByteArray
    }
    // 8-bit unsigned mono WAV: u_i = (i*37+11)%256 → PCM16 (u-128)<<8
    val u8 = Array.tabulate[Byte](50)(i => ((i * 37 + 11) % 256).toByte)
    val wav8 = container(u8, new AudioFormat(8000f, 8, 1, false, false),
      AudioFileFormat.Type.WAVE)
    // 16-bit stereo LE WAV: interleaved L=i*3-60, R=-(i*2)+40
    val stereoVals = (0 until 30).flatMap(i => Seq(i * 3 - 60, -(i * 2) + 40))
    val wavSt = container(
      stereoVals.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray,
      new AudioFormat(8000f, 16, 2, true, false), AudioFileFormat.Type.WAVE)
    // 16-bit mono BIG-endian AIFF with the same sample formula as clip 3
    val (_, nAiff) = Multimodal.audioParams(3L)
    val aiff = container(
      (0 until nAiff).flatMap { i =>
        val v = Multimodal.sampleValue(3L, i)
        Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte) // big-endian
      }.toArray,
      new AudioFormat(8000f, 16, 1, true, true), AudioFileFormat.Type.AIFF)
    val rows = Seq(AudioRow(1L, wav8), AudioRow(2L, wavSt), AudioRow(3L, aiff)).toDS()
    val stats = decodeWavs(rows).collect().map(s => s.media_id -> s).toMap
    assert(stats.size == 3) // none dropped, none crashed
    def expect(vals: Seq[Int]) =
      (vals.size.toLong, vals.map(_.toLong).sum, vals.map(v => math.abs(v).toLong).sum,
        vals.map(math.abs).max)
    // the JDK codec's 8u→16s mapping (probed over all 256 values):
    // s<0 → s<<8; s≥0 → (s<<8)|(s<<1); u=255 clips to 32767
    val e8 = expect(u8.toIndexedSeq.map { b =>
      val s = (b & 0xff) - 128
      if (s < 0) s << 8 else math.min(32767, (s << 8) | (s << 1))
    })
    assert((stats(1L).n_samples, stats(1L).sum_s, stats(1L).sum_abs,
      stats(1L).max_abs) == e8, "8-bit")
    val eSt = expect(stereoVals)
    assert((stats(2L).n_samples, stats(2L).sum_s, stats(2L).sum_abs,
      stats(2L).max_abs) == eSt, "stereo")
    val eAiff = expect((0 until nAiff).map(i => Multimodal.sampleValue(3L, i)))
    assert((stats(3L).n_samples, stats(3L).sum_s, stats(3L).sum_abs,
      stats(3L).max_abs) == eAiff, "aiff big-endian")
  }

  test("AVI demux + DIB decode recovers formula-exact frame pixels") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 5L, 17L).toDF("doc_id")
    val avis = synthesizeAvis(ids, "doc_id").collect()
    // RIFF/AVI magic proves genuine containers
    avis.foreach { r =>
      assert(new String(r.avi.take(4), "US-ASCII") == "RIFF" &&
        new String(r.avi.slice(8, 12), "US-ASCII") == "AVI ")
    }
    val stats = decodeAvis(spark.createDataset(avis.toIndexedSeq)).collect()
      .map(s => s.media_id -> s).toMap
    assert(stats.size == 5)
    for (id <- Seq(0L, 1L, 2L, 5L, 17L)) {
      val (w, h, nf) = Multimodal.videoParams(id)
      var er = 0L; var eg = 0L; var eb = 0L
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.frameRgb(id, f, x, y)
        er += r; eg += g; eb += b
      }
      val st = stats(id)
      assert((st.width, st.height, st.n_frames) == ((w, h, nf)), s"dims of $id")
      assert((st.sum_r, st.sum_g, st.sum_b) == ((er, eg, eb)), s"sums of $id")
    }
  }

  test("decodeAvis drops corrupt blobs and compressed streams") {
    import spark.implicits._
    val good = Multimodal.encodeAvi(3L)
    // flip the strf biCompression field (BI_RGB=0 → 1): a "compressed"
    // stream our profile decoder must drop, not mis-decode
    val compressed = good.clone()
    val strfAt = {
      // find 'strf' fourcc; compression dword is at body+16
      val idx = compressed.indices.find(i => i + 4 <= compressed.length &&
        new String(compressed, i, 4, "US-ASCII") == "strf").get
      idx + 8 + 16
    }
    compressed(strfAt) = 1.toByte
    val truncated = good.take(40)
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val ds = Seq(
      Multimodal.VideoRow(1L, good),
      Multimodal.VideoRow(2L, compressed),
      Multimodal.VideoRow(3L, truncated),
      Multimodal.VideoRow(4L, garbage)).toDS()
    val out = decodeAvis(ds).collect()
    assert(out.map(_.media_id).toSet == Set(1L), "only the clean blob decodes")
  }

  test("decodeWavWindows: window sums-of-squares are formula-exact, " +
      "partial trailing window keeps its count, corrupt blobs drop") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 7L).toDF("doc_id")
    val wavs = synthesizeWavs(ids, "doc_id")
    val got = decodeWavWindows(wavs, windowSamples = 150).collect()
      .map(w => (w.media_id, w.win) -> w).toMap
    for (id <- Seq(0L, 3L, 7L)) {
      val (_, n) = Multimodal.audioParams(id)
      val nWins = (n + 149) / 150
      for (w <- 0 until nWins) {
        val lo = w * 150
        val hi = math.min(lo + 150, n)
        val expSq = (lo until hi).map { i =>
          val v = Multimodal.sampleValue(id, i).toLong; v * v
        }.sum
        val ws = got((id, w))
        assert(ws.n_samples == hi - lo, s"window count of $id/$w")
        assert(ws.sum_sq == expSq, s"sum_sq of $id/$w")
      }
      assert(!got.contains((id, nWins)), "no phantom window past the end")
    }
    val garbage = Seq(Multimodal.AudioRow(9L,
      Array.tabulate[Byte](64)(i => (i * 7).toByte))).toDS()
    assert(decodeWavWindows(garbage).collect().isEmpty)
  }

  test("decimateWavs: data-driven stride keeps exactly every k-th sample; " +
      "non-divisible rates and corrupt blobs drop") {
    import spark.implicits._
    // ids 0/1/2 have rates 8k/12k/16k -> strides 2/3/4 at target 4000
    val ids = Seq(0L, 1L, 2L).toDF("doc_id")
    val wavs = synthesizeWavs(ids, "doc_id")
    val got = decimateWavs(wavs, targetRate = 4000).collect()
      .map(r => r.media_id -> r).toMap
    for (id <- Seq(0L, 1L, 2L)) {
      val (rate, n) = Multimodal.audioParams(id)
      val k = rate / 4000
      val kept = (0 until n by k).map(Multimodal.sampleValue(id, _))
      val r = got(id)
      assert(r.src_rate == rate && r.dst_rate == 4000)
      assert(r.n_out == kept.length, s"n_out of $id")
      assert(r.sum_s == kept.map(_.toLong).sum, s"sum_s of $id")
      assert(r.sum_abs == kept.map(v => math.abs(v).toLong).sum)
      assert(r.max_abs == kept.map(math.abs).max)
    }
    // 11025 Hz is not an integer multiple of 4000: routed out, not
    // mangled by a fractional stride
    val offRate = decimateWavs(wavs, targetRate = 11025).collect()
    assert(offRate.isEmpty, s"non-divisible rates must drop: ${offRate.toSeq}")
    val garbage = Seq(Multimodal.AudioRow(9L,
      Array.tabulate[Byte](64)(i => (i * 7).toByte))).toDS()
    assert(decimateWavs(garbage, 4000).collect().isEmpty)
  }

  test("decodeAviFrames: per-frame sums are formula-exact, total to " +
      "decodeAvis, and corrupt blobs drop") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 5L).toDF("doc_id")
    val avis = synthesizeAvis(ids, "doc_id")
    val frames = decodeAviFrames(avis).collect()
      .map(f => (f.media_id, f.frame) -> f).toMap
    for (id <- Seq(0L, 1L, 5L)) {
      val (w, h, nf) = Multimodal.videoParams(id)
      for (f <- 0 until nf) {
        var er = 0L; var eg = 0L; var eb = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val (r, g, b) = Multimodal.frameRgb(id, f, x, y)
          er += r; eg += g; eb += b
        }
        val fs = frames((id, f))
        assert((fs.sum_r, fs.sum_g, fs.sum_b) == ((er, eg, eb)),
          s"sums of video $id frame $f")
      }
      // the per-frame grain must total to the whole-video stats
      val tot = decodeAvis(avis).collect().map(s => s.media_id -> s).toMap
      val mine = frames.values.filter(_.media_id == id)
      assert(mine.map(_.sum_r).sum == tot(id).sum_r &&
        mine.map(_.sum_g).sum == tot(id).sum_g &&
        mine.map(_.sum_b).sum == tot(id).sum_b, s"totals of $id")
    }
    val garbage = Seq(Multimodal.VideoRow(9L,
      Array.tabulate[Byte](64)(i => (i * 7).toByte))).toDS()
    assert(decodeAviFrames(garbage).collect().isEmpty)
  }

  test("video frame aHash: matches the driver-side block-mean rule; a " +
      "seeded +1-red re-upload keeps the perceptual signature") {
    import spark.implicits._
    val ids = Seq(3L, 4L).toDF("doc_id")
    val frames = decodeAviFrames(synthesizeAvis(ids, "doc_id")).collect()
      .map(f => (f.media_id, f.frame) -> f.ahash).toMap
    // driver-side reference of the 4x4 grid-aligned-crop hash
    for (((id, f), got) <- frames) {
      val (w, h, _) = Multimodal.videoParams(id)
      val (bw, bh) = (w / 4, h / 4)
      val ms = Array.tabulate(16) { bi =>
        val (gx, gy) = (bi % 4, bi / 4)
        val px = for (dy <- 0 until bh; dx <- 0 until bw) yield {
          val (r, g, b) = Multimodal.frameRgb(id, f, gx * bw + dx, gy * bh + dy)
          (r + g + b) / 3L
        }
        px.sum / (bw * bh)
      }
      val mean = ms.sum / 16
      val want = ms.indices.foldLeft(0L)((a, i) =>
        if (ms(i) >= mean) a | (1L << i) else a)
      assert(got == want, s"video $id frame $f: $got vs $want")
    }
    // planted copy: same seed, fresh id, +1 saturating red
    val planted = Seq((3L, 3L, 0), (7003L, 3L, 1))
      .toDF("media_id", "seed", "jit")
    val sigs = decodeAviFrames(
        synthesizeAvisSeeded(planted, "media_id", "seed", "jit"))
      .collect().groupBy(_.media_id)
      .map { case (k, v) => k -> v.map(_.ahash).toSet }
    assert(sigs(3L) == sigs(7003L),
      "the +1-red re-upload must keep the full perceptual signature")
  }

  test("audioNearDup: planted ±1 re-encodes match at Hamming 0; the " +
      "banded candidate tier is lossless vs brute force; partition-invariant") {
    import spark.implicits._
    val base = (0L until 40L).map(i => (i, i, 0))
    val copies = (0L until 40L by 5L).map(i => (i + 10000L, i, 1))
    val rows = (base ++ copies).toDF("media_id", "seed", "jit")
    val wavs = synthesizeWavsSeeded(rows, "media_id", "seed", "jit")
    val got = audioNearDup(wavs, windowSamples = 25, bands = 4, hamDenom = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // every planted pair present, at Hamming 0 (the contour survives ±1)
    for (i <- 0L until 40L by 5L)
      assert(got.exists(p => p._1 == i && p._2 == i + 10000L && p._4 == 0L),
        s"planted pair ($i, ${i + 10000L}) missing")
    // brute-force replay on the driver from the sample formula: banding
    // must lose nothing (Hamming budget < bands -> pigeonhole)
    def fp(seed: Long, jit: Int): Seq[Int] = {
      val n = (400 + (seed % 5) * 100).toInt
      val s = (0 until n).map { i =>
        val v = ((seed * 31 + i.toLong * 17) % 2001 - 1000).toInt
        if (jit == 0) v
        else math.max(-1000, math.min(1000, v + (((seed + i) % 3) - 1).toInt))
      }
      val e = s.grouped(25).map(_.map(v => v.toLong * v).sum).toSeq
      (0 until e.length - 1).map(w => if (e(w + 1) > e(w)) 1 else 0)
    }
    val all = (base ++ copies).map { case (id, seed, jit) => id -> fp(seed, jit) }
    val brute = (for {
      (a, fa) <- all; (b, fb) <- all
      if a < b && fa.length == fb.length
      ham = fa.zip(fb).count(p => p._1 != p._2)
      if ham <= fa.length / 10
    } yield (a, b, fa.length + 1, ham.toLong)).toSet
    assert(got.toSet == brute.map(t => (t._1, t._2, t._3, t._4)))
    val again = audioNearDup(wavs.repartition(7), windowSamples = 25,
      bands = 4, hamDenom = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(again == got.toSet)
  }
}
