package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {

  test("training reproduces the classic subword example deterministically") {
    // Sennrich et al.'s running example: pair counts by hand give
    // (e,s) and (s,t) tied at 9; lexicographic tie-break picks (e,s),
    // after which (es,t) dominates at 9.
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(wf, 2)
    assert(merges == Seq("e" -> "s", "es" -> "t"), merges.toString)
    // full run terminates once words are single symbols, never loops
    val all = Bpe.train(wf, 1000)
    assert(all.length < 30)
    assert(Bpe.train(wf, 1000) == all, "training must be deterministic")
  }

  test("merge application is greedy left-to-right and sequential across ranks") {
    // one merge on a repeat run: non-overlapping pairs from the left
    assert(Bpe.encode("aaaaa", Array("a" -> "a")).toSeq == Seq("aa", "aa", "a"))
    // a later merge consumes the symbols the earlier one built
    assert(Bpe.encode("aaaaaaa", Array("a" -> "a", "aa" -> "aa")).toSeq ==
      Seq("aaaa", "aa", "a"))
    // merges only fire on exact adjacent symbols, never inside one
    assert(Bpe.encode("aab", Array("a" -> "a", "a" -> "b")).toSeq == Seq("aa", "b"))
    assert(Bpe.encode("x", Array("a" -> "a")).toSeq == Seq("x"))
  }

  test("fixed t20 merge table IS the trainer's output on the sf0.01 sample") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val trained = Bpe.trainOnSample(docs, "doc_id", "text",
      sampleDocs = 100, numMerges = 30)
    assert(trained == graft.queries.CorpusOps2.BpeFixedMerges,
      s"literal drifted from trainer output: $trained")
  }

  test("pinned 1024-merge table IS the trainer's output on the sf0.01 " +
      "customer-name sample, and the trainer does NOT run dry") {
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(
      spark, "/root/testdata/sf0.01")
    val trained = Bpe.train(Bpe.wordFreq(src, "text"), numMerges = 1024)
    assert(trained.length == 1024,
      s"name vocabulary exhausted at ${trained.length} merges")
    assert(trained == graft.queries.CorpusOps2.BpeMerges1k,
      "pinned 1k table drifted from trainer output — regenerate with " +
        "graft.tools.BpeDump 1024")
  }

  test("tokenCounts is partition-independent and bounded by word length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the newest lowest offer"),
      (2L, "Lower, LOWER!  lowest"),
      (3L, ""),
      (4L, "?!")).toDF("doc_id", "text")
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "s", "es" -> "t", "low" -> "est")
    val a = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Bpe.tokenCounts(docs.repartition(5), "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq, "partitioning must not change counts")
    // empty / punctuation-only docs keep a row with zero counts
    assert(a.toSeq.filter(_._1 >= 3L) == Seq((3L, 0L, 0L), (4L, 0L, 0L)))
    // hand-check doc 2: "lower lower lowest" -> (low,e,r), (low,e,r), (lowest)
    assert(a(1) == ((2L, 3L, 7L)), a(1).toString)
    // token count per word is in [1, len(word)]
    val (_, nw1, nt1) = a(0)
    assert(nt1 >= nw1 && nt1 <= "the newest lowest offer".count(_ != ' '))
  }

  test("heap encoder (encodeFast) is bit-identical to the sequential " +
      "reference on random trained tables, the pinned tables, and edges") {
    val rnd = new scala.util.Random(7)
    // 40 random corpora -> trained tables (always well-formed) ->
    // every distinct word encodes identically under both algorithms
    for (trial <- 0 until 40) {
      val alpha = "abcde".take(2 + rnd.nextInt(3))
      val words = (0 until 30).map { _ =>
        (0 until (1 + rnd.nextInt(10)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val wf = words.groupBy(identity).view
        .mapValues(g => (g.size + rnd.nextInt(5)).toLong).toMap
      val merges = Bpe.train(wf, numMerges = 1 + rnd.nextInt(40)).toArray
      assert(Bpe.wellFormed(merges), s"trial $trial: trained table not WF")
      val ranks = Bpe.rankMap(merges)
      val probes = words ++ Seq("", "z", "zz", alpha.reverse * 3,
        words.head + "zq" + words.last)
      probes.filter(_.nonEmpty).foreach { w =>
        val a = Bpe.encode(w, merges).toSeq
        val b = Bpe.encodeFast(w, ranks).toSeq
        assert(a == b, s"trial $trial word '$w': seq $a != heap $b")
      }
    }
    // both pinned tables are well-formed (so the apply path IS the
    // heap) and agree with the reference on the real vocabularies
    for ((tbl, dir, words) <- Seq(
        (graft.queries.CorpusOps2.BpeFixedMerges, "docs",
          spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .select(explode(split(Bpe.normText(col("text")), " ")).as("w"))
            .where(col("w") =!= "").distinct()
            .collect().map(_.getString(0)).toSeq),
        (graft.queries.CorpusOps2.BpeMerges1k, "names",
          spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
            .select(Bpe.normText(col("c_name")).as("w"))
            .collect().map(_.getString(0)).toSeq))) {
      val arr = tbl.toArray
      assert(Bpe.wellFormed(arr), s"$dir table must be well-formed")
      val ranks = Bpe.rankMap(arr)
      words.foreach { w =>
        assert(Bpe.encode(w, arr).toSeq == Bpe.encodeFast(w, ranks).toSeq,
          s"$dir '$w' diverged")
      }
    }
    // a NON-well-formed table (later merge references a never-made
    // symbol) is detected, so tokenCounts falls back to sequential
    assert(!Bpe.wellFormed(Array("ab" -> "c")))
    assert(!Bpe.wellFormed(Array("a" -> "b", "a" -> "b")))
    // duplicate OUTPUT via different splits: (a,bc) and (ab,c) -> "abc"
    assert(!Bpe.wellFormed(Array(
      "b" -> "c", "a" -> "bc", "a" -> "b", "ab" -> "c")))
  }

  test("packing budgets run on BPE token counts through the tokensCol parameter") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Array("lower", "newest", "widest", "low", "offer", "stream")
    val docs = (0L until 200L).map { i =>
      (if (i % 2 == 0) "web" else "books", i,
        Seq.fill(3 + rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("source", "doc_id", "text")
    val merges = Bpe.train(
      words.map(_ -> 1L).toMap, numMerges = 10)
    val counted = Bpe.tokenCounts(docs, "doc_id", "text", merges)
    val withTokens = docs.join(counted, "doc_id")
    val budget = 64
    val out = Packing.packChunks(withTokens, "source", "doc_id", "n_tokens",
      budget, buckets = 4)
      .select("source", "bucket", "doc_id", "n_tokens", "off", "first_chunk", "last_chunk")
      .collect()
    assert(out.length == 200)
    out.groupBy(r => (r.getString(0), r.getInt(1))).foreach { case (_, rows) =>
      var off = 0L
      rows.sortBy(_.getLong(2)).foreach { r =>
        assert(r.getLong(4) == off, s"offset drift at doc ${r.getLong(2)}")
        val n = r.getLong(3)
        assert(n > 0, "every doc must carry a positive BPE count")
        assert(r.getLong(5) == off / budget && r.getLong(6) == (off + n - 1) / budget)
        off += n
      }
    }
  }
}
