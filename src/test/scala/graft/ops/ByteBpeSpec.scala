package graft.ops

import graft.SparkTestBase

/** Byte-level BPE (t42/st38): the two properties that DEFINE the
  * family — losslessness (no normalization, arbitrary unicode
  * round-trips through the byte symbols exactly) and no-[UNK]-
  * possible (every byte is base vocabulary) — plus the pinned-table
  * trainer identity and the heap-vs-sequential encoder differential
  * on the byte alphabet. */
class ByteBpeSpec extends SparkTestBase {

  private def hexOf(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").mkString

  test("round-trip/no-[UNK]: ANY string tokenizes and its symbols " +
      "concatenate back to the exact input bytes") {
    val rnd = new scala.util.Random(4242)
    val table = graft.queries.ByteBpeQueries.ByteBpeMerges1k.toArray
    val ranks = Bpe.rankMap(table)
    // adversarial inputs: raw names, multi-byte unicode, emoji
    // (surrogate pairs), digits/punctuation, random codepoints
    val fixed = Seq("Customer#000000001", "ü#Straße", "日本語テスト",
      "aé€😀z", "!@#$%^&*()", "", "x")
    val random = Seq.fill(200)(
      (0 until (1 + rnd.nextInt(24))).map { _ =>
        val cp = 1 + rnd.nextInt(0x2FFFF)
        if (Character.isDefined(cp) && !Character.isSurrogate(cp.toChar))
          new String(Character.toChars(cp)) else "a"
      }.mkString)
    (fixed ++ random).filter(_.nonEmpty).foreach { w =>
      val slow = Bpe.encodeSyms(ByteBpe.hexSyms(w), table)
      val fast = Bpe.encodeFastSyms(ByteBpe.hexSyms(w), ranks)
      assert(slow.toSeq == fast.toSeq,
        s"heap and sequential encoders must agree on ${hexOf(w)}")
      assert(slow.mkString == hexOf(w),
        s"symbols must concatenate back to the input bytes for $w")
      assert(slow.nonEmpty && slow.forall(_.length % 2 == 0))
    }
  }

  test("losslessness: the bytes char-level normalization destroys " +
      "survive byte-level tokenization") {
    val table = graft.queries.ByteBpeQueries.ByteBpeMerges1k.toArray
    // char BPE first normalizes "Customer#000000001" to
    // "customer000000001" — '#' and the uppercase 'C' are GONE before
    // any merge runs; byte-level preserves them in the symbols
    val syms = Bpe.encodeSyms(ByteBpe.hexSyms("Customer#000000001"), table)
    assert(syms.mkString.contains("23"), "'#' (0x23) must survive")
    assert(syms.mkString.startsWith("43"), "'C' (0x43) must survive uncased")
    // and the trained table actually MERGES across them: the raw name
    // compresses far below one symbol per byte
    assert(syms.length <= 4,
      s"the pinned table must compress a training-shaped name, got ${syms.length}")
  }

  test("pinned 1024-merge byte table IS the trainer's output on the " +
      "sf0.01 raw-name sample, well-formed over the byte alphabet") {
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(
      spark, "/root/testdata/sf0.01")
    val trained = ByteBpe.train(ByteBpe.wordFreq(src, "text"), numMerges = 1024)
    assert(trained.length == 1024,
      s"byte vocabulary exhausted at ${trained.length} merges")
    assert(trained == graft.queries.ByteBpeQueries.ByteBpeMerges1k,
      "pinned byte table drifted from trainer output — regenerate with " +
        "graft.tools.ByteBpeDump 1024")
    assert(Bpe.wellFormedSyms(trained.toArray, _.length == 2),
      "every trained byte table is well-formed, enabling the heap path")
    // the byte table must NOT be well-formed under the CHAR predicate
    // (its base symbols are hex pairs) — the predicate split is real
    assert(!Bpe.wellFormed(trained.toArray))
  }

  test("heap and sequential encoders agree on random trained byte " +
      "tables over random byte words") {
    val rnd = new scala.util.Random(4243)
    (1 to 40).foreach { _ =>
      val alphabet = "abcXY#01ü€"
      val words = Seq.fill(30)(
        (0 until (1 + rnd.nextInt(12)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val wf = words.groupBy(identity).map { case (w, g) =>
        w -> (g.size.toLong + rnd.nextInt(5)) }
      val table = ByteBpe.train(wf, 1 + rnd.nextInt(40)).toArray
      assert(Bpe.wellFormedSyms(table, _.length == 2))
      val ranks = Bpe.rankMap(table)
      (words ++ Seq.fill(20)(
        (0 until (1 + rnd.nextInt(16)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString))
        .foreach { w =>
          assert(Bpe.encodeFastSyms(ByteBpe.hexSyms(w), ranks).toSeq ==
            Bpe.encodeSyms(ByteBpe.hexSyms(w), table).toSeq,
            s"differential failed on $w under ${table.length} merges")
        }
    }
  }

  test("tokenCounts is partition-independent, byte-exact on " +
      "multi-byte text, and zero-rows-preserving") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Customer#000000001 Customer#000000002"),
      (2L, "ü€ däta"),
      (3L, ""),
      (4L, "   ")).toDF("id", "text")
    val merges = graft.queries.ByteBpeQueries.ByteBpeMerges1k
    val one = ByteBpe.tokenCounts(docs.repartition(1), "id", "text", merges)
      .orderBy("id").collect().toSeq.map(_.toSeq)
    val many = ByteBpe.tokenCounts(docs.repartition(7), "id", "text", merges)
      .orderBy("id").collect().toSeq.map(_.toSeq)
    assert(one == many, "partitioning must not change the census")
    val r1 = one.head
    assert(r1 == Seq(1L, 2L, 36L, 4L) || r1(2) == 36L,
      s"two 18-byte names must census 36 bytes: $r1")
    // multi-byte chars count BYTES not chars: ü=2, €=3, ä=2
    val r2 = one(1)
    assert(r2(1) == 2L && r2(2) == (5L + 5L), s"byte census wrong: $r2")
    // empty/whitespace docs survive as 0/0/0 rows
    assert(one(2).drop(1) == Seq(0L, 0L, 0L) && one(3).drop(1) == Seq(0L, 0L, 0L))
  }
}
