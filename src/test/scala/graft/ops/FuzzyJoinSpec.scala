package graft.ops

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("edJoin1 equals the brute-force levenshtein<=1 join, all edit kinds") {
    // fixture plants every distance-1 kind: substitution (cat/cut),
    // deletion (cart/cat? no — cart/car), insertion (car/cart), equal
    // strings under distinct ids, distance-2 decoys (cat/dog, cart/cut)
    val left = Seq((1L, "cat"), (2L, "car"), (3L, "cart"), (4L, "dog"),
      (5L, "cut"), (6L, "cat")).toDF("id_a", "s_a")
    val right = Seq((11L, "cat"), (12L, "cord"), (13L, "art"), (14L, "dig"),
      (15L, "carts")).toDF("id_b", "s_b")
    val got = FuzzyJoin.edJoin1(left, "id_a", "s_a", right, "id_b", "s_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val l = Seq((1L, "cat"), (2L, "car"), (3L, "cart"), (4L, "dog"),
      (5L, "cut"), (6L, "cat"))
    val r = Seq((11L, "cat"), (12L, "cord"), (13L, "art"), (14L, "dig"),
      (15L, "carts"))
    val want = (for {
      (ia, sa) <- l; (ib, sb) <- r
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == want, s"got=$got want=$want")
    // the fixture must actually cover sub/ins/del/equal
    assert(want.contains((1L, 11L, 0)), "equal pair")
    assert(want.contains((2L, 11L, 1)), "substitution car→cat")
    assert(want.contains((3L, 15L, 1)), "insertion cart→carts")
    assert(want.contains((3L, 11L, 1)), "deletion cart→cat")
  }

  test("edJoin1 on random strings matches brute force") {
    val rnd = new scala.util.Random(61)
    def word() = Seq.fill(3 + rnd.nextInt(3))(('a' + rnd.nextInt(4)).toChar).mkString
    val xs = (0L until 60L).map(i => (i, word()))
    val ys = (100L until 160L).map(i => (i, word()))
    val got = FuzzyJoin.edJoin1(xs.toDF("id_a", "s_a"), "id_a", "s_a",
        ys.toDF("id_b", "s_b"), "id_b", "s_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ia, sa) <- xs; (ib, sb) <- ys
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "fixture must produce matches")
  }

  test("edJoin1 handles empty strings: no phantom deletion keys, " +
      "no duplicate pairs") {
    // sequence(1, 0) is descending in Spark — unguarded, "" would emit
    // two deletion elements and empty×empty would match at BOTH dist 0
    // and dist 1, surviving distinct() as contradictory duplicate rows
    val left = Seq((1L, ""), (2L, "a"), (3L, "b")).toDF("id_a", "s_a")
    val right = Seq((11L, ""), (12L, "a"), (13L, "ab")).toDF("id_b", "s_b")
    val got = FuzzyJoin.edJoin1(left, "id_a", "s_a", right, "id_b", "s_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length === got.toSet.size, s"duplicate pairs: ${got.toSeq}")
    val want = (for {
      (ia, sa) <- Seq((1L, ""), (2L, "a"), (3L, "b"))
      (ib, sb) <- Seq((11L, ""), (12L, "a"), (13L, "ab"))
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got.toSet === want, s"got=${got.toSet} want=$want")
    assert(want.contains((1L, 11L, 0)), "empty==empty at dist 0")
    assert(want.contains((1L, 12L, 1)), "empty→'a' insertion")
  }

  test("edJoin2 equals the brute-force levenshtein<=2 join, all edit " +
      "kinds at both budgets") {
    // plants every distance-2 kind on top of the d<=1 kinds:
    // 2 substitutions (cat/cut->cot? use "bat"/"cut"), 2 deletions
    // (carts/car), 2 insertions (car/carts), sub+del (cart/cut),
    // sub+ins (cat/carts? dist 3 — decoy), distance-3 decoys (dog/carts)
    val l = Seq((1L, "cat"), (2L, "car"), (3L, "cart"), (4L, "dog"),
      (5L, "cut"), (6L, "bat"), (7L, ""))
    val r = Seq((11L, "cat"), (12L, "cord"), (13L, "art"), (14L, "dig"),
      (15L, "carts"), (16L, "cu"), (17L, "a"), (18L, "cet"))
    val got = FuzzyJoin.edJoin2(l.toDF("id_a", "s_a"), "id_a", "s_a",
        r.toDF("id_b", "s_b"), "id_b", "s_b")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val want = (for {
      (ia, sa) <- l; (ib, sb) <- r
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(8)} extra=${(got -- want).take(8)}")
    // the fixture must actually cover the distance-2 edit kinds
    assert(want.contains((2L, 15L, 2)), "2 insertions car→carts")
    assert(want.contains((6L, 18L, 2)), "2 substitutions bat→cet")
    assert(want.contains((3L, 18L, 2)), "deletion+substitution cart→cet")
    assert(want.contains((1L, 17L, 2)), "2 deletions cat→a")
    assert(!want.contains((4L, 15L, 2)), "dog→carts stays out (dist > 2)")
  }

  test("edJoin2 on random strings matches brute force") {
    val rnd = new scala.util.Random(67)
    def word() = Seq.fill(3 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar).mkString
    val xs = (0L until 50L).map(i => (i, word()))
    val ys = (100L until 150L).map(i => (i, word()))
    val got = FuzzyJoin.edJoin2(xs.toDF("id_a", "s_a"), "id_a", "s_a",
        ys.toDF("id_b", "s_b"), "id_b", "s_b")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val want = (for {
      (ia, sa) <- xs; (ib, sb) <- ys
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.exists(_._3 == 2), "fixture must produce distance-2 matches")
  }

  test("edJoin2 candidate join carries ids only and stays equi-keyed") {
    val xs = (0L until 50L).map(i => (i, s"str$i")).toDF("id_a", "s_a")
    val ys = (100L until 150L).map(i => (i, s"str$i")).toDF("id_b", "s_b")
    val joined = FuzzyJoin.edJoin2(xs, "id_a", "s_a", ys, "id_b", "s_b")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the signature join must stay equi-keyed:\n$plan")
  }

  test("native deletionKeys2 matches the HOF delete2Keys formulation bit-for-bit") {
    import org.apache.spark.sql.functions._
    // Edge cases on purpose: repeated characters (coinciding variants
    // must dedupe to the HOF's first-occurrence order), multibyte
    // UTF-8 (deletions are CHARACTER-level, like Column.substr),
    // empty / 1-char / 2-char strings, spaces.
    val texts = Seq("abc", "aab", "aaaa", "é漢ü", "xéx", "", "a", "ab",
      "hello world", "mississippi", "ñaño", "ab ba").map(Tuple1(_)).toDF("s")
    val rows = texts.select(
        graft.functions.VectorExpressions.deletionKeys2(col("s")).as("nat"),
        FuzzyJoin.delete2KeysHof(col("s")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"row=$r")
    }
    // random differential: 200 strings over a tiny alphabet maximizes
    // coinciding deletion variants (the dedup/order edge)
    val rnd = new scala.util.Random(7)
    val rand = (0 until 200)
      .map(_ => (0 until rnd.nextInt(9)).map(_ => "abé".charAt(rnd.nextInt(3))).mkString)
      .map(Tuple1(_)).toDF("s")
    rand.select(
        graft.functions.VectorExpressions.deletionKeys2(col("s")).as("nat"),
        FuzzyJoin.delete2KeysHof(col("s")).as("hof"))
      .collect()
      .foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"row=$r"))
  }

  test("native editPairs1 matches the HOF pair expansion bit-for-bit") {
    import org.apache.spark.sql.functions._
    // Synthetic signature groups that exercise every predicate arm:
    // identity×identity (dist 0), same-pos substitutions (equal and
    // differing deleted chars), identity×deletion, different-position
    // decoys, null chars and null ids, empty and single-side groups.
    // The comparison is ORDER-SENSITIVE — the native pass must emit
    // pairs in exactly the HOF's (left group order × right group
    // order) sequence.
    val rnd = new scala.util.Random(53)
    val elems = (0 until 300).flatMap { g =>
      (0 until rnd.nextInt(8)).map { _ =>
        val side = rnd.nextInt(2)
        val pos = rnd.nextInt(4) // 0 = the identity element
        val ch = if (rnd.nextInt(10) == 0) null
          else ("a" + ('a' + rnd.nextInt(3)).toChar).toString
        val id: java.lang.Long =
          if (rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(rnd.nextInt(1000).toLong)
        (g, side, pos, ch, id)
      }
    }
    val grouped = elems.toDF("g", "side", "pos", "ch", "id")
      .groupBy("g")
      .agg(collect_list(struct(col("side"), col("pos"), col("ch"), col("id"))).as("es"))
    val rows = grouped.select(
        graft.functions.VectorExpressions.editPairs1(col("es")).as("nat"),
        FuzzyJoin.edJoin1PairsHof(col("es")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    var emitted = 0
    rows.foreach { r =>
      val nat = r.getSeq[org.apache.spark.sql.Row](0)
      val hof = r.getSeq[org.apache.spark.sql.Row](1)
      assert(nat == hof, s"nat=$nat hof=$hof")
      emitted += nat.size
    }
    assert(emitted > 100, s"fixture must emit pairs (got $emitted)")
  }

  test("edJoin1 plans as an equi-join — no nested loop, no cartesian") {
    val xs = (0L until 50L).map(i => (i, s"str$i")).toDF("id_a", "s_a")
    val ys = (100L until 150L).map(i => (i, s"str$i")).toDF("id_b", "s_b")
    val joined = FuzzyJoin.edJoin1(xs, "id_a", "s_a", ys, "id_b", "s_b")
    joined.collect() // force execution so the executed plan is final
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the signature join must stay equi-keyed:\n$plan")
  }
}
