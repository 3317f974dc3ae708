package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant checks for the round-12 fourth pack (p17/e16/x20/d19/t32/
  * st27): the value-level contract is the DuckDB oracle; these pin the
  * algorithmic properties the oracle replay can't distinguish from a
  * coincidence — the waterfilling invariants, the S-curve ordering, the
  * deadline-funnel dominance, and stream/batch flag parity. */
class Wave4Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  test("p17: output satisfies the defining waterfilling properties") {
    val out = run("p17_unimax_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, c, cap, _) => cap == 2 * c })
    val b = out.map(_._2).sum / 2
    // the defining properties uniquely characterize the allocation:
    // sorted by capacity, a PREFIX gets its full cap, the suffix gets
    // one common θ, θ is the floor-split of the leftover budget, and
    // the prefix is maximal (the first suffix cap exceeds θ — nobody
    // is cut below cap while another source could absorb more)
    val sorted = out.sortBy(t => (t._3, t._1))
    val satPrefix = sorted.takeWhile { case (_, _, cap, alloc) => alloc == cap }
    val suffix = sorted.drop(satPrefix.length)
    assert(suffix.forall { case (_, _, cap, alloc) => alloc < cap },
      "saturated sources must form a capacity-ascending prefix")
    if (suffix.nonEmpty) {
      val thetas = suffix.map(_._4).distinct
      assert(thetas.length == 1, s"unsaturated sources must share θ: $thetas")
      val theta = thetas.head
      val leftover = b - satPrefix.map(_._4).sum
      assert(theta == leftover / suffix.length,
        s"θ=$theta != floor(${leftover}/${suffix.length})")
      assert(suffix.head._3 > theta,
        "prefix maximality: the smallest unsaturated cap must exceed θ")
    }
    assert(out.map(_._4).sum <= b, "allocation must not exceed the budget")
  }

  test("e16: deadline funnel is dominated stage-wise by the unconstrained funnel") {
    val free = run("e07_ordered_funnel").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val dead = run("e16_deadline_funnel").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(dead(1) == free(1), "stage 1 has no deadline; counts must agree")
    assert(dead(2) <= free(2) && dead(3) <= free(3),
      s"deadlines can only shrink conversions: $dead vs $free")
    assert(dead(3) <= dead(2) && dead(2) <= dead(1), "funnel must be monotone")
  }

  test("x20: planted triangle-plus-pendant ego profile is exact") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant edge 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = graft.ops.Graph.egoDensity(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((2L, 1L, 3L, 1000000L)), out(1L).toString)
    assert(out(2L) == ((2L, 1L, 3L, 1000000L)))
    // node 3: nbrs {1,2,4}, one nbr edge (1-2), ego max = 4*3/2 = 6
    assert(out(3L) == ((3L, 1L, 4L, 666666L)), out(3L).toString)
    // pendant 4: a single spoke IS its whole 2-node ego clique
    assert(out(4L) == ((1L, 0L, 1L, 1000000L)))
  }

  test("d19: thresholds are the S-curve midpoints and recall falls as they rise") {
    val out = run("d19_lsh_planner").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((4, 32), (8, 16), (16, 8), (32, 4), (64, 2)))
    out.foreach { case (b, r, thr, _) =>
      val expect = math.floor(math.pow(1.0 / b, 1.0 / r) * 1e4 + 0.5) / 1e4
      assert(thr == expect, s"($b,$r): threshold $thr != $expect")
    }
    // p(s) = 1-(1-s^r)^b with b*r fixed is pointwise non-increasing in
    // r (both factors of b*ln(1/(1-s^r)) shrink), so the expected catch
    // must fall as the threshold rises
    val byThr = out.sortBy(_._3).map(_._4)
    assert(byThr.zip(byThr.tail).forall { case (lo, hi) => lo >= hi },
      s"expected catch must be non-increasing in threshold: ${out.toSeq}")
  }

  test("t32: fertility rollup equals the per-doc t20 accounting aggregated") {
    val t20 = run("t20_bpe_tokens")
    val docs = graft.tables.Tables(spark, dir).documents.select("doc_id", "lang")
    val ref = t20.join(docs, "doc_id").groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_tokens").as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        expr("n_tokens * 10000 div n_words").as("fertility_bp"))
    assert(run("t32_tokenizer_fertility").exceptAll(ref).isEmpty)
    assert(ref.exceptAll(run("t32_tokenizer_fertility")).isEmpty)
  }
}
