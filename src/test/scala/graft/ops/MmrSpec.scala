package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * a29's machinery: `Similarity.mmrRerank` must equal an independent
 * greedy reference on random pools, reduce to pure-relevance order at
 * λ = 1, and actually diversify — the defining behavior vs top-k.
 */
class MmrSpec extends SparkTestBase {

  private def relMicro(a: Array[Double], b: Array[Double]): Long = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    math.floor(dot / (na * nb) * 1e6 + 0.5).toLong
  }

  /** Independent greedy MMR over one query's candidate pool. */
  private def refMmr(qv: Array[Double], cands: Seq[(Long, Array[Double])],
      m: Int, k: Int, l: Int): Seq[(Long, Long)] = {
    val pool = cands.map { case (id, v) => (id, v, relMicro(qv, v)) }
      .sortBy(c => (-c._3, c._1)).take(m)
    var selected = Vector.empty[(Long, Long)]
    var selVecs = Vector.empty[Array[Double]]
    (1 to k).foreach { j =>
      val picked = pool.filterNot(c => selected.exists(_._1 == c._1))
        .map { case (id, v, rel) =>
          val ms = if (selVecs.isEmpty) 0L
            else selVecs.map(sv => relMicro(v, sv)).max
          (id, v, rel * l - ms * (10 - l))
        }.minBy(c => (-c._3, c._1))
      selected :+= ((picked._1, picked._3))
      selVecs :+= picked._2
    }
    selected
  }

  private def df(rows: Seq[(Long, Array[Double])]) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  test("mmrRerank equals the independent greedy reference on random " +
      "pools at every lambda") {
    val rnd = new scala.util.Random(29)
    val dim = 8
    val queries = (0L until 4L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian())))
    val corpus = (10L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian())))
    for (l <- Seq(3, 7, 10)) {
      val got = Similarity.mmrRerank(df(queries), df(corpus),
          "vec_id", "embedding", m = 12, k = 4, lambdaTenths = l)
        .orderBy("query_id", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      queries.foreach { case (qid, qv) =>
        val want = refMmr(qv, corpus, m = 12, k = 4, l = l)
        val mine = got.filter(_._1 == qid).sortBy(_._2)
        assert(mine.map(t => (t._3, t._4)).toSeq == want,
          s"query $qid lambda $l: ${mine.toSeq} vs $want")
      }
    }
  }

  test("lambda = 1.0 reduces MMR to pure top-k relevance order") {
    val rnd = new scala.util.Random(31)
    val queries = Seq((0L, Array.fill(6)(rnd.nextGaussian())))
    val corpus = (10L until 40L).map(i =>
      (i, Array.fill(6)(rnd.nextGaussian())))
    val mmr = Similarity.mmrRerank(df(queries), df(corpus),
        "vec_id", "embedding", m = 10, k = 5, lambdaTenths = 10)
      .orderBy("pos").collect().map(_.getLong(2))
    val topk = Similarity.knnBruteForce(df(queries), df(corpus),
        "vec_id", "embedding", k = 5)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(mmr.toSeq == topk.toSeq,
      "at lambda = 1 the greedy selection must replay the top-k order")
  }

  test("MMR diversifies: a near-duplicate of the top hit is passed " +
      "over for a fresh direction, where top-k keeps the duplicate") {
    // candidates: 11/12 the same direction (cosine-identical, so the
    // id tie-break puts 11 first and 12 carries sim = 1 to it); 13 a
    // fresh direction with decent relevance. At λ = 0.5 the duplicate
    // scores 0.5·(rel − 1) < 0 while 13 keeps a clear positive margin.
    val q = Array(1.0, 0.3, 0.0)
    val corpus = Seq(
      (11L, Array(1.0, 0.0, 0.0)),
      (12L, Array(0.999, 0.0, 0.0)),
      (13L, Array(0.3, 1.0, 0.0)))
    val topk = Similarity.knnBruteForce(df(Seq((0L, q))), df(corpus),
        "vec_id", "embedding", k = 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(topk.toSeq == Seq(11L, 12L), "top-k keeps the near-duplicate")
    val mmr = Similarity.mmrRerank(df(Seq((0L, q))), df(corpus),
        "vec_id", "embedding", m = 3, k = 2, lambdaTenths = 5)
      .orderBy("pos").collect().map(_.getLong(2))
    assert(mmr.toSeq == Seq(11L, 13L),
      "MMR must pass over the near-duplicate for the fresh direction")
  }
}
