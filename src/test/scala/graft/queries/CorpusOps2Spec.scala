package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant checks for the round-5 second corpus pack (value-level
  * contract is the DuckDB oracle; these pin semantics the oracle can't,
  * plus planted-duplicate behavior the synthetic corpus can't exercise). */
class CorpusOps2Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  test("t43: every bin statistic recomputes from t25's own published " +
      "scores — census, means, gaps, Brier, ECE, all exact-integer") {
    val scored = run("t25_quality_classifier").collect()
      .map(r => (r.getDouble(1).toLong,
        math.floor(r.getDouble(2) * 1e6 + 0.5).toLong))
    val audit = run("t43_calibration_audit").collect()
    val byBin = scored.groupBy { case (_, sm) => math.min(9L, sm / 100000L) }
    assert(audit.map(_.getLong(1)).sum == scored.length.toLong,
      "bins must partition the scored corpus")
    val sqTot = scored.map { case (y, sm) =>
      val d = sm - y * 1000000L; d * d }.sum
    val brierTot = sqTot / (scored.length * 1000000L)
    var gapW = 0L
    audit.foreach { r =>
      val bin = r.getLong(0)
      val cell = byBin(bin)
      assert(r.getLong(1) == cell.length.toLong, s"n at bin $bin")
      assert(r.getLong(2) == cell.count(_._1 == 1L).toLong, s"n_pos at bin $bin")
      val mean = cell.map(_._2).sum / cell.length
      val emp = cell.count(_._1 == 1L).toLong * 1000000L / cell.length
      assert(r.getLong(3) == mean && r.getLong(4) == emp,
        s"mean/emp at bin $bin")
      assert(r.getLong(5) == math.abs(mean - emp), s"gap at bin $bin")
      val sq = cell.map { case (y, sm) =>
        val d = sm - y * 1000000L; d * d }.sum
      assert(r.getLong(6) == sq / (cell.length * 1000000L), s"brier at bin $bin")
      assert(r.getLong(7) == brierTot, "global Brier must ride every row")
      gapW += cell.length * math.abs(mean - emp)
    }
    val ece = gapW / scored.length
    audit.foreach(r => assert(r.getLong(8) == ece, "ECE must ride every row"))
    // the audit must MEASURE the miscalibration t27 warned about: the
    // 4-round sigmoid crowds scores above 0.5, so ECE is far from 0
    assert(ece > 10000L, s"ece $ece: the known miscalibration must register")
  }

  test("d09: planted shared span is found; shared counts bounded by span counts") {
    val d09 = run("d09_span_dedup")
    assert(d09.filter(col("n_shared") > col("n_spans")).isEmpty)
    assert(d09.filter(col("n_shared") <= 0).isEmpty)
    // planted check on a controlled frame: two docs share one 6-token
    // window, a third is span-disjoint
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "XX alpha beta gamma delta epsilon zeta YY"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val w = 6
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= w)
    val spans = toks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - (w - 1))).as("i"))
      .select(col("doc_id"),
        graft.functions.VectorExpressions.md5Hash52(concat_ws(" ",
          (0 until w).map(j => element_at(col("t"), col("i") + lit(j))): _*)).as("h"))
      .distinct()
    val census = spans.groupBy("h").agg(count(lit(1)).as("nd"))
    val shared = spans.join(census, "h").groupBy("doc_id")
      .agg(sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 2 share exactly the one full window of doc 1
    assert(shared(1L) == 1L && shared(2L) == 1L && shared(3L) == 0L, shared.toString)
  }

  test("p09: deterministic, bounded by language size, up-samples low-resource langs") {
    val a = run("p09_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.forall { case (_, n, k) => k >= 0 && k <= n })
    // keep-RATE must be (weakly) higher for smaller languages: compare
    // the largest and smallest language buckets
    val byN = a.sortBy(_._2)
    val (smallRate, bigRate) =
      (byN.head._3.toDouble / byN.head._2, byN.last._3.toDouble / byN.last._2)
    assert(smallRate >= bigRate,
      s"temperature mixing should up-sample small langs: $smallRate < $bigRate")
    // rerun-identical (pure hash arithmetic, no rand())
    assert(run("p09_temperature_mix").exceptAll(run("p09_temperature_mix")).isEmpty)
  }

  test("dc02: survivors are new-batch ids, unseen in the corpus, batch-deduped") {
    val t = graft.tables.Tables(spark, dir)
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "  +", " "))
    val keyed = t.documents.select(col("doc_id"), norm.as("nt"))
    val survivors = run("dc02_incremental_dedup").collect().map(_.getLong(0)).toSet
    assert(survivors.forall(_ % 5 == 0))
    // no survivor's normalized text exists in the old corpus
    val oldTexts = keyed.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select("nt").distinct().collect().map(_.getString(0)).toSet
    val survTexts = keyed.filter(col("doc_id").isin(survivors.toSeq: _*))
      .select("nt").collect().map(_.getString(0))
    assert(survTexts.forall(!oldTexts.contains(_)))
    // survivors are distinct within the batch by normalized text
    assert(survTexts.distinct.length == survTexts.length)
  }
}
