package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant checks for the round-5 corpus-curation queries (the
  * value-level contract is the DuckDB oracle; these pin the semantic
  * properties the oracle can't express). */
class CorpusOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  test("t14: exactly 3 positive-score terms per doc, distinct terms") {
    val t14 = run("t14_tfidf_terms")
    val rows = t14.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct("term").as("nd"))
    // every document has >= 3 distinct terms in the synthetic corpus
    assert(rows.filter(col("n") =!= 3 || col("nd") =!= 3).isEmpty)
    assert(t14.filter(col("tfidf_u") <= 0).isEmpty)
  }

  test("t15: trigram count is tokens-2 and rep_ratio stays in [0,1]") {
    val t15 = run("t15_repetition_score")
    val t01 = run("t01_token_counts")
    val joined = t15.join(t01, "doc_id")
    assert(joined.filter(col("n_trigrams") =!= col("n_tokens") - 2).isEmpty)
    assert(t15.filter(col("rep_ratio") < 0.0 || col("rep_ratio") > 1.0).isEmpty)
  }

  test("t16: passes=1 implies every gate condition holds on the outputs") {
    val bad = run("t16_quality_gate").filter(col("passes") === 1)
      .filter(col("n_tokens") < 10 || col("stop_hits") < 2 || col("alpha_ratio") < 0.59)
    assert(bad.isEmpty)
  }

  test("p06: exhaustive three-way split with ~80/10/10 proportions, deterministic") {
    val a = run("p06_hash_split")
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.70 && counts("train") / n < 0.90, counts.toString)
    assert(counts("val") / n < 0.20 && counts("test") / n < 0.20, counts.toString)
    // re-evaluation assigns identical splits (no rand() anywhere)
    assert(a.exceptAll(run("p06_hash_split")).isEmpty)
  }

  test("p08: weighted sample is exhaustive-size, deterministic, and biased to weight") {
    val sample = run("p08_weighted_sample")
    assert(sample.count() == 100)
    assert(sample.exceptAll(run("p08_weighted_sample")).isEmpty)
    val sampleMean = sample.agg(avg("n_chars")).head().getDouble(0)
    val corpusMean = graft.tables.Tables(spark, dir).documents
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean n_chars $sampleMean should exceed corpus mean $corpusMean")
  }

  test("k02: salted join equals the plain join") {
    val t = graft.tables.Tables(spark, dir)
    val plain = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        fround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    val salted = run("k02_salted_join")
    assert(salted.collect().map(_.toSeq).toSet
      == plain.collect().map(_.toSeq).toSet)
  }
}
