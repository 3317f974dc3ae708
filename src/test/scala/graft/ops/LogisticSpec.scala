package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * `TextAnalysis.logisticFitGd` (t25) and its streaming twin
 * (`CorpusStream.learnedQualityStream`, st21): the fit LEARNS (planted
 * separable data reaches margin separation; the sf0.01 gate
 * distillation clears an AUC floor), the trajectory is deterministic
 * and 1e-6-grid-snapped (the property the DuckDB oracle replay rests
 * on), and the streaming row-local featurize+score path is bit-parity
 * with the batch scorer.
 */
class LogisticSpec extends SparkTestBase {
  import spark.implicits._

  // Planted separable corpus: label 1 iff the text carries "goodtok";
  // filler tokens overlap across classes so only the marker separates.
  private def planted: DataFrame =
    (0 until 40).map { i =>
      val good = i % 2 == 0
      val filler = s"tok${i % 5} tok${(i * 3) % 7} tok${(i * 5) % 11}"
      (i.toLong, (if (good) "goodtok " else "badtok ") + filler,
        if (good) 1.0 else 0.0)
    }.toDF("doc_id", "text", "y")

  private def feats(df: DataFrame): DataFrame =
    TextAnalysis.hashingTf(df, "doc_id", "text", dim = 64)
      .join(df.select(col("doc_id"), col("y")), "doc_id")
      .withColumn("nrm", sqrt(Similarity.dot(col("tf_vec"), col("tf_vec"))))
      .filter(col("nrm") > 0)
      .select(col("doc_id"), col("y"),
        transform(col("tf_vec"), e => e / col("nrm")).as("v"))

  private def margins(f: DataFrame, w: Array[Double]): Seq[(Double, Double)] =
    f.select(col("y"), Similarity.dot(col("v"), typedlit(w.toSeq)).as("m"))
      .collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1)))

  test("logisticFitGd separates planted separable labels") {
    val f = feats(planted)
    val w = TextAnalysis.logisticFitGd(f, "v", "y", 64, steps = 6, lr = 16.0).last
    val ms = margins(f, w)
    val pos = ms.filter(_._1 == 1.0).map(_._2)
    val neg = ms.filter(_._1 == 0.0).map(_._2)
    assert(pos.min > neg.max,
      s"classes not separated: min-pos ${pos.min} <= max-neg ${neg.max}")
  }

  test("trajectory is deterministic and snapped to the 1e-6 grid") {
    val f = feats(planted)
    def fit() = TextAnalysis.logisticFitGd(f, "v", "y", 64, steps = 3, lr = 16.0)
    val (t1, t2) = (fit(), fit())
    assert(t1.size == 4 && t1.head.forall(_ == 0.0))
    for ((a, b) <- t1.zip(t2))
      assert(a.sameElements(b), "re-fit diverged — nondeterministic aggregate")
    for (w <- t1; x <- w)
      assert(math.abs(x * 1e6 - math.rint(x * 1e6)) < 1e-6,
        s"weight $x is off the 1e-6 grid")
  }

  test("sf0.01 gate distillation clears the train-AUC floor (t25's claim)") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val nTok = size(split(col("text"), " "))
    val alphaRatio =
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z ]", "")))
        .cast("double") / length(col("text"))
    val stopHits = size(filter(split(col("text"), " "),
      t => t.isin("the", "a", "of", "and", "to", "in", "is", "it")))
    val y = (nTok.between(10, 100000) && alphaRatio >= 0.6 &&
      stopHits >= lit(2)).cast("int").cast("double")
    val f = feats(d.select(col("doc_id"), col("text"), y.as("y")))
    val w = TextAnalysis.logisticFitGd(f, "v", "y", 64, steps = 4, lr = 16.0).last
    val ms = margins(f, w)
    val pos = ms.filter(_._1 == 1.0).map(_._2).sorted
    val neg = ms.filter(_._1 == 0.0).map(_._2).sorted
    // rank-sum AUC over margins (monotone in the sigmoid, same AUC)
    val all = ms.map(_._2).sorted
    def rank(v: Double) = all.indexWhere(_ >= v) + 1.0
    val auc = (pos.map(rank).sum - pos.size * (pos.size + 1) / 2.0) /
      (pos.size.toDouble * neg.size)
    assert(auc > 0.9, s"train AUC $auc below 0.9 — the fit did not learn")
  }

  test("streaming featurize+score path is bit-parity with the batch scorer") {
    val docs = planted
    val f = feats(docs)
    val w = TextAnalysis.logisticFitGd(f, "v", "y", 64, steps = 4, lr = 16.0).last
    // batch scorer: t25's expressions over the groupBy featurizer
    val batch = f.select(col("doc_id"),
        (floor((lit(1.0) / (lit(1.0) +
          exp(-Similarity.dot(col("v"), typedlit(w.toSeq))))) * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // streaming scorer's row-local expressions, applied to the same
    // batch frame (the physical exprs are identical on a stream)
    val stream = graft.streaming.CorpusStream.learnedQualityStream(
        docs.select(col("doc_id"), col("text")), "doc_id", "text",
        w.toSeq, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(stream.keySet == batch.keySet)
    for ((k, v) <- batch)
      assert(java.lang.Double.doubleToLongBits(stream(k)) ==
        java.lang.Double.doubleToLongBits(v),
        s"doc $k: stream ${stream(k)} != batch $v")
  }
}
