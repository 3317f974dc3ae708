package graft.gp

import org.apache.spark.ml.classification.OneVsRest
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.gp.kernel.Kernels._

class GPBinaryClassifierSpec extends SparkTestBase {

  private def blobs(classes: Int, perClass: Int, seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.tabulate(classes)(c =>
      Array(3.0 * math.cos(2 * math.Pi * c / classes),
        3.0 * math.sin(2 * math.Pi * c / classes)))
    val rows = (0 until classes * perClass).map { i =>
      val c = i % classes
      (centers(c).map(_ + 0.5 * rnd.nextGaussian()), c.toDouble)
    }
    rows.toDF("raw", "label")
      .select(array_to_vector(col("raw")).as("features"), col("label"))
  }

  private def gp() = new GPBinaryClassifier()
    .setKernel(() => 1.0 * rbf(1.0))
    .setNoise(1e-2).setExpertSize(50).setInducingSize(25).setMaxIter(20)

  test("binary fit/transform fulfills the ProbabilisticClassifier contract") {
    val df = blobs(classes = 2, perClass = 100, seed = 19)
    val model = gp().fit(df)
    assert(model.numClasses == 2)
    val scored = model.transform(df)
    // contract columns: rawPrediction, probability, prediction
    assert(Seq("rawPrediction", "probability", "prediction")
      .forall(scored.columns.contains))
    val acc = scored.select(avg(when(col("prediction") === col("label"), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc > 0.95, s"accuracy=$acc")
    // probabilities are a distribution; raw scores are (-m, m)
    val row = scored.select("rawPrediction", "probability").head()
    val raw = row.getAs[org.apache.spark.ml.linalg.Vector](0)
    val prob = row.getAs[org.apache.spark.ml.linalg.Vector](1)
    assert(math.abs(raw(0) + raw(1)) < 1e-12)
    assert(math.abs(prob(0) + prob(1) - 1.0) < 1e-12)
    assert(prob(0) >= 0.0 && prob(1) >= 0.0)
    // single-vector prediction path (the meta-algorithms use it too)
    val p = model.predict(Vectors.dense(3.0, 0.0))
    assert(p == 0.0 || p == 1.0)
  }

  test("stock OneVsRest composes over GPBinaryClassifier") {
    val df = blobs(classes = 3, perClass = 70, seed = 23)
    val ovr = new OneVsRest().setClassifier(gp())
    val scored = ovr.fit(df).transform(df)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(scored)
    assert(acc > 0.93, s"OneVsRest accuracy=$acc")
  }

  test("binary probabilistic model save/load round-trips predictions exactly") {
    val df = blobs(classes = 2, perClass = 80, seed = 37)
    val model = gp().fit(df)
    val dir = java.nio.file.Files.createTempDirectory("gpbc").toString
    GPModelIO.save(model, s"$dir/m")
    val loaded = GPModelIO.loadBinaryClassifier(spark, s"$dir/m")
    val a = model.transform(df).select("label", "prediction", "probability")
      .collect().map(r => (r.getDouble(0), r.getDouble(1),
        r.getAs[org.apache.spark.ml.linalg.Vector](2).toArray.toSeq)).toSeq
    val b = loaded.transform(df).select("label", "prediction", "probability")
      .collect().map(r => (r.getDouble(0), r.getDouble(1),
        r.getAs[org.apache.spark.ml.linalg.Vector](2).toArray.toSeq)).toSeq
    assert(a == b, "loaded model must predict bit-identically")
  }

  test("stock CrossValidator + evaluator compose (reference Iris flow)") {
    val df = blobs(classes = 3, perClass = 50, seed = 29)
    val cv = new CrossValidator()
      .setEstimator(new OneVsRest().setClassifier(gp()))
      .setEvaluator(new MulticlassClassificationEvaluator().setMetricName("accuracy"))
      .setEstimatorParamMaps(new ParamGridBuilder().build())
      .setNumFolds(2)
      .setSeed(7L)
    val avgMetrics = cv.fit(df).avgMetrics
    assert(avgMetrics.nonEmpty && avgMetrics.head > 0.85,
      s"CV accuracy=${avgMetrics.toList}")
  }
}
