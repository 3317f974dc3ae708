package graft.gp

import org.apache.spark.ml.classification.{ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

/**
 * Binary GP classification as a REAL Spark `ProbabilisticClassifier` —
 * the same Laplace/BCM/projected-process machinery as [[GPClassifier]],
 * but implementing MLlib's classifier contract so the stock
 * meta-algorithms compose untouched: `OneVsRest`, `CrossValidator`,
 * `ParamGridBuilder`, `MulticlassClassificationEvaluator` — the way the
 * reference's `GaussianProcessClassifier` is used in its Iris example
 * (`examples/Iris.scala:27-34`: `new OneVsRest().setClassifier(gp)`
 * inside a `CrossValidator`).
 *
 * Features are ML `Vector`s (the meta-algorithms' currency);
 * `rawPredictionCol` carries (−latentMean, +latentMean) and
 * `probabilityCol` the sigmoid link of the latent mean, matching the
 * reference classifier's probability semantics.
 */
class GPBinaryClassifier(override val uid: String)
    extends ProbabilisticClassifier[Vector, GPBinaryClassifier, GPBinaryClassificationModel]
    with GPFitParams {

  def this() = this(Identifiable.randomUID("graftGPBC"))

  override protected def train(dataset: Dataset[_]): GPBinaryClassificationModel = {
    val df = dataset.toDF()
    val spark = df.sparkSession
    val data = df
      .select(GPColumns.featuresAsArray(df, $(featuresCol)).as("f"),
        col($(labelCol)).cast("double").as("y"))
      .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val proj = GPCore.fitBinaryGP(
      assignExperts(data), fullKernel(), $(tol), $(maxIter), $(tol),
      optimal => selectInducing(spark, data, optimal))
    copyValues(new GPBinaryClassificationModel(uid, proj)).setParent(this)
  }

  override def copy(extra: ParamMap): GPBinaryClassifier = defaultCopy(extra)
}

/** Fitted binary GP `ProbabilisticClassificationModel`: raw scores are
  * (−latentMean, +latentMean), probabilities their sigmoid link. The
  * O(m²) projected model ships once per stage with the task closure. */
class GPBinaryClassificationModel private[gp](
    override val uid: String,
    private[gp] val projected: ProjectedGP)
    extends ProbabilisticClassificationModel[Vector, GPBinaryClassificationModel]
    with GPFitParams {

  override def numClasses: Int = 2

  override def predictRaw(features: Vector): Vector = {
    val (mean, _) = projected.predict(features.toArray)
    Vectors.dense(-mean, mean)
  }

  override protected def raw2probabilityInPlace(rawPrediction: Vector): Vector =
    rawPrediction match {
      case dv: DenseVector =>
        val p = 1.0 / (1.0 + math.exp(-dv.values(1)))
        dv.values(0) = 1.0 - p
        dv.values(1) = p
        dv
      case other => throw new IllegalArgumentException(
        s"unexpected raw prediction vector type ${other.getClass.getName}")
    }

  override def copy(extra: ParamMap): GPBinaryClassificationModel =
    copyValues(new GPBinaryClassificationModel(uid, projected), extra).setParent(parent)
}
