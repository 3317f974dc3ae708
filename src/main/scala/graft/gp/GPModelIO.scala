package graft.gp

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.SparkSession

import graft.gp.kernel.Kernel

/**
 * Parquet persistence for fitted GP models (the reference has no model
 * persistence at all). The model IS small — inducing inputs (m×d),
 * weights (m), covariance adjustment (m×m), kernel object — so one
 * parquet row holds it; kernels serialize via Java serialization
 * (every graft Kernel is an immutable Serializable value object).
 */
/** Serialized model row (top-level so encoder codegen can reach the
  * constructor — a private nested class forces interpreter fallback). */
private[gp] case class GPSavedModel(
    flavor: String,
    inducing: Seq[Seq[Double]],
    weights: Seq[Double],
    covAdjust: Seq[Double],
    m: Int,
    kernelBytes: Array[Byte],
    featuresCol: String,
    predictionCol: String,
    predStdCol: String,
    probabilityCol: String,
    probabilityMode: String)

object GPModelIO {

  private def toBytes(k: Kernel): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(k)
    oos.close()
    bos.toByteArray
  }

  private def fromBytes(b: Array[Byte]): Kernel = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[Kernel] finally ois.close()
  }

  private def pack(flavor: String, p: ProjectedGP, featuresCol: String,
      predictionCol: String, predStdCol: String, probabilityCol: String,
      probabilityMode: String): GPSavedModel =
    GPSavedModel(flavor, p.inducing.map(_.toSeq).toSeq, p.weights.toArray.toSeq,
      p.covAdjust.toArray.toSeq, p.weights.length, toBytes(p.kernel),
      featuresCol, predictionCol, predStdCol, probabilityCol, probabilityMode)

  private def unpack(s: GPSavedModel): ProjectedGP =
    ProjectedGP(
      s.inducing.map(_.toArray).toArray,
      BDV(s.weights.toArray),
      new BDM(s.m, s.m, s.covAdjust.toArray),
      fromBytes(s.kernelBytes))

  def save(model: GPRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq(pack("regression", model.projected, model.getOrDefault(model.featuresCol),
      model.getOrDefault(model.predictionCol),
      model.getOrDefault(model.predStdCol), "", ""))
      .toDS().write.mode("overwrite").parquet(path)
  }

  def save(model: GPClassificationModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq(pack("classification", model.projected,
      model.getOrDefault(model.featuresCol),
      model.getOrDefault(model.predictionCol),
      model.getOrDefault(model.predStdCol),
      model.getOrDefault(model.probabilityCol),
      model.getOrDefault(model.probabilityMode)))
      .toDS().write.mode("overwrite").parquet(path)
  }

  /** Persist the `ProbabilisticClassifier`-flavored binary model; the
    * MLlib column params (features/prediction/rawPrediction/
    * probability) round-trip through the same row. */
  def save(model: GPBinaryClassificationModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq(pack("binary-probabilistic", model.projected,
      model.getFeaturesCol, model.getPredictionCol,
      model.getRawPredictionCol, model.getProbabilityCol, ""))
      .toDS().write.mode("overwrite").parquet(path)
  }

  def loadBinaryClassifier(spark: SparkSession, path: String): GPBinaryClassificationModel = {
    import spark.implicits._
    val s = spark.read.parquet(path).as[GPSavedModel].head()
    require(s.flavor == "binary-probabilistic",
      s"expected a binary-probabilistic model, found ${s.flavor}")
    val m = new GPBinaryClassificationModel(
      org.apache.spark.ml.util.Identifiable.randomUID("graftGPBC"), unpack(s))
    m.setFeaturesCol(s.featuresCol).setPredictionCol(s.predictionCol)
      .setRawPredictionCol(s.predStdCol).setProbabilityCol(s.probabilityCol)
    m
  }

  def loadRegression(spark: SparkSession, path: String): GPRegressionModel = {
    import spark.implicits._
    val s = spark.read.parquet(path).as[GPSavedModel].head()
    require(s.flavor == "regression", s"expected a regression model, found ${s.flavor}")
    val m = new GPRegressionModel(
      org.apache.spark.ml.util.Identifiable.randomUID("graftGPR"), unpack(s))
    m.setFeaturesCol(s.featuresCol).setPredictionCol(s.predictionCol)
      .setPredStdCol(s.predStdCol)
    m
  }

  def loadClassification(spark: SparkSession, path: String): GPClassificationModel = {
    import spark.implicits._
    val s = spark.read.parquet(path).as[GPSavedModel].head()
    require(s.flavor == "classification", s"expected a classification model, found ${s.flavor}")
    val m = new GPClassificationModel(
      org.apache.spark.ml.util.Identifiable.randomUID("graftGPC"), unpack(s))
    m.setFeaturesCol(s.featuresCol).setPredictionCol(s.predictionCol)
      .setPredStdCol(s.predStdCol).setProbabilityCol(s.probabilityCol)
      .setProbabilityMode(s.probabilityMode)
    m
  }

  /** Persist a one-vs-rest ensemble: one binary model dir per class
    * (`path/model_<i>`) plus the ordered label list (`path/labels`). */
  def save(ovr: GPOneVsRest.Fitted, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    ovr.labels.zipWithIndex.foreach { case (_, i) =>
      save(ovr.models(i), s"$path/model_$i")
    }
    ovr.labels.zipWithIndex.map { case (l, i) => (i, l) }
      .toDS().toDF("idx", "label")
      .write.mode("overwrite").parquet(s"$path/labels")
  }

  /** Wrap an explicitly-constructed projected-process model (fixed Z,
    * weights, covariance adjustment) as a transformable model — used to
    * oracle-check the prediction equations with a deterministic model,
    * and handy for deploying externally-fitted GPs. */
  def fromProjected(p: ProjectedGP): GPRegressionModel =
    new GPRegressionModel(
      org.apache.spark.ml.util.Identifiable.randomUID("graftGPfixed"), p)

  /** [[fromProjected]] for the sigmoid-link classifier flavor. */
  def classificationFromProjected(p: ProjectedGP): GPClassificationModel =
    new GPClassificationModel(
      org.apache.spark.ml.util.Identifiable.randomUID("graftGPCfixed"), p)

  /** [[fromProjected]] for the `ProbabilisticClassifier` flavor. */
  def binaryFromProjected(p: ProjectedGP): GPBinaryClassificationModel =
    new GPBinaryClassificationModel(
      org.apache.spark.ml.util.Identifiable.randomUID("graftGPBCfixed"), p)

  def loadOneVsRest(spark: SparkSession, path: String): GPOneVsRest.Fitted = {
    val labels = spark.read.parquet(s"$path/labels")
      .orderBy("idx").collect().map(_.getDouble(1)).toSeq
    val models = labels.indices.map(i => loadClassification(spark, s"$path/model_$i"))
    GPOneVsRest.Fitted(labels, models)
  }
}
