package graft.gp

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/**
 * Binary Gaussian Process classification on Spark (labels 0/1, logistic
 * link) — the graft re-expression of the reference spark-gp
 * `GaussianProcessClassifier.scala`.
 *
 * The intractable posterior is handled per expert with the Laplace
 * approximation (Newton mode finding, Algorithms 3.1/5.1 of Rasmussen &
 * Williams 2005); fitting is the same one-treeAggregate-per-step BCM
 * scheme as regression. Prediction projects the latent modes onto the
 * inducing set; `probabilityCol` is either the sigmoid of the latent
 * mean (`probabilityMode=mean`, the reference's behavior) or the
 * Gauss–Hermite average of the sigmoid over the latent predictive
 * distribution (`probabilityMode=integrated`).
 */
class GPClassifier(override val uid: String)
    extends Estimator[GPClassificationModel] with GPParams {

  def this() = this(Identifiable.randomUID("graftGPC"))

  final val probabilityCol = new Param[String](this, "probabilityCol", "probability column")
  final val probabilityMode = new Param[String](this, "probabilityMode",
    "mean | integrated", ParamValidators.inArray(Array("mean", "integrated")))
  setDefault(probabilityCol -> "probability", probabilityMode -> "mean")
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)
  def setProbabilityMode(v: String): this.type = set(probabilityMode, v)

  override def fit(dataset: Dataset[_]): GPClassificationModel = {
    val df = dataset.toDF()
    val spark = df.sparkSession
    val data = df
      .select(featuresAsArray(df).as("f"), col($(labelCol)).cast("double").as("y"))
      .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val proj = GPCore.fitBinaryGP(
      assignExperts(data), fullKernel(), $(tol), $(maxIter), $(tol),
      optimal => selectInducing(spark, data, optimal))
    copyValues(new GPClassificationModel(uid, proj)).setParent(this)
  }

  override def transformSchema(schema: StructType): StructType =
    outputSchema(schema).add(StructField($(probabilityCol), DoubleType, nullable = false))
  override def copy(extra: ParamMap): GPClassifier = defaultCopy(extra)
}

/** Fitted binary GP classifier; adds probability + 0/1 prediction. */
class GPClassificationModel private[gp](override val uid: String,
    private[gp] val projected: ProjectedGP)
    extends Model[GPClassificationModel] with GPParams {

  final val probabilityCol = new Param[String](this, "probabilityCol", "probability column")
  final val probabilityMode = new Param[String](this, "probabilityMode",
    "mean | integrated", ParamValidators.inArray(Array("mean", "integrated")))
  setDefault(probabilityCol -> "probability", probabilityMode -> "mean")
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)
  def setProbabilityMode(v: String): this.type = set(probabilityMode, v)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val df = dataset.toDF()
    val bc = df.sparkSession.sparkContext.broadcast(projected)
    val integrated = $(probabilityMode) == "integrated"
    val gh = new GaussHermite(32)
    val probUdf = udf { (f: Seq[Double]) =>
      val (mean, variance) = bc.value.predict(f.toArray)
      val p =
        if (integrated) gh.expectation(mean, variance, t => 1.0 / (1.0 + math.exp(-t)))
        else 1.0 / (1.0 + math.exp(-mean))
      val std = math.sqrt(variance max 0.0)
      (p, if (p >= 0.5) 1.0 else 0.0, std)
    }
    val withP = df.withColumn("__gp", probUdf(featuresAsArray(df)))
      .withColumn($(probabilityCol), col("__gp._1"))
      .withColumn($(predictionCol), col("__gp._2"))
    val out =
      if ($(predStdCol).nonEmpty) withP.withColumn($(predStdCol), col("__gp._3"))
      else withP
    out.drop("__gp")
  }

  override def transformSchema(schema: StructType): StructType =
    outputSchema(schema).add(StructField($(probabilityCol), DoubleType, nullable = false))
  override def copy(extra: ParamMap): GPClassificationModel =
    copyValues(new GPClassificationModel(uid, projected), extra).setParent(parent)
}
