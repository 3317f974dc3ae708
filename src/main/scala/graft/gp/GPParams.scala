package graft.gp

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.gp.kernel.{Kernel, Kernels}

/**
 * Fit-side parameters shared by every graft GP estimator — split from
 * the column parameters so estimators that inherit Spark's own column
 * params (e.g. [[GPBinaryClassifier]], a real `ProbabilisticClassifier`
 * whose `featuresCol`/`labelCol`/`predictionCol` come from MLlib's
 * shared-param traits) can mix this in without duplicate param names.
 */
trait GPFitParams extends Params {

  final val kernelFactory = new Param[() => Kernel](this, "kernelFactory",
    "no-arg factory for the prior covariance kernel")
  final val expertSize = new IntParam(this, "expertSize",
    "data points per BCM expert; training cost grows cubically with it",
    ParamValidators.gt(0))
  final val inducingSize = new IntParam(this, "inducingSize",
    "number of inducing points m for the projected process; model size is O(m²)",
    ParamValidators.gt(0))
  final val noise = new DoubleParam(this, "noise",
    "variance σ² of the white observation noise added to the kernel diagonal",
    ParamValidators.gt(0))
  final val maxIter = new IntParam(this, "maxIter", "max L-BFGS-B iterations",
    ParamValidators.gt(0))
  final val tol = new DoubleParam(this, "tol", "optimizer convergence tolerance",
    ParamValidators.gt(0))
  final val seed = new LongParam(this, "seed", "random seed")
  final val inducingStrategy = new Param[String](this, "inducingStrategy",
    "inducing point selection: random | kmeans | greedy | greedy-likelihood | greedy-likelihood-full",
    ParamValidators.inArray(Array("random", "kmeans", "greedy", "greedy-likelihood", "greedy-likelihood-full")))
  final val expertAssignment = new Param[String](this, "expertAssignment",
    "how rows become BCM experts: chunk (contiguous slices) | kmeans " +
      "(locality cells, tightest for the BCM factorization)",
    ParamValidators.inArray(Array("chunk", "kmeans")))

  setDefault(kernelFactory -> (() => Kernels.rbf()),
    expertSize -> 100, inducingSize -> 100, noise -> 1e-3,
    maxIter -> 100, tol -> 1e-6, seed -> 42L,
    inducingStrategy -> "random", expertAssignment -> "chunk")

  def setKernel(v: () => Kernel): this.type = set(kernelFactory, v)
  def setExpertSize(v: Int): this.type = set(expertSize, v)
  def setInducingSize(v: Int): this.type = set(inducingSize, v)
  def setNoise(v: Double): this.type = set(noise, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setInducingStrategy(v: String): this.type = set(inducingStrategy, v)
  def setExpertAssignment(v: String): this.type = set(expertAssignment, v)

  /** Build the expert RDD per `expertAssignment`. */
  protected def assignExperts(data: org.apache.spark.rdd.RDD[(Array[Double], Double)]):
      org.apache.spark.rdd.RDD[graft.gp.kernel.ExpertData] =
    $(expertAssignment) match {
      case "kmeans" => GPCore.buildExpertsByLocality(data, $(expertSize), $(seed))
      case _ => GPCore.buildExperts(data, $(expertSize))
    }

  /** Full prior kernel: user kernel + non-trainable white noise
    * (mirrors reference `GaussianProcessCommons.scala:19`). */
  protected def fullKernel(): Kernel = $(kernelFactory)() + Kernels.white($(noise))

  /** Inducing-set selection per `inducingStrategy` (the likelihood
    * variant needs labels + the fitted kernel; the rest only inputs). */
  protected def selectInducing(spark: org.apache.spark.sql.SparkSession,
      data: org.apache.spark.rdd.RDD[(Array[Double], Double)],
      fitted: Kernel): Array[Array[Double]] =
    InducingPoints.selectWithData(
      $(inducingStrategy), spark, data, $(inducingSize), $(seed), fitted)
}

/**
 * Shared MLlib-style parameters for the graft GP estimators — the same
 * surface as the reference's `GaussianProcessParams.scala`, expressed
 * with public `org.apache.spark.ml.param` machinery. Column params live
 * here; fit params in [[GPFitParams]].
 */
trait GPParams extends GPFitParams {

  final val featuresCol = new Param[String](this, "featuresCol",
    "features column: array<double>, array<float> or ML Vector")
  final val labelCol = new Param[String](this, "labelCol", "label column")
  final val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  final val predStdCol = new Param[String](this, "predStdCol",
    "optional predictive-stddev column; empty = omitted")

  setDefault(featuresCol -> "features", labelCol -> "label",
    predictionCol -> "prediction", predStdCol -> "")

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setPredStdCol(v: String): this.type = set(predStdCol, v)

  /** `featuresCol` as array<double>, whatever its physical type. */
  protected def featuresAsArray(df: DataFrame): Column =
    GPColumns.featuresAsArray(df, $(featuresCol))

  protected def outputSchema(schema: StructType): StructType = {
    var out = schema.add(StructField($(predictionCol), DoubleType, nullable = false))
    if ($(predStdCol).nonEmpty)
      out = out.add(StructField($(predStdCol), DoubleType, nullable = false))
    out
  }
}

/** Column helpers shared by the array-typed and Vector-typed estimators. */
private[gp] object GPColumns {

  /** The named column as array<double>, whatever its physical type. */
  def featuresAsArray(df: DataFrame, name: String): Column = {
    val dt = df.schema(name).dataType
    dt match {
      case ArrayType(DoubleType, _) => col(name)
      case ArrayType(_, _) => col(name).cast("array<double>")
      case t if t.typeName == "vector" => vector_to_array(col(name)).cast("array<double>")
      case other => throw new IllegalArgumentException(
        s"featuresCol must be an array or Vector, got $other")
    }
  }
}
