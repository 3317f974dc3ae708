package graft.gp

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.gp.kernel.{Kernel, Kernels}

/**
 * Shared MLlib-style parameters for the graft GP estimators — the same
 * surface as the reference's `GaussianProcessParams.scala`, expressed
 * with public `org.apache.spark.ml.param` machinery.
 */
trait GPParams extends Params {

  final val featuresCol = new Param[String](this, "featuresCol",
    "features column: array<double>, array<float> or ML Vector")
  final val labelCol = new Param[String](this, "labelCol", "label column")
  final val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  final val predStdCol = new Param[String](this, "predStdCol",
    "optional predictive-stddev column; empty = omitted")
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
    "inducing point selection: random | kmeans | greedy",
    ParamValidators.inArray(Array("random", "kmeans", "greedy")))
  final val expertAssignment = new Param[String](this, "expertAssignment",
    "how rows become BCM experts: chunk (contiguous slices) | kmeans " +
      "(locality cells, tightest for the BCM factorization)",
    ParamValidators.inArray(Array("chunk", "kmeans")))

  setDefault(featuresCol -> "features", labelCol -> "label",
    predictionCol -> "prediction", predStdCol -> "",
    kernelFactory -> (() => Kernels.rbf()),
    expertSize -> 100, inducingSize -> 100, noise -> 1e-3,
    maxIter -> 100, tol -> 1e-6, seed -> 42L, inducingStrategy -> "random",
    expertAssignment -> "chunk")

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setPredStdCol(v: String): this.type = set(predStdCol, v)
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

  /** `featuresCol` as array<double>, whatever its physical type. */
  protected def featuresAsArray(df: DataFrame): Column = {
    val dt = df.schema($(featuresCol)).dataType
    dt match {
      case ArrayType(DoubleType, _) => col($(featuresCol))
      case ArrayType(_, _) => col($(featuresCol)).cast("array<double>")
      case t if t.typeName == "vector" => vector_to_array(col($(featuresCol))).cast("array<double>")
      case other => throw new IllegalArgumentException(
        s"featuresCol must be an array or Vector, got $other")
    }
  }

  protected def outputSchema(schema: StructType): StructType = {
    var out = schema.add(StructField($(predictionCol), DoubleType, nullable = false))
    if ($(predStdCol).nonEmpty)
      out = out.add(StructField($(predStdCol), DoubleType, nullable = false))
    out
  }
}
