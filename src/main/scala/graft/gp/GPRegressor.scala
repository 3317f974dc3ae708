package graft.gp

import breeze.linalg.{DenseVector => BDV}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Gaussian Process regression on Spark — the graft re-expression of the
 * reference spark-gp `GaussianProcessRegression.scala`.
 *
 * Fit: Bayesian Committee Machine — experts of `expertSize` points,
 * summed per-expert negative log marginal likelihood minimized by
 * L-BFGS-B, one depth-2 `treeAggregate` per evaluation (linear in n).
 * Predict: Projected Process over `inducingSize` points — the model is
 * O(m²), broadcast, and `transform` is a narrow map (no shuffle), so
 * scoring scales to any corpus size.
 */
class GPRegressor(override val uid: String)
    extends Estimator[GPRegressionModel] with GPParams {

  def this() = this(Identifiable.randomUID("graftGPR"))

  override def fit(dataset: Dataset[_]): GPRegressionModel = {
    val df = dataset.toDF()
    val spark = df.sparkSession
    val data = df
      .select(featuresAsArray(df).as("f"), col($(labelCol)).cast("double").as("y"))
      .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))

    val experts = assignExperts(data)
    val optimal = GPCore.optimizeHypers(
      experts, fullKernel(), GPCore.regressionObjective, $(maxIter), $(tol))

    val z = selectInducing(spark, data, optimal)
    val proj = GPCore.fitProjected(
      experts.map(e => (BDV(e.y), e)), optimal, z)
    experts.unpersist()

    copyValues(new GPRegressionModel(uid, proj)).setParent(this)
  }

  override def transformSchema(schema: StructType): StructType = outputSchema(schema)
  override def copy(extra: ParamMap): GPRegressor = defaultCopy(extra)
}

/** Fitted GP regression model; adds `predictionCol` (+ `predStdCol`). */
class GPRegressionModel private[gp](override val uid: String,
    private[gp] val projected: ProjectedGP)
    extends Model[GPRegressionModel] with GPParams {

  override def transform(dataset: Dataset[_]): DataFrame = {
    val df = dataset.toDF()
    val bc = df.sparkSession.sparkContext.broadcast(projected)
    val predictUdf = udf { (f: Seq[Double]) =>
      val (mean, variance) = bc.value.predict(f.toArray)
      (mean, math.sqrt(variance max 0.0))
    }
    val withPred = df.withColumn("__gp", predictUdf(featuresAsArray(df)))
    val out = withPred.withColumn($(predictionCol), col("__gp._1"))
    val withStd =
      if ($(predStdCol).nonEmpty) out.withColumn($(predStdCol), col("__gp._2"))
      else out
    withStd.drop("__gp")
  }

  override def transformSchema(schema: StructType): StructType = outputSchema(schema)
  override def copy(extra: ParamMap): GPRegressionModel =
    copyValues(new GPRegressionModel(uid, projected), extra).setParent(parent)
}
