package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Quality gates for the GP driver queries on the sf0.001 testdata. */
class GPQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Q.all.find(_.name == name).get.run(spark, dir)

  test("gp01 regression learns the synthetic target") {
    val out = run("gp01_regression_fit_predict").cache()
    val rmse = math.sqrt(out
      .select(avg(pow(col("prediction") - col("label"), 2))).head().getDouble(0))
    val std = out.select(stddev("label")).head().getDouble(0)
    assert(rmse < 0.5 * std, s"rmse=$rmse vs target std=$std")
    out.unpersist()
  }

  test("gp02 classification beats chance comfortably") {
    val out = run("gp02_classification_fit_predict").cache()
    val acc = out
      .select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > 0.8, s"accuracy=$acc")
    out.unpersist()
  }

  test("gp03 variance output is positive and bounded") {
    val out = run("gp03_predictive_variance")
    val r = out.agg(min("pred_std"), max("pred_std"), count(lit(1))).head()
    assert(r.getDouble(0) >= 0.0)
    assert(r.getDouble(1) < 10.0)
    assert(r.getLong(2) > 0)
  }
}
