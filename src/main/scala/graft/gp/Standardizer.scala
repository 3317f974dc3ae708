package graft.gp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Feature standardization for array-typed feature columns, computed in
 * ONE aggregation pass (sum + sum-of-squares per dimension via
 * element-wise array folds) and applied as a pure `zip_with` column
 * expression — no UDF, no extra shuffle.
 * Reference capability: spark-gp `commons/util/Scaling.scala` (two-pass
 * RDD implementation there).
 */
object Standardizer {

  /** (means, stds) per dimension of `features` (array column). One
    * shuffle of d×partitions partial rows (posexplode is map-side
    * combined by the hash aggregate), driver receives d rows. */
  def fit(df: DataFrame, features: String): (Seq[Double], Seq[Double]) = {
    val stats = df
      .select(posexplode(col(features).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("sq"))
      .orderBy("pos")
      .collect()
    val means = stats.map(r => r.getDouble(2) / r.getLong(1)).toSeq
    val stds = stats.zip(means).map { case (r, m) =>
      val v = r.getDouble(3) / r.getLong(1) - m * m
      if (v > 0) math.sqrt(v) else 1.0
    }.toSeq
    (means, stds)
  }

  /** df with `features` replaced by its standardized version. */
  def transformed(df: DataFrame, features: String,
      means: Seq[Double], stds: Seq[Double]): DataFrame =
    df.withColumn(features,
      zip_with(
        zip_with(col(features).cast("array<double>"), typedlit(means), (x, m) => x - m),
        typedlit(stds), (x, s) => x / s))

  /** Fit + transform in one call. */
  def standardize(df: DataFrame, features: String): DataFrame = {
    val (m, s) = fit(df, features)
    transformed(df, features, m, s)
  }
}
