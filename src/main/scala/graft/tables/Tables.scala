package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Typed accessors for the testdata star schema (TPC-H-ish + events +
 * documents + embeddings). One parquet file per table under `dir`.
 *
 * All loaders are plain `spark.read.parquet` scans so Catalyst keeps
 * full pushdown/pruning freedom; no caching here — callers decide.
 */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /**
   * `events.ts` has shipped as both TIMESTAMP(NANOS) (no native Spark
   * type — surfaces as long under `nanosAsLong`) and plain TIMESTAMP(µs),
   * depending on the generator version. Adapt to what the file holds:
   * long nanos are floor-converted to a microsecond timestamp (matching
   * DuckDB's ns→µs date_diff flooring); native timestamps pass through.
   */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // isAdjustedToUTC=false parquet surfaces as NTZ; downstream code
        // (unix_micros, session_window) expects TIMESTAMP. The session
        // timezone is pinned UTC everywhere, so the cast is value-exact.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
