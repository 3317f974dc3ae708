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
   * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark has no native
   * type for: read the raw nanos as long and floor-convert to a
   * microsecond timestamp (matching DuckDB's ns→µs date_diff flooring).
   */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
