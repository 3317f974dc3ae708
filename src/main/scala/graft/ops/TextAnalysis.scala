package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for LLM training-data pipelines.
 *
 * Everything here is built from `org.apache.spark.sql.functions` column
 * expressions (no UDFs on the hot path) so plans stay inside Tungsten
 * and scale linearly with no shuffle: each feature is a narrow map over
 * the `text` column.
 */
object TextAnalysis {

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Ratio of stopword tokens to all tokens (0 when empty). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(StopWords: _*))
    when(size(toks) === 0, lit(0.0)).otherwise(size(stops).cast("double") / size(toks))
  }

  /** Ratio of non-alphanumeric, non-space characters to all characters. */
  def punctRatio(text: Column): Column = {
    val cleaned = regexp_replace(text, "[A-Za-z0-9\\s]", "")
    when(length(text) === 0, lit(0.0))
      .otherwise(length(cleaned).cast("double") / length(text))
  }

  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, " ", "")).cast("double") / size(toks))
  }

  /**
   * 64-bit order-sensitive document fingerprint: fold token xxhash64
   * values through `acc * 1000003 XOR h`. A pure expression (no UDF);
   * identical token sequences — and only those — collide.
   */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(1469598103934665603L),
      (acc, t) => (acc * lit(1000003L)).bitwiseXOR(xxhash64(t)))

  /** Word n-grams (as space-joined strings) of a text column. */
  def wordNGrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    when(count <= 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), count),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
  }

  /**
   * Character n-gram language identification.
   *
   * Trains per-language trigram profiles from a labeled corpus (one
   * aggregation, top-`profileSize` trigrams each, broadcast via a join
   * on the exploded trigram), then scores each document by the number of
   * profile hits per language. Output: doc_id, predicted, actual.
   *
   * Scale: the profile is O(langs × profileSize) — broadcast; documents
   * stream through one explode + aggregation keyed by doc_id.
   */
  def langId(docs: DataFrame, profileSize: Int = 300): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col("lang"), explode(charNGrams(col("text"), 3)).as("gram"))
    val profiles = grams
      .groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rnk") <= profileSize)
      .select(col("lang").as("profile_lang"), col("gram"), col("cnt").as("weight"))
    grams
      .join(broadcast(profiles), "gram")
      .groupBy(col("doc_id"), col("lang"), col("profile_lang"))
      .agg(sum("weight").as("score"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("profile_lang"))))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("profile_lang").as("predicted"), col("lang").as("actual"))
  }

  /** Character n-grams of a text column. */
  def charNGrams(text: Column, n: Int): Column = {
    val count = length(text) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), count), i => text.substr(i, lit(n))))
  }
}
