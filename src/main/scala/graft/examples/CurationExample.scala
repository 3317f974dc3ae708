package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Packing}
import graft.ops.TextAnalysis.tokenCount

/**
 * End-to-end training-data curation as a USER of the library would
 * compose it — the one-call ops behind the p07/p05 query plans:
 *
 *   quality gate → exact+near-dup dedup (`Dedup.dedupeCorpus`) →
 *   deterministic hash split → sequence packing
 *   (`Packing.packChunks`)
 *
 * Every stage is a narrow map, a key-local aggregate, or the dedup
 * pipeline's (bucket, id)-only shuffles; nothing document-sized
 * collects or cross-joins. Run on the testdata `documents` table via
 * `main`, or call [[curate]] from any pipeline.
 */
object CurationExample {

  /** (train-ready packed chunks, per-stage survivor counts). */
  def curate(docs: DataFrame, budget: Int = 512, buckets: Int = 8)
      : (DataFrame, Map[String, Long]) = {
    val nTok = size(split(col("text"), " "))
    val alphaRatio =
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z ]", "")))
        .cast("double") / length(col("text"))
    val gated = docs.filter(nTok.between(10, 100000) && alphaRatio >= 0.6)
    val deduped = Dedup.dedupeCorpus(gated, "doc_id", "text")
    val split3 = deduped.withColumn("split",
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "cd", "train")
        .otherwise("heldout"))
    val packed = Packing.packChunks(
      split3.filter(col("split") === "train")
        .select(col("source"), col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens")),
      "source", "doc_id", "n_tokens", budget, buckets)
    val counts = Map(
      "input" -> docs.count(),
      "gated" -> gated.count(),
      "deduped" -> deduped.count(),
      "packed_docs" -> packed.count())
    (packed, counts)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (packed, counts) = curate(docs)
    counts.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"$k%-12s $v") }
    packed.orderBy("source", "bucket", "doc_id").show(10, truncate = false)
    spark.stop()
  }
}
