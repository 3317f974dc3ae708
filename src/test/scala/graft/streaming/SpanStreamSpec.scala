package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.SpanStream._

class SpanStreamSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** 30 docs with unique tails; docs 0-9 share boilerplate span A,
    * docs 20-24 share span B (arriving across batches). */
  private def corpus(): Seq[(Long, String)] = (0L until 30L).map { i =>
    val tail = (0 until 7).map(j => s"u${i}x$j").mkString(" ")
    val head =
      if (i < 10) "lic a b c d e"
      else if (i >= 20 && i < 25) "tpl p q r s t"
      else s"solo${i} m n o p q"
    (i, s"$head $tail")
  }

  test("row-local span hashing matches the batch md5Hash52 math bit-for-bit") {
    import spark.implicits._
    val docs = corpus().toDF("doc_id", "text")
    val w = 6
    val batch = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= w)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - (w - 1))).as("i"))
      .select(col("doc_id"),
        graft.functions.VectorExpressions.md5Hash52(concat_ws(" ",
          (0 until w).map(j => element_at(col("t"), col("i") + lit(j))): _*)).as("h"))
      .distinct()
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).sorted.toSeq }
    corpus().foreach { case (id, text) =>
      assert(spanHashes(text).toSeq == batch.getOrElse(id, Seq.empty),
        s"span hashes diverge for doc $id")
    }
  }

  test("streaming shared spans across micro-batches equal the batch census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = corpus()
    // span B's sharers split across the two batches (20-22 | 23-24),
    // so the retroactive first-doc emission is exercised cross-batch
    val (first, second) = all.splitAt(23)
    val stream = MemoryStream[Doc]
    val query = sharedSpans(stream.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("span_shared").outputMode("append").start()
    try {
      stream.addData(first.map { case (id, t) => Doc(id, t, ts(1)) })
      query.processAllAvailable()
      stream.addData(second.map { case (id, t) => Doc(id, t, ts(2)) })
      query.processAllAvailable()
      // per-doc shared-span counts must equal the batch census
      val got = spark.table("span_shared")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.ops.Dedup.spanCensus(
        all.toDF("doc_id", "text"), "doc_id", "text", w = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want,
        s"stream=$got\nbatch=$want")
      // the planted boilerplate groups were found
      assert((0L until 10L).forall(got.contains), "span-A sharers missing")
      assert((20L until 25L).forall(got.contains), "span-B sharers missing")
    } finally query.stop()
  }
}
