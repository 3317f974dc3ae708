package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.CorpusStream._

class CorpusStreamSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming dedup keeps first arrival, drops copies across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = dedupStream(input.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(
        Doc(1, ts(0), "alpha beta"),
        Doc(2, ts(1), "gamma delta"),
        Doc(3, ts(2), "alpha beta")) // same-batch dup
      query.processAllAvailable()
      input.addData(
        Doc(4, ts(5), "alpha beta"),  // cross-batch dup within watermark
        Doc(5, ts(6), "epsilon zeta"))
      query.processAllAvailable()

      val texts = spark.table("dedup").as[Doc].collect().map(_.text).sorted
      assert(texts.toSeq == Seq("alpha beta", "epsilon zeta", "gamma delta"))
      val keptIds = spark.table("dedup").as[Doc].collect().map(_.doc_id).toSet
      assert(!keptIds.contains(4L), "cross-batch duplicate must be dropped")
    } finally query.stop()
  }

  test("quality gate filters short and stopword-heavy docs on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val good = Seq.fill(25)("word").mkString(" ")
    val stopHeavy = (Seq.fill(15)("the") ++ Seq.fill(10)("word")).mkString(" ")
    val query = qualityGate(input.toDF())
      .writeStream.format("memory").queryName("gate").outputMode("append").start()
    try {
      input.addData(
        Doc(1, ts(0), good),
        Doc(2, ts(1), "too short"),
        Doc(3, ts(2), stopHeavy))
      query.processAllAvailable()
      val kept = spark.table("gate").as[Doc].collect().map(_.doc_id).toSet
      assert(kept == Set(1L))
    } finally query.stop()
  }
}
