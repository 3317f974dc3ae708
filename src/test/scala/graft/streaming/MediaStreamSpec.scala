package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.ops.Multimodal

class MediaStreamSpec extends SparkTestBase {

  private def png(seed: Long, jitter: Int = 0): Array[Byte] =
    Multimodal.encodePng(seed, jitter = jitter)

  private def arrival(id: Long, seed: Long, jitter: Int = 0): MediaStream.MediaArrival =
    MediaStream.MediaArrival(id,
      new Timestamp(1700000000000L + id * 1000L), png(seed, jitter))

  test("first-seen image dedup drops cross-batch perceptual copies, " +
      "keeps distinct content, drops corrupt blobs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1: originals 0..9; batch 2: a jittered copy of 3 (same
    // content +1 red — the perceptual near-dup), an exact re-encode of
    // 7, a genuinely new image 20, and one corrupt blob
    val b1 = (0L until 10L).map(i => arrival(i, i))
    val b2 = Seq(arrival(103L, 3L, jitter = 1), arrival(107L, 7L),
      arrival(120L, 20L),
      MediaStream.MediaArrival(999L,
        new Timestamp(1700000000000L + 999000L), Array[Byte](1, 2, 3)))

    val stream = MemoryStream[MediaStream.MediaArrival]
    val ckpt = java.nio.file.Files.createTempDirectory("media_spec").toString
    val q = MediaStream.firstSeenImages(stream.toDS(), watermark = "24 hours")
      .writeStream.format("memory").queryName("media_spec_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally {
      q.stop()
      graft.queries.deleteRecursively(ckpt)
    }
    val survivors = spark.table("media_spec_out")
      .collect().map(r => r.getLong(0)).toSet

    // the jittered copy of 3 must hash-match its original (the
    // perceptual property) and drop ACROSS the batch boundary; the
    // exact re-encode of 7 likewise; image 20 is new content
    assert(!survivors.contains(103L), "jittered copy must drop cross-batch")
    assert(!survivors.contains(107L), "re-encoded copy must drop cross-batch")
    assert(survivors.contains(120L), "new content must survive")
    assert(!survivors.contains(999L), "corrupt blob must drop")
    // every batch-1 original with a NOVEL hash survived; survivors
    // equal the batch min-per-hash replay on the same arrivals
    val batchHashes = (b1 ++ b2).flatMap(m =>
      Multimodal.aHashBytes(m.img, 4).map(h => (m.media_id, h)))
    val expect = batchHashes.groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(survivors == expect, s"streaming != batch replay: $survivors vs $expect")
  }
}
