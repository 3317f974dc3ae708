package graft.ops

import graft.SparkTestBase

class PackingSpec extends SparkTestBase {

  test("chunk boundaries are capacity-exact within every sub-shard") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 400L).map(i =>
      (if (i % 2 == 0) "web" else "books", i, 1L + rnd.nextInt(300)))
      .toDF("source", "doc_id", "n_tokens")
    val budget = 128
    val buckets = 4
    val out = Packing.packChunks(docs, "source", "doc_id", "n_tokens", budget, buckets)
      .select("source", "bucket", "doc_id", "n_tokens", "off", "first_chunk", "last_chunk")
      .collect()
    assert(out.length == 400)
    // replay each sub-shard's cumsum on the driver: offsets must be
    // contiguous in doc_id order and every boundary a multiple of
    // `budget` (capacity-exact WITHIN the sub-shard — each writer task
    // owns a self-contained stream of full chunks)
    out.groupBy(r => (r.getString(0), r.getInt(1))).foreach { case (_, rows) =>
      var off = 0L
      rows.sortBy(_.getLong(2)).foreach { r =>
        assert(r.getLong(4) == off, s"offset drift at doc ${r.getLong(2)}")
        val n = r.getLong(3)
        assert(r.getLong(5) == off / budget, "first_chunk")
        assert(r.getLong(6) == (off + n - 1) / budget, "last_chunk")
        off += n
      }
    }
    // parallelism: the hash bucket fans 2 sources out to ~sources*buckets
    // independent cumsums — the window key must include the bucket
    val nSub = out.map(r => (r.getString(0), r.getInt(1))).distinct.length
    assert(nSub >= buckets, s"only $nSub sub-shards")
    assert(nSub > 2, "bucketing must beat per-source parallelism")
  }

  test("shardBucketLocal is bit-identical to the shardBucket column") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (0L until 500L) ++ Seq(Long.MaxValue - 1, 123456789012345L)
    val fromCol = ids.toDF("id")
      .select(col("id"), Packing.shardBucket(col("id"), 7).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      assert(Packing.shardBucketLocal(id, 7) == fromCol(id),
        s"bucket drift at id $id")
    }
  }

  test("packingStream drains bit-identical to the batch cumsum across " +
      "a microbatch boundary that leaves a chunk open") {
    import spark.implicits._
    import graft.streaming.CorpusStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val docs = (0L until 300L).map(i => CorpusStream.PackInDoc(
      i, if (i % 2 == 0) "web" else "books", 1L + rnd.nextInt(300)))
    val budget = 128
    val buckets = 3
    val batch = Packing.packChunks(
        docs.toDF("doc_id", "source", "n_tokens"),
        "source", "doc_id", "n_tokens", budget, buckets)
      .select("source", "bucket", "doc_id", "n_tokens",
        "first_chunk", "last_chunk")
      .collect().map(_.toSeq).toSet
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CorpusStream.PackInDoc]
    val q = CorpusStream.packingStream(stream.toDS(), budget, buckets)
      .toDF()
      .writeStream.format("memory").queryName("pack_parity")
      .outputMode("append").start()
    try {
      // three uneven id-ordered batches: offsets mid-chunk at both cuts
      // with near-certainty (random 1..300-token docs vs budget 128),
      // so the carried state — not a per-batch reset — must produce
      // the continuation
      Seq(docs.slice(0, 101), docs.slice(101, 173), docs.slice(173, 300))
        .foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("pack_parity")
      .select("source", "bucket", "doc_id", "n_tokens",
        "first_chunk", "last_chunk")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "stream ≡ batch packing parity")
    // the boundary actually cut chunks open: some sub-shard's first
    // doc of batch 2 or 3 must START mid-chunk (first_chunk ==
    // previous doc's last_chunk in the same sub-shard)
    val byShard = batch.toSeq.map(s => (s(0), s(1), s(2).asInstanceOf[Long],
      s(4).asInstanceOf[Long], s(5).asInstanceOf[Long]))
      .groupBy(t => (t._1, t._2))
    val continued = byShard.values.exists { rows =>
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).exists {
        case Seq(a, b) => b._3 >= 101 && a._3 < 101 && b._4 == a._5
        case _ => false
      }
    }
    assert(continued, "no chunk crossed the first microbatch boundary " +
      "— the test corpus no longer exercises the carried state")
  }
}
