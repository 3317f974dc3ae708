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
}
