package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

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

  test("streaming prep pipeline matches the batch gate+dedup+split accounting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = prepPipeline(input.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("prep").outputMode("update").start()
    try {
      def doc(id: Long, m: Int, words: Int): Doc =
        Doc(id, ts(m), Seq.fill(words)(s"w$id").mkString(" ")) // unique text per id
      input.addData(doc(1, 0, 25), doc(2, 1, 30), Doc(3, ts(2), "too short"))
      query.processAllAvailable()
      input.addData(Doc(4, ts(5), Seq.fill(25)("w1").mkString(" ")), // dup of doc 1's text
        doc(5, 6, 40))
      query.processAllAvailable()

      // batch reference over the union of all arrivals
      val all = Seq(doc(1, 0, 25), doc(2, 1, 30), Doc(3, ts(2), "too short"),
        Doc(4, ts(5), Seq.fill(25)("w1").mkString(" ")), doc(5, 6, 40)).toDF()
      val expected = CorpusStream.withSplit(
          CorpusStream.qualityGate(all)
            .groupBy("text").agg(min("doc_id").as("doc_id"))
            .select(col("doc_id"), col("text")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

      // last update per split is the running total
      val got = spark.table("prep")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
      assert(got == expected, s"got $got expected $expected")
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

  test("contamination gate drops exactly the batch-contaminated docs, " +
      "passes short docs, and holds zero streaming state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "clean words only here nothing shared"),   // clean
      (2L, "xx alpha beta gamma delta yy"),           // shares the 4-gram
      (3L, "beta gamma delta zz"),                    // 4 words, no shared 4-gram
      (4L, "shr t"),                                  // < 4 words: passes
      (5L, "delta epsilon alpha beta"))               // 4-gram, not in bench
    // batch truth: decontaminate flags the dirty side
    val dirty = graft.ops.TextAnalysis.decontaminate(
        corpus.toDF("doc_id", "text"), bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(dirty == Set(2L), s"fixture sanity: $dirty")

    val benchSet = benchmarkNGramSet(bench, "text", n = 4)
    val input = MemoryStream[(Long, String)]
    val q = contaminationGate(input.toDS().toDF("doc_id", "text"),
        "text", benchSet, n = 4)
      .writeStream.format("memory").queryName("contam_gate")
      .outputMode("append").start()
    try {
      corpus.grouped(2).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val state = q.lastProgress.stateOperators
      assert(state == null || state.isEmpty,
        s"streaming state leaked: ${state.mkString(",")}")
    } finally q.stop()
    val kept = spark.table("contam_gate").collect().map(_.getLong(0)).toSet
    assert(kept == corpus.map(_._1).toSet -- dirty, s"kept $kept")
  }

  test("streaming contamination scores equal the batch contaminationScore " +
      "rows (occurrence counting) with zero streaming state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta zz"), // 2 hits of 6
      (2L, "clean words only here nothing shared at all"),
      (3L, "shr t"),                                            // < 4 words: absent
      (4L, "beta gamma delta epsilon tail"))                    // 1 hit of 2
    val batch = graft.ops.TextAnalysis.contaminationScore(
        corpus.toDF("doc_id", "text"), bench, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.exists(r => r._1 == 1L && r._3 == 2L), s"fixture sanity: $batch")

    val benchGrams = benchmarkNGramSet(bench, "text", n = 4)
      .collect()(0).getSeq[String](0)
    val input = MemoryStream[(Long, String)]
    val q = contaminationScoreStream(input.toDS().toDF("doc_id", "text"),
        "doc_id", "text", benchGrams, n = 4)
      .writeStream.format("memory").queryName("contam_score")
      .outputMode("append").start()
    try {
      corpus.grouped(2).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val state = q.lastProgress.stateOperators
      assert(state == null || state.isEmpty,
        s"streaming state leaked: ${state.mkString(",")}")
    } finally q.stop()
    val streamed = spark.table("contam_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"missing=${batch -- streamed} extra=${streamed -- batch}")
    assert(!streamed.exists(_._1 == 3L), "short doc must be absent, like batch")
  }

  test("quotaAdmission: per-source counter survives the micro-batch " +
      "boundary and never over-admits; unknown sources get the default") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SourcedDoc]
    val q = quotaAdmission(input.toDS(),
        Map("a" -> 3, "b" -> 1), defaultQuota = 2)
      .writeStream.format("memory").queryName("quota_admitted")
      .outputMode("append").start()
    try {
      // batch 1: a gets 2 of its 3, b exhausts, unknown c gets 1 of 2
      input.addData(
        SourcedDoc(1, "a"), SourcedDoc(2, "a"),
        SourcedDoc(3, "b"), SourcedDoc(4, "b"),
        SourcedDoc(5, "c"))
      q.processAllAvailable()
      // batch 2: a's counter must resume at 2 (admit exactly one more),
      // b stays closed, c admits its second and then closes
      input.addData(
        SourcedDoc(6, "a"), SourcedDoc(7, "a"),
        SourcedDoc(8, "b"),
        SourcedDoc(9, "c"), SourcedDoc(10, "c"))
      q.processAllAvailable()
      val got = spark.table("quota_admitted").as[AdmittedDoc]
        .collect().map(d => (d.doc_id, d.source)).toSet
      assert(got == Set((1L, "a"), (2L, "a"), (3L, "b"), (5L, "c"),
        (6L, "a"), (9L, "c")),
        s"got $got")
    } finally q.stop()
  }

  test("gopher gate stream flags equal the batch scalar battery bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one doc per rule failure + one passing all four scalar rules
    val pass = (("the quick brown fox jumps over a lazy dog and " * 6) +
      "it is of great note in all the annals").trim
    val docs = Seq(
      1L -> pass,
      2L -> "too short for the gate",                     // wc fails
      3L -> ("a b c d e f g h i j " * 6).trim,            // mwl low + no stops
      4L -> (("12345 67890 " * 30).trim + " the a of"),   // alpha fails
      5L -> ("zq wx vk pl mn bc df gh jk lm " * 6).trim)  // stop fails
    val batch = docs.toDF("doc_id", "text")
      .select(col("doc_id") +: graft.ops.TextAnalysis
        .gopherScalarFlags(col("text")).map { case (n, c) => c.as(n) }: _*)
      .withColumn("scalar_pass",
        (col("wc_ok") * col("mwl_ok") * col("alpha_ok") * col("stop_ok"))
          .cast("int"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(batch(1L) == ((1, 1, 1, 1, 1)), s"doc 1 should pass: ${batch(1L)}")
    assert(batch(2L)._1 == 0 && batch(4L)._3 == 0 && batch(5L)._4 == 0,
      s"planted failures must fire: $batch")
    val input = MemoryStream[(Long, String)]
    val q = gopherGateStream(input.toDS().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("gopher_gate")
      .outputMode("append").start()
    try {
      docs.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("gopher_gate").collect().map(r =>
        r.getLong(0) ->
          (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("boilerplate gate stream: native chunk probe equals the batch " +
      "census grain, banner hits counted, clean docs zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val banner = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10" // exactly one chunk wide
    val docs = Seq(
      1L -> s"$banner alpha beta gamma delta",
      2L -> s"$banner epsilon zeta",
      3L -> s"$banner eta theta iota kappa lam mu nu xi omicron pi",
      4L -> "clean doc with no shared chunk at all",
      5L -> "double  space and trailing tail words only here")
      .toDF("doc_id", "text")
    val banned = graft.ops.Dedup.boilerplateBannedFreeze(
      docs, "doc_id", "text", w = 10, minOcc = 3)
    assert(banned.length == 1, s"only the banner chunk repeats 3x: ${banned.length}")
    val input = MemoryStream[(Long, String)]
    val q = boilerplateGateStream(input.toDS().toDF("doc_id", "text"),
        "doc_id", "text", banned)
      .writeStream.format("memory").queryName("bp_gate")
      .outputMode("append").start()
    try {
      docs.collect().map(r => (r.getLong(0), r.getString(1)))
        .grouped(2).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("bp_gate").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // chunk counts at the batch grain: ceil(nTok / 10), empties kept
      assert(got(1L) == ((2L, 1L)), got(1L).toString)
      assert(got(2L) == ((2L, 1L)))
      assert(got(3L) == ((2L, 1L)))
      assert(got(4L) == ((1L, 0L)))
      assert(got(5L) == ((1L, 0L)))
      // parity with the batch op itself: banned chunks removed there
      val batch = graft.ops.Dedup.boilerplateChunkRemoval(
          docs, "doc_id", "text", w = 10, minOcc = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(1) - r.getLong(2)))).toMap
      assert(got == batch,
        s"stream (n_chunks, n_banned) $got != batch (n_chunks, removed) $batch")
    } finally q.stop()
  }
}
