package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer: driver-side merge-table training
 * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
 * with Subword Units") + distributed merge application. Makes the
 * packing/quota family's token budgets real: p05/p04/p07 count
 * whitespace tokens by default; [[tokenCounts]] plugs BPE counts into
 * the same `tokensCol` parameter (see `Packing.packChunks`).
 *
 * Merge semantics (identical in train, apply, and the DuckDB oracle
 * replay): merges apply SEQUENTIALLY in rank order; one merge (x, y)
 * rewrites a word's symbol sequence greedily left-to-right,
 * non-overlapping — equivalently a left fold appending each symbol
 * and collapsing `last == x && next == y` (the fold cannot chain
 * within one merge because x+y is strictly longer than x). Words
 * never merge across their boundary, so tokenization is per-word and
 * memoizable.
 *
 * Scale shape: training is model-sized (a word-frequency table of a
 * bounded id-ordered document sample collects to the driver — the
 * standard practice for tokenizer fitting; the sample aggregate
 * itself is distributed). Application broadcasts the merge ranks
 * (tiny) and runs batched imperative merges in `mapPartitions` —
 * genuinely per-symbol imperative work, the documented last-resort
 * case — with a per-partition vocabulary memo so Zipf-distributed
 * corpora tokenize each distinct word once per task, not once per
 * occurrence.
 */
object Bpe {

  /** Canonical normalization shared with t08/dc02: lowercase, strip
    * non-alphanumerics, collapse space runs, trim. Keeps the symbol
    * alphabet ASCII so char-level splitting agrees across engines. */
  def normText(c: org.apache.spark.sql.Column) = trim(regexp_replace(
    regexp_replace(lower(c), "[^a-z0-9 ]", ""), "  +", " "))

  /** One merge step on a symbol sequence: greedy left-to-right,
    * non-overlapping. */
  private[ops] def mergePair(syms: Array[String], x: String, y: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == x && syms(i + 1) == y) {
        out += (x + y); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Tokenize one word under a merge table; returns the symbol count.
    * Char-level init (the alphabet is ASCII post-normalization). */
  private[ops] def encode(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val (x, y) = merges(m)
      syms = mergePair(syms, x, y)
      m += 1
    }
    syms
  }

  /**
   * Train `numMerges` merges on a word-frequency table (driver-side,
   * model-sized). Each round counts adjacent symbol pairs weighted by
   * word frequency and merges the most frequent pair; ties break to
   * the lexicographically smallest (x, y), so training is fully
   * deterministic in the input table.
   */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var toks: Map[String, Array[String]] =
      wordFreq.keysIterator.map(w => w -> w.map(_.toString).toArray).toMap
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      toks.foreach { case (w, syms) =>
        val f = wordFreq(w)
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestCount = Long.MinValue
        counts.forEach { (p, c) =>
          if (c > bestCount || (c == bestCount &&
              Ordering.Tuple2[String, String].lt(p, best))) {
            best = p; bestCount = c
          }
        }
        merges += best
        toks = toks.map { case (w, syms) =>
          w -> (if (syms.length > 1) mergePair(syms, best._1, best._2) else syms)
        }
        m += 1
      }
    }
    merges.result()
  }

  /**
   * Train on the first `sampleDocs` documents by `idCol` (a total
   * order, reproducible across partitionings). The word-frequency
   * aggregate runs distributed; only the vocabulary-sized frequency
   * table collects.
   */
  def trainOnSample(docs: DataFrame, idCol: String, textCol: String,
      sampleDocs: Int, numMerges: Int): Seq[(String, String)] = {
    val wf = wordFreq(docs.orderBy(col(idCol)).limit(sampleDocs), textCol)
    train(wf, numMerges)
  }

  /** Normalized word-frequency census of `textCol`, collected to the
    * driver — the model-sized training input (the aggregate itself is
    * distributed; only the vocabulary-sized table collects). */
  def wordFreq(rows: DataFrame, textCol: String): Map[String, Long] =
    rows
      .select(explode(split(normText(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /**
   * Per-document BPE token counts: (idCol, n_words, n_tokens), one
   * row per input document (0/0 for documents that normalize to
   * nothing). The merge table broadcasts; tokenization memoizes per
   * distinct word within each partition.
   */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs
      .select(col(idCol).cast("long"), split(normText(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ms = bc.value
        // memo bound: ~1M distinct words ≈ tens of MB; a pathological
        // vocabulary (random strings) resets the cache rather than OOM
        val memo = new java.util.HashMap[String, Int]()
        it.map { case (id, ws0) =>
          val ws = ws0.filter(_.nonEmpty)
          var nTok = 0L
          ws.foreach { w =>
            if (memo.size >= (1 << 20)) memo.clear()
            nTok += memo.computeIfAbsent(w, k => encode(k, ms).length)
          }
          (id, ws.size.toLong, nTok)
        }
      }
      .toDF(idCol, "n_words", "n_tokens")
  }
}
