package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WordPiece subword tokenizer (Schuster & Nakajima 2012; the
 * BERT/DistilBERT tokenizer) — the THIRD production subword family
 * next to BPE ([[Bpe]], t20/t35) and unigram-LM ([[Unigram]],
 * t37/t40), completing the triad every modern LLM data pipeline
 * draws from.
 *
 * Training is BPE-shaped — iterative pair merging over a word-
 * frequency census — but ranked by the WordPiece LIKELIHOOD score
 * `count(xy) / (count(x)·count(y))` (the pair whose merge most
 * increases a unigram LM's corpus likelihood) instead of raw pair
 * count. Continuation pieces carry the `##` prefix ('#' cannot
 * survive [[Bpe.normText]], so the sentinel is unambiguous).
 *
 * Application is greedy LONGEST-MATCH-FIRST over the frozen
 * vocabulary (HF tokenizers' WordpieceTokenizer semantics): at each
 * position take the longest vocabulary piece (`##`-prefixed after
 * position 0); a word with any unmatchable position maps whole to
 * [UNK]. Fully deterministic — no DP, no floats — so the DuckDB
 * oracle replays it exactly as an unrolled greedy walk (one level
 * per consumed piece; each level advances every unfinished word by
 * its unique longest arc).
 *
 * Engine-exactness contract: training compares likelihood scores as
 * exact integer CROSS-PRODUCTS (`cxy1·cx2·cy2 > cxy2·cx1·cy1` on
 * Long — no float ever enters ranking; the census bound keeping the
 * triple product under 2^63 is asserted), ties break to the
 * lexicographically smallest pair, so the trained vocabulary is a
 * pure function of the census. The apply emits only integers.
 *
 * Scale shape: training is model-sized (the bounded-sample census
 * collects — standard tokenizer practice; the census aggregate is
 * distributed). Application broadcasts the vocabulary set (tiny) and
 * runs the per-word greedy scan in `mapPartitions` with a
 * per-partition word memo — O(len × maxPieceLen) worst case per
 * DISTINCT word, independent of vocabulary size.
 */
object WordPiece {

  /** Continuation sentinel. Post-normalization text is [a-z0-9 ] so
    * '#' can never open a real piece. */
  val Cont = "##"

  /** Census bound for exact Long score ranking: every symbol/pair
    * count is ≤ total weighted chars, and the ranking triple product
    * must stay under 2^63 — 2·10^6 chars gives 8·10^18 < 9.22·10^18. */
  val MaxCensusChars = 2000000L

  private def initSyms(w: String): Array[String] =
    Array.tabulate(w.length)(i =>
      if (i == 0) w.substring(0, 1) else Cont + w.charAt(i))

  /** One merge step on a `##`-marked symbol sequence: greedy
    * left-to-right, non-overlapping; the merged symbol keeps x's
    * word-position marking and strips y's continuation prefix. */
  private[ops] def mergePair(syms: Array[String], x: String, y: String): Array[String] = {
    val xy = x + y.substring(Cont.length)
    val out = Array.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == x && syms(i + 1) == y) {
        out += xy; i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /**
   * Train a WordPiece vocabulary on a word-frequency census
   * (driver-side, model-sized): seed with the observed alphabet
   * (word-initial chars + `##`-continuation chars), then `numMerges`
   * rounds each merging the adjacent pair with the highest likelihood
   * score `count(xy)/(count(x)·count(y))`, ranked by exact integer
   * cross-products with lexicographic tie-break. Returns the frozen
   * vocabulary (alphabet + every merge output), sorted.
   */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[String] = {
    require(wordFreq.map { case (w, c) => c * w.length }.sum <= MaxCensusChars,
      s"wordpiece train: census exceeds $MaxCensusChars weighted chars — " +
        "integer score ranking would overflow")
    val words = wordFreq.toSeq.sortBy(_._1).filter(_._1.nonEmpty)
    var toks: Seq[(Array[String], Long)] =
      words.map { case (w, c) => (initSyms(w), c) }
    val vocab = scala.collection.mutable.SortedSet.empty[String]
    toks.foreach(_._1.foreach(vocab += _))
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val symCnt = new java.util.HashMap[String, Long]()
      val pairCnt = new java.util.HashMap[(String, String), Long]()
      toks.foreach { case (syms, f) =>
        var i = 0
        val n = syms.length
        while (i < n) {
          symCnt.merge(syms(i), f, _ + _)
          if (i + 1 < n) pairCnt.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (pairCnt.isEmpty) done = true
      else {
        // argmax of cxy/(cx·cy) via exact cross-products: the strict
        // comparison + total tie-break make HashMap iteration order
        // immaterial (the Bpe.train selection discipline)
        var best: (String, String) = null
        var bXY = 0L; var bX = 0L; var bY = 0L
        pairCnt.forEach { (p, cxy) =>
          val cx = symCnt.get(p._1)
          val cy = symCnt.get(p._2)
          val better =
            if (best == null) true
            else {
              val l = cxy * bX * bY
              val r = bXY * cx * cy
              l > r || (l == r && Ordering.Tuple2[String, String].lt(p, best))
            }
          if (better) { best = p; bXY = cxy; bX = cx; bY = cy }
        }
        vocab += best._1 + best._2.substring(Cont.length)
        toks = toks.map { case (syms, f) =>
          (if (syms.length > 1) mergePair(syms, best._1, best._2) else syms, f)
        }
        m += 1
      }
    }
    vocab.toSeq
  }

  /** Greedy longest-match-first piece count of one word under a
    * frozen vocabulary: returns (n_pieces, is_unk). A word with any
    * unmatchable position maps WHOLE to [UNK] = (1, 1) — the HF
    * WordpieceTokenizer rule. */
  private[ops] def greedyCount(w: String,
      vocab: java.util.HashSet[String], maxPieceLen: Int): (Long, Long) = {
    val n = w.length
    var j = 0
    var np = 0L
    while (j < n) {
      var l = math.min(maxPieceLen, n - j)
      var hit = 0
      while (l >= 1 && hit == 0) {
        val cand =
          if (j == 0) w.substring(0, l) else Cont + w.substring(j, j + l)
        if (vocab.contains(cand)) hit = l else l -= 1
      }
      if (hit == 0) return (1L, 1L)
      np += 1L
      j += hit
    }
    (np, 0L)
  }

  /**
   * Per-document WordPiece accounting: (idCol, n_words, n_chars,
   * n_pieces, n_unk), one row per input document (0s for documents
   * that normalize to nothing). Vocabulary broadcasts; the greedy
   * scan memoizes per distinct word within each partition. Shares
   * [[Bpe.normText]] so all three tokenizer families see the
   * identical word stream.
   */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxPieceLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toArray)
    docs
      .select(col(idCol).cast("long"), split(Bpe.normText(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val vs = new java.util.HashSet[String]()
        bc.value.foreach(vs.add)
        val memo = new java.util.HashMap[String, (Long, Long)]()
        it.map { case (id, ws0) =>
          val ws = ws0.filter(_.nonEmpty)
          var nPieces = 0L
          var nChars = 0L
          var nUnk = 0L
          ws.foreach { w =>
            if (memo.size >= (1 << 20)) memo.clear()
            val (np, unk) = memo.computeIfAbsent(w,
              k => greedyCount(k, vs, maxPieceLen))
            nPieces += np
            nUnk += unk
            nChars += w.length
          }
          (id, ws.size.toLong, nChars, nPieces, nUnk)
        }
      }
      .toDF(idCol, "n_words", "n_chars", "n_pieces", "n_unk")
  }
}
