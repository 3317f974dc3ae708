package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
 * the SentencePiece unigram model): the OTHER major production
 * tokenizer family next to BPE ([[Bpe]]). Training is EM over the
 * segmentation lattice (each word's probability marginalizes every
 * way to split it into vocabulary pieces) with loss-ranked pruning
 * down to the target vocabulary; application is per-word VITERBI
 * under the frozen piece log-probabilities.
 *
 * Engine-exactness contract (the LM-family discipline, t29/t33/t34):
 * the frozen model carries integer MICRO-NAT log-probs, and the
 * Viterbi DP maximizes one packed long — `score_micro * 64 − n_pieces`
 * (valid mixed radix while words stay ≤ 63 chars, enforced) — so the
 * apply is pure integer arithmetic, bit-replayable by the DuckDB
 * oracle from the same pinned table, with ties broken toward FEWER
 * pieces by construction. Training floats go through StrictMath only,
 * so the pinned table regenerates bit-identically on any JVM.
 *
 * Scale shape: training is model-sized (a bounded id-ordered sample's
 * word-frequency table collects — standard tokenizer practice; the
 * census itself is distributed). Application broadcasts the piece map
 * (tiny) and runs the per-word DP in `mapPartitions` with a
 * per-partition word memo — Zipf corpora tokenize each distinct word
 * once per task, and the DP is O(len × maxPieceLen) per word,
 * independent of vocabulary size.
 */
object Unigram {

  /** Packed-DP word-length bound: n_pieces must stay < 64 for the
    * mixed-radix packing to order lexicographically. */
  val MaxWordLen = 63

  /** Log-prob of a single character absent from the vocabulary
    * (SentencePiece's <unk> role), in micro-nats. */
  val UnkLpMicro: Long = -20000000L

  /**
   * Train a unigram piece table on a word-frequency census
   * (driver-side, model-sized). Seeds with the `seedSize` most
   * frequent substrings (count-weighted; all single characters always
   * kept), runs `emIters` EM sweeps, then alternates loss-ranked
   * pruning (drop the `pruneFrac` multi-char pieces whose removal
   * costs the Viterbi likelihood least) with one EM sweep until at
   * most `vocabSize` multi-char pieces remain. Returns the FROZEN
   * table: (piece, log-prob in micro-nats), sorted by piece.
   *
   * Fully deterministic: words and pieces iterate in lexicographic
   * order, accumulation is sequential, and all transcendentals are
   * StrictMath.
   */
  def train(wordFreq: Map[String, Long], vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 1024,
      emIters: Int = 2, pruneFrac: Double = 0.2): Seq[(String, Long)] = {
    val words = wordFreq.toSeq.sortBy(_._1).filter(_._1.nonEmpty)
    words.foreach { case (w, _) =>
      require(w.length <= MaxWordLen,
        s"unigram train: word '${w.take(32)}…' exceeds $MaxWordLen chars")
    }
    // seed census: every substring up to maxPieceLen, count-weighted
    val sub = new java.util.TreeMap[String, Long]()
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          sub.merge(w.substring(i, i + l), c, _ + _)
          l += 1
        }
        i += 1
      }
    }
    val chars = {
      val b = scala.collection.mutable.SortedSet.empty[String]
      words.foreach(_._1.foreach(ch => b += ch.toString))
      b.toSeq
    }
    val multiSeed = {
      import scala.jdk.CollectionConverters._
      sub.entrySet().asScala.toSeq
        .filter(e => e.getKey.length > 1)
        .sortBy(e => (-e.getValue, e.getKey))
        .take(seedSize).map(_.getKey)
    }
    // probabilities start proportional to substring frequency
    var pieces: Map[String, Double] = {
      val all = (chars ++ multiSeed).distinct
      val tot = all.map(p => sub.get(p).toDouble).sum
      all.map(p => p -> sub.get(p) / tot).toMap
    }

    def arcs(w: String, vocab: Map[String, Double]): IndexedSeq[(Int, Int, String)] =
      for {
        j <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - j)
        s = w.substring(j, j + l)
        if vocab.contains(s)
      } yield (j, j + l, s)

    def logSumExp(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + StrictMath.log(StrictMath.exp(a - m) + StrictMath.exp(b - m)) }

    /** One EM sweep: expected piece counts via forward–backward in
      * log space, then re-normalize. Single chars get a small count
      * floor so the alphabet never leaves the vocabulary. */
    def emStep(vocab: Map[String, Double]): Map[String, Double] = {
      val lp = vocab.map { case (s, p) => s -> StrictMath.log(p) }
      val exp = new java.util.TreeMap[String, Double]()
      words.foreach { case (w, cnt) =>
        val as = arcs(w, vocab)
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(n) = 0.0
        as.foreach { case (j, i, s) => // arcs are (j asc, i asc): forward-safe
          alpha(i) = logSumExp(alpha(i), alpha(j) + lp(s))
        }
        as.reverseIterator.foreach { case (j, i, s) =>
          beta(j) = logSumExp(beta(j), lp(s) + beta(i))
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          as.foreach { case (j, i, s) =>
            val e = StrictMath.exp(alpha(j) + lp(s) + beta(i) - z) * cnt
            exp.merge(s, e, _ + _)
          }
        }
      }
      chars.foreach(c => exp.merge(c, 0.5, _ + _)) // alphabet floor
      import scala.jdk.CollectionConverters._
      // a piece whose expectation underflows to zero (or that no word
      // reaches any more) leaves the vocabulary here — freezing a
      // zero-probability piece would emit −∞
      val entries = exp.entrySet().asScala.toSeq
        .filter(e => vocab.contains(e.getKey) && e.getValue > 0.0)
      val tot = entries.map(_.getValue).sum
      entries.map(e => e.getKey -> e.getValue / tot).toMap
    }

    /** Viterbi best log-prob of `w` under a PRE-BUILT log-prob map
      * (None if no path — only possible when a banned piece breaks
      * coverage). Takes the log map, not the vocab: the prune loop
      * calls this O(pieces × words) times per round, so the log-map
      * construction hoists to once per round (bit-identical — the
      * same StrictMath.log values, computed once). */
    def viterbi(w: String, lp: Map[String, Double], banned: String): Option[Double] = {
      val n = w.length
      val dp = Array.fill(n + 1)(Double.NegativeInfinity)
      dp(0) = 0.0
      var i = 1
      while (i <= n) {
        var l = 1
        while (l <= math.min(maxPieceLen, i)) {
          val s = w.substring(i - l, i)
          if (s != banned && lp.contains(s) && dp(i - l) != Double.NegativeInfinity) {
            val v = dp(i - l) + lp(s)
            if (v > dp(i)) dp(i) = v
          }
          l += 1
        }
        i += 1
      }
      if (dp(n) == Double.NegativeInfinity) None else Some(dp(n))
    }

    var iter = 0
    while (iter < emIters) { pieces = emStep(pieces); iter += 1 }
    // prune multi-char pieces by removal loss until the target size
    while (pieces.count(_._1.length > 1) > vocabSize) {
      val plp = pieces.map { case (s, p) => s -> StrictMath.log(p) }
      val best = words.map { case (w, c) => (w, c, viterbi(w, plp, "").get) }
      // loss of piece s = count-weighted Viterbi drop when s is banned;
      // only pieces on some best path can have loss > 0, but recompute
      // per piece for exactness (vocab is model-sized)
      val multis = pieces.keysIterator.filter(_.length > 1).toSeq.sorted
      val loss = multis.map { s =>
        val l = best.map { case (w, c, b) =>
          if (!w.contains(s)) 0.0
          else c * (b - viterbi(w, plp, s).getOrElse(Double.NegativeInfinity))
        }.sum
        s -> l
      }
      val nDrop = math.max(1, math.min(
        (multis.size * pruneFrac).toInt, multis.size - vocabSize))
      val drop = loss.sortBy { case (s, l) => (l, s) }.take(nDrop).map(_._1).toSet
      val kept = pieces.filter { case (s, _) => !drop.contains(s) }
      val tot = kept.values.sum
      pieces = kept.map { case (s, p) => s -> p / tot }
      pieces = emStep(pieces)
    }
    pieces.toSeq.sortBy(_._1).map { case (s, p) =>
      s -> math.floor(StrictMath.log(p) * 1e6 + 0.5).toLong
    }
  }

  /** Viterbi-segment one word under frozen micro-nat piece scores:
    * returns the PACKED optimum `score_micro * 64 − n_pieces` — the
    * single long both the Spark apply and the DuckDB oracle maximize
    * (max score, then fewest pieces; unknown single chars score
    * [[UnkLpMicro]]). */
  private[ops] def viterbiPacked(w: String,
      lp: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int): Long = {
    val n = w.length
    require(n <= MaxWordLen,
      s"unigram apply: word '${w.take(32)}…' exceeds $MaxWordLen chars")
    val dp = new Array[Long](n + 1)
    val reach = new Array[Boolean](n + 1)
    dp(0) = 0L; reach(0) = true
    var i = 1
    while (i <= n) {
      var bestV = Long.MinValue
      var found = false
      var l = 1
      val lmax = math.min(maxPieceLen, i)
      while (l <= lmax) {
        if (reach(i - l)) {
          val s = w.substring(i - l, i)
          val e = lp.get(s)
          val arc: java.lang.Long =
            if (e != null) e else if (l == 1) UnkLpMicro else null
          if (arc != null) {
            val v = dp(i - l) + 64L * arc.longValue() - 1L
            if (v > bestV) { bestV = v; found = true }
          }
        }
        l += 1
      }
      dp(i) = bestV; reach(i) = found
      i += 1
    }
    dp(n)
  }

  /** N-BEST packed path values of `w` (Kudo 2018 §3.2's n-best list):
    * the list-Viterbi DP — each position keeps its top-`nBest` packed
    * values WITH MULTIPLICITY (two distinct paths with equal value
    * both count; a top-n path's prefix is provably within the top n
    * at every intermediate position, so level-wise truncation is
    * exact). Returned descending; same packing and unknown-char
    * fallback as [[viterbiPacked]], so slot 0 IS the Viterbi optimum. */
  private[ops] def nbestPacked(w: String,
      lp: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int,
      nBest: Int): Array[Long] = {
    val n = w.length
    require(n <= MaxWordLen,
      s"unigram nbest: word '${w.take(32)}…' exceeds $MaxWordLen chars")
    val dp = new Array[Array[Long]](n + 1)
    dp(0) = Array(0L)
    var i = 1
    while (i <= n) {
      val cand = scala.collection.mutable.ArrayBuffer.empty[Long]
      var l = 1
      val lmax = math.min(maxPieceLen, i)
      while (l <= lmax) {
        val prev = dp(i - l)
        if (prev.nonEmpty) {
          val s = w.substring(i - l, i)
          val e = lp.get(s)
          val arc: java.lang.Long =
            if (e != null) e else if (l == 1) UnkLpMicro else null
          if (arc != null) {
            val add = 64L * arc.longValue() - 1L
            prev.foreach(v => cand += v + add)
          }
        }
        l += 1
      }
      dp(i) = cand.toArray.sortBy(v => -v).take(nBest)
      i += 1
    }
    dp(n)
  }

  /** Plain-JVM twin of the `graft_polyhash` byte fold (`h·131 + code
    * mod 2^55−55`) for driver/executor scalar use — identical to the
    * native expression and the oracle's `ascii()` fold on the ASCII
    * post-normalization alphabet. */
  private[ops] def polyHash55(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 131L + s.charAt(i).toLong) % 36028797018963913L
      i += 1
    }
    h
  }

  /** Subword-regularization SAMPLE of one word (Kudo 2018 §3.2:
    * draw from the n-best segmentations with probability ∝ P^α,
    * α = 1/2): weights quantize to integer micro via one exp per slot
    * on the micro-nat score DELTA (slot 0's weight is exactly 10^6 by
    * construction — no underflow however improbable the word), and
    * the draw is DETERMINISTIC — the word's 55-bit polyhash post-
    * mixed through one splitmix universal hash (the x13 hash-min
    * precedent: partition-invariant, repeatable, oracle-replayable),
    * reduced mod the weight total and walked down the cumulative
    * weights. Returns (n_pieces, score_micro, diverse) of the chosen
    * slot, diverse = 1 when the choice differs from the Viterbi
    * optimum IN VALUE (equal-value slots emit identical stats, so
    * tie order is immaterial). */
  private[ops] def samplePacked(w: String,
      lp: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int,
      nBest: Int, ua: Long, ub: Long): (Long, Long, Long) = {
    val best = nbestPacked(w, lp, maxPieceLen, nBest)
    val s1 = -((-best(0)) / 64L)
    val wts = best.map { v =>
      val s = -((-v) / 64L)
      math.floor(StrictMath.exp((s - s1) / 2000000.0) * 1e6 + 0.5).toLong
    }
    val tot = wts.sum
    val hv = (ua * (polyHash55(w) % 4294967296L) + ub) % 2147483647L
    val r = hv % tot
    var cum = 0L
    var idx = 0
    while (cum + wts(idx) <= r) { cum += wts(idx); idx += 1 }
    val v = best(idx)
    ((-v) % 64L, -((-v) / 64L), if (v != best(0)) 1L else 0L)
  }

  /**
   * Per-document SAMPLED piece accounting — [[pieceCounts]] under
   * subword-regularization sampling instead of Viterbi: (idCol,
   * n_words, n_chars, n_pieces, lp_micro, n_diverse), where n_pieces /
   * lp_micro aggregate the SAMPLED segmentation per word and n_diverse
   * counts words whose sample differs from the Viterbi optimum. The
   * draw is per distinct word (deterministic hash), so the memo stays
   * sound and replicas of a word segment identically — exactly what a
   * reproducible training-data pipeline wants from "sampling".
   */
  def pieceCountsSampled(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[(String, Long)], maxPieceLen: Int = 8, nBest: Int = 4,
      seed: Long = 91L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (ua, ub) = graft.ops.Dedup.hashCoefficients(1, seed).head
    val bc = spark.sparkContext.broadcast(pieces.toArray)
    docs
      .select(col(idCol).cast("long"), split(Bpe.normText(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val lp = new java.util.HashMap[String, java.lang.Long]()
        bc.value.foreach { case (s, v) => lp.put(s, v) }
        val memo = new java.util.HashMap[String, (Long, Long, Long)]()
        it.map { case (id, ws0) =>
          val ws = ws0.filter(_.nonEmpty)
          var nPieces = 0L
          var lpSum = 0L
          var nChars = 0L
          var nDiverse = 0L
          ws.foreach { w =>
            if (memo.size >= (1 << 20)) memo.clear()
            val (np, sc, dv) = memo.computeIfAbsent(w,
              k => samplePacked(k, lp, maxPieceLen, nBest, ua, ub))
            nPieces += np
            lpSum += sc
            nChars += w.length
            nDiverse += dv
          }
          (id, ws.size.toLong, nChars, nPieces, lpSum, nDiverse)
        }
      }
      .toDF(idCol, "n_words", "n_chars", "n_pieces", "lp_micro", "n_diverse")
  }

  /**
   * Per-document unigram piece accounting: (idCol, n_words, n_chars,
   * n_pieces, lp_micro), one row per input document (0s for documents
   * that normalize to nothing). Pieces broadcast; the per-word DP
   * memoizes per distinct word within each partition. Shares
   * [[Bpe.normText]] so BPE and unigram gates tokenize the identical
   * word stream.
   */
  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[(String, Long)], maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieces.toArray)
    docs
      .select(col(idCol).cast("long"), split(Bpe.normText(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val lp = new java.util.HashMap[String, java.lang.Long]()
        bc.value.foreach { case (s, v) => lp.put(s, v) }
        val memo = new java.util.HashMap[String, Long]()
        it.map { case (id, ws0) =>
          val ws = ws0.filter(_.nonEmpty)
          var nPieces = 0L
          var lpSum = 0L
          var nChars = 0L
          ws.foreach { w =>
            if (memo.size >= (1 << 20)) memo.clear()
            val packed = memo.computeIfAbsent(w,
              k => viterbiPacked(k, lp, maxPieceLen))
            nPieces += (-packed) % 64L
            lpSum -= (-packed) / 64L
            nChars += w.length
          }
          (id, ws.size.toLong, nChars, nPieces, lpSum)
        }
      }
      .toDF(idCol, "n_words", "n_chars", "n_pieces", "lp_micro")
  }
}
