package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BYTE-LEVEL byte-pair encoding — the fourth production tokenizer
 * family (Radford et al. 2019's GPT-2 tokenizer; RoBERTa and the
 * LLaMA line inherit it): [[Bpe]]'s merge trainer and heap encoder on
 * a 256-symbol BYTE alphabet instead of the normalized char alphabet.
 * Two properties define the family and both hold here by
 * construction:
 *
 *  - LOSSLESS: no normalization ever runs. Words are the raw text
 *    split on single spaces; a word's initial symbols are its UTF-8
 *    bytes, so '#', digits, case, and arbitrary unicode all survive
 *    (GPT-2's actual motivation — char-level BPE needs an [UNK] or a
 *    normalizer; byte-level needs neither).
 *  - NO [UNK]: every byte is in the base vocabulary, so every string
 *    tokenizes; concatenating the output symbols always reproduces
 *    the input bytes exactly (spec-pinned round-trip).
 *
 * Engine-parity representation: each byte is carried as its 2-char
 * UPPERCASE hex string ("%02X" — DuckDB's `hex()` casing), so merge
 * outputs are plain hex strings, the pinned merge table stays
 * printable, and the oracle replays the apply with the SAME
 * recursive-CTE fold as t20/t35, just seeded with hex-PAIR initial
 * splits instead of per-char splits. A space still cannot occur
 * inside a symbol, so [[Bpe.rankMap]]'s key scheme carries over
 * unchanged.
 *
 * Scale shape: identical to [[Bpe]] — training collects one bounded
 * word-frequency census (the distributed aggregate is the only
 * corpus-sized work), application broadcasts the merge ranks and
 * runs the per-partition-memoized heap encoder in `mapPartitions`;
 * O(len log len) per distinct word, independent of merge-table size.
 */
object ByteBpe {

  /** A word's initial byte symbols: one 2-char uppercase hex token
    * per UTF-8 byte. */
  private[ops] def hexSyms(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = f"${bytes(i) & 0xff}%02X"
      i += 1
    }
    out
  }

  /** Raw (UN-normalized) word-frequency census of `textCol`: split on
    * single spaces exactly like the oracle's `string_split(text, ' ')`,
    * empties dropped, NOTHING else touched — byte-level's lossless
    * contract starts here. Distributed aggregate; only the
    * vocabulary-sized table collects. */
  def wordFreq(rows: DataFrame, textCol: String): Map[String, Long] =
    rows
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Train `numMerges` byte-level merges — [[Bpe.trainSyms]] seeded
    * with hex-pair symbol arrays. Deterministic in the input table
    * (ties break to the lexicographically smallest hex pair). */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] =
    Bpe.trainSyms(
      wordFreq.keysIterator.map(w => w -> hexSyms(w)).toMap,
      wordFreq, numMerges)

  /** Per-document byte-level BPE accounting: (idCol, n_words,
    * n_bytes, n_tokens), one row per input document (0/0/0 when the
    * text splits to nothing). Merge ranks broadcast; the heap encoder
    * runs whenever the table is well-formed over the BYTE base
    * alphabet (every trained table is), with [[Bpe]]'s per-partition
    * distinct-word memo. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs
      .select(col(idCol).cast("long"), split(col(textCol), " ").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ms = bc.value
        val fast = Bpe.wellFormedSyms(ms, _.length == 2)
        val ranks = if (fast) Bpe.rankMap(ms) else null
        val memo = new java.util.HashMap[String, (Long, Long)]()
        it.map { case (id, ws0) =>
          val ws = ws0.filter(_.nonEmpty)
          var nBytes = 0L
          var nTok = 0L
          ws.foreach { w =>
            if (memo.size >= (1 << 20)) memo.clear()
            val (b, t) = memo.computeIfAbsent(w, { k =>
              val syms = hexSyms(k)
              val nb = syms.length.toLong
              val nt = (if (fast) Bpe.encodeFastSyms(syms, ranks)
                else Bpe.encodeSyms(syms, ms)).length.toLong
              (nb, nt)
            })
            nBytes += b
            nTok += t
          }
          (id, ws.size.toLong, nBytes, nTok)
        }
      }
      .toDF(idCol, "n_words", "n_bytes", "n_tokens")
  }
}
