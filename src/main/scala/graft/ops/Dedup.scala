package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for document corpora.
 *
 * Scale posture (100 TB): every near-dup method reduces each document to
 * a fixed-width signature in ONE narrow pass (no UDF, pure expressions),
 * then shuffles only `(bucket_key, doc_id)` pairs — never text — for the
 * candidate join. Candidate verification re-reads only candidate rows.
 */
object Dedup {

  /** Large prime < 2^31 used by the universal hash family. */
  private val P = 2147483647L

  /**
   * MinHash signature of a set column (array<string>), as
   * `numHashes` longs. Universal hashing h_i(x) = (a_i * x32 + b_i) mod P
   * over the low 32 bits of xxhash64 of each element; coefficients are
   * derived deterministically from `seed` via splitmix-style mixing, and
   * inlined as literals (broadcast with the plan, not shuffled).
   */
  def minHashSignature(set: Column, numHashes: Int = 128, seed: Long = 42L): Column = {
    val coeffs = hashCoefficients(numHashes, seed)
    val entries = coeffs.map { case (a, b) =>
      array_min(transform(set,
        e => (lit(a) * xxhash64(e).bitwiseAND(lit(0xffffffffL)) + lit(b)) % lit(P)))
    }
    array(entries: _*)
  }

  /** Deterministic (a, b) pairs for the universal hash family. */
  private def hashCoefficients(n: Int, seed: Long): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = { // splitmix64
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.fill(n)((math.abs(next()) % (P - 1) + 1, math.abs(next()) % P))
  }

  /**
   * LSH banding over a MinHash signature column: one row per band,
   * keyed by (band index, xxhash64 of the band slice).
   */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, idCol: String): DataFrame = {
    val rowsPerBand = 128 / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }
    df.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /**
   * MinHash+LSH candidate pairs (id_a < id_b) from a corpus of
   * (idCol, setCol). The pair shuffle carries only ids.
   */
  def minHashCandidatePairs(docs: DataFrame, idCol: String, setCol: String,
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L): DataFrame = {
    val sigs = docs.select(col(idCol),
      minHashSignature(col(setCol), numHashes, seed).as("sig"))
    val bb = lshBands(sigs, "sig", bands, idCol)
    val left = bb.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val right = bb.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /**
   * 64-bit SimHash of a set column: sign-aggregated bitwise vote of
   * element xxhash64 values. Pure expression: fold a 64-long counter
   * array through `aggregate`, then reassemble the sign bits.
   */
  def simHash(set: Column): Column = {
    val counters = aggregate(
      set,
      array_repeat(lit(0L), 64),
      (acc, e) => {
        val h = xxhash64(e)
        transform(acc, (c, i) =>
          c + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L)))
      })
    aggregate(
      transform(counters,
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /**
   * SimHash near-dup candidate pairs: band the 64-bit hash into four
   * 16-bit chunks; docs sharing any chunk are candidates (catches all
   * pairs within Hamming distance 3 by pigeonhole).
   */
  def simHashCandidatePairs(docs: DataFrame, idCol: String, setCol: String): DataFrame = {
    val sigs = docs.select(col(idCol), simHash(col(setCol)).as("sim"))
    val chunks = sigs.select(col(idCol), col("sim"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("sim"), i * 16).bitwiseAND(lit(0xffffL)).as("bucket"))): _*)).as("bb"))
      .select(col(idCol), col("sim"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val left = chunks.select(col("band"), col("bucket"), col(idCol).as("id_a"), col("sim").as("sim_a"))
    val right = chunks.select(col("band"), col("bucket"), col(idCol).as("id_b"), col("sim").as("sim_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance64(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
  }

  /** Hamming distance between two 64-bit columns (popcount of XOR). */
  def hammingDistance64(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    aggregate(
      transform(sequence(lit(0), lit(63)),
        i => call_function("shiftright", x, i).bitwiseAND(lit(1L))),
      lit(0L), (acc, bit) => acc + bit).cast("int")
  }

  /** Exact Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }
}
