package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for document corpora.
 *
 * Scale posture (100 TB): every near-dup method reduces each document to
 * a fixed-width signature, then shuffles only `(bucket_key, doc_id)`
 * pairs — never text — for the candidate join. Signatures are computed
 * by hashing each shingle ONCE (explode → codegen'd hash aggregate with
 * wide min/sum columns); higher-order-function lambdas are avoided on
 * the hot path because Spark interprets them per element.
 */
object Dedup {

  /** Large prime < 2^31 used by the universal hash family. */
  private val P = 2147483647L

  /** Deterministic (a, b) pairs for the universal hash family (public
    * so the DuckDB oracle can embed the identical table as literals). */
  def hashCoefficients(n: Int, seed: Long): Seq[(Long, Long)] = {
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
   * Portable 60-bit hash of a string column: the first 15 hex digits of
   * its md5, as a long. Unlike xxhash64 this is reproducible outside
   * Spark (the DuckDB oracle computes the identical value by folding
   * the same hex digits), and 60 bits keeps every downstream modular
   * product `a·h32 + b` far below 2^63 under ANSI arithmetic.
   */
  def portableHash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /**
   * Hashed word n-gram shingles: one row per (id, shingle hash). The
   * token array is built once per document and carried through a
   * positional explode (`element_at` picks the n words per shingle), so
   * shingle assembly is a completely narrow, shuffle-free map — the
   * windowed-`lead` alternative shuffles and sorts every token by id.
   * The per-id array duplication is bounded by doc_length² bytes, fine
   * for KB-scale documents. Documents with fewer than `n` words produce
   * no shingles.
   */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val positions = when(size(col("toks")) >= n,
      sequence(lit(1), size(col("toks")) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), col("toks"), explode(positions).as("pos"))
      .select(col(idCol),
        portableHash60(concat_ws(" ",
          (0 until n).map(k => element_at(col("toks"), col("pos") + k)): _*)).as("h"))
  }

  /**
   * MinHash signatures from element hashes (`idCol`, `h`): one row per
   * id with a `sig` array of `numHashes` longs. h_i(x) = (a_i·x32 + b_i)
   * mod P over the low 32 bits of `h`; the per-id minima come from one
   * codegen'd wide aggregate.
   */
  def minHashSignatures(elementHashes: DataFrame, idCol: String,
      numHashes: Int = 128, seed: Long = 42L): DataFrame = {
    val coeffs = hashCoefficients(numHashes, seed)
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h32") + lit(b)) % lit(P)).as(s"m$i")
    }
    elementHashes
      .select(col(idCol), pmod(col("h"), lit(1L << 32)).as("h32"))
      .groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /**
   * LSH banding over a MinHash signature column: one row per band,
   * keyed by (band index, md5 of the comma-joined band slice). The md5
   * digest (not the raw slice) is the bucket key so the shuffle carries
   * a fixed-width key, and the digest is engine-portable for the oracle.
   */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, idCol: String,
      numHashes: Int = 128): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand).cast("array<string>")))
          .as("bucket"))
    }
    df.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /**
   * MinHash+LSH candidate pairs (id_a < id_b) from a text corpus of
   * (idCol, textCol), shingled as hashed word trigrams. The pair
   * shuffle carries only ids.
   */
  def minHashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L): DataFrame = {
    val sigs = minHashSignatures(shingleHashes(docs, idCol, textCol), idCol, numHashes, seed)
    val bb = lshBands(sigs, "sig", bands, idCol, numHashes)
    val left = bb.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val right = bb.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** SimHash width in bits — matches the 60-bit portable element hash. */
  val SimHashBits = 60

  /**
   * 60-bit SimHash per id from element hashes (`idCol`, `h`): bitwise
   * majority vote, as one codegen'd wide aggregate (60 conditional
   * sums). Multiset semantics: repeated shingles vote repeatedly.
   */
  def simHashSignatures(elementHashes: DataFrame, idCol: String): DataFrame = {
    val votes = (0 until SimHashBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val packed = (0 until SimHashBits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    elementHashes
      .groupBy(idCol)
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("sim"))
  }

  /**
   * SimHash near-dup candidate pairs: band the 60-bit hash into four
   * 15-bit chunks; docs sharing any chunk are candidates (catches all
   * pairs within Hamming distance 3 by pigeonhole).
   */
  def simHashCandidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigs = simHashSignatures(shingleHashes(docs, idCol, textCol), idCol)
    val chunks = sigs.select(col(idCol), col("sim"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("sim"), i * 15).bitwiseAND(lit(0x7fffL)).as("bucket"))): _*)).as("bb"))
      .select(col(idCol), col("sim"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val left = chunks.select(col("band"), col("bucket"), col(idCol).as("id_a"), col("sim").as("sim_a"))
    val right = chunks.select(col("band"), col("bucket"), col(idCol).as("id_b"), col("sim").as("sim_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
  }

  /** Hamming distance between two long columns (popcount of XOR). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }
}
