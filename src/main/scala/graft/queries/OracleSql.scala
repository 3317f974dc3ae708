package graft.queries

/**
 * Building blocks for DuckDB oracle SQL that must reproduce graft's
 * expression-level hashing bit-for-bit. Spark's `xxhash64` has no DuckDB
 * twin, so every portable operator hashes through md5 instead; DuckDB
 * reconstructs the integer value by folding the same hex digits
 * (validated: fold(md5 prefix) == conv(substring(md5, ...), 16, 10)).
 */
object OracleSql {

  /** BIGINT fold of the first `hexChars` md5 hex digits of `expr` —
    * DuckDB equivalent of Spark `conv(substring(md5(expr), 1, n), 16, 10)`. */
  def md5Fold(expr: String, hexChars: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range($hexChars), j -> " +
      s"CAST(strpos('0123456789abcdef', substr(md5($expr), j + 1, 1)) - 1 AS BIGINT))), " +
      s"(a, d) -> a * 16 + d)"

  /** DuckDB twin of graft's native `StringPolyHash`: fold the string's
    * character codes through `a*131 + c (mod 2^55-55)`. Identical to the
    * Spark byte fold on ASCII text (the synthetic corpus is ASCII). */
  def polyFold(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(length($expr)), j -> " +
      s"CAST(ascii(substr($expr, j + 1, 1)) AS BIGINT))), " +
      s"(a, c) -> (a * 131 + c) % 36028797018963913)"

  /** DuckDB list literal `[[a0,b0],[a1,b1],...]` of the MinHash
    * universal-hash coefficient table (identical splitmix64 stream). */
  def coeffPairsLiteral(n: Int, seed: Long): String =
    graft.ops.Dedup.hashCoefficients(n, seed)
      .map { case (a, b) => s"[$a,$b]" }
      .mkString("[", ",", "]")

  /** DuckDB DOUBLE[] literal of one hyperplane's coefficients. */
  def doubleListLiteral(xs: Seq[Double]): String =
    xs.map(_.toString).mkString("CAST([", ",", "] AS DOUBLE[])")
}
