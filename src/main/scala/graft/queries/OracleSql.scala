package graft.queries

/**
 * Building blocks for DuckDB oracle SQL that must reproduce graft's
 * expression-level hashing bit-for-bit. Spark's `xxhash64` has no DuckDB
 * twin, so the portable operators hash with graft's own
 * `StringPolyHash` byte fold, which DuckDB replays over `ascii()`
 * codes; fixed-width bucket digests use `md5()` directly, identical in
 * both engines.
 */
object OracleSql {

  /** DuckDB twin of graft's native `StringPolyHash`: fold the string's
    * character codes through `a*131 + c (mod 2^55-55)`. Identical to the
    * Spark byte fold on ASCII text (the synthetic corpus is ASCII). */
  def polyFold(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(length($expr)), j -> " +
      s"CAST(ascii(substr($expr, j + 1, 1)) AS BIGINT))), " +
      s"(a, c) -> (a * 131 + c) % 36028797018963913)"

  /** DuckDB twin of graft's native `md5Hash52`: the first 13 hex chars
    * of md5($expr) folded into a 52-bit BIGINT. */
  def md5Fold52(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(13), j -> CAST(strpos('0123456789abcdef', " +
      s"substr(md5($expr), j + 1, 1)) - 1 AS BIGINT))), (a, c) -> a * 16 + c)"

  /** DuckDB list literal `[[a0,b0],[a1,b1],...]` of the MinHash
    * universal-hash coefficient table (identical splitmix64 stream). */
  def coeffPairsLiteral(n: Int, seed: Long): String =
    graft.ops.Dedup.hashCoefficients(n, seed)
      .map { case (a, b) => s"[$a,$b]" }
      .mkString("[", ",", "]")

  /** DuckDB DOUBLE[] literal of one hyperplane's coefficients. */
  def doubleListLiteral(xs: Seq[Double]): String =
    xs.map(_.toString).mkString("CAST([", ",", "] AS DOUBLE[])")

  /** DuckDB expression reproducing `Similarity.hyperplaneKey(v, dim,
    * planes, seed)` bit-for-bit: the identical seeded coefficients are
    * embedded as literals and each sign bit is the same left-to-right
    * dot product. */
  def hyperplaneBucket(vecExpr: String, dim: Int, planes: Int, seed: Long): String =
    graft.ops.Similarity.hyperplaneCoeffs(dim, planes, seed).zipWithIndex.map { case (cs, p) =>
      s"(CASE WHEN list_sum(list_transform(list_zip($vecExpr, ${doubleListLiteral(cs)}), " +
        s"x -> x[1] * x[2])) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
