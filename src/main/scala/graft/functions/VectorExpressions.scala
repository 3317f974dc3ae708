package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnBridge

/**
 * Column-API entry points for graft's native codegen'd vector
 * expressions (defined in org.apache.spark.sql.graftshim — they
 * implement private[sql] interfaces). One tight Java loop per pair,
 * inside whole-stage codegen; no HOF lambdas, no UDFs.
 */
object VectorExpressions {
  import org.apache.spark.sql.graftshim.{ArrayCosine, ArrayDot, ArraySqDist}

  private def bin(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column = bin(ArrayDot.apply)(a, b)
  def cosine(a: Column, b: Column): Column = bin(ArrayCosine.apply)(a, b)
  def sqDist(a: Column, b: Column): Column = bin(ArraySqDist.apply)(a, b)

  /** Int8 quantization of a double array (FAISS SQ8-style per-vector
    * scale): qᵢ = floor(xᵢ·127/max|x| + 0.5) as array<int> — the 4×
    * compression storage form; quantized cosine works on the ints. */
  def int8Quantize(v: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.Int8Quantize(
      ColumnBridge.expression(v)))

  /** Native `h = fold(h*131 + byte) mod (2^55-55)` string hash — the
    * engine-portable hot-path hash (DuckDB mirrors the fold exactly). */
  def polyHash(s: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.StringPolyHash(
      ColumnBridge.expression(s)))

  /**
   * Top-k (id, score) pairs per group as a native aggregate: partial
   * aggregation holds one k-entry heap per partition, so a grouped
   * top-k shuffles groups×k rows instead of every scored row (the
   * rank-window formulation's cost). Output array is best-first
   * (score desc, id asc).
   */
  def topKByScore(id: Column, score: Column, k: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftshim.TopKByScore(
        ColumnBridge.expression(id),
        ColumnBridge.expression(score),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** `graft_kmv(value, k)` — native bottom-k DISTINCT-value sketch
    * (KMV / theta bottom-k): set semantics absorb duplicates, partial
    * aggregation shuffles groups×k longs, merge is a commutative set
    * union — safe as streaming complete-mode state. Ascending
    * array<bigint>; all values when fewer than k exist. */
  def kmvSketch(value: Column, k: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftshim.KmvSketchAgg(
        ColumnBridge.expression(value),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** All `numHashes` MinHash minima of a hashed-element column as one
    * native aggregate (single long[] buffer; see SketchAggregates). */
  def minHashAgg(h: Column, numHashes: Int, seed: Long): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftshim.MinHashAgg(
        ColumnBridge.expression(h),
        org.apache.spark.sql.catalyst.expressions.Literal(numHashes),
        org.apache.spark.sql.catalyst.expressions.Literal(seed))
        .toAggregateExpression())

  /** SimHash bit-majority vote of a hashed-element column as one
    * native aggregate returning the packed long. */
  def simHashAgg(h: Column, bits: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftshim.SimHashAgg(
        ColumnBridge.expression(h),
        org.apache.spark.sql.catalyst.expressions.Literal(bits))
        .toAggregateExpression())

  /** Engine-portable avalanche-quality 52-bit hash: the first 13 hex
    * chars of md5, as a long. Both engines compute the identical value
    * (DuckDB folds the same hex digits), and md5's bit statistics are
    * uniform — the property HLL needs and the cheap poly-hash lacks. */
  def md5Hash52(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")
  }

  /** The SECOND 52-bit plane of the same md5 (hex chars 14–26).
    * Keying on ([[md5Hash52]], md5Hash52b) gives a 104-bit key whose
    * birthday bound is ~2^52 — beyond any realistic span count — while
    * each half stays a DOUBLE-safe integer the oracle can fold from
    * the same hex digits. */
  def md5Hash52b(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 14, 13), 16, 10).cast("long")
  }

  /** HyperLogLog distinct estimate of an [[md5Hash52]]-hashed column as
    * one native aggregate with a 2^p-byte register buffer (fixed-size
    * shuffle per group) — oracle-checkable because every step is a
    * deterministic function of the portable hash. */
  def hllDistinct(h: Column, p: Int = 12, hashBits: Int = 52): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftshim.HllAgg(
        ColumnBridge.expression(h),
        org.apache.spark.sql.catalyst.expressions.Literal(p),
        org.apache.spark.sql.catalyst.expressions.Literal(hashBits))
        .toAggregateExpression())

  /** Count-Min frequency sketch of a portable-hash column: one native
    * aggregate returning `depth × width` long counters (fixed-size
    * buffer per group, elementwise-add partial merge). */
  def cmsSketch(h: Column, depth: Int = 5, width: Int = 8192,
      seed: Long = 99L): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftshim.CmsAgg(
        ColumnBridge.expression(h),
        org.apache.spark.sql.catalyst.expressions.Literal(depth),
        org.apache.spark.sql.catalyst.expressions.Literal(width),
        org.apache.spark.sql.catalyst.expressions.Literal(seed))
        .toAggregateExpression())

  /** Count-Min point estimate: min over the sketch's rows of the
    * counter each row hashes `h` to — plain column arithmetic with the
    * same literal coefficient table (no UDF), so DuckDB replays it. */
  def cmsEstimate(sketch: Column, h: Column, depth: Int = 5, width: Int = 8192,
      seed: Long = 99L): Column = {
    import org.apache.spark.sql.functions.{element_at, least, lit, pmod}
    val coeffs = org.apache.spark.sql.graftshim.UniversalHash.coefficients(depth, seed)
    val p = org.apache.spark.sql.graftshim.UniversalHash.P
    val x32 = pmod(h, lit(1L << 32))
    val terms = (0 until depth).map { i =>
      val bucket = pmod(pmod(lit(coeffs(i)._1) * x32 + lit(coeffs(i)._2), lit(p)), lit(width.toLong))
      element_at(sketch, (lit(i.toLong * width) + bucket + lit(1L)).cast("int"))
    }
    if (terms.length == 1) terms.head else least(terms: _*)
  }

  /** KLL quantile-sketch estimates of a double column at the given
    * cumulative probabilities, as one native aggregate with an
    * O(k·log n)-double buffer (k=200 ≈ KBs at any input size) and
    * level-wise partial merge — the mergeable-percentile shape for
    * 100 TB corpus stats. Rank-accurate to ~1/k; arrival-order
    * dependent, so spec-bounded rather than oracle-checked. */
  def kllQuantiles(x: Column, probs: Seq[Double], k: Int = 200): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftshim.KllAgg(
        ColumnBridge.expression(x),
        org.apache.spark.sql.catalyst.expressions.Literal(k),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          probs.toArray,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
        .toAggregateExpression())

  /** Index of the nearest center (squared euclidean, ties → lowest
    * index) as one native codegen'd expression — the IVF assignment
    * path; the center matrix rides along as a referenced object. */
  def cellArgmin(vec: Column, centers: Array[Array[Double]]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.CellArgmin(
      ColumnBridge.expression(vec), centers))

  /** Minimum squared distance to any center — [[cellArgmin]]'s VALUE
    * twin (the k-means|| per-point cost), one native expression. */
  def cellMinDist(vec: Column, centers: Array[Array[Double]]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.CellMinDist(
      ColumnBridge.expression(vec), centers))

  /** Count of `arr` elements contained in the fixed string `set` — one
    * hashed probe per element inside codegen (the stateless-stream form
    * of a broadcast semi-join probe; see [[graftshim.SetHitCount]]). */
  /** Qualifying (min id, max id) pairs of an in-bucket entry array by
    * cosine ≥ threshold, one native scan (see [[graftshim.CosinePairsGE]]). */
  def cosinePairsGE(entries: Column, threshold: Double): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.CosinePairsGE(
      ColumnBridge.expression(entries), threshold))

  /** Space-joined word n-grams in one native byte scan — zero-copy
    * substrings of the original text (see [[graftshim.WordNGrams]]). */
  def wordNGrams(text: Column, n: Int): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.WordNGrams(
      ColumnBridge.expression(text), n))

  /** Radius-2 deletion-neighborhood keys in one native pass (see
    * [[graftshim.DeletionKeys2]]). */
  def deletionKeys2(text: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.DeletionKeys2(
      ColumnBridge.expression(text)))

  /** edJoin1's provenance-pair expansion over one collected signature
    * group in one native pass (see [[graftshim.EditPairs1]]). */
  def editPairs1(es: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.EditPairs1(
      ColumnBridge.expression(es)))

  def setHitCount(arr: Column, set: Seq[String]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.SetHitCount(
      ColumnBridge.expression(arr), set.toArray))

  /** The `nprobe` nearest center indices, (distance, index)-ordered —
    * the IVF probe path, same native shape as [[cellArgmin]]. */
  def cellProbes(vec: Column, centers: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.CellProbes(
      ColumnBridge.expression(vec), centers, nprobe))

  /** IVF-SQ8 encode — nearest cell + int8-quantized residual
    * `(cell, mx, q)` in one native scan (FAISS's
    * IndexIVFScalarQuantizer storage form; see
    * [[graftshim.CellResidualSq8]]). */
  def cellResidualSq8(vec: Column, centers: Array[Array[Double]]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.CellResidualSq8(
      ColumnBridge.expression(vec), centers))

  /** IVF-SQ8 decode — reconstruct `ctr + q·(mx/127)` from the encode
    * struct, one native loop (see [[graftshim.Sq8Decode]]). */
  def sq8Decode(enc: Column, centers: Array[Array[Double]]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.Sq8Decode(
      ColumnBridge.expression(enc), centers))

  /** `[n_chunks, n_banned]` of the document under the frozen
    * boilerplate set — one native boundary scan + one MD5 per disjoint
    * `w`-token chunk at `boilerplateChunkRemoval`'s exact grain
    * (see [[graftshim.ChunkHashHits]]). `banned` must be SORTED. */
  def chunkHashHits(text: Column, w: Int, banned: Array[Long]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.ChunkHashHits(
      ColumnBridge.expression(text), w, banned))

  /** `[n_distinct_ngrams, n_dirty_ngrams]` of the document's SLIDING
    * `n`-token windows under a frozen benchmark-shingle set —
    * [[chunkHashHits]]'s decontamination sibling, DISTINCT-counted
    * within the document (see [[graftshim.NgramHashHits]]). `banned`
    * must be SORTED. */
  def ngramHashHits(text: Column, n: Int, banned: Array[Long]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.NgramHashHits(
      ColumnBridge.expression(text), n, banned))

  /** Greedy MMR picks over one query's candidate pool + pairwise-sim
    * edges, as `array<struct<pos, nid, score>>` — exact-integer
    * scores, lower-id ties, order-free over both inputs (see
    * [[graftshim.MmrSelect]]). */
  def mmrSelect(pool: Column, edges: Column, k: Int,
      lambdaTenths: Int): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.MmrSelect(
      ColumnBridge.expression(pool), ColumnBridge.expression(edges),
      k, lambdaTenths))

  /** `[n_bigrams, kn_nll_unats]` under the frozen Kneser-Ney bigram
    * model — one native token scan, one map probe + ln per bigram
    * (see [[graftshim.KnLmScore]]). */
  def knLmScore(text: Column, lm: graft.ops.TextAnalysis.KnFrozenLm): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.KnLmScore(
      ColumnBridge.expression(text), lm.terms, lm.c1, lm.n1, lm.cont, lm.ct,
      lm.pairKeys, lm.pairC2, lm.vSize))

  /** `[n_trigrams, kn3_nll_unats]` under the frozen Kneser-Ney TRIGRAM
    * model — one native token scan, two map probes + ln per trigram
    * (see [[graftshim.Kn3LmScore]]). */
  def kn3LmScore(text: Column, lm: graft.ops.TextAnalysis.Kn3FrozenLm): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.Kn3LmScore(
      ColumnBridge.expression(text), lm.terms, lm.histKeys, lm.histC2h,
      lm.histN1h, lm.bch, lm.bn1, lm.cont3, lm.ct, lm.triKeys, lm.triC3,
      lm.vSize))

  /** Whole-document signed hashing-TF vector in ONE native token scan —
    * bit-identical to the explode→groupBy featurizer but O(tokens) work
    * and zero shuffle (see [[graftshim.HashingTfVec]]). */
  def hashingTfVec(text: Column, dim: Int): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.HashingTfVec(
      ColumnBridge.expression(text), dim))

  /** Row-local frozen bigram-LM scoring — `[n_bigrams, nll_unats]` per
    * text in one native token scan (see [[graftshim.BigramLmScore]]);
    * null when the text has fewer than two tokens. */
  def bigramLmScore(text: Column,
      lm: graft.ops.TextAnalysis.FrozenBigramLm): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.BigramLmScore(
      ColumnBridge.expression(text), lm.terms, lm.hist, lm.pairKeys,
      lm.pairCounts, lm.vSize))

  /** Row-local frozen DSIR scoring — `[n_tokens, dsir_unats]` per text
    * in one native token scan (see [[graftshim.DsirScore]]); null when
    * the text has no non-empty token. */
  def dsirScore(text: Column, lam: Array[Long]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.DsirScore(
      ColumnBridge.expression(text), lam))

  /** Sign bits of dimensions [lo, hi] packed into one long — the native
    * binary-quantization pack (see [[graftshim.PackSignBits]]). */
  def packSignBits(vec: Column, lo: Int, hi: Int): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.PackSignBits(
      ColumnBridge.expression(vec), lo, hi))

  /** Space-join of tokens whose 1-based position is NOT in the SORTED
    * `cov` int array — one linear merge-scan (see
    * [[graftshim.DropCoveredTokens]]). */
  def dropCoveredTokens(tokens: Column, cov: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.DropCoveredTokens(
      ColumnBridge.expression(tokens), ColumnBridge.expression(cov)))

  /** The string with the characters at sorted 1-based code-point
    * positions `cov` removed — the char-grain twin (see
    * [[graftshim.DropCoveredChars]]). */
  def dropCoveredChars(text: Column, cov: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.DropCoveredChars(
      ColumnBridge.expression(text), ColumnBridge.expression(cov)))

  /** 62-bit order-sensitive document fingerprint in one native byte
    * scan (see [[graftshim.Fingerprint62]]). */
  def fingerprint62(text: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.Fingerprint62(
      ColumnBridge.expression(text)))

  /** Dense matrix × vector (out[r] = Σᵢ m[r][i]·v[i], i ascending) as
    * one native expression — the rotation / many-component-projection
    * primitive (see [[graftshim.MatVecMul]]). */
  def matVecMul(vec: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftshim.MatVecMul(
      ColumnBridge.expression(vec), matrix))
}
