package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expressions for embedding math. Unlike the
 * `zip_with`/`aggregate` higher-order-function formulation (which Spark
 * interprets lambda-per-element), these generate a tight Java loop via
 * `doGenCode`, so brute-force similarity scans stay inside whole-stage
 * codegen. Array elements are assumed non-null (embedding vectors).
 */
abstract class ArrayPairFold extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  // nullable even for non-null children: length mismatch yields NULL
  // (silently folding over the shorter prefix would mask schema drift).
  override def nullable: Boolean = true
}

/** Σ aᵢ·bᵢ over two double arrays (length = min of the two). */
case class ArrayDot(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE pass (dot and both norms in a single loop);
  * 0.0 when either vector has zero norm. */
case class ArrayCosine(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² in one pass. */
case class ArraySqDist(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySqDist =
    copy(left = newLeft, right = newRight)
}


/**
 * Polynomial rolling hash of a string's UTF-8 bytes:
 * `h = fold(h * 131 + byte) mod (2^55 - 55)`. A native codegen'd loop —
 * roughly 4x cheaper than `conv(substring(md5(s), ...), 16, 10)` on the
 * shingle hot path — and engine-portable: the DuckDB oracle reproduces
 * the identical value by folding `ascii()` codes (equal to the bytes
 * for ASCII text; byte-level UTF-8 otherwise, which only the oracle
 * comparison cares about). The 2^55 modulus keeps every intermediate
 * (`h*131 + 255` < 2^62.1) safely inside ANSI-mode long arithmetic, in
 * Spark and in the mirrored DuckDB SQL alike.
 */
case class StringPolyHash(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  import StringPolyHash.{Mult, Prime}

  override def prettyName: String = "graft_polyhash"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Mult + (bytes(i) & 0xff)) % Prime
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * ${Mult}L + ($b[$i] & 0xff)) % ${Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StringPolyHash =
    copy(child = newChild)
}

object StringPolyHash {
  /** Largest prime below 2^55 — see the overflow analysis above. */
  val Prime = 36028797018963913L
  val Mult = 131L
}

/**
 * Random-hyperplane LSH bucket key: bit `p` of the result is set iff
 * `planes(p) · vec > 0`. One expression for ALL planes — the
 * per-plane `dot(vec, typedlit(coeffs))` formulation expands to
 * planes× separate codegen'd dots whose generated class takes longer
 * to Janino-compile than the query runs; here the plane matrix rides
 * along as one referenced object and the bits come from a nested loop.
 */
case class HyperplaneKey(
    child: Expression,
    planes: Array[Array[Double]]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(planes.nonEmpty && planes.length <= 63, "need 1..63 hyperplanes")

  override def prettyName: String = "graft_hyperplane_key"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def key(v: ArrayData): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var s = 0.0
      var i = 0
      val n = math.min(plane.length, v.numElements())
      while (i < n) { s += plane(i) * v.getDouble(i); i += 1 }
      if (s > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def nullSafeEval(v: Any): Any = key(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("hyperplaneKey", this, classOf[HyperplaneKey].getName)
      s"${ev.value} = $self.evalKey($v);"
    })

  /** codegen entry point (public for the generated class). */
  def evalKey(v: ArrayData): Long = key(v)

  override protected def withNewChildInternal(newChild: Expression): HyperplaneKey =
    copy(child = newChild)

  // the plane matrix is reference-compared by default; make equality
  // structural so plan canonicalization dedups identical keys
  override def equals(o: Any): Boolean = o match {
    case h: HyperplaneKey =>
      h.child == child && h.planes.length == planes.length &&
        h.planes.zip(planes).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + planes.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

/**
 * IVF coarse-quantizer cell assignment: index of the nearest center by
 * squared euclidean distance (ties → lowest index). The center matrix
 * rides along as ONE referenced object — same rationale as
 * [[HyperplaneKey]]: a `clusters`-way least()/array_position()
 * formulation (or a Scala UDF with per-row boxing) either bloats
 * codegen or falls out of it entirely; this is a tight nested loop
 * inside whole-stage codegen.
 */
case class CellArgmin(
    child: Expression,
    centers: Array[Array[Double]]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(centers.nonEmpty, "need at least one center")

  override def prettyName: String = "graft_cell_argmin"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  private def sqDistTo(v: ArrayData, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(c.length, v.numElements())
    while (i < n) { val d = v.getDouble(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** codegen entry point (public for the generated class). */
  def evalCell(v: ArrayData): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val d = sqDistTo(v, centers(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any): Any = evalCell(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("cellArgmin", this, classOf[CellArgmin].getName)
      s"${ev.value} = $self.evalCell($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): CellArgmin =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: CellArgmin =>
      h.child == child && h.centers.length == centers.length &&
        h.centers.zip(centers).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + centers.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

/**
 * Minimum squared distance from the input vector to any of the
 * referenced centers — [[CellArgmin]]'s VALUE twin (argmin gives the
 * cell, this gives the cost), the per-point quantity k-means||'s
 * sampling probability is proportional to. Same referenced-object
 * codegen shape: one nested loop, no per-center literal expansion.
 */
case class CellMinDist(
    child: Expression,
    centers: Array[Array[Double]]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(centers.nonEmpty, "need at least one center")

  override def prettyName: String = "graft_cell_mindist"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** codegen entry point (public for the generated class). */
  def evalMin(v: ArrayData): Double = {
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var s = 0.0
      var i = 0
      val n = math.min(ctr.length, v.numElements())
      while (i < n) { val d = v.getDouble(i) - ctr(i); s += d * d; i += 1 }
      if (s < bestD) bestD = s
      c += 1
    }
    bestD
  }

  override protected def nullSafeEval(v: Any): Any = evalMin(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("cellMinDist", this, classOf[CellMinDist].getName)
      s"${ev.value} = $self.evalMin($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): CellMinDist =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: CellMinDist =>
      h.child == child && h.centers.length == centers.length &&
        h.centers.zip(centers).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + centers.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

/**
 * IVF probe list: the `nprobe` nearest center indices ordered by
 * (distance asc, index asc) — deterministic ties, identical to a
 * stable sort over (dist, index). Same referenced-object codegen shape
 * as [[CellArgmin]].
 */
case class CellProbes(
    child: Expression,
    centers: Array[Array[Double]],
    nprobe: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(centers.nonEmpty, "need at least one center")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def prettyName: String = "graft_cell_probes"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)

  /** codegen entry point (public for the generated class). */
  def evalProbes(v: ArrayData): ArrayData = {
    val n = centers.length
    val dists = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cen = centers(c)
      var s = 0.0
      var i = 0
      val m = math.min(cen.length, v.numElements())
      while (i < m) { val d = v.getDouble(i) - cen(i); s += d * d; i += 1 }
      dists(c) = s
      c += 1
    }
    val take = math.min(nprobe, n)
    val idx = Array.range(0, n).sortBy(i => (dists(i), i))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(idx, take))
  }

  override protected def nullSafeEval(v: Any): Any = evalProbes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("cellProbes", this, classOf[CellProbes].getName)
      s"${ev.value} = $self.evalProbes($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): CellProbes =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: CellProbes =>
      h.child == child && h.nprobe == nprobe && h.centers.length == centers.length &&
        h.centers.zip(centers).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + nprobe) +
      centers.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

/**
 * Broadcast bloom-filter membership probe as a NATIVE expression: the
 * filter rides as a broadcast HANDLE (bytes ship torrent-style once per
 * executor, not inside the serialized plan) and the probe is one
 * virtual call inside whole-stage codegen — the Scala-UDF formulation
 * boxes every fact-table key into java.lang.Long on the hottest
 * pre-shuffle path of a bloom semi-join.
 */
case class BloomMightContain(
    child: Expression,
    filter: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def prettyName: String = "graft_bloom_might_contain"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override protected def nullSafeEval(k: Any): Any =
    filter.value.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k => {
      val self = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
      s"${ev.value} = $self.evalContains($k);"
    })

  /** codegen entry point (public for the generated class). */
  def evalContains(k: Long): Boolean = filter.value.mightContainLong(k)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/**
 * Int8 vector quantization in ONE pass: qᵢ = floor(xᵢ · 127/max|x| + 0.5)
 * — the 4× compression storage form for embedding columns (FAISS
 * SQ8-style, per-vector scale). Ratios within a vector are preserved,
 * so quantized cosine needs only the int vectors; the explicit
 * floor(x + 0.5) rounding makes the integers engine-portable (no
 * half-even ambiguity). A zero vector quantizes to zeros.
 */
/**
 * Membership-hit count of a string array against a FIXED string set —
 * the stateless-streaming form of a broadcast semi-join probe (st19's
 * ingest-time contamination scoring; the batch twin t23 uses a real
 * broadcast join, which a stateless append stream cannot). Counts the
 * elements of `child` contained in `set`. The set ships once per task
 * as a plan-time referenced object and is hashed ONCE lazily per
 * executor, so each element costs one HashSet probe — where
 * `array_contains` inside a HOF lambda is an interpreted LINEAR scan
 * per element (measured: 43.6 s → sub-second on st19's sweep entry at
 * ~9 k benchmark grams × ~100 grams/doc × ~1900 docs). Same
 * referenced-object codegen shape as [[CellArgmin]].
 */
/**
 * All unordered in-bucket pairs whose cosine clears a threshold, in ONE
 * native scan over the collected bucket — the codegen replacement for
 * `explode(unorderedPairs(entries))` + a cosine filter, which built an
 * interpreted pair struct CARRYING BOTH FULL VECTORS for every one of
 * the O(g²) candidate pairs before the filter could drop it (a19's
 * 2.3M-pair buckets: vectors copied per pair through two interpreted
 * lambdas, then UnsafeRow-converted, for a ~0.1% survivor rate).
 * Input: array<struct<id:long, v:array<double>>> (ids distinct within
 * a bucket). Output: array<struct<a:long, b:long>> with a = min id,
 * b = max id — exactly `least/greatest` of the id-first structs.
 * Arithmetic parity with [[ArrayCosine]]: dot/na/nb are independent
 * accumulators added in ascending index order, so splitting the norm
 * accumulation out of the pair loop produces bit-identical doubles;
 * zero-norm pairs score 0.0 and mismatched lengths score null, neither
 * of which passes `>= threshold`, matching the filter the explode
 * formulation ran (spec'd differentially in DedupSpec).
 */
case class CosinePairsGE(child: Expression, threshold: Double) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_cosine_pairs_ge"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StructType(fs), _)
          if fs.length == 2 && fs(0).dataType ==
            org.apache.spark.sql.types.LongType &&
            (fs(1).dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<struct<long, array<double>>>, got $other")
    }

  /** codegen entry point (public for the generated class). */
  def evalPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val vs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      vs(i) = v
      var na = 0.0
      var k = 0
      while (k < v.length) { val x = v(k); na += x * x; k += 1 }
      norms(i) = na
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val x = vs(i); val y = vs(j)
        if (x.length == y.length) {
          var dot = 0.0
          var k = 0
          while (k < x.length) { dot += x(k) * y(k); k += 1 }
          val denom = math.sqrt(norms(i)) * math.sqrt(norms(j))
          // exact ArrayCosine semantics incl. the zero-norm case: a
          // zero vector scores 0.0, which still passes thresholds <= 0
          val cos = if (denom == 0.0) 0.0 else dot / denom
          if (cos >= threshold) {
            val a = math.min(ids(i), ids(j))
            val b = math.max(ids(i), ids(j))
            out += new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](a, b))
          }
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(v: Any): Any =
    evalPairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("cosPairs", this, classOf[CosinePairsGE].getName)
      s"${ev.value} = $self.evalPairs($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): CosinePairsGE =
    copy(child = newChild)
}

/**
 * Word n-grams (space-joined) of a text column in ONE native byte scan
 * — the codegen replacement for the `transform(sequence(...), i =>
 * concat_ws(" ", element_at(split(text)...)))` HOF formulation, whose
 * interpreted lambda re-ran `split(text)` for EVERY element of every
 * n-gram (O(positions × n) tokenizations per document — the st21 bug
 * class; measured 1.8 s → 0.15 s per st19 micro-batch at sf0.1).
 *
 * Exact-parity trick: tokens come from `split(text, " ")` (single-space
 * delimiter, trailing empties kept) and n-grams re-join with " ", so
 * every n-gram IS the byte substring of the original text from token
 * i's first byte to token (i+n-1)'s last byte — including the empty
 * tokens a double space produces. One pass finds the space offsets
 * (a 0x20 byte never occurs inside a UTF-8 multibyte sequence, the
 * HashingTfVec argument), then each n-gram is a zero-copy
 * `UTF8String.fromBytes` view. Bit-identical output to the HOF form
 * (spec'd in OpsSpec), so every oracle stays valid.
 */
case class WordNGrams(child: Expression, n: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"WordNGrams: n must be >= 1 (got $n)")

  override def prettyName: String = "graft_word_ngrams"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  /** codegen entry point (public for the generated class). */
  def evalGrams(t: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val b = t.getBytes
    var spaces = 0
    var i = 0
    while (i < b.length) { if (b(i) == ' ') spaces += 1; i += 1 }
    val numToks = spaces + 1
    val count = numToks - (n - 1)
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    var ti = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { ends(ti) = i; ti += 1; starts(ti) = i + 1 }
      i += 1
    }
    ends(ti) = b.length
    val out = new Array[Any](count)
    var g = 0
    while (g < count) {
      out(g) = org.apache.spark.unsafe.types.UTF8String.fromBytes(
        b, starts(g), ends(g + n - 1) - starts(g))
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    evalGrams(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("wordNGrams", this, classOf[WordNGrams].getName)
      s"${ev.value} = $self.evalGrams($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** The radius-2 deletion neighborhood of a string (FastSS/SymSpell
  * signature keys): the string itself, every single-character deletion
  * (|s| keys) and every two-character deletion (C(|s|, 2) keys,
  * positions i < j removed), deduplicated keeping FIRST occurrence —
  * bit-parity with the `array_distinct(concat(array(s), d1, d2))`
  * higher-order-function formulation it replaces (which paid an
  * interpreted lambda plus three `substr` copies per (i, j) element:
  * O(|s|²) interpreted evaluations per row). One pass builds the
  * char→byte offset table (deletions are CHARACTER-level, exactly like
  * `Column.substr`), then each variant is at most two arraycopies.
  * Null input returns null (the HOF form yielded [null]; both explode
  * to keys that can never equi-join, so callers see identical pairs). */
case class DeletionKeys2(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_deletion_keys2"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  /** codegen entry point (public for the generated class). */
  def evalKeys(t: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val b = t.getBytes
    val nb = b.length
    // char start offsets: offs(k) = first byte of char k; offs(L) = nb
    var chars = 0
    var i = 0
    while (i < nb) {
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(b(i))
      chars += 1
    }
    val offs = new Array[Int](chars + 1)
    var k = 0
    i = 0
    while (i < nb) {
      offs(k) = i
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(b(i))
      k += 1
    }
    offs(chars) = nb
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(8, 2 + chars + chars * (chars - 1) / 2))
    seen.add(t)
    def variant(cutA: Int, cutB: Int): org.apache.spark.unsafe.types.UTF8String = {
      // drop chars cutA and (if >= 0) cutB (cutA < cutB)
      val lenA = offs(cutA)
      if (cutB < 0) {
        val tail = nb - offs(cutA + 1)
        val out = new Array[Byte](lenA + tail)
        System.arraycopy(b, 0, out, 0, lenA)
        System.arraycopy(b, offs(cutA + 1), out, lenA, tail)
        org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
      } else {
        val mid = offs(cutB) - offs(cutA + 1)
        val tail = nb - offs(cutB + 1)
        val out = new Array[Byte](lenA + mid + tail)
        System.arraycopy(b, 0, out, 0, lenA)
        System.arraycopy(b, offs(cutA + 1), out, lenA, mid)
        System.arraycopy(b, offs(cutB + 1), out, lenA + mid, tail)
        org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
      }
    }
    var a = 0
    while (a < chars) { seen.add(variant(a, -1)); a += 1 }
    a = 0
    while (a < chars) {
      var c = a + 1
      while (c < chars) { seen.add(variant(a, c)); c += 1 }
      a += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    evalKeys(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("deletionKeys2", this, classOf[DeletionKeys2].getName)
      s"${ev.value} = $self.evalKeys($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeletionKeys2 =
    copy(child = newChild)
}

/**
 * edJoin1's provenance-pair expansion in ONE native pass over the
 * collected signature group — the codegen replacement for the
 * `flatten(transform(ls, a => transform(filter(es, b => ...), b =>
 * struct(...))))` nested-HOF form, which re-ran an interpreted lambda
 * (plus a struct allocation) for every (left, candidate) element of
 * every group: O(|L|·|R|) interpreted evaluations per signature key.
 * Input: array<struct<side:int, pos:int, ch:string, id:long>> (one
 * collect_list'd signature group). Output: array<struct<l:long,
 * r:long, d:int>> in exactly the HOF's order (left elements in group
 * order, right candidates in group order), with the HOF's predicate
 * and null semantics:
 *   - identity × identity (pos 0 × pos 0)      → dist 0;
 *   - same pos > 0, deleted chars differ        → dist 1 (a null ch —
 *     only possible for a null input string's identity element, which
 *     has pos 0 — makes `=!=` null, i.e. NOT emitted);
 *   - exactly one side is the identity element  → dist 1;
 *   - different deletion positions              → not emitted (true
 *     distance can be 2; any distance-1 pair shares a covering key).
 * Bit-parity with the HOF form is spec'd differentially in
 * FuzzyJoinSpec (the HOF stays in FuzzyJoin as the reference).
 */
case class EditPairs1(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_edit_pairs1"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StructType(fs), _)
          if fs.length == 4 &&
            fs(0).dataType == org.apache.spark.sql.types.IntegerType &&
            fs(1).dataType == org.apache.spark.sql.types.IntegerType &&
            fs(2).dataType == org.apache.spark.sql.types.StringType &&
            fs(3).dataType == org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<struct<int, int, string, long>>, got $other")
    }

  /** codegen entry point (public for the generated class). */
  def evalPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // decode once: side, pos, ch (null allowed), id (null allowed)
    val sides = new Array[Int](n)
    val poss = new Array[Int](n)
    val chs = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val ids = new Array[Long](n)
    val idNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 4)
      sides(i) = row.getInt(0)
      poss(i) = row.getInt(1)
      chs(i) = if (row.isNullAt(2)) null else row.getUTF8String(2)
      if (row.isNullAt(3)) idNull(i) = true else ids(i) = row.getLong(3)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      if (sides(i) == 0) {
        val aIdentity = poss(i) == 0
        var j = 0
        while (j < n) {
          if (sides(j) == 1) {
            val bIdentity = poss(j) == 0
            val emit =
              if (aIdentity && bIdentity) true
              else if (poss(i) == poss(j))
                chs(i) != null && chs(j) != null && !chs(i).equals(chs(j))
              else aIdentity != bIdentity
            if (emit) {
              val d = if (aIdentity && bIdentity) 0 else 1
              out += new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(Array[Any](
                  if (idNull(i)) null else ids(i),
                  if (idNull(j)) null else ids(j),
                  d))
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(v: Any): Any =
    evalPairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("editPairs1", this, classOf[EditPairs1].getName)
      s"${ev.value} = $self.evalPairs($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): EditPairs1 =
    copy(child = newChild)
}

case class SetHitCount(child: Expression, set: Array[String]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_set_hits"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val hashed = {
    val h = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(4, set.length * 2))
    set.foreach(s => h.add(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    h
  }

  /** codegen entry point (public for the generated class). */
  def evalHits(v: ArrayData): Int = {
    var i = 0
    var c = 0
    val n = v.numElements()
    while (i < n) {
      if (!v.isNullAt(i) && hashed.contains(v.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(v: Any): Any = evalHits(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("setHits", this, classOf[SetHitCount].getName)
      s"${ev.value} = $self.evalHits($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): SetHitCount =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: SetHitCount => h.child == child && h.set.toSeq == set.toSeq
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + set.toSeq.hashCode()
}

/**
 * Signed hashing-trick TF featurization of a whole document in ONE
 * native token scan (Weinberger et al. 2009): split on single spaces,
 * and for each non-empty token add ±1 to bucket
 * `md5_52("tfb:" ⧺ tok) mod dim`, signed by `md5_52("tfs:" ⧺ tok)
 * mod 2 — bit-identical to the explode→groupBy formulation in
 * `TextAnalysis.hashingTf` (every entry is an exact small integer, so
 * accumulation order cannot move a bit) and to the per-row HOF fold
 * the streaming scorer used before this expression existed. That HOF
 * rebuilt the whole dim-length array through interpreted lambdas per
 * token (O(tokens × dim) lambda evals + one fresh array allocation
 * per token — the st21 bug class); this is one token scan into one
 * mutable array, O(tokens) md5s and O(dim) output, inside codegen.
 * The md5-based bucket/sign keeps the value engine-portable: DuckDB
 * folds the same first-13-hex-chars integer. Tokenization is
 * byte-level split on 0x20 — exact for UTF-8, where a space byte
 * never occurs inside a multibyte sequence.
 */
case class HashingTfVec(child: Expression, dim: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(dim >= 1, s"HashingTfVec: dim must be >= 1 (got $dim)")

  override def prettyName: String = "graft_hashing_tf"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // MessageDigest is stateful; one instance per executor thread
  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 52 bits (13 hex chars) of the digest as a non-negative long —
    * the native twin of `VectorExpressions.md5Hash52`. */
  private def h52(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >>> 4)

  /** codegen entry point (public for the generated class). */
  def evalVec(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Double](dim)
    val digest = md.get()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) { // non-empty token [start, i)
          digest.reset()
          digest.update(HashingTfVec.BucketPrefix)
          digest.update(bytes, start, i - start)
          val j = (h52(digest.digest()) % dim).toInt
          digest.reset()
          digest.update(HashingTfVec.SignPrefix)
          digest.update(bytes, start, i - start)
          out(j) += (if (h52(digest.digest()) % 2 == 0) 1.0 else -1.0)
        }
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(s: Any): Any =
    evalVec(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("hashingTfVec", this, classOf[HashingTfVec].getName)
      s"${ev.value} = $self.evalVec($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashingTfVec =
    copy(child = newChild)
}

object HashingTfVec {
  private val BucketPrefix = "tfb:".getBytes("UTF-8")
  private val SignPrefix = "tfs:".getBytes("UTF-8")
}

/**
 * Sign bits of dimensions [lo, hi] of a double array packed into one
 * long: bit (i − lo) is set iff element i (0-based) exists, is
 * non-null and is > 0 — exactly the `aggregate(sequence(lo, hi), …)`
 * HOF it replaces in the binary-quantization pack (a23), where every
 * one of the ≤ 32 lambda steps per word per vector ran interpreted on
 * the hot pack loop of an operator whose whole argument is scan
 * cheapness. Out-of-range and null elements contribute a 0 bit (the
 * non-ANSI `element_at` semantics of the HOF form): vectors SHORTER
 * than the caller's dim quietly zero-pad, and dimensions beyond hi
 * are IGNORED — callers passing a non-default-dim corpus must size
 * (lo, hi) to the real vector length or accept that truncation in
 * the Hamming shortlist.
 */
case class PackSignBits(child: Expression, lo: Int, hi: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(lo >= 0 && hi >= lo && hi - lo < 64,
    s"PackSignBits: need 0 <= lo <= hi < lo + 64 (got $lo, $hi)")

  override def prettyName: String = "graft_pack_sign_bits"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  /** codegen entry point (public for the generated class). */
  def evalPack(v: ArrayData): Long = {
    var bits = 0L
    val n = v.numElements()
    var i = lo
    val top = math.min(hi, n - 1)
    while (i <= top) {
      if (!v.isNullAt(i) && v.getDouble(i) > 0) bits |= 1L << (i - lo)
      i += 1
    }
    bits
  }

  override protected def nullSafeEval(v: Any): Any = evalPack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("packSignBits", this, classOf[PackSignBits].getName)
      s"${ev.value} = $self.evalPack($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): PackSignBits =
    copy(child = newChild)
}

/**
 * Space-join of the tokens whose 1-BASED position is NOT in a SORTED
 * int position array — the reassembly step of duplicate-span removal
 * (d16) as one linear merge-scan. The `filter(t, (tok, i) ->
 * !array_contains(cov, i+1))` HOF it replaces probes the whole
 * covered-positions array per token, interpreted — O(n·c) on exactly
 * the documents the op targets (heavily duplicated long docs maximize
 * c; a fully-duplicated 10k-token doc is 10⁸ compares). Here `cov` is
 * consumed as the sorted array the caller already builds
 * (`array_sort` in the census), so one pointer walks it alongside the
 * token index: O(n + c). Null tokens (impossible from `split`) are
 * skipped like concat_ws skips them; positions outside [1, n] are
 * ignored.
 */
case class DropCoveredTokens(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_drop_covered"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType),
      ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = org.apache.spark.sql.types.StringType

  /** codegen entry point (public for the generated class). */
  def evalJoin(toks: ArrayData, cov: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = toks.numElements()
    val c = cov.numElements()
    val kept = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n)
    var p = 0
    var i = 0
    while (i < n) {
      val pos = i + 1 // 1-based token position, matching the census
      while (p < c && cov.getInt(p) < pos) p += 1
      val covered = p < c && cov.getInt(p) == pos
      if (!covered && !toks.isNullAt(i)) kept.add(toks.getUTF8String(i))
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.concatWs(
      org.apache.spark.unsafe.types.UTF8String.fromString(" "),
      kept.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](kept.size())): _*)
  }

  override protected def nullSafeEval(t: Any, c: Any): Any =
    evalJoin(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val self = ctx.addReferenceObj("dropCovered", this, classOf[DropCoveredTokens].getName)
      s"${ev.value} = $self.evalJoin($t, $c);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropCoveredTokens =
    copy(left = newLeft, right = newRight)
}

/**
 * The string with the characters at SORTED 1-based code-point
 * positions `cov` removed — [[DropCoveredTokens]]' twin at CHARACTER
 * grain (the reassembly step of char-window duplicate-span removal):
 * one merge-scan over the code points alongside the sorted position
 * array, O(n + c). Positions count CODE POINTS (the `substring`
 * semantics both engines use), not UTF-16 units, so supplementary
 * characters drop whole.
 */
case class DropCoveredChars(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_drop_covered_chars"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType,
      ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = org.apache.spark.sql.types.StringType

  /** codegen entry point (public for the generated class). */
  def evalDrop(s: org.apache.spark.unsafe.types.UTF8String,
      cov: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    val c = cov.numElements()
    val out = new java.lang.StringBuilder(str.length)
    var p = 0
    var pos = 0 // 0-based code-point index
    var i = 0   // UTF-16 index
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val pos1 = pos + 1
      while (p < c && cov.getInt(p) < pos1) p += 1
      if (!(p < c && cov.getInt(p) == pos1)) out.appendCodePoint(cp)
      i += Character.charCount(cp)
      pos += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(out.toString)
  }

  override protected def nullSafeEval(t: Any, c: Any): Any =
    evalDrop(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val self = ctx.addReferenceObj("dropCoveredChars", this,
        classOf[DropCoveredChars].getName)
      s"${ev.value} = $self.evalDrop($t, $c);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropCoveredChars =
    copy(left = newLeft, right = newRight)
}

/**
 * 62-bit order-sensitive document fingerprint in ONE native byte scan:
 * for each split-on-space segment (EMPTY segments included — the
 * `split(text, ' ')` contract the folded-HOF formulation had),
 * h = polyhash(segment) mod p2 (the [[StringPolyHash]] fold), then
 * a = (a·1000003 + h) mod p1, b = (b·1000033 + h) mod p2, seeded
 * (17, 19); result a·2³¹ + b. Bit-identical to the `aggregate` HOF it
 * replaces — which ran one interpreted lambda step per token with a
 * fresh two-field struct per step — and to the DuckDB oracle's
 * list_reduce replay. All intermediates stay < 2^52: safe under ANSI
 * arithmetic in both engines.
 */
case class Fingerprint62(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  import Fingerprint62._

  override def prettyName: String = "graft_fingerprint"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  /** codegen entry point (public for the generated class). */
  def evalFp(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var a = 17L
    var b = 19L
    var h = 0L // rolling polyhash of the current segment
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val hm = h % P2
        a = (a * 1000003L + hm) % P1
        b = (b * 1000033L + hm) % P2
        h = 0L
      } else {
        h = (h * StringPolyHash.Mult + (bytes(i) & 0xff)) % StringPolyHash.Prime
      }
      i += 1
    }
    a * (1L << 31) + b
  }

  override protected def nullSafeEval(s: Any): Any =
    evalFp(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("fingerprint62", this, classOf[Fingerprint62].getName)
      s"${ev.value} = $self.evalFp($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint62 =
    copy(child = newChild)
}

object Fingerprint62 {
  val P1 = 2147483629L
  val P2 = 2147483647L
}

/**
 * Dense matrix × vector as ONE native expression: out[r] = Σᵢ
 * m[r][i]·v[i], i ascending (the summation order every DuckDB
 * `list_sum` replay assumes). The matrix rides along as a single
 * referenced object — the per-row `dot(v, typedlit(row))` formulation
 * expands to rows× separate codegen'd dots whose generated class
 * Janino-compiles longer than the query runs past ~a dozen rows (the
 * [[HyperplaneKey]] lesson); this is one nested loop. The rotation /
 * many-component-projection primitive (OPQ rotations, full-width PCA
 * projections). Rows shorter than the vector fold over the common
 * prefix; both sides assumed non-null (embedding vectors).
 */
case class MatVecMul(
    child: Expression,
    matrix: Array[Array[Double]]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(matrix.nonEmpty, "need at least one matrix row")

  override def prettyName: String = "graft_matvec"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** codegen entry point (public for the generated class). */
  def evalMul(v: ArrayData): ArrayData = {
    val out = new Array[Double](matrix.length)
    var r = 0
    while (r < matrix.length) {
      val row = matrix(r)
      val n = math.min(row.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += row(i) * v.getDouble(i); i += 1 }
      out(r) = s
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = evalMul(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("matVecMul", this, classOf[MatVecMul].getName)
      s"${ev.value} = $self.evalMul($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): MatVecMul =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: MatVecMul =>
      h.child == child && h.matrix.length == matrix.length &&
        h.matrix.zip(matrix).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + matrix.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

case class Int8Quantize(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_int8"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)

  /** codegen entry point (public for the generated class). */
  def evalQuant(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) { val a = math.abs(v.getDouble(i)); if (a > mx) mx = a; i += 1 }
    val s = if (mx == 0.0) 0.0 else 127.0 / mx
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = math.floor(v.getDouble(i) * s + 0.5).toInt; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = evalQuant(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("int8Quantize", this, classOf[Int8Quantize].getName)
      s"${ev.value} = $self.evalQuant($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/**
 * Row-local bigram-LM scoring of a whole document in ONE native token
 * scan — the frozen-model twin of `TextAnalysis.bigramLmScore` for
 * score-at-ingest streams (st25), where the add-one bigram LM ships as
 * a deployed artifact instead of riding broadcast joins. Output is
 * `[n_bigrams, nll_unats]` (longs): per adjacent token pair,
 * `q = floor(ln((c2+1)/(c1+V)) * 1e6 + 0.5)` exactly as the batch
 * scorer and the DuckDB oracle fold it — q is precomputed ONCE per
 * distinct model bigram at plan build (seen pairs) or per history id
 * (the unseen-bigram default `ln(1/(c1+V))`), so the hot loop is one
 * vocab-id hash probe per token and one long-key map probe per pair:
 * O(tokens) with zero allocation beyond the 2-slot result. Token
 * boundaries are EVERY space byte, empty segments included — exact
 * parity with `split(text, ' ')`, whose adjacent-pair semantics the
 * batch path pairs through (a run of two spaces yields an empty token
 * that maps to <unk>, byte-safe in UTF-8 where 0x20 never occurs
 * inside a multibyte sequence). Texts with fewer than two tokens
 * return null (no bigram evidence — callers filter them out, the
 * batch path's `size(w) >= 2` route).
 *
 * Model layout: `terms(i)` has vocab id i+1, id 0 = <unk>;
 * `hist(id) = c1`; `pairKeys(k) = id1 * V + id2` with count
 * `pairCounts(k)`. V (`vSize`) is the BATCH fit's |vocab|+1 — it
 * exceeds terms.length+1 exactly when the literal token "<unk>"
 * cleared the minCount gate (the fold keeps the arrays at
 * terms.length+1 slots while the smoothing V must match the batch
 * scorer; see TextAnalysis.bigramLmFreeze).
 */
case class BigramLmScore(child: Expression, terms: Array[String],
    hist: Array[Long], pairKeys: Array[Long], pairCounts: Array[Long],
    vSize: Long) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(hist.length == terms.length + 1,
    s"BigramLmScore: hist length ${hist.length} != |vocab|+1 = ${terms.length + 1}")
  require(pairKeys.length == pairCounts.length,
    s"BigramLmScore: ${pairKeys.length} pair keys vs ${pairCounts.length} counts")
  require(vSize >= terms.length + 1L,
    s"BigramLmScore: vSize=$vSize < |terms|+1 = ${terms.length + 1}")

  override def prettyName: String = "graft_bigram_lm"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val idx = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](
      math.max(4, terms.length * 2))
    var i = 0
    while (i < terms.length) {
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(terms(i)), i + 1)
      i += 1
    }
    m
  }

  private def q6(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong

  @transient private lazy val qSeen = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(4, pairKeys.length * 2))
    var k = 0
    while (k < pairKeys.length) {
      val id1 = (pairKeys(k) / vSize).toInt
      m.put(pairKeys(k), q6((pairCounts(k) + 1).toDouble / (hist(id1) + vSize).toDouble))
      k += 1
    }
    m
  }

  @transient private lazy val qDef: Array[Long] =
    Array.tabulate(hist.length)(id => q6(1.0 / (hist(id) + vSize).toDouble))

  /** codegen entry point (public for the generated class). */
  def evalScore(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    var prev = -1
    var n = 0L
    var sum = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        // token [start, i) — possibly empty (split(" ") parity)
        val t = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(bytes, start, i - start)
        val boxed = idx.get(t)
        val id = if (boxed == null) 0 else boxed.intValue()
        if (prev >= 0) {
          val q = qSeen.get(prev.toLong * vSize + id)
          sum += (if (q == null) qDef(prev) else q.longValue())
          n += 1
        }
        prev = id
        start = i + 1
      }
      i += 1
    }
    if (n == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](n, -sum / n))
  }

  override protected def nullSafeEval(s: Any): Any =
    evalScore(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("bigramLm", this, classOf[BigramLmScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalScore($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BigramLmScore =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case b: BigramLmScore => b.child == child && b.terms.toSeq == terms.toSeq &&
      b.hist.toSeq == hist.toSeq && b.pairKeys.toSeq == pairKeys.toSeq &&
      b.pairCounts.toSeq == pairCounts.toSeq && b.vSize == vSize
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + terms.toSeq.hashCode() + hist.toSeq.hashCode()
}

/**
 * Row-local DSIR scoring of a whole document in ONE native token scan —
 * the frozen-artifact twin of `TextAnalysis.dsirWeights` for
 * score-at-ingest streams (st26), where the per-bucket log-ratio table
 * λ ships as a deployed array instead of riding a broadcast join.
 * Output is `[n_tokens, dsir_unats]` (longs): per non-empty token,
 * bucket = first-52-bits(md5(token)) mod B — bit-identical to the
 * column-plane `md5Hash52(tok) % B` the batch path and the DuckDB
 * oracle fold — and the weight is `Σ λ(bucket)` in exact longs. Token
 * boundaries are every space byte with EMPTY segments skipped — parity
 * with the batch path's `explode(split) … length(tok) > 0` route
 * (byte-safe in UTF-8 where 0x20 never occurs inside a multibyte
 * sequence). Texts with zero non-empty tokens return null (no
 * evidence — the batch groupBy produces no row for them either).
 * Hot loop: one MD5 + one array index per token, zero allocation
 * beyond the 2-slot result — never an interpreted HOF fold.
 */
case class DsirScore(child: Expression, lam: Array[Long]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(lam.nonEmpty, "DsirScore: empty lambda table")

  override def prettyName: String = "graft_dsir_score"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true

  // MessageDigest is stateful; one instance per executor thread
  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 52 bits (13 hex chars) of the digest as a non-negative long —
    * the native twin of `VectorExpressions.md5Hash52`. */
  private def h52(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >>> 4)

  /** codegen entry point (public for the generated class). */
  def evalScore(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    val digest = md.get()
    val b = lam.length
    var n = 0L
    var sum = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) { // non-empty token [start, i)
          digest.reset()
          digest.update(bytes, start, i - start)
          sum += lam((h52(digest.digest()) % b).toInt)
          n += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (n == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](n, sum))
  }

  override protected def nullSafeEval(s: Any): Any =
    evalScore(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalScore($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case d: DsirScore => d.child == child && d.lam.toSeq == lam.toSeq
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + lam.toSeq.hashCode()
}

/**
 * IVF-SQ8 ENCODE in one native scan — the FAISS
 * IndexIVFScalarQuantizer storage form: assign the vector to its
 * nearest coarse cell (CellArgmin's argmin, ties → lowest index),
 * subtract that centroid, and int8-quantize the RESIDUAL with a
 * per-vector scale (Int8Quantize's exact formula on the residual).
 * Output struct `(cell INT, mx DOUBLE, q ARRAY<DOUBLE>)` — mx is the
 * max-abs residual the decoder needs; codes stay doubles because they
 * never leave the plan (the decode probe consumes them immediately).
 * One referenced-object nested loop inside whole-stage codegen; the
 * interpreted alternative (zip_with residual + aggregate max + second
 * transform) is 3 HOF passes per corpus vector on the index-build hot
 * path.
 */
case class CellResidualSq8(
    child: Expression,
    centers: Array[Array[Double]]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(centers.nonEmpty, "need at least one center")

  override def prettyName: String = "graft_cell_residual_sq8"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("mx", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("q",
      ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** codegen entry point (public for the generated class). */
  def evalEncode(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var s = 0.0
      var i = 0
      val m = math.min(ctr.length, n)
      while (i < m) { val d = v.getDouble(i) - ctr(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    val ctr = centers(best)
    val m = math.min(ctr.length, n)
    val r = new Array[Double](m)
    var mx = 0.0
    var i = 0
    while (i < m) {
      r(i) = v.getDouble(i) - ctr(i)
      val a = math.abs(r(i)); if (a > mx) mx = a
      i += 1
    }
    val s = if (mx == 0.0) 0.0 else 127.0 / mx
    val q = new Array[Double](m)
    i = 0
    while (i < m) { q(i) = math.floor(r(i) * s + 0.5); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      best, mx, new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }

  override protected def nullSafeEval(v: Any): Any = evalEncode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("cellResidualSq8", this,
        classOf[CellResidualSq8].getName)
      s"${ev.value} = $self.evalEncode($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): CellResidualSq8 =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: CellResidualSq8 =>
      h.child == child && h.centers.length == centers.length &&
        h.centers.zip(centers).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + centers.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

/**
 * IVF-SQ8 DECODE — [[CellResidualSq8]]'s inverse: reconstruct
 * `v̂ᵢ = ctrᵢ + qᵢ·(mx/127)` from the encode struct, one native loop.
 * The scale divides ONCE per vector (the per-element division the SQL
 * replay writes computes the identical IEEE value, so the oracle
 * matches bit-for-bit). Separate from the ADC probe so the decoded
 * frame feeds the existing native sqDist/topK plan unchanged.
 */
case class Sq8Decode(
    child: Expression,
    centers: Array[Array[Double]]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centers.nonEmpty, "need at least one center")

  override def prettyName: String = "graft_sq8_decode"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** codegen entry point (public for the generated class). */
  def evalDecode(row: org.apache.spark.sql.catalyst.InternalRow): ArrayData = {
    val cell = row.getInt(0)
    val mx = row.getDouble(1)
    val q = row.getArray(2)
    val ctr = centers(cell)
    val n = math.min(ctr.length, q.numElements())
    val s = mx / 127.0
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = ctr(i) + q.getDouble(i) * s; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    evalDecode(v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("sq8Decode", this, classOf[Sq8Decode].getName)
      s"${ev.value} = $self.evalDecode($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Decode =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: Sq8Decode =>
      h.child == child && h.centers.length == centers.length &&
        h.centers.zip(centers).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + centers.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

/**
 * Row-local BOILERPLATE probe in one native scan — the frozen-set twin
 * of `Dedup.boilerplateChunkRemoval`'s census probe for
 * score-at-ingest streams (st28): the corpus-frequency banned set (52-
 * bit chunk hashes) ships as a deployed artifact, and every arriving
 * document is scanned once — disjoint `w`-token chunks at the batch
 * op's exact grain (split on single space, empties kept, short tail
 * chunk included), each chunk's bytes digested IN PLACE (rejoining
 * single-space tokens reproduces the original byte span, so no chunk
 * string is ever built) and probed against the sorted banned array by
 * binary search. Output `[n_chunks, n_banned]` longs. Hot loop: one
 * boundary scan + one MD5 per chunk, zero interpreted HOFs.
 */
case class ChunkHashHits(child: Expression, w: Int, banned: Array[Long]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(w >= 1, s"w=$w")

  override def prettyName: String = "graft_chunk_hash_hits"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def h52(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >>> 4)

  /** codegen entry point (public for the generated class). */
  def evalChunks(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    // token boundaries under the single-space rule (empties kept):
    // nTok = spaces + 1; starts(i)/ends(i) delimit token i's bytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val nChunks = (nTok - 1) / w + 1
    val digest = md.get()
    var hits = 0L
    var ci = 0
    while (ci < nChunks) {
      val from = starts(ci * w)
      val to = ends(math.min(nTok, ci * w + w) - 1)
      digest.reset()
      digest.update(bytes, from, to - from)
      if (java.util.Arrays.binarySearch(banned, h52(digest.digest())) >= 0)
        hits += 1
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](nChunks.toLong, hits))
  }

  override protected def nullSafeEval(s: Any): Any =
    evalChunks(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("chunkHashHits", this, classOf[ChunkHashHits].getName)
      s"${ev.value} = $self.evalChunks($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): ChunkHashHits =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: ChunkHashHits =>
      h.child == child && h.w == w && java.util.Arrays.equals(h.banned, banned)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + w) + java.util.Arrays.hashCode(banned)
}

/**
 * Row-local SLIDING n-gram probe against a frozen benchmark-shingle
 * set in one native scan — [[ChunkHashHits]]'s decontamination
 * sibling (GPT-3-style eval-overlap screening at ingest): where the
 * boilerplate probe digests DISJOINT `w`-token chunks, contamination
 * is defined on every OVERLAPPING `n`-token window, and a document is
 * judged by its DISTINCT windows (a repeated dirty n-gram is one
 * contamination, not many). Token boundaries are every space byte
 * (empties kept, split-parity); each window's bytes digest IN PLACE
 * (single-space rejoin reproduces the original span, so no window
 * string is built); the 52-bit hashes are sorted in a scratch array
 * to count uniques and unique∧banned by one linear walk + binary
 * search. Output `[n_distinct_ngrams, n_dirty_ngrams]` longs; a
 * document with fewer than `n` tokens reads `[0, 0]`. The banned
 * array ships sorted (deployed-artifact posture — a benchmark's
 * shingle set is KB-scale however large the corpus).
 */
case class NgramHashHits(child: Expression, n: Int, banned: Array[Long]) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n=$n")

  override def prettyName: String = "graft_ngram_hash_hits"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def h52(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >>> 4)

  /** codegen entry point (public for the generated class). */
  def evalNgrams(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val nWin = nTok - n + 1
    if (nWin <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Long](0L, 0L))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val digest = md.get()
    val hs = new Array[Long](nWin)
    var wi = 0
    while (wi < nWin) {
      val from = starts(wi)
      val to = ends(wi + n - 1)
      digest.reset()
      digest.update(bytes, from, to - from)
      hs(wi) = h52(digest.digest())
      wi += 1
    }
    java.util.Arrays.sort(hs)
    var distinct = 0L
    var dirty = 0L
    wi = 0
    while (wi < nWin) {
      if (wi == 0 || hs(wi) != hs(wi - 1)) {
        distinct += 1
        if (java.util.Arrays.binarySearch(banned, hs(wi)) >= 0) dirty += 1
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](distinct, dirty))
  }

  override protected def nullSafeEval(s: Any): Any =
    evalNgrams(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("ngramHashHits", this, classOf[NgramHashHits].getName)
      s"${ev.value} = $self.evalNgrams($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramHashHits =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case h: NgramHashHits =>
      h.child == child && h.n == n && java.util.Arrays.equals(h.banned, banned)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + n) + java.util.Arrays.hashCode(banned)
}

/**
 * Row-local GREEDY MMR selection over one query's candidate pool —
 * `pool` is array<struct<nid:long, rel:long>> (micro-quantized
 * relevance), `edges` array<struct<a:long, b:long, s:long>> (the
 * pool's pairwise micro cosines), output the k picks as
 * array<struct<pos:long, nid:long, score:long>> with score =
 * rel·λ₁₀ − maxsim·(10−λ₁₀) — exact integers throughout, ties to
 * the lower id. ORDER-FREE over both inputs (the pool is sorted
 * internally, the edges build a map), so the upstream
 * `collect_list`s need no ordering guarantee. One native scan per
 * query replaces k unrolled join/window stages whose recursive
 * lineage was measured at 442 shuffle Exchanges in the r17 plan
 * audit — the selection is row-local over m + m² candidate-pool
 * values however large the corpus.
 */
case class MmrSelect(pool: Expression, edges: Expression, k: Int,
    lambdaTenths: Int) extends
    org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k >= 1, s"k=$k")
  require(lambdaTenths >= 0 && lambdaTenths <= 10, s"lambdaTenths=$lambdaTenths")

  override def left: Expression = pool
  override def right: Expression = edges
  override def prettyName: String = "graft_mmr_select"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("nid",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  /** codegen entry point (public for the generated class). */
  def evalSelect(p: ArrayData, e: ArrayData): ArrayData = {
    val n = p.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = p.getStruct(i, 2)
      ids(i) = r.getLong(0)
      rels(i) = r.getLong(1)
      i += 1
    }
    // deterministic pool order: rel DESC, nid ASC
    val order = (0 until n).sortBy(j => (-rels(j), ids(j))).toArray
    val sims = new java.util.HashMap[Long, Long](math.max(4, e.numElements() * 2))
    i = 0
    while (i < e.numElements()) {
      val r = e.getStruct(i, 3)
      val a = r.getLong(0)
      val b = r.getLong(1)
      require(a >= 0L && a < (1L << 31) && b >= 0L && b < (1L << 31),
        "graft_mmr_select: candidate ids must fit 31 bits for pair keying")
      sims.put((a << 31) | b, r.getLong(2))
      i += 1
    }
    val l = lambdaTenths.toLong
    val lm = (10 - lambdaTenths).toLong
    val picked = new Array[Int](math.min(k, n))
    val pickedScore = new Array[Long](picked.length)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < picked.length) {
      var bestIdx = -1
      var bestScore = Long.MinValue
      var oi = 0
      while (oi < n) {
        val c = order(oi)
        if (!used(c)) {
          var ms = 0L
          var pj = 0
          while (pj < j) {
            // getOrDefault + require: a bare get would silently unbox
            // a missing pair's null to 0 and rank on a phantom sim
            val s = sims.getOrDefault((ids(c) << 31) | ids(picked(pj)),
              Long.MinValue)
            require(s != Long.MinValue,
              "graft_mmr_select: missing pairwise sim in the edge set")
            if (pj == 0 || s > ms) ms = s
            pj += 1
          }
          val score = rels(c) * l - ms * lm
          if (score > bestScore ||
              (score == bestScore && bestIdx >= 0 && ids(c) < ids(bestIdx))) {
            bestScore = score
            bestIdx = c
          }
        }
        oi += 1
      }
      picked(j) = bestIdx
      pickedScore(j) = bestScore
      used(bestIdx) = true
      j += 1
    }
    val out = new Array[Any](picked.length)
    j = 0
    while (j < picked.length) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any]((j + 1).toLong, ids(picked(j)), pickedScore(j)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(p: Any, e: Any): Any =
    evalSelect(p.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, e) => {
      val self = ctx.addReferenceObj("mmrSelect", this, classOf[MmrSelect].getName)
      s"${ev.value} = $self.evalSelect($p, $e);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MmrSelect =
    copy(pool = newLeft, edges = newRight)
}

/**
 * Row-local KNESER-NEY bigram scoring in one native token scan — the
 * frozen-model twin of `TextAnalysis.knBigramScore` for
 * score-at-ingest streams (st29), exactly as [[BigramLmScore]] twins
 * the add-one scorer. Output `[n_bigrams, kn_nll_unats]`. Unlike the
 * add-one case, an unseen pair's probability depends on BOTH ends
 * (the history's discount mass × the continuation weight of w2), so q
 * is computed per pair from the exact integer num/den the batch side
 * builds — max(4·c2−3,0)·(ct+V) + 3·n1₁·(cont₂+1) over 4·c1₁·(ct+V),
 * pure-continuation fallback at c1=0 — one map probe, a few long
 * multiplies and one ln per bigram. Token boundaries are every space
 * byte, empties included (split-parity).
 */
case class KnLmScore(child: Expression, terms: Array[String],
    c1: Array[Long], n1: Array[Long], cont: Array[Long], ct: Long,
    pairKeys: Array[Long], pairC2: Array[Long], vSize: Long) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(c1.length == terms.length + 1 && n1.length == c1.length &&
    cont.length == c1.length, "KnLmScore: id-indexed arrays must be |vocab|+1")
  require(pairKeys.length == pairC2.length, "KnLmScore: keys vs counts")
  require(vSize >= terms.length + 1L,
    s"KnLmScore: vSize=$vSize < |terms|+1 = ${terms.length + 1}")

  override def prettyName: String = "graft_kn_lm"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val idx = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](
      math.max(4, terms.length * 2))
    var i = 0
    while (i < terms.length) {
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(terms(i)), i + 1)
      i += 1
    }
    m
  }

  @transient private lazy val c2Map = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(4, pairKeys.length * 2))
    var k = 0
    while (k < pairKeys.length) { m.put(pairKeys(k), pairC2(k)); k += 1 }
    m
  }

  private def qPair(id1: Int, id2: Int): Long = {
    val boxed = c2Map.get(id1.toLong * vSize + id2)
    val c2 = if (boxed == null) 0L else boxed.longValue()
    val ctv = ct + vSize
    val (num, den) =
      if (c1(id1) > 0)
        (math.max(4 * c2 - 3, 0L) * ctv + 3L * n1(id1) * (cont(id2) + 1),
          4L * c1(id1) * ctv)
      else (cont(id2) + 1, ctv)
    math.floor(math.log(num.toDouble / den.toDouble) * 1e6 + 0.5).toLong
  }

  /** codegen entry point (public for the generated class). */
  def evalScore(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    var prev = -1
    var n = 0L
    var sum = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val t = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(bytes, start, i - start)
        val boxed = idx.get(t)
        val id = if (boxed == null) 0 else boxed.intValue()
        if (prev >= 0) { sum += qPair(prev, id); n += 1 }
        prev = id
        start = i + 1
      }
      i += 1
    }
    if (n == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](n, -sum / n))
  }

  override protected def nullSafeEval(s: Any): Any =
    evalScore(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("knLm", this, classOf[KnLmScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalScore($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KnLmScore =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case b: KnLmScore => b.child == child && b.terms.toSeq == terms.toSeq &&
      b.c1.toSeq == c1.toSeq && b.n1.toSeq == n1.toSeq &&
      b.cont.toSeq == cont.toSeq && b.ct == ct &&
      b.pairKeys.toSeq == pairKeys.toSeq && b.pairC2.toSeq == pairC2.toSeq &&
      b.vSize == vSize
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + terms.toSeq.hashCode() + c1.toSeq.hashCode()
}

/**
 * Row-local KNESER-NEY **trigram** scoring in one native token scan —
 * the frozen-model twin of `TextAnalysis.knTrigramScore` for
 * score-at-ingest streams (st30), extending [[KnLmScore]] by one
 * backoff level. Output `[n_trigrams, kn3_nll_unats]`. Per trigram the
 * exact integer num/den the batch side builds: the level-2
 * continuation-bigram ratio from (bcf, bch, bn1, cont3, ct, V) type
 * counts, interpolated into the level-3 ratio from (c3, c2h, n1h) —
 * two map probes (trigram key, history key), a few long multiplies and
 * one ln per trigram, zero interpreted HOFs. Token boundaries are
 * every space byte, empties included (split-parity).
 */
case class Kn3LmScore(child: Expression, terms: Array[String],
    histKeys: Array[Long], histC2h: Array[Long], histN1h: Array[Long],
    bch: Array[Long], bn1: Array[Long], cont3: Array[Long], ct: Long,
    triKeys: Array[Long], triC3: Array[Long], vSize: Long) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression with ImplicitCastInputTypes {
  require(bch.length == terms.length + 1 && bn1.length == bch.length &&
    cont3.length == bch.length, "Kn3LmScore: id-indexed arrays must be |vocab|+1")
  require(histKeys.length == histC2h.length && histKeys.length == histN1h.length,
    "Kn3LmScore: history keys vs counts")
  require(triKeys.length == triC3.length, "Kn3LmScore: trigram keys vs counts")
  require(vSize >= terms.length + 1L,
    s"Kn3LmScore: vSize=$vSize < |terms|+1 = ${terms.length + 1}")

  override def prettyName: String = "graft_kn3_lm"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val idx = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](
      math.max(4, terms.length * 2))
    var i = 0
    while (i < terms.length) {
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(terms(i)), i + 1)
      i += 1
    }
    m
  }

  @transient private lazy val triMap = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(4, triKeys.length * 2))
    var k = 0
    while (k < triKeys.length) { m.put(triKeys(k), triC3(k)); k += 1 }
    m
  }

  // history key -> c2h and -> n1h: two parallel maps keep the longs
  // exact with zero bit-packing assumptions
  @transient private lazy val histMapC2h = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(4, histKeys.length * 2))
    var k = 0
    while (k < histKeys.length) { m.put(histKeys(k), histC2h(k)); k += 1 }
    m
  }
  @transient private lazy val histMapN1h = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(4, histKeys.length * 2))
    var k = 0
    while (k < histKeys.length) { m.put(histKeys(k), histN1h(k)); k += 1 }
    m
  }

  private def qTriple(id1: Int, id2: Int, id3: Int): Long = {
    val histKey = id1.toLong * vSize + id2
    val triBoxed = triMap.get(histKey * vSize + id3)
    val c3 = if (triBoxed == null) 0L else triBoxed.longValue()
    val c2hBoxed = histMapC2h.get(histKey)
    val c2h = if (c2hBoxed == null) 0L else c2hBoxed.longValue()
    val n1hBoxed = histMapN1h.get(histKey)
    val n1h = if (n1hBoxed == null) 0L else n1hBoxed.longValue()
    val bcfBoxed = bcfMap.get(id2.toLong * vSize + id3)
    val bcf = if (bcfBoxed == null) 0L else bcfBoxed.longValue()
    val ctv = ct + vSize
    val (num2, den2) =
      if (bch(id2) > 0)
        (math.max(4 * bcf - 3, 0L) * ctv + 3L * bn1(id2) * (cont3(id3) + 1),
          4L * bch(id2) * ctv)
      else (cont3(id3) + 1, ctv)
    val (num3, den3) =
      if (c2h > 0)
        (math.max(4 * c3 - 3, 0L) * den2 + 3L * n1h * num2,
          4L * c2h * den2)
      else (num2, den2)
    math.floor(math.log(num3.toDouble / den3.toDouble) * 1e6 + 0.5).toLong
  }

  /** bcf per (m2,m3) pair type: rebuilt from triKeys at open time (the
    * keys already carry the full type universe, so the artifact ships
    * nothing extra). */
  @transient private lazy val bcfMap = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(4, triKeys.length * 2))
    var k = 0
    while (k < triKeys.length) {
      val pairKey = java.lang.Long.valueOf(triKeys(k) % (vSize * vSize))
      val prev = m.get(pairKey)
      m.put(pairKey, if (prev == null) 1L else prev.longValue() + 1L)
      k += 1
    }
    m
  }

  /** codegen entry point (public for the generated class). */
  def evalScore(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    var prev2 = -1
    var prev1 = -1
    var n = 0L
    var sum = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val t = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(bytes, start, i - start)
        val boxed = idx.get(t)
        val id = if (boxed == null) 0 else boxed.intValue()
        if (prev2 >= 0) { sum += qTriple(prev2, prev1, id); n += 1 }
        prev2 = prev1
        prev1 = id
        start = i + 1
      }
      i += 1
    }
    if (n == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](n, -sum / n))
  }

  override protected def nullSafeEval(s: Any): Any =
    evalScore(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("kn3Lm", this, classOf[Kn3LmScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalScore($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Kn3LmScore =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case b: Kn3LmScore => b.child == child && b.terms.toSeq == terms.toSeq &&
      b.histKeys.toSeq == histKeys.toSeq && b.histC2h.toSeq == histC2h.toSeq &&
      b.histN1h.toSeq == histN1h.toSeq && b.bch.toSeq == bch.toSeq &&
      b.bn1.toSeq == bn1.toSeq && b.cont3.toSeq == cont3.toSeq && b.ct == ct &&
      b.triKeys.toSeq == triKeys.toSeq && b.triC3.toSeq == triC3.toSeq &&
      b.vSize == vSize
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + terms.toSeq.hashCode() + histKeys.toSeq.hashCode()
}
