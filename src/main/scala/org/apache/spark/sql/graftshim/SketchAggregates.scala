package org.apache.spark.sql.graftshim

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Deterministic splitmix64-seeded `(a, b)` pairs for the universal hash
 * family `h_i(x) = (a_i·x + b_i) mod P31` — the single source of truth
 * shared by the Spark aggregates and the literal tables embedded in the
 * DuckDB oracle SQL.
 */
object UniversalHash {
  /** Large prime < 2^31. */
  val P = 2147483647L

  def coefficients(n: Int, seed: Long): Array[(Long, Long)] = {
    var x = seed
    def next(): Long = { // splitmix64
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(n)((math.abs(next()) % (P - 1) + 1, math.abs(next()) % P))
  }
}

/**
 * `graft_minhash(h32, numHashes, seed)` — all MinHash minima in ONE
 * native aggregate: the buffer is a single long[numHashes] and each
 * input row updates it in a tight JVM loop. The equivalent
 * 128-column `min(...)` formulation forces whole-stage codegen to emit
 * (and Janino to compile) a 128-buffer aggregate class whose first-call
 * compilation costs more than the query; this aggregate is one small
 * class, same math, same map-side partial aggregation (the buffer
 * serializes as numHashes longs between partial and final).
 *
 * The permutation family is the standard two-hash scheme (Kirsch &
 * Mitzenmacher 2006): hᵢ(x) = (h₁(x) + i·h₂(x)) mod P with h₁/h₂ the
 * first two splitmix-seeded universal hashes — 2 multiplies + an
 * add-and-conditional-subtract per i, instead of numHashes independent
 * (aᵢ·x + bᵢ) mod P evaluations (a multiply + mod per i): ~4× less
 * work on the per-shingle hot path, same pairwise-independence
 * guarantee the LSH analysis needs. The DuckDB oracle replays the
 * identical (h₁ + i·h₂) mod P integers.
 *
 * SIGNATURE FORMAT v2 (two-hash family; v1 was k independent
 * universal hashes). v2 signatures are NOT comparable with v1:
 * every emitted coordinate changed, so persisted v1 signature
 * frames and running DedupStream checkpoints written before the
 * switch must be regenerated, never mixed with v2 output — a
 * mixed-version Jaccard estimate is silently meaningless. Pipelines
 * that persist signatures should stamp them with
 * [[MinHashAgg.SignatureFormatVersion]]. Within one version the
 * coordinates are deterministic in (input, numHashes, seed).
 * Trade-off vs v1: coordinates are pairwise-correlated across i
 * (standard practice; the Kirsch–Mitzenmacher result shows the
 * LSH collision analysis is unaffected).
 */
case class MinHashAgg(
    hashExpr: Expression,
    numHashesExpr: Expression,
    seedExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  private lazy val numHashes: Int = {
    require(numHashesExpr.foldable, "numHashes must be a literal")
    numHashesExpr.eval().asInstanceOf[Int]
  }
  private lazy val seed: Long = {
    require(seedExpr.foldable, "seed must be a literal")
    seedExpr.eval().asInstanceOf[Long]
  }
  @transient private lazy val coeffs: Array[(Long, Long)] =
    UniversalHash.coefficients(2, seed)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType, LongType)
  override def children: Seq[Expression] = Seq(hashExpr, numHashesExpr, seedExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val x = h.asInstanceOf[Long]
      val P = UniversalHash.P
      val h1 = (coeffs(0)._1 * x + coeffs(0)._2) % P
      val h2 = (coeffs(1)._1 * x + coeffs(1)._2) % P
      // hᵢ = (h1 + i·h2) mod P, built incrementally: v stays in [0, P)
      // so one conditional subtract replaces the per-i modulo
      var v = h1
      var i = 0
      while (i < buffer.length) {
        if (v < buffer(i)) buffer(i) = v
        v += h2
        if (v >= P) v -= P
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeLong)
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(hashExpr = newChildren(0), numHashesExpr = newChildren(1),
      seedExpr = newChildren(2))
}

object MinHashAgg {
  /** Version tag for persisted signature frames / stream checkpoints.
    * Bumped 1 → 2 when the permutation family switched from k
    * independent universal hashes to Kirsch–Mitzenmacher two-hash
    * (see class doc): signatures across versions are incomparable. */
  val SignatureFormatVersion: Int = 2
}

/**
 * `graft_simhash(h, bits)` — SimHash bit-majority vote as one native
 * aggregate: the buffer is an int[bits] vote array (repeated elements
 * vote repeatedly — multiset semantics), packed on eval into a long
 * with bit i set iff votes(i) > 0. Replaces a `bits`-column
 * conditional-sum aggregate for the same codegen-size reason as
 * [[MinHashAgg]].
 */
case class SimHashAgg(
    hashExpr: Expression,
    bitsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with ImplicitCastInputTypes {

  private lazy val bits: Int = {
    require(bitsExpr.foldable, "bits must be a literal")
    val b = bitsExpr.eval().asInstanceOf[Int]
    require(b >= 1 && b <= 63, s"bits must be in [1, 63], got $b")
    b
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)
  override def children: Seq[Expression] = Seq(hashExpr, bitsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val x = h.asInstanceOf[Long]
      var i = 0
      while (i < buffer.length) {
        buffer(i) += (if (((x >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sim = 0L
    var i = 0
    while (i < buffer.length) {
      if (buffer(i) > 0) sim |= (1L << i)
      i += 1
    }
    sim
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeInt)
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hashExpr = newChildren(0), bitsExpr = newChildren(1))
}

/**
 * `graft_hll(h, p, hashBits)` — HyperLogLog distinct-count sketch as
 * one native aggregate over an ENGINE-PORTABLE hash, which makes even
 * the approximation ORACLE-CHECKABLE: registers, the power-of-two
 * harmonic sum (accumulated in ascending bucket order in both engines)
 * and the linear-counting correction are all deterministic functions of
 * the hash values, so DuckDB reproduces the exact estimate.
 *
 * The input must be an AVALANCHE-QUALITY hash of `hashBits` uniform
 * bits — in practice the first 13 hex chars of md5 (52 bits), which
 * both engines compute identically (`VectorExpressions.md5Hash52`).
 * The cheap polynomial rolling hash that drives MinHash/SimHash is NOT
 * suitable here: its leading-zero statistics are correlated for
 * similar strings (measured 5× estimate bias), and affine rescrambles
 * mod a prime don't fix it — HLL reads exactly the bit statistics a
 * non-avalanche hash distorts.
 *
 * Buffer = 2^p byte registers (p=12 → 4 KB), map-side partial merge is
 * elementwise max — the shuffle carries one fixed 4 KB buffer per
 * group per task regardless of input rows, the entire point of a
 * sketch at 100 TB. Standard HLL (Flajolet et al. 2007): bucket = low
 * p bits, rho = position of the first 1-bit in the remaining
 * hashBits−p bits, estimate = α·m²/Σ2^−M with linear counting below
 * 2.5m.
 */
case class HllAgg(
    hashExpr: Expression,
    pExpr: Expression,
    hashBitsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  private lazy val p: Int = {
    require(pExpr.foldable, "p must be a literal")
    val v = pExpr.eval().asInstanceOf[Int]
    require(v >= 7 && v <= 18, s"p must be in [7, 18], got $v")
    v
  }
  private lazy val m: Int = 1 << p
  private lazy val hashBits: Int = {
    require(hashBitsExpr.foldable, "hashBits must be a literal")
    val v = hashBitsExpr.eval().asInstanceOf[Int]
    require(v > p && v <= 62, s"hashBits must be in (p, 62], got $v")
    v
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType, IntegerType)
  override def children: Seq[Expression] = Seq(hashExpr, pExpr, hashBitsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val x = h.asInstanceOf[Long]
      val b = (x & (m - 1)).toInt
      val w = x >>> p // hashBits - p significant bits
      val wBits = hashBits - p
      // rho = index (1-based) of the first set bit scanning from the
      // wBits-wide window's top; all-zero window -> wBits + 1
      val rho =
        if (w == 0L) wBits + 1
        else wBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buffer(b)) buffer(b) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    // ascending-bucket accumulation: the DuckDB oracle sums the same
    // ordered list, so the IEEE result is bit-identical
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      z += java.lang.Math.pow(2.0, -buffer(i).toDouble)
      if (buffer(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m.toDouble * m.toDouble / z
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(hashExpr = newChildren(0), pExpr = newChildren(1),
      hashBitsExpr = newChildren(2))
}

/**
 * `graft_cms(h32, depth, width, seed)` — Count-Min frequency sketch as
 * one native aggregate: `depth` rows of `width` long counters
 * (depth=5, width=8192 → 320 KB), each input row increments one
 * counter per sketch row at `((aᵢ·h₃₂ + bᵢ) mod P31) mod width` using
 * the SAME splitmix-seeded universal family as MinHash. Merge is
 * elementwise add, so partial aggregation ships one fixed-size buffer
 * per group per task — frequency estimation at 100 TB cost.
 *
 * Point estimates (min over rows) are computed OUTSIDE the aggregate
 * with plain column arithmetic over the returned counter array
 * (`least(element_at...)` per row — see `TextQueries.t11`), and since
 * every step is deterministic integer math, DuckDB reproduces the
 * ESTIMATES bit-for-bit: an oracle-checkable approximation, like
 * [[HllAgg]].
 */
case class CmsAgg(
    hashExpr: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    seedExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  private lazy val depth: Int = {
    require(depthExpr.foldable, "depth must be a literal")
    val v = depthExpr.eval().asInstanceOf[Int]
    require(v >= 1 && v <= 16, s"depth must be in [1, 16], got $v")
    v
  }
  private lazy val width: Int = {
    require(widthExpr.foldable, "width must be a literal")
    val v = widthExpr.eval().asInstanceOf[Int]
    require(v >= 16, s"width must be >= 16, got $v")
    v
  }
  private lazy val seed: Long = {
    require(seedExpr.foldable, "seed must be a literal")
    seedExpr.eval().asInstanceOf[Long]
  }
  @transient private lazy val coeffs: Array[(Long, Long)] =
    UniversalHash.coefficients(depth, seed)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, IntegerType, IntegerType, LongType)
  override def children: Seq[Expression] =
    Seq(hashExpr, depthExpr, widthExpr, seedExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val x = h.asInstanceOf[Long] & 0xffffffffL
      var i = 0
      while (i < depth) {
        val b = (((coeffs(i)._1 * x + coeffs(i)._2) % UniversalHash.P) % width).toInt
        buffer(i * width + b) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeLong)
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(hashExpr = newChildren(0), depthExpr = newChildren(1),
      widthExpr = newChildren(2), seedExpr = newChildren(3))
}

/**
 * Mergeable KLL quantile-sketch state (Karnin–Lang–Liberty 2016, the
 * simplified compactor-stack form): items at level i carry weight 2^i;
 * a level over capacity sorts, keeps every other item (alternating
 * offset) and promotes the survivors one level up. Capacities decay
 * geometrically (ratio 2/3) below the top level, so total retained
 * items are O(k·log(n/k)) and rank error is O(1/k) — the property that
 * makes percentile aggregation shuffle kilobytes, not rows, at 100 TB.
 */
final class KllState(val k: Int) extends Serializable {
  import scala.collection.mutable.ArrayBuffer
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  var flip: Boolean = false // alternating compaction offset (debiases)

  private def capacity(lvl: Int): Int =
    math.max(KllState.MinCap,
      math.ceil(k * math.pow(2.0 / 3.0, (levels.length - 1 - lvl).toDouble)).toInt)

  private def totalItems: Int = { var s = 0; levels.foreach(s += _.length); s }
  private def totalCap: Int = { var s = 0; var i = 0; while (i < levels.length) { s += capacity(i); i += 1 }; s }

  def insert(x: Double): Unit = { levels(0) += x; compress() }

  def mergeWith(other: KllState): Unit = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) { levels(i) ++= other.levels(i); i += 1 }
    flip ^= other.flip
    compress()
  }

  def compress(): Unit = {
    var guard = 0
    while (totalItems > totalCap && guard < 64) {
      // compact the LOWEST level over its capacity (cheapest sort, and
      // low levels fill first); if none is over, capacities hold
      var lvl = -1
      var i = 0
      while (lvl < 0 && i < levels.length) {
        if (levels(i).length > capacity(i)) lvl = i
        i += 1
      }
      if (lvl < 0) return
      val sorted = levels(lvl).sorted
      val offset = if (flip) 1 else 0
      flip = !flip
      if (lvl + 1 == levels.length) levels += ArrayBuffer.empty[Double]
      var j = offset
      while (j < sorted.length) { levels(lvl + 1) += sorted(j); j += 2 }
      levels(lvl).clear()
      guard += 1
    }
  }

  /** Estimated values at the given cumulative probabilities. */
  def quantiles(probs: Array[Double]): Array[Double] = {
    val entries = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      levels(i).foreach(x => entries += ((x, 1L << i)))
      i += 1
    }
    if (entries.isEmpty) return probs.map(_ => Double.NaN)
    val sorted = entries.sortBy(_._1)
    val w = sorted.iterator.map(_._2).sum
    probs.map { q =>
      val target = q * w
      var cum = 0L
      var idx = 0
      while (idx < sorted.length - 1 && cum + sorted(idx)._2 < target) {
        cum += sorted(idx)._2; idx += 1
      }
      sorted(idx)._1
    }
  }
}

object KllState {
  val MinCap = 8

  /** Byte form shared by the aggregate buffer and streaming state. */
  def toBytes(st: KllState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(st.k)
    out.writeBoolean(st.flip)
    out.writeInt(st.levels.length)
    st.levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeDouble)
    }
    out.close()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): KllState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new KllState(in.readInt())
    st.flip = in.readBoolean()
    val nLevels = in.readInt()
    while (st.levels.length < nLevels) st.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < nLevels) {
      var n = in.readInt()
      while (n > 0) { st.levels(i) += in.readDouble(); n -= 1 }
      i += 1
    }
    st
  }
}

/**
 * `graft_kll(x, k, probs)` — streaming/mergeable quantile estimates as
 * ONE native aggregate: the buffer is a [[KllState]] compactor stack
 * (O(k·log n) doubles, k=200 ≈ a few KB at any input size), partial
 * buffers merge level-wise — percentiles over a group cost a bounded
 * buffer per task where exact `percentile` sorts every row of the
 * group. Estimates are rank-accurate to ~1/k; NOT oracle-reproducible
 * (compaction depends on arrival order), so queries over it are
 * rows-only checked and the error bound is spec-asserted instead.
 */
case class KllAgg(
    xExpr: Expression,
    kExpr: Expression,
    probsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] with ImplicitCastInputTypes {

  private lazy val kParam: Int = {
    require(kExpr.foldable, "k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v >= 16 && v <= 65536, s"k must be in [16, 65536], got $v")
    v
  }
  private lazy val probs: Array[Double] = {
    require(probsExpr.foldable, "probs must be a literal array")
    probsExpr.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
  }

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, IntegerType, ArrayType(DoubleType))
  override def children: Seq[Expression] = Seq(xExpr, kExpr, probsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllState = new KllState(kParam)

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val x = xExpr.eval(input)
    if (x != null) buffer.insert(x.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllState, other: KllState): KllState = {
    buffer.mergeWith(other); buffer
  }

  override def eval(buffer: KllState): Any =
    new GenericArrayData(buffer.quantiles(probs))

  override def serialize(buffer: KllState): Array[Byte] = KllState.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): KllState = KllState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAgg =
    copy(xExpr = newChildren(0), kExpr = newChildren(1), probsExpr = newChildren(2))
}
