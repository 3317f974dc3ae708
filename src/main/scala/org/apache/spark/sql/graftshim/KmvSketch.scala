package org.apache.spark.sql.graftshim

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * KMV (k-minimum-values) sketch buffer: the k SMALLEST DISTINCT long
 * values seen — a TreeSet capped at k (Bar-Yossef et al. 2002; the
 * DataSketches theta-sketch bottom-k). SET semantics are the point:
 * duplicates collapse on insert, so the buffer is a true distinct-value
 * sketch whatever the input multiplicity, and merge (set union then
 * trim) is commutative, associative, and idempotent — safe as
 * streaming complete-mode state and as a partial-aggregation buffer.
 */
final class KmvBuffer(val k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last()) {
      if (set.add(v)) { set.pollLast(); () }
    }
  }

  def addAll(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next().longValue())
  }

  /** ascending — the bottom-k order statistics. */
  def elements: Seq[Long] = {
    val out = Seq.newBuilder[Long]
    val it = set.iterator()
    while (it.hasNext) out += it.next().longValue()
    out.result()
  }
}

/**
 * `graft_kmv(value, k)` — native bottom-k distinct-value sketch
 * aggregate. Partial aggregation holds one k-entry set per partition
 * and shuffles groups×k longs however many rows flow (the window
 * row_number formulation shuffles and sorts every distinct value);
 * complete-mode streaming state is the same k longs per group.
 * Returns the ascending array<bigint> of the k smallest distinct
 * values (all of them when fewer than k exist — the exact regime).
 */
case class KmvSketchAgg(
    valueExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = {
    require(kExpr.foldable, "k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"k must be positive, got $v")
    v
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)
  override def children: Seq[Expression] = Seq(valueExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = valueExpr.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(buffer.elements.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buffer.elements
    out.writeInt(buffer.k)
    out.writeInt(es.length)
    es.foreach(out.writeLong)
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1))
}
