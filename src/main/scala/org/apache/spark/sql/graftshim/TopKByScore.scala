package org.apache.spark.sql.graftshim

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k buffer: a worst-first binary heap of (id, score) pairs
 * capped at k entries. "Better" = higher score, ties broken by LOWER id
 * (matching the deterministic `ORDER BY score DESC, id` rank).
 */
final class TopKHeap(val k: Int) {
  private val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](
    // dequeue() removes the max under this ordering = the WORST element
    new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2) // lower score = worse = larger
        if (c != 0) c else java.lang.Long.compare(a._1, b._1) // higher id = worse
      }
    })

  def add(id: Long, score: Double): Unit = {
    if (pq.size < k) pq.enqueue((id, score))
    else {
      val worst = pq.head
      if (score > worst._2 || (score == worst._2 && id < worst._1)) {
        pq.dequeue()
        pq.enqueue((id, score))
      }
    }
  }

  def addAll(other: TopKHeap): Unit = other.elements.foreach(e => add(e._1, e._2))

  def elements: Seq[(Long, Double)] = pq.toSeq

  /** best-first: score desc, id asc. */
  def sorted: Seq[(Long, Double)] =
    elements.sortBy { case (id, score) => (-score, id) }
}

/**
 * `graft_topk(id, score, k)` — native top-k-by-score aggregate.
 *
 * The point at scale: partial aggregation keeps a k-entry heap PER
 * PARTITION (TypedImperativeAggregate serializes the heap between the
 * partial and final stages), so a grouped top-k shuffles only
 * groups×k rows — where the rank()-window formulation shuffles every
 * scored row into the window sort. Returns
 * array<struct<id:bigint, score:double>> sorted best-first.
 */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  private lazy val k: Int = {
    require(kExpr.foldable, "k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"k must be positive, got $v")
    v
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType, IntegerType)
  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.elementType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null)
      buffer.add(id.asInstanceOf[Long], score.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (id, score) =>
      InternalRow(id, score)
    }.toArray[Any])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buffer.elements
    out.writeInt(buffer.k)
    out.writeInt(es.length)
    es.foreach { case (id, score) => out.writeLong(id); out.writeDouble(score) }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { heap.add(in.readLong(), in.readDouble()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKByScore {
  val elementType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
}
