package org.apache.spark.sql.graftshim

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/**
 * Grouped top-k as a first-class operator: for every group keep the `k`
 * rows with the highest `score`, ties broken by the LOWEST `tie` value
 * — the semantics of `row_number() OVER (PARTITION BY g ORDER BY score
 * DESC, tie) <= k`, but with a physical plan built for scale.
 *
 * The window form sorts every row of every group (full shuffle + sort,
 * memory ∝ group size). This operator plans as TWO heap passes: a
 * partial pass runs before the exchange and reduces each map partition
 * to ≤ k rows per group (top-k-of-top-k is top-k, so this is a lossless
 * map-side combine), then the exchange carries only the survivors and a
 * final pass merges them — shuffle volume O(partitions × groups × k)
 * instead of O(rows), no sort anywhere, memory O(groups × k) per task.
 *
 * Whole pipeline: logical node + optimizer rule (adjacent collapses) +
 * strategy + exec pair, injected per-session via
 * `spark.experimental`; `graft.plans.TopK.perGroup` is the public API.
 */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    scoreExpr: Expression,
    tieExpr: Expression,
    k: Int,
    child: LogicalPlan,
    quotaExpr: Option[Expression] = None) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/**
 * Optimizer rule: `TopK(k1) over TopK(k2)` with identical keys/ranking
 * is the single `TopK(min(k1, k2))` — the composition users get when a
 * parameterized view is re-limited.
 */
object CollapseTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case TopKPerGroup(g1, s1, t1, k1, TopKPerGroup(g2, s2, t2, k2, child, None), None)
        if g1.length == g2.length &&
          g1.zip(g2).forall { case (a, b) => a.semanticEquals(b) } &&
          s1.semanticEquals(s2) && t1.semanticEquals(t2) =>
      TopKPerGroup(g1, s1, t1, math.min(k1, k2), child)
  }
}

/**
 * Optimizer rule: rewrite the declarative top-k idiom
 *
 *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(
 *       score.desc, tie))).filter($"rn" <= k).drop("rn")
 *
 * into the native [[TopKPerGroup]] operator, so existing window-based
 * queries get the heap plan (no sort, O(groups×k) shuffle) without
 * being rewritten by hand. Guards keep the rewrite semantics-exact:
 *  - single row_number window expression, ranked (score DESC, tie ASC)
 *    — the operator's ordering contract;
 *  - score numeric with default DESC null ordering (NullsLast — the
 *    operator ranks null scores last); tie an integral, non-nullable
 *    column (the operator would rank null ties last, default ASC sorts
 *    them first);
 *  - the rank attribute is dropped by the projection above the filter
 *    (the operator does not emit a rank column);
 *  - the filter is `rn <= k` / `rn < k` / `rn = 1` with a literal k.
 */
object RewriteWindowTopK extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, And => _, Attribute => CAttribute, EqualTo, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window, WindowGroupLimit}
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, NumericType, ShortType}

  private def limitOf(cond: Expression, rn: CAttribute): Option[Int] = cond match {
    case LessThanOrEqual(a: CAttribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: CAttribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: CAttribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
            partitionSpec, orderSpec, child, _)))
        if orderSpec.length == 2 && {
          val rn = alias.toAttribute
          val Seq(first, second) = orderSpec
          limitOf(cond, rn).exists(_ >= 1) &&
            !projList.exists(_.references.contains(rn)) &&
            projList.forall(_.references.subsetOf(child.outputSet)) &&
            first.direction == org.apache.spark.sql.catalyst.expressions.Descending &&
            first.nullOrdering == org.apache.spark.sql.catalyst.expressions.NullsLast &&
            first.child.dataType.isInstanceOf[NumericType] &&
            second.direction == org.apache.spark.sql.catalyst.expressions.Ascending &&
            integral(second.child.dataType) && !second.child.nullable
        } =>
      val k = limitOf(cond, alias.toAttribute).get
      // Spark's InferWindowGroupLimit may already have slid a
      // (sort-based) WindowGroupLimit under this very window; the heap
      // operator subsumes it, so unwrap rather than sort twice. The
      // unwrap is only lossless when the node keeps at least the k rows
      // we keep and ranks them like row_number — matched structurally
      // (limit >= k, RowNumber) so safety doesn't depend on HOW the
      // node got there.
      val input = child match {
        case WindowGroupLimit(p, o, _: RowNumber, limit, grandchild)
            if limit >= k &&
              p.length == partitionSpec.length &&
              p.zip(partitionSpec).forall { case (a, b) => a.semanticEquals(b) } &&
              o.length == orderSpec.length &&
              o.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } =>
          grandchild
        case other => other
      }
      Project(projList.asInstanceOf[Seq[NamedExpression]],
        TopKPerGroup(partitionSpec, orderSpec.head.child, orderSpec(1).child, k, input))
  }
}

/** Plans the logical node as partial-then-final exec pair; the final's
  * required distribution makes EnsureRequirements insert the exchange
  * between them. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, s, t, k, child, quota) =>
      TopKPerGroupExec(g, s, t, k, partial = false,
        TopKPerGroupExec(g, s, t, k, partial = true, planLater(child), quota),
        quota) :: Nil
    case _ => Nil
  }
}

/**
 * Worst-first bounded heap of (score, tie, row); better = higher score
 * under `scoreOrd` (Spark's interpreted ordering for the score's OWN
 * type — longs compare exactly instead of through a lossy double cast,
 * and NaN ranks largest like a window's ORDER BY DESC), then lower tie
 * under `tieOrd` — the tie too compares in its OWN type (a fractional
 * or string tie is never squeezed through a lossy/throwing cast). Null
 * scores and null ties both rank below every non-null value.
 */
private[graftshim] final class BoundedRowHeap(
    k: Int, scoreOrd: Ordering[Any], tieOrd: Ordering[Any]) {

  /** desc-null-last score comparison: positive when a ranks better. */
  private def cmpScore(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else scoreOrd.compare(a, b)

  /** asc-null-last tie comparison: positive when a ranks better. */
  private def cmpTie(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else tieOrd.compare(b, a) // lower tie = better

  private val pq = scala.collection.mutable.PriorityQueue.empty[(Any, Any, InternalRow)](
    new Ordering[(Any, Any, InternalRow)] {
      def compare(a: (Any, Any, InternalRow), b: (Any, Any, InternalRow)): Int = {
        val c = cmpScore(b._1, a._1) // lower score = worse = max of pq
        if (c != 0) c else cmpTie(b._2, a._2) // worse tie = max of pq
      }
    })

  def add(score: Any, tie: Any, row: => InternalRow): Unit = {
    if (k <= 0) () // zero-quota group: retain nothing
    else if (pq.size < k) pq.enqueue((score, tie, row))
    else {
      val worst = pq.head
      val c = cmpScore(score, worst._1)
      if (c > 0 || (c == 0 && cmpTie(tie, worst._2) > 0)) {
        pq.dequeue()
        pq.enqueue((score, tie, row))
      }
    }
  }

  /** Rows ranked best-first (score desc, tie asc). */
  def sorted: Iterator[InternalRow] =
    pq.toIndexedSeq.sortWith { (a, b) =>
      val c = cmpScore(a._1, b._1)
      if (c != 0) c > 0 else cmpTie(a._2, b._2) > 0
    }.iterator.map(_._3)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    scoreExpr: Expression,
    tieExpr: Expression,
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    quotaExpr: Option[Expression] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val sExpr = scoreExpr // native types — longs must compare exactly,
    val tExpr = tieExpr   // fractional ties must not truncate
    val scoreType = scoreExpr.dataType
    val tieType = tieExpr.dataType
    val kk = k
    val qExpr = quotaExpr
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val score = BindReferences.bindReference(sExpr, childOutput)
      val tie = BindReferences.bindReference(tExpr, childOutput)
      val quota = qExpr.map(BindReferences.bindReference(_, childOutput))
      val scoreOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(scoreType)
      val tieOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(tieType)
      val groups = new java.util.LinkedHashMap[UnsafeRow, BoundedRowHeap]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = groups.get(key)
        if (heap == null) {
          // Per-group capacity: min(k, quota(row)). The quota column is
          // required to be group-constant (it is joined/derived from
          // the group key), so evaluating it on the group's FIRST row
          // is the group's quota; a null quota means "no per-group
          // override" and falls back to k. Quota <= 0 keeps nothing.
          val cap = quota match {
            case Some(q) => q.eval(row) match {
              case null => kk
              case n: java.lang.Number => math.min(kk, n.intValue())
              case other => throw new IllegalStateException(
                s"non-numeric quota value: $other")
            }
            case None => kk
          }
          heap = new BoundedRowHeap(cap, scoreOrd, tieOrd)
          groups.put(key.copy(), heap)
        }
        // COPY evaluated values before retaining them: the input rows
        // come from a reused buffer (shuffle readers recycle one
        // UnsafeRow), so a retained UTF8String/Decimal/array tie would
        // silently mutate to the latest row's bytes. copyValue deep-
        // copies buffer-backed types and passes primitives through.
        // Null score and null tie both rank last inside the heap.
        heap.add(
          InternalRow.copyValue(score.eval(row)),
          InternalRow.copyValue(tie.eval(row)),
          toUnsafe(row).copy())
      }
      groups.values.iterator.asScala.flatMap(_.sorted)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Session-side plumbing for the operator (classic-API access). */
object TopKPerGroupApi {

  /** Idempotently inject strategy + optimizer rule into a live session. */
  def ensureInjected(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    if (!exp.extraOptimizations.contains(CollapseTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ CollapseTopK
    if (!exp.extraOptimizations.contains(RewriteWindowTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteWindowTopK
  }

  def perGroup(df: DataFrame, groupCols: Seq[Column], score: Column, tie: Column,
      k: Int): DataFrame =
    build(df, groupCols, score, tie, k, quota = None)

  /** Per-group data-driven capacity: keep `min(k, quota)` rows per
    * group, where `quota` is an integral column CONSTANT WITHIN each
    * group (typically broadcast-joined from a model-sized quota table
    * keyed on the group columns). Null quota falls back to `k`;
    * quota <= 0 drops the group. */
  def perGroupQuota(df: DataFrame, groupCols: Seq[Column], score: Column, tie: Column,
      quota: Column, maxK: Int): DataFrame =
    build(df, groupCols, score, tie, maxK, quota = Some(quota))

  private def build(df: DataFrame, groupCols: Seq[Column], score: Column, tie: Column,
      k: Int, quota: Option[Column]): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    ensureInjected(spark)
    // Spark 4 Columns carry unresolved column nodes; resolve them by
    // analyzing a throwaway projection over the frame, then build the
    // node from the analyzed expressions (aliases unwrapped) against
    // that projection's child.
    val probe = df.select(groupCols ++ Seq(score, tie) ++ quota.toSeq: _*)
      .queryExecution.analyzed.asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val exprs = probe.projectList.map {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    require(exprs(groupCols.length).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"TopK score must be numeric, got ${exprs(groupCols.length).dataType}")
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(exprs(groupCols.length + 1).dataType),
      s"TopK tie column must be orderable, got ${exprs(groupCols.length + 1).dataType}")
    val quotaExpr = quota.map { _ =>
      val e = exprs(groupCols.length + 2)
      require(Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(e.dataType), s"TopK quota must be integral, got ${e.dataType}")
      e
    }
    classic.Dataset.ofRows(spark, TopKPerGroup(
      exprs.take(groupCols.length),
      exprs(groupCols.length),
      exprs(groupCols.length + 1),
      k, probe.child, quotaExpr))
  }
}
