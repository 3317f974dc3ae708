package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the LATEST right row with
 * `right.time <= left.time` within the same key (the standard
 * event-log / market-data join Spark lacks natively).
 *
 * Built by COMPOSITION, per graft's operator preference order: tag the
 * two inputs, union them, and resolve matches with one
 * `last(_, ignoreNulls)` running window over (key, time, side) — a
 * single shuffle on the key, sort within partitions, no custom
 * physical operator. At 100 TB this is exactly the plan a bespoke
 * SparkPlan would produce (exchange + sort + linear scan), so the
 * declarative form wins and stays AQE/codegen-friendly.
 */
object AsOf {

  /**
   * @param left        probe side; all its columns are kept
   * @param right       reference side
   * @param keyCol      equi-join key present in both inputs
   * @param timeCol     event-time column present in both inputs
   * @param payloadCols right columns to attach (null when no match);
   *                    names must not collide with left's columns
   * @param tolerance   optional max (left.time − right.time); matches
   *                    farther in the past are nulled out
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      payloadCols: Seq[String], tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.contains(keyCol) && !leftCols.exists(payloadCols.contains),
      s"payload columns $payloadCols must not collide with left columns")

    val matchTime = "__asof_time"
    val l = left
      .withColumn("__side", lit(1))
      .withColumn(matchTime, lit(null).cast(right.schema(timeCol).dataType))
      .select(Seq(col(keyCol), col(timeCol), col("__side"), col(matchTime)) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col): _*)
    val r = right
      .withColumn("__side", lit(0))
      .withColumn(matchTime, col(timeCol))
      .select(Seq(col(keyCol), col(timeCol), col("__side"), col(matchTime)) ++
        payloadCols.map(col) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort before left rows at equal time, so `<=` matches;
    // ties among right rows resolve by the first payload column.
    val ord = Seq(col(timeCol), col("__side")) ++ payloadCols.headOption.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val resolved = l.unionByName(r)
      .select(
        col("*") +:
          (matchTime +: payloadCols).map(c =>
            last(col(c), ignoreNulls = true).over(w).as(s"__m_$c")): _*)
      .filter(col("__side") === 1)

    val withinTol = tolerance match {
      case Some(tol) =>
        col(s"__m_$matchTime").isNotNull &&
          col(timeCol).cast("long") - col(s"__m_$matchTime").cast("long") <= tol.cast("long")
      case None => col(s"__m_$matchTime").isNotNull
    }
    val out = payloadCols.foldLeft(resolved) { (df, c) =>
      df.withColumn(c, when(withinTol, col(s"__m_$c")))
    }
    out.select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
