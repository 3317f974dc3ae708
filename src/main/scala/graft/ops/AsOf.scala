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

    // The whole right row travels as ONE nullable struct, and the match
    // is a single last(ignoreNulls) over it — per-column lasts would mix
    // payload values from different right rows whenever a payload field
    // is itself NULL.
    val matchStruct = "__asof_match"
    val structType = struct(col(timeCol).as("__t") +: payloadCols.map(col): _*)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn(matchStruct, lit(null).cast(
        right.select(structType).schema.head.dataType))
      .select(Seq(col(keyCol), col(timeCol), col("__side"), col(matchStruct)) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col): _*)
    val r = right
      .withColumn("__side", lit(0))
      .withColumn(matchStruct, structType)
      .select(Seq(col(keyCol), col(timeCol), col("__side"), col(matchStruct)) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort before left rows at equal time, so `<=` matches;
    // ties among right rows resolve by the first payload field.
    val ord = Seq(col(timeCol), col("__side")) ++
      payloadCols.headOption.map(c => col(matchStruct).getField(c))
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val resolved = l.unionByName(r)
      .withColumn("__m", last(col(matchStruct), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = tolerance match {
      case Some(tol) =>
        col("__m").isNotNull &&
          col(timeCol).cast("long") - col("__m.__t").cast("long") <= tol.cast("long")
      case None => col("__m").isNotNull
    }
    val out = payloadCols.foldLeft(resolved) { (df, c) =>
      df.withColumn(c, when(withinTol, col(s"__m.$c")))
    }
    out.select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
