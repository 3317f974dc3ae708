package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One named query: a Spark implementation plus (when SQL-expressible)
 * an equivalent ANSI SQL text the driver runs in DuckDB as the oracle.
 *
 * Contract notes (see SURVEY.md §3):
 *  - Output column names MUST match between `run` and `oracle`.
 *  - Float-bearing outputs are rounded identically on both sides.
 *  - Result sets are fully deterministic (total order before any limit).
 */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Run `body` — typically a streaming-query `.start()` — with the
    * session's shuffle partitions pinned to 4, the streaming-HARNESS
    * state-partition cap: every MemoryStream harness here holds at
    * most a handful of state rows, and 32 state stores per
    * micro-batch were pure commit constant (the r13 idle-drift
    * finding; restored in a finally so a failed start cannot leak the
    * cap into the surrounding batch queries). */
  def withHarnessPartitions[T](s: SparkSession)(body: => T): T = {
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", saved)
  }

  /** All registered queries, in stable order. */
  def all: Seq[Q] =
    Relational.queries ++ Relational2.queries ++ Windows.queries ++ Windows2.queries ++
      Events.queries ++ Survival.queries ++
      TextQueries.queries ++ CorpusOps.queries ++ CorpusOps2.queries ++
      CorpusOps3.queries ++ UnigramQueries.queries ++ WordPieceQueries.queries ++
      ByteBpeQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      GPQueries.queries ++ MultimodalQueries.queries ++ PlanQueries.queries ++
      GraphQueries.queries
}
