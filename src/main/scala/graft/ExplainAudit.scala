package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev diagnostic: prints the formatted physical plan of the named
 * queries (or a default audit set) so pushdown/broadcast/codegen can be
 * inspected. Usage: ExplainAudit <sfDir> [queryName...]
 */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier",
        "q02_revenue_forecast", "d03_minhash_pairs", "a01_knn_bruteforce",
        "d08_semantic_dedup", "t14_tfidf_terms", "a06_centroid_classify",
        "k02_salted_join", "p07_pretrain_pipeline",
        "d09_span_dedup", "d11_minhash_estimate", "a10_mips",
        "p05_sequence_packing", "l01_layout_prune")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "--exchanges" as the first query name switches to the one-line-
    // per-query Exchange/Broadcast skeleton — the audit reduced to the
    // lines that matter at 100 TB (every Exchange is a shuffle; model-
    // frame joins must read BroadcastExchange). Full formatted plans
    // otherwise. With no explicit names, "--exchanges" sweeps the
    // WHOLE registry in sorted order — the shape behind the tracked
    // EXCHANGES.txt artifact (regenerate per round:
    //   ExplainAudit <sfDir> --exchanges > EXCHANGES.txt
    // so exchange-count regressions diff mechanically). Streaming
    // harnesses and iterative fits RUN during query construction, so
    // the sweep costs about one Verify pass.
    val (summary, explicitSel) = names.partition(_ == "--exchanges")
    val sel =
      if (summary.nonEmpty && args.length <= 2)
        SparkEntry.queries.keys.toSeq.sorted
      else explicitSel
    // Registry-completeness stamp (r15 verdict task 2): the tracked
    // EXCHANGES.txt header states mechanically whether the sweep
    // covered the whole registry, so a late-landing query can never
    // silently miss the closing artifact again.
    if (summary.nonEmpty)
      println(s"# registry_complete=${sel.size == SparkEntry.queries.size}" +
        s" queries=${sel.size} of ${SparkEntry.queries.size}")
    sel.foreach { n =>
      if (summary.nonEmpty) {
        val counts =
          try {
            val plan = SparkEntry.queries(n)(spark, sfDir)
              .queryExecution.executedPlan.toString
            // ReusedExchange nodes are references to an Exchange
            // counted elsewhere in the plan, not extra shuffles —
            // tallying them would inflate exactly the count this
            // audit is meant to pin
            val ex = plan.linesIterator.map(_.trim)
              .filter(l => l.contains("Exchange") &&
                !l.contains("ReusedExchange"))
              .toSeq
            val shuffles = ex.count(!_.contains("Broadcast"))
            s"$shuffles shuffle Exchange(s), " +
              s"${ex.size - shuffles} BroadcastExchange(s)"
          } catch { case e: Throwable =>
            s"ERROR ${e.getClass.getSimpleName}" }
        println(s"== $n: $counts")
      } else {
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
