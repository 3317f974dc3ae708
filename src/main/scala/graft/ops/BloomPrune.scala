package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bloom-filter join pruning: build a bloom filter over the (small,
 * already-filtered) build side's join key, broadcast it, and drop probe
 * rows that cannot join BEFORE they reach the shuffle/join. False
 * positives survive to the exact join that follows (which removes
 * them), false negatives are impossible — so `prune + exact join` is
 * result-identical to the plain join while shuffling only roughly the
 * selectivity fraction of the probe side. This is the manual,
 * plan-visible twin of Spark's runtime bloom rewrite
 * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), usable where the
 * optimizer's size heuristics decline (or the build side is an
 * arbitrary computed frame).
 */
object BloomPrune {

  /**
   * Probe rows whose long `probeKey` might be present among
   * `build.buildKey` values. `expectedKeys`/`fpp` size the filter:
   * ~1.2 MB per million keys at 1% — model-sized, broadcast once.
   */
  def filterByKeys(probe: DataFrame, probeKey: String, build: DataFrame, buildKey: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    // native probe expression: stays inside whole-stage codegen; a
    // Scala UDF here boxes every probe-side key pre-shuffle
    import org.apache.spark.sql.graftshim.{BloomMightContain, ColumnBridge}
    probe.filter(ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(col(probeKey).cast("long")), bc)))
  }
}
