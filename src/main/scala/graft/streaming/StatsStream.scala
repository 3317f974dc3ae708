package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.graftshim.KllState
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming twin of the t12 KLL quantile sketch: per-key running
 * quantile estimates over an unbounded measure stream.
 *
 * State per key is ONE serialized KLL compactor stack — O(k·log n)
 * doubles regardless of stream length — so a year of per-language
 * document-length telemetry costs the same state as a day. Each
 * micro-batch folds its values into the sketch and emits the key's
 * refreshed estimates (use OutputMode.Update). Estimates carry the
 * same ~1/k normalized-rank error contract as the batch `graft_kll`
 * aggregate, and the sketch bytes are shared verbatim with it
 * (`KllState.toBytes`/`fromBytes`), so a streaming state snapshot can
 * seed a batch aggregation and vice versa.
 */
object StatsStream {

  final case class Measure(key: String, x: Double)

  final case class QuantileEstimate(
      key: String, n: Long, p50: Double, p90: Double, p99: Double)

  /** Sketch bytes + exact running count (the count is free and makes
    * the emitted estimate self-describing). */
  final case class KllBuf(bytes: Array[Byte], n: Long)

  def runningQuantiles(measures: Dataset[Measure], k: Int = 200): Dataset[QuantileEstimate] = {
    import measures.sparkSession.implicits._
    measures.groupByKey(_.key)
      .mapGroupsWithState[KllBuf, QuantileEstimate](GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val (st, n0) = state.getOption
            .map(b => (KllState.fromBytes(b.bytes), b.n))
            .getOrElse((new KllState(k), 0L))
          var n = n0
          rows.foreach { m => st.insert(m.x); n += 1 }
          state.update(KllBuf(KllState.toBytes(st), n))
          val q = st.quantiles(Array(0.5, 0.9, 0.99))
          QuantileEstimate(key, n, q(0), q(1), q(2))
      }
  }
}
