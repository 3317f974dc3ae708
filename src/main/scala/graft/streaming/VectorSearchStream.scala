package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming vector search (ANN SERVING) — the online leg every
 * retrieval/RAG ingest pipeline runs beside its batch index builds: a
 * stream of query vectors probes a FROZEN IVF index (a05/l03's
 * deterministic centers) and emits shard-local top-k candidates, with
 * the tiny cross-shard merge left to the consumer — exactly the
 * shard-then-coordinator split FAISS/Milvus-style serving uses.
 *
 * Why this decomposition: a per-query global top-k would be a streaming
 * AGGREGATION (state store + watermark, and append mode would hold
 * results until watermark passage). Shard-local pruning instead runs
 * entirely INSIDE each joined row — probe cells come from the native
 * `CellProbes` expression against broadcast centers, the probed cell's
 * inverted list is scored and truncated with row-local higher-order
 * functions — so the whole streaming plan is a STATELESS append
 * (explode → stream-static equi-join → narrow projection; zero state
 * store entries, spec-asserted), and the merge the consumer performs is
 * per-query × nprobe × k rows, model-sized however large the corpus.
 * Merging shard-local top-k loses nothing: top-k of a union equals
 * top-k of the union of per-shard top-ks.
 *
 * 100 TB posture: the inverted lists ARE IVF's physical layout (FAISS
 * keeps exactly one contiguous member array per cell; l03 materializes
 * the same thing as one partition directory per cell), sized by nlist —
 * production uses nlist ~ √N so each list stays bounded, and the
 * stream-static join ships each micro-batch's probed cells only, never
 * the index. Index staleness is l10's problem (O(arrivals) incremental
 * maintenance under the SAME frozen centers), which composes with this
 * op unchanged.
 */
object VectorSearchStream {

  /**
   * The frozen index: one inverted list per IVF cell — built ONCE at
   * deploy time (batch), keyed for the stream-static equi-join.
   * Assignment replays `knnIvfWithCenters`'s native `CellArgmin`, so
   * the lists hold exactly the cells the batch operator would probe.
   * Output: (cell, members: array<struct<neighbor_id, cv>>).
   */
  def invertedLists(corpus: DataFrame, idCol: String, vecCol: String,
      centers: Array[Array[Double]]): DataFrame = {
    import graft.functions.VectorExpressions.cellArgmin
    corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", cellArgmin(col("cv"), centers))
      .groupBy("cell")
      .agg(collect_list(struct(col("neighbor_id"), col("cv"))).as("members"))
  }

  /**
   * The serving transform: stream of (idCol, vecCol) query rows →
   * (query_id, neighbor_id, cos) shard-local top-`k` candidate rows,
   * one set per probed cell. Probing replays the batch `CellProbes`
   * expression (same centers, same nprobe, same tie order), scoring
   * replays `ArrayCosine` inside a row-local transform, and the
   * shard-local truncation sorts struct(−cos, id) ascending — cosine
   * descending with id tiebreak, the identical order `TopKByScore`
   * uses — so a batch consumer merging these candidates reproduces
   * `knnIvfWithCenters` row-for-row (spec-asserted, and st17's gate
   * hash-checks the merge against a05's own oracle).
   */
  def probeStream(queries: DataFrame, idCol: String, vecCol: String,
      lists: DataFrame, centers: Array[Array[Double]], nprobe: Int,
      k: Int): DataFrame = {
    import graft.functions.VectorExpressions.cellProbes
    val probes = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(cellProbes(col("qv"), centers, nprobe)))
    probes.join(lists, Seq("cell")) // stream-static: zero streaming state
      .select(col("query_id"),
        explode(slice(array_sort(transform(col("members"), m =>
          struct((-graft.ops.Similarity.cosine(col("qv"), m.getField("cv")))
            .as("neg"),
            m.getField("neighbor_id").as("id")))), 1, k)).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        (-col("c.neg")).as("cos"))
  }
}
