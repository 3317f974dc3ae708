package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed graph analytics over plain DataFrames.
 *
 * PageRank here is the canonical iterate-by-join formulation (Page et
 * al. 1999; the Pregel/GraphX message-passing schedule expressed as two
 * relational operators per round), with one twist that makes it
 * ORACLE-CHECKABLE across engines: ranks live as exact integer
 * "nano-rank" units (`scale` = 1e9 per unit of probability mass) and
 * every per-edge contribution is floor-quantized BEFORE the sum, so an
 * iteration is pure integer arithmetic plus IEEE-identical scalar ops —
 * no floating sum-order nondeterminism anywhere (the a08/t17 trick).
 *
 * 100 TB posture:
 *  - The edge list joins its out-weight once, is hash-partitioned by
 *    `src` and cached; every iteration reuses that layout, so a round
 *    costs one shuffle of the (node, rank) pairs into the edge
 *    partitioning plus one map-side-combined sum by `dst` — the edges
 *    (the big side) never move again.
 *  - Rank state is two longs per node — never the adjacency payload.
 *  - A viral in-degree node (every page links to the hub) is absorbed
 *    by partial aggregation: contributions combine map-side per task,
 *    so the hot `dst` receives one partial row per partition, not one
 *    row per in-edge.
 *  - Dangling mass is a single scalar aggregate per round (model-sized
 *    driver state, like the GP fits' treeAggregate results) broadcast
 *    back as a literal.
 */
object Graph {

  /**
   * `iters` rounds of damped PageRank over `edges(src: long, dst: long,
   * w: long)` (parallel edges are pre-summed). Returns (node, rank_nano)
   * where rank_nano is the integer rank in units of probability/`scale`.
   *
   * Per round, with n = |nodes| and dm = Σ rank over dangling nodes:
   *   rank'(v) = floor((1-d)·scale/n + 0.5) + floor(d·dm/n + 0.5)
   *            + Σ_{(u,v,w)} floor(d · rank(u) · w / outw(u) + 0.5)
   * All floors are computed on doubles < 2^53, so every engine agrees
   * bit-for-bit; the sums are over longs, hence exact.
   */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    val eo = e.join(outw, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dangling = nodes.join(eo.select(col("src").as("node")).distinct(),
      Seq("node"), "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // scalar driver state, like a broadcast dim
    require(n > 0, "pageRank: empty graph")
    val base = math.floor((1 - damping) * scale.toDouble / n + 0.5).toLong

    var ranks = nodes
      .select(col("node"), lit(math.floor(scale.toDouble / n + 0.5).toLong).as("r"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val dm = ranks.join(dangling, "node")
        .agg(coalesce(sum("r"), lit(0L))).head.getLong(0)
      val dshare = math.floor(damping * dm.toDouble / n + 0.5).toLong
      val contrib = eo.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor(lit(damping) * col("r") * col("w") / col("ow") + lit(0.5)).as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base + dshare) + coalesce(col("c"), lit(0L))).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the previous round
      ranks.unpersist(blocking = false)
      ranks = next
    }
    ranks.select(col("node"), col("r").as("rank_nano"))
  }

  /**
   * `rounds` of multi-source BFS over `edges(src, dst)` (directed; pass
   * a symmetrized list for undirected semantics): the Pregel
   * min-distance propagation as relational rounds. Returns (node, dist)
   * for every node within `rounds` hops of a source — unreached nodes
   * are simply absent, so the frontier's size, not the graph's, bounds
   * the state. Pure integer arithmetic: deterministic on any engine.
   *
   * Scale shape per round: one shuffle of the (node, dist) state into
   * the cached edge partitioning + one map-side-combined min by node.
   * Like pageRank, the edge list never moves after the initial
   * repartition-by-src.
   */
  def shortestPaths(edges: DataFrame, sources: Seq[Long],
      rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct()
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    import spark.implicits._
    var dist = sources.distinct.map(n => (n, 0L)).toDF("node", "d")
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("d") + lit(1L)).as("d"))
      val next = dist.union(relaxed).groupBy("node").agg(min("d").as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the previous round
      dist.unpersist(blocking = false)
      dist = next
    }
    dist.select(col("node"), col("d").as("dist"))
  }
}
