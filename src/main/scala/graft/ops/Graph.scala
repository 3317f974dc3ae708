package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.InternalFrame
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
 *    `src` and materialized; every iteration reuses that layout, so a
 *    round costs one shuffle of the (node, rank) state into the edge
 *    partitioning plus one map-side-combined aggregate by `dst` — the
 *    edges (the big side) never move again.
 *  - Rank/distance state is two longs per node — never the adjacency
 *    payload — and rotates through RDD-level persistence (the
 *    InternalFrame pattern d07's CC loop uses): each round's UnsafeRow
 *    blocks replace the previous round's, no cache-manager entry is
 *    ever registered (a `df.persist` per invocation would leak one per
 *    bench/verify run), lineage truncates at the materialized leaf so
 *    the plan doesn't deepen with iterations, and the final frame's
 *    blocks are reclaimed by the ContextCleaner once unreferenced.
 *  - A viral in-degree node (every page links to the hub) is absorbed
 *    by partial aggregation: contributions combine map-side per task,
 *    so the hot `dst` receives one partial row per partition, not one
 *    row per in-edge.
 *  - Dangling mass is a single scalar aggregate per round (model-sized
 *    driver state, like the GP fits' treeAggregate results) broadcast
 *    back as a literal.
 */
object Graph {

  /** Persist `df`'s UnsafeRow stream eagerly (one count job), drop the
    * previous round's blocks, and re-expose the rows as a
    * lineage-truncated leaf with honest row-count statistics. */
  private final class Rotation {
    private var prev: RDD[InternalRow] = null
    def materialize(df: DataFrame, rowBytes: Int): (DataFrame, Long) = {
      // copy before retaining: shuffle readers recycle one UnsafeRow
      val rdd = InternalFrame.toInternalRdd(df).map(_.copy())
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = rdd.count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = rdd
      (InternalFrame.ofInternalRdd(df, rdd, rowCount = n, rowBytes = rowBytes), n)
    }
    /** Stop tracking (the final round's frame outlives the loop). */
    def release(): Unit = prev = null
    def drop(): Unit = { if (prev != null) prev.unpersist(blocking = false); prev = null }
  }

  /** The edge side: materialized once WITHOUT statistics, so joins
    * against it stay honest shuffle joins (a LogicalRDD without stats
    * advertises defaultSizeInBytes — never broadcast). */
  private def materializeEdges(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val rdd = InternalFrame.toInternalRdd(df).map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    (InternalFrame.ofInternalRdd(df, rdd), rdd)
  }

  /** One persisted node-state snapshot for the converged iterators
    * ([[pageRankConverged]]/[[labelPropagationConverged]]): lineage-
    * truncating persist + honest (rowCount, rowBytes) statistics so
    * small state frames broadcast at plan time. The callers manage a
    * two-slot prev/cur window themselves — the period-2 stop test
    * compares t+1 against t-1, which the single-slot Rotation cannot
    * hold. */
  private def persistConvergedState(df: DataFrame,
      rowBytes: Int): (RDD[InternalRow], DataFrame) = {
    val rdd = InternalFrame.toInternalRdd(df)
      .map(_.copy()).persist(StorageLevel.MEMORY_AND_DISK)
    (rdd, InternalFrame.ofInternalRdd(df, rdd,
      rowCount = rdd.count(), rowBytes = rowBytes))
  }

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
    // Aggregate FIRST, repartition LAST (r16 shape, restored): the r17
    // hoist of repartition(src) above the aggregates fused the prep to
    // one exchange on paper but shuffled the PRE-aggregate edge
    // multiset with no map-side combine, and the driver bench measured
    // the family 1.3–4.4× slower at 32 cores (x01 1.77→5.77 s; r18
    // paired A/B confirms — see OPTIMIZATION_r18.md). Partial
    // aggregation before the exchanges also keeps a hot src key
    // combine-able map-side (guide §2.5), which the hoist gave up.
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    val (eo, eoRdd) = materializeEdges(
      e.join(outw, "src").repartition(col("src")))
    // keep the RDD handles (persistConvergedState, not Rotation+release)
    // so the snapshots can be unpersisted once the final state
    // materializes instead of lingering until GC
    val (nodesRdd, nodes) = persistConvergedState(
      eo.select(col("src").as("node"))
        .union(eo.select(col("dst").as("node"))).distinct(), rowBytes = 16)
    val n = nodesRdd.count()
    val (dangRdd, dangling) = persistConvergedState(
      nodes.join(eo.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti"), rowBytes = 16)
    require(n > 0, "pageRank: empty graph")
    val base = math.floor((1 - damping) * scale.toDouble / n + 0.5).toLong

    val rot = new Rotation
    var ranks = nodes
      .select(col("node"), lit(math.floor(scale.toDouble / n + 0.5).toLong).as("r"))
    for (_ <- 1 to iters) {
      val (cur, _) = rot.materialize(ranks, rowBytes = 24)
      val dm = cur.join(dangling, "node")
        .agg(coalesce(sum("r"), lit(0L))).head.getLong(0)
      val dshare = math.floor(damping * dm.toDouble / n + 0.5).toLong
      val contrib = eo.join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor(lit(damping) * col("r") * col("w") / col("ow") + lit(0.5)).as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base + dshare) + coalesce(col("c"), lit(0L))).as("r"))
    }
    val (out, _) = rot.materialize(ranks, rowBytes = 24)
    rot.release() // final blocks reclaimed by the ContextCleaner via GC
    eoRdd.unpersist(blocking = false)
    nodesRdd.unpersist(blocking = false)
    dangRdd.unpersist(blocking = false)
    out.select(col("node"), col("r").as("rank_nano"))
  }

  /**
   * [[pageRank]] driven to its VERIFIED ATTRACTOR, with a data-driven
   * round count instead of a caller-guessed `iters`. Integer ranks
   * make the stop test EXACT (bit-equality, no cross-engine epsilon)
   * — but the floor-quantized map need not have a strict fixpoint: on
   * real graphs the tail settles into a PERIOD-2 cycle where a handful
   * of nodes trade single quantization units forever (measured on the
   * sf0.001 trade graph: rounds 150 and 152 identical, 150 vs 151
   * differing on 8 nodes by ≤ 24 nano). So the stop test is "state
   * equals the state TWO rounds ago" — satisfied by a strict fixpoint
   * (period 1) and by the 2-cycle alike — and the returned vector is
   * the elementwise MAX of the two attractor states, which is
   * invariant to the phase at which detection fires. That phase
   * invariance is what keeps a STATIC oracle possible: the replay is
   * deterministic, so for ANY fixed N past settling,
   * greatest(state_N, state_{N+1}) equals the returned envelope —
   * the DuckDB oracle unrolls a fixed N ≥ the contraction bound
   * (d^k·scale < 1 ⇒ k ≈ log_{1/d} scale, graph-INDEPENDENT — the
   * spectral radius of the damped walk matrix is ≤ d) and never needs
   * to know the detected round count. Fails loudly at `maxRounds`
   * (longer-period attractors would) instead of returning an
   * unsettled state.
   *
   * Scale shape: identical to [[pageRank]] per round (edges
   * materialized once partitioned by src; state is 16 B/node rotated
   * through RDD persistence — a three-slot window here, since the
   * probe needs t−2 alive) plus ONE keys-only stationarity probe per
   * round — a (node, rank)⋈(node, rank) equi-join short-circuited by
   * `isEmpty`'s limit-1. When the graph has no dangling nodes (known
   * once, at setup) the per-round dangling-mass scalar job is skipped
   * entirely — one action per round instead of two on symmetrized
   * graphs.
   */
  def pageRankConverged(edges: DataFrame, damping: Double = 0.85,
      scale: Long = 1000000000L, maxRounds: Int = 100): (DataFrame, Int) = {
    // Aggregate FIRST, repartition LAST (r16 shape, restored — see
    // pageRank's note; the r17 hoist was a measured 32-core regression).
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    val (eo, eoRdd) = materializeEdges(
      e.join(outw, "src").repartition(col("src")))
    // persistConvergedState (not Rotation+release) so the snapshots keep
    // their RDD handles: these blocks must be unpersisted on BOTH exits
    // below — a Rotation released here would leave them pinned until GC
    // on every maxRounds retry (the leak this function's failure branch
    // exists to prevent)
    val (nodesRdd, nodes) = persistConvergedState(
      eo.select(col("src").as("node"))
        .union(eo.select(col("dst").as("node"))).distinct(), rowBytes = 16)
    val n = nodesRdd.count()
    val (dangRdd, dangling) = persistConvergedState(
      nodes.join(eo.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti"), rowBytes = 16)
    val danglingCount = dangRdd.count()
    require(n > 0, "pageRankConverged: empty graph")
    val base = math.floor((1 - damping) * scale.toDouble / n + 0.5).toLong

    // manual two-slot state window + the in-flight round: the
    // period-2 probe compares round t+1 against round t-1, so `prev`
    // must stay alive while `next` materializes — the single-slot
    // Rotation (which drops the previous round on materialize) can't
    // manage the lifecycle here
    var (curRdd, cur) = persistConvergedState(nodes.select(col("node"),
      lit(math.floor(scale.toDouble / n + 0.5).toLong).as("r")), rowBytes = 24)
    var prevRdd: RDD[InternalRow] = null; var prev: DataFrame = null
    var rounds = 0
    var done = false
    while (!done) {
      if (rounds >= maxRounds) {
        // release EVERY pinned block before failing: a longer-period
        // attractor would otherwise leave the full edge set, the node/
        // dangling snapshots, and up to two state snapshots in the
        // block manager per retry
        eoRdd.unpersist(blocking = false)
        nodesRdd.unpersist(blocking = false)
        dangRdd.unpersist(blocking = false)
        if (prevRdd != null) prevRdd.unpersist(blocking = false)
        curRdd.unpersist(blocking = false)
        throw new IllegalArgumentException(
          s"pageRankConverged: no period-<=2 attractor within $maxRounds rounds")
      }
      val dshare =
        if (danglingCount == 0) 0L
        else {
          val dm = cur.join(dangling, "node")
            .agg(coalesce(sum("r"), lit(0L))).head.getLong(0)
          math.floor(damping * dm.toDouble / n + 0.5).toLong
        }
      val contrib = eo.join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor(lit(damping) * col("r") * col("w") / col("ow") + lit(0.5)).as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      val (nextRdd, nextF) = persistConvergedState(
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base + dshare) + coalesce(col("c"), lit(0L))).as("r")),
        rowBytes = 24)
      // state(t+1) == state(t-1) ⇒ the deterministic map is in a
      // period-1 or period-2 attractor from t-1 on
      val settled = prev != null && nextF
        .join(prev.withColumnRenamed("r", "r0"), Seq("node"))
        .filter(col("r") =!= col("r0")).isEmpty
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = curRdd; prev = cur
      curRdd = nextRdd; cur = nextF
      rounds += 1
      if (settled) done = true
    }
    eoRdd.unpersist(blocking = false)
    // the returned envelope references only cur/prev (left to the
    // ContextCleaner — the caller consumes them lazily); the node and
    // dangling snapshots are done the moment the loop exits
    nodesRdd.unpersist(blocking = false)
    dangRdd.unpersist(blocking = false)
    // phase-invariant envelope over the (possibly period-2) attractor
    val out = cur.join(prev.withColumnRenamed("r", "rp"), Seq("node"))
      .select(col("node"), greatest(col("r"), col("rp")).as("rank_nano"))
    (out, rounds)
  }

  /**
   * `iters` rounds of PERSONALIZED PageRank (Page et al. 1999 §6;
   * Jeh & Widom 2003's preference-set form) over `edges(src, dst, w)`:
   * the restart distribution concentrates on `seeds(node)` instead of
   * spreading uniformly, so ranks measure proximity TO THE SEED SET —
   * the random-walk-with-restart primitive behind "related items" /
   * "suppliers like these" recommendation queries.
   *
   * Same exact integer nano-rank arithmetic as [[pageRank]] (every
   * per-edge contribution floor-quantized before the long sum, the
   * restart and dangling terms IEEE-identical scalar ops), with the
   * restart AND dangling mass both returning to the seeds —
   * probability mass stays conserved over the seed-reachable subgraph.
   *
   * The 100 TB property pageRank cannot have: state is only the nodes
   * with NONZERO rank — seeds plus what `iters` walk steps reach — so
   * a 5-seed query over a trillion-edge graph keeps (node, rank) state
   * proportional to the seed neighborhood, never the node set. The
   * materialized edge side is still partitioned once by `src` and
   * reused; each round shuffles the small state into it.
   */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      damping: Double = 0.85, scale: Long = 1000000000L): DataFrame = {
    // Aggregate FIRST, repartition LAST (r16 shape, restored — see
    // pageRank's note; the r17 hoist was a measured 32-core regression).
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    val (eo, eoRdd) = materializeEdges(
      e.join(outw, "src").repartition(col("src")))
    // seeds and the out-edge key set both persist across every round
    val seedRot = new Rotation
    val (sd, sCount) = seedRot.materialize(
      seeds.select(col("node").cast("long").as("node")).distinct(), rowBytes = 16)
    seedRot.release()
    require(sCount > 0, "personalizedPageRank: empty seed set")
    val srcRot = new Rotation
    val (srcNodes, _) = srcRot.materialize(
      eo.select(col("src").as("node")).distinct(), rowBytes = 16)
    srcRot.release()
    val base = math.floor((1 - damping) * scale.toDouble / sCount + 0.5).toLong

    val rot = new Rotation
    var ranks = sd.select(col("node"),
      lit(math.floor(scale.toDouble / sCount + 0.5).toLong).as("r"))
    for (_ <- 1 to iters) {
      val (cur, _) = rot.materialize(ranks, rowBytes = 24)
      // dangling = state nodes with no out-edges (an anti-join against
      // the keys-only src set — never a full node inventory)
      val dm = cur.join(srcNodes, Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L))).head.getLong(0)
      val dshare = math.floor(damping * dm.toDouble / sCount + 0.5).toLong
      val contrib = eo.join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor(lit(damping) * col("r") * col("w") / col("ow") + lit(0.5)).as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      // next state = seeds ∪ contributed nodes, nothing else
      ranks = sd.select(col("node"), lit(base + dshare).as("sb"))
        .join(contrib, Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("sb"), lit(0L)) + coalesce(col("c"), lit(0L))).as("r"))
    }
    val (out, _) = rot.materialize(ranks, rowBytes = 24)
    rot.release()
    eoRdd.unpersist(blocking = false)
    out.select(col("node"), col("r").as("rank_nano"))
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
  /**
   * Exact triangle counting via degree-ordered wedge enumeration
   * (Schank & Wagner 2005; the distributed formulation of Suri &
   * Vassilvitskii 2011): canonicalize to the undirected distinct edge
   * set, orient every edge from its lower endpoint to its higher in
   * the total order (degree, id), enumerate wedges by self-joining
   * oriented edges on their source, and close each wedge against the
   * oriented edge set. Returns (node, triangles) for every node in at
   * least one triangle, each triangle counted once per member.
   *
   * Why this shape at 100 TB: the orientation bounds every node's
   * OUT-degree by O(√m) on any graph, so the wedge self-join
   * materializes O(m^{3/2}) candidate rows in total — a naive
   * neighbor-pair explosion is Σ deg² and a single celebrity hub makes
   * it quadratic. Here the hub sorts HIGHER than almost every
   * neighbor, so it fans IN (map-side combinable aggregates, an
   * AQE-splittable equi-join), never out. One declarative plan: two
   * equi-joins plus one aggregate, no iteration, no driver state.
   */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // sharedScan both reused frames: `und` feeds the degree count
    // (twice, via the union) plus the orientation join, and the
    // oriented set `o` is scanned three times (both wedge sides + the
    // closing probe) — without it Catalyst re-runs the whole upstream
    // edge-build pipeline once per consumer (6+ recomputes measured
    // on the x03 plan)
    val und = InternalFrame.sharedScan(edges.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient by the total order (degree, id): lower key -> higher key
    val keyed = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    val uLower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o = InternalFrame.sharedScan(keyed.select(
      when(uLower, col("u")).otherwise(col("v")).as("a"),
      when(uLower, col("v")).otherwise(col("u")).as("b"),
      when(uLower, col("dv")).otherwise(col("du")).as("db")))
    // wedges (b, c) centered at a, emitted once (b strictly below c in
    // the same total order), closed by the oriented edge b -> c
    val e1 = o.select(col("a"), col("b").as("x"), col("db").as("dx"))
    val e2 = o.select(col("a"), col("b").as("y"), col("db").as("dy"))
    val wedges = e1.join(e2, Seq("a"))
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("a"), col("x"), col("y"))
    val tri = wedges.join(
      o.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    tri.select(col("a").as("node"))
      .union(tri.select(col("x").as("node")))
      .union(tri.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /**
   * Per-node EGO-NETWORK profile: degree, edges among the node's
   * neighbors (each is a triangle through the node, so the count IS
   * [[triangleCounts]]), total ego edges (spokes + neighbor edges) and
   * ego density in ppm of the (deg+1)-clique maximum. One canonical
   * edge pass feeds both the degree aggregate and the triangle
   * machinery; every node with an edge appears (triangle-free nodes
   * score 0, not dropped). Pure integer: (d+1)·d is even, so the ppm
   * is an exact floor division any engine replays.
   */
  def egoDensity(edges: DataFrame): DataFrame = {
    val und = InternalFrame.sharedScan(edges.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    deg.join(triangleCounts(
        und.select(col("u").as("src"), col("v").as("dst"))), Seq("node"), "left")
      .select(col("node"), col("d"),
        coalesce(col("triangles"), lit(0L)).as("tri"))
      .select(col("node"), col("d").as("degree"),
        col("tri").as("nbr_edges"),
        (col("d") + col("tri")).as("ego_edges"),
        expr("(d + tri) * 2000000 div ((d + 1) * d)").as("density_ppm"))
  }

  /**
   * Deterministic synchronous label propagation (Raghavan et al. 2007's
   * community detection, in the reproducible semi-synchronous variant):
   * every node starts as its own label; each round every node adopts
   * the label most frequent among its neighbors, ties broken by the
   * SMALLEST label — a total order, so the result is independent of
   * partitioning and arrival order (classic LPA's random visit order is
   * deliberately dropped; async order-dependence cannot be oracled and
   * does not distribute). Runs exactly `rounds` synchronous rounds over
   * the symmetrized edge set and returns (node, label).
   *
   * Scale shape per round: one equi-join of the materialized edge list
   * against the label frame (labels are (node, label) longs — the edge
   * list never moves after the initial repartition), then a two-level
   * aggregate — (node, label) partial counts combine map-side, and the
   * argmax is a min over the packed (-count, label) struct, NOT a
   * window, so a celebrity node's rows shrink before they shuffle and
   * AQE can split what remains. State between rounds is the label
   * frame only (16 B/node), rotated through lineage-truncating
   * persistence like [[pageRank]]'s.
   */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val (e, eRdd) = materializeEdges(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
        .select(explode(array(
          struct(col("u").as("src"), col("v").as("dst")),
          struct(col("v").as("src"), col("u").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("dst")))
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val rot = new Rotation
    for (_ <- 1 to rounds) {
      val (cur, _) = rot.materialize(labels, rowBytes = 16)
      val best = e
        .join(cur.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy("src")
        .agg(min(struct(-col("n"), col("label"))).as("b"))
        .select(col("src").as("node"), col("b.label").as("label"))
      // the symmetric view gives every node >= 1 neighbor, but keep
      // the no-neighbor fall-through total regardless
      labels = cur.select(col("node"), col("label").as("old"))
        .join(best.select(col("node"), col("label").as("new")), Seq("node"), "left")
        .select(col("node"), coalesce(col("new"), col("old")).as("label"))
    }
    val (out, _) = rot.materialize(labels, rowBytes = 16)
    rot.release()
    eRdd.unpersist(blocking = false)
    out
  }

  /**
   * [[labelPropagation]] driven to its VERIFIED ATTRACTOR — the same
   * data-driven stopping discipline [[pageRankConverged]] brought to
   * the rank family, for communities: synchronous plurality-label
   * rounds run until the state equals the state TWO rounds ago.
   * Labels are node ids (integers), so the test is exact — and the
   * 2-gap probe matters here even more than for PageRank, because
   * synchronous LPA famously oscillates: on near-bipartite structure
   * the deterministic map settles into a period-2 label swap, not a
   * fixpoint. The emitted labeling is the elementwise MIN over the
   * two attractor states — invariant to detection phase — so a STATIC
   * oracle replays least(round N, round N+1) for any fixed N past
   * settling (the replay is deterministic; same argument as
   * pageRankConverged's envelope). Unlike PageRank there is no
   * graph-independent contraction bound, so the oracle's unroll
   * margin is empirical (clique-heavy coincidence graphs settle in a
   * handful of rounds — spec-probed per SF); the engine itself is
   * data-driven and fails loudly at `maxRounds` (a longer-period
   * attractor would).
   *
   * Scale shape: identical to [[labelPropagation]] per round (edges
   * materialized once, (src, label) count → min-struct plurality, no
   * window) plus one keys-only limit-1 stationarity probe over the
   * two-slot persisted state window. Returns (labels, rounds).
   */
  def labelPropagationConverged(edges: DataFrame,
      maxRounds: Int = 40): (DataFrame, Int) = {
    val (e, eRdd) = materializeEdges(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
        .select(explode(array(
          struct(col("u").as("src"), col("v").as("dst")),
          struct(col("v").as("src"), col("u").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("dst")))
    var (curRdd, cur) = persistConvergedState(
      e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")), rowBytes = 16)
    var prevRdd: RDD[InternalRow] = null; var prev: DataFrame = null
    var rounds = 0
    var done = false
    while (!done) {
      if (rounds >= maxRounds) {
        // same release-before-fail discipline as pageRankConverged
        eRdd.unpersist(blocking = false)
        if (prevRdd != null) prevRdd.unpersist(blocking = false)
        curRdd.unpersist(blocking = false)
        throw new IllegalArgumentException(
          s"labelPropagationConverged: no period-<=2 attractor within $maxRounds rounds")
      }
      val best = e
        .join(cur.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy("src")
        .agg(min(struct(-col("n"), col("label"))).as("b"))
        .select(col("src").as("node"), col("b.label").as("label"))
      val (nextRdd, nextF) = persistConvergedState(
        cur.select(col("node"), col("label").as("old"))
          .join(best.select(col("node"), col("label").as("new")),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("new"), col("old")).as("label")),
        rowBytes = 16)
      val settled = prev != null && nextF
        .join(prev.withColumnRenamed("label", "l0"), Seq("node"))
        .filter(col("label") =!= col("l0")).isEmpty
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = curRdd; prev = cur
      curRdd = nextRdd; cur = nextF
      rounds += 1
      if (settled) done = true
    }
    eRdd.unpersist(blocking = false)
    val out = cur.join(prev.withColumnRenamed("label", "lp"), Seq("node"))
      .select(col("node"), least(col("label"), col("lp")).as("label"))
    (out, rounds)
  }

  /**
   * Iterative k-core peeling (Batagelj & Zaveršnik 2003's distributed
   * formulation): each round drops every node whose degree in the
   * CURRENT surviving subgraph is < k, then restricts the edge set to
   * surviving endpoints. After `rounds` rounds returns
   * (node, degree_in_core) over the surviving subgraph — survivors are
   * a superset of the exact k-core that shrinks monotonically per
   * round and equals it once a round removes nothing (each peel is the
   * standard monotone contraction; callers wanting the exact core loop
   * until the count is stationary — the fixed-round form is what an
   * unrolled SQL oracle can replay).
   *
   * Scale shape per round: degree = one map-side-combinable aggregate
   * over the symmetric edge frame; the restriction is two left-semi
   * equi-joins against the (node)-only survivor frame — keys-only
   * shuffles, AQE-splittable, no windows, no driver state. The edge
   * frame rotates through lineage-truncating persistence (it SHRINKS
   * monotonically, so per-round cost falls as peeling proceeds).
   */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val sym0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    var e = sym0
    val rot = new Rotation
    for (_ <- 1 to rounds) {
      val (cur, _) = rot.materialize(e, rowBytes = 16)
      val keep = cur.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("src").as("node"))
      e = cur
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
    }
    val (out, _) = rot.materialize(e, rowBytes = 16)
    rot.release()
    out.groupBy("src").agg(count(lit(1)).as("degree_in_core"))
      .select(col("src").as("node"), col("degree_in_core"))
  }

  /**
   * HITS hub/authority scoring (Kleinberg 1999) in `iters` mutual-
   * reinforcement rounds over `edges(src, dst, w)`, made ORACLE-
   * CHECKABLE the same way [[pageRank]] is: scores are integers in
   * parts-per-`scale` of the round's MAX score (max-normalization in
   * exact integer arithmetic — `(raw * scale) div max` — instead of
   * the classical L2 norm, whose square root has no cross-engine
   * bit-exact form), and every sum is over longs, so any engine
   * replays the rounds bit-for-bit.
   *
   * Per round: authority(v) = Σ_{(u,v,w)} w·hub(u), rescaled; then
   * hub(u) = Σ_{(u,v,w)} w·authority(v), rescaled. Returns
   * (node, auth_ppm, hub_ppm) for every node that holds a nonzero
   * score (absent = 0 by construction).
   *
   * Scale shape: identical to [[pageRank]] — the edge list is
   * materialized once, each half-round is one equi-join of the
   * 16 B/node score frame against it plus one map-side-combined sum,
   * and the per-round max is a single scalar aggregate (model-sized
   * driver state, broadcast back as a literal). Overflow bound:
   * `raw·scale` must fit a long, i.e. Σ_in w ≤ 2^63 / scale² — at the
   * default ppm scale that is ~9e6 weighted in-degree on the hottest
   * node; shrink `scale` for denser graphs.
   */
  def hits(edges: DataFrame, iters: Int, scale: Long = 1000000L): DataFrame = {
    // iters = 0 would leave `auths` null and NPE at the final join;
    // degenerate inputs (empty edge set, all-zero weights) would make
    // the round max null/0 and silently propagate null scores through
    // the integer division — fail loudly instead.
    require(iters >= 1, s"hits: iters must be >= 1 (got $iters)")
    // Aggregate FIRST, repartition LAST (r16 shape, restored — see
    // pageRank's note; the r17 hoist was a measured 32-core regression).
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val (eo, eoRdd) = materializeEdges(e.repartition(col("src")))
    val nodeRot = new Rotation
    val (nodes, _) = nodeRot.materialize(
      eo.select(col("src").as("node"))
        .union(eo.select(col("dst").as("node"))).distinct(), rowBytes = 16)
    nodeRot.release()
    val rotA = new Rotation
    val rotH = new Rotation
    var hubs = nodes.select(col("node"), lit(scale).as("h"))
    var auths: DataFrame = null
    for (i <- 1 to iters) {
      val hPrev = if (i == 1) hubs else { val (c, _) = rotH.materialize(hubs, 24); c }
      val (araw, _) = rotA.materialize(
        eo.join(hPrev.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst")).agg(sum(col("w") * col("h")).as("araw")),
        rowBytes = 24)
      val amaxRow = araw.agg(max("araw")).head
      require(!amaxRow.isNullAt(0) && amaxRow.getLong(0) > 0,
        "hits: empty or zero-weight edge set — no authority mass to normalize")
      val amax = amaxRow.getLong(0)
      auths = araw.select(col("dst").as("node"),
        expr(s"araw * ${scale}L div ${amax}L").as("a"))
      val (hraw, _) = rotH.materialize(
        eo.join(auths.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src")).agg(sum(col("w") * col("a")).as("hraw")),
        rowBytes = 24)
      val hmaxRow = hraw.agg(max("hraw")).head
      require(!hmaxRow.isNullAt(0) && hmaxRow.getLong(0) > 0,
        "hits: no hub mass to normalize")
      val hmax = hmaxRow.getLong(0)
      hubs = hraw.select(col("src").as("node"),
        expr(s"hraw * ${scale}L div ${hmax}L").as("h"))
    }
    val out = auths.join(hubs, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("a"), lit(0L)).as("auth_ppm"),
        coalesce(col("h"), lit(0L)).as("hub_ppm"))
    rotA.release(); rotH.release()
    eoRdd.unpersist(blocking = false)
    out
  }

  /**
   * Newman modularity decomposition of a community assignment
   * (Newman & Girvan 2004): per community c over the undirected
   * distinct edge set, Q_c = L_c/m − (D_c/2m)², where L_c counts
   * intra-community edges, D_c sums member degrees, m = |edges|.
   * Σ Q_c is the partition's modularity. Every input to the formula
   * is an exact integer aggregate — the single floating division per
   * community quantizes identically on any engine — so the grading of
   * a community detector (x04's label propagation) is itself
   * oracle-checkable.
   *
   * Scale shape: canonicalize once; two label joins against the edge
   * list (labels are 16 B/node, edges never move twice); degree,
   * intra-edge, and membership counts are all map-side-combinable
   * aggregates keyed by community; m is one scalar broadcast back as
   * a 1-row frame. No windows, no iteration, no driver-sized state.
   * Returns (community, n_nodes, intra_edges, degree_sum, q_part).
   */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = InternalFrame.sharedScan(edges.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val lab = InternalFrame.sharedScan(
      labels.select(col("node").cast("long").as("node"),
        col("label").cast("long").as("label")))
    val m = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val byC = deg.join(lab, "node")
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("degree_sum"))
    val intra = und
      .join(lab.select(col("node").as("u"), col("label").as("lu")), "u")
      .join(lab.select(col("node").as("v"), col("label").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    val dShare = col("degree_sum").cast("double") / (lit(2.0) * col("m"))
    byC.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"))
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("intra_edges"),
        col("degree_sum"),
        (floor((col("intra_edges").cast("double") / col("m")
          - dShare * dShare) * 1e6 + lit(0.5)) / 1e6).as("q_part"))
  }

  /**
   * Bounded-round Bellman-Ford over WEIGHTED edges (src, dst, w): after
   * `rounds` relaxations each reached node holds the minimum total
   * weight over all paths of ≤ `rounds` edges from any source — the
   * weighted twin of [[shortestPaths]], same relational shape with
   * `d + w` in place of `d + 1`. Weights are integers (cast to long),
   * so every round is exact arithmetic and an unrolled SQL oracle
   * replays it bit-for-bit; negative weights are rejected (cycles
   * would make the bounded result meaningless).
   *
   * The load-bearing difference from BFS: a 2-edge path can be CHEAPER
   * than a direct edge, so the relaxation genuinely re-decides earlier
   * rounds' answers — min(d) aggregates over the union of the previous
   * state and the relaxed frontier, not just newly-reached nodes.
   *
   * Scale shape per round: identical to [[shortestPaths]] — one
   * shuffle of the 24 B/node (node, d) state into the materialized
   * edge partitioning plus one map-side-combined min by node; the edge
   * list never moves after the initial repartition-by-src.
   */
  def weightedShortestPaths(edges: DataFrame, sources: Seq[Long],
      rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    val (e, eRdd) = materializeEdges(
      // Aggregate FIRST, repartition LAST (r16 shape, restored — see
      // pageRank's note; the r17 hoist was a measured 32-core regression)
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
        .groupBy("src", "dst").agg(min("w").as("w"))
        .repartition(col("src")))
    val negs = e.filter(col("w") < 0).limit(1).count()
    require(negs == 0, "weightedShortestPaths: negative edge weights")
    import spark.implicits._
    var dist: DataFrame = sources.distinct.map(d => (d, 0L)).toDF("node", "d")
    val rot = new Rotation
    for (_ <- 1 to rounds) {
      val (cur, _) = rot.materialize(dist, rowBytes = 24)
      val relaxed = e.join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
      dist = cur.union(relaxed).groupBy("node").agg(min("d").as("d"))
    }
    val (out, _) = rot.materialize(dist, rowBytes = 24)
    rot.release()
    eRdd.unpersist(blocking = false)
    out.select(col("node"), col("d").as("dist"))
  }

  /**
   * [[kCore]] driven to its VERIFIED FIXPOINT: peel rounds run until a
   * round removes nothing — the surviving subgraph then IS the exact
   * k-core, not a superset — and the convergence probe is free: each
   * round's state is already counted during materialization (the
   * Rotation's one job per round), and the symmetric edge count is
   * stationary iff no node was peeled (peeling a node always deletes
   * its ≥ 1 surviving incident edges; isolated nodes never appear in
   * the edge frame at all). Returns (result, peels) where `peels`
   * counts executed peel rounds — the last one provably removed
   * nothing. Fails loudly at `maxRounds` instead of returning an
   * unconverged superset.
   *
   * Scale shape: identical to [[kCore]] per round — one map-side-
   * combinable degree aggregate plus two keys-only left-semi joins —
   * and the state SHRINKS monotonically, so late rounds are nearly
   * free. The stationarity check adds zero jobs.
   */
  def kCoreConverged(edges: DataFrame, k: Int,
      maxRounds: Int = 50): (DataFrame, Int) = {
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val rot = new Rotation
    var prevCnt = -1L
    var peels = 0
    var out: DataFrame = null
    while (out == null) {
      val (cur, cnt) = rot.materialize(e, rowBytes = 16)
      if (cnt == prevCnt) out = cur // last peel removed nothing: fixpoint
      else {
        require(peels < maxRounds,
          s"kCoreConverged: no fixpoint within $maxRounds rounds")
        prevCnt = cnt
        peels += 1
        val keep = cur.groupBy("src").agg(count(lit(1)).as("d"))
          .filter(col("d") >= k)
          .select(col("src").as("node"))
        e = cur
          .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
      }
    }
    rot.release()
    (out.groupBy("src").agg(count(lit(1)).as("degree_in_core"))
      .select(col("src").as("node"), col("degree_in_core")), peels)
  }

  /**
   * Link prediction by the resource-allocation index (Zhou, Lü &
   * Zhang 2009 — the strongest of the classic local indices on
   * co-occurrence graphs): for every NON-adjacent pair (u, v) sharing
   * at least one neighbor, score = Σ_{w ∈ Γ(u)∩Γ(v)} 1/deg(w), with
   * each term floor-quantized to ppm (floor(1e6 / deg(w)) summed as
   * BIGINTs — integer end to end, so a DuckDB oracle replays every
   * term and the sum exactly; Adamic-Adar's 1/log deg would drag a
   * transcendental into the hash). Also returns the raw common-
   * neighbor count. Top-`topN` by (ra_ppm DESC, u, v) — a total order.
   *
   * Scale shape: wedge enumeration centered on w is the only
   * data-sized join and its volume is Σ deg(w)² — on hub-heavy graphs
   * cap it with `maxWedgeDegree` (hubs contribute ≤ 1e6/deg ≈ 0 per
   * term, so dropping centers above the cap changes scores by at most
   * pairs·1e6/cap; 0 = no cap). NOTE the cap applies to the whole
   * wedge set, so `common_neighbors` is likewise counted only over
   * uncapped centers — wedges through a capped hub vanish from BOTH
   * columns, not just from the ra_ppm perturbation; callers reading
   * common_neighbors as a raw CN score should run uncapped. The
   * adjacency anti-join and the (u, v) aggregate are keys-only;
   * degree is map-side combinable.
   */
  def linkPrediction(edges: DataFrame, topN: Int,
      maxWedgeDegree: Int = 0): DataFrame = {
    val und = InternalFrame.sharedScan(edges.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val sym = InternalFrame.sharedScan(
      und.select(col("u").as("w"), col("v").as("n"))
        .union(und.select(col("v").as("w"), col("u").as("n"))))
    val deg = sym.groupBy("w").agg(count(lit(1)).as("d"))
    val centers0 = sym.join(deg, "w")
    val centers =
      if (maxWedgeDegree > 0) centers0.filter(col("d") <= maxWedgeDegree)
      else centers0
    // wedges u—w—v with u < v, each carrying w's quantized RA term
    val wedges = centers.select(col("w"), col("n").as("cu"), col("d"))
      .join(centers.select(col("w"), col("n").as("cv")), Seq("w"))
      .filter(col("cu") < col("cv"))
      .select(col("cu").as("u"), col("cv").as("v"),
        expr("CAST(1000000 AS BIGINT) div d").as("term_ppm"))
    wedges
      .join(und, Seq("u", "v"), "left_anti") // predict only NON-edges
      .groupBy("u", "v")
      .agg(count(lit(1)).as("common_neighbors"), sum("term_ppm").as("ra_ppm"))
      .orderBy(col("ra_ppm").desc, col("u"), col("v"))
      .limit(topN)
  }

  /**
   * DETERMINISTIC random walks (DeepWalk/node2vec's sampling stage —
   * the training-data generator for graph embeddings): `walksPerNode`
   * walks of `length` steps from EVERY node, where step t of walk w
   * moves from `cur` to argmin_{v ∈ Γ(cur)} md5("salt:w:t:v") with
   * ties on v — hash-min selection. The min of i.i.d. per-neighbor
   * hashes is uniform over the neighborhood, so the walk distribution
   * matches uniform DeepWalk sampling, yet every choice is a pure
   * function of (walk, step, candidate) — replayable bit-for-bit by a
   * DuckDB oracle and stable under partitioning, where a rand()-driven
   * walker could never be hashed.
   *
   * The argmin is min(struct(hash, v)) — a map-side-combinable
   * AGGREGATE keyed by walk, NOT a positional-index lookup, which
   * would need a row_number window partitioned by node (one
   * unsplittable task per hub at 100 TB). Per step, candidates are
   * state⋈adjacency equi-join rows that collapse per partition before
   * the (walk)-keyed shuffle; state stays (walks)-sized always. Walk
   * ids pack as node·walksPerNode + i. Output (walk_id, step, node),
   * step 0 = the seed; the walk frame feeds a skip-gram window
   * builder downstream.
   *
   * Practical length bound: each step adds one join+aggregate layer
   * and one union arm to a SINGLE Catalyst plan (no per-step
   * materialization — the state frame is walks-sized and the oracle
   * replays the whole unrolled plan), so plan size grows linearly in
   * `length`. Fine for the window-scale walks this feeds (≤ ~20
   * steps); for DeepWalk-typical lengths 40–80, checkpoint/persist
   * the state every ~10 steps (the Rotation pattern [[pageRank]]
   * uses) to keep analysis time bounded.
   */
  def randomWalks(edges: DataFrame, walksPerNode: Int, length: Int,
      salt: String = "rw"): DataFrame = {
    require(walksPerNode >= 1 && length >= 1,
      s"randomWalks: need walksPerNode/length >= 1 (got $walksPerNode/$length)")
    val und = edges.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val sym = InternalFrame.sharedScan(
      und.select(col("u").as("cur"), col("v").as("nxt"))
        .union(und.select(col("v").as("cur"), col("u").as("nxt"))))
    var state = InternalFrame.sharedScan(
      sym.select(col("cur").as("node")).distinct()
        .select(col("node"),
          explode(sequence(lit(0), lit(walksPerNode - 1))).as("i"))
        .select((col("node") * walksPerNode + col("i")).as("walk_id"),
          col("node")))
    var out = state.withColumn("step", lit(0))
    for (t <- 1 to length) {
      val h = graft.functions.VectorExpressions.md5Hash52(
        concat_ws(":", lit(salt), col("walk_id"), lit(t), col("nxt")))
      state = InternalFrame.sharedScan(state
        .join(sym, state("node") === sym("cur"))
        .groupBy("walk_id")
        .agg(min(struct(h.as("h"), col("nxt").as("v"))).as("b"))
        .select(col("walk_id"), col("b.v").as("node")))
      out = out.union(state.withColumn("step", lit(t)))
    }
    out.select(col("walk_id"), col("step"), col("node"))
  }

  /**
   * Skip-gram (center, context) pair counts from a walk frame — the
   * co-occurrence matrix DeepWalk/node2vec feed to the embedding
   * trainer, and [[randomWalks]]' promised downstream: every ordered
   * pair of walk positions within `window` steps (excluding the
   * center itself) contributes one count. Input is (walk_id, step,
   * node); output (center, context, cnt), exact integers.
   *
   * Scale shape: the window offset is EXPLODED into the join key — the
   * center side emits one row per delta ∈ [−window, window] \ {0}
   * keyed (walk_id, sa + delta), and the join is a pure equi-join on
   * (walk_id, step). Candidate volume is therefore EXACTLY
   * walks × (length+1) × 2·window rows (out-of-range offsets simply
   * find no match), independent of walk length — a walk_id-only join
   * with the band as a post-filter would materialize (length+1)² rows
   * per walk first, quadratic in length (7× more at DeepWalk-typical
   * length 80 / window 5). The count aggregate is map-side combinable
   * and the output is bounded by the co-occurrence support. The input
   * is shared-scanned — without it the whole upstream walk computation
   * would execute once per join side.
   */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"skipGramPairs: window must be >= 1 (got $window)")
    val w = InternalFrame.sharedScan(
      walks.select(col("walk_id"), col("step"), col("node")))
    val deltas = ((-window to window).filter(_ != 0)).map(d => lit(d))
    val a = w.select(col("walk_id"), col("step").as("sa"),
        col("node").as("center"),
        explode(array(deltas: _*)).as("delta"))
      .select(col("walk_id"), (col("sa") + col("delta")).as("step"),
        col("center"))
    val b = w.select(col("walk_id"), col("step"), col("node").as("context"))
    a.join(b, Seq("walk_id", "step"))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("cnt"))
  }

  def shortestPaths(edges: DataFrame, sources: Seq[Long],
      rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    val (e, eRdd) = materializeEdges(
      // Dedupe FIRST, repartition LAST (r16 shape, restored — see
      // pageRank's note; the r17 hoist was a measured 32-core
      // regression, and deduping before the exchange keeps the
      // map-side partial aggregate, guide §2.3/§2.5)
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct()
        .repartition(col("src")))
    import spark.implicits._
    var dist: DataFrame = sources.distinct.map(d => (d, 0L)).toDF("node", "d")
    val rot = new Rotation
    for (_ <- 1 to rounds) {
      val (cur, _) = rot.materialize(dist, rowBytes = 24)
      val relaxed = e.join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("d") + lit(1L)).as("d"))
      dist = cur.union(relaxed).groupBy("node").agg(min("d").as("d"))
    }
    val (out, _) = rot.materialize(dist, rowBytes = 24)
    rot.release()
    eRdd.unpersist(blocking = false)
    out.select(col("node"), col("d").as("dist"))
  }

  /**
   * Harmonic closeness centrality from a fixed seed panel — the
   * sampled-pivot estimator (Eppstein & Wang 2001) of the harmonic
   * variant (Boldi & Vigna 2014, "Axioms for Centrality", which is
   * well-defined on disconnected graphs where classic closeness is
   * not). Per-seed BFS with state keyed (seed, node), then
   * `harmonic_ppm(v) = Σ_seeds ⌊1e6 / d(s,v)⌋` over seeds reached at
   * d ≥ 1 — integer end to end (distances are hop counts, the
   * reciprocal is a floor division), so any engine replays the
   * numbers exactly; `reached` counts contributing seeds so a
   * consumer can renormalize per-node coverage.
   *
   * Scale shape: [[shortestPaths]]'s rounds with a composite key —
   * edges materialize ONCE and never move; rotated state is
   * (seed, node, d) = 24 B × |seeds| × reached nodes, shrink-proof
   * bounded by k·|V|. The seed-panel size is the accuracy/cost knob
   * (error ~ O(1/√k) uniformly, Eppstein-Wang): state and relax
   * traffic are linear in k while the edge side is k-independent, so
   * at 100 TB one picks k to fit the state budget, not the graph.
   */
  def harmonicCloseness(edges: DataFrame, seeds: Seq[Long],
      rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    val (e, eRdd) = materializeEdges(
      // Dedupe FIRST, repartition LAST (r16 shape, restored — see
      // pageRank's note; the r17 hoist was a measured 32-core
      // regression, and deduping before the exchange keeps the
      // map-side partial aggregate, guide §2.3/§2.5)
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct()
        .repartition(col("src")))
    import spark.implicits._
    var dist: DataFrame = seeds.distinct.map(s => (s, s, 0L))
      .toDF("seed", "node", "d")
    val rot = new Rotation
    for (_ <- 1 to rounds) {
      val (cur, _) = rot.materialize(dist, rowBytes = 24)
      val relaxed = e.join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("seed"), col("dst").as("node"),
          (col("d") + lit(1L)).as("d"))
      dist = cur.union(relaxed).groupBy("seed", "node").agg(min("d").as("d"))
    }
    val (out, _) = rot.materialize(dist, rowBytes = 24)
    rot.release()
    eRdd.unpersist(blocking = false)
    out.filter(col("d") >= 1)
      .groupBy("node")
      .agg(count(lit(1)).as("reached"),
        sum(expr("1000000 div d")).as("harmonic_ppm"))
  }

  /**
   * Sampled BETWEENNESS centrality from a fixed seed panel — Brandes'
   * dependency accumulation (Brandes 2001) over the pivot-sampled
   * estimator (Brandes & Pich 2007: k pivots instead of all-sources,
   * error O(1/√k) like [[harmonicCloseness]]'s panel), bounded to
   * `rounds` BFS levels. Two phases, both exact integer arithmetic so
   * a SQL oracle replays every step:
   *
   *  1. FORWARD — layered BFS with INTEGER path counts: level t's
   *     frontier relaxes along the edges, σ(v) = Σ σ(u) over the
   *     predecessors that reach v first (exact longs; the min-d +
   *     anti-join construction places each (seed, node) at exactly its
   *     first-reach level).
   *  2. BACKWARD — per level t from the deepest settled level down:
   *     δppm(v) = Σ_{(v,w) edge, d(w)=d(v)+1} ⌊σ(v)·(10⁶ + δppm(w)) /
   *     σ(w)⌋ — Brandes' (σv/σw)(1 + δ(w)) with the unit carried as
   *     ppm and every division floored, so accumulation order cannot
   *     move a bit.
   *
   * Output: (node, bet_ppm) = Σ over seeds of δppm, EXCLUDING each
   * seed's own level-0 row (Brandes sums δ_s(v) for v ≠ s); nodes on
   * no sampled shortest path are absent. Deeper-than-`rounds` paths
   * are out of scope, exactly like [[harmonicCloseness]]'s horizon.
   *
   * Scale shape: edges materialize ONCE src-partitioned and never
   * move; forward state is (seed, node, d, σ) = 32 B × k·|reached|
   * rotated through lineage-truncated leaves; each backward level is
   * one equi-join of two LEVEL-sized slices against the immovable
   * edge set plus a map-side-combinable sum. The seed-panel size k is
   * the FIRST accuracy/cost knob — state and relax traffic are linear
   * in k, the edge side k-independent (σ fits a long within the
   * horizon: path counts grow by at most max-degree per level).
   *
   * `maxFrontier` is the SECOND 100 TB knob: on a small-world graph a
   * BFS frontier is near-whole-graph by level 3–4, so per-seed level
   * state is O(|V|) however small the panel — the cap bounds each
   * seed's NEWLY-SETTLED level to its `maxFrontier` highest-σ nodes
   * (σ desc, node asc — deterministic, replayable; highest-σ keeps
   * the mass that dominates the dependency sums), making forward
   * state ≤ k·rounds·cap rows at ANY graph size. None (the default,
   * and x19's oracled configuration) = exact Brandes-Pich. Capped
   * runs are a further estimate UNDER the sampled estimator — the
   * spec pins cap ≥ frontier ⇒ bit-identical, plus determinism.
   */
  def betweennessSampled(edges: DataFrame, seeds: Seq[Long],
      rounds: Int, maxFrontier: Option[Int] = None): DataFrame = {
    require(rounds >= 2,
      s"betweennessSampled: rounds must be >= 2 (got $rounds) — " +
        "within 1 hop there are no intermediate vertices")
    require(maxFrontier.forall(_ >= 1),
      s"betweennessSampled: maxFrontier must be >= 1 (got $maxFrontier)")
    val spark = edges.sparkSession
    val (e, eRdd) = materializeEdges(
      // Dedupe FIRST, repartition LAST (r16 shape, restored — see
      // pageRank's note; the r17 hoist was a measured 32-core
      // regression, and deduping before the exchange keeps the
      // map-side partial aggregate, guide §2.3/§2.5)
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct()
        .repartition(col("src")))
    import spark.implicits._
    // forward: layered BFS with exact integer path counts. Each LEVEL
    // is persisted once and `vis` is a lazy union of the level leaves —
    // the previous sharedScan(vis.union(fresh)) re-copied and
    // re-persisted the whole cumulative state every round (level 0's
    // rows were materialized `rounds` times), and the frontier was a
    // filter-scan over all settled levels instead of the one frame
    // that IS the frontier.
    var levels = Vector(InternalFrame.sharedScan(
      seeds.distinct.map(s => (s, s, 0L, 1L))
        .toDF("seed", "node", "d", "sigma")))
    def vis: DataFrame = levels.reduce(_ union _)
    for (t <- 1 to rounds) {
      val frontier = levels.last // exactly the d = t-1 rows
      val reached = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum("sigma").as("sigma"))
      val fresh0 = reached.join(vis.select("seed", "node"),
          Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(t.toLong).as("d"), col("sigma"))
      // frontier cap: keep each seed's maxFrontier highest-σ fresh
      // nodes (σ desc, node asc — deterministic at any partitioning);
      // one level-sized window, the price of bounding state at 100 TB
      val fresh = maxFrontier match {
        case Some(cap) =>
          fresh0.withColumn("fr", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("seed")
                .orderBy(col("sigma").desc, col("node"))))
            .filter(col("fr") <= cap).drop("fr")
        case None => fresh0
      }
      levels = levels :+ InternalFrame.sharedScan(fresh)
    }
    // backward: dependency accumulation from the deepest level; the
    // level-(t+1) deltas feed level t through one left join
    var deltaNext: DataFrame = null // (seed, node, delta_ppm) at level t+1
    var acc: DataFrame = null       // union of levels rounds-1 .. 1
    for (t <- (rounds - 1) to 1 by -1) {
      val cur = levels(t)
        .select(col("seed"), col("node").as("src"), col("sigma").as("sv"))
      val nxt0 = levels(t + 1)
        .select(col("seed"), col("node").as("dst"), col("sigma").as("sw"))
      val nxt =
        if (deltaNext == null) nxt0.withColumn("dw", lit(0L))
        else nxt0.join(
            deltaNext.select(col("seed"), col("node").as("dst"),
              col("delta_ppm")), Seq("seed", "dst"), "left")
          .withColumn("dw", coalesce(col("delta_ppm"), lit(0L)))
          .select("seed", "dst", "sw", "dw")
      val level = e.join(cur, "src").join(nxt, Seq("seed", "dst"))
        .select(col("seed"), col("src").as("node"),
          expr("(sv * (1000000 + dw)) div sw").as("term"))
        .groupBy("seed", "node").agg(sum("term").as("delta_ppm"))
      deltaNext = InternalFrame.sharedScan(level)
      acc = if (acc == null) deltaNext else acc.union(deltaNext)
    }
    val result = acc.groupBy("node")
      .agg(sum("delta_ppm").as("bet_ppm"))
    // materialize before dropping the edge blocks: the result plan
    // references the edge leaf, which would otherwise recompute
    val rot = new Rotation
    val (out, _) = rot.materialize(result, rowBytes = 16)
    rot.release()
    eRdd.unpersist(blocking = false)
    out
  }
}
