package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  // A fixed graph exercising every path: a hub (most in-links), a
  // dangling sink, parallel-ish weights, and a node with no in-edges.
  //   1→2(w3) 1→3(w1) 2→3(w2) 4→3(w1) 4→2(w1); 3 is dangling; 5 absent.
  private val fixedEdges: Seq[(Long, Long, Long)] =
    Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (4L, 3L, 1L), (4L, 2L, 1L))

  private def edgesDf(e: Seq[(Long, Long, Long)]): DataFrame =
    e.toDF("src", "dst", "w")

  /** Driver-side reference of the exact integer-rank recurrence. */
  private def refPageRank(e: Seq[(Long, Long, Long)], iters: Int,
      d: Double = 0.85, scale: Long = 1000000000L): Map[Long, Long] = {
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val ow = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = math.floor((1 - d) * scale.toDouble / n + 0.5).toLong
    var r = nodes.map(_ -> math.floor(scale.toDouble / n + 0.5).toLong).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(ow.contains).map(r).sum
      val dshare = math.floor(d * dm.toDouble / n + 0.5).toLong
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) =>
          math.floor(d * r(s) * w / ow(s) + 0.5).toLong
        }.sum
      }
      r = nodes.map(v => v -> (base + dshare + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def run(e: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edgesDf(e), iters).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("pageRank matches the driver-side integer recurrence exactly") {
    for (iters <- Seq(1, 3)) {
      assert(run(fixedEdges, iters) === refPageRank(fixedEdges, iters),
        s"mismatch at iters=$iters")
    }
  }

  test("rank mass is conserved within per-node rounding slack") {
    val r = run(fixedEdges, 3)
    val total = r.values.sum
    val n = r.size
    // each round floors n + 2 quantities; 3 rounds of ±0.5 each
    assert(math.abs(total - 1000000000L) <= 3L * (n + 2),
      s"mass drifted: $total")
  }

  test("the hub out-ranks its satellites and the sink absorbs the most mass") {
    val r = run(fixedEdges, 3)
    assert(r(3L) > r(2L), "sink 3 has the most in-mass")
    assert(r(2L) > r(1L) && r(2L) > r(4L), "hub 2 beats the source-only nodes")
  }

  test("result is invariant to input partitioning and parallel-edge grouping") {
    val base = run(fixedEdges, 3)
    val repart = Graph.pageRank(edgesDf(fixedEdges).repartition(7), 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(repart === base)
    // split edge (1,2,3) into two parallel edges summing to the same w
    val split = fixedEdges.filterNot(_ == (1L, 2L, 3L)) ++
      Seq((1L, 2L, 1L), (1L, 2L, 2L))
    assert(run(split, 3) === base)
  }

  /** Driver-side reference of the personalized (seeded) recurrence:
    * restart and dangling mass go to the seeds; state is nonzero-only. */
  private def refPpr(e: Seq[(Long, Long, Long)], seeds: Seq[Long], iters: Int,
      d: Double = 0.85, scale: Long = 1000000000L): Map[Long, Long] = {
    val ns = seeds.size
    val ow = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = math.floor((1 - d) * scale.toDouble / ns + 0.5).toLong
    var r = seeds.map(_ -> math.floor(scale.toDouble / ns + 0.5).toLong).toMap
    for (_ <- 1 to iters) {
      val dm = r.collect { case (v, m) if !ow.contains(v) => m }.sum
      val dshare = math.floor(d * dm.toDouble / ns + 0.5).toLong
      val contrib = e.filter(t => r.contains(t._1)).groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (s, _, w) =>
            math.floor(d * r(s) * w / ow(s) + 0.5).toLong
          }.sum
        }
      r = (seeds ++ contrib.keys).distinct.map(v =>
        v -> (contrib.getOrElse(v, 0L) +
          (if (seeds.contains(v)) base + dshare else 0L))).toMap
    }
    r
  }

  private def runPpr(e: Seq[(Long, Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, Long] =
    Graph.personalizedPageRank(edgesDf(e), seeds.toDF("node"), iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("personalizedPageRank matches the driver-side seeded recurrence; " +
      "state holds only the seed-reachable set") {
    for (iters <- Seq(1, 3)) {
      val got = runPpr(fixedEdges, Seq(1L), iters)
      assert(got === refPpr(fixedEdges, Seq(1L), iters),
        s"mismatch at iters=$iters")
    }
    // from seed 4 on 4→{2,3}, 2→3: reachable = {4, 2, 3} only — node 1
    // (a pure source elsewhere in the graph) never enters the state
    val st = runPpr(fixedEdges, Seq(4L), 2)
    assert(!st.contains(1L), "unreachable source leaked into PPR state")
    assert(st.keySet === Set(2L, 3L, 4L))
  }

  test("personalizedPageRank seeded at ALL nodes equals plain pageRank") {
    val all = (fixedEdges.map(_._1) ++ fixedEdges.map(_._2)).distinct
    assert(runPpr(fixedEdges, all, 3) === run(fixedEdges, 3))
  }

  test("personalizedPageRank is partition-invariant and restart mass " +
      "concentrates near the seed") {
    val base = runPpr(fixedEdges, Seq(1L), 3)
    val repart = Graph.personalizedPageRank(
      edgesDf(fixedEdges).repartition(7), Seq(1L).toDF("node"), 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(repart === base)
    // the seed keeps the restart share; its direct heavy neighbor (2,
    // w=3 of 4) outranks the node reached only via lighter paths until
    // the sink's absorption dominates — minimally: seed rank positive,
    // and total mass ≈ scale (conserved through restart + dangling)
    assert(base(1L) > 0L)
    assert(math.abs(base.values.sum - 1000000000L) <= 3L * (base.size + 2))
  }

  test("shortestPaths: hop distances on a path graph, frontier-bounded output") {
    // path 1-2-3-4-5 (undirected), source 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b, 1L), (b, a, 1L)) }
    def sp(rounds: Int): Map[Long, Long] =
      Graph.shortestPaths(edgesDf(und), Seq(1L), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sp(3) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(sp(5) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // multi-source takes the min over sources
    val ms = Graph.shortestPaths(edgesDf(und), Seq(1L, 5L), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ms === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("triangleCounts: planted K4 + pendant path, orientation-safe, input-shape invariant") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + path 4-5-6 (none)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val path = Seq((4L, 5L), (5L, 6L))
    // feed DUPLICATED and REVERSED edges: canonicalization must absorb both
    val noisy = (k4 ++ path).flatMap { case (a, b) => Seq((a, b), (b, a), (a, b)) }
    val got = Graph.triangleCounts(noisy.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // star graph (a hub, the skew case the orientation exists for): 0 triangles
    val star = (1L to 50L).map(i => (0L, i))
    assert(Graph.triangleCounts(star.toDF("src", "dst")).count() === 0)
    // partition invariance
    val again = Graph.triangleCounts(noisy.toDF("src", "dst").repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("labelPropagation: planted cliques converge to per-clique labels, partition-invariant") {
    // two K5s {1..5} and {11..15} joined by one bridge 5-11; plurality
    // wins, so the bridge cannot merge the cliques
    def k5(off: Long) = for { a <- 1 to 5; b <- a + 1 to 5 }
      yield (off + a, off + b)
    val edges = (k5(0) ++ k5(10) ++ Seq((5L, 11L)))
      .map { case (a, b) => (a.toLong, b.toLong) }
    val got = Graph.labelPropagation(edges.toDF("src", "dst"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(n => got(n) == 1L), s"clique 1 labels: $got")
    assert((11L to 15L).forall(n => got(n) == 11L), s"clique 2 labels: $got")
    // duplicated/reversed edges + partitioning must not change anything
    val noisy = edges.flatMap { case (a, b) => Seq((a, b), (b, a), (a, b)) }
    val again = Graph.labelPropagation(
      noisy.toDF("src", "dst").repartition(7), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("kCore: pendant chain peels away over rounds, K5 core survives exactly") {
    // K5 on {1..5} (every degree 4) + chain 5-6-7-8: degree-1 tip peels
    // first, the chain unravels one node PER ROUND — rounds matter
    val k5 = for { a <- 1 to 5; b <- a + 1 to 5 } yield (a.toLong, b.toLong)
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val edges = (k5 ++ chain).toDF("src", "dst")
    val r1 = Graph.kCore(edges, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(r1.contains(7L), "round 1 must not yet peel mid-chain node 7")
    val r3 = Graph.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3.keySet === Set(1L, 2L, 3L, 4L, 5L), s"core nodes: ${r3.keySet}")
    assert(r3.values.toSet === Set(4L), "K5 core degrees must all be 4")
    // partition invariance
    val again = Graph.kCore(edges.repartition(5), k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === r3)
  }

  test("weightedShortestPaths: cheap-long path beats expensive-short edge, " +
      "and relaxation re-decides earlier rounds") {
    // 1→3 direct costs 10; 1→2→3 costs 1+2=3. Round 1 must report the
    // expensive direct edge, round 2 must REVISE it down — the defining
    // difference from hop-count BFS, where reached distances are final.
    val e = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L))
    def wsp(rounds: Int): Map[Long, Long] =
      Graph.weightedShortestPaths(e.toDF("src", "dst", "w"), Seq(1L), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wsp(1) === Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(wsp(2) === Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 11L))
    assert(wsp(3) === Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
    // parallel edges keep the cheapest copy; negative weights rejected
    val par = Graph.weightedShortestPaths(
      (e ++ Seq((1L, 2L, 5L))).toDF("src", "dst", "w"), Seq(1L), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(par(2L) === 1L)
    intercept[IllegalArgumentException] {
      Graph.weightedShortestPaths(
        Seq((1L, 2L, -1L)).toDF("src", "dst", "w"), Seq(1L), 1)
    }
  }

  test("kCoreConverged: chain unravels to a verified fixpoint, " +
      "peel count is data-driven, fixed-round twin agrees") {
    // K5 + 4-link pendant chain 5-6-7-8-9 at k=2: the chain unravels
    // ONE node per peel (4 shrinking peels), then one stationary peel
    // proves the fixpoint — 5 total, decided by the data, not a param.
    val k5 = for { a <- 1 to 5; b <- a + 1 to 5 } yield (a.toLong, b.toLong)
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L))
    val edges = (k5 ++ chain).toDF("src", "dst")
    val (core, peels) = Graph.kCoreConverged(edges, k = 2)
    val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L), s"core nodes: ${got.keySet}")
    assert(got.values.toSet === Set(4L), "K5 core degrees must all be 4")
    assert(peels === 5, s"expected 4 shrinking + 1 stationary peel, got $peels")
    // the fixed-round superset closes onto the converged core at >= peels
    val fixed = Graph.kCore(edges, k = 2, rounds = peels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed === got)
    // k above the max degree: everything peels, empty fixpoint, no hang
    val (empty, _) = Graph.kCoreConverged(edges, k = 10)
    assert(empty.count() === 0)
  }

  test("all-dangling graph: mass redistributes uniformly") {
    // single edge, then its dst dangles; after round 1 both nodes carry
    // base + dshare (+ contrib for dst) — just assert determinism + keys
    val r = run(Seq((1L, 2L, 1L)), 2)
    assert(r.keySet === Set(1L, 2L))
    assert(r(2L) > r(1L))
  }

  /** Driver-side reference of the exact integer HITS recurrence. */
  private def refHits(e: Seq[(Long, Long, Long)], iters: Int,
      scale: Long = 1000000L): Map[Long, (Long, Long)] = {
    val w = e.groupBy(p => (p._1, p._2)).map { case (k, es) => k -> es.map(_._3).sum }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var h = nodes.map(_ -> scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val araw = w.toSeq.groupBy(_._1._2).map { case (dst, es) =>
        dst -> es.map { case ((s, _), wt) => wt * h.getOrElse(s, 0L) }.sum }
      val amax = araw.values.max
      a = araw.map { case (n, v) => n -> v * scale / amax }
      val hraw = w.toSeq.groupBy(_._1._1).map { case (src, es) =>
        src -> es.map { case ((_, d), wt) => wt * a.getOrElse(d, 0L) }.sum }
      val hmax = hraw.values.max
      h = hraw.map { case (n, v) => n -> v * scale / hmax }
    }
    nodes.map(n => n -> (a.getOrElse(n, 0L), h.getOrElse(n, 0L)))
      .filter { case (_, (av, hv)) => av != 0 || hv != 0 }.toMap
  }

  private def runHits(e: Seq[(Long, Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Graph.hits(edgesDf(e), iters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits matches the driver-side integer recurrence exactly") {
    for (iters <- Seq(1, 2)) {
      assert(runHits(fixedEdges, iters) === refHits(fixedEdges, iters),
        s"mismatch at iters=$iters")
    }
  }

  test("modularity: disjoint K5s score 0.25 per community under the " +
      "true partition, 0 under the everything-together partition") {
    import org.apache.spark.sql.functions.col
    val k5a = for { a <- 1 to 5; b <- a + 1 to 5 } yield (a.toLong, b.toLong)
    val k5b = for { a <- 11 to 15; b <- a + 1 to 15 } yield (a.toLong, b.toLong)
    val edges = (k5a ++ k5b).toDF("src", "dst")
    val truePart = ((1L to 5L).map(_ -> 1L) ++ (11L to 15L).map(_ -> 11L))
      .toDF("node", "label")
    val got = Graph.modularity(edges, truePart).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // per community: L=10, D=20, m=20 → 10/20 − (20/40)² = 0.25
    assert(got.keySet === Set(1L, 11L))
    got.values.foreach { case (n, l, d, q) =>
      assert((n, l, d) === ((5L, 10L, 20L)))
      assert(math.abs(q - 0.25) < 1e-9, s"q_part $q")
    }
    // degenerate one-community partition: Q = m/m − (2m/2m)² = 0
    val onePart = ((1L to 5L) ++ (11L to 15L)).map(_ -> 1L).toDF("node", "label")
    val q0 = Graph.modularity(edges, onePart).collect()
    assert(q0.length == 1 && math.abs(q0(0).getDouble(4)) < 1e-9,
      s"one-community Q must be 0: ${q0.toSeq}")
    // reversed/duplicated edges are canonicalized away
    val noisy = (k5a ++ k5b).flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val again = Graph.modularity(noisy, truePart).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(again.values.forall(q => math.abs(q - 0.25) < 1e-9))
  }

  test("hits: best hub and best authority carry the full scale; " +
      "partitioning and parallel edges don't move scores") {
    val r = runHits(fixedEdges, 2)
    assert(r.values.map(_._1).max === 1000000L, "max authority = scale")
    assert(r.values.map(_._2).max === 1000000L, "max hub = scale")
    // node 2 takes weight 3 from hub 1 (plus 1 from 4) — more in-WEIGHT
    // than node 3's three light links, so it is the top authority
    assert(r(2L)._1 === 1000000L, s"node 2 should be the top authority: $r")
    val repart = Graph.hits(edgesDf(fixedEdges).repartition(7), 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(repart === r)
    val split = fixedEdges.filterNot(_ == (1L, 2L, 3L)) ++
      Seq((1L, 2L, 1L), (1L, 2L, 2L))
    assert(runHits(split, 2) === r)
  }

  test("linkPrediction: RA terms exact, adjacent pairs excluded, degree cap drops hub wedges") {
    import spark.implicits._
    // square 1-2-3-4-1 (predict both diagonals, 2 common neighbors each)
    // ∪ triangle 10-11-12 (complete: nothing to predict)
    // ∪ star 20-{21,22,23} (leaf pairs via the deg-3 hub)
    // One square edge reversed: canonicalization must absorb it.
    val edges = Seq(
      (1L, 2L), (3L, 2L), (3L, 4L), (1L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (20L, 22L), (20L, 23L)).toDF("src", "dst")
    val got = Graph.linkPrediction(edges, topN = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      (1L, 3L) -> ((2L, 1000000L)), (2L, 4L) -> ((2L, 1000000L)),
      (21L, 22L) -> ((1L, 333333L)), (21L, 23L) -> ((1L, 333333L)),
      (22L, 23L) -> ((1L, 333333L))), s"got $got")
    // cap = 2 removes the deg-3 star hub as a wedge center; square
    // nodes (deg 2) survive
    val capped = Graph.linkPrediction(edges, topN = 50, maxWedgeDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 3L), (2L, 4L)), s"got $capped")
    // topN truncates on the (ra_ppm DESC, u, v) total order
    val top2 = Graph.linkPrediction(edges, topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top2 == Seq((1L, 3L), (2L, 4L)), s"got $top2")
  }

  test("randomWalks: every choice replays the driver-side hash-min argmin; partition-invariant") {
    import spark.implicits._
    // two triangles bridged by 3-4: real branching at every node
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val adj: Map[Long, Seq[Long]] = {
      val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      (und ++ und.map(p => (p._2, p._1))).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sorted }
    }
    def h52(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    val walks = Graph.randomWalks(e, walksPerNode = 2, length = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(walks.size == 6 * 2 * 4, s"6 nodes x 2 walks x 4 positions: ${walks.size}")
    for (node <- 1L to 6L; i <- 0 to 1) {
      val w = node * 2 + i
      assert(walks((w, 0)) == node, "step 0 is the seed")
      var cur = node
      for (t <- 1 to 3) {
        val exp = adj(cur).minBy(v => (h52(s"rw:$w:$t:$v"), v))
        assert(walks((w, t)) == exp, s"walk $w step $t: got ${walks((w, t))}, want $exp")
        cur = exp
      }
    }
    val repart = Graph.randomWalks(e.repartition(7), walksPerNode = 2, length = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(repart == walks)
  }

  test("pageRankConverged: settles on a period-<=2 attractor; any fixed " +
      "unroll past it reproduces the same envelope") {
    import spark.implicits._
    // cycle + branch + dangling node (5 has no in-edges, 6 no out-edges)
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (3L, 4L, 2L),
      (4L, 1L, 1L), (5L, 1L, 1L), (4L, 6L, 1L)).toDF("src", "dst", "w")
    val (got, rounds) = Graph.pageRankConverged(e, maxRounds = 200)
    val fix = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds > 1, s"trivial convergence in $rounds rounds")
    // the static-oracle property: for ANY fixed N past settling,
    // greatest(state_N, state_{N+1}) equals the returned envelope
    for (n <- Seq(rounds, rounds + 3)) {
      val a = Graph.pageRank(e, iters = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Graph.pageRank(e, iters = n + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val env = a.keys.map(k => k -> math.max(a(k), b(k))).toMap
      assert(env == fix, s"unroll pair ($n, ${n + 1}) diverges from envelope")
    }
    // mass conservation at the attractor (within quantization slack)
    assert(math.abs(fix.values.sum - 1000000000L) < fix.size * 2)
  }

  test("probe: pageRankConverged settle round at x15's gate parameters") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val cp = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_partkey") < 20)
        .select(col("o_custkey").as("c"), col("l_partkey").as("pk"))
        .distinct()
      val und = cp.as("a").join(cp.as("b"),
          col("a.pk") === col("b.pk") && col("a.c") < col("b.c"))
        .select(col("a.c").as("src"), col("b.c").as("dst"))
        .distinct()
      val edges = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("w", lit(1L))
      val (_, rounds) = Graph.pageRankConverged(edges,
        damping = 0.5, scale = 1000000L, maxRounds = 60)
      info(s"$sf co-purchase graph settled in $rounds rounds")
      // detection fires at t+1 when state(t+1)==state(t-1), so the
      // attractor holds from round rounds-2 on; x15's oracle reads
      // greatest(r24, r25), valid iff rounds-2 <= 24. Asserting the
      // EXACT validity bound — not a loose one — so this probe fails
      // before the gate can silently hash-mismatch on new data.
      assert(rounds <= 26, s"$sf took $rounds rounds — x15's 25-round " +
        "oracle unroll is too short for this data")
    }
  }

  test("labelPropagationConverged: detects the period-2 label swap on a " +
      "single edge; envelope is the phase-invariant least()") {
    import spark.implicits._
    // one edge: synchronous LPA swaps 1<->2 forever — the classic
    // oscillation; never a fixpoint, so the 2-gap probe is load-bearing
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val (got, rounds) = Graph.labelPropagationConverged(e)
    val fix = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fix == Map(1L -> 1L, 2L -> 1L), s"got $fix")
    // static-oracle property: least(round N, round N+1) for any N past
    // settling equals the envelope
    for (n <- Seq(rounds, rounds + 3)) {
      val a = Graph.labelPropagation(e, n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Graph.labelPropagation(e, n + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val env = a.keys.map(k => k -> math.min(a(k), b(k))).toMap
      assert(env == fix, s"unroll pair ($n, ${n + 1}) diverges from envelope")
    }
    // a triangle + pendant converges too (fixpoint case, period 1)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L))
      .toDF("src", "dst")
    val (gotTri, rTri) = Graph.labelPropagationConverged(tri)
    val fixTri = gotTri.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixTri.values.toSet.size >= 1 && rTri >= 2)
    val a = Graph.labelPropagation(tri, rTri)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(tri, rTri + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.keys.map(k => k -> math.min(a(k), b(k))).toMap == fixTri)
  }

  test("probe: labelPropagationConverged settle round on the co-purchase " +
      "graph per SF (x16's oracle unrolls 13)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val cp = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_partkey") < 20)
        .select(col("o_custkey").as("c"), col("l_partkey").as("pk"))
        .distinct()
      val edges = cp.as("a").join(cp.as("b"),
          col("a.pk") === col("b.pk") && col("a.c") < col("b.c"))
        .select(col("a.c").as("src"), col("b.c").as("dst"))
      val (_, rounds) = Graph.labelPropagationConverged(edges)
      info(s"$sf co-purchase LPA settled in $rounds rounds")
      // x16's oracle reads least(l12, l13): valid iff the attractor
      // holds from round 12, i.e. rounds-2 <= 12 (same derivation as
      // the x15 probe). LPA has no contraction bound, so this probe —
      // now covering the bench SF too — is the unroll-margin evidence.
      assert(rounds <= 14, s"$sf took $rounds rounds — x16's 13-round " +
        "oracle unroll is too short for this data")
    }
  }

  test("skipGramPairs: window-bounded ordered pairs, cross-walk counts sum") {
    import spark.implicits._
    // walk 1: 10-11-12-13; walk 2: 11-12 — the (11,12) pair occurs in both
    val walks = Seq(
      (1L, 0, 10L), (1L, 1, 11L), (1L, 2, 12L), (1L, 3, 13L),
      (2L, 0, 11L), (2L, 1, 12L)).toDF("walk_id", "step", "node")
    val got = Graph.skipGramPairs(walks, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exp = Map(
      (10L, 11L) -> 1L, (10L, 12L) -> 1L,            // window 2 stops before 13
      (11L, 10L) -> 1L, (11L, 12L) -> 2L, (11L, 13L) -> 1L,
      (12L, 10L) -> 1L, (12L, 11L) -> 2L, (12L, 13L) -> 1L,
      (13L, 11L) -> 1L, (13L, 12L) -> 1L)
    assert(got == exp, s"got $got")
    // every count is symmetric by construction of the ordered-pair emit
    got.foreach { case ((c, x), n) => assert(got((x, c)) == n) }
  }

  test("skipGramPairs: the join is equi-keyed on (walk_id, step) — the " +
      "window offset lives IN the key, not in a post-join band filter") {
    import spark.implicits._
    val walks = Seq(
      (1L, 0, 10L), (1L, 1, 11L), (1L, 2, 12L), (1L, 3, 13L))
      .toDF("walk_id", "step", "node")
    val qe = Graph.skipGramPairs(walks, window = 2).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty, "expected a join in the plan")
    val cond = joins.map(_.condition.map(_.sql).getOrElse("")).mkString(" | ")
    // both key columns appear as equalities; no abs() band predicate
    assert(cond.contains("walk_id") && cond.contains("step"),
      s"join keys must include walk_id AND step: $cond")
    assert(!cond.toLowerCase.contains("abs"),
      s"band filter leaked into the join: $cond")
    // physical plan: an equi join (hash or sort-merge), never nested-loop
    val phys = qe.executedPlan.toString
    assert(!phys.contains("NestedLoop"), phys)
  }

  test("harmonicCloseness: exact ⌊1e6/d⌋ sums on a planted path graph") {
    import spark.implicits._
    // path 1—2—3—4 (symmetrized); seeds {1, 4}, 3 rounds reach all
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.harmonicCloseness(edges, seeds = Seq(1L, 4L), rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // node: (reached seeds at d>=1, Σ ⌊1e6/d⌋)
    assert(got === Map(
      1L -> (1L, 333333L),            // d(4,1)=3
      2L -> (2L, 1000000L + 500000L), // d(1,2)=1, d(4,2)=2
      3L -> (2L, 500000L + 1000000L), // d(1,3)=2, d(4,3)=1
      4L -> (1L, 333333L)))           // d(1,4)=3
  }

  test("double-sweep pivot: farthest-node argmax from a mid-path seed " +
      "finds an end, and the second sweep certifies the diameter") {
    import spark.implicits._
    // path 1—2—3—4—5; seed at 3 (eccentricity 2); ends 1 and 5 are
    // farthest, min-id tie-break picks 1; sweep from 1 reaches d=4
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val d1 = Graph.shortestPaths(edges, sources = Seq(3L), rounds = 4)
    val pivot = d1.orderBy(col("dist").desc, col("node")).limit(1).head.getLong(0)
    assert(pivot == 1L, s"mid-path seed must pick the min-id end, got $pivot")
    val d2 = Graph.shortestPaths(edges, sources = Seq(pivot), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2.values.max == 4L, "second sweep must certify the true diameter")
    assert(d2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("harmonicCloseness: seed-panel rows exclude d=0 and a too-short " +
      "horizon leaves distant nodes unscored, not misscored") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.harmonicCloseness(edges, seeds = Seq(1L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // rounds=2 never reaches node 4; node 1 is the seed itself (d=0)
    assert(got === Map(2L -> 1000000L, 3L -> 500000L))
  }

  test("betweennessSampled: Brandes deltas on a planted path — interior " +
      "nodes carry pairs-through counts in ppm, ends and seed excluded") {
    import spark.implicits._
    // path 1—2—3—4—5, seed {1}, 4 rounds reach everything. δ_1(v) =
    // number of targets whose shortest path passes v: 2 carries
    // {3,4,5} → 3e6, 3 carries {4,5} → 2e6, 4 carries {5} → 1e6;
    // node 5 lies on no path (absent), node 1 is the seed (excluded).
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.betweennessSampled(edges, seeds = Seq(1L), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 3000000L, 3L -> 2000000L, 4L -> 1000000L))
  }

  test("betweennessSampled: path-count splitting on a diamond — two " +
      "equal shortest paths halve the dependency; multi-seed sums") {
    import spark.implicits._
    // diamond 1—2—4, 1—3—4 (symmetrized): σ(4 from 1) = 2, so each
    // middle node carries ⌊1e6·1/2⌋ per seed side. Seeds {1, 4}: both
    // middles get 500000 from each sweep → 1000000 total; 1 and 4
    // appear only as seeds or path ENDPOINTS, never interior (absent).
    val und = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.betweennessSampled(edges, seeds = Seq(1L, 4L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 1000000L, 3L -> 1000000L))
    // partition invariance: the accumulation is aggregate-exact
    val again = Graph.betweennessSampled(edges.repartition(7),
      seeds = Seq(1L, 4L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("betweennessSampled: maxFrontier cap — identity when the cap " +
      "covers every frontier, deterministic highest-σ keep when it cuts") {
    import spark.implicits._
    // seed 1 → level 1 {2, 8} (fits cap=2); level 2 fresh {9, 5, 6}
    // where σ(9)=2 (via both 2 and 8) and σ(5)=σ(6)=1. Cap=2 must
    // keep 9 FIRST despite its larger id (σ desc beats node asc) then
    // 5 (node asc among the σ=1 ties), dropping 6's dependency.
    val und = Seq((1L, 2L), (1L, 8L), (2L, 9L), (8L, 9L), (2L, 5L), (2L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // exact: δ(2) = ⌊1e6·1/2⌋ [via 9] + 1e6 [5] + 1e6 [6] = 2500000;
    // δ(8) = 500000 [via 9]
    val exact = Graph.betweennessSampled(edges, Seq(1L), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact === Map(2L -> 2500000L, 8L -> 500000L))
    // cap >= every frontier => bit-identical to uncapped
    val wide = Graph.betweennessSampled(edges, Seq(1L), rounds = 3,
        maxFrontier = Some(100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide === exact)
    // cap=2 keeps {9, 5} at level 2: node 6's 1e6 leaves δ(2)
    val cut = Graph.betweennessSampled(edges, Seq(1L), rounds = 3,
        maxFrontier = Some(2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cut === Map(2L -> 1500000L, 8L -> 500000L), s"got $cut")
    // determinism under repartitioning (the keep order is total)
    val cutAgain = Graph.betweennessSampled(edges.repartition(5), Seq(1L),
        rounds = 3, maxFrontier = Some(2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cutAgain === cut)
  }

  test("x21: the gated maxFrontier cap BINDS on the trade graph — the " +
      "capped query differs from exact x19 and its state stays bounded") {
    val dir = "/root/testdata/sf0.001"
    def run(name: String) = graft.queries.Q.all.find(_.name == name).get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = run("x19_betweenness")
    val capped = run("x21_betweenness_capped")
    assert(capped.nonEmpty)
    // the cap must genuinely cut: a seed supplier reaches far more
    // than 8 customers at level 1 even at sf0.001, so the capped
    // estimator diverges from exact Brandes-Pich on this graph
    assert(capped !== exact,
      "maxFrontier=8 must bind on the trade graph (did the data shrink?)")
    // every capped-survivor node also exists in the exact run (the cap
    // only DROPS frontier mass, never invents paths)
    assert(capped.keySet.subsetOf(exact.keySet))
  }
}
