package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.InternalFrame

/**
 * Similarity search over embedding columns (array<float>/array<double>).
 *
 * Scale posture: the query side is assumed small (≪ corpus) and is
 * broadcast, so brute-force is a broadcast nested-loop with NO shuffle of
 * the corpus; the LSH variant buckets both sides so the join is equi-key
 * and each bucket is tiny. Vector math is native codegen'd Catalyst
 * expressions (`graft.functions.VectorExpressions`) — a tight Java loop
 * inside whole-stage codegen, not interpreted HOF lambdas, not UDFs.
 */
object Similarity {

  /** Dot product of two array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Euclidean norm of an array column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array columns (0 for zero vectors). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  /** Squared euclidean distance of two array columns. */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.sqDist(a, b)

  /**
   * Exact top-k cosine neighbors for each query vector.
   * `queries`/`corpus`: (idCol, vecCol). Queries are broadcast and the
   * ranking happens in the `graft_topk` native aggregate — per-partition
   * k-entry heaps, map-side combined, so the shuffle carries only
   * queries×k candidates (a rank window would shuffle every scored
   * pair). Ranking is deterministic (similarity desc, then corpus id).
   * Output: query_id, rank, neighbor_id, cosine.
   */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), col("cos"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"),
        col("nb.score").as("cos"))
  }

  /**
   * MAXIMAL MARGINAL RELEVANCE re-rank (Carbonell & Goldstein 1998 —
   * the standard diversity-aware final stage of a retrieval pipeline;
   * in an LLM data/RAG context, the rule that keeps a context window
   * from filling with near-duplicate passages): from each query's
   * top-`m` candidate pool, greedily select `k` results maximizing
   * λ·rel(q, d) − (1−λ)·max_{s∈selected} sim(d, s). λ arrives in
   * TENTHS so every score is an exact integer (score = rel·λ₁₀ −
   * maxsim·(10−λ₁₀) over micro-quantized cosines — no float ever
   * ranks), and ties break on the lower id: the whole greedy
   * trajectory is deterministic and engine-replayable. The greedy
   * itself is ROW-LOCAL: each query's pool + pairwise sims collect
   * to two arrays (m and m·(m−1) values — candidate-pool-sized
   * however large the corpus) and one native `MmrSelect` scan emits
   * the k picks — a k-stage unrolled join/window formulation of the
   * same selection measured 442 shuffle Exchanges in the r17 plan
   * audit from its recursive lineage; this plan is one pair join +
   * two collect aggregates + the native scan. The corpus is touched
   * only by the top-m stage ([[knnBruteForce]] here; any ANN ladder
   * rung yields the same shape). Output: (query_id, pos 1..k,
   * neighbor_id, score).
   */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, m: Int = 20, k: Int = 5,
      lambdaTenths: Int = 7): DataFrame = {
    require(m >= k && k >= 1, s"mmrRerank: m=$m k=$k")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"mmrRerank: lambdaTenths=$lambdaTenths")
    val cand = knnBruteForce(queries, corpus, idCol, vecCol, m)
      .select(col("query_id"), col("neighbor_id").as("nid"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("rel"))
    val cv = corpus.select(col(idCol).as("nid"), col(vecCol).as("v"))
    val cav = cand.join(cv, "nid").select("query_id", "nid", "v")
    val sims = cav.as("a").join(cav.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.nid") =!= col("b.nid"))
      .select(col("a.query_id").as("query_id"), col("a.nid").as("nid_a"),
        col("b.nid").as("nid_b"),
        floor(cosine(col("a.v"), col("b.v")) * 1e6 + 0.5).cast("long").as("s"))
    val pool = cand.groupBy("query_id")
      .agg(collect_list(struct(col("nid"), col("rel"))).as("pool"))
    val edges = sims.groupBy("query_id")
      .agg(collect_list(struct(col("nid_a"), col("nid_b"), col("s"))).as("edges"))
    // left join + typed empty default: a single-candidate pool has no
    // pair edges and must still yield its one pick, not vanish
    pool.join(edges, Seq("query_id"), "left")
      .select(col("query_id"), explode(graft.functions.VectorExpressions
        .mmrSelect(col("pool"), coalesce(col("edges"),
          array().cast("array<struct<nid_a: bigint, nid_b: bigint, s: bigint>>")),
          k, lambdaTenths)).as("p"))
      .select(col("query_id"), col("p.pos").as("pos"),
        col("p.nid").as("neighbor_id"), col("p.score").as("score"))
  }

  /**
   * ADJUSTED RAND INDEX census over a clustering contingency table
   * (Hubert & Arabie 1985): given (a_cell, b_cell, n) counts, returns
   * (Σ C(n_ij,2), Σ C(a_i,2), Σ C(b_j,2), C(N,2), ARI micro) — every
   * sum exact BigInt (cn2·sij at corpus scale needs ~2^70; the oracle
   * computes the identical division in HUGEINT), the final division
   * truncating toward zero, 0 on a degenerate (single-cluster ×
   * single-cluster) table.
   */
  def ariMicro(cont: Seq[(Int, Int, Long)])
      : (BigInt, BigInt, BigInt, BigInt, Long) = {
    def c2(x: BigInt): BigInt = x * (x - 1) / 2
    val sij = cont.map(c => c2(BigInt(c._3))).sum
    val sa = cont.groupBy(_._1).values
      .map(g => c2(BigInt(g.map(_._3).sum))).sum
    val sb = cont.groupBy(_._2).values
      .map(g => c2(BigInt(g.map(_._3).sum))).sum
    val cn2 = c2(BigInt(cont.map(_._3).sum))
    val denom = cn2 * (sa + sb) - 2 * sa * sb
    val ari = if (denom == 0) BigInt(0)
      else BigInt(2000000) * (cn2 * sij - sa * sb) / denom
    (sij, sa, sb, cn2, ari.toLong)
  }

  /**
   * Cosine RANGE search: every (query, corpus) pair with cosine ≥ `tau`
   * — the "all sufficiently-similar neighbors" primitive (dedup
   * candidate mining, recall-oriented retrieval), where top-k's fixed
   * cutoff is the wrong shape. Queries broadcast (model-sized set); the
   * corpus streams through one scan of the codegen'd cosine expression
   * and the ≥-filter runs BEFORE anything shuffles — output is
   * hits-sized, and with no ranking there is no per-query aggregate at
   * all, so a hot query cannot skew. For corpus-×-corpus range joins at
   * 100 TB use the LSH-bucketed candidate path (`knnLsh`'s keying) —
   * brute scan is the right plan only while one side broadcasts.
   * Output: (query_id, neighbor_id, cos), exact.
   */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, tau: Double): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /**
   * Random-hyperplane LSH bucket key: `planes` sign bits packed into a
   * long. Hyperplane coefficients are seeded literals (ship with the
   * plan). `dim` is the embedding dimensionality.
   */
  /** The seeded hyperplane table behind [[hyperplaneKey]] — public so
    * the DuckDB oracle can embed the identical coefficients as literals. */
  def hyperplaneCoeffs(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  def hyperplaneKey(vec: Column, dim: Int, planes: Int = 16, seed: Long = 7L): Column = {
    // ONE native expression for all planes: the per-plane
    // dot(v, typedlit) formulation generated planes× separate codegen'd
    // dots whose Janino compile dominated small queries.
    import org.apache.spark.sql.graftshim.{ColumnBridge, HyperplaneKey}
    ColumnBridge.column(HyperplaneKey(
      ColumnBridge.expression(vec.cast("array<double>")),
      hyperplaneCoeffs(dim, planes, seed).map(_.toArray).toArray))
  }

  /**
   * IVF (inverted-file) approximate top-k: a k-means coarse quantizer
   * partitions the corpus into `clusters` cells; each query probes its
   * `nprobe` nearest cells and reranks exactly inside them.
   *
   * Scale posture: centroids are model-sized and broadcast; corpus cell
   * assignment is ONE narrow map (argmin over the centroid literals via
   * the native codegen'd `CellArgmin` expression — no UDF, no
   * corpus×clusters blowup); the probe join is equi-keyed on
   * cell id, touching ~nprobe/clusters of the corpus per query. Cell
   * skew is bounded by k-means balance; at extreme scale raise
   * `clusters` so cells fit a task.
   */
  def knnIvf(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, clusters: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    // The quantizer needs only the coarse shape of the distribution:
    // train it on a bounded sample (standard IVF practice — FAISS
    // trains on ~256 vectors/cell), and do the Lloyd iterations on the
    // driver — the sample is model-sized (≤ clusters·256 vectors), so
    // a distributed k-means would spend 20+ scheduler round-trips on
    // milliseconds of arithmetic.
    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .limit(clusters * 256).collect()
      .map(_.getSeq[Double](0).toArray)
    knnIvfWithCenters(queries, corpus, idCol, vecCol, k,
      lloyd(sample, clusters, iters = 10, seed), nprobe)
  }

  /**
   * IVF probe/rerank over EXPLICIT cell centers (the building block
   * `knnIvf` delegates to after Lloyd). With deterministic centers —
   * e.g. seed vectors taken straight from the corpus — the whole
   * operator is closed-form and oracle-checkable.
   */
  def knnIvfWithCenters(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, centers: Array[Array[Double]], nprobe: Int): DataFrame = {
    // assignment/probing are native codegen'd expressions (the center
    // matrix rides along as one referenced object, like HyperplaneKey) —
    // a Scala UDF here boxes every corpus vector into Seq[Double] on
    // the hottest path of the operator
    import graft.functions.VectorExpressions.{cellArgmin, cellProbes}
    val corpusVec = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val cell = corpusVec.withColumn("cell", cellArgmin(col("cv"), centers))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(cellProbes(col("qv"), centers, nprobe)))
    // cells are disjoint, so no per-neighbor dedup is needed before the
    // heap aggregate; the shuffle carries queries×k candidates only
    cell.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), col("cos"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cos"))
  }

  /**
   * IVF-SQ8 — coarse cells + INT8-QUANTIZED RESIDUALS, the FAISS
   * IndexIVFScalarQuantizer recipe and the middle rung of the
   * compression ladder (a09's flat int8 → this → a15's IVF-PQ): 8
   * bits/dim like a09 but quantizing the residual v − centroid, whose
   * dynamic range is a cell-diameter instead of the whole space — the
   * same bits buy finer resolution wherever the coarse quantizer is
   * doing its job. Encode is ONE native scan per corpus vector
   * (`CellResidualSq8`: argmin cell, residual, max-abs, quantize —
   * never three interpreted HOF passes); scoring decodes the probed
   * cells (`Sq8Decode`) and ranks by exact squared distance to the
   * RECONSTRUCTION (ADC), so every arithmetic step replays in SQL.
   * At 100 TB the stored index is cell + scale + d bytes/vector and
   * the probe plan is knnIvf's: disjoint cells, broadcast queries,
   * candidates-only shuffle into the native top-k heap.
   */
  def knnIvfSq8(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, centers: Array[Array[Double]], nprobe: Int): DataFrame = {
    import graft.functions.VectorExpressions.{cellProbes, cellResidualSq8, sq8Decode}
    val enc = corpus
      .select(col(idCol).as("neighbor_id"),
        cellResidualSq8(col(vecCol).cast("array<double>"), centers).as("z"))
      .select(col("neighbor_id"), col("z.cell").as("cell"),
        sq8Decode(col("z"), centers).as("vhat"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(cellProbes(col("qv"), centers, nprobe)))
    enc.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        (floor(sqDist(col("qv"), col("vhat")) * 1e6 + lit(0.5)) / 1e6).as("adist"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), -col("adist"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), (-col("nb.score")).as("adist"))
  }

  /**
   * DISTRIBUTED Lloyd k-means over the FULL corpus — the semantic-
   * clustering primitive (corpus balancing, cluster-census curation)
   * where cluster shape must reflect all the data, complementing
   * `knnIvf`'s bounded-sample driver Lloyd (which only needs the coarse
   * shape). Per iteration: assignment is ONE narrow codegen'd pass
   * (native `CellArgmin` against broadcast centers — no corpus×k join),
   * update is a (cell, dim) aggregate whose result is k×d rows — model-
   * sized however large the corpus — collected and rebroadcast.
   *
   * Determinism: init = the first k vectors by (id, vector) — the
   * vector tiebreak keeps the seed set stable even when ids collide
   * across partitions (with unique ids it is exactly first-k-by-id);
   * each updated
   * coordinate is quantized to 1/`quant` units BEFORE becoming the next
   * round's center, so summation-order ulps (Spark vs any oracle engine,
   * run vs run) cannot leak into the next assignment — an assignment
   * flip would need a true mean within ~1e-16 of a quantization
   * boundary. Empty cells keep their previous center.
   */
  def kmeansFitDistributed(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, quant: Double = 1e6): Array[Array[Double]] = {
    import graft.functions.VectorExpressions.cellArgmin
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    var centers = vecs.orderBy(col("id"), col("v")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(centers.length == k, s"corpus has fewer than $k vectors")
    var it = 0
    while (it < iters) {
      val upd = vecs
        .select(cellArgmin(col("v"), centers).as("cell"),
          posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cell", "i")
        .agg((floor(avg("x") * quant + lit(0.5)) / quant).as("q"))
        .collect()
      val next = centers.map(_.clone)
      upd.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        val arr = new Array[Double](centers(0).length)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        next(cell) = arr
      }
      centers = next
      it += 1
    }
    centers
  }

  /**
   * k-means|| initialization (Bahmani et al. 2012, "Scalable
   * k-means++" — the init Spark MLlib itself defaults to): instead of
   * k-means++'s k SEQUENTIAL full-corpus passes, each of `rounds`
   * passes samples an expected `ell` points with probability
   * ∝ their squared distance to the current candidate set, the
   * oversampled candidates are weighted by how many corpus points they
   * own, and a driver-side weighted recluster (here: Gonzalez's
   * farthest-point traversal, weight × distance objective) reduces
   * them to k centers. This is THE 100 TB init — O(rounds) scans,
   * model-sized driver state — where [[kmeansFitDistributed]]'s
   * first-k-by-id init is the small-data placeholder.
   *
   * Determinism (the oracle discipline): the random coin is the salted
   * portable hash — point x joins the candidate set in round r iff
   * md5Hash52("a26:r:" || id) < ⌊min(1, ell·cost_q(x)/φ)·2^52⌋ — with
   * per-point costs FLOOR-QUANTIZED to 1/`quant` units (exact longs, so
   * φ is an exact integer in any aggregation order; p09's sampling
   * trick at vector grain). Candidate order is (round asc, id asc);
   * seed = the min-id vector. A point at distance 0 to the candidate
   * set has threshold 0 and can never re-sample — duplicates
   * self-exclude. The greedy recluster maximizes
   * ⌊weight·d²·quant+0.5⌋ to the chosen set (tie → lowest candidate
   * index; all-zero scores fall through to lowest index), so every
   * choice replays as closed-form SQL.
   *
   * Scale shape per round: ONE narrow pass (native [[graftshim.CellMinDist]]
   * cost + exact-long sum for φ, then the hash-coin filter) with
   * model-sized collects — the codebook-fit posture; the weighting
   * pass is one [[graftshim.CellArgmin]] census. No corpus shuffle
   * anywhere; the candidate set (≈ 1 + rounds·ell) broadcasts inside
   * the referenced-object expressions.
   *
   * Returns the k centers in SELECTION ORDER (cell index = selection
   * rank, so downstream assignment is deterministic).
   */
  def kmeansParallelInit(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, ell: Int, quant: Double = 1e6): Array[Array[Double]] = {
    import graft.functions.VectorExpressions.{cellArgmin, cellMinDist, md5Hash52}
    require(k >= 1 && rounds >= 1 && ell >= 1,
      s"kmeansParallelInit: k=$k rounds=$rounds ell=$ell")
    val vecs = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val seed = vecs.orderBy(col("id"), col("v")).limit(1).collect()
    require(seed.nonEmpty, "kmeansParallelInit: empty corpus")
    val cands = scala.collection.mutable.ArrayBuffer(
      seed(0).getSeq[Double](1).toArray)
    for (r <- 1 to rounds) {
      val c = cands.toArray
      val costF = vecs.select(col("id"), col("v"),
        floor(cellMinDist(col("v"), c) * quant + lit(0.5)).cast("long").as("cost_q"))
      val phi = costF.agg(sum("cost_q")).collect()(0).getLong(0)
      if (phi > 0) {
        val thr = floor(least(lit(1.0),
            lit(ell.toDouble) * col("cost_q").cast("double") / lit(phi.toDouble))
          * lit(4503599627370496.0)).cast("long")
        val coin = md5Hash52(concat(lit(s"a26:$r:"), col("id").cast("string")))
        cands ++= costF.where(coin < thr)
          .select(col("id"), col("v")).orderBy("id")
          .collect().map(_.getSeq[Double](1).toArray)
      }
    }
    val all = cands.toArray
    require(all.length >= k,
      s"kmeansParallelInit: only ${all.length} candidates for k=$k — raise ell/rounds")
    val wRows = vecs.select(cellArgmin(col("v"), all).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n")).collect()
    val w = new Array[Long](all.length)
    wRows.foreach(r => w(r.getInt(0)) = r.getLong(1))
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(
      w.indices.minBy(i => (-w(i), i)))
    while (chosen.length < k) {
      val scores = all.indices.map { i =>
        if (chosen.contains(i)) -1L
        else {
          val mind2 = chosen.map(j => sq(all(i), all(j))).min
          math.floor(w(i) * mind2 * quant + 0.5).toLong
        }
      }
      chosen += all.indices.minBy(i => (-scores(i), i))
    }
    chosen.map(all).toArray
  }

  /**
   * ORACLE-REPLAYABLE IVF quantizer: driver Lloyd like [[knnIvf]]'s,
   * but every step is closed-form in SQL — the sample is the first
   * `sampleN` corpus vectors by id (a deterministic total order, not a
   * partition-order limit), init is the first `clusters` sample
   * vectors, and each updated coordinate is quantized to 1/`quant`
   * units before the next assignment (the a08/kmeansFitDistributed
   * cross-engine determinism trick: summation-order ulps between
   * engines cannot survive the floor). 2 iterations unroll to a
   * tractable CTE chain; the 10-iteration seeded-shuffle quantizer
   * remains [[knnIvf]]'s default (better balance, spec-covered).
   */
  def ivfQuantizerReplayable(corpus: DataFrame, idCol: String, vecCol: String,
      clusters: Int, iters: Int = 2, sampleN: Int = 4096,
      quant: Double = 1e6): Array[Array[Double]] = {
    val sample = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.length >= clusters, s"sample ${sample.length} < k $clusters")
    var centers = sample.take(clusters).map(_.clone)
    val dim = sample.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(clusters)(new Array[Double](dim))
      val counts = new Array[Int](clusters)
      sample.foreach { x =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < clusters) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = x(i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      centers = centers.indices.map { c =>
        if (counts(c) == 0) centers(c)
        else sums(c).map(x => math.floor(x / counts(c) * quant + 0.5) / quant)
      }.toArray
      it += 1
    }
    centers
  }

  /** Driver-side Lloyd k-means for model-sized samples: deterministic
    * seeded init (distinct sample rows), empty cells keep their center. */
  private[ops] def lloyd(sample: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty quantizer sample")
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(sample.indices.toVector).take(math.min(k, sample.length))
    var centers = init.map(i => sample(i).clone).toArray
    val dim = sample.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Int](centers.length)
      sample.foreach { x =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centers.length) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = x(i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      centers = centers.indices.map { c =>
        if (counts(c) == 0) centers(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centers
  }

  /**
   * Product-quantization (PQ) approximate top-k (Jégou, Douze & Schmid
   * 2011): the vector splits into `m` contiguous subspaces, each
   * quantized independently against its own small codebook, so a corpus
   * vector compresses to m codes — m BYTES at ≤256 codes/subspace, a
   * 32× memory/shuffle reduction over d=64 float32 — while search
   * quality degrades gracefully (the quantization error is the sum of
   * per-subspace errors, not a single coarse cell's).
   *
   * Scoring is asymmetric distance (ADC): the EXACT query vector
   * against the reconstructed corpus vector. It is computed here as one
   * native `sqDist` against the concatenation of the assigned codebook
   * entries — arithmetically identical to the classic m-lookup-table
   * sum, but it keeps the 64-add summation order identical to the
   * exact path, so the oracle can replay it bit-for-bit.
   *
   * Scale posture: codebooks are model-sized broadcasts (m·k·d/m
   * doubles ≈ the full seed set); encoding is one narrow codegen'd pass
   * (m `CellArgmin` expressions over array slices — no corpus×codebook
   * join); at 100 TB the CODES column is what persists and shuffles
   * (l03's layout move applies verbatim: codes partition, vectors
   * stay home), and reconstruction happens only at scoring time
   * against the broadcast codebooks. Ranking distances floor-quantize
   * to 1e-6 before the heap so summation-order ulps can never flip a
   * rank between engines.
   *
   * `codebooks(j)` holds subspace j's centroids (all of length d/m).
   */
  /**
   * IVF-PQ composite ANN — the standard production recipe (Jégou et
   * al. 2011): a coarse quantizer prunes the corpus to `nprobe` cells,
   * and within probed cells candidates rank by PQ asymmetric distance
   * on reconstructed vectors. One corpus pass computes BOTH the cell
   * assignment and the m sub-codes (all native codegen'd argmins);
   * the join ships only probed cells, and the heap aggregate returns
   * queries×k rows — the index scan never sees unprobed cells, the
   * scorer never sees full-precision corpus vectors.
   *
   * With fixed `centers` and `codebooks` the whole operator is
   * closed-form (a05's + a12's replayability composed); production
   * trains both via `ivfQuantizerReplayable` / `pqCodebooks`.
   */
  def knnIvfPq(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, centers: Array[Array[Double]], nprobe: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import graft.functions.VectorExpressions.{cellArgmin, cellProbes}
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val codes = (0 until m).map(j =>
      cellArgmin(slice(col("cv"), j * dsub + 1, dsub), codebooks(j)).as(s"c$j"))
    val encoded = c.select(
      col("neighbor_id") +: cellArgmin(col("cv"), centers).as("cell") +: codes: _*)
    val recon = concat((0 until m).map(j =>
      element_at(typedlit(codebooks(j).map(_.toSeq).toSeq), col(s"c$j") + 1)): _*)
    val cellRec = encoded.select(col("neighbor_id"), col("cell"), recon.as("rv"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(cellProbes(col("qv"), centers, nprobe)))
    cellRec.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        (floor(sqDist(col("qv"), col("rv")) * 1e6 + lit(0.5)) / 1e6).as("adist"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), -col("adist"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), (-col("nb.score")).as("adist"))
  }

  def knnPq(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import graft.functions.VectorExpressions.cellArgmin
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    // encode: m sub-codes per vector, each an argmin in its own subspace
    val codes = (0 until m).map(j =>
      cellArgmin(slice(col("cv"), j * dsub + 1, dsub), codebooks(j)).as(s"c$j"))
    val encoded = c.select(col("neighbor_id") +: codes: _*)
    // reconstruct from the broadcast codebooks (codes → centroid slices,
    // concatenated in subspace order so the dim order equals the input's)
    val recon = concat((0 until m).map(j =>
      element_at(typedlit(codebooks(j).map(_.toSeq).toSeq), col(s"c$j") + 1)): _*)
    val rec = encoded.select(col("neighbor_id"), recon.as("rv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    rec.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        (floor(sqDist(col("qv"), col("rv")) * 1e6 + lit(0.5)) / 1e6).as("adist"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), -col("adist"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), (-col("nb.score")).as("adist"))
  }

  /**
   * OPQ-style product quantization — [[knnPq]] behind a fixed
   * orthonormal ROTATION (Ge et al. 2013 "Optimized Product
   * Quantization"; the structured-rotation fast variant FAISS's
   * OPQ-Fast and ScaNN run): plain PQ quantizes each dim-block
   * independently, so correlated/unbalanced dimensions concentrate
   * error in a few subspaces — rotating first spreads variance evenly
   * and the SAME codebook budget buys visibly lower distortion. A
   * scaled Walsh–Hadamard rotation (entries ±2⁻ᵏ) is the parametric
   * choice for near-Gaussian embeddings: orthonormal (distances are
   * preserved exactly, so ranking semantics are unchanged), dense (it
   * mixes every input dim into every subspace), and every product is
   * an exact exponent shift, keeping the rotated coordinates
   * engine-portable sums.
   *
   * Rotation is ONE native [[org.apache.spark.sql.graftshim.MatVecMul]]
   * per side (the per-row `dot(v, typedlit(row))` alternative expands
   * to d codegen'd dots — the HyperplaneKey Janino lesson); everything
   * downstream is [[knnPq]] verbatim in rotated space, including the
   * broadcast-codebook encode and the model-sized query side. Pass
   * `codebooks` TRAINED ON ROTATED VECTORS (rotate the training sample
   * with the same matrix first).
   */
  def knnOpq(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rotation: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    def rot(df: DataFrame): DataFrame = df.select(col(idCol),
      graft.functions.VectorExpressions.matVecMul(
        col(vecCol).cast("array<double>"), rotation).as("__rv"))
    knnPq(rot(queries), rot(corpus), idCol, "__rv", k, codebooks)
  }

  /**
   * Two-stage PQ retrieval — the FAISS `IndexRefineFlat` production
   * recipe (Jégou et al. 2011 §V): stage 1 ranks the whole corpus by
   * the cheap asymmetric-distance approximation over the m-byte codes
   * ([[knnPq]]) and keeps a `kShort`-sized shortlist per query; stage 2
   * re-ranks ONLY the shortlist by exact cosine against the original
   * vectors and returns top `k`. The approximation's job shrinks from
   * "rank correctly" to "don't drop the true neighbors from a
   * kShort ≫ k shortlist" — recall@k approaches exact search while the
   * full-corpus scan still touches only codes.
   *
   * Scale shape: the shortlist is (queries × kShort) ID PAIRS — model-
   * sized however large the corpus — so it broadcasts into one id-equi
   * join against the corpus (a semi-join-shaped probe: the 100 TB side
   * is filtered by a broadcast hash, never shuffled), and the rerank
   * scores queries × kShort exact cosines, not corpus-sized work.
   * Exact cosines floor-quantize to 1e-6 before the heap (the a06/a12
   * discipline) so the final ranking is engine-portable.
   * Output: query_id, rank, neighbor_id, cos.
   */
  def knnPqRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, kShort: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(kShort >= k, s"shortlist kShort=$kShort must be >= k=$k")
    val shortlist = knnPq(queries, corpus, idCol, vecCol, kShort, codebooks)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    broadcast(shortlist).join(c, "neighbor_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        (floor(cosine(col("qv"), col("cv")) * 1e6) / 1e6).as("cos"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), col("cos"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cos"))
  }

  /**
   * BINARY-quantized kNN — 1-bit scalar quantization (the sign bit per
   * dimension) + Hamming-distance shortlist + exact cosine rerank: the
   * most aggressive compression tier in the a09→a12 quantization
   * ladder (int8 → PQ → 1 bit), the recipe binary passage retrieval
   * and FAISS's IndexBinaryFlat+refine run when the index must be 32×
   * smaller than float32 and the scan distance must be XOR+popcount
   * instead of d multiplies. Bits pack into ⌈d/32⌉ LONG words (32 bits
   * per word, so no sign-bit arithmetic anywhere); Hamming is
   * Σ bit_count(xor) over the words — pure integer, so the shortlist
   * membership (ham asc, id tie-break) replays exactly in SQL and the
   * rerank is a20's broadcast id-equi probe of the original vectors.
   * At 100 TB: the packed index is 8·⌈d/32⌉ B/vector, the brute
   * Hamming scan is the flat tier — bucket it under l03's IVF layout
   * when even that scan is too wide. Size `kShort` past the expected
   * Hamming TIE plateau (near-duplicate content collapses to equal
   * sketches; a narrower shortlist cuts on the id tie-break, not
   * similarity — spec'd on planted clusters).
   *
   * DIM CONTRACT: `dim` must equal the actual vector length, and that
   * is enforced IN-PLAN (the [[Dedup.packedOrderKey]] raise_error
   * discipline — the guard rides rows that already flow, no extra
   * action): a longer vector would silently drop its tail from the
   * Hamming shortlist and a shorter one would zero-pad phantom sign
   * bits, both of which corrupt shortlist recall without any visible
   * failure. Pass the corpus's true dimensionality.
   */
  def knnBinary(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, kShort: Int, dim: Int = 64): DataFrame = {
    require(kShort >= k, s"shortlist kShort=$kShort must be >= k=$k")
    require(dim >= 1, s"dim=$dim")
    // NULL vectors pass THROUGH (they drop from the shortlist exactly
    // as before the guard existed — `size(null)` is null, so without
    // the isNull arm they would fall into the raise_error branch with
    // an unreadable concat-with-null message and fail the whole query)
    def dimChecked(vc: Column): Column =
      when(vc.isNull, vc)
        .when(size(vc) === dim, vc)
        .otherwise(raise_error(concat(
          lit(s"knnBinary: vector length "), size(vc).cast("string"),
          lit(s" != dim=$dim — the Hamming shortlist would silently "),
          lit("truncate or zero-pad"))).cast("array<double>"))
    val words = (dim + 31) / 32
    // native codegen'd sign-bit pack — the aggregate(sequence(...)) HOF
    // this replaces ran <=32 interpreted lambda steps per word per
    // vector on the hot pack loop of an operator whose whole argument
    // is scan cheapness
    def packExprs(vc: String, pfx: String): Seq[Column] =
      (0 until words).map { w =>
        val lo = w * 32
        val hi = math.min(dim, lo + 32) - 1
        graft.functions.VectorExpressions.packSignBits(col(vc), lo, hi)
          .as(s"${pfx}_$w")
      }
    val q = queries.select(col(idCol).as("query_id"),
      dimChecked(col(vecCol).cast("array<double>")).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      dimChecked(col(vecCol).cast("array<double>")).as("cv"))
    val qp = q.select(col("query_id") +: packExprs("qv", "q"): _*)
    val cp = c.select(col("neighbor_id") +: packExprs("cv", "c"): _*)
    val ham = expr((0 until words).map(w => s"bit_count(q_$w ^ c_$w)")
      .mkString(" + ")).cast("double")
    val shortlist = cp.crossJoin(broadcast(qp))
      .select(col("query_id"), col("neighbor_id"), ham.as("ham"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), -col("ham"), kShort).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("nb"))
      .select(col("query_id"), col("nb.id").as("neighbor_id"))
    broadcast(shortlist).join(c, "neighbor_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        (floor(cosine(col("qv"), col("cv")) * 1e6) / 1e6).as("cos"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), col("cos"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cos"))
  }

  /**
   * Train PQ codebooks on a bounded id-ordered sample: per subspace,
   * driver-side Lloyd over the sample's sub-vectors (the [[knnIvf]]
   * sampling argument — codebooks need the coarse shape only, and m
   * independent d/m-dimensional k-means runs on ≤`sampleN` points are
   * milliseconds of driver arithmetic vs 20+ scheduler round-trips
   * each). Deterministic: ordered sample, seeded init per subspace.
   */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, kcode: Int, iters: Int = 10, sampleN: Int = 4096,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    val sample = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty PQ training sample")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(sub, kcode, iters, seed + j)
    }
  }

  /**
   * Exact maximum-inner-product top-k (MIPS) via the norm-augmentation
   * reduction (Shrivastava & Li 2014; Neyshabur & Srebro 2015): corpus
   * vectors gain one coordinate sqrt(M² − ‖c‖²) with M the max corpus
   * norm (so every augmented vector has norm exactly M), queries gain a
   * 0 — then cos(q', c') = ⟨q, c⟩ / (‖q‖·M), a per-query-constant
   * scaling of the inner product, so COSINE top-k in the augmented
   * space IS inner-product top-k in the original space. This is the
   * standard trick that lets unnormalized-embedding retrieval (learned
   * rerankers, recommender dot scores) reuse every cosine ANN path
   * unchanged — the same augmented columns drop straight into
   * [[knnLsh]]/[[knnIvf]] for the approximate variant.
   *
   * M rides IN the plan as a broadcast 1-row aggregate (no driver
   * action); the augmented coordinate is clamped at 0 before the sqrt
   * (for the max-norm row, M² − ‖c‖² can round a few ulps negative).
   * Same broadcast-NL + native-heap shape as [[knnBruteForce]].
   * Output score is the augmented cosine (∝ inner product per query).
   */
  def mipsBruteForce(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val m = c.agg(max(sqrt(dot(col("cv"), col("cv")))).as("mnorm"))
    val caug = c.crossJoin(broadcast(m))
      .select(col("neighbor_id"),
        concat(col("cv"), array(sqrt(greatest(lit(0.0),
          col("mnorm") * col("mnorm") - dot(col("cv"), col("cv")))))).as("cva"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), concat(col("qv"), array(lit(0.0))).as("qva"))
    caug.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qva"), col("cva")).as("cos"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), col("cos"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cos"))
  }

  /**
   * Approximate MIPS via the same norm-augmentation dropped into the
   * hyperplane-LSH path — [[mipsBruteForce]]'s reduction composed with
   * [[knnLsh]] verbatim: augment (one narrow map + a broadcast 1-row
   * max-norm aggregate), then bucket/probe/rerank in cosine space,
   * where the ranking is inner-product ranking. `dim` is the ORIGINAL
   * dimensionality (hyperplanes span dim+1 after augmentation).
   *
   * Defaults differ from [[knnLsh]] (fewer planes, more tables): the
   * augmentation pushes every small-norm corpus vector toward the
   * added axis, COMPRESSING the angular spread the sign bits cut, so
   * MIPS-LSH needs coarser buckets and more OR-amplification for the
   * same recall. Recall-vs-exact is spec'd; misses are possible by
   * construction.
   */
  def mipsLsh(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, planes: Int = 8,
      tables: Int = 12): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("cv"))
    val m = c.agg(max(sqrt(dot(col("cv"), col("cv")))).as("mnorm"))
    val caug = c.crossJoin(broadcast(m))
      .select(col(idCol),
        concat(col("cv"), array(sqrt(greatest(lit(0.0),
          col("mnorm") * col("mnorm") - dot(col("cv"), col("cv")))))).as("va"))
    val qaug = queries
      .select(col(idCol), col(vecCol).cast("array<double>").as("qv"))
      .select(col(idCol), concat(col("qv"), array(lit(0.0))).as("va"))
    knnLsh(qaug, caug, idCol, "va", k, dim + 1, planes, tables)
  }

  /**
   * Approximate top-k via hyperplane LSH with `tables` independent hash
   * tables: equi-join on (table, bucket), exact rerank inside buckets,
   * union of tables, global top-k per query. Recall is tested in
   * SimilaritySpec; misses are possible by construction.
   */
  def knnLsh(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, planes: Int = 12, tables: Int = 4): DataFrame = {
    def keyed(df: DataFrame, id: String, vec: String) = {
      val tbls = (0 until tables).map(t =>
        struct(lit(t).as("tbl"), hyperplaneKey(col(vec), dim, planes, seed = 100 + t).as("bucket")))
      df.select(col(id), col(vec), explode(array(tbls: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    }
    val q = keyed(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv")
    val c = keyed(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id", "cv")
    c.join(broadcast(q), Seq("tbl", "bucket"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      // dedup multi-table hits first, then heap-aggregate the top-k
      .groupBy("query_id", "neighbor_id").agg(max("cos").as("cos"))
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("neighbor_id"), col("cos"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cos"))
  }

  /**
   * Corpus-wide approximate k-NN GRAPH construction over an embedding
   * column — the substrate for graph-based ANN indexes (HNSW/NSG
   * seeding), embedding-cosine near-dup clusters, and semantic label
   * propagation. Unlike [[knnLsh]] (small query set broadcast against a
   * corpus), BOTH sides here are the full corpus, so nothing is
   * broadcast: each vector lands in `tables` random-hyperplane (tbl,
   * bucket) cells and candidate pairs are bucket-mates via a shuffle
   * EQUI-join on (tbl, bucket) — never all-pairs. Multi-table duplicate
   * pairs collapse through a (src, dst) groupBy-max BEFORE ranking, so
   * each cosine survives once; per-node ranking is the native bounded-
   * heap `graft_topk` aggregate (similarity desc, then neighbor id) —
   * no window over the corpus. With `mutual = true` only edges whose
   * reverse also ranked survive (the mutual-kNN graph used by density-
   * based dedup clustering); ranks keep their directed values.
   *
   * 100 TB posture: shuffle keys are (tbl, bucket) — expected candidate
   * volume is explicitly budgeted by `planes` (E[pairs/table] ≈
   * n²/2^planes for balanced buckets) and skewed celebrity buckets are
   * AQE-splittable; per-node state is a k-entry heap; the mutual filter
   * is a left-semi self-join on (src, dst) keys only.
   */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, planes: Int = 12, tables: Int = 4,
      mutual: Boolean = false): DataFrame = {
    def keyed(id: String, vec: String) = {
      val tbls = (0 until tables).map(t =>
        struct(lit(t).as("tbl"), hyperplaneKey(col(vec), dim, planes, seed = 100 + t).as("bucket")))
      corpus.select(col(idCol).as(id), col(vecCol).as(vec))
        .select(col(id), col(vec), explode(array(tbls: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    }
    val ranked = keyed("src", "sv").join(keyed("dst", "dv"), Seq("tbl", "bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosine(col("sv"), col("dv")).as("cos"))
      .groupBy("src", "dst").agg(max("cos").as("cos"))
      .groupBy("src")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("dst"), col("cos"), k).as("topk"))
      .select(col("src"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("src"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("dst"), col("nb.score").as("cos"))
    if (!mutual) ranked
    else ranked.join(
      ranked.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
      .select("src", "rank", "dst", "cos")
  }

  /**
   * DETERMINISTIC beam search over a [[knnGraph]] adjacency — the QUERY
   * side of graph-based ANN (the greedy walk HNSW/NSG/DiskANN run at
   * their base layer; Malkov & Yashunin 2018 §4, Fu et al. 2019): start
   * every query's beam at the fixed `entries` nodes, and each round
   * expand the beam one hop along the graph, score candidates by EXACT
   * cosine against the query, and keep the best `beam` nodes by
   * (cos desc, id asc) — a monotone beam (the current beam always
   * competes with its expansion, so quality never regresses), with
   * every choice a pure function of floor-quantized scores and ids.
   * That determinism is the point: a production walker would use a
   * priority queue and visited set per query; this formulation makes
   * each round ONE equi-join + ONE bounded-heap aggregate, identical
   * under any partitioning, and lets a SQL oracle replay every hop
   * (x13's hash-min discipline applied to beam ANN). Returns top `k`
   * of the final beam as (query_id, rank, neighbor_id, cos).
   *
   * Recall is governed by the substrate (a kNN graph reaches the true
   * neighbors only along monotone-improving paths from the entries —
   * the published behavior) and by `beam`/`rounds`; misses are possible
   * by construction, gauged with [[annRecall]] like every ANN tier.
   *
   * 100 TB posture: queries broadcast (model-sized); the beam state is
   * (queries × beam) rows — model-sized however large the corpus; each
   * expansion is a broadcast equi-join INTO the src-partitioned graph
   * (the corpus-sized side never moves), and candidate scoring probes
   * the vector table by a broadcast id-equi join (a20's shortlist
   * shape: the 100 TB side is filtered by a broadcast hash, never
   * shuffled). Rounds iterate on a lineage-truncated beam leaf, so the
   * plan does not deepen with rounds.
   */
  def knnGraphSearch(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, graph: DataFrame, entries: Seq[Long], k: Int,
      beam: Int, rounds: Int): DataFrame = {
    require(beam >= k, s"beam=$beam must be >= k=$k")
    require(rounds >= 1, s"rounds=$rounds")
    require(entries.nonEmpty, "need at least one entry point")
    val c = InternalFrame.sharedScan(corpus.select(
      col(idCol).cast("long").as("nid"),
      col(vecCol).cast("array<double>").as("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val g = InternalFrame.sharedScan(
      graph.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct())
    val score = (floor(cosine(col("qv"), col("cv")) * 1e6) / 1e6).as("cos")
    var beamDf: DataFrame = c.filter(col("nid").isin(entries: _*))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("nid"), score)
    for (_ <- 1 to rounds) {
      // share at loop ENTRY: the incoming beam is referenced twice (as
      // the expansion seed and in the union); the round's own output is
      // consumed once, so the final round's join plan stays inspectable
      val prev = InternalFrame.sharedScan(beamDf)
      val expandIds = prev.select(col("query_id"), col("nid").as("src"))
      val cand = g.join(broadcast(expandIds), Seq("src"))
        .select(col("query_id"), col("dst").as("nid")).distinct()
      val scored = c.join(broadcast(cand), Seq("nid"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("nid"), score)
      beamDf = prev.union(scored)
        // a node reachable both ways carries ONE identical cos
        .groupBy("query_id", "nid").agg(max("cos").as("cos"))
        .groupBy("query_id")
        .agg(graft.functions.VectorExpressions
          .topKByScore(col("nid"), col("cos"), beam).as("topk"))
        .select(col("query_id"), explode(col("topk")).as("nb"))
        .select(col("query_id"), col("nb.id").as("nid"),
          col("nb.score").as("cos"))
    }
    beamDf.groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("nid"), col("cos"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cos"))
  }

  /**
   * Recall@k of an ANN result against the exact result — the index-
   * quality gauge every production ANN deployment monitors (probe
   * width, quantizer drift, and incremental-index staleness all show
   * up here first). Both inputs are kNN result frames in this module's
   * shape (`query_id`, `neighbor_id`, one row per retrieved neighbor);
   * output is one row per query in `exact`:
   * (query_id, hits, recall_ppm) with hits = |ann ∩ exact| and
   * recall_ppm = floor(1e6 · hits / k) — integer end to end, so a
   * DuckDB oracle replays it bit-for-bit.
   *
   * 100 TB posture: kNN result frames are (queries × k)-sized — model-
   * sized relative to the corpus — so every join here is broadcast-
   * light; the expensive work already happened inside the ANN/exact
   * operators being graded. Queries the ANN missed entirely still
   * appear (hits = 0) via the left join from the exact side.
   */
  def annRecall(ann: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"annRecall: k must be >= 1 (got $k)")
    val a = ann.select(col("query_id"), col("neighbor_id"))
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    e.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr(s"(coalesce(hits, 0) * CAST(1000000 AS BIGINT)) div $k")
          .as("recall_ppm"))
  }
}
