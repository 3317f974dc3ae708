package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.InternalFrame

/**
 * Deduplication operators for document corpora.
 *
 * Scale posture (100 TB): every near-dup method reduces each document to
 * a fixed-width signature, then shuffles only `(bucket_key, doc_id)`
 * pairs — never text — for the candidate join. Signatures are computed
 * by hashing each shingle ONCE (explode → codegen'd hash aggregate with
 * wide min/sum columns); higher-order-function lambdas are avoided on
 * the hot path because Spark interprets them per element.
 */
object Dedup {

  /** Deterministic (a, b) pairs for the universal hash family (public
    * so the DuckDB oracle can embed the identical table as literals;
    * the native MinHash aggregate reads the same stream). */
  def hashCoefficients(n: Int, seed: Long): Seq[(Long, Long)] =
    org.apache.spark.sql.graftshim.UniversalHash.coefficients(n, seed).toSeq

  /**
   * Portable 55-bit hash of a string column: graft's native codegen'd
   * polynomial byte fold (`graft.functions.VectorExpressions.polyHash`).
   * Unlike xxhash64 this is reproducible outside Spark — the DuckDB
   * oracle computes the identical value by folding the same codes — and
   * ~4× cheaper than the md5+conv detour on the shingle hot path. The
   * < 2^55 range keeps every downstream modular product `a·h32 + b`
   * far below 2^63 under ANSI arithmetic.
   */
  def portableHash(s: Column): Column =
    graft.functions.VectorExpressions.polyHash(s)

  /**
   * The corpus-order key `id * 10^6 + idx` used by the keep-global-first
   * rules ([[paragraphDedup]], [[dupSpanRemoval]]), with the pack bounds
   * enforced IN-PLAN: a document with ≥ 10^6 chunks/windows, or an id
   * past Long.MaxValue/10^6, would silently COLLIDE keys and remove the
   * wrong spans — this raises instead (no extra action, no extra
   * shuffle; the guard rides the rows that already flow).
   */
  private def packedOrderKey(id: Column, idx: Column, op: String): Column =
    when(idx < lit(1000000L) && id < lit(Long.MaxValue / 1000000L),
      id * 1000000L + idx)
      .otherwise(raise_error(concat(lit(s"$op: order-key pack overflow (id="),
        id, lit(", idx="), idx, lit(") — document beyond the 10^6 "),
        lit("chunk/window bound or id beyond Long.Max/10^6"))).cast("long"))

  /**
   * Hashed word n-gram shingles: one row per (id, shingle hash). The
   * token array is built once per document and carried through a
   * positional explode (`element_at` picks the n words per shingle), so
   * shingle assembly is a completely narrow, shuffle-free map — the
   * windowed-`lead` alternative shuffles and sorts every token by id.
   * The per-id array duplication is bounded by doc_length² bytes, fine
   * for KB-scale documents. Documents with fewer than `n` words produce
   * no shingles.
   */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val positions = when(size(col("toks")) >= n,
      sequence(lit(1), size(col("toks")) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), col("toks"), explode(positions).as("pos"))
      .select(col(idCol),
        portableHash(concat_ws(" ",
          (0 until n).map(k => element_at(col("toks"), col("pos") + k)): _*)).as("h"))
  }

  /**
   * MinHash signatures from element hashes (`idCol`, `h`): one row per
   * id with a `sig` array of `numHashes` longs. h_i(x) = (a_i·x32 + b_i)
   * mod P over the low 32 bits of `h`; all minima come from ONE native
   * aggregate with a long[numHashes] buffer (a numHashes-column `min`
   * formulation makes codegen emit a huge aggregate class whose Janino
   * compile costs more than the query — measured 2× at sf0.1).
   */
  def minHashSignatures(elementHashes: DataFrame, idCol: String,
      numHashes: Int = 128, seed: Long = 42L): DataFrame =
    elementHashes
      .select(col(idCol), pmod(col("h"), lit(1L << 32)).as("h32"))
      .groupBy(idCol)
      .agg(graft.functions.VectorExpressions
        .minHashAgg(col("h32"), numHashes, seed).as("sig"))

  /**
   * LSH banding over a MinHash signature column: one row per band,
   * keyed by (band index, md5 of the comma-joined band slice). The md5
   * digest (not the raw slice) is the bucket key so the shuffle carries
   * a fixed-width key, and the digest is engine-portable for the oracle.
   */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, idCol: String,
      numHashes: Int = 128): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand).cast("array<string>")))
          .as("bucket"))
    }
    df.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /**
   * All unordered pairs (x < y) from an array of distinct values, as an
   * array of structs. The lambdas are interpreted, but they only run on
   * multi-occupant buckets — a vanishing fraction — where a self-JOIN
   * alternative recomputes the entire upstream pipeline for its second
   * input (no exchange reuse across a broadcast boundary; measured 2×
   * on MinHash).
   */
  private def unorderedPairs(ids: Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + 2, greatest(size(ids) - i - 1, lit(0))), b =>
        struct(least(a, b).as("a"), greatest(a, b).as("b")))))

  /** Default occupancy bound for [[boundedPairs]]: far above any bucket
    * the LSH design produces on real corpora (a band match is already a
    * strong near-dup signal), hit only by degenerate mass duplication. */
  val MaxBucketDefault = 4096

  /**
   * Pair expansion with an occupancy cap. Buckets at or under
   * `maxBucket` expand all unordered pairs; an OVERSIZED bucket — the
   * degenerate case of mass-duplicated boilerplate, a real 100 TB
   * phenomenon — would emit O(n²) pairs from one task, so it instead
   * emits a STAR to the bucket minimum (n−1 pairs). Everything in such
   * a bucket shares a full band signature at a density where the docs
   * are one dup cluster already; the star keeps them connected for
   * component resolution while bounding any task's output at
   * O(max(maxBucket², n)). Works for plain ids and (id, …) structs
   * whose first field is the id.
   */
  private def boundedPairs(ids: Column, maxBucket: Int): Column = {
    val m = array_min(ids)
    val star = filter(
      transform(ids, a => struct(least(a, m).as("a"), greatest(a, m).as("b"))),
      p => p("a") =!= p("b"))
    when(size(ids) <= maxBucket, unorderedPairs(ids)).otherwise(star)
  }

  /** Distinct (id_a < id_b) pairs of ids sharing a (band, bucket) key:
    * ONE shuffle of (band, bucket, id) rows, pairs expanded inside each
    * bucket group, oversized buckets star-collapsed (see
    * [[boundedPairs]]). */
  private def bucketPairs(bb: DataFrame, idCol: String,
      maxBucket: Int = MaxBucketDefault): DataFrame =
    bb.groupBy("band", "bucket")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(boundedPairs(col("ids"), maxBucket)).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()

  /**
   * MinHash+LSH candidate pairs (id_a < id_b) from a text corpus of
   * (idCol, textCol), shingled as hashed word trigrams. The pair
   * shuffle carries only ids.
   */
  def minHashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L,
      maxBucket: Int = MaxBucketDefault): DataFrame = {
    val sigs = minHashSignatures(shingleHashes(docs, idCol, textCol), idCol, numHashes, seed)
    bucketPairs(lshBands(sigs, "sig", bands, idCol, numHashes), idCol, maxBucket)
  }

  /** [[minHashCandidatePairs]] from PRECOMPUTED signatures — the entry
    * point for pipelines that also consume the signatures (estimate
    * scoring, banding diagnostics): signing the corpus is the expensive
    * pass, so callers share one signature frame instead of re-shingling
    * per consumer. */
  def minHashCandidatePairsFromSignatures(sigs: DataFrame, idCol: String,
      numHashes: Int = 128, bands: Int = 32,
      maxBucket: Int = MaxBucketDefault): DataFrame =
    bucketPairs(lshBands(sigs, "sig", bands, idCol, numHashes), idCol, maxBucket)

  /**
   * Incremental MinHash-LSH near-dup candidates ACROSS snapshots:
   * (new_id, old_id) pairs whose signatures collide in ≥ 1 band —
   * dc02's exact-key incremental dedup, one similarity level up: the
   * daily-ingest NEAR-dedup workload. Both sides sign with the same
   * coefficient table, so signatures are comparable across runs and
   * engines. At 100 TB the corpus side's bands are computed once and
   * kept (bucketed on (band, bucket) — l02's layout move) while each
   * daily batch signs only itself; the equi-join ships fixed-width
   * (band, bucket, id) keys, documents never shuffle, and a viral
   * bucket on both sides is an AQE-skew-splittable join key, not an
   * in-task blowup.
   */
  def incrementalCandidatePairs(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    def bandsOf(df: DataFrame) =
      lshBands(minHashSignatures(shingleHashes(df, idCol, textCol), idCol,
        numHashes, seed), "sig", bands, idCol, numHashes)
    bandsOf(newDocs).select(col(idCol).as("new_id"), col("band"), col("bucket"))
      .join(bandsOf(corpus)
        .select(col(idCol).as("old_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("new_id", "old_id").distinct()
  }

  /**
   * Semantic (embedding-space) near-dup candidate pairs: random-
   * hyperplane LSH over `tables` independent hash tables, exact cosine
   * recheck inside each (table, bucket) group, distinct pairs across
   * tables. The multi-table layout buys recall (a τ-similar pair that
   * splits in one table collides in another) with `planes` controlling
   * bucket granularity — 2^planes buckets per table, so plane count is
   * the SCALING parameter: size it to the corpus (≥ log₂(N/targetOcc)),
   * never hard-code it.
   *
   * Scale posture (the d06 all-pairs shape is O(N²)): candidates only
   * form inside an equi-keyed bucket group, and occupancy is bounded by
   * COUNT-AND-SPLIT — bucket sizes are aggregated first (a narrow
   * id-only pass), buckets at or under `maxBucket` expand pairs from a
   * collected in-bucket array (≤ maxBucket vectors ≈ MBs per group),
   * and OVERSIZED buckets (mass-duplicated embeddings — the degenerate
   * 100 TB case) never materialize: each member row STREAMS one star
   * edge to the bucket minimum, cosine-rechecked like every other
   * candidate. No task holds more than O(maxBucket) vectors or emits
   * more than O(maxBucket²) rows per group.
   */
  def cosineCandidatePairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, planes: Int, tables: Int = 4,
      seed: Long = 5L, maxBucket: Int = MaxBucketDefault): DataFrame = {
    val base = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val tbls = (0 until tables).map(t => struct(lit(t).as("tbl"),
      Similarity.hyperplaneKey(col("v"), dim, planes, seed + t).as("bucket")))
    val keyed = base
      .select(col("id"), col("v"), explode(array(tbls: _*)).as("tb"))
      .select(col("id"), col("v"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val sizes = keyed.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mid"))
      .filter(col("n") > 1)
    // sharedScan the sized frame: THREE branches consume it (small-
    // bucket pairs, star minima, star members), and without sharing,
    // the keyed explode + the sizes aggregate + this join re-execute
    // per branch. The persisted leaf loses the (tbl, bucket)
    // partitioning, so smallPairs' group-by pays one bucket-keyed
    // exchange of the candidate rows — cheaper than recomputing the
    // upstream pipeline twice at any scale.
    val sized = org.apache.spark.sql.graftshim.InternalFrame.sharedScan(
      keyed.join(sizes, Seq("tbl", "bucket")))
    // in-bucket pair expansion + cosine gate in ONE native scan per
    // bucket: the explode(unorderedPairs) + filter(cosine) formulation
    // built an interpreted pair struct carrying BOTH full vectors for
    // every O(g²) candidate before the gate could drop it (2.3M pairs
    // on a19's sweep entry); CosinePairsGE emits only the qualifying
    // (id_a, id_b) pairs — bit-identical gate arithmetic, spec'd
    // differentially in DedupSpec.
    val smallPairs = sized.filter(col("n") <= maxBucket)
      .groupBy("tbl", "bucket")
      .agg(collect_list(struct(col("id"), col("v"))).as("ids"))
      .select(explode(graft.functions.VectorExpressions
        .cosinePairsGE(col("ids"), threshold)).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
    val minVecs = sized.filter(col("n") > maxBucket && col("id") === col("mid"))
      .select(col("tbl"), col("bucket"), col("v").as("mv"))
    val starPairs = sized.filter(col("n") > maxBucket && col("id") =!= col("mid"))
      .join(minVecs, Seq("tbl", "bucket"))
      .filter(Similarity.cosine(col("mv"), col("v")) >= threshold)
      .select(col("mid").as("id_a"), col("id").as("id_b"))
    smallPairs.union(starPairs)
      .distinct()
  }

  /** SimHash width in bits: the low 48 of the 55-bit portable element
    * hash, so the four LSH chunks are even 12-bit bands. */
  val SimHashBits = 48

  /**
   * SimHash per id from element hashes (`idCol`, `h`): bitwise majority
   * vote over the low [[SimHashBits]] bits, as ONE native aggregate
   * with an int-vote buffer (same codegen-size rationale as
   * [[minHashSignatures]]). Multiset semantics: repeated shingles vote
   * repeatedly.
   */
  def simHashSignatures(elementHashes: DataFrame, idCol: String): DataFrame =
    elementHashes
      .groupBy(idCol)
      .agg(graft.functions.VectorExpressions
        .simHashAgg(col("h"), SimHashBits).as("sim"))

  /**
   * SimHash near-dup candidate pairs: band the 48-bit hash into four
   * 12-bit chunks; docs sharing any chunk are candidates (catches all
   * pairs within Hamming distance 3 by pigeonhole).
   */
  def simHashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      maxBucket: Int = MaxBucketDefault): DataFrame = {
    val sigs = simHashSignatures(shingleHashes(docs, idCol, textCol), idCol)
    val chunks = sigs.select(col(idCol), col("sim"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("sim"), i * 12).bitwiseAND(lit(0xfffL)).as("bucket"))): _*)).as("bb"))
      .select(col(idCol), col("sim"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // pairs expand inside each bucket group (see bucketPairs); the id
    // field leads the struct, so struct least/greatest == id ordering
    chunks.groupBy("band", "bucket")
      .agg(collect_list(struct(col(idCol), col("sim"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(boundedPairs(col("ids"), maxBucket)).as("p"))
      .select(col(s"p.a.$idCol").as("id_a"), col(s"p.b.$idCol").as("id_b"),
        hammingDistance(col("p.a.sim"), col("p.b.sim")).as("hamming"))
      .distinct()
  }

  /** Hamming distance between two long columns (popcount of XOR). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /**
   * Connected components over an undirected edge list — the RESOLUTION
   * step of near-dup dedup: candidate pairs become clusters, and one
   * representative (the min id) survives per cluster.
   *
   * Distributed min-label propagation with POINTER DOUBLING: every node
   * starts labeled with itself; each round every node (1) takes the min
   * label in its closed neighborhood, then (2) shortcuts to its label's
   * label (`component := component(component)` — labels only decrease,
   * so the lookup is monotone-safe). The shortcut doubles the reach per
   * round, so convergence needs ~log₂(diameter) rounds instead of
   * diameter (a 1000-node path converges in 10 propagation rounds, not
   * 999 — spec'd in OpsSpec). Converged when no label changes, checked
   * with one aggregate per round — driver-orchestrated iteration like
   * any optimizer loop, data never collects. Each round is two joins +
   * one aggregate on (id, label) pairs — never the documents.
   *
   * The result is MATERIALIZED (checkpoint) before return: the
   * iterative lineage is truncated and every per-round cache entry is
   * dropped, so callers get a plain recomputable-free frame and the
   * session's cache manager stays empty (round-2 leaked one persisted
   * frame per call here). Uses the reliable checkpoint dir when one is
   * set (fault-tolerant, the cluster path); falls back to
   * localCheckpoint otherwise (local/dev).
   *
   * @return (id, component) — component = min id reachable from id
   */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(edges, idA, idB, maxIter)._1

  /**
   * Shared per-round materialization for the iterative CC variants:
   * persists a round's UNSAFE ROW bytes as-is (InternalFrame — no
   * external-Row ser/deser of the iterated state), folds a caller-
   * chosen per-row Long statistic and the row count in the SAME pass
   * (one Spark job per round), rotates the previous round's
   * persisted/checkpointed snapshot, and re-exposes the rows as a
   * LogicalRDD with honest statistics so small label frames broadcast
   * at plan time. With a reliable checkpoint dir set (the
   * fault-tolerant cluster path) rounds are checkpointed and the
   * previous snapshot deleted; otherwise MEMORY_AND_DISK persistence
   * with unpersist rotation. The FINAL round's blocks back the
   * returned frame and are reclaimed by the ContextCleaner once it is
   * unreferenced — no cache-manager entries either way.
   */
  private final class RoundMaterializer(
      spark: org.apache.spark.sql.SparkSession, rowBytes: Int) {
    private val reliable = spark.sparkContext.getCheckpointDir.isDefined
    private var prevRdd:
      org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = null
    private var prevCheckpointFile: Option[String] = None

    def materialize(df: DataFrame,
        stat: org.apache.spark.sql.catalyst.InternalRow => Long)
        : (DataFrame, java.math.BigDecimal, Long) = {
      // copy before retaining: shuffle readers recycle one UnsafeRow
      val rdd = InternalFrame.toInternalRdd(df).map(_.copy())
      if (reliable) rdd.checkpoint()
      else rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (s, cnt) = rdd.mapPartitions { it =>
        var acc = java.math.BigDecimal.ZERO
        var n = 0L
        it.foreach { r => acc = acc.add(java.math.BigDecimal.valueOf(stat(r))); n += 1 }
        Iterator.single((acc, n))
      }.fold((java.math.BigDecimal.ZERO, 0L)) { case ((a, n), (b, m)) =>
        (a.add(b), n + m)
      } // materializes (and checkpoints)
      if (reliable) {
        // the previous round's snapshot is now unreachable — delete it,
        // or every round leaks one full state set to the checkpoint
        // store (cleanCheckpoints defaults to false)
        prevCheckpointFile.foreach { f =>
          val path = new org.apache.hadoop.fs.Path(f)
          path.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(path, true)
        }
        prevCheckpointFile = rdd.getCheckpointFile
      } else {
        if (prevRdd != null) prevRdd.unpersist(blocking = false)
        prevRdd = rdd
      }
      (InternalFrame.ofInternalRdd(df, rdd, rowCount = cnt, rowBytes = rowBytes), s, cnt)
    }
  }

  /** Target edge rows per partition inside the CC loop. Label/edge
    * frames carry 16-byte (long, long) rows, so 2M rows ≈ 32 MB —
    * comfortable task size; at sf0.1 this coalesces the loop to ONE
    * partition, cutting ~32 near-empty tasks per stage per round. */
  private val CcRowsPerPartition = 2000000L

  /** Minimal primitive long→long open-addressing map (linear probing,
    * power-of-2 capacity, ≤0.5 load factor) for the union-find
    * contraction: two long arrays cost ~17 B/entry resident at the
    * grow point, where boxed `java.util.HashMap[Long, Long]` entries
    * cost ~48+ B — at the [[CcRowsPerPartition]] = 2M-node guard that
    * is ~32 MB (the task-sizing assumption) vs ~200 MB (an OOM risk on
    * small executors). Long.MinValue is the empty-slot sentinel and is
    * handled as an explicit side slot, so every long is a valid key. */
  private final class LongLongMap(expected: Int) {
    private[this] final val Empty = Long.MinValue
    private[this] var mask = 0
    private[this] var keys: Array[Long] = _
    private[this] var vals: Array[Long] = _
    private[this] var used = 0
    private[this] var hasSentinel = false
    private[this] var sentinelVal = 0L
    allocate(math.max(16, Integer.highestOneBit(math.max(1, expected)) * 4))

    private def allocate(cap: Int): Unit = {
      keys = Array.fill(cap)(Empty)
      vals = new Array[Long](cap)
      mask = cap - 1
      used = 0
    }
    // splitmix64-style finalizer spreads sequential ids across slots
    private def slot(k: Long): Int = {
      var x = k * 0x9E3779B97F4A7C15L
      x ^= (x >>> 32)
      var i = x.toInt & mask
      while (keys(i) != Empty && keys(i) != k) i = (i + 1) & mask
      i
    }
    def getOrDefault(k: Long, d: Long): Long =
      if (k == Empty) { if (hasSentinel) sentinelVal else d }
      else { val i = slot(k); if (keys(i) == k) vals(i) else d }
    def put(k: Long, v: Long): Unit =
      if (k == Empty) { hasSentinel = true; sentinelVal = v }
      else {
        val i = slot(k)
        if (keys(i) == Empty) {
          keys(i) = k; vals(i) = v; used += 1
          if (used * 2 > mask + 1) grow()
        } else vals(i) = v
      }
    def putIfAbsent(k: Long, v: Long): Unit =
      if (k == Empty) { if (!hasSentinel) { hasSentinel = true; sentinelVal = v } }
      else {
        val i = slot(k)
        if (keys(i) == Empty) {
          keys(i) = k; vals(i) = v; used += 1
          if (used * 2 > mask + 1) grow()
        }
      }
    private def grow(): Unit = {
      val ok = keys; val ov = vals
      allocate((mask + 1) * 2)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != Empty) {
          val j = slot(ok(i)); keys(j) = ok(i); vals(j) = ov(i); used += 1
        }
        i += 1
      }
    }
    def foreachKey(f: Long => Unit): Unit = {
      if (hasSentinel) f(Empty)
      var i = 0
      while (i < keys.length) {
        if (keys(i) != Empty) f(keys(i))
        i += 1
      }
    }
  }

  /** [[connectedComponents]] plus the number of propagation rounds
    * executed (the last round is the no-change convergence probe).
    *
    * `localSolve` (default on): when the counted edge state fits ONE
    * loop partition (≤ [[CcRowsPerPartition]] rows ≈ 32 MB — the same
    * threshold that already turns AQE off because no stage could
    * skew), the component labels are resolved by a partition-LOCAL
    * union-find on the executor holding that partition, in one job.
    * Iterating Spark rounds over a single 32 MB partition is pure
    * scheduler overhead — each round pays 3 shuffle stages to move
    * data that never leaves one task. Nothing collects to the driver,
    * and graphs above the threshold run the distributed doubling
    * rounds unchanged (set `localSolve = false` to force them, as the
    * round-count spec does). */
  def connectedComponentsWithRounds(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20,
      localSolve: Boolean = true): (DataFrame, Int) = {
    // persist the edge list: every propagation round joins against it,
    // and without caching each round would recompute the entire
    // upstream candidate-pair pipeline (sketches included)
    val sym0 = edges
      .select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .union(edges
        .select(col(idB).cast("long").as("src"), col(idA).cast("long").as("dst")))
      .persist()
    // materialize the cache and size the loop's partitioning from the
    // real row count: the upstream pipeline's partitioning (often
    // shuffle.partitions × 2 from the union) is noise for the tiny
    // (long, long) state the rounds iterate — a near-empty task per
    // partition per stage per round is the dominant fixed cost at the
    // low end, and the coalesce is free (narrow, reads cached blocks)
    val nSym = sym0.count()
    val symParts = math.max(1L, math.min(
      InternalFrame.toInternalRdd(sym0).getNumPartitions.toLong,
      nSym / CcRowsPerPartition + 1)).toInt
    val sym = sym0.coalesce(symParts)
    val spark = sym.sparkSession
    // Below ~16 partitions of state the loop's cost is pure overhead:
    // AQE materializes every shuffle stage as its own job and replans
    // between them (measured ~10 jobs/round on a 312-edge graph), which
    // buys nothing when no stage could possibly skew. Run small loops
    // with AQE off and the loop-sized partition count; large graphs
    // keep AQE (runtime skew-split of hot components is exactly what a
    // 100 TB near-dup graph needs). Conf changes are restored in
    // `finally` — they are session-scoped, and the loop is synchronous.
    val smallLoop = symParts < 16
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    // Each round MATERIALIZES its labels and truncates lineage
    // (RoundMaterializer). Without truncation the doubling self-join
    // doubles the logical plan every round (2^rounds nodes by round
    // 10), and `persist` would leave a cache-manager entry per round
    // (the round-2 leak).
    //
    // Convergence signal: labels only ever DECREASE under min
    // propagation, so the exact BigDecimal label sum strictly decreases
    // iff any label changed (a long sum could overflow at extreme id
    // ranges). The sum is folded IN the materialization pass — one
    // Spark job per round, not materialize + aggregate.
    val mat = new RoundMaterializer(spark, rowBytes = 24)
    def materializeWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val (frame, s, _) = mat.materialize(df, _.getLong(1))
      (frame, s)
    }
    // Partition-local union-find CONTRACTION, generalized beyond the
    // single-partition case: each level runs union-by-min + path
    // compression inside every partition and emits one (node, root)
    // star edge per node seen — the union of stars across partitions
    // preserves connectivity exactly (every input edge is represented
    // through its endpoints' local roots) — then a NARROW coalesce
    // merges `fanIn` partitions for the next level. log_fanIn(P)
    // levels, no shuffle anywhere, and every node survives every
    // level, so the final single-partition pass labels each node with
    // its component's global minimum. The regime guard: the NODE set
    // must fit one task's hash map (≤ CcRowsPerPartition ids), while
    // the EDGE set may be arbitrarily larger — exactly the
    // mass-duplication shape (E ≫ V) where label-propagation rounds
    // pay log(diameter) shuffles; graphs whose node set exceeds a
    // task fall through to the doubling loop below.
    if (localSolve) {
      // Regime probe: APPROXIMATE node count over the cached edge
      // state. approx_count_distinct is a partial-aggregated HLL scan
      // (tiny sketch exchange, never a node-set shuffle — the exact
      // distinct().count() this replaces was a full shuffle job paid
      // by every non-contractible graph before falling through to the
      // doubling loop). 2% rsd noise is fine: the threshold is a
      // task-memory bound with an order-of-magnitude margin now that
      // the union-find map is primitive (~17 B/node, see LongLongMap).
      // INVARIANT: that margin is what absorbs HLL tail error — an
      // underestimate near the threshold admits a somewhat larger graph
      // into the single-task solve, which ~17 B/node shrugs off at 2M
      // nodes (~34 MB). If CcRowsPerPartition is ever raised toward
      // real task-memory limits, reintroduce slack here (compare
      // approxNodes against ~0.9 × the threshold) so the probabilistic
      // gate keeps a deterministic safety margin.
      // The probe also covers the former symParts==1 shortcut — one
      // partition does NOT bound the node count when the upstream
      // input arrived pre-coalesced, so that path needs the check too.
      val approxNodes =
        sym.agg(approx_count_distinct(col("src"), 0.02)).head.getLong(0)
      if (approxNodes <= CcRowsPerPartition) {
        import org.apache.spark.sql.Encoders
        val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        def ufLevel(ds: org.apache.spark.sql.Dataset[(Long, Long)])
            : org.apache.spark.sql.Dataset[(Long, Long)] =
          ds.mapPartitions { it =>
            val parent = new LongLongMap(1 << 12)
            def find(x0: Long): Long = {
              var x = x0
              var p = parent.getOrDefault(x, x)
              while (p != x) {
                val gp = parent.getOrDefault(p, p)
                parent.put(x, gp); x = p; p = gp
              }
              x
            }
            it.foreach { case (a, b) =>
              parent.putIfAbsent(a, a)
              parent.putIfAbsent(b, b)
              val ra = find(a)
              val rb = find(b)
              if (ra < rb) parent.put(rb, ra)
              else if (rb < ra) parent.put(ra, rb)
            }
            val out = Vector.newBuilder[(Long, Long)]
            parent.foreachKey(k => out += ((k, find(k))))
            out.result().iterator
          }(tupleEnc)
        val fanIn = 8
        var cur = sym.select(col("src"), col("dst")).as[(Long, Long)](tupleEnc)
        var parts = symParts
        var levels = 1
        while (parts > 1) {
          parts = math.max(1, parts / fanIn)
          cur = ufLevel(cur).coalesce(parts)
          levels += 1
        }
        val (labels, _) = materializeWithSum(ufLevel(cur).toDF("id", "component"))
        sym0.unpersist()
        return (labels, levels)
      }
    }
    if (smallLoop) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", symParts.toString)
    }
    try {
    var (labels, prevSum) = materializeWithSum(
      sym.select(col("src").as("id")).distinct()
        .withColumn("component", col("id")))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // min label over the CLOSED neighborhood: neighbors' labels
      // unioned with the node's own row, one aggregate — the
      // min-then-join-back formulation costs an extra shuffle
      val neighborLabels = sym
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .select(col("src").as("id"), col("component"))
      val propagated = neighborLabels.union(labels)
        .groupBy("id").agg(min("component").as("component"))
      // pointer doubling: component := component(component). Every
      // label IS a node id present in `propagated` (labels are minima
      // over node ids), so the lookup hits; coalesce guards regardless.
      val parents = propagated
        .select(col("id").as("p_id"), col("component").as("p_component"))
      val (next, nextSum) = materializeWithSum(propagated
        .join(parents, col("component") === col("p_id"), "left")
        .select(col("id"),
          coalesce(col("p_component"), col("component")).as("component")))
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      it += 1
    }
    sym0.unpersist()
    (labels, it)
    } finally {
      if (smallLoop) {
        spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
        spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      }
    }
  }

  /**
   * Long-span duplication census (Lee et al. 2021, "Deduplicating
   * Training Data"): for every document, how many of its `w`-token
   * windows also appear in at least one OTHER document. Returns one row
   * per document that shares ≥ 1 span: (idCol, n_spans, n_shared).
   *
   * Exactness: exact in the spans UP TO the span key. The default
   * 52-bit key ([[graft.functions.VectorExpressions.md5Hash52]])
   * collides at the birthday bound ~2^26 distinct spans, so at 100 TB
   * (billions of distinct spans) a small fraction of shared-span counts
   * are collision-inflated; 52 bits is the default because the oracle
   * replays it as one exact DOUBLE-safe integer. Pass
   * `fullWidthKeys = true` to key on BOTH 52-bit md5 planes (hex chars
   * 1–13 and 14–26) — a 104-bit key whose ~2^52 birthday bound is
   * beyond any realistic span count, with each half still DOUBLE-safe
   * for the oracle. The shuffle carries one extra long per span;
   * everything else (narrow assembly, pre-shuffle hashing, two-level
   * census) is identical.
   *
   * Scale shape: windows assemble by positional explode + `element_at`
   * (narrow — no token shuffle) and reduce to the engine-portable
   * 52-bit md5 hash BEFORE any exchange, so shuffles carry (hash, id)
   * pairs, never window text. The per-span census is a two-level
   * AGGREGATE over a shared scan — NOT a window over the span hash: a
   * window gets no map-side partial combine and AQE cannot split a
   * window partition, so a viral boilerplate span (the exact phenomenon
   * span-dedup hunts — 10⁸ occurrences of one licence header) would
   * land every one of its rows in ONE unsplittable external-sort task.
   * The aggregate formulation shrinks the hot hash per partition
   * map-side, and the join back onto the spans is equi-keyed — AQE
   * skew-split applies. The distinct (id, hash) frame is computed once
   * and shared between the census and the join probe via
   * [[InternalFrame.sharedScan]] (the naive two-branch plan recomputes
   * the explode+hash per branch — column pruning makes the subplans
   * differ, so exchange reuse cannot deduplicate them).
   */
  def spanCensus(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 6, fullWidthKeys: Boolean = false): DataFrame = {
    import graft.functions.VectorExpressions.{md5Hash52, md5Hash52b}
    val toks = docs
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .where(size(col("t")) >= w)
    val spanText = concat_ws(" ",
      (0 until w).map(j => element_at(col("t"), col("i") + lit(j))): _*)
    val windowed = toks
      .select(col(idCol), col("t"),
        explode(sequence(lit(1), size(col("t")) - (w - 1))).as("i"))
    val spans0 =
      if (fullWidthKeys)
        windowed.select(col(idCol),
          md5Hash52(spanText).as("h"), md5Hash52b(spanText).as("h2")).distinct()
      else
        windowed.select(col(idCol), md5Hash52(spanText).as("h")).distinct()
    censusOverKeys(spans0, idCol, if (fullWidthKeys) Seq("h", "h2") else Seq("h"))
  }

  /** The census half of [[spanCensus]] over an already-keyed distinct
    * (id, key...) frame — split out so the key width is a parameter
    * (and so a spec can plant a narrow-key collision and watch the
    * wide key separate it). */
  private[ops] def censusOverKeys(spans0: DataFrame, idCol: String,
      keys: Seq[String]): DataFrame = {
    // (id, span-key) pairs are distinct, so count per key = the
    // distinct-document census for that span
    val spans = InternalFrame.sharedScan(spans0.select(col(idCol) +: keys.map(col): _*))
    val census = spans.groupBy(keys.map(col): _*).agg(count(lit(1)).as("nd"))
    spans.join(census, keys)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .where(col("n_shared") > 0)
  }

  /**
   * Alternating large-star / small-star connected components (Kiveris
   * et al. 2014, "Connected Components in MapReduce and Beyond") — the
   * EDGE-state alternative to [[connectedComponentsWithRounds]]'s
   * label-state doubling. Each round: large-star connects every node's
   * strictly-larger neighbors to the minimum of its closed
   * neighborhood; small-star connects every node's smaller neighbors
   * (and itself) to their minimum. At the fixpoint the edge set is a
   * forest of stars rooted at each component's minimum id.
   *
   * Why keep both: measured ROUND counts are equal (11 vs 11 on a
   * 1000-node path, 2 vs 2 on cliques — simulated, and spec'd in
   * OpsSpec), so doubling stays the default; alt-star's edge is
   * per-round COST on dense duplication graphs — its state is the
   * CURRENT edge set, which collapses toward one star per cluster as
   * rounds proceed, where doubling joins the FULL original edge list
   * every round. On a 100 TB near-dup graph whose clusters are heavy
   * (mass boilerplate), the shrinking-state variant is the cheaper
   * loop; both share the same materialization/rotation machinery and
   * produce identical (id, min-id component) labels.
   *
   * Convergence detection: both phases only ever move an edge's target
   * to a smaller node (per-group output sum changes by (d−1)(m−u) ≤ 0)
   * and never grow the edge count, so the exact (count, endpoint-sum)
   * pair is stationary iff the round changed nothing.
   */
  def connectedComponentsAltStar(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 30): (DataFrame, Int) = {
    val a = col(idA).cast("long")
    val b = col(idB).cast("long")
    val canon0 = edges
      .select(greatest(a, b).as("u"), least(a, b).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val spark = edges.sparkSession
    val mat = new RoundMaterializer(spark, rowBytes = 24)
    val fp: org.apache.spark.sql.catalyst.InternalRow => Long =
      r => r.getLong(0) + r.getLong(1)
    var (canon, sum, cnt) = mat.materialize(canon0, fp)
    // same small-loop treatment as the doubling variant: below ~16
    // state partitions, AQE's per-stage jobs and 32-way shuffles of a
    // tiny edge set are pure overhead
    val symParts = math.max(1L, cnt / CcRowsPerPartition + 1).toInt
    val smallLoop = symParts < 16
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    if (smallLoop) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", symParts.toString)
    }
    try {
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        // large-star over the symmetric view: for each directed edge
        // (src, dst > src), attach dst to m(src) = min(Γ(src) ∪ {src});
        // m ≤ src < dst keeps the output canonical with no self-loops
        val symE = canon.select(col("u").as("src"), col("v").as("dst"))
          .union(canon.select(col("v").as("src"), col("u").as("dst")))
        val mins = symE.groupBy("src").agg(min("dst").as("mn"))
          .select(col("src"), least(col("mn"), col("src")).as("m"))
        // no distinct here: small-star's min-aggregate tolerates
        // duplicate edges and the round's final distinct collapses
        // them — one fewer shuffle per round
        val ls = symE.join(mins, "src")
          .filter(col("dst") > col("src"))
          .select(col("dst").as("u"), col("m").as("v"))
        // small-star on the canonical result: each node's smaller
        // neighbors (and itself) attach to their minimum
        val mins2 = ls.groupBy("u").agg(min("v").as("m"))
        val ss = ls.join(mins2, "u")
          .filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(mins2.select(col("u"), col("m").as("v")))
          .distinct()
        val (next, nsum, ncnt) = mat.materialize(ss, fp)
        converged = nsum == sum && ncnt == cnt
        canon = next; sum = nsum; cnt = ncnt
        it += 1
      }
      // fixpoint edges are min-rooted stars: members label from their
      // edge, roots label themselves
      val labels = canon.select(col("u").as("id"), col("v").as("component"))
        .union(canon.select("v").distinct()
          .select(col("v").as("id"), col("v").as("component")))
      (labels, it)
    } finally {
      if (smallLoop) {
        spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
        spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      }
    }
  }

  /**
   * One-call corpus deduplication — the user-facing composition of the
   * operators the d-queries exercise individually: exact dedup (min id
   * per identical text) → MinHash-LSH candidates → connected
   * components → keep each cluster's minimum id. Returns the SURVIVING
   * rows of `docs` (all original columns).
   *
   * Scale shape: the exact pass shuffles md5 keys; the near-dup pass
   * shuffles (bucket, id) pairs and component labels only; the final
   * filter is a left-anti join against the model-free "removed ids"
   * frame (ids whose component label is a different id). Nothing
   * document-sized shuffles more than once.
   */
  def dedupeCorpus(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L,
      maxBucket: Int = MaxBucketDefault): DataFrame = {
    val keyed = docs.select(col(idCol).as("__id"), md5(col(textCol).cast("binary")).as("__k"))
    val exactKeep = keyed.groupBy("__k").agg(min("__id").as("__id")).select("__id")
    val exactSurvivors = docs.join(
      exactKeep.withColumnRenamed("__id", idCol), Seq(idCol), "left_semi")
    val pairs = minHashCandidatePairs(exactSurvivors, idCol, textCol,
      numHashes, bands, seed, maxBucket)
    val removed = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    exactSurvivors.join(removed, Seq(idCol), "left_anti")
  }

  /**
   * Quality-aware near-dup cluster REPRESENTATIVES — the "which copy
   * to keep" policy step between candidate resolution and corpus
   * rewrite: resolve MinHash-LSH candidates to connected components,
   * then crown each cluster's argmax-`score` member (ties to the
   * smallest id — a total order, so the choice is deterministic on
   * any engine/partitioning). `dedupeCorpus` hard-codes min-id-wins;
   * real curation keeps the BEST copy (longest, highest quality
   * score) — C4 keeps the longest of a duplicate set, not the first.
   *
   * Returns (component, rep_id, rep_score, cluster_size), one row per
   * multi-member cluster.
   *
   * Scale shape: the component frame is (id, component) longs, the
   * score joins id-keyed, and the argmax is min(struct(-score, id)) —
   * a map-side-combinable AGGREGATE, not a window, so a mass-dup
   * mega-cluster's rows shrink per partition before they shuffle.
   *
   * `score` contract: the policy column is cast to LONG (the argmax
   * must be exact integer arithmetic to stay oracle-checkable across
   * engines), so a fractional score in [0, 1] would truncate to 0 and
   * silently degenerate to min-id-wins. Pre-quantize fractional
   * qualities with the repo's fixed-point idiom — pass
   * `floor(quality * 1e6)` — exactly as t02's quality score does.
   */
  def clusterRepresentatives(docs: DataFrame, idCol: String, textCol: String,
      score: Column, numHashes: Int = 128, bands: Int = 32, seed: Long = 42L,
      maxBucket: Int = MaxBucketDefault): DataFrame = {
    val pairs = minHashCandidatePairs(docs, idCol, textCol,
      numHashes, bands, seed, maxBucket)
    val cc = connectedComponents(pairs)
    val scored = docs.select(col(idCol).as("id"), score.cast("long").as("__score"))
    cc.join(scored, "id")
      .groupBy("component")
      .agg(count(lit(1)).as("cluster_size"),
        min(struct((-col("__score")).as("n"), col("id").as("i"))).as("b"))
      .select(col("component"), col("b.i").as("rep_id"),
        (-col("b.n")).as("rep_score"), col("cluster_size"))
  }

  /**
   * SOFT dedup — frequency-based duplicate DOWNWEIGHTING instead of
   * removal (the DataComp-LM / SoftDeDup move: keep every copy but
   * give each member of a c-way duplicate cluster sampling weight 1/c,
   * so the cluster contributes one document's worth of probability
   * mass to training and the aggregate "effective dataset size" is the
   * distinct count — without destroying the natural distribution the
   * hard dedup families d01/d13 enforce). `key` is the duplicate
   * grouping column (raw text for exact content, a minhash component
   * label for near-dup, a URL for source-level).
   *
   * Output one row per input doc: (id, dup_count, weight_ppm) with
   * weight_ppm = floor(1e6 / dup_count) — integer end to end, so the
   * DuckDB oracle replays it exactly; downstream samplers (p08's
   * weighted sampling) consume weight_ppm directly.
   *
   * Scale shape: census then probe — a map-side-combinable count
   * keyed by the duplicate key, then one equi-join back (AQE
   * skew-split applies on viral keys). The census frame carries
   * (key, count) only, never document text, and no window touches an
   * unbounded key.
   */
  def softDedupWeights(docs: DataFrame, idCol: String, key: Column): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), key.as("__k"))
    val census = keyed.groupBy("__k").agg(count(lit(1)).as("dup_count"))
    keyed.join(census, "__k")
      .select(col("id"), col("dup_count"),
        expr("CAST(1000000 AS BIGINT) div dup_count").as("weight_ppm"))
  }

  /** Exact Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }

  /**
   * Cross-document PARAGRAPH dedup — the sub-document boilerplate pass
   * of C4 (Raffel et al. 2020: "discard all but one of any
   * three-sentence span occurring more than once") and RefinedWeb's
   * line-dedup: every document splits into fixed `w`-token chunks (the
   * testdata corpus has no newline/sentence structure, so the chunker
   * is positional; a real crawl swaps in a split-on-`\n` — everything
   * downstream is unchanged), each distinct chunk keeps only its FIRST
   * occurrence in corpus order (min (doc_id, chunk_idx)), and each
   * document reassembles from its surviving chunks in position order.
   * Returns (idCol, n_chunks, n_kept, cleaned_text) for every input
   * document — cleaned_text = '' when every chunk of the document
   * appeared earlier somewhere else (the full-duplicate case).
   *
   * This is NOT [[spanCensus]]: the census counts cross-document
   * sharing per overlapping sliding window; this op PARTITIONS the
   * document into disjoint chunks and REWRITES the corpus.
   *
   * Scale shape: chunks assemble narrowly (split + positional explode
   * + slice — no token shuffle) and are keyed by the engine-portable
   * 52-bit md5 before any exchange. The winner census aggregates
   * map-side on the hash (a viral boilerplate chunk shrinks per
   * partition before it moves); the winner join is equi-keyed on the
   * hash (AQE skew-split applies) and 1:1 on the probe side, so the
   * only exchange that carries chunk TEXT is the final reassembly
   * groupBy — output data, irreducible. The chunk frame is computed
   * once and shared across its three consumers (census, probe, per-doc
   * totals) via [[InternalFrame.sharedScan]].
   *
   * The (id, chunk_idx) winner order packs into `id * 1000000 + ci` so
   * the oracle replays the min exactly; chunk_idx < 10^6 bounds
   * documents at w·10^6 tokens — far beyond any real document.
   */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 10): DataFrame = {
    import graft.functions.VectorExpressions.md5Hash52
    val chunks = InternalFrame.sharedScan(docs
      .select(col(idCol).cast("long").as("id"), split(col(textCol), " ").as("t"))
      .select(col("id"), col("t"),
        explode(sequence(lit(0),
          floor((size(col("t")) - 1) / w).cast("int"))).as("ci"))
      .select(col("id"), col("ci"),
        concat_ws(" ", slice(col("t"), col("ci") * w + 1, lit(w))).as("chunk"))
      .withColumn("h", md5Hash52(col("chunk"))))
    val wkey = packedOrderKey(col("id"), col("ci").cast("long"), "paragraphDedup")
    val winners = chunks.groupBy("h").agg(min(wkey).as("wkey"))
    val kept = chunks.join(winners, "h").filter(wkey === col("wkey"))
    val perDoc = chunks.groupBy("id").agg(count(lit(1)).as("n_chunks"))
    val keptPerDoc = kept.groupBy("id").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("ci"), col("chunk")))),
        c => c.getField("chunk")), " ").as("cleaned_text"))
    perDoc.join(keptPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /**
   * Corpus-frequency boilerplate removal at chunk grain — the
   * C4/RefinedWeb rule [[paragraphDedup]] deliberately is NOT: a chunk
   * occurring `minOcc`-or-more times across the corpus is boilerplate
   * (cookie banners, nav bars, license headers) and is removed from
   * EVERY document, first occurrence included (C4 drops any three-
   * sentence span occurring ≥ 2× in the corpus; Raffel et al. 2020
   * §2.2 — where paragraphDedup's keep-global-first is the dedup
   * semantics, this is the cleaning semantics: boilerplate is noise
   * everywhere, not content someone should own one copy of).
   *
   * Scale shape: the chunk census groups by the 52-bit hash (hash-only
   * shuffle after the map-side combine); the banned set — census rows
   * with count ≥ minOcc — is BOILERPLATE-sized, not corpus-sized (a
   * chunk must repeat corpus-wide to enter), so it broadcasts and the
   * removal pass is a narrow anti-probe of each doc's chunk stream.
   * Reassembly is [[paragraphDedup]]'s per-doc sort of surviving
   * chunks. A legitimate popular quote crossing the threshold is the
   * op's documented false-positive class — tune `minOcc` per corpus.
   */
  def boilerplateChunkRemoval(docs: DataFrame, idCol: String,
      textCol: String, w: Int = 10, minOcc: Long = 3): DataFrame = {
    require(w >= 1 && minOcc >= 2,
      s"boilerplateChunkRemoval: w=$w minOcc=$minOcc")
    import graft.functions.VectorExpressions.md5Hash52
    val chunks = InternalFrame.sharedScan(docs
      .select(col(idCol).cast("long").as("id"), split(col(textCol), " ").as("t"))
      .select(col("id"), col("t"),
        explode(sequence(lit(0),
          floor((size(col("t")) - 1) / w).cast("int"))).as("ci"))
      .select(col("id"), col("ci"),
        concat_ws(" ", slice(col("t"), col("ci") * w + 1, lit(w))).as("chunk"))
      .withColumn("h", md5Hash52(col("chunk"))))
    val banned = chunks.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minOcc).select("h")
    val kept = chunks.join(broadcast(banned), Seq("h"), "left_anti")
    val perDoc = chunks.groupBy("id").agg(count(lit(1)).as("n_chunks"))
    val keptPerDoc = kept.groupBy("id").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("ci"), col("chunk")))),
        c => c.getField("chunk")), " ").as("cleaned_text"))
    perDoc.join(keptPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /**
   * Collect [[boilerplateChunkRemoval]]'s banned-chunk census to the
   * SORTED hash array the native ingest probe consumes
   * (`ChunkHashHits` binary-searches it) — boilerplate-sized by
   * construction (a chunk must repeat `minOcc`× corpus-wide to
   * enter), the st26/st25 freeze-and-ship convention.
   */
  def boilerplateBannedFreeze(docs: DataFrame, idCol: String,
      textCol: String, w: Int = 10, minOcc: Long = 3): Array[Long] = {
    import graft.functions.VectorExpressions.md5Hash52
    val out = docs
      .select(col(idCol).cast("long").as("id"), split(col(textCol), " ").as("t"))
      .select(col("id"),
        explode(sequence(lit(0),
          floor((size(col("t")) - 1) / w).cast("int"))).as("ci"), col("t"))
      .select(md5Hash52(
        concat_ws(" ", slice(col("t"), col("ci") * w + 1, lit(w)))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minOcc)
      .select("h").collect().map(_.getLong(0))
    java.util.Arrays.sort(out)
    out
  }

  /**
   * SLIDING word n-gram hashes at the engine-portable md5-52 plane
   * ([[shingleHashes]]'s shape, [[boilerplateChunkRemoval]]'s hash):
   * one row per (id, window hash), windows overlapping at stride 1,
   * single-space split with empties kept. The assembly is a narrow
   * shuffle-free map (token array built once, `slice` picks each
   * window); documents with fewer than `n` tokens produce no rows.
   * This is decontamination's shingle grain — md5-52 rather than the
   * poly hash because the frozen-set ingest probe (`NgramHashHits`)
   * digests the window bytes in place and both must read the same
   * plane.
   */
  def ngramHashes52(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"ngramHashes52: n=$n")
    import graft.functions.VectorExpressions.md5Hash52
    val positions = when(size(col("t")) >= n,
      sequence(lit(1), size(col("t")) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .select(col(idCol), col("t"), explode(positions).as("pos"))
      .select(col(idCol),
        md5Hash52(concat_ws(" ", slice(col("t"), col("pos"), lit(n)))).as("h"))
  }

  /**
   * Benchmark DECONTAMINATION census (Brown et al. 2020 appendix C —
   * the GPT-3 eval-overlap rule, since standard in every published
   * pretraining pipeline): a training document is contaminated when
   * any of its sliding `n`-token windows (n=13 in the paper) occurs
   * verbatim in the evaluation set. Returns one row per CONTAMINATED
   * training document: (idCol, total_ngrams, dirty_ngrams), both
   * counts over the document's DISTINCT windows — a repeated dirty
   * n-gram is one contamination, not many.
   *
   * Scale posture: the benchmark side is artifact-sized by
   * construction (a held-out eval set, not a corpus slice that grows
   * with SF), so its distinct shingle set BROADCASTS and the train
   * side is one narrow shingle pass + one hash-keyed per-doc
   * aggregate — no corpus×corpus join exists anywhere in the plan.
   */
  def benchmarkDecontamination(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val evalNg = ngramHashes52(eval, idCol, textCol, n)
      .select(col("h")).distinct().withColumn("dirty", lit(1))
    ngramHashes52(train, idCol, textCol, n)
      .distinct()
      .join(broadcast(evalNg), Seq("h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("total_ngrams"),
        count(col("dirty")).as("dirty_ngrams"))
      .filter(col("dirty_ngrams") > 0)
  }

  /**
   * Collect the evaluation set's distinct window hashes to the SORTED
   * array the native ingest probe consumes (`NgramHashHits` binary-
   * searches it) — the deployed-artifact posture: a benchmark's
   * shingle set is KB-scale however large the training corpus, and
   * screening-at-crawl ships it in the closure like st26's λ table
   * and st28's banned chunks.
   */
  def evalShingleFreeze(eval: DataFrame, idCol: String, textCol: String,
      n: Int = 13): Array[Long] = {
    val out = ngramHashes52(eval, idCol, textCol, n)
      .select("h").distinct().collect().map(_.getLong(0))
    java.util.Arrays.sort(out)
    out
  }

  /**
   * Exact duplicate-SPAN removal at the overlapping-window grain (Lee
   * et al. 2021's ExactSubstr rule, token-window variant): any `w`-token
   * window whose text occurs MORE THAN ONCE in the corpus — across
   * documents or repeated inside one document — is a duplicated span;
   * every occurrence EXCEPT the global first (min (doc, position) in
   * corpus order) marks its `w` token positions as duplicate, and each
   * document is rewritten keeping only unmarked tokens. Returns one row
   * per input document:
   * (idCol, n_tokens, dup_tokens, dup_ppm, cleaned_text).
   *
   * This completes the sub-document dedup triptych: [[spanCensus]]
   * COUNTS shared overlapping windows (no rewrite), [[paragraphDedup]]
   * rewrites at the DISJOINT chunk grain (a repeated span straddling a
   * chunk boundary survives), and this op rewrites at the overlapping
   * grain — the exact semantics of the suffix-array ExactSubstr pass,
   * reached here by the n-gram-window equivalence (a duplicated
   * substring of length ≥ w duplicates every w-window inside it, and
   * the union of marked windows reconstructs the span; spans shorter
   * than w are intentionally below the grain, as in the paper's
   * length-threshold k).
   *
   * Scale shape: windows assemble narrowly (split + positional explode
   * + element_at — no token shuffle) and reduce to the engine-portable
   * 52-bit md5 BEFORE any exchange, so the census shuffle carries
   * (hash) with map-side combine and the occurrence join is equi-keyed
   * on the hash (AQE skew-split applies; a viral boilerplate span
   * shrinks per-partition in the census). Position marking shuffles
   * (id, position) INTEGER pairs — never window text — and the only
   * exchange carrying text is the final per-document reassembly join,
   * which is output data, irreducible. The window frame is computed
   * once and shared between census and probe via
   * [[InternalFrame.sharedScan]]. The (id, i) occurrence order packs
   * into id * 1000000 + i (the [[paragraphDedup]] bound: documents
   * < 10^6 windows), replayed exactly by the oracle.
   */
  def dupSpanRemoval(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    import graft.functions.VectorExpressions.md5Hash52
    val toks = docs
      .select(col(idCol).cast("long").as("id"), split(col(textCol), " ").as("t"))
    val spanText = concat_ws(" ",
      (0 until w).map(j => element_at(col("t"), col("i") + lit(j))): _*)
    val windowed = InternalFrame.sharedScan(toks
      .where(size(col("t")) >= w)
      .select(col("id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - (w - 1))).as("i"))
      .select(col("id"), col("i"), md5Hash52(spanText).as("h")))
    // the pack bound fails LOUDLY in-plan instead of silently colliding
    // occurrence keys (wrong spans removed): a document with >= 10^6−w+1
    // tokens or an id past Long.Max/10^6 would otherwise corrupt the
    // keep-global-first rule
    val occKey = packedOrderKey(col("id"), col("i"), "dupSpanRemoval")
    val census = windowed.groupBy("h")
      .agg(min(occKey).as("wkey"), count(lit(1)).as("nocc"))
    // every non-first occurrence of a repeated window marks its w positions
    val covered = windowed.join(census, "h")
      .filter(col("nocc") > 1 && occKey =!= col("wkey"))
      .select(col("id"),
        explode(sequence(col("i"), col("i") + (w - 1))).as("p"))
      .distinct()
    val covPerDoc = covered.groupBy("id")
      .agg(array_sort(collect_list(col("p"))).as("cov"))
    toks.join(covPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("t")).cast("long").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("dup_tokens"),
        floor(coalesce(size(col("cov")), lit(0)).cast("double")
          * 1000000.0 / size(col("t")) + 0.5).cast("long").as("dup_ppm"),
        // native merge-scan over the ALREADY-SORTED cov array, O(n + c)
        // — the filter(..., array_contains(cov, i+1)) HOF this replaces
        // probed the whole covered array per token, interpreted: O(n·c)
        // on exactly the docs this op targets (a fully-duplicated
        // 10k-token doc is 10^8 compares)
        graft.functions.VectorExpressions.dropCoveredTokens(col("t"),
          coalesce(col("cov"), array().cast("array<int>")))
          .as("cleaned_text"))
  }

  /**
   * Exact duplicate-span removal at CHARACTER grain — [[dupSpanRemoval]]
   * below its token-window threshold: any `w`-CHARACTER substring
   * occurring more than once corpus-wide is a duplicated span; every
   * occurrence except the global first (min (doc, char position))
   * marks its `w` character positions, and each document is rewritten
   * keeping unmarked characters. This is the grain that catches short
   * boilerplate SNIPPETS (cookie banners, nav fragments, signatures)
   * sitting below any useful token-window size, and the punctuation-
   * glued repeats token splitting never sees — the remaining member of
   * the sub-document family (d09 counts, d13 chunk-rewrites, d16
   * token-window-rewrites). Returns one row per input document:
   * (idCol, n_chars, dup_chars, dup_ppm, cleaned_text).
   *
   * Scale shape: identical to [[dupSpanRemoval]] one level down —
   * windows assemble narrowly (positional explode + `substring`, no
   * text shuffle beyond the w-char windows' own hashes: each window
   * reduces to the 52-bit md5 BEFORE the census exchange), marking
   * shuffles (id, position) integer pairs, and the only text-carrying
   * exchange is the final per-document rewrite join (output data,
   * irreducible). Reassembly is the native O(n + c)
   * [[org.apache.spark.sql.graftshim.DropCoveredChars]] merge-scan.
   * Char-grain windows are ~5× denser than token windows on prose —
   * the census volume is length-of-corpus rows of (hash) longs with
   * map-side combine, the explicit cost of the finer grain. The
   * (id, i) occurrence order packs with the same loudly-guarded
   * 10^6 bound ([[packedOrderKey]]); documents longer than 10^6
   * CHARS hit the guard sooner than d16's token bound — split such
   * documents upstream or raise the grain.
   */
  def charSpanRemoval(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 20): DataFrame = {
    import graft.functions.VectorExpressions.md5Hash52
    require(w >= 2, s"charSpanRemoval: w must be >= 2 (got $w)")
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("txt"))
    val windowed = InternalFrame.sharedScan(base
      .where(length(col("txt")) >= w)
      .select(col("id"), col("txt"),
        explode(sequence(lit(1), length(col("txt")) - (w - 1))).as("i"))
      .select(col("id"), col("i"),
        md5Hash52(col("txt").substr(col("i"), lit(w))).as("h")))
    val occKey = packedOrderKey(col("id"), col("i").cast("long"),
      "charSpanRemoval")
    val census = windowed.groupBy("h")
      .agg(min(occKey).as("wkey"), count(lit(1)).as("nocc"))
    val covered = windowed.join(census, "h")
      .filter(col("nocc") > 1 && occKey =!= col("wkey"))
      .select(col("id"),
        explode(sequence(col("i"), col("i") + (w - 1))).as("p"))
      .distinct()
    val covPerDoc = covered.groupBy("id")
      .agg(array_sort(collect_list(col("p"))).as("cov"))
    base.join(covPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        length(col("txt")).cast("long").as("n_chars"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("dup_chars"),
        floor(coalesce(size(col("cov")), lit(0)).cast("double")
          * 1000000.0 / greatest(length(col("txt")), lit(1)) + 0.5)
          .cast("long").as("dup_ppm"), // greatest: empty docs score 0, not NaN
        graft.functions.VectorExpressions.dropCoveredChars(col("txt"),
          coalesce(col("cov"), array().cast("array<int>")))
          .as("cleaned_text"))
  }

  /**
   * Cross-source corpus overlap via KMV (k-minimum-values) bottom-k
   * sketches (Bar-Yossef et al. 2002; Beyer et al. 2007 — the
   * DataSketches theta-sketch estimator): each source keeps the k
   * SMALLEST universal-hash values of its distinct 3-gram shingles;
   * per-source distinct-count estimates read (k−1)/u_k off the kth
   * value, and per-pair Jaccard is the matched fraction inside the
   * bottom-k of the sketch UNION. A source (or union) with fewer than
   * k values keeps everything, so its estimate is EXACT by
   * construction — the small-set regime degrades to truth, not noise.
   * The 55-bit polyhash post-mixes through one splitmix-seeded
   * universal hash (the MinHash family's arithmetic) to be uniform on
   * [0, 2^31) — KMV's order statistics need uniformity the raw
   * polynomial fold doesn't give.
   *
   * Scale posture: the only corpus-sized work is the shingle scan; the
   * bottom-k per source is the native `graft_kmv` sketch aggregate
   * (set semantics absorb duplicate hashes map-side, partial
   * aggregation shuffles sources × k longs — no distinct pass, no
   * window sort), and every pair computation runs on sources × k
   * rows — driver-tiny however large the corpus. All estimator
   * arithmetic is IEEE-deterministic.
   */
  def kmvSourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      k: Int = 128, seed: Long = 77L): DataFrame =
    kmvOverlapFromSketches(kmvSourceSketches(docs, srcCol, textCol, k, seed), k)

  /** Row-local (source, hv) mixed hashes: 3-gram shingle → 55-bit
    * polyhash → one splitmix universal-hash post-mix onto [0, 2^31).
    * Completely narrow (no shuffle) — the piece a streaming ingest
    * computes per arriving row before the sketch state absorbs it. */
  def kmvMixedHashes(docs: DataFrame, srcCol: String, textCol: String,
      seed: Long = 77L): DataFrame = {
    val (ua, ub) = hashCoefficients(1, seed).head
    // Overflow headroom is thin and must stay PROVEN, not assumed:
    // ua·(h % 2^32) + ub < 2^63 requires ua ≤ 2^31−2 and ub < 2^31
    // (worst case (2^31−2)·(2^32−1) + 2^31−1 ≈ 9.2234e18, ~0.1% below
    // Long.MaxValue). Spark (non-ANSI) would WRAP silently on a wider
    // coefficient while the DuckDB oracle errors — assert the bound so
    // any future widening of the hash family fails loudly instead.
    require(ua <= 2147483646L && ub <= 2147483647L,
      s"kmvMixedHashes: coefficients ($ua, $ub) exceed the 2^63 overflow bound")
    shingleHashes(docs.select(col(srcCol), col(textCol)), srcCol, textCol)
      .select(col(srcCol).as("source"),
        ((lit(ua) * (col("h") % 4294967296L) + lit(ub)) % 2147483647L).as("hv"))
  }

  /** Per-source KMV sketch rows (source, hv): the native `graft_kmv`
    * bottom-k set aggregate over the mixed hashes, exploded back to
    * rows — duplicates die map-side in the k-entry set buffers and
    * the shuffle carries sources × k longs. */
  def kmvSourceSketches(docs: DataFrame, srcCol: String, textCol: String,
      k: Int = 128, seed: Long = 77L): DataFrame =
    kmvMixedHashes(docs, srcCol, textCol, seed)
      .groupBy("source")
      .agg(graft.functions.VectorExpressions.kmvSketch(col("hv"), k).as("sk"))
      .select(col("source"), explode(col("sk")).as("hv"))

  /** K-way KMV union screen over (source, hv) sketch rows: ONE more
    * `graft_kmv` fold merges every per-source sketch into the global
    * union sketch (set semantics absorb cross-source duplicates), and
    * each source's matched fraction inside the union's bottom-k is
    * the standard KMV containment estimate of |S_c| / |S_union| — in
    * EXACT integer ppm. Input is sources × k rows, so everything here
    * is driver-tiny. Output per source: sketch size, matches,
    * contain_ppm, n_src and n_union estimates. */
  def kmvUnionScreen(sk: DataFrame, k: Int): DataFrame = {
    def nHat(cnt: Column, vk: Column): Column =
      when(cnt < k, cnt.cast("double"))
        .otherwise(lit((k - 1).toDouble) / (vk.cast("double") / lit(2147483647.0)))
    def fr3(c: Column): Column = floor(c * lit(1e3) + lit(0.5)) / lit(1e3)
    val unionK = sk
      .agg(graft.functions.VectorExpressions.kmvSketch(col("hv"), k).as("uk"))
      .select(explode(col("uk")).as("hv"))
    val ustats = unionK.agg(count(lit(1)).as("ku"), max("hv").as("vku"))
    val perSrc = unionK.join(sk, Seq("hv"))
      .groupBy("source").agg(count(lit(1)).as("matches"))
    sk.groupBy("source").agg(count(lit(1)).as("cnt"), max("hv").as("vk"))
      .join(perSrc, Seq("source"), "left")
      .crossJoin(broadcast(ustats))
      .select(col("source"), col("cnt"),
        coalesce(col("matches"), lit(0L)).as("matches"),
        expr("coalesce(matches, 0) * 1000000 div ku").as("contain_ppm"),
        fr3(nHat(col("cnt"), col("vk"))).as("n_src"),
        fr3(nHat(col("ku"), col("vku"))).as("n_union"))
      .orderBy("source")
  }

  /** K-way KMV INTERSECTION screen over (source, hv) sketch rows —
    * the set-algebra completion of [[kmvUnionScreen]]: inside the
    * union's bottom-k, count how many hashes appear in ≥ m sources
    * for EVERY m in 1..S at once (m = S is the full k-way
    * intersection estimate; m = 1 recovers the union, an in-plan
    * sanity anchor). share_ppm is the exact integer fraction of the
    * union sketch shared by ≥ m sources and est_shared scales it by
    * the union distinct-count estimate — "how much content is common
    * to at least m corpora", the question a mixing team asks before
    * deduplicating across sources. Below k everything degrades to
    * exact truth (the union sketch IS the union). Input is
    * sources × k rows, so every frame here is driver-tiny; the
    * membership census and the ≥ m rollup never touch the corpus. */
  def kmvSharedCore(sk: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def nHat(cnt: Column, vk: Column): Column =
      when(cnt < k, cnt.cast("double"))
        .otherwise(lit((k - 1).toDouble) / (vk.cast("double") / lit(2147483647.0)))
    def fr3(c: Column): Column = floor(c * lit(1e3) + lit(0.5)) / lit(1e3)
    val unionK = sk
      .agg(graft.functions.VectorExpressions.kmvSketch(col("hv"), k).as("uk"))
      .select(explode(col("uk")).as("hv"))
    val ustats = unionK.agg(count(lit(1)).as("ku"), max("hv").as("vku"))
    // membership census: how many sources hold each union-bottom-k hash
    val mh = unionK.join(sk, Seq("hv"))
      .groupBy("hv").agg(count(lit(1)).as("mv"))
    // one output row per m in 1..S (S = sources with a non-empty sketch)
    val spine = sk.select("source").distinct()
      .select(row_number().over(Window.orderBy("source")).cast("long").as("m"))
    spine.join(broadcast(mh), col("mv") >= col("m"), "left")
      .groupBy("m").agg(count(col("hv")).as("cnt_ge"))
      .crossJoin(broadcast(ustats))
      .select(col("m"), col("cnt_ge"), col("ku"),
        expr("cnt_ge * 1000000 div ku").as("share_ppm"),
        fr3((col("cnt_ge").cast("double") / col("ku"))
          * nHat(col("ku"), col("vku"))).as("est_shared"),
        fr3(nHat(col("ku"), col("vku"))).as("n_union"))
      .orderBy("m")
  }

  /** The estimator tail shared by the batch op and the streaming twin:
    * pair math over (source, hv) sketch rows — sources × k input, so
    * every frame here is driver-tiny. */
  def kmvOverlapFromSketches(sk: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = sk.groupBy("source")
      .agg(count(lit(1)).as("cnt"), max("hv").as("vk"))
    def nHat(cnt: Column, vk: Column): Column =
      when(cnt < k, cnt.cast("double"))
        .otherwise(lit((k - 1).toDouble) / (vk.cast("double") / lit(2147483647.0)))
    val pairs = stats.select(col("source").as("src_a"))
      .crossJoin(stats.select(col("source").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val uni = pairs
      .join(sk, col("source") === col("src_a") || col("source") === col("src_b"))
      .select("src_a", "src_b", "hv").distinct()
    val kset = uni
      .withColumn("rk",
        row_number().over(Window.partitionBy("src_a", "src_b").orderBy("hv")))
      .filter(col("rk") <= k)
      .select("src_a", "src_b", "hv")
    val am = sk.select(col("source").as("src_a"), col("hv"), lit(1L).as("in_a"))
    val bm = sk.select(col("source").as("src_b"), col("hv"), lit(1L).as("in_b"))
    val perPair = kset
      .join(am, Seq("src_a", "hv"), "left")
      .join(bm, Seq("src_b", "hv"), "left")
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("ku"), max("hv").as("vku"),
        sum(coalesce(col("in_a"), lit(0L)) * coalesce(col("in_b"), lit(0L)))
          .cast("long").as("matches"))
    def fr(c: Column, d: Int): Column = {
      val p = math.pow(10, d)
      floor(c * lit(p) + lit(0.5)) / lit(p)
    }
    perPair
      .join(stats.select(col("source").as("src_a"),
        col("cnt").as("cnt_a"), col("vk").as("vk_a")), Seq("src_a"))
      .join(stats.select(col("source").as("src_b"),
        col("cnt").as("cnt_b"), col("vk").as("vk_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("ku"), col("matches"),
        fr(nHat(col("cnt_a"), col("vk_a")), 3).as("n_a"),
        fr(nHat(col("cnt_b"), col("vk_b")), 3).as("n_b"),
        fr(col("matches").cast("double") / col("ku"), 6).as("jaccard"),
        fr((col("matches").cast("double") / col("ku"))
          * nHat(col("ku"), col("vku")), 3).as("inter_est"))
      .orderBy("src_a", "src_b")
  }
}
