package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  test("isExchangeFree detects every shuffle flavor") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 7, i.toLong)).toDF("key", "id")
    assert(Layout.isExchangeFree(df))
    assert(!Layout.isExchangeFree(df.repartition(4)))            // round-robin
    assert(!Layout.isExchangeFree(df.orderBy("key")))            // range
    assert(!Layout.isExchangeFree(df.groupBy("key").count()))    // hash
  }

  test("co-bucketed tables join without any exchange") {
    import spark.implicits._
    val facts = (0L until 5000L).map(i => (i % 97, i, i * 2.0)).toDF("key", "id", "v")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("key", "name")
    Layout.writeBucketed(facts, "graft_bucketed_facts", "key", 8, Seq("key"))
    Layout.writeBucketed(dims, "graft_bucketed_dims", "key", 8, Seq("key"))
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_facts")
        .join(spark.table("graft_bucketed_dims"), "key")
      assert(Layout.isExchangeFree(joined), "bucketed join should not shuffle:\n" +
        joined.queryExecution.executedPlan)
      assert(joined.count() == 5000L)
      // the incremental-dedup shape: co-bucketed LEFT ANTI also plans
      // with no exchange on either side
      val anti = spark.table("graft_bucketed_facts")
        .join(spark.table("graft_bucketed_dims"), Seq("key"), "left_anti")
      assert(Layout.isExchangeFree(anti), "bucketed anti-join should not shuffle:\n" +
        anti.queryExecution.executedPlan)
      assert(anti.count() == 0L)
      // sanity: the same join over unbucketed data DOES shuffle
      val plain = facts.join(dims, "key")
      assert(!Layout.isExchangeFree(plain), "plain join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_dims")
    }
  }

  test("partitioned+z-ordered write composes directory pruning with z-locality") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 4000).map { i =>
      (Seq("A", "N", "R")(i % 3), rnd.nextDouble() * 50.0, rnd.nextDouble() * 1000.0, i.toLong)
    }.toDF("flag", "x", "y", "id")
    val dir = java.nio.file.Files.createTempDirectory("graft-pz")
    try {
      Layout.writePartitionedZOrdered(df, s"$dir/t", "flag",
        Seq(("x", 0.0, 50.0), ("y", 0.0, 1000.0)), files = 12)
      val read = spark.read.parquet(s"$dir/t")
        .filter(col("flag") === "A" && col("x").between(10.0, 20.0))
      val scan = read.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") || scan.contains("partitionFilters"),
        s"expected partition filters in plan:\n$scan")
      // relayout moves rows, never changes them
      val expected = df.filter(col("flag") === "A" && col("x").between(10.0, 20.0)).count()
      assert(read.count() == expected)
      // each file's x-range is a narrow slice of [0, 50] — the min/max
      // skipping guarantee (a round-robin write gives ~full-range files)
      val spans = spark.read.parquet(s"$dir/t")
        .select(col("x"), input_file_name().as("f"))
        .groupBy("f").agg((max("x") - min("x")).as("span"))
        .collect().map(_.getDouble(1))
      val avgSpan = spans.sum / spans.length
      // (~25-31 measured for 4 z-files/flag; a round-robin write gives ~50)
      assert(avgSpan < 40.0, s"avg per-file x-span $avgSpan — no z-locality")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("partitioned writes prune directories at planning time") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 10, i.toLong)).toDF("part", "id")
    val dir = java.nio.file.Files.createTempDirectory("graft-layout")
    try {
      Layout.writePartitioned(df, s"$dir/t", Seq("part"))
      val read = spark.read.parquet(s"$dir/t").filter(col("part") === 3)
      val scan = read.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") || scan.contains("partitionFilters"),
        s"expected partition filters in plan:\n$scan")
      assert(read.count() == 100L)
      // NOTE: Dataset.inputFiles lists the relation's full file index
      // (pre-pruning), so it cannot evidence pruning; the PartitionFilters
      // entry on the scan above IS the planning-time pruning guarantee.
      assert(scan.contains("part"), s"partition column missing from scan:\n$scan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("ORC round-trip: rows identical, filter and projection pushed into the ORC scan") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"s${i % 7}", i * 1.5)).toDF("id", "tag", "x")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc")
    try {
      df.sortWithinPartitions("id").write.mode("overwrite").orc(s"$dir/t")
      val read = spark.read.orc(s"$dir/t").filter(col("id") >= 900).select("id", "x")
      val scan = read.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,900)]"),
        s"filter not pushed into ORC scan:\n$scan")
      assert(scan.contains("ReadSchema: struct<id:bigint,x:double>"),
        s"projection not pruned in ORC scan:\n$scan")
      // format relayout moves rows, never changes them
      val back = spark.read.orc(s"$dir/t").collect().map(_.toSeq).toSet
      assert(back == df.collect().map(_.toSeq).toSet)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("ANN-by-layout: probed-cell isin filter prunes cell partitions at planning time") {
    // l03's plan contract: corpus written partitionBy(cell), probe set
    // as literals -> the scan carries PartitionFilters on cell and
    // reads only the probed directories' rows
    import spark.implicits._
    val df = (0 until 300).map(i => (i % 8, i.toLong)).toDF("cell", "id")
    val dir = java.nio.file.Files.createTempDirectory("graft-l03spec")
    try {
      df.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/t")
      val read = spark.read.parquet(s"$dir/t")
        .filter(col("cell").isin(1, 4, 6))
      val scan = read.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") || scan.contains("partitionFilters"),
        s"expected partition filters in plan:\n$scan")
      assert(scan.contains("cell"), s"cell missing from scan:\n$scan")
      assert(read.count() == 112L) // |cell 1| + |cell 4| + |cell 6| = 38+37+37
      assert(read.select("cell").distinct().collect().map(_.getInt(0)).sorted
        === Array(1, 4, 6))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("joins against a filtered dim prune fact partitions at RUNTIME (DPP)") {
    import spark.implicits._
    // the 100 TB shape: a date/tenant-partitioned fact joined to a small
    // filtered dim — Spark's dynamic partition pruning pushes the dim's
    // surviving keys into the fact scan's partition filters at runtime,
    // so the fact side reads only the joined partitions' directories
    val facts = (0 until 2000).map(i => (i % 10, i.toLong, i * 1.5)).toDF("key", "id", "v")
    val dims = (0 until 10).map(k => (k, if (k < 2) "hot" else "cold")).toDF("key", "cat")
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp")
    try {
      Layout.writePartitioned(facts, s"$dir/fact", Seq("key"))
      // the dim must be a real source relation: a local (in-memory)
      // relation constant-folds its filter away before the
      // PartitionPruning rule can see a selective predicate
      dims.write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      val joined = fact.join(dim.filter(col("cat") === "hot"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamicpruning partition filter in the fact scan:\n$plan")
      assert(joined.count() == 400L) // keys 0 and 1 -> 200 rows each
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("zValue interleaves binned bits exactly") {
    import spark.implicits._
    def refZ(xs: Seq[Double], ranges: Seq[(Double, Double)], bits: Int): Long = {
      val bins = xs.zip(ranges).map { case (v, (lo, hi)) =>
        math.min((1 << bits) - 1,
          math.max(0, math.floor((v - lo) / (hi - lo) * (1 << bits)).toInt))
      }
      var z = 0L
      for (b <- 0 until bits; i <- bins.indices)
        z |= ((bins(i) >> b) & 1L) << (b * bins.length + i)
      z
    }
    val pts = Seq((0.0, 0.0), (99.99, 99.99), (12.3, 87.6), (50.0, 50.0),
      (-5.0, 105.0) /* clamps */ )
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(Seq((col("x"), 0.0, 100.0), (col("y"), 0.0, 100.0)), bits = 8))
      .collect().map(_.getLong(0))
    val want = pts.map { case (x, y) => refZ(Seq(x, y), Seq((0.0, 100.0), (0.0, 100.0)), 8) }
    assert(got.toSeq == want)
  }

  test("z-ordered files cover small multi-column bounding boxes") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val pts = Seq.fill(8192)((rnd.nextDouble() * 100.0, rnd.nextDouble() * 100.0))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder")
    try {
      Layout.writeZOrdered(pts, s"$dir/z", Seq(("x", 0.0, 100.0), ("y", 0.0, 100.0)),
        files = 16)
      pts.repartition(16).write.parquet(s"$dir/r") // round-robin baseline
      def avgBoxArea(path: String): Double = {
        val boxes = spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg((max("x") - min("x")) * (max("y") - min("y")))
          .collect().map(_.getDouble(1))
        boxes.sum / boxes.length
      }
      val zArea = avgBoxArea(s"$dir/z")
      val rArea = avgBoxArea(s"$dir/r")
      // 16 z-curve segments of a uniform square ≈ 1/16 of the area each;
      // round-robin files each span essentially the whole square. The
      // factor-4 bar leaves room for curve-seam files that straddle
      // quadrants — if clustering broke, zArea ≈ rArea and this fails.
      assert(zArea < rArea / 4.0,
        s"z-order avg bbox area $zArea not < 1/4 of round-robin $rArea")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("compactionPlan: bins respect target + one file, assignment is input-order invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val files = (0 until 200).map(i => (f"f$i%03d", 100L + rnd.nextInt(900)))
    val target = 2000L
    val plan = Layout.compactionPlan(files.toDF("path", "bytes"), "path", "bytes", target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plan.length === 200)
    val byBin = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxFile = files.map(_._2).max
    assert(byBin.values.forall(_ <= target + maxFile),
      s"overfull bin: ${byBin.maxBy(_._2)}")
    // bins are contiguous from 0 and non-empty
    assert(byBin.keySet === (0L until byBin.size.toLong).toSet)
    // shuffled input order must produce the identical assignment
    val again = Layout.compactionPlan(
      scala.util.Random.shuffle(files).toDF("path", "bytes").repartition(7),
      "path", "bytes", target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1) === plan.sortBy(_._1))
  }

  test("compactParquet: many small files rewrite to the planned count with rows intact and re-sorted") {
    import spark.implicits._
    val rows = (0L until 20000L).map(i => (i, s"v$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
    try {
      // 40 tiny files
      rows.toDF("id", "v").repartition(40).write.parquet(s"$dir/small")
      val fs = new org.apache.hadoop.fs.Path(s"$dir/small")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def parquetFiles(p: String) =
        fs.listStatus(new org.apache.hadoop.fs.Path(p))
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val total = parquetFiles(s"$dir/small").map(_.getLen).sum
      val target = total / 4 // plan ⇒ ~4-5 outputs
      val n = Layout.compactParquet(spark, s"$dir/small", s"$dir/big",
        target, sortCols = Seq("id"))
      assert(n === parquetFiles(s"$dir/big").length)
      assert(n <= 5 && n >= 4, s"expected ~4-5 compacted files, got $n")
      // rows survive exactly
      val got = spark.read.parquet(s"$dir/big").as[(Long, String)].collect().toSet
      assert(got === rows.toSet)
      // range-partition + sort restored clustering: per-file id ranges
      // are disjoint (parquet min/max skipping works again)
      val ranges = spark.read.parquet(s"$dir/big")
        .groupBy(input_file_name()).agg(min("id"), max("id"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ranges.sliding(2).forall {
        case Array((_, hi), (lo, _)) => hi < lo
        case _ => true
      }, s"overlapping file ranges: ${ranges.mkString(",")}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("snapshotDiff classifies all four actions; co-bucketed snapshots " +
      "diff without any exchange") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("key", "name", "bal")
    val nw = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "D", 40.0),
      (5L, "e", 50.0)).toDF("key", "name", "bal")
    val got = Layout.snapshotDiff(old, nw, "key")
      .select("key", "action")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "deleted",
      4L -> "changed", 5L -> "inserted"), s"got $got")
    // exchange-free under co-bucketing (the l02 layout claim); a
    // location surviving from a previous JVM blocks saveAsTable, so
    // drop catalog entry AND warehouse dir first (l02's own pattern)
    Seq("graft_snap_old", "graft_snap_new").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tbl)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    Layout.writeBucketed(old, "graft_snap_old", "key", 4, Seq("key"))
    Layout.writeBucketed(nw, "graft_snap_new", "key", 4, Seq("key"))
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val diff = Layout.snapshotDiff(
        spark.table("graft_snap_old"), spark.table("graft_snap_new"), "key")
      assert(Layout.isExchangeFree(diff), "bucketed diff must not shuffle")
      assert(diff.filter(col("action") =!= "unchanged").count() == 4L)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
  }

  test("applyDiff: diff/apply round-trip is the identity; " +
      "co-bucketed merge plans with no exchange") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("key", "name", "bal")
    val nw = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "D", 40.0),
      (5L, "e", 50.0)).toDF("key", "name", "bal")
    val expect = nw.orderBy("key").collect().toSeq
    val diff = Layout.snapshotDiff(old, nw, "key")
    // full diff and pre-filtered change set must both reproduce the
    // new snapshot exactly — diff then apply is the identity
    assert(Layout.applyDiff(old, diff, "key")
      .orderBy("key").collect().toSeq === expect)
    val changes = diff.filter(col("action") =!= "unchanged")
      .select("key", "action", "new_row")
    assert(Layout.applyDiff(old, changes, "key")
      .orderBy("key").collect().toSeq === expect)
    // the 100 TB claim: under l02's co-bucketed layout the whole merge
    // (anti-join + upsert union) plans with NO exchange on either side
    Seq("graft_merge_old", "graft_merge_chg").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tbl)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    Layout.writeBucketed(old, "graft_merge_old", "key", 4)
    Layout.writeBucketed(changes, "graft_merge_chg", "key", 4)
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Layout.applyDiff(spark.table("graft_merge_old"),
        spark.table("graft_merge_chg"), "key")
      assert(Layout.isExchangeFree(merged),
        "co-bucketed merge must not shuffle:\n" +
          merged.queryExecution.executedPlan.toString)
      assert(merged.orderBy("key").collect().toSeq === expect)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
  }
}
