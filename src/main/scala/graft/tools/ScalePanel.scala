package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-decade scale-evidence panel (r16 verdict task 5): the 100 TB
  * posture claims rested on 10× ratios plus plan audits; this tool
  * measures a frozen ~12-query panel spanning the claim classes —
  * scan (q01), LINEAR (dc02/k02/t20/t32/t42), SPINE-FLAT
  * (e24/e29/e33/st37), audit-grain (w12/w13) — at sf0.1, the 10×
  * ScaleGen slice, and the 100× ScaleGen slice, all in ONE JVM with
  * `reps` runs per (query, dir) recording the LAST rep (the canary's
  * warm-standalone regime — in-sweep single-shot walls on this box
  * carry ±35% session noise, far above the signal a flat-vs-linear
  * judgment needs). Writes BENCH_sf10.json with per-decade seconds
  * and the 10×/100× ratios.
  *
  * Usage: ScalePanel [dir0.1] [dir1] [dir10]  (defaults below; run
  * `ScaleGen /root/testdata/sf0.1 tmp/sfscale 10` and
  * `ScaleGen /root/testdata/sf0.1 tmp/sfscale100 100` first). */
object ScalePanel {
  val set: Seq[(String, String)] = Seq(
    "q01_pricing_summary" -> "scan",
    "dc02_incremental_dedup" -> "linear",
    "k02_salted_join" -> "linear",
    "t20_bpe_tokens" -> "linear",
    "t32_tokenizer_fertility" -> "linear",
    "t42_bytebpe_fertility" -> "linear",
    "e24_cox" -> "spine-flat",
    "e29_cox3" -> "spine-flat",
    "e33_concordance" -> "spine-flat",
    "st37_stream_wordpiece" -> "capped-feed",
    "w12_theilsen_trend" -> "audit-grain",
    "w13_mann_kendall" -> "audit-grain")

  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      ("sf0.1", args.lift(0).getOrElse("/root/testdata/sf0.1")),
      ("sf1", args.lift(1).getOrElse("tmp/sfscale")),
      ("sf10", args.lift(2).getOrElse("tmp/sfscale100")))
    val reps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_PANEL_REPS", "3").toInt)
    graft.TmpWork.install("graft_panel_")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", graft.TmpWork.diskTmp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadStart = loadAvg()

    val qs = graft.SparkEntry.queries
    val missing = set.map(_._1).filterNot(qs.contains)
    require(missing.isEmpty, s"panel names unknown queries: $missing")
    // query-major order: all decades of one query run back-to-back so
    // its plans/JIT are shared across the decades being compared
    val results = set.map { case (name, klass) =>
      val byDir = dirs.map { case (tag, dir) =>
        var err: Option[String] = None
        val times = (1 to reps).map { _ =>
          // a dead context would cascade IllegalStateException over every
          // remaining (query, dir) cell and the panel would record 24
          // phantom failures for one root cause — die loudly instead
          require(!spark.sparkContext.isStopped,
            s"SparkContext stopped before $name@$tag — aborting panel")
          val t0 = System.nanoTime()
          try { qs(name)(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            err = Some((e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).take(120))
              .replaceAll("[\"\\\\\\n\\r]", " "))
            -1.0 }
        }
        (tag, times.last, err)
      }
      (name, klass, byDir)
    }
    def f2(v: Double) = f"$v%.2f"
    val errs = results.flatMap { case (n, _, byDir) =>
      byDir.collect { case (tag, _, Some(e)) => "\"" + n + "@" + tag + "\":\"" + e + "\"" }
    }.mkString("{", ",", "}")
    val rows = results.map { case (n, klass, byDir) =>
      val m = byDir.map { case (tag, t, _) => tag -> t }.toMap
      val r10 = if (m("sf0.1") > 0) m("sf1") / m("sf0.1") else -1.0
      val r100 = if (m("sf0.1") > 0) m("sf10") / m("sf0.1") else -1.0
      s""""$n":{"class":"$klass","sf01":${f2(m("sf0.1"))},"sf1":${f2(m("sf1"))},"sf10":${f2(m("sf10"))},"r10":${f2(r10)},"r100":${f2(r100)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale_panel","unit":"sec","warm":"last-of-$reps-reps-one-jvm","queries":$rows,"errs":$errs,"panel_green":${errs == "{}"},"load":[${f2(loadStart)},${f2(loadAvg())}],"registry_size":${qs.size}}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_PANEL_OUT", "BENCH_sf10.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(json)
  }
}
