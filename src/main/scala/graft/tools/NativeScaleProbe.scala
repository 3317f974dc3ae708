package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev diagnostic (r18, VERDICT item 4): scale-prove the r17/r18 native
 * expressions against their HOF reference forms. For each native —
 * DeletionKeys2 (r04), WordNGrams (st19), EditPairs1 (r03, new in r18)
 * — time the native and the HOF formulation of the SAME fragment,
 * noop-sunk (guide §1.4), at every data dir given (sf0.1 and the
 * ScaleGen 10× slice = sf1). CosinePairsGE has no isolatable column
 * fragment (it lives inside Dedup's bucket pipeline), so its consumer
 * a19 is timed end-to-end instead, alongside r03/r04 — the natives'
 * win should GROW with data.
 *
 * Usage: NativeScaleProbe <dir> [dir2 ...]
 */
object NativeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.TmpWork.install("graft_nsprobe_")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.TmpWork.diskTmp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time3(label: String)(body: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-40s min=${ts.min}%.3f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // the OpsSpec HOF reference for word n-grams
    def wordNGramsHof(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(text, " ")
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    }

    dirs.foreach { dir =>
      println(s"===== $dir =====")
      val t = graft.tables.Tables(spark, dir)
      val names = t.customer.select(col("c_custkey"), col("c_name"))

      // DeletionKeys2 fragment (r04's explode)
      time3("deletionKeys2 native") {
        noop(names.select(col("c_custkey"),
          explode(graft.functions.VectorExpressions.deletionKeys2(col("c_name")))))
      }
      time3("deletionKeys2 HOF") {
        noop(names.select(col("c_custkey"),
          explode(graft.ops.FuzzyJoin.delete2KeysHof(col("c_name")))))
      }

      // WordNGrams fragment (st19's featurize) over document text
      val docs = t.documents.select(col("text"))
      time3("wordNGrams(3) native") {
        noop(docs.select(explode(
          graft.functions.VectorExpressions.wordNGrams(col("text"), 3))))
      }
      time3("wordNGrams(3) HOF") {
        noop(docs.select(explode(wordNGramsHof(col("text"), 3))))
      }

      // consumers end-to-end (count as the bench does)
      Seq("r03_fuzzy_join", "r04_fuzzy_join_ed2", "a19_text_semantic_dedup")
        .foreach { q =>
          time3(q) { graft.SparkEntry.queries(q)(spark, dir).count() }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
    }
    spark.stop()
  }
}
