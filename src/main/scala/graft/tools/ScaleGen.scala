package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev-only scale-up generator: synthesizes an sf1-equivalent slice
 * from the read-only sf0.1 testdata by replicating every table
 * `factor`× under disjoint id ranges, so the scale-sensitive bench set
 * can be measured at 10× rows (SURVEY §5's scaling-exponent
 * validation). NOT part of the library surface; never touches
 * /root/testdata.
 *
 * Replicas must not look like duplicates of each other or the dedup
 * family would measure a 10×-denser duplicate graph instead of a 10×
 * corpus (at real scale, duplication density does not grow with
 * corpus size):
 *  - documents: every word gets a per-replica suffix — replica
 *    Jaccard/shingle overlap is zero, while the in-replica dup
 *    structure (what the detectors hunt) is preserved exactly;
 *    vocabulary grows with the corpus, as a bigger crawl's does.
 *  - embeddings: cyclic coordinate rotation by the replica index —
 *    norm-preserving, and a Gaussian vector is ~orthogonal to its
 *    rotation, so ANN bucket geometry stays uniform instead of
 *    collapsing into 10-point clusters.
 *  - fact/dim keys shift by disjoint offsets consistently, so joins
 *    stay referentially intact and per-replica skew is preserved.
 * All transforms are deterministic column expressions — no rand().
 */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("tmp/sfscale")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def replicate(name: String)(tf: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until factor).map(r => tf(base, r)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name x$factor -> $dst")
    }
    val Off = 10000000L

    replicate("documents") { (df, r) =>
      val text =
        if (r == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$r"))), " ")
      df.select((col("doc_id") + lit(r * Off)).as("doc_id"), text.as("text"),
        col("lang"), col("source"), length(text).cast("long").as("n_chars"))
    }
    replicate("embeddings") { (df, r) =>
      val dim = 64
      val rot = r % dim
      val emb =
        if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      df.select((col("vec_id") + lit(r * Off)).as("vec_id"),
        emb.as("embedding"), col("label"))
    }
    replicate("events") { (df, r) =>
      df.select((col("event_id") + lit(r * Off)).as("event_id"), col("ts"),
        (col("user_id") + lit(r * Off)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    replicate("lineitem") { (df, r) =>
      df.select((col("l_orderkey") + lit(r * Off * 100)).as("l_orderkey"),
        (col("l_partkey") + lit(r * Off)).as("l_partkey"),
        (col("l_suppkey") + lit(r * Off)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }
    replicate("orders") { (df, r) =>
      df.select((col("o_orderkey") + lit(r * Off * 100)).as("o_orderkey"),
        (col("o_custkey") + lit(r * Off)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }
    replicate("customer") { (df, r) =>
      // decorrelate names like documents' word suffixes: a verbatim
      // 10× name copy made every edit-distance pair 100× denser (the
      // r03 fuzzy join read 36 s at sf1 on pure replica cross-talk).
      // The doubled-digit suffix is pairwise ED ≥ 2 BETWEEN replicas
      // (both chars differ) and ED ≥ 3 vs the unsuffixed base, so
      // cross-replica pairs vanish while every intra-replica pair —
      // the structure the operator hunts — is preserved exactly.
      val name =
        if (r == 0) col("c_name")
        else concat(col("c_name"), lit(s"_$r$r"))
      df.withColumn("c_custkey", col("c_custkey") + lit(r * Off))
        .withColumn("c_name", name)
    }
    replicate("supplier") { (df, r) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(r * Off))
    }
    replicate("part") { (df, r) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(r * Off))
    }
    // geography dims are fixed-cardinality at every SF
    for (name <- Seq("region", "nation")) {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name copied")
    }
    spark.stop()
  }
}
