package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: train the t42 BYTE-LEVEL merge table at a given merge
  * count on the standard bounded sample (first 1000 sf0.01 customer
  * names by key, RAW — no normalization, byte-level's lossless
  * contract) and print it in the `x y` per-line form
  * `ByteBpeQueries.ByteBpeMerges1k` parses. Usage:
  * ByteBpeDump [numMerges] [sfDir]. */
object ByteBpeDump {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1024)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(spark, sf)
    val merges = graft.ops.ByteBpe.train(
      graft.ops.ByteBpe.wordFreq(src, "text"), numMerges = n)
    println(s"-- ${merges.length} merges --")
    // one "x y" pair per line; symbols are hex strings, never spaced
    merges.foreach { case (x, y) => println(s"$x $y") }
    spark.stop()
  }
}
