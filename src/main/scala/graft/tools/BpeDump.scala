package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: train the t20 merge table at a given merge count on the
  * standard bounded sample (first 100 sf0.01 docs by id) and print it
  * in the compact `x y` per-line form `CorpusOps2.BpeFixedMerges`
  * parses — regenerating the pinned literal when the merge count
  * changes. Usage: BpeDump [numMerges] [sfDir]. */
object BpeDump {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1024)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(spark, sf)
    val merges = graft.ops.Bpe.train(
      graft.ops.Bpe.wordFreq(src, "text"), numMerges = n)
    println(s"-- ${merges.length} merges --")
    // one "x y" pair per line; neither side can contain a space (the
    // alphabet is post-normalization ASCII words split on spaces)
    merges.foreach { case (x, y) => println(s"$x $y") }
    spark.stop()
  }
}
