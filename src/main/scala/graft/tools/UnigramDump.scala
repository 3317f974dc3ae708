package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: train the t37 unigram piece table on the standard
  * bounded sample (`CorpusOps2.bpe1kTrainingSource` — the first 1000
  * sf0.01 customer names, the one SF-scaling vocabulary) and print it
  * in the compact `piece lp_micro` per-line form
  * `UnigramQueries.UnigramPieces` parses — regenerating the pinned
  * literal when trainer parameters change.
  * Usage: UnigramDump [vocabSize] [sfDir]. */
object UnigramDump {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(64)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(spark, sf)
    val pieces = graft.ops.Unigram.train(
      graft.ops.Bpe.wordFreq(src, "text"), vocabSize = n)
    println(s"-- ${pieces.length} pieces --")
    // one "piece lp_micro" per line; a post-normalization piece can
    // never contain a space (words split on spaces)
    pieces.foreach { case (p, lp) => println(s"$p $lp") }
    spark.stop()
  }
}
