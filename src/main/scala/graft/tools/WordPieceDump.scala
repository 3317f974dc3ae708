package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: train the t41 WordPiece vocabulary on the standard
  * bounded sample (`CorpusOps2.bpe1kTrainingSource` — the first 1000
  * sf0.01 customer names, the one SF-scaling vocabulary) and print it
  * one piece per line — regenerating the pinned
  * `WordPieceVocabTable` literal when trainer parameters change.
  * Usage: WordPieceDump [numMerges] [sfDir]. */
object WordPieceDump {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(512)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = graft.queries.CorpusOps2.bpe1kTrainingSource(spark, sf)
    val vocab = graft.ops.WordPiece.train(
      graft.ops.Bpe.wordFreq(src, "text"), numMerges = n)
    println(s"-- ${vocab.length} pieces --")
    vocab.foreach(println)
    spark.stop()
  }
}
