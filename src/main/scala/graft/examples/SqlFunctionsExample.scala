package graft.examples

import org.apache.spark.sql.SparkSession

/** Tour of the graft_* SQL functions (native codegen'd expressions). */
object SqlFunctionsExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.GraftExtensions.ensureRegistered(spark)

    println("cosine(identical)=" +
      spark.sql("SELECT graft_cosine(array(1.0d,0.0d), array(1.0d,0.0d))").head.getDouble(0))
    println("dot(int arrays, implicit cast)=" +
      spark.sql("SELECT graft_dot(array(1,2), array(3,4))").head.getDouble(0))
    try spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    catch { case e: Exception =>
      println("wrong arity -> " + e.getMessage.linesIterator.next()) }
    try spark.sql("SELECT graft_cosine('a', 'b')").collect()
    catch { case e: Exception =>
      println("wrong type -> " + e.getMessage.linesIterator.next()) }
    println("topk: " + spark.sql(
      """SELECT graft_topk(id, score, 2) FROM VALUES
        |  (1L, 0.5d), (2L, 0.9d), (3L, 0.9d), (4L, 0.1d) AS t(id, score)
        |""".stripMargin).head.get(0))
    graft.spark.GraftExtensions.ensureRegistered(spark) // idempotent
    println("re-registration ok")
    spark.stop()
  }
}
