package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftshim.{ArrayCosine, ArrayDot, ArraySqDist}

/**
 * Registers graft's native expressions as SQL functions, so
 * `SELECT graft_cosine(a.embedding, b.embedding)` works from plain SQL.
 *
 * Enable with:
 *   SparkSession.builder().withExtensions(new GraftExtensions)
 * or
 *   --conf spark.sql.extensions=graft.spark.GraftExtensions
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.binary

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[org.apache.spark.sql.graftshim.ArrayDot].getName, null, name, usage, "")
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(a, b) - dot product of two double arrays"),
      binary("graft_dot", ArrayDot.apply)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "_FUNC_(a, b) - cosine similarity of two double arrays"),
      binary("graft_cosine", ArrayCosine.apply)))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      info("graft_sqdist", "_FUNC_(a, b) - squared euclidean distance of two double arrays"),
      binary("graft_sqdist", ArraySqDist.apply)))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk", "_FUNC_(id, score, k) - top-k (id, score) pairs by score"),
      GraftExtensions.topkBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash", "_FUNC_(s) - portable polynomial byte hash mod 2^55-55"),
      GraftExtensions.unary("graft_polyhash",
        org.apache.spark.sql.graftshim.StringPolyHash.apply)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "_FUNC_(h32, numHashes, seed) - MinHash signature aggregate"),
      GraftExtensions.minhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "_FUNC_(h, bits) - SimHash bit-majority aggregate"),
      GraftExtensions.simhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      info("graft_hll", "_FUNC_(h, p, hashBits) - HyperLogLog distinct estimate aggregate"),
      GraftExtensions.hllBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      info("graft_cms", "_FUNC_(h, depth, width, seed) - Count-Min sketch aggregate"),
      GraftExtensions.cmsBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_kll"),
      info("graft_kll", "_FUNC_(x, k, probs) - KLL quantile-sketch aggregate"),
      GraftExtensions.kllBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_int8"),
      info("graft_int8", "_FUNC_(v) - int8 quantization of a double array"),
      GraftExtensions.unary("graft_int8",
        org.apache.spark.sql.graftshim.Int8Quantize.apply)))
  }
}

object GraftExtensions {

  private def binary(name: String, f: (Expression, Expression) => Expression):
      Seq[Expression] => Expression = { children =>
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${children.length}")
    f(children(0), children(1))
  }

  private[spark] def unary(name: String, f: Expression => Expression):
      Seq[Expression] => Expression = { children =>
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${children.length}")
    f(children(0))
  }

  private[spark] val topkBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"graft_topk requires exactly 3 arguments (id, score, k), got ${children.length}")
    org.apache.spark.sql.graftshim.TopKByScore(children(0), children(1), children(2))
  }

  private[spark] val minhashBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"graft_minhash requires exactly 3 arguments (h32, numHashes, seed), got ${children.length}")
    org.apache.spark.sql.graftshim.MinHashAgg(children(0), children(1), children(2))
  }

  private[spark] val simhashBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"graft_simhash requires exactly 2 arguments (h, bits), got ${children.length}")
    org.apache.spark.sql.graftshim.SimHashAgg(children(0), children(1))
  }

  private[spark] val hllBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"graft_hll requires exactly 3 arguments (h, p, hashBits), got ${children.length}")
    org.apache.spark.sql.graftshim.HllAgg(children(0), children(1), children(2))
  }

  private[spark] val cmsBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 4)
      throw new IllegalArgumentException(
        s"graft_cms requires exactly 4 arguments (h, depth, width, seed), got ${children.length}")
    org.apache.spark.sql.graftshim.CmsAgg(children(0), children(1), children(2), children(3))
  }

  private[spark] val kllBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"graft_kll requires exactly 3 arguments (x, k, probs), got ${children.length}")
    org.apache.spark.sql.graftshim.KllAgg(children(0), children(1), children(2))
  }

  /** Idempotently register the graft_* SQL functions on a LIVE session
    * (for sessions built without `spark.sql.extensions`). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftshim.FunctionRegistryBridge.register
    register(spark, "graft_dot", "_FUNC_(a, b) - dot product",
      binary("graft_dot", ArrayDot.apply))
    register(spark, "graft_cosine", "_FUNC_(a, b) - cosine similarity",
      binary("graft_cosine", ArrayCosine.apply))
    register(spark, "graft_sqdist", "_FUNC_(a, b) - squared euclidean distance",
      binary("graft_sqdist", ArraySqDist.apply))
    register(spark, "graft_topk", "_FUNC_(id, score, k) - top-k (id, score) pairs",
      topkBuilder)
    register(spark, "graft_polyhash", "_FUNC_(s) - portable polynomial byte hash",
      unary("graft_polyhash", org.apache.spark.sql.graftshim.StringPolyHash.apply))
    register(spark, "graft_minhash", "_FUNC_(h32, numHashes, seed) - MinHash aggregate",
      minhashBuilder)
    register(spark, "graft_simhash", "_FUNC_(h, bits) - SimHash aggregate",
      simhashBuilder)
    register(spark, "graft_hll", "_FUNC_(h, p, hashBits) - HyperLogLog distinct estimate",
      hllBuilder)
    register(spark, "graft_cms", "_FUNC_(h, depth, width, seed) - Count-Min sketch",
      cmsBuilder)
    register(spark, "graft_kll", "_FUNC_(x, k, probs) - KLL quantile sketch",
      kllBuilder)
    register(spark, "graft_int8", "_FUNC_(v) - int8 quantization of a double array",
      unary("graft_int8", org.apache.spark.sql.graftshim.Int8Quantize.apply))
  }
}
