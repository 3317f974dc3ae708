package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Manual skew mitigation for equi-joins where one side has hot keys.
 *
 * AQE's skew-join split (on by default) handles most cases at runtime;
 * this explicit salt is for the plans AQE can't split (e.g. a skewed
 * aggregation feeding the join, or deterministic-layout requirements).
 *
 * The big side scatters each row into one of `salt` sub-keys via a
 * deterministic hash of the whole row; the small side is replicated
 * `salt` times (explode of a literal sequence — no shuffle, the
 * replication happens map-side on the already-shuffled or broadcast
 * small side). Result set is identical to the plain join.
 */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full outer would emit one null-padded row PER SALT for each
    // unmatched small-side row — only big-side-preserving types are sound.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoin does not support join type '$joinType': the replicated " +
        "small side would duplicate unmatched rows in right/full outer joins")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
