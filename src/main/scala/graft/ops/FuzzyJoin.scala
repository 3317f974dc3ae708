package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance-bounded string join (fuzzy match): pair every left row
 * with every right row whose string is within Levenshtein distance 1 —
 * the entity-resolution primitive (near-identical names, typo'd keys,
 * OCR noise).
 *
 * A naive `levenshtein(a, b) <= 1` join has no equi-key, so Spark
 * plans a BroadcastNestedLoopJoin — O(|L|·|R|) DP computations, a
 * non-starter at scale. This operator uses the SYMMETRIC-DELETE
 * neighborhood (the FastSS / SymSpell signature): every string emits
 * itself plus its |s| single-character deletions, and two strings
 * within distance 1 provably share ≥ 1 key —
 *   - equal strings share the identity key;
 *   - a substitution at position p: deleting p from both sides yields
 *     the same string;
 *   - an insertion/deletion: the shorter string IS one of the longer
 *     one's deletion keys (and its own identity key).
 * The join becomes equi-keyed on the signature with the exact
 * Levenshtein predicate re-checked after, all in codegen'd built-ins
 * (`transform`/`explode`/`levenshtein`) — no UDF anywhere.
 *
 * Scale shape: each side explodes |s|+1-fold (strings, not documents —
 * keys are short), the shuffle carries (key, id, string), and
 * candidates are exact-key matches, so false positives are rare and
 * the DP recheck runs on candidate pairs only. A pathological key
 * (thousands of strings one edit from each other) is an AQE-splittable
 * equi-join hot key, not a window. Distance budgets > 1 would emit
 * C(|s|, d) keys — this operator deliberately fixes d = 1, the regime
 * where the neighborhood is linear.
 */
object FuzzyJoin {

  /** `s` plus all single-character deletions of `s`, as an array
    * column — the symmetric-delete signature set. */
  private def deletionKeys(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /**
   * All (left, right) pairs with levenshtein ≤ 1. Output columns:
   * `idL`, `idR` (caller-supplied names preserved), `dist`.
   * For a self-join pass the same frame twice and filter `idL < idR`
   * downstream to halve the mirror pairs.
   */
  def edJoin1(left: DataFrame, idL: String, strL: String,
      right: DataFrame, idR: String, strR: String): DataFrame = {
    val l = left.select(col(idL), col(strL).as("__sl"))
      .withColumn("__k", explode(deletionKeys(col("__sl"))))
    val r = right.select(col(idR), col(strR).as("__sr"))
      .withColumn("__k", explode(deletionKeys(col("__sr"))))
    l.join(r, "__k")
      .select(col(idL), col(idR), col("__sl"), col("__sr"))
      .distinct() // a pair can share several keys; dedup BEFORE the DP
      .select(col(idL), col(idR),
        levenshtein(col("__sl"), col("__sr")).as("dist"))
      .filter(col("dist") <= 1)
  }
}
