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

  /** Signature elements of `s`: the identity key (pos 0) plus every
    * single-character deletion, each tagged with the deleted POSITION
    * and CHARACTER. The provenance makes the distance DERIVABLE at
    * match time — see [[edJoin1]] — so no DP ever runs. */
  private def keyedElements(df: DataFrame, id: String, str: String,
      side: Int): DataFrame = {
    val s = col(str)
    // sequence(1, 0) is DESCENDING ([1, 0]) in Spark, not empty — an
    // empty string would emit two phantom deletion elements (the pos=0
    // one masquerading as the identity key, double-matching other empty
    // strings at dist 0 AND 1), so guard the index range explicitly.
    // FuzzyStream.elements already handles empty input; this keeps the
    // batch and streaming signatures agreeing on that edge.
    val idx = when(length(s) >= 1, sequence(lit(1), length(s)))
      .otherwise(array().cast("array<int>"))
    val dels = transform(idx, i =>
      struct(i.as("pos"), s.substr(i, lit(1)).as("ch"),
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))).as("k")))
    val idk = array(struct(lit(0).as("pos"), lit("").as("ch"), s.as("k")))
    df.select(col(id), explode(concat(idk, dels)).as("e"))
      .select(col("e.k").as("__k"), lit(side).as("side"),
        col("e.pos").as("pos"), col("e.ch").as("ch"), col(id).as("id"))
  }

  /**
   * All (left, right) pairs with levenshtein ≤ 1. Output columns:
   * `idL`, `idR` (caller-supplied names preserved), `dist`.
   * For a self-join pass the same frame twice and filter `idL < idR`
   * downstream to halve the mirror pairs.
   *
   * No join and no DP: elements group by signature key in ONE shuffle
   * of (key, side, pos, ch, id) rows (the `bucketPairs` idiom the
   * MinHash operators use — a signature JOIN materializes every
   * candidate row with both string payloads through a sort-merge
   * exchange, measured 4× slower on the sf0.1 name join), and inside
   * a group the provenance tags decide membership AND distance
   * outright:
   *   - identity × identity     → the strings are equal: dist 0;
   *   - same pos, deleted chars DIFFER → a substitution at pos: dist 1
   *     (equal deleted chars would mean equal strings — covered by the
   *     identity pair, so emitting nothing loses nothing);
   *   - identity × deletion     → one string is the other minus a
   *     char: dist 1 (lengths differ, never equal);
   *   - different deletion positions → distance can be 2 ("ab"/"ba"):
   *     NOT emitted — any true substitution pair shares its own
   *     same-position key, so soundness is preserved.
   */
  def edJoin1(left: DataFrame, idL: String, strL: String,
      right: DataFrame, idR: String, strR: String): DataFrame = {
    val es = keyedElements(left, idL, strL, side = 0)
      .unionAll(keyedElements(right, idR, strR, side = 1))
    val grouped = es.groupBy("__k")
      .agg(collect_list(struct(col("side"), col("pos"), col("ch"), col("id"))).as("es"))
    val ls = filter(col("es"), e => e("side") === 0)
    val pairs = flatten(transform(ls, a =>
      transform(
        filter(col("es"), b => b("side") === 1 &&
          ((a("pos") === 0 && b("pos") === 0) ||
            (a("pos") === b("pos") && a("ch") =!= b("ch")) ||
            ((a("pos") === 0) =!= (b("pos") === 0)))),
        b => struct(a("id").as("l"), b("id").as("r"),
          when(a("pos") === 0 && b("pos") === 0, 0).otherwise(1).as("d")))))
    grouped
      .select(explode(pairs).as("p"))
      .select(col("p.l").as(idL), col("p.r").as(idR), col("p.d").as("dist"))
      .distinct()
  }
}
