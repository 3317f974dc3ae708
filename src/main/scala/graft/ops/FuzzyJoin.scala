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
 * equi-join hot key, not a window. Distance budgets > 1 emit C(|s|, d)
 * keys — [[edJoin1]] keeps the linear-neighborhood d = 1 regime with a
 * provenance trick that needs NO distance computation at all;
 * [[edJoin2]] extends to d = 2 (the budget real person/org-name entity
 * resolution needs) with the quadratic |s|²/2-key neighborhood and a
 * banded-DP recheck on candidates.
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
    // One native pass per group ([[graftshim.EditPairs1]]) — the HOF
    // formulation below ([[edJoin1PairsHof]]) is kept verbatim as the
    // independent reference the spec diffs it against (FuzzyJoinSpec:
    // native ≡ HOF bit-for-bit, incl. order, on random groups).
    grouped
      .select(explode(graft.functions.VectorExpressions.editPairs1(col("es"))).as("p"))
      .select(col("p.l").as(idL), col("p.r").as(idR), col("p.d").as("dist"))
      .distinct()
  }

  /** The original higher-order-function pair expansion (interpreted
    * nested lambdas: O(|L|·|R|) evaluations + a struct copy per
    * candidate, per signature group); spec-only reference for
    * [[graftshim.EditPairs1]]. Input column: the collect_list'd
    * array<struct<side, pos, ch, id>> group. */
  private[graft] def edJoin1PairsHof(es: Column): Column = {
    val ls = filter(es, e => e("side") === 0)
    flatten(transform(ls, a =>
      transform(
        filter(es, b => b("side") === 1 &&
          ((a("pos") === 0 && b("pos") === 0) ||
            (a("pos") === b("pos") && a("ch") =!= b("ch")) ||
            ((a("pos") === 0) =!= (b("pos") === 0)))),
        b => struct(a("id").as("l"), b("id").as("r"),
          when(a("pos") === 0 && b("pos") === 0, 0).otherwise(1).as("d")))))
  }

  /** Deletion-neighborhood signature of `s` at radius ≤ 2: the string
    * itself, every single-character deletion (|s| keys), and every
    * two-character deletion (C(|s|, 2) keys — positions i < j removed).
    * Two strings within Levenshtein distance 2 provably share a key:
    * an optimal alignment with s substitutions, i insertions and e
    * deletions (s+i+e ≤ 2) leaves a common subsequence reachable from
    * the left string by s+e ≤ 2 deletions and from the right by
    * s+i ≤ 2 — the FastSS/SymSpell guarantee at d = 2. Deduplicated:
    * repeated characters yield coinciding variants, which would fan
    * the candidate join out for nothing. */
  /** dev-profiling accessor for [[delete2Keys]] (tools.BatchProfile). */
  private[graft] def delete2KeysForProfile(s: Column): Column = delete2Keys(s)

  /** One native pass per row ([[graftshim.DeletionKeys2]]) — the HOF
    * formulation below is kept verbatim as the independent reference
    * the spec diffs it against (FuzzyJoinSpec: native ≡ HOF
    * bit-for-bit on non-null input, incl. multibyte and repeats). */
  private def delete2Keys(s: Column): Column =
    graft.functions.VectorExpressions.deletionKeys2(s)

  /** The original higher-order-function formulation (interpreted
    * lambda + three substr copies per (i, j) element — O(|s|²)
    * interpreted evaluations per row); spec-only reference. */
  private[graft] def delete2KeysHof(s: Column): Column = {
    val idx = when(length(s) >= 1, sequence(lit(1), length(s)))
      .otherwise(array().cast("array<int>"))
    val d1 = transform(idx, i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val d2 = flatten(transform(idx, i =>
      transform(filter(idx, j => j > i), j =>
        concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, j - i - lit(1)),
          s.substr(j + 1, length(s))))))
    array_distinct(concat(array(s), d1, d2))
  }

  /**
   * All (left, right) pairs with levenshtein ≤ 2 — [[edJoin1]]'s big
   * sibling for the entity-resolution regime where one typo is not
   * enough (person/org names, OCR'd identifiers). Output columns:
   * `idL`, `idR`, `dist` (0/1/2).
   *
   * Shape: signature equi-join on the radius-2 deletion neighborhood,
   * then the EXACT banded-DP recheck (`levenshtein(l, r, 2)` — Spark's
   * threshold form short-circuits the DP at band 2, so a false
   * candidate costs O(|s|), not O(|s|²)). Unlike edJoin1, shared keys
   * at radius 2 admit true distances up to 4 (two deletions each
   * side), so the recheck is load-bearing, not belt-and-braces.
   *
   * Scale shape: the |s|²/2-key explode carries (key, id) ONLY — the
   * candidate join never shuffles string payloads; candidates dedupe
   * to (idL, idR) before the strings join back in (two broadcast-able
   * or bucketed id-keyed joins against the inputs), so the DP runs
   * once per candidate PAIR, not per shared key. Hot signature keys
   * (dense near-duplicate clusters) are AQE-splittable equi-join keys.
   */
  def edJoin2(left: DataFrame, idL: String, strL: String,
      right: DataFrame, idR: String, strR: String): DataFrame = {
    val lk = left.select(col(idL), explode(delete2Keys(col(strL))).as("__k"))
    val rk = right.select(col(idR), explode(delete2Keys(col(strR))).as("__k"))
    val cand = lk.join(rk, "__k").select(col(idL), col(idR)).distinct()
    cand
      .join(left.select(col(idL), col(strL)), Seq(idL))
      .join(right.select(col(idR), col(strR)), Seq(idR))
      .select(col(idL), col(idR),
        levenshtein(col(strL), col(strR), 2).as("dist"))
      .filter(col("dist") >= 0)
  }
}
