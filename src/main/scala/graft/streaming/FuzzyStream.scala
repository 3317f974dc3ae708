package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming fuzzy (edit-distance-1) entity matching — the streaming
 * twin of `graft.ops.FuzzyJoin.edJoin1`: as records arrive, each is
 * matched typo-tolerantly against everything previously seen, emitting
 * (first_seen_id, new_id, dist) for every match. The entity-resolution
 * ingest shape: a canonical record owns each name neighborhood and
 * later typo'd variants attach to it.
 *
 * Signature scheme and distance derivation are identical to the batch
 * operator (symmetric-delete keys carrying the deleted POSITION and
 * CHARACTER; provenance decides membership and distance, no DP —
 * see `FuzzyJoin.edJoin1`'s rules). The only state is per-KEY: the
 * FIRST owner of the key plus its element provenance — bounded by the
 * owner's string length, never by stream volume — expired by
 * event-time timeout one watermark horizon after the key goes idle.
 *
 * Matches are emitted against the key's OWNER only (the star rule
 * `DedupStream.candidatePairs` applies to oversized buckets, here
 * applied uniformly): members of a neighborhood link transitively
 * through the owner, and state stays O(|s|) per key instead of
 * O(members). A pair sharing several keys is emitted once per key
 * (at-least-once — `.dropDuplicates`/`distinct` restores
 * exactly-once downstream, same contract as candidatePairs).
 */
object FuzzyStream {

  final case class Rec(id: Long, s: String, ts: Timestamp)
  final case class KeyedEl(key: String, pos: Int, ch: String, id: Long, ts: Timestamp)
  /** First owner of a key: id + the provenance (pos, ch) of every
    * element the owner holds for this key (one string yields several
    * elements for the same key only across runs of equal characters,
    * so the arrays are short). */
  final case class KeyState(owner: Long, poses: Array[Int], chs: Array[String],
      newestMs: Long)
  final case class FuzzyMatch(id_a: Long, id_b: Long, dist: Int)

  /** The symmetric-delete elements of one record — identity key at
    * pos 0 plus each single-character deletion tagged (pos, deleted
    * char). Row-local, bit-identical to the batch `keyedElements`. */
  def elements(r: Rec): Seq[KeyedEl] = {
    val s = r.s
    val dels = (1 to s.length).map { i =>
      KeyedEl(s.substring(0, i - 1) + s.substring(i), i, s.substring(i - 1, i),
        r.id, r.ts)
    }
    KeyedEl(s, 0, "", r.id, r.ts) +: dels
  }

  /** Batch-rule validity of a candidate element against one owner
    * element, and the derived distance (see FuzzyJoin.edJoin1). */
  private def matchDist(ownPos: Int, ownCh: String, pos: Int, ch: String): Int =
    if (ownPos == 0 && pos == 0) 0
    else if (ownPos == pos && ownCh != ch) 1
    else if ((ownPos == 0) != (pos == 0)) 1
    else -1

  def matches(recs: Dataset[Rec], watermark: String): Dataset[FuzzyMatch] = {
    implicit val elEnc = Encoders.product[KeyedEl]
    implicit val stEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[FuzzyMatch]
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    val horizonMs = math.max(1L,
      iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L)
    val keyed = recs.flatMap(elements _).withWatermark("ts", watermark)
    keyed
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[KeyState, FuzzyMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, batch: Iterator[KeyedEl], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.orNull
            var newest = if (st == null) Long.MinValue else st.newestMs
            val out = Vector.newBuilder[FuzzyMatch]
            // deterministic in-batch order (MemoryStream/batch parity)
            batch.toArray.sortBy(e => (e.ts.getTime, e.id, e.pos)).foreach { e =>
              newest = math.max(newest, e.ts.getTime)
              if (st == null) {
                st = KeyState(e.id, Array(e.pos), Array(e.ch), newest)
              } else if (e.id == st.owner) {
                // further owner elements for this key (equal-char runs)
                st = KeyState(st.owner, st.poses :+ e.pos, st.chs :+ e.ch, newest)
              } else {
                // best = MIN valid distance: an equal-string pair
                // matches identity×identity (0) AND identity×deletion
                // (1) when the owner holds both element kinds
                var best = Int.MaxValue
                var k = 0
                while (best > 0 && k < st.poses.length) {
                  val d = matchDist(st.poses(k), st.chs(k), e.pos, e.ch)
                  if (d >= 0 && d < best) best = d
                  k += 1
                }
                if (best != Int.MaxValue) out += FuzzyMatch(st.owner, e.id, best)
              }
            }
            state.update(KeyState(st.owner, st.poses, st.chs, newest))
            val base = math.max(newest, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(base + horizonMs)
            out.result().iterator
          }
      }
  }
}
