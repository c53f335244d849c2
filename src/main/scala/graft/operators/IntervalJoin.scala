package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join: both sides are intervals and a pair matches
  * iff they overlap (`a.s ≤ b.e AND b.s ≤ a.e`) — the two-sided
  * generalization of the point-in-interval range join (q36) and the
  * as-of family (q35/q59/q114), the shape of log correlation, outage
  * blast-radius, and genomics overlap queries. A naive theta join is
  * a cartesian product; the distributed plan BUCKETS time: each
  * interval explodes to the fixed-width buckets it touches, the join
  * is an EQUI-join on bucket id, and the exact predicate filters
  * within bucket.
  *
  * The classic duplicate problem (a pair overlapping across several
  * buckets matches in each) is solved WITHOUT a distinct shuffle by
  * canonical-bucket emission: a pair is kept only in the bucket
  * containing `greatest(a.s, b.s)` — exactly one bucket qualifies,
  * so the join output is already duplicate-free (the "report at the
  * leftmost common point" trick from distributed spatial joins).
  *
  * Scale shape: explode factor = interval span / bucket width (pick
  * width ≈ typical span: short intervals explode to ~1-2 rows);
  * shuffle keys are bucket ids, so temporal skew (a hot hour) is
  * visible and saltable; no distinct, no cartesian. Per-bucket work
  * is |A_b|×|B_b| — the irreducible output-bound cost.
  */
object IntervalJoin {

  /** @param a,b     inputs with (idCol, sCol, eCol) — epoch-second longs
    * @param widthSec bucket width in seconds
    * @return (a_id, b_id, overlap_s) — inclusive overlap, 0 = touching
    */
  def overlap(a: DataFrame, b: DataFrame, idCol: String, sCol: String,
              eCol: String, widthSec: Long): DataFrame = {
    def explodeSide(df: DataFrame, p: String) = df.select(
      col(idCol).as(s"${p}_id"), col(sCol).as(s"${p}_s"),
      col(eCol).as(s"${p}_e"),
      explode(sequence(floor(col(sCol) / widthSec),
        floor(col(eCol) / widthSec))).as("bucket"))
    val ea = explodeSide(a, "a")
    val eb = explodeSide(b, "b")
    ea.join(eb, "bucket")
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        // canonical bucket: exactly one bucket holds the later start,
        // so each overlapping pair survives exactly once — dedup
        // without a distinct shuffle
        col("bucket") === floor(greatest(col("a_s"), col("b_s")) / widthSec))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_s"))
  }
}
