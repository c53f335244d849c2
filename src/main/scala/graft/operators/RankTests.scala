package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rank-based two-sample tests — the nonparametric "did this
  * source's metric distribution shift" gates that work without any
  * normality assumption (the location-shift complement to q144's KS
  * shape test). Everything runs in DOUBLED-RANK integer space:
  * a tie group spanning ranks [a, b] has average rank (a+b)/2, so its
  * doubled average 2·cum_before + cnt + 1 is an exact integer — no
  * fractional ranks, no floats, hash-identical on any engine.
  *
  * Scale shape: one hash aggregate to the DISTINCT-VALUE table
  * (value-domain-bounded — integer cents, not rows), one running
  * window over it, one fold to a single row. The corpus is scanned
  * once; nothing row-sized is sorted.
  */
object RankTests {

  /** Mann–Whitney U between `groupA` and `groupB` rows of `groupCol`,
    * over exact-integer `valueCol`. One row:
    * (n_a, n_b, u_a_x2, tie_cubes) — u_a_x2 is 2·U_A (doubled to stay
    * integer under tie half-ranks), tie_cubes = Σ(t³−t) feeds the
    * tie-corrected variance; the z-score is one driver-side sqrt:
    * z = (U_A − n_a·n_b/2) / sqrt(n_a·n_b/12 · ((N+1) − tie_cubes/
    * (N(N−1)))). Identity U_A + U_B = n_a·n_b holds exactly.
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
                   groupA: String, groupB: String): DataFrame = {
    val filtered = df.filter(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).cast("long").as("v"),
        (col(groupCol) === groupA).cast("long").as("is_a"))
    val byV = filtered.groupBy("v")
      .agg(count(lit(1)).as("cnt"), sum("is_a").as("cnt_a"))
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byV.withColumn("cum",
      coalesce(sum(col("cnt")).over(before), lit(0L)))
    ranked.agg(
        sum("cnt").as("n_all"), sum("cnt_a").as("n_a"),
        sum(col("cnt_a") * (col("cum") * 2 + col("cnt") + 1))
          .as("r_a_x2"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt"))
          .as("tie_cubes"))
      .select(col("n_a"), (col("n_all") - col("n_a")).as("n_b"),
        (col("r_a_x2") - col("n_a") * (col("n_a") + 1)).as("u_a_x2"),
        col("tie_cubes"))
  }
}
