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

  /** Per-group EXACT trimmed and winsorized sums — the robust
    * location aggregates (drop, or clamp to, the outer n/trimDiv
    * order statistics) computed on the VALUE DOMAIN: a tie group
    * covering ranks (cum, cum+cnt] contributes
    * max(0, min(hi, cum+cnt) − max(lo, cum)) copies, so the whole
    * thing is one distinct-value aggregate + one running window +
    * one fold — no row-level sort, no percentile interpolation,
    * exact integers end-to-end (`valueCol` must be integral, e.g.
    * cents). Output: groupCols ++ (n, n_kept, trimmed_sum,
    * winsor_sum) where winsorized replaces each trimmed tail value
    * by the boundary order statistic (ranks lo+1 and hi).
    */
  def trimmedStats(df: DataFrame, groupCols: Seq[String],
                   valueCol: String, trimDiv: Long = 10L): DataFrame = {
    require(trimDiv >= 2, s"trimDiv must be >= 2: $trimDiv")
    val gk = groupCols.map(col)
    val byV = df.select(gk :+ col(valueCol).cast("long").as("v"): _*)
      .groupBy(gk :+ col("v"): _*).agg(count(lit(1)).as("cnt"))
    val before = Window.partitionBy(gk: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(gk: _*)
    val staged = byV
      .withColumn("cum", coalesce(sum("cnt").over(before), lit(0L)))
      .withColumn("n", sum("cnt").over(whole))
      .withColumn("lo", expr(s"n div ${trimDiv}L"))
      .withColumn("hi", col("n") - col("lo"))
      .withColumn("kv", greatest(lit(0L),
        least(col("hi"), col("cum") + col("cnt")) -
          greatest(col("lo"), col("cum"))))
    staged.groupBy(gk: _*)
      .agg(first("n").as("n"), first("lo").as("graft_lo"),
        (first("hi") - first("lo")).as("n_kept"),
        sum(col("kv") * col("v")).as("trimmed_sum"),
        min(when(col("cum") + col("cnt") >= col("lo") + 1, col("v")))
          .as("graft_vlo"),
        min(when(col("cum") + col("cnt") >= col("hi"), col("v")))
          .as("graft_vhi"))
      .select(gk :+ col("n") :+ col("n_kept") :+ col("trimmed_sum") :+
        (col("trimmed_sum") + col("graft_lo") *
          (col("graft_vlo") + col("graft_vhi"))).as("winsor_sum"): _*)
  }
}
