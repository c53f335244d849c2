package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares trend fitting from sufficient
  * statistics — the monitoring primitive behind "is this source's
  * volume/quality drifting over time" checks on a continuously
  * ingested corpus (the regression-slope complement to the
  * distributional PSI gate, q122).
  *
  * The whole fit is ONE map-side-combinable hash aggregate per group:
  * (n, Σx, Σy, Σxy, Σx², Σy²) over integer-valued x and y, then the
  * closed-form slope/intercept/R² from those six numbers. No window,
  * no sort, no second pass — at 100 TB the cost is the scan plus a
  * |groups|-row shuffle of six longs each.
  *
  * Determinism contract: the sums are EXACT (longs — associative, so
  * partitioning cannot change them); the final slope/intercept/R² are
  * a fixed IEEE-double expression tree over those exact sums, so any
  * engine evaluating the same tree gets the same bits (the DuckDB
  * oracle replays it verbatim). Caller owns unit scaling: x·y and y²
  * must fit a long — e.g. days × whole dollars at sf ≤ 1; rescale
  * units (weeks, k$) at larger magnitudes, which changes only the
  * slope's unit, not the fit.
  */
object TrendFit {

  /** Per-group OLS of y on x: `(group..., n, slope, intercept, r2)`.
    * Degenerate groups (n = 1, or all x equal ⇒ varx = 0) yield null
    * slope/intercept/r2 rather than a division error; constant-y
    * groups (vary = 0) fit slope 0 exactly and null r2.
    */
  def olsFit(df: DataFrame, groupCols: Seq[String], x: Column,
             y: Column): DataFrame = {
    val sums = df
      .select(groupCols.map(col) :+ x.cast("long").as("x")
        :+ y.cast("long").as("y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    // All products in DOUBLE space (exact longs widened once): n·Σxy
    // etc. can exceed long range at large n, and the double tree is
    // deterministic while a wrapped long overflow is garbage.
    val dn = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val cov = dn * d("sxy") - d("sx") * d("sy")
    val varx = dn * d("sxx") - d("sx") * d("sx")
    val vary = dn * d("syy") - d("sy") * d("sy")
    val slope = when(varx =!= 0.0, cov / varx)
    sums.select(groupCols.map(col) :+ col("n") :+ slope.as("slope") :+
      when(varx =!= 0.0, (d("sy") - (cov / varx) * d("sx")) / dn)
        .as("intercept") :+
      when(varx =!= 0.0 && vary =!= 0.0, (cov * cov) / (varx * vary))
        .as("r2"): _*)
  }
}
