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

  /** Per-group THEIL–SEN trend — the robust complement to [[olsFit]]
    * (breakdown point 29% vs OLS's single-outlier failure: one bad
    * ingest day cannot flip a drift verdict). The estimate is the
    * LOWER MEDIAN (the ⌈P/2⌉-th smallest, a pure order statistic —
    * no interpolation arithmetic to pin) of all pairwise slopes
    * (y₂−y₁)/(x₂−x₁) over x₁ < x₂. Each slope is ONE IEEE division
    * of exact integers — correctly rounded by the standard, hence
    * bit-identical on any engine — so the output is hash-exact
    * without a float pin.
    *
    * Input contract: one row per (group, x) — pre-aggregate to a
    * BOUNDED x domain first (days/months/buckets). The pair join is
    * |group|·n² on that bounded domain (months of a decade ≈ 10⁴
    * pairs/group), NEVER on raw rows; x·1 and y must fit longs. For
    * unbounded domains use the sampled repeated-median variant: cap
    * points per group by a deterministic hash rank, which bounds
    * pairs at maxPoints² with the estimator's usual √-consistency —
    * that cap is the caller's pre-aggregation choice, not hidden
    * here.
    */
  def theilSen(df: DataFrame, groupCols: Seq[String], x: Column,
               y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gk = groupCols.map(col)
    val pts = df.select(gk :+ x.cast("long").as("x")
      :+ y.cast("long").as("y"): _*)
    val a = pts.select(gk :+ col("x").as("x1") :+ col("y").as("y1"): _*)
    val b = pts.select(gk :+ col("x").as("x2") :+ col("y").as("y2"): _*)
    val pairs = a.join(b, groupCols).filter(col("x1") < col("x2"))
      .withColumn("slope", (col("y2") - col("y1")).cast("double") /
        (col("x2") - col("x1")).cast("double"))
    val ordered = Window.partitionBy(gk: _*)
      .orderBy(col("slope"), col("x1"), col("x2"))
    val whole = Window.partitionBy(gk: _*)
    val med = pairs
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n_pairs", count(lit(1)).over(whole))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
    val npts = pts.groupBy(gk: _*).agg(count(lit(1)).as("n_points"))
    med.join(npts, groupCols)
      .select(gk :+ col("n_points") :+ col("n_pairs")
        :+ col("slope").as("ts_slope"): _*)
  }

  /** Per-group MANN–KENDALL trend TEST statistics — the
    * non-parametric "is there a monotone trend at all" significance
    * companion to [[theilSen]]'s magnitude (Mann 1945, Kendall's τ):
    * S = Σ_{x_i<x_j} sign(y_j − y_i), with the tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18. Both are
    * emitted as EXACT INTEGERS (S and the ×18 variance numerator
    * `var18`) — the z-score is one driver-side division/sqrt away,
    * but the engine-side contract stays hash-exact with no float to
    * pin. Same bounded-x-domain pre-aggregation contract as
    * [[theilSen]]: pairs are domain², never rows².
    * Output: (groupCols..., n_points, s_stat, var18).
    */
  def mannKendall(df: DataFrame, groupCols: Seq[String], x: Column,
                  y: Column): DataFrame = {
    val gk = groupCols.map(col)
    val pts = df.select(gk :+ x.cast("long").as("x")
      :+ y.cast("long").as("y"): _*)
    val a = pts.select(gk :+ col("x").as("x1") :+ col("y").as("y1"): _*)
    val b = pts.select(gk :+ col("x").as("x2") :+ col("y").as("y2"): _*)
    val sStat = a.join(b, groupCols).filter(col("x1") < col("x2"))
      .groupBy(gk: _*)
      .agg(sum(signum(col("y2") - col("y1")).cast("long")).as("s_stat"))
    val n = pts.groupBy(gk: _*).agg(count(lit(1)).as("n_points"))
    // tie groups over y: Σ t(t−1)(2t+5) per group
    val ties = pts.groupBy(gk :+ col("y"): _*)
      .agg(count(lit(1)).as("t"))
      .groupBy(gk: _*)
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
        .as("tie_corr"))
    n.join(sStat, groupCols).join(ties, groupCols)
      .select(gk :+ col("n_points") :+ col("s_stat") :+
        (col("n_points") * (col("n_points") - 1) *
          (col("n_points") * 2 + 5) - col("tie_corr")).as("var18"): _*)
  }
}
