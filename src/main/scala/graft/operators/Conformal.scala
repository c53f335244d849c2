package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal filtering — quality gating with a DISTRIBUTION-FREE
  * false-flag guarantee (Vovk's inductive conformal prediction, the
  * Angelopoulos–Bates tutorial form): calibrate a per-group threshold
  * τ_g on held-out scores, flag rows whose nonconformity exceeds it,
  * and under exchangeability the probability a clean row is flagged is
  * ≤ α — a guarantee no fixed hand-picked cutoff gives. This is how a
  * corpus filter's aggressiveness is CONTROLLED rather than guessed:
  * α is a budget, not a vibe.
  *
  * τ_g is the ⌈(n_g+1)·(1−α)⌉-th smallest calibration score — a pure
  * order statistic (no interpolation, no floats): with α = num/den
  * rational, the rank is exact integer arithmetic and the whole
  * output is hash-reproducible on any engine. If the rank exceeds n_g
  * (calibration too small for the requested α) τ_g is null and
  * NOTHING in that group is flagged — the honest failure mode: the
  * guarantee is vacuous rather than silently violated.
  *
  * Scale shape: calibration needs one per-group sort (a window over
  * the calibration SAMPLE — conformal validity needs only an
  * exchangeable sample, so at 100 TB calibration is a bounded
  * hash-sample, never the corpus); the apply pass is a broadcast of
  * the |groups|-row threshold table + one filtered aggregate over the
  * scan. No corpus-sized sort anywhere.
  */
object Conformal {

  /** Per-group conformal gate report:
    * (groupCols..., n_cal, tau, n_apply, n_flagged), where rows with
    * score > τ are flagged and α = alphaNum/alphaDen. `cal` and
    * `apply` must both carry groupCols and the score column; higher
    * score = more nonconforming.
    */
  def splitConformal(cal: DataFrame, apply: DataFrame,
                     groupCols: Seq[String], scoreCol: String,
                     alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1): $alphaNum/$alphaDen")
    import org.apache.spark.sql.expressions.Window
    val gk = groupCols.map(col)
    val ranked = cal
      .withColumn("graft_cf_rn", row_number().over(
        Window.partitionBy(gk: _*).orderBy(col(scoreCol))))
      .withColumn("graft_cf_n", count(lit(1)).over(
        Window.partitionBy(gk: _*)))
    // rank = ⌈(n+1)(den−num)/den⌉ in exact integer arithmetic
    val keepNum = alphaDen - alphaNum
    val taus = ranked
      .withColumn("graft_cf_idx", expr(
        s"((graft_cf_n + 1) * ${keepNum}L + ${alphaDen}L - 1L) " +
          s"div ${alphaDen}L"))
      .filter(col("graft_cf_rn") === col("graft_cf_idx"))
      .select(gk :+ col(scoreCol).as("tau")
        :+ col("graft_cf_n").as("n_cal"): _*)
    // groups whose calibration is too small for the rank (idx > n)
    // keep n_cal but get a null τ — flag nothing there
    val sizes = cal.groupBy(gk: _*).agg(count(lit(1)).as("n_cal"))
    val thresholds = sizes.join(
      taus.drop("n_cal"), groupCols, "left")
    // LEFT join from the apply side: a group with no calibration rows
    // still surfaces (n_cal = 0, null τ, nothing flagged) — the same
    // honest-vacuous contract as the small-calibration case, instead
    // of silently vanishing from the report.
    apply.join(broadcast(thresholds), groupCols, "left")
      .groupBy(gk: _*)
      .agg(coalesce(first(col("n_cal")), lit(0L)).as("n_cal"),
        first(col("tau")).as("tau"),
        count(lit(1)).as("n_apply"),
        sum(when(col("tau").isNotNull && col(scoreCol) > col("tau"), 1L)
          .otherwise(0L)).as("n_flagged"))
  }
}
