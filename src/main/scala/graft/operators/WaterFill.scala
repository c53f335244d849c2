package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capacity-capped proportional allocation (WATER-FILLING) — the
  * "how many tokens do I take from each source" planner for a
  * data-constrained pretraining mix (Muennighoff et al. 2023: sources
  * have finite unique tokens and a repetition cap; demand beyond a
  * source's capacity must spill to the others in weight proportion).
  * q194's largest-remainder apportionment is the uncapped special
  * case; this operator adds the saturation dynamics: sources whose
  * capacity is below their proportional share fill to capacity and
  * the remaining budget re-apportions over the rest — the classic
  * water level λ* with allocation min(cap_s, λ*·w_s).
  *
  * Everything is EXACT integer arithmetic: the saturation frontier is
  * found by cross-multiplied rational comparison (no float λ), the
  * unsaturated shares are largest-remainder apportioned (floor + top
  * remainders get +1), so Σ alloc == min(budget, Σ cap over
  * positive-weight rows) EXACTLY and every alloc ≤ cap. Caps/weights/budget must keep budget·w and
  * cap·Σw within long range — token counts do.
  *
  * Scale contract: the input is ONE ROW PER SOURCE — a domain-bounded
  * table (tens to thousands of rows), never the corpus. The
  * whole-frame windows below therefore run on a single partition by
  * design; corpus-sized work (counting tokens per source) happens
  * BEFORE this operator as an ordinary aggregate.
  *
  * Output: (key, cap, w, alloc, saturated).
  */
object WaterFill {

  /** Allocate `budgetCol` (a per-row-constant column, e.g. joined
    * from a 1-row stat) across rows with capacity `capCol` and
    * integer weight `weightCol`, proportional to weight, capped at
    * capacity. Keys must be distinct; all inputs non-negative longs.
    * Zero-weight rows allocate 0 by the water-fill identity
    * (min(cap, λ*·0) = 0) — they can never absorb budget, so
    * Σ alloc == min(budget, Σ cap over POSITIVE-weight rows).
    */
  def allocate(df: DataFrame, keyCol: String, capCol: String,
               weightCol: String, budgetCol: String): DataFrame = {
    // w = 0 rows are excluded from the frontier (their λ = cap/w is
    // undefined, and classifying them saturated would hand them their
    // full cap and overshoot the budget); they re-enter at the end
    // with alloc 0, saturated only in the degenerate cap = 0 sense.
    // w < 0 rows fail LOUDLY at execution — silently dropping a
    // contract-violating row would vanish its key from the output.
    val zeroW = df.filter(col(weightCol) <= 0).select(
      col(keyCol), col(capCol), col(weightCol),
      when(col(weightCol) < 0, raise_error(concat(
        lit("WaterFill: negative weight for key "),
        col(keyCol).cast("string"))).cast("long"))
        .otherwise(lit(0L)).as("alloc"),
      (col(capCol) === 0).cast("long").as("saturated"))
    val posW = df.filter(col(weightCol) > 0)
    allocatePositive(posW, keyCol, capCol, weightCol, budgetCol)
      .unionByName(zeroW)
  }

  private def allocatePositive(df: DataFrame, keyCol: String,
                               capCol: String, weightCol: String,
                               budgetCol: String): DataFrame = {
    val lam = col(capCol).cast("double") / col(weightCol).cast("double")
    val byLam = Window.orderBy(lam, col(keyCol))
    val whole = Window.orderBy(lam, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = df
      .withColumn("graft_wf_rn", row_number().over(byLam))
      .withColumn("graft_wf_sprev", coalesce(sum(col(capCol)).over(
        byLam.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("graft_wf_wrem", sum(col(weightCol)).over(
        byLam.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      // first row whose water level λ* = (B−S_prev)/W_rem sits below
      // its own λ = cap/w — cross-multiplied, exact integers
      .withColumn("graft_wf_first", when(
        (col(budgetCol) - col("graft_wf_sprev")) * col(weightCol) <
          col(capCol) * col("graft_wf_wrem"), col("graft_wf_rn")))
      .withColumn("graft_wf_rstar", min(col("graft_wf_first")).over(whole))
    val unsat = col("graft_wf_rstar").isNotNull &&
      col("graft_wf_rn") >= col("graft_wf_rstar")
    val scoped = staged
      .withColumn("graft_wf_sstar", max(when(
        col("graft_wf_rn") === col("graft_wf_rstar"),
        col("graft_wf_sprev"))).over(whole))
      .withColumn("graft_wf_wstar", max(when(
        col("graft_wf_rn") === col("graft_wf_rstar"),
        col("graft_wf_wrem"))).over(whole))
      .withColumn("graft_wf_pool",
        col(budgetCol) - col("graft_wf_sstar"))
      .withColumn("graft_wf_floor", when(unsat, expr(
        s"(graft_wf_pool * $weightCol) div graft_wf_wstar")))
      .withColumn("graft_wf_rem", when(unsat,
        (col("graft_wf_pool") * col(weightCol)) % col("graft_wf_wstar")))
      .withColumn("graft_wf_short", col("graft_wf_pool") -
        sum(when(unsat, col("graft_wf_floor")).otherwise(lit(0L)))
          .over(whole))
      .withColumn("graft_wf_brank", row_number().over(Window.orderBy(
        when(unsat, lit(0)).otherwise(lit(1)),
        col("graft_wf_rem").desc_nulls_last, col(keyCol))))
    scoped.select(col(keyCol), col(capCol), col(weightCol),
      when(!unsat, col(capCol))
        .otherwise(col("graft_wf_floor") +
          when(col("graft_wf_brank") <= col("graft_wf_short"), 1L)
            .otherwise(0L)).as("alloc"),
      (!unsat).cast("long").as("saturated"))
  }
}
