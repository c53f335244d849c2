package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM change detection over per-group ordered series —
  * the sequential drift alarm (Page 1954) that catches a SUSTAINED
  * small shift which per-point outlier gates (q121's MAD) and
  * whole-window distribution gates (q122's PSI) both miss: CUSUM
  * accumulates evidence across points, so a +10% level shift fires
  * after a few periods even though no single period is anomalous.
  *
  * The textbook recursion S_t = max(0, S_{t−1} + (x_t − μ − slack))
  * looks inherently sequential, but equals P_t − min(0, min_{i≤t} P_i)
  * with P the prefix sum of the drifts — so the whole detector is TWO
  * stacked running windows (cumsum, then running min), fully
  * parallel per group and EXACT integer arithmetic end-to-end (μ and
  * slack are floor divisions of exact sums; no float anywhere).
  *
  * Scale contract: input is one row per (group, t) — an aggregated
  * series (days × groups), produced by an ordinary corpus aggregate
  * upstream; the windows shuffle only the series. (group, t) must be
  * unique — the running windows are RANGE-framed on t.
  *
  * Output: groupCols ++ (orderCol, valueCol, cusum, alarm) with
  * alarm = 1 iff cusum > μ/threshDiv.
  */
object Cusum {

  /** Detect upward level shifts in `valueCol` ordered by `orderCol`
    * within each group. slack = μ/slackDiv (allowance per period —
    * larger slackDiv = more sensitive), alarm threshold =
    * μ/threshDiv. In-control mean μ is the per-group series mean
    * (floor division); for a known reference period, pre-filter and
    * join μ yourself.
    */
  def detect(df: DataFrame, groupCols: Seq[String], orderCol: String,
             valueCol: String, slackDiv: Long = 20L,
             threshDiv: Long = 4L): DataFrame = {
    require(slackDiv > 0 && threshDiv > 0,
      s"divisors must be positive: $slackDiv, $threshDiv")
    val gk = groupCols.map(col)
    val g = Window.partitionBy(gk: _*)
    val byT = Window.partitionBy(gk: _*).orderBy(col(orderCol))
    df
      .withColumn("graft_cu_sx", sum(col(valueCol)).over(g))
      .withColumn("graft_cu_n", count(lit(1)).over(g))
      .withColumn("graft_cu_mu", expr("graft_cu_sx div graft_cu_n"))
      .withColumn("graft_cu_d", col(valueCol) - col("graft_cu_mu") -
        expr(s"graft_cu_mu div ${slackDiv}L"))
      .withColumn("graft_cu_p", sum(col("graft_cu_d")).over(byT))
      .withColumn("graft_cu_minp",
        least(min(col("graft_cu_p")).over(byT), lit(0L)))
      .withColumn("cusum", col("graft_cu_p") - col("graft_cu_minp"))
      .withColumn("alarm",
        (col("cusum") > expr(s"graft_cu_mu div ${threshDiv}L"))
          .cast("long"))
      .select(gk :+ col(orderCol) :+ col(valueCol) :+ col("cusum")
        :+ col("alarm"): _*)
  }
}
