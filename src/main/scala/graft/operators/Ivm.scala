package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) for distributive aggregates —
  * keep a materialized `GROUP BY` view current under a CDC change
  * stream by applying DELTAS, never rescanning the base table (the
  * Materialize / Delta Live Tables / classic Gupta-Mumick pattern).
  *
  * Contract: each row-level change is encoded as its additive
  * contribution to the aggregates — insert `(d_count=+1, d_sum=+v)`,
  * delete `(d_count=−1, d_sum=−v_old)`, update
  * `(d_count=0, d_sum=v_new−v_old)`. COUNT and SUM are
  * self-maintainable under inserts AND deletes from these alone
  * (AVG rides SUM/COUNT; MIN/MAX are NOT — a deleted extremum needs
  * a rescan or an auxiliary heavy-hitter structure, which is exactly
  * why IVM engines special-case them).
  *
  * Scale shape: one aggregate over the DELTA batch (batch-sized),
  * one outer join against the stored view (view-sized, i.e.
  * group-count-sized — typically orders of magnitude below the base
  * data); keys whose maintained count reaches 0 drop out, brand-new
  * keys appear via the outer side. The base table is never touched —
  * the whole point; pair with [[graft.sinks.VersionedTable]] to
  * version each maintenance step.
  */
object Ivm {

  /** View schema: keys ++ (n_rows, sum_v). Delta schema: keys ++
    * (d_count, d_sum). Returns the maintained view.
    */
  def applyDeltas(view: DataFrame, deltas: DataFrame,
                  keys: Seq[String]): DataFrame = {
    val d = deltas.groupBy(keys.map(col): _*)
      .agg(sum("d_count").as("dc"), sum("d_sum").as("ds"))
    view.join(d, keys, "full_outer")
      .select((keys.map(col) :+
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("n_rows") :+
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("ds"), lit(0L)))
          .as("sum_v")): _*)
      .where(col("n_rows") > 0)
  }

  /** Bootstrap the view from a base snapshot (the one full scan). */
  def initialize(base: DataFrame, keys: Seq[String],
                 vCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(vCol).as("sum_v"))
}
