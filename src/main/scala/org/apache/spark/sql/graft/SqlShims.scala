package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into two `private[sql]` Spark helpers the row-level SQL
  * commands need (the standard connector shim: Delta and Iceberg each
  * carry the same two calls under an `org.apache.spark.sql.*`
  * subpackage, because there is no public equivalent):
  *
  *   - `Dataset.ofRows`: execute a LOGICAL PLAN as a DataFrame. The
  *     UPDATE/MERGE/DELETE commands capture the analyzer-resolved
  *     target relation and condition/assignment EXPRESSIONS — whose
  *     attribute references are exprId-bound to that exact plan — so
  *     the only sound way to evaluate them is to build `Filter`/
  *     `Project`/`Join` nodes over the original relation and run the
  *     plan, never to re-resolve strings against a fresh DataFrame.
  *   - `ExpressionUtils.column`: wrap a resolved Catalyst expression
  *     as a `Column` so those captured expressions compose with the
  *     public Dataset API.
  */
object SqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Re-execute any cached plans that contain `plan` — what every
    * row-level command must do after its commit, or a CACHE TABLE'd
    * target keeps serving the pre-DML snapshot (Spark's own
    * DeleteFromTableExec refreshes; the command path must match).
    */
  def recacheByPlan(spark: SparkSession, plan: LogicalPlan): Unit = {
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sharedState.cacheManager.recacheByPlan(classic, plan)
  }

  /** Release the materialized blocks behind a localCheckpoint'd
    * frame — `Dataset.unpersist` is a no-op there (the checkpoint RDD
    * was never registered with the cache manager), so without this a
    * session running many large MERGEs accumulates executor storage
    * until GC.
    */
  def unpersistCheckpointed(df: DataFrame): Unit = {
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(false))
    ()
  }

  /** The session's full Hadoop configuration (core defaults +
    * spark.hadoop.* + session overrides) wrapped serializable for
    * shipping to executor-side writers.
    */
  def serializableHadoopConf(spark: SparkSession)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.newHadoopConf())

  /** Statistics forwarding for the V1 fallback: after scan pushdown
    * the logical relation holds Spark's `V1ScanWrapper`, which does
    * NOT implement `SupportsReportStatistics` — so the wrapped scan's
    * real statistics never reach `computeStats` and every graft scan
    * planned as the default (effectively infinite) size. This shim
    * re-wraps the scan in a subclass that forwards the estimate
    * (class-extends-case-class is legal; the inherited structural
    * equality keeps plan canonicalization and cache matching intact).
    * Lives in the shim package because `PushedDownOperators` is
    * `private[sql]`.
    */
  def wrapScanWithStats(
      plan: LogicalPlan,
      estimate: org.apache.spark.sql.connector.read.V1Scan =>
        Option[org.apache.spark.sql.connector.read.Statistics])
      : LogicalPlan = {
    import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
    plan.transform {
      case r: DataSourceV2ScanRelation => r.scan match {
        case w: V1ScanWrapper
            if !w.isInstanceOf[StatsReportingV1ScanWrapper] =>
          estimate(w.v1Scan) match {
            case Some(st) => r.copy(scan =
              new StatsReportingV1ScanWrapper(w, st))
            case None => r
          }
        case _ => r
      }
    }
  }
}

/** A `V1ScanWrapper` that additionally reports statistics — see
  * [[SqlShims.wrapScanWithStats]].
  */
private[sql] class StatsReportingV1ScanWrapper(
    base: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper,
    st: org.apache.spark.sql.connector.read.Statistics)
  extends org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper(
    base.v1Scan, base.handledFilters, base.pushedDownOperators)
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = st
  // the INHERITED case-class equality made the rewrapped relation
  // structurally equal to the original, so transformDown's fastEquals
  // silently DISCARDED the replacement — equality must distinguish
  // the stats wrapper from the plain one (two stats wrappers over
  // equal scans still compare equal, keeping canonicalized plan
  // comparisons stable across identical queries)
  override def equals(other: Any): Boolean = other match {
    case o: StatsReportingV1ScanWrapper => super.equals(o)
    case _ => false
  }
  // the PLAIN wrapper's generated equals accepts any V1ScanWrapper
  // whose canEqual says yes — without this, plain == stats-wrapped
  // stays true asymmetrically and fastEquals still discards
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsReportingV1ScanWrapper]
  override def hashCode(): Int = super.hashCode() * 31 + 1
}
