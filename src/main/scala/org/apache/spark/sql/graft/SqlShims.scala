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
}
