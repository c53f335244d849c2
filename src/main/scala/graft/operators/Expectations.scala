package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-expectation suite, evaluated in ONE fused
  * aggregate pass — the Great Expectations / dbt-test shape (the
  * reference runs its quality checks as separate queries,
  * quality/checks.py:59-157; q13 fuses the reference's own checks,
  * this generalizes the fusion into a reusable suite runner):
  * each expectation contributes a conditional-count (or distinct-
  * count) aggregate expression to a single `df.agg(...)`, so a suite
  * of N expectations costs one corpus scan regardless of N — at
  * 100 TB the difference between "quality gate" and "quality gate ×N
  * full passes". The single wide row is then unpivoted to one report
  * row per expectation driver-side (N is suite-sized, never
  * data-sized).
  *
  * Report: (expectation, col_name, n_rows, n_violations, passed).
  * Violation semantics per kind:
  *  - NotNull: rows where col IS NULL
  *  - InRange: NON-NULL rows outside [lo, hi] (null-ness is NotNull's
  *    job — one defect, one expectation)
  *  - InSet: non-null rows not in the allowed set
  *  - Unique: n_rows − count(distinct col) − (null rows are counted
  *    as violations by NotNull, not here; distinct treats them
  *    separately) → duplicates beyond the first of each value
  *  - RowCountBetween: 0 or 1 violations on the table itself
  */
object Expectations {

  sealed trait Expectation { def name: String; def column: String }
  final case class NotNull(column: String) extends Expectation {
    val name = "not_null"
  }
  final case class Unique(column: String) extends Expectation {
    val name = "unique"
  }
  final case class InRange(column: String, lo: Double, hi: Double)
    extends Expectation { val name = "in_range" }
  final case class InSet(column: String, values: Seq[String])
    extends Expectation { val name = "in_set" }
  final case class RowCountBetween(lo: Long, hi: Long)
    extends Expectation { val name = "row_count_between"
      val column = "*" }

  private def violations(e: Expectation, nRows: Column): Column = e match {
    case NotNull(c) => sum(when(col(c).isNull, 1L).otherwise(0L))
    case Unique(c) =>
      sum(when(col(c).isNotNull, 1L).otherwise(0L)) - countDistinct(col(c))
    case InRange(c, lo, hi) =>
      sum(when(col(c).isNotNull &&
        (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))
    case InSet(c, vs) =>
      sum(when(col(c).isNotNull && !col(c).isInCollection(vs), 1L)
        .otherwise(0L))
    case RowCountBetween(lo, hi) =>
      when(nRows.between(lo, hi), 0L).otherwise(1L)
  }

  /** One aggregate pass over `df`; returns the per-expectation report
    * sorted by (expectation, column) for determinism.
    */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val n = count(lit(1))
    val aggs = n.as("n_rows") +: suite.zipWithIndex.map { case (e, i) =>
      coalesce(violations(e, n), lit(0L)).as(s"v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val reports = suite.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("expectation"), lit(e.column).as("col_name"),
        col("n_rows"), col(s"v$i").as("n_violations"),
        (col(s"v$i") === 0L).as("passed"))
    }
    row.select(explode(array(reports: _*)).as("r"))
      .select("r.expectation", "r.col_name", "r.n_rows", "r.n_violations",
        "r.passed")
  }
}
