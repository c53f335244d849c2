package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — multi-criteria data selection:
  * "keep documents not dominated on (length, diversity)", "machines
  * not dominated on (cost, throughput)".
  *
  * The textbook formulation is a quadratic NOT EXISTS self-join. For
  * two criteria it collapses to sort-free window arithmetic:
  *
  *   1. reduce to one row per distinct x: y_x = max(y at x) — a hash
  *      aggregate;
  *   2. running maximum of y over x descending — a window over the
  *      (tiny) distinct-x table;
  *   3. (x, y_x) is on the frontier iff y_x beats every y at strictly
  *      larger x.
  *
  * Only step 1 touches corpus-sized data. The window in step 2 runs
  * over |distinct x| rows — if x is continuous, bucket it first (the
  * frontier of bucketed maxima is the standard streaming/BIG-data
  * skyline approximation). Members then come back via a broadcast
  * semi-join of frontier (x, y) pairs.
  */
object Pareto {

  /** Rows whose (xCol, yCol) pair lies on the maximizing frontier.
    * Dominance is strict-in-one coordinate: duplicates of a frontier
    * point are all kept.
    */
  def frontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perX = df.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__ymax"))
    val w = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = perX
      .withColumn("__prev", max(col("__ymax")).over(w))
      .filter(col("__prev").isNull || col("__ymax") > col("__prev"))
      .select(col("__x"), col("__ymax"))
    df.join(broadcast(front),
      col(xCol) === col("__x") && col(yCol) === col("__ymax"))
      .drop("__x", "__ymax")
  }
}
