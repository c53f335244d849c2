package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys: bit-interleave two dimensions so
  * that sorting by the key co-locates rows close in BOTH dimensions —
  * the standard layout trick for multi-column min/max pruning in
  * columnar files (a sort on (a, b) prunes well on `a` only; a sort on
  * zorder(a, b) prunes on either).
  *
  * The key is pure column arithmetic (42 shift/mask terms folded into
  * one codegen expression — no UDF), so it can sit in a `sortWithin
  * Partitions`/`repartitionByRange` write pipeline at any scale.
  * Inputs are MASKED to `bits` (21 by default ⇒ the interleaved key
  * fits a positive long) — out-of-range values wrap rather than
  * saturate, so map continuous values onto the grid first (e.g.
  * `ntile`, epoch-minutes, bucketed price).
  */
object ZOrder {

  /** Morton-interleave two non-negative integer columns, `bits` bits
    * each: bit b of `x` lands at position 2b, of `y` at 2b+1.
    */
  def interleave(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of [1,31]")
    val mask = (1L << bits) - 1
    val xa = x.cast("long").bitwiseAND(mask)
    val ya = y.cast("long").bitwiseAND(mask)
    (0 until bits).map { b =>
      val xb = call_function("shiftleft",
        call_function("shiftright", xa, lit(b)).bitwiseAND(1L), lit(2 * b))
      val yb = call_function("shiftleft",
        call_function("shiftright", ya, lit(b)).bitwiseAND(1L), lit(2 * b + 1))
      xb + yb
    }.reduce(_ + _)
  }

  /** Rewrite a table in z-order: range-partition then sort within
    * partitions by the interleaved key — every output file then covers
    * a compact rectangle in (x, y), so min/max stats prune on both.
    */
  def clusterBy(df: DataFrame, x: Column, y: Column,
                partitions: Int, bits: Int = 21): DataFrame = {
    val keyed = df.withColumn("__z", interleave(x, y, bits))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
