package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t-closeness audit — the distributional third of the privacy triad
  * (k-anonymity caps group SIZE, l-diversity caps sensitive-value
  * MULTIPLICITY, t-closeness caps how far a quasi-identifier group's
  * sensitive-attribute DISTRIBUTION drifts from the global one): a
  * group with k=50 and l=4 still leaks "almost everyone here is in
  * the top spend bucket" if its distribution diverges; the release
  * gate is Earth Mover's Distance ≤ t (Li, Li, Venkatasubramanian,
  * ICDE 2007).
  *
  * For an ORDERED sensitive attribute over m buckets the EMD has the
  * closed form `mean over i of |cumQ_i − cumP_i|` (normalized ground
  * distance). Kept EXACT in integer arithmetic on the common
  * denominator `n_g · N · (m−1)` — the float appears only in the
  * final rounded display division, so `meets_t` is a pure integer
  * compare (`tDen · emd_num ≤ tNum · n_g · N · (m−1)` ⟺
  * `emd ≤ tNum/tDen`) and no rounding can flip the gate.
  *
  * Scale shape: one count aggregate over (QI, bucket) — the only
  * row-level shuffle — then densification against the m-bucket
  * domain (a bounded crossJoin: |QI-domain| × m rows, never data
  * rows), a per-group cumsum window over m rows, and an m-row global
  * cumsum broadcast back in. The global row count is one driver
  * scalar.
  */
object Privacy {

  /** @param df    rows with the QI columns and an ordered bucket col
    * @param qi    quasi-identifier grouping columns
    * @param vbCol ordered sensitive bucket, values 0..m-1 (long)
    * @param m     bucket-domain size
    * @param tNum  t threshold numerator (default 1/5 = 0.2)
    * @param tDen  t threshold denominator
    */
  def tCloseness(df: DataFrame, qi: Seq[String], vbCol: String, m: Int,
                 tNum: Long = 1, tDen: Long = 5): DataFrame = {
    val s = df.sparkSession
    val ev = df.select((qi.map(col) :+ col(vbCol).as("vb")): _*)
    val counts = ev.groupBy((qi :+ "vb").map(col): _*)
      .agg(count(lit(1)).as("c"))
    val buckets = s.range(m).select(col("id").as("vb"))
    val dense = ev.select(qi.map(col): _*).distinct()
      .crossJoin(buckets)
      .join(counts, qi :+ "vb", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val globCum = buckets
      .join(ev.groupBy("vb").agg(count(lit(1)).as("gc")), Seq("vb"), "left")
      .withColumn("gc", coalesce(col("gc"), lit(0L)))
      .withColumn("cp", sum("gc").over(
        Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, 0)))
    val wg = Window.partitionBy(qi.map(col): _*).orderBy("vb")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wgAll = Window.partitionBy(qi.map(col): _*)
    val n = ev.count() // one driver scalar: the global row count
    dense
      .withColumn("cq", sum("c").over(wg))
      .withColumn("n_g", sum("c").over(wgAll))
      .join(globCum.select(col("vb"), col("cp")), Seq("vb"))
      .withColumn("term", abs(col("cq") * lit(n) - col("cp") * col("n_g")))
      .groupBy(qi.map(col): _*)
      .agg(first(col("n_g")).as("n_g"), sum(col("term")).as("emd_num"))
      .select((qi.map(col) :+ col("n_g") :+
        round(col("emd_num").cast("double") /
          (col("n_g") * lit(n) * lit(m - 1)).cast("double"), 6).as("emd") :+
        (col("emd_num") * lit(tDen) <=
          col("n_g") * lit(n) * lit(m - 1) * lit(tNum)).as("meets_t")): _*)
  }
}
