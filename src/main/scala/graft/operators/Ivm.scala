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
  * a rescan or an auxiliary structure, which is exactly why IVM
  * engines special-case them: see [[initializeMinMax]] /
  * [[applyMinMaxDeltas]] for this engine's bounded-window answer
  * with drain-triggered partial rescan).
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

  // ------------------------------------------------------------------
  // Maintained MIN/MAX — the aggregates the header calls out as NOT
  // self-maintainable under deletes, made maintainable with bounded
  // auxiliary state (the standard IVM answer, e.g. Flink's retractable
  // min/max): each group keeps its k LARGEST (value, rowid) pairs
  // (`topk`, via the O(k)-state graft_topk aggregate) and its k
  // smallest (`botk`, same aggregate over the negated value), plus a
  // DISCARD THRESHOLD per side — the largest value ever pushed out of
  // the window (`t_hi`; `b_hi` in negated space). Maintenance applies
  // inserts/deletes to the windows; the group's MAX (head of topk) is
  // provably correct while the window is non-empty AND its head ≥ the
  // threshold (every unknown live value is ≤ the threshold by
  // construction). When deletes drain a window past that guarantee,
  // ONLY the affected groups are rescanned from the base — the
  // triggered partial rescan, which [[applyMinMaxDeltas]] skips
  // entirely (never even evaluating its by-name base argument) when no
  // group drained.
  //
  // Scale shape: deltas aggregate batch-sized with O(k) state; the
  // merge joins view-sized state; the drain check is one limit(1)
  // action on the view-sized merged state; the rescan semi-joins the
  // base down to the drained groups only.
  // ------------------------------------------------------------------

  private val MinLong = Long.MinValue

  /** View schema: keys ++ (n_rows, topk, t_hi, botk, b_hi). `botk`
    * scores are NEGATED values, so both sides share one maintenance
    * rule. Row ids must be unique per live row (multiset semantics
    * ride the id). Read min/max off the state with [[minMaxOf]].
    */
  def initializeMinMax(base: DataFrame, keys: Seq[String], vCol: String,
                       idCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(base.sparkSession)
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        call_function("graft_topk", col(vCol), col(idCol), lit(k))
          .as("topk"),
        call_function("graft_topk", -col(vCol), col(idCol), lit(k))
          .as("botk"))
      .withColumn("t_hi", when(col("n_rows") > k,
        element_at(col("topk"), k).getField("score"))
        .otherwise(lit(MinLong)))
      .withColumn("b_hi", when(col("n_rows") > k,
        element_at(col("botk"), k).getField("score"))
        .otherwise(lit(MinLong)))
      .select((keys.map(col) :+ col("n_rows") :+ col("topk") :+
        col("t_hi") :+ col("botk") :+ col("b_hi")): _*)
  }

  /** One bounded window merged with a delta batch: inserts enter if
    * they rank above the current floor (what they displace — or they
    * themselves, if not admitted — raises the discard threshold);
    * deletes remove their exact (score, id) pair when stored, and are
    * below-window no-ops otherwise. Returned threshold only grows —
    * a delete in the unknown region cannot prove anything about the
    * remaining unknowns.
    */
  final case class WindowPair(score: Long, id: Long)
  final case class WindowState(stored: Seq[WindowPair], thr: Long)

  private val mergeWindow = udf(
    (stored: Seq[org.apache.spark.sql.Row], thr: java.lang.Long,
     ins: Seq[org.apache.spark.sql.Row], dels: Seq[org.apache.spark.sql.Row],
     k: Int) => {
      val ord = graft.functions.TopK.pairOrdering
      val buf = new java.util.TreeSet[(Long, Long)](ord)
      if (stored != null)
        stored.foreach(r => buf.add((r.getLong(0), r.getLong(1))))
      var t = if (thr == null) MinLong else thr.longValue()
      // NET OUT identical (score, id) pairs appearing as both insert
      // and delete in one batch: a same-value CDC update (del old +
      // ins new, identical pair) and a transient insert+delete both
      // leave the pair's membership where it started — processing the
      // sides in EITHER order gets one of them wrong (the no-op add of
      // an already-stored pair must not evict the live floor; the add
      // of a transient row must not survive its own delete).
      val insL = if (ins == null) Seq.empty[(Long, Long)]
        else ins.map(r => (r.getLong(0), r.getLong(1)))
      val delC = scala.collection.mutable.HashMap[(Long, Long), Int]()
      if (dels != null) dels.foreach { r =>
        val p = (r.getLong(0), r.getLong(1))
        delC(p) = delC.getOrElse(p, 0) + 1
      }
      val insNet = insL.filter { p =>
        delC.get(p) match {
          case Some(c) if c > 0 => delC(p) = c - 1; false
          case _                => true
        }
      }
      // deletes FIRST: a changed-value update's old pair frees its
      // slot before the new pair is considered
      delC.foreach { case (p, c) => if (c > 0) { buf.remove(p); () } }
      insNet.foreach { p =>
        if (buf.size < k) { buf.add(p); () }
        else if (ord.compare(p, buf.last) < 0) {
          // add() false = pair already stored (redelivered insert):
          // nothing was displaced, so nothing is evicted
          if (buf.add(p)) {
            val cut = buf.pollLast()
            t = math.max(t, cut._1)
          }
        } else t = math.max(t, p._1)
      }
      import scala.jdk.CollectionConverters._
      WindowState(
        buf.iterator().asScala.map(p => WindowPair(p._1, p._2)).toSeq, t)
    })

  /** Maintain a [[initializeMinMax]] view through one delta batch.
    * Delta schema: keys ++ (`op` = +1 insert / −1 delete, vCol with
    * the row's value — the OLD value for deletes — and idCol with its
    * unique row id). `rescanBase` is the base table AFTER the batch,
    * passed BY NAME: it is evaluated — and the returned plan contains
    * a base scan — ONLY when some group's window drained below its
    * correctness guarantee (spec-pinned by passing a throwing thunk).
    */
  def applyMinMaxDeltas(view: DataFrame, deltas: DataFrame,
                        keys: Seq[String], vCol: String, idCol: String,
                        k: Int, rescanBase: => DataFrame): DataFrame = {
    val d = deltas.groupBy(keys.map(col): _*)
      .agg(sum(col("op")).as("dc"),
        collect_list(when(col("op") > 0,
          struct(col(vCol).as("score"), col(idCol).as("id")))).as("ins_hi"),
        collect_list(when(col("op") < 0,
          struct(col(vCol).as("score"), col(idCol).as("id")))).as("del_hi"),
        collect_list(when(col("op") > 0,
          struct((-col(vCol)).as("score"), col(idCol).as("id"))))
          .as("ins_lo"),
        collect_list(when(col("op") < 0,
          struct((-col(vCol)).as("score"), col(idCol).as("id"))))
          .as("del_lo"))
    val merged = view.join(d, keys, "full_outer")
      .withColumn("n_rows",
        coalesce(col("n_rows"), lit(0L)) + coalesce(col("dc"), lit(0L)))
      .where(col("n_rows") > 0)
      .withColumn("hi", mergeWindow(col("topk"), col("t_hi"),
        col("ins_hi"), col("del_hi"), lit(k)))
      .withColumn("lo", mergeWindow(col("botk"), col("b_hi"),
        col("ins_lo"), col("del_lo"), lit(k)))
      .select((keys.map(col) :+ col("n_rows") :+
        col("hi.stored").as("topk") :+ col("hi.thr").as("t_hi") :+
        col("lo.stored").as("botk") :+ col("lo.thr").as("b_hi")): _*)
      // materialize: the drain check below must not re-run the merge,
      // and the steady-state view is stored anyway
      .localCheckpoint(true)
    def drained(c: String, thr: String) =
      size(col(c)) === 0 ||
        col(c).getItem(0).getField("score") < col(thr)
    val bad = drained("topk", "t_hi") || drained("botk", "b_hi")
    val anyBad = merged.filter(bad).limit(1).count() > 0
    if (!anyBad) merged
    else {
      val badKeys = merged.filter(bad).select(keys.map(col): _*)
      val rescanned = initializeMinMax(
        rescanBase.join(badKeys, keys, "left_semi"),
        keys, vCol, idCol, k)
      merged.filter(!bad).unionByName(rescanned)
    }
  }

  /** The maintained extrema, read off the state: keys ++ (n_rows,
    * max_v, min_v). */
  def minMaxOf(view: DataFrame, keys: Seq[String]): DataFrame =
    view.select((keys.map(col) :+ col("n_rows") :+
      col("topk").getItem(0).getField("score").as("max_v") :+
      (-col("botk").getItem(0).getField("score")).as("min_v")): _*)
}
