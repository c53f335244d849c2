package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V1ScanWrapper}
import graft.sources.{GraftScan, GraftScanPlanner, GraftTable}

/** Statistics-driven automatic broadcast for graft-table joins.
  *
  * Why this exists: the graft DSv2 scan executes through Spark's
  * `V1Scan` fallback, and the `V1ScanWrapper` the optimizer wraps it
  * in does not forward `SupportsReportStatistics` — so a graft scan
  * always reports the default (effectively infinite) size and a join
  * against even a KB-sized graft dimension plans as a sort-merge join:
  * two full shuffles where a broadcast would do. At 100 TB that is the
  * difference between shuffling the fact table and not.
  *
  * The rule recovers the statistics from the table's own metadata —
  * live data-file bytes summed from the manifest (driver-side,
  * |files|-bounded, no data IO) — and plants a BROADCAST [[JoinHint]]
  * on any join side that is a (Project|Filter)* tree over a single
  * graft scan whose size is at or under
  * `spark.sql.autoBroadcastJoinThreshold`. Soundness: Project/Filter
  * never grow a subtree, so manifest bytes are an upper bound of the
  * side's size; the hint is planted ONLY on a side the join type can
  * legally build (inner/cross: either; left outer/semi/anti/existence:
  * right only; right outer: left only; full outer: neither — Spark's
  * JoinSelection REJECTS an illegal-build-side hint loudly rather than
  * ignoring it, and an IN-subquery's ExistenceJoin is exactly where a
  * naive left-side hint lands), an existing user/query hint on the
  * side always wins, and threshold ≤ 0 (broadcast disabled) disables
  * the rule. Idempotent, so safe in a fixed-point batch.
  *
  * Wiring: `GraftExtensions` injects it as a pre-CBO rule
  * (`spark.sql.extensions=graft.functions.GraftExtensions`); an
  * already-running session calls [[GraftBroadcastStats.install]],
  * which appends it to `spark.experimental.extraOptimizations` (the
  * "User Provided Optimizers" batch — after scan pushdown, before
  * physical planning).
  */
case class GraftBroadcastStats(spark: SparkSession)
    extends Rule[LogicalPlan] {

  /** Upper-bound byte size of a join side, when the side is a pure
    * column-level tree over one graft scan; None = not a graft side
    * or size unknowable (never guess).
    */
  private def graftSize(plan: LogicalPlan): Option[Long] = plan match {
    case p: Project => graftSize(p.child)
    case f: Filter  => graftSize(f.child)
    case r: DataSourceV2ScanRelation =>
      r.scan match {
        case w: V1ScanWrapper => w.v1Scan match {
          case g: GraftScan => GraftScanPlanner.liveBytes(g.opts)
          case _            => None
        }
        case _ => None
      }
    // pre-pushdown shape (if the rule lands before the early
    // scan-pushdown batch, e.g. via a differently-ordered injection)
    case r: DataSourceV2Relation =>
      r.table match {
        case t: GraftTable => GraftScanPlanner.liveBytes(t.opts)
        case _             => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    import org.apache.spark.sql.catalyst.plans.{Cross, ExistenceJoin, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
    plan.transform {
      case j @ Join(left, right, joinType, _, hint)
          if hint.leftHint.isEmpty || hint.rightHint.isEmpty =>
        def small(p: LogicalPlan): Boolean =
          graftSize(p).exists(_ <= threshold)
        val canBuildLeft = joinType match {
          case Inner | Cross | RightOuter => true
          case _                          => false
        }
        val canBuildRight = joinType match {
          case Inner | Cross | LeftOuter | LeftSemi | LeftAnti |
               _: ExistenceJoin => true
          case _ => false
        }
        val lh =
          if (hint.leftHint.isEmpty && canBuildLeft && small(left))
            Some(HintInfo(Some(BROADCAST)))
          else hint.leftHint
        val rh =
          if (hint.rightHint.isEmpty && canBuildRight && small(right))
            Some(HintInfo(Some(BROADCAST)))
          else hint.rightHint
        if ((lh eq hint.leftHint) && (rh eq hint.rightHint)) j
        else j.copy(hint = JoinHint(lh, rh))
    }
  }
}

object GraftBroadcastStats {
  /** Activate on an already-running session (extensions can only be
    * configured at session build): appends to
    * `spark.experimental.extraOptimizations` once, idempotently.
    */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GraftBroadcastStats]))
      spark.experimental.extraOptimizations =
        cur :+ GraftBroadcastStats(spark)
  }
}

/** REAL statistics through the DSv2 scan (`SupportsReportStatistics`):
  * the V1 fallback's `V1ScanWrapper` drops the interface, so this
  * rule re-wraps every graft scan in a stats-forwarding subclass
  * (shim: [[org.apache.spark.sql.graft.SqlShims.wrapScanWithStats]]).
  * From then on `computeStats` is real — sizeInBytes from live
  * manifest bytes (pending MoR entries included, an upper bound) and
  * rowCount from the sidecar per-file counts when every live file
  * carries one and no merge-on-read masks are pending — and EVERY
  * stats consumer (JoinSelection's broadcast decision, CBO join
  * reordering, AQE's initial estimates) sees it, not just the one
  * join shape [[GraftBroadcastStats]] special-cases. The hint rule
  * stays installed as the belt (it also covers sessions where only
  * one of the two rules is wired).
  */
case class GraftScanStats(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    org.apache.spark.sql.graft.SqlShims.wrapScanWithStats(plan, {
      case g: GraftScan => GraftScanStats.estimate(g)
      case _ => None
    })
}

object GraftScanStats {
  import java.util.OptionalLong
  import org.apache.spark.sql.connector.read.{Statistics => V2Statistics}

  /** Sidecar row-count memo keyed by (root, main-manifest version):
    * the sidecar walk reads one stats file per version dir, and this
    * rule runs per optimizer pass — same rationale (and same
    * exactness argument: any commit bumps the version) as
    * [[GraftScanPlanner.liveBytes]]'s memo.
    */
  private val rowsMemo =
    new graft.core.FingerprintMemo[(String, Long), Option[Long]]()

  private def cachedLiveRows(root: String): Option[Long] = {
    val v = graft.sinks.VersionedTable.readManifest(root)
      .map(_.version)
      .orElse(graft.sinks.VersionedTable
        .readPartitionedManifest(root).map(_.version))
      .getOrElse(return graft.sinks.VersionedTable
        .liveFileStatsAll(root).map(_.map(_.rows).sum))
    rowsMemo.getOrElseUpdate((root, v)) {
      graft.sinks.VersionedTable.liveFileStatsAll(root)
        .map(_.map(_.rows).sum)
    }
  }

  /** ANALYZE-stats memo — same shape as [[rowsMemo]], with two extra
    * key components: the stats FILE's identity (mtime + size) and the
    * JVM-local analyze epoch. The table fingerprint alone is not
    * enough, because `CALL system.analyze` writes the file WITHOUT
    * bumping any manifest — a memoized "never analyzed" empty map
    * under the bare fingerprint would make a later ANALYZE invisible
    * to the planner until an unrelated commit (the query → analyze →
    * query order is the natural one). The epoch closes the mtime
    * blind spot: two local re-ANALYZEs in the same millisecond with
    * equal JSON length (different exact/histogram settings) would
    * share a (mtime, size) id and serve the first run's stats.
    */
  private val colStatsMemo = new graft.core.FingerprintMemo[
    (String, Long, Long, Long, Long, Long, Long),
    java.util.Map[org.apache.spark.sql.connector.expressions
      .NamedReference,
      org.apache.spark.sql.connector.read.colstats
        .ColumnStatistics]]()

  /** Per-column statistics from a FRESH `_column_stats.json`
    * (fingerprint must match the live table exactly — see
    * [[graft.sinks.VersionedTable.analyzeColumns]]); empty when never
    * analyzed or stale. min/max re-typed from the recorded dtype
    * (integral → Long, floating → Double; strings report lengths
    * only), which is all CBO's estimation consumes.
    */
  private def cachedColumnStats(root: String)
      : java.util.Map[org.apache.spark.sql.connector.expressions
        .NamedReference,
        org.apache.spark.sql.connector.read.colstats
          .ColumnStatistics] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
    val fp = graft.sinks.VersionedTable.statsFingerprint(root)
    val (fMtime, fSize) =
      graft.sinks.VersionedTable.columnStatsFileId(root)
    val analyzeEpoch = graft.sinks.VersionedTable.columnStatsEpoch(root)
    colStatsMemo.getOrElseUpdate(
      (root, fp._1, fp._2, fp._3, fMtime, fSize, analyzeEpoch)) {
    val built = graft.sinks.VersionedTable.readColumnStats(root) match {
      case Some(cs)
          if (cs.version, cs.posVersion, cs.eqVersion) == fp =>
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          ColumnStatistics]()
        cs.cols.foreach { case (name, c) =>
          def typed(v: Option[String]): java.util.Optional[Object] =
            (c.dtype match {
              case "integral" =>
                v.map(s => java.lang.Long.valueOf(s): Object)
              case "floating" =>
                v.map(s => java.lang.Double.valueOf(s): Object)
              case _ => None
            }) match {
              case Some(x) => java.util.Optional.of(x)
              case None => java.util.Optional.empty[Object]()
            }
          def optL(v: Option[Long]): java.util.OptionalLong =
            v.map(java.util.OptionalLong.of)
              .getOrElse(java.util.OptionalLong.empty())
          m.put(Expressions.column(name), new ColumnStatistics {
            // ndv < 0 = "not computed" (non-hashable types skip the
            // DISTINCT aggregate) — absent, never a guess
            override def distinctCount(): java.util.OptionalLong =
              if (c.ndv >= 0) java.util.OptionalLong.of(c.ndv)
              else java.util.OptionalLong.empty()
            override def nullCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(c.nulls)
            override def min(): java.util.Optional[Object] =
              typed(c.min)
            override def max(): java.util.Optional[Object] =
              typed(c.max)
            override def avgLen(): java.util.OptionalLong =
              optL(c.avgLen)
            override def maxLen(): java.util.OptionalLong =
              optL(c.maxLen)
            // equi-height histogram (numeric columns analyzed with
            // histogram_bins > 0): height = non-null rows per bin.
            // Precomputed ONCE at map build (the memoized stat object
            // is probed per optimizer pass; rebuilding the bins array
            // per call — or capturing the whole stats map in the
            // closure — would be waste pinned in the memo)
            private val histOpt: java.util.Optional[
                org.apache.spark.sql.connector.read.colstats
                  .Histogram] =
              if (c.hist.isEmpty)
                java.util.Optional.empty()
              else {
                val h = (cs.rows - c.nulls).toDouble / c.hist.size
                val binArr = c.hist.map { b =>
                  new org.apache.spark.sql.connector.read
                      .colstats.HistogramBin {
                    override def lo(): Double = b.lo
                    override def hi(): Double = b.hi
                    override def ndv(): Long = b.ndv
                  }: org.apache.spark.sql.connector.read.colstats
                    .HistogramBin
                }.toArray
                java.util.Optional.of(
                  new org.apache.spark.sql.connector.read.colstats
                      .Histogram {
                    override def height(): Double = h
                    override def bins(): Array[
                        org.apache.spark.sql.connector.read.colstats
                          .HistogramBin] = binArr
                  })
              }
            override def histogram(): java.util.Optional[
                org.apache.spark.sql.connector.read.colstats
                  .Histogram] = histOpt
          })
        }
        m
      case _ => java.util.Collections.emptyMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        ColumnStatistics]()
    }
    built
    }
  }

  /** Driver-side metadata only (|files|-bounded, no data IO, memoized
    * per manifest version); None when nothing trustworthy is known —
    * statistics must never guess.
    */
  private[graft] def estimate(g: GraftScan): Option[V2Statistics] = {
    val o = g.opts
    if (o.metadata.isDefined || o.changes.isDefined) return None
    val size = GraftScanPlanner.liveBytes(o).getOrElse(return None)
    // row count only when EVERY live file carries a sidecar count and
    // no merge-on-read mask can change visible cardinality
    val rows: Option[Long] =
      if (o.versionAsOf.isDefined ||
          (o.withDeletes &&
            graft.sinks.VersionedTable.hasAnyDeletes(o.root))) None
      else cachedLiveRows(o.root)
    // per-column statistics only for a LIVE read with a fresh ANALYZE
    val cstats =
      if (o.versionAsOf.isDefined)
        java.util.Collections.emptyMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats
            .ColumnStatistics]()
      else cachedColumnStats(o.root)
    Some(new V2Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(size)
      override def numRows(): OptionalLong =
        rows.map(OptionalLong.of).getOrElse(OptionalLong.empty())
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats
          .ColumnStatistics] = cstats
    })
  }

  /** Append to a running session's extra optimizations, idempotent —
    * the [[GraftBroadcastStats.install]] sibling.
    */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GraftScanStats]))
      spark.experimental.extraOptimizations =
        cur :+ GraftScanStats(spark)
  }
}
