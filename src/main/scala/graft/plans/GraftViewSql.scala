package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, ResolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.types.StructType
import graft.sources.GraftCatalog

/** Persisted SQL views on the graft catalog — the dbt-style modeling
  * layer as CATALOG objects instead of session temp views.
  *
  * Stock Spark 4.1 ships the `ViewCatalog` API but neither the V2
  * view DDL execs nor SELECT-side resolution, so (exactly like
  * Iceberg) the extension supplies both:
  *
  *   - [[GraftViewDdl]] (post-hoc): `CREATE [OR REPLACE] VIEW` /
  *     `DROP VIEW` / `SHOW VIEWS` whose identifier resolved into a
  *     [[GraftCatalog]] become runnable commands over the catalog's
  *     ViewCatalog verbs. The view stores the ORIGINAL SQL text, the
  *     creation context (catalog + namespace, for re-anchoring bare
  *     names), the resolved schema, and column aliases.
  *   - [[GraftViewSubstitution]] (resolution): an
  *     `UnresolvedRelation` naming a graft view substitutes the
  *     parsed view SQL (bare single-part table names re-anchored to
  *     the stored context), wrapped in the stored column aliases and
  *     a SubqueryAlias. Nested views resolve by analyzer fixpoint; a
  *     cyclic view fails the analyzer's iteration budget loudly.
  */
/** JVM-wide negative cache for view-existence probes. The
  * substitution rule runs on every analyzer iteration of every query,
  * and each multipart relation that is NOT a view costs a filesystem
  * probe — at object-store latencies that is real per-plan overhead.
  * Misses are cached per (catalog, identifier) and scoped to an
  * EPOCH that any view DDL through any [[GraftCatalog]] in this JVM
  * bumps, so CREATE VIEW → SELECT in the same process always sees the
  * new view (the same consistency level as Spark's JVM catalog
  * cache). Misses additionally expire after a short TTL, so a view
  * created by ANOTHER process converges within seconds even if this
  * JVM never runs local view DDL — without the TTL a cross-process
  * CREATE VIEW stayed invisible here indefinitely (positive lookups
  * are never cached). Bounded at 4096 entries.
  */
object GraftViewLookups {
  private val epochCtr = new java.util.concurrent.atomic.AtomicLong(0L)
  /** value = (recording epoch, System.nanoTime at record). */
  private val neg = new java.util.concurrent
    .ConcurrentHashMap[(String, String), (Long, Long)]()
  /** Cross-process convergence bound for cached misses (5 s): long
    * enough to amortize object-store probes across the analyzer
    * iterations of a burst of queries, short enough that a view
    * published by another writer appears on the next human-scale
    * retry.
    */
  private val ttlNanos = 5L * 1000 * 1000 * 1000
  def invalidate(): Unit = { epochCtr.incrementAndGet(); () }
  /** Capture BEFORE probing the filesystem: a DDL racing between the
    * probe and the record bumps past this value, so the recorded
    * miss is stale on arrival instead of swallowing the new view.
    */
  private[plans] def epoch(): Long = epochCtr.get
  private[plans] def cachedMiss(warehouse: String, ident: Identifier)
      : Boolean = {
    val e = neg.get((warehouse, ident.toString))
    e != null && e._1 == epochCtr.get &&
      (System.nanoTime() - e._2) < ttlNanos
  }
  private[plans] def recordMiss(warehouse: String, ident: Identifier,
                                probeEpoch: Long): Unit = {
    if (neg.size > 4096) neg.clear()
    neg.put((warehouse, ident.toString),
      (probeEpoch, System.nanoTime()))
  }
}

case class GraftViewSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def graftCatalog(name: String): Option[GraftCatalog] =
    try spark.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** Bare and namespace-qualified references expand with the CURRENT
    * catalog/namespace (mirroring [[GraftViewDdl.expand]]) so a view
    * resolves under `USE <graft_catalog>` too — but never when the
    * name is shadowed by a temp view, which takes precedence in
    * stock resolution.
    */
  private def expandParts(parts: Seq[String]): Option[Seq[String]] = {
    val cm = spark.sessionState.catalogManager
    def catalogExists(n: String): Boolean =
      try { cm.catalog(n); true } catch { case _: Exception => false }
    if (parts.length >= 2 && catalogExists(parts.head)) Some(parts)
    else if (spark.sessionState.catalog.isTempView(parts)) None
    else if (parts.length == 1)
      Some(cm.currentCatalog.name() +:
        (cm.currentNamespace.toSeq :+ parts.head))
    else Some(cm.currentCatalog.name() +: parts)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        expandParts(u.multipartIdentifier) match {
          case Some(parts) if parts.length >= 2 =>
            graftCatalog(parts.head) match {
              case Some(cat) =>
                val ident = Identifier.of(
                  parts.slice(1, parts.length - 1).toArray, parts.last)
                // keyed by WAREHOUSE (not catalog name): two catalogs
                // sharing a name over different warehouses must not
                // cross-poison each other's miss entries
                val wh = cat.warehouseDir
                if (GraftViewLookups.cachedMiss(wh, ident)) u
                else {
                  val probeEpoch = GraftViewLookups.epoch()
                  if (cat.viewExists(ident))
                    substitute(cat, ident, parts)
                  else {
                    GraftViewLookups.recordMiss(wh, ident, probeEpoch)
                    u
                  }
                }
              case None => u
            }
          case _ => u
        }
    }

  private def substitute(cat: GraftCatalog, ident: Identifier,
                         parts: Seq[String]): LogicalPlan = {
    val v = cat.loadView(ident)
    val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
    // bare names in the stored SQL meant "in the creation context" —
    // qualify them so the view reads the same tables from anywhere.
    // CTEs must be INLINED here: this substitution runs in the Hints
    // batch, which Spark 4 places AFTER the Substitution batch, so
    // the analyzer's own CTESubstitution has already run and will
    // never see an UnresolvedWith we inject (recursive CTEs in view
    // SQL are not supported). Subquery expressions get the same
    // treatment — resolveOperatorsUp never descends into them.
    val ctx: Seq[String] =
      v.currentCatalog +: v.currentNamespace.toSeq
    def replaceRefs(p: LogicalPlan,
                    defs: Map[String, LogicalPlan]): LogicalPlan =
      p.resolveOperatorsUp {
        case r: UnresolvedRelation
            if r.multipartIdentifier.length == 1 &&
              defs.contains(r.multipartIdentifier.head.toLowerCase) =>
          defs(r.multipartIdentifier.head.toLowerCase)
        case lp => lp.transformExpressionsUp {
          case sq: org.apache.spark.sql.catalyst.expressions
              .SubqueryExpression =>
            sq.withNewPlan(replaceRefs(sq.plan, defs))
        }
      }
    def inlineCtes(p: LogicalPlan): LogicalPlan =
      p.resolveOperatorsUp {
        case w: org.apache.spark.sql.catalyst.plans.logical
            .UnresolvedWith =>
          val defs = w.cteRelations
            .foldLeft(Map.empty[String, LogicalPlan]) {
              case (acc, (name, sub, _)) =>
                acc + (name.toLowerCase -> replaceRefs(sub, acc))
            }
          replaceRefs(w.child, defs)
        case lp => lp.transformExpressionsUp {
          case sq: org.apache.spark.sql.catalyst.expressions
              .SubqueryExpression =>
            sq.withNewPlan(inlineCtes(sq.plan))
        }
      }
    def anchorPlan(p: LogicalPlan): LogicalPlan =
      p.resolveOperatorsUp {
        case r: UnresolvedRelation
            if r.multipartIdentifier.length == 1 =>
          r.copy(multipartIdentifier =
            ctx :+ r.multipartIdentifier.head)
        case r: UnresolvedRelation
            if r.multipartIdentifier.length == 2 &&
              graftCatalog(r.multipartIdentifier.head).isEmpty =>
          r.copy(multipartIdentifier =
            v.currentCatalog +: r.multipartIdentifier)
        case lp => lp.transformExpressionsUp {
          case sq: org.apache.spark.sql.catalyst.expressions
              .SubqueryExpression => sq.withNewPlan(anchorPlan(sq.plan))
        }
      }
    val anchored = anchorPlan(inlineCtes(parsed))
    val aliased =
      if (v.columnAliases.nonEmpty)
        UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, anchored)
      else anchored
    SubqueryAlias(parts.last, aliased)
  }
}

/** V2 view DDL over [[GraftCatalog]]. This rule runs in the HINT
  * RESOLUTION batch (before the main Resolution batch) because
  * Spark's own `ResolveSessionCatalog` unconditionally raises
  * MISSING_CATALOG_ABILITY.VIEWS the moment a view command's
  * identifier resolves into any non-session catalog — stock 4.1 has
  * no V2 view exec at all. The commands therefore capture the
  * still-UNRESOLVED query plan and analyze it at run time.
  */
case class GraftViewDdl(spark: SparkSession) extends Rule[LogicalPlan] {

  private def catalogByName(name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try Some(spark.sessionState.catalogManager.catalog(name))
    catch { case _: Exception => None }

  /** A partial identifier (`CREATE VIEW v …` under `USE cat.ns`)
    * expands with the CURRENT catalog/namespace — the standard
    * multipart resolution — so graft-catalog view DDL works from any
    * session context, not only fully-qualified.
    */
  private def expand(parts: Seq[String]): Seq[String] = {
    val cm = spark.sessionState.catalogManager
    if (parts.length >= 2 && catalogByName(parts.head).isDefined) parts
    else if (parts.length == 1)
      cm.currentCatalog.name() +: (cm.currentNamespace.toSeq :+
        parts.head)
    else cm.currentCatalog.name() +: parts
  }

  private def graftFor(parts0: Seq[String])
      : Option[(GraftCatalog, Seq[String])] = {
    val parts = expand(parts0)
    if (parts.length < 2) None
    else catalogByName(parts.head) match {
      case Some(g: GraftCatalog) => Some((g, parts))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case CreateView(ui: org.apache.spark.sql.catalyst.analysis
        .UnresolvedIdentifier, cols, _, collation, props,
        originalText, query, allowExisting, replace, _) =>
      graftFor(ui.nameParts) match {
        case Some((cat, parts)) =>
          require(collation.isEmpty,
            "CREATE VIEW ... DEFAULT COLLATION is not supported on " +
              "graft views")
          require(cols.forall(_._2.isEmpty),
            "column comments on graft views are not supported")
          val ident = Identifier.of(
            parts.slice(1, parts.length - 1).toArray, parts.last)
          val sql = originalText.getOrElse(
            throw new IllegalArgumentException(
              s"CREATE VIEW ${parts.mkString(".")}: no SQL text to " +
                "persist"))
          GraftCreateViewCommand(cat, ident, cols.map(_._1), props,
            sql, query,
            spark.sessionState.catalogManager.currentCatalog.name(),
            spark.sessionState.catalogManager.currentNamespace,
            allowExisting, replace)
        case None => plan
      }
    case DropView(ui: org.apache.spark.sql.catalyst.analysis
        .UnresolvedIdentifier, ifExists)
        // temp views take precedence over catalog views in DROP —
        // leave them to the stock resolution
        if !spark.sessionState.catalog.isTempView(ui.nameParts) =>
      graftFor(ui.nameParts) match {
        case Some((cat, parts)) =>
          GraftDropViewCommand(cat, Identifier.of(
            parts.slice(1, parts.length - 1).toArray, parts.last),
            ifExists)
        case None => plan
      }
    case s @ ShowViews(un: org.apache.spark.sql.catalyst.analysis
        .UnresolvedNamespace, pattern, output) =>
      val cm = spark.sessionState.catalogManager
      val parts =
        if (un.multipartIdentifier.isEmpty)
          cm.currentCatalog.name() +: cm.currentNamespace.toSeq
        else if (catalogByName(un.multipartIdentifier.head).isDefined)
          un.multipartIdentifier
        else cm.currentCatalog.name() +: un.multipartIdentifier
      catalogByName(parts.head) match {
        case Some(g: GraftCatalog) =>
          GraftShowViewsCommand(g, parts.tail, pattern, output)
        case _ => s
      }
    case _ => plan
  }
}

case class GraftCreateViewCommand(catalog: GraftCatalog,
    ident: Identifier, aliases: Seq[String],
    props: Map[String, String], sql: String, query: LogicalPlan,
    currentCatalog: String, currentNamespace: Array[String],
    allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    if (allowExisting && catalog.viewExists(ident)) return Seq.empty
    // the query was captured UNRESOLVED (this command is built before
    // the Resolution batch) — analyze it now for validation + schema
    val analyzed = org.apache.spark.sql.graft.SqlShims
      .ofRows(spark, query).queryExecution.analyzed
    require(aliases.isEmpty || aliases.length == analyzed.output.length,
      s"CREATE VIEW ${ident}: ${aliases.length} column aliases for " +
        s"${analyzed.output.length} query columns")
    val schema =
      if (aliases.isEmpty)
        org.apache.spark.sql.catalyst.types.DataTypeUtils
          .fromAttributes(analyzed.output)
      else StructType(analyzed.output.zip(aliases).map { case (a, n) =>
        org.apache.spark.sql.types.StructField(n, a.dataType,
          a.nullable)
      })
    import scala.jdk.CollectionConverters._
    val info = new ViewInfo(ident, sql, currentCatalog,
      currentNamespace, schema, Array.empty[String],
      aliases.toArray, Array.empty[String], props.asJava)
    if (replace) catalog.replaceView(info, true)
    else catalog.createView(info)
    Seq.empty
  }
}

case class GraftDropViewCommand(catalog: GraftCatalog,
    ident: Identifier, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = catalog.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

case class GraftShowViewsCommand(catalog: GraftCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val ns = namespace.mkString(".")
    catalog.listViews(namespace: _*)
      .filter(v => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(v.name()), p).nonEmpty))
      .map(v => Row(ns, v.name(), false)).toSeq
  }
}
