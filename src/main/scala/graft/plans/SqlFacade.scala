package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Expression => CExpr, Literal,
  NamedExpression}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LeafNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.Bridge

import graft.table.{Expr, Scan, Table}

/** SQL / `spark.table` façade (SURVEY "Missing #1" — the reference is
  * programmatic-only, `iceberg.go:117-292`; this is the engine-idiomatic
  * step beyond): a custom leaf [[GraftRelation]] plus an optimizer
  * [[Rule]] — preference order (c): custom LogicalPlan + Rule — that
  * substitutes, ONCE THE QUERY'S FILTERS ARE KNOWN, the manifest/file-
  * pruned scan plan. Execution then runs on Spark's native vectorized
  * parquet reader inside WholeStageCodegen; our layer contributes
  * snapshot resolution, stats pruning, and MoR delete application.
  *
  * Registration: [[GraftSQL.install]] (live session) or configure
  * `spark.sql.extensions=graft.plans.GraftExtensions` at build time;
  * then [[GraftSQL.registerTable]] exposes a table to SQL by name.
  */
final case class GraftRelation(
    table: Table,
    output: Seq[Attribute],
    session: SparkSession)
    extends LeafNode with MultiInstanceRelation {

  override def newInstance(): GraftRelation =
    copy(output = output.map(_.newInstance()))

  /** Metadata-derived size so join planning can broadcast small graft
    * tables BEFORE the leaf is substituted; unknown → conservative.
    * Catalyst may call this several times while planning ONE query, so
    * the value comes from snapshot-summary counters (zero I/O) or at
    * worst one memoized manifest-LIST read — never per-manifest reads
    * (at 1M files that was seconds of driver metadata I/O per SQL
    * statement). */
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = GraftRelation.sizeFor(table))

  override def simpleString(maxFields: Int): String =
    s"GraftRelation ${table.id.name} ${output.map(_.name).mkString("[", ",", "]")}"
}

object GraftRelation {
  private val Unknown = BigInt(Long.MaxValue / 4)
  /** (table uuid, snapshot id) → sizeInBytes. Snapshot content is
    * immutable, so entries never invalidate; bounded to keep a
    * long-lived session from growing without limit. */
  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), BigInt]()
  private val MaxCacheEntries = 4096

  private[plans] def sizeFor(table0: graft.table.Table): BigInt =
    try {
      // stats must track the CURRENT snapshot, not the registration-time
      // pin — a table registered small but grown large would otherwise
      // keep advertising the stale size and Catalyst might broadcast a
      // now-huge table. refresh() is one metadata-JSON read; the result
      // is memoized per (uuid, snapshotId) below.
      val table = try table0.refresh() catch { case _: Exception => table0 }
      table.currentSnapshot match {
        case None => BigInt(1) // empty table: broadcasting it is free
        case Some(snap) =>
          val key = (table.metadata.tableUuid, snap.snapshotId)
          val cached = sizeCache.get(key)
          if (cached != null) cached
          else {
            val sz = computeSize(table, snap)
            if (sizeCache.size < MaxCacheEntries) sizeCache.put(key, sz)
            sz
          }
      }
    } catch { case _: Exception => Unknown }

  private def computeSize(table: graft.table.Table,
      snap: graft.spec.Snapshot): BigInt = {
    val summary = snap.summary
    val counterSize =
      summary.map(_.counter(graft.spec.Summary.TotalFilesSize)).getOrElse(0L)
    if (counterSize > 0) return BigInt(counterSize)
    if (summary.exists(s =>
        s.counter(graft.spec.Summary.TotalDataFiles) == 0))
      return BigInt(1)
    // older snapshot without the counter: ONE manifest-list read — row
    // counts are in the list — times the schema's estimated row width
    val rows = table.manifestList(snap)
      .filter(_.content == graft.spec.ManifestContent.Data)
      .map(_.liveRowsCount).sum
    if (rows <= 0) Unknown
    else {
      val rowWidth = graft.spec.SchemaConverters
        .toSparkSchema(table.schema).fields.map(_.dataType.defaultSize)
        .sum.max(8)
      BigInt(rows) * rowWidth
    }
  }
}

/** Catalyst predicate → engine [[Expr]], for pruning only (row-level
  * semantics stay with Catalyst — the original filters are re-applied
  * above the substituted plan, so partial conversion is always sound).
  */
object FilterConvert {
  import graft.table._
  import org.apache.spark.sql.catalyst.{expressions => ce}

  private def cv(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case other => other
  }

  def toExpr(e: CExpr): Option[Expr] = e match {
    case ce.EqualTo(a: AttributeReference, Literal(v, _)) =>
      Some(Eq(a.name, cv(v)))
    case ce.EqualTo(Literal(v, _), a: AttributeReference) =>
      Some(Eq(a.name, cv(v)))
    case ce.GreaterThan(a: AttributeReference, Literal(v, _)) =>
      Some(Gt(a.name, cv(v)))
    case ce.GreaterThan(Literal(v, _), a: AttributeReference) =>
      Some(Lt(a.name, cv(v)))
    case ce.LessThan(a: AttributeReference, Literal(v, _)) =>
      Some(Lt(a.name, cv(v)))
    case ce.LessThan(Literal(v, _), a: AttributeReference) =>
      Some(Gt(a.name, cv(v)))
    case ce.GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      Some(Gte(a.name, cv(v)))
    case ce.GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      Some(Lte(a.name, cv(v)))
    case ce.LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      Some(Lte(a.name, cv(v)))
    case ce.LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      Some(Gte(a.name, cv(v)))
    case ce.In(a: AttributeReference, vs)
        if vs.forall(_.isInstanceOf[Literal]) =>
      Some(In(a.name, vs.map { case Literal(v, _) => cv(v) }))
    case ce.InSet(a: AttributeReference, vs) =>
      Some(In(a.name, vs.toSeq.map(cv)))
    case ce.IsNull(a: AttributeReference) => Some(IsNull(a.name))
    case ce.IsNotNull(a: AttributeReference) => Some(NotNull(a.name))
    case ce.StartsWith(a: AttributeReference, Literal(v, _)) =>
      Some(StartsWith(a.name, cv(v).toString))
    // AND: pruning with any convertible subset is an over-approximation
    // of the row set, hence sound
    case ce.And(l, r) => (toExpr(l), toExpr(r)) match {
      case (Some(a), Some(b)) => Some(a.and(b))
      case (one @ Some(_), None) => one
      case (None, one @ Some(_)) => one
      case _ => None
    }
    // OR: both sides must convert, else no pruning
    case ce.Or(l, r) => for { a <- toExpr(l); b <- toExpr(r) } yield a.or(b)
    case ce.Not(c) => toExpr(c).map(Not(_).simplify)
    case _ => None
  }
}

/** Replaces `[Project] + [Filter] + GraftRelation` with the pruned,
  * MoR-applying scan plan. Runs late (user-provided optimizer batch),
  * when pushdown has already moved the query's filters adjacent to the
  * leaf — the same point DSv2's `SupportsPushDownFilters` sees them. */
object GraftPruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case PhysicalOperation(projects, filters, rel: GraftRelation) =>
      substitute(projects, filters, rel)
  }

  /** Per-query metadata refresh: commits made after `registerTable` are
    * visible to the next SQL statement, like Iceberg's Spark catalog —
    * the registration must not pin its snapshot forever. Falls back to
    * the registered handle when the catalog is unreachable or the
    * current schema no longer carries every registered column with the
    * same Spark type (the relation's output attributes are fixed; a
    * mismatched substitution would mistype downstream operators). */
  private def refreshed(rel: GraftRelation): Table =
    try {
      val t = rel.table.refresh()
      val fresh = graft.spec.SchemaConverters.toSparkSchema(t.schema)
        .fields.map(f => f.name -> f.dataType).toMap
      val compatible = rel.output.forall(a =>
        fresh.get(a.name).contains(a.dataType))
      if (compatible) t else rel.table
    } catch { case _: Exception => rel.table }

  private def substitute(projects: Seq[NamedExpression],
      filters: Seq[CExpr], rel: GraftRelation): LogicalPlan = {
    val pruneExpr: Option[Expr] =
      filters.flatMap(FilterConvert.toExpr).reduceOption(_ and _)
    // the scan uses the converted predicate for manifest/file pruning
    // ONLY — its literals are Catalyst-internal (micros, UTF8String) and
    // row semantics stay with the re-applied Catalyst filters below
    val scan = pruneExpr.foldLeft(Scan(refreshed(rel), rel.session))(_ filter _)
    val sub = Bridge.analyzed(scan.toDFPruneOnly)
    // graft the sub-plan under the relation's original exprIds
    val byName = sub.output.map(a => a.name -> a).toMap
    val aliased = Project(rel.output.map { o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)
    }, sub)
    val filtered = filters.foldLeft[LogicalPlan](aliased)(
      (p, f) => Filter(f, p))
    if (projects.nonEmpty &&
        projects != filtered.output) Project(projects, filtered)
    else filtered
  }
}

/** Build-time extension hook:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
      e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => GraftPruneRule)
}

/** Entry points for the SQL surface. */
object GraftSQL {

  /** Idempotently add the prune rule to a LIVE session (sessions built
    * without the extensions conf — e.g. notebooks, tests). */
  def install(spark: SparkSession): Unit = {
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val existing = cls.experimental.extraOptimizations
    if (!existing.contains(GraftPruneRule))
      cls.experimental.extraOptimizations = existing :+ GraftPruneRule
  }

  /** A DataFrame whose plan is the lazy, filter-aware relation (NOT a
    * materialized file list — pruning happens per query). */
  def tableDF(spark: SparkSession, table: Table): DataFrame = {
    val attrs = graft.spec.SchemaConverters.toSparkSchema(table.schema)
      .fields.toSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
    Bridge.ofRows(spark, GraftRelation(table, attrs, spark))
  }

  /** Expose `table` to `spark.sql` / `spark.table` as `viewName`. */
  def registerTable(spark: SparkSession, table: Table,
      viewName: String): Unit = {
    install(spark)
    tableDF(spark, table).createOrReplaceTempView(viewName)
  }
}
