package graft.sources

import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table => ConnectorTable, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory,
  Scan => V2Scan, ScanBuilder, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graftshim.ParquetShim
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{LocalCatalog, TableIdentifier}
import graft.io.HadoopFileIO
import graft.spec.SchemaConverters
import graft.table.{Expr, FileScanTask, Scan, Table}

/** DataSource V2 provider: `spark.read`/`spark.readStream
  * .format("graft")` over a catalog table (SURVEY "what's missing #1",
  * round-3 verdict top item). Offsets are snapshot ids; micro-batches
  * are planned with [[graft.table.Scan.appendsBetween]] — the exact
  * contract the checkpointed `TableTailer` proves — and files are read
  * by Spark's own vectorized parquet path ([[ParquetShim]]), so the
  * stream shares the batch engine's decode, pruning, and stats code.
  *
  * Options: `warehouse` (local catalog root), `namespace` (dot-
  * separated), `table`; optional `skip-overwrites=true` to skip
  * overwrite snapshots in the incremental range (default: fail loud,
  * matching Iceberg's streaming source), `starting-offset=latest` to
  * begin at the current snapshot instead of delivering the full table
  * as the first micro-batch.
  *
  * The DSv2 path reads DATA files only: a plan whose tasks carry MoR
  * delete files is rejected loudly (apply deletes via the Scan API /
  * SQL façade, or compact first) — never silently resurrected rows.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def load(options: CaseInsensitiveStringMap): Table = {
    def req(k: String): String = {
      val v = options.get(k)
      if (v == null || v.isEmpty) throw new IllegalArgumentException(
        s"graft source: option '$k' is required " +
          "(warehouse, namespace, table)")
      v
    }
    val cat = new LocalCatalog(req("warehouse"))
    Table.load(cat,
      TableIdentifier(req("namespace").split('.').toSeq, req("table")),
      new HadoopFileIO())
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SchemaConverters.toSparkSchema(load(options).schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): ConnectorTable = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftConnectorTable(load(opts), schema)
  }
}

private[sources] class GraftConnectorTable(
    gtable: Table, sparkSchema: StructType)
    extends ConnectorTable with SupportsRead {

  override def name(): String =
    (gtable.id.namespace :+ gtable.id.name).mkString(".")
  override def schema(): StructType = sparkSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(gtable, sparkSchema, options)
}

/** Pruning-only pushdown: convertible filters drive manifest/file
  * pruning (and show as `pushedFilters` in explain); ALL filters are
  * returned as residuals so Catalyst re-applies them row-level above
  * the scan — partial conversion is always sound. Column pruning feeds
  * the parquet `requiredSchema` (ReadSchema in explain). */
private[sources] class GraftScanBuilder(
    gtable: Table, full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var pushedExpr: Option[Expr] = None
  private var accepted: Array[sources.Filter] = Array.empty

  override def pushFilters(
      filters: Array[sources.Filter]): Array[sources.Filter] = {
    val converted = filters.map(f => f -> FilterToExpr(f))
    accepted = converted.collect { case (f, Some(_)) => f }
    pushedExpr = converted.flatMap(_._2).reduceOption(_ and _)
    filters // everything is residual: row semantics stay with Catalyst
  }
  override def pushedFilters(): Array[sources.Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    // intersect with the table schema (Spark may append metadata cols)
    required = StructType(
      requiredSchema.fields.filter(f => full.fieldNames.contains(f.name)))

  override def build(): V2Scan =
    new GraftV2Scan(gtable, full, required, pushedExpr, options)
}

/** v1 `sources.Filter` → engine [[Expr]], for stats pruning only.
  * Literal values arrive as external JVM types (String, numbers,
  * java.sql/java.time date-times) — exactly what `Pruning.coerce`
  * normalizes to bound representations. */
private[sources] object FilterToExpr {
  import graft.table._

  def apply(f: sources.Filter): Option[Expr] = f match {
    case sources.EqualTo(a, v) => Some(Eq(a, v))
    case sources.GreaterThan(a, v) => Some(Gt(a, v))
    case sources.GreaterThanOrEqual(a, v) => Some(Gte(a, v))
    case sources.LessThan(a, v) => Some(Lt(a, v))
    case sources.LessThanOrEqual(a, v) => Some(Lte(a, v))
    case sources.In(a, vs) => Some(In(a, vs.toSeq))
    case sources.IsNull(a) => Some(IsNull(a))
    case sources.IsNotNull(a) => Some(NotNull(a))
    case sources.StringStartsWith(a, v) => Some(StartsWith(a, v))
    case sources.And(l, r) => (apply(l), apply(r)) match {
      case (Some(a), Some(b)) => Some(a.and(b))
      case (one @ Some(_), None) => one // over-approximation: sound
      case (None, one @ Some(_)) => one
      case _ => None
    }
    case sources.Or(l, r) => for { a <- apply(l); b <- apply(r) }
      yield a.or(b)
    case sources.Not(c) => apply(c).map(e => Not(e).simplify)
    case _ => None
  }
}

private[sources] class GraftV2Scan(
    gtable: Table,
    full: StructType,
    required: StructType,
    pushed: Option[Expr],
    options: CaseInsensitiveStringMap) extends V2Scan {

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft:${(gtable.id.namespace :+ gtable.id.name).mkString(".")} " +
      s"pushed=[${pushed.getOrElse("")}]"

  override def toBatch: Batch = new GraftBatch(this)
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(gtable, this, options)

  private def spark: SparkSession = SparkSession.active

  private[sources] def newScan(t: Table): Scan =
    pushed.foldLeft(Scan(t, spark))(_ filter _)

  /** Batch read: the CURRENT snapshot's pruned plan. */
  private[sources] def batchPartitions(): Array[InputPartition] = {
    val t = try gtable.refresh() catch { case _: Exception => gtable }
    toPartitions(t, newScan(t).planFiles())
  }

  /** Tasks → one InputPartition per data file, with the loud MoR and
    * rename guards (see class doc). */
  private[sources] def toPartitions(
      t: Table, tasks: Seq[FileScanTask]): Array[InputPartition] = {
    val withDeletes = tasks.count(_.deleteFiles.nonEmpty)
    if (withDeletes > 0) throw new UnsupportedOperationException(
      s"graft source: $withDeletes file(s) carry row-level (MoR) delete " +
        "files, which the DSv2 read path does not apply — read through " +
        "GraftSQL / the Scan API, or compact the table first")
    // parquet resolves columns BY NAME here: a column renamed since the
    // file was written would silently read null. Detect via field IDs
    // and fail loud; added-since columns null-fill, which is correct.
    val current = t.schema
    tasks.map(_.schemaId).distinct
      .filter(_ != current.schemaId)
      .foreach { sid =>
        t.metadata.schemaById(sid).foreach { fileSchema =>
          required.fieldNames.foreach { name =>
            (current.fieldByName(name), fileSchema.fieldByName(name)) match {
              case (Some(cur), None) if fileSchema.field(cur.id).isDefined =>
                throw new UnsupportedOperationException(
                  s"graft source: column '$name' was renamed since " +
                    s"schema $sid (field id ${cur.id}); name-based " +
                    "parquet reads would return null — read through " +
                    "the Scan API, which remaps by field id")
              case (Some(cur), Some(ff)) if cur.id != ff.id =>
                throw new UnsupportedOperationException(
                  s"graft source: column '$name' has field id " +
                    s"${cur.id} now but ${ff.id} in write schema $sid " +
                    "— name-based reads would mix columns; read " +
                    "through the Scan API")
              case _ => ()
            }
          }
        }
      }
    tasks.map(t => GraftInputPartition(
      t.file.filePath, t.file.fileSizeInBytes): InputPartition).toArray
  }

  private[sources] def readerFactory(): PartitionReaderFactory =
    new GraftReaderFactory(
      ParquetShim.buildReaderFunc(spark, full, required))
}

private[sources] class GraftBatch(scan: GraftV2Scan) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    scan.batchPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    scan.readerFactory()
}

final case class GraftInputPartition(path: String, length: Long)
    extends InputPartition

private[sources] class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftInputPartition]
    val it = readFunc(ParquetShim.partitionedFile(gp.path, gp.length))
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Snapshot-id offset. `-1` = nothing consumed yet (the first batch
  * delivers the full table at the then-current snapshot). */
final case class GraftOffset(snapshotId: Long) extends Offset {
  override def json(): String = s"""{"snapshotId":$snapshotId}"""
}
object GraftOffset {
  private val P = """\{\s*"snapshotId"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(j: String): GraftOffset = j.trim match {
    case P(id) => GraftOffset(id.toLong)
    case other => throw new IllegalArgumentException(
      s"not a graft offset: $other")
  }
}

private[sources] class GraftMicroBatchStream(
    initial: Table,
    scan: GraftV2Scan,
    options: CaseInsensitiveStringMap) extends MicroBatchStream {

  @volatile private var tableRef: Table = initial
  private val skipOverwrites =
    options.getBoolean("skip-overwrites", false)
  private val startLatest =
    "latest".equalsIgnoreCase(options.get("starting-offset"))

  private def refreshed(): Table = {
    tableRef = try tableRef.refresh() catch { case _: Exception => tableRef }
    tableRef
  }

  override def initialOffset(): Offset =
    if (startLatest)
      GraftOffset(refreshed().currentSnapshot
        .map(_.snapshotId).getOrElse(-1L))
    else GraftOffset(-1L)

  override def latestOffset(): Offset =
    GraftOffset(refreshed().currentSnapshot
      .map(_.snapshotId).getOrElse(-1L))

  override def deserializeOffset(json: String): Offset =
    GraftOffset.fromJson(json)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].snapshotId
    val e = end.asInstanceOf[GraftOffset].snapshotId
    if (e == -1L || s == e) return Array.empty
    val t = tableRef
    val base =
      if (s == -1L) scan.newScan(t).useSnapshot(e) // first batch: full table
      else {
        val sc = scan.newScan(t).appendsBetween(s, e)
        if (skipOverwrites) sc.option("incremental-skip-overwrites", "true")
        else sc
      }
    scan.toPartitions(t, base.planFiles())
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.readerFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
