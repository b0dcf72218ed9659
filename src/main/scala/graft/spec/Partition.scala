package graft.spec

/** Partition transforms (`spec/partition.go:11-19,91-99`). The reference
  * declares these but never evaluates them (`table/writer.go:247-253`);
  * evaluation lives in [[graft.table.Transforms]] on the Spark side. */
sealed trait Transform {
  def name: String
  override def toString: String = name
}

object Transform {
  case object Identity extends Transform { val name = "identity" }
  case object Year extends Transform { val name = "year" }
  case object Month extends Transform { val name = "month" }
  case object Day extends Transform { val name = "day" }
  case object Hour extends Transform { val name = "hour" }
  case object Void extends Transform { val name = "void" }
  final case class Bucket(numBuckets: Int) extends Transform {
    def name = s"bucket[$numBuckets]"
  }
  final case class Truncate(width: Int) extends Transform {
    def name = s"truncate[$width]"
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def parse(s: String): Transform = s.trim match {
    case "identity" => Identity
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case "void" => Void
    case BucketRe(n) => Bucket(n.toInt)
    case TruncateRe(w) => Truncate(w.toInt)
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }

  /** Iceberg result type of a transform applied to a source type. */
  def resultType(t: Transform, source: IcebergType): IcebergType = t match {
    case Identity => source
    case Year | Month | Day | Hour => IntType
    case Bucket(_) => IntType
    case Truncate(_) => source
    case Void => source
  }
}

final case class PartitionField(
    sourceId: Int,
    fieldId: Int,
    name: String,
    transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty
  def numFields: Int = fields.size
  def lastFieldId: Int = if (fields.isEmpty) 0 else fields.map(_.fieldId).max

  /** The partition tuple type, for manifest Avro schema synthesis. */
  def partitionType(schema: Schema): StructType = StructType(fields.map { f =>
    val src = schema.field(f.sourceId).getOrElse(throw new IllegalArgumentException(
      s"partition source field ${f.sourceId} not in schema"))
    NestedField(f.fieldId, f.name,
      Transform.resultType(f.transform, src.fieldType), required = false)
  })
}

object PartitionSpec {
  val unpartitioned: PartitionSpec = PartitionSpec(0, Nil)

  /** Fluent builder mirroring the reference's
    * (`spec/partition.go:101-204`); partition field IDs start at 1000. */
  final class Builder(specId: Int) {
    private var next = 1000
    private val fs = Seq.newBuilder[PartitionField]
    private def add(sourceId: Int, name: String, t: Transform): Builder = {
      fs += PartitionField(sourceId, next, name, t); next += 1; this
    }
    def identity(sourceId: Int, name: String): Builder =
      add(sourceId, name, Transform.Identity)
    def year(sourceId: Int, name: String): Builder =
      add(sourceId, name, Transform.Year)
    def month(sourceId: Int, name: String): Builder =
      add(sourceId, name, Transform.Month)
    def day(sourceId: Int, name: String): Builder =
      add(sourceId, name, Transform.Day)
    def hour(sourceId: Int, name: String): Builder =
      add(sourceId, name, Transform.Hour)
    def bucket(sourceId: Int, name: String, n: Int): Builder =
      add(sourceId, name, Transform.Bucket(n))
    def truncate(sourceId: Int, name: String, w: Int): Builder =
      add(sourceId, name, Transform.Truncate(w))
    def build(): PartitionSpec = PartitionSpec(specId, fs.result())
  }

  def builder(specId: Int = 0): Builder = new Builder(specId)
}

/** Sort order metadata (`spec/metadata.go:16-52`). */
final case class SortField(
    sourceId: Int,
    transform: Transform = Transform.Identity,
    direction: SortDirection = SortDirection.Asc,
    nullOrder: NullOrder = NullOrder.NullsFirst)

sealed trait SortDirection { def name: String }
object SortDirection {
  case object Asc extends SortDirection { val name = "asc" }
  case object Desc extends SortDirection { val name = "desc" }
  def parse(s: String): SortDirection =
    if (s == "desc") Desc else Asc
}

sealed trait NullOrder { def name: String }
object NullOrder {
  case object NullsFirst extends NullOrder { val name = "nulls-first" }
  case object NullsLast extends NullOrder { val name = "nulls-last" }
  def parse(s: String): NullOrder =
    if (s == "nulls-last") NullsLast else NullsFirst
}

final case class SortOrder(orderId: Int, fields: Seq[SortField]) {
  def isUnsorted: Boolean = fields.isEmpty
}

object SortOrder {
  val unsorted: SortOrder = SortOrder(0, Nil)
}
