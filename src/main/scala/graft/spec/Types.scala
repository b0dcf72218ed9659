package graft.spec

/** Iceberg type system as a sealed Scala ADT.
  *
  * Semantics follow the reference's type layer (`spec/types.go:15-238`):
  * 12 primitives plus parameterized fixed/decimal and nested
  * struct/list/map, every nested position carrying an explicit field ID
  * (IDs, not names, are the identity — rename-safe evolution). String
  * forms and the parser mirror `spec/types.go:58-87,240-298`.
  */
sealed trait IcebergType {
  /** Canonical string form, e.g. "long", "decimal(10, 2)", "struct<...>". */
  def typeString: String
  override def toString: String = typeString
  def isPrimitive: Boolean = this match {
    case _: StructType | _: ListType | _: MapType => false
    case _ => true
  }
}

sealed abstract class PrimitiveType(val typeString: String) extends IcebergType

case object BooleanType extends PrimitiveType("boolean")
case object IntType extends PrimitiveType("int")
case object LongType extends PrimitiveType("long")
case object FloatType extends PrimitiveType("float")
case object DoubleType extends PrimitiveType("double")
case object DateType extends PrimitiveType("date")
/** Microseconds since midnight (`table/scan.go:309`). */
case object TimeType extends PrimitiveType("time")
/** Microsecond precision, no zone (`table/scan.go:311`). */
case object TimestampType extends PrimitiveType("timestamp")
/** Microsecond precision, UTC-normalized (`table/scan.go:313`). */
case object TimestampTzType extends PrimitiveType("timestamptz")
case object StringType extends PrimitiveType("string")
/** 16-byte canonical form (`table/scan.go:315`). */
case object UUIDType extends PrimitiveType("uuid")
case object BinaryType extends PrimitiveType("binary")

final case class FixedType(length: Int) extends IcebergType {
  def typeString = s"fixed[$length]"
}

final case class DecimalType(precision: Int, scale: Int) extends IcebergType {
  require(precision >= 1 && precision <= 38,
    s"decimal precision out of range: $precision")
  def typeString = s"decimal($precision, $scale)"
}

/** A named, ID-carrying field of a struct (or top-level schema column). */
final case class NestedField(
    id: Int,
    name: String,
    fieldType: IcebergType,
    required: Boolean,
    doc: Option[String] = None)

final case class StructType(fields: Seq[NestedField]) extends IcebergType {
  def typeString: String = fields
    .map(f => s"${f.id}: ${f.name}: " +
      (if (f.required) "required" else "optional") + s" ${f.fieldType}")
    .mkString("struct<", ", ", ">")
  def field(id: Int): Option[NestedField] = fields.find(_.id == id)
  def fieldByName(name: String): Option[NestedField] =
    fields.find(_.name == name)
}

final case class ListType(
    elementId: Int,
    element: IcebergType,
    elementRequired: Boolean) extends IcebergType {
  def typeString = s"list<${element.typeString}>"
}

final case class MapType(
    keyId: Int,
    key: IcebergType,
    valueId: Int,
    value: IcebergType,
    valueRequired: Boolean) extends IcebergType {
  def typeString = s"map<${key.typeString}, ${value.typeString}>"
}

object IcebergType {
  private val primitives: Map[String, PrimitiveType] = Seq(
    BooleanType, IntType, LongType, FloatType, DoubleType, DateType,
    TimeType, TimestampType, TimestampTzType, StringType, UUIDType,
    BinaryType).map(t => t.typeString -> t).toMap

  private val FixedRe = """fixed\[(\d+)\]""".r
  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Parse the canonical string form of a primitive/parameterized type
    * (`spec/types.go:240-298`). Nested types travel as JSON objects, not
    * strings, so they are handled by [[SchemaJson]]. */
  def parse(s: String): IcebergType = s.trim match {
    case p if primitives.contains(p) => primitives(p)
    case FixedRe(len) => FixedType(len.toInt)
    case DecimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
    case other => throw new IllegalArgumentException(s"unknown type: $other")
  }

  def maxFieldId(t: IcebergType): Int = t match {
    case StructType(fs) =>
      fs.foldLeft(0)((m, f) => math.max(math.max(m, f.id),
        maxFieldId(f.fieldType)))
    case ListType(eid, e, _) => math.max(eid, maxFieldId(e))
    case MapType(kid, k, vid, v, _) =>
      Seq(kid, vid, maxFieldId(k), maxFieldId(v)).max
    case _ => 0
  }
}
