package graft.spec

import org.apache.spark.sql.{types => st}

/** spec.Schema ⇄ Spark StructType conversion per SURVEY §1.2 (the Arrow
  * mapping the reference fixes in `table/scan.go:288-343`, re-targeted
  * at Spark SQL types). Field IDs survive the trip in StructField
  * metadata under [[SchemaConverters.FieldIdKey]]; `required` maps to
  * `nullable = !required` (`table/scan.go:267,334`). */
object SchemaConverters {
  val FieldIdKey = "iceberg.field.id"
  val TypeHintKey = "iceberg.type" // for time/uuid/fixed, which Spark lacks

  def toSparkType(t: IcebergType): st.DataType = t match {
    case BooleanType => st.BooleanType
    case IntType => st.IntegerType
    case LongType => st.LongType
    case FloatType => st.FloatType
    case DoubleType => st.DoubleType
    case DateType => st.DateType
    case TimeType => st.LongType // µs since midnight
    case TimestampType => st.TimestampNTZType
    case TimestampTzType => st.TimestampType
    case StringType => st.StringType
    case UUIDType => st.BinaryType // 16 bytes
    case BinaryType => st.BinaryType
    case FixedType(_) => st.BinaryType
    case DecimalType(p, s) => st.DecimalType(p, s)
    case StructType(fields) => st.StructType(fields.map(toSparkField))
    case ListType(_, elem, elemRequired) =>
      st.ArrayType(toSparkType(elem), containsNull = !elemRequired)
    case MapType(_, k, _, v, valueRequired) =>
      st.MapType(toSparkType(k), toSparkType(v),
        valueContainsNull = !valueRequired)
  }

  private def toSparkField(f: NestedField): st.StructField = {
    val mb = new st.MetadataBuilder().putLong(FieldIdKey, f.id.toLong)
    f.fieldType match {
      case TimeType | UUIDType | FixedType(_) =>
        mb.putString(TypeHintKey, f.fieldType.typeString)
      case _ => ()
    }
    f.doc.foreach(mb.putString("comment", _))
    st.StructField(f.name, toSparkType(f.fieldType), nullable = !f.required,
      metadata = mb.build())
  }

  def toSparkSchema(s: Schema): st.StructType =
    st.StructType(s.fields.map(toSparkField))

  /** Spark → Iceberg. Field IDs are taken from metadata when present;
    * otherwise assigned after the highest explicit ID (fresh-table
    * creation from an arbitrary DataFrame). */
  def fromSparkSchema(ss: st.StructType, schemaId: Int = 0): Schema = {
    var next = 0
    def nextId(): Int = { next += 1; next }
    def reserved(f: st.StructField): Option[Int] =
      if (f.metadata.contains(FieldIdKey))
        Some(f.metadata.getLong(FieldIdKey).toInt)
      else None
    def convertField(f: st.StructField): NestedField = {
      val id = reserved(f).getOrElse(nextId())
      NestedField(id, f.name, convertType(f.dataType, f.metadata),
        required = !f.nullable)
    }
    def convertType(dt: st.DataType, md: st.Metadata): IcebergType = dt match {
      case st.BooleanType => BooleanType
      case st.ByteType | st.ShortType | st.IntegerType => IntType
      case st.LongType
          if md.contains(TypeHintKey) && md.getString(TypeHintKey) == "time" =>
        TimeType
      case st.LongType => LongType
      case st.FloatType => FloatType
      case st.DoubleType => DoubleType
      case st.DateType => DateType
      case st.TimestampNTZType => TimestampType
      case st.TimestampType => TimestampTzType
      case st.StringType => StringType
      case st.BinaryType if md.contains(TypeHintKey) =>
        IcebergType.parse(md.getString(TypeHintKey))
      case st.BinaryType => BinaryType
      case dt: st.DecimalType => DecimalType(dt.precision, dt.scale)
      case s: st.StructType => StructType(s.fields.toSeq.map(convertField))
      case st.ArrayType(elem, containsNull) =>
        ListType(nextId(), convertType(elem, st.Metadata.empty),
          elementRequired = !containsNull)
      case st.MapType(k, v, valueContainsNull) =>
        MapType(nextId(), convertType(k, st.Metadata.empty),
          nextId(), convertType(v, st.Metadata.empty),
          valueRequired = !valueContainsNull)
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type for Iceberg: $other")
    }
    def maxExplicit(f: st.StructField): Int = {
      val own = reserved(f).getOrElse(0)
      val nested = f.dataType match {
        case s: st.StructType => s.fields.map(maxExplicit).maxOption.getOrElse(0)
        case _ => 0
      }
      math.max(own, nested)
    }
    next = ss.fields.map(maxExplicit).maxOption.getOrElse(0)
    Schema(schemaId, ss.fields.toSeq.map(convertField))
  }
}
