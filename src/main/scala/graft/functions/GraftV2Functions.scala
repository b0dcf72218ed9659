package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{
  BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.spec
import graft.spec.{Transform => GT}
import graft.table.Transforms

/** Spark V2 `FunctionCatalog` functions mirroring the Iceberg partition
  * transforms (`bucket`, `truncate`, `years`, `months`, `days`,
  * `hours`).
  *
  * Their primary job is STORAGE-PARTITIONED JOINS: when a scan reports
  * `KeyGroupedPartitioning(bucket(16, id), …)`, Spark resolves the
  * named transform through the table's catalog and compares both join
  * sides by the bound function's `canonicalName()` — two graft tables
  * bucketed the same way then join with zero shuffles. The functions
  * are also directly callable from SQL
  * (`SELECT graft.bucket(16, l_orderkey)`), and `produceResult`
  * matches the write path's partition tuples exactly (same kernels as
  * [[graft.table.Transforms.applyToValue]]).
  *
  * Reference behavior: `spec/partition.go:91-99` declares these
  * transforms but never evaluates them; here they are first-class
  * engine functions.
  */
object GraftV2Functions {

  val names: Seq[String] =
    Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case "years" => Some(new TemporalUnbound("years", GT.Year))
    case "months" => Some(new TemporalUnbound("months", GT.Month))
    case "days" => Some(new TemporalUnbound("days", GT.Day))
    case "hours" => Some(new TemporalUnbound("hours", GT.Hour))
    case _ => None
  }

  /** Spark type → the Iceberg type the transform kernels key on.
    * Only types with a defined transform byte-layout are accepted. */
  private[functions] def iceTypeOf(dt: DataType): Option[spec.IcebergType] =
    dt match {
      case IntegerType => Some(spec.IntType)
      case LongType => Some(spec.LongType)
      case StringType => Some(spec.StringType)
      case DateType => Some(spec.DateType)
      case TimestampType => Some(spec.TimestampTzType)
      case TimestampNTZType => Some(spec.TimestampType)
      case d: DecimalType => Some(spec.DecimalType(d.precision, d.scale))
      case BinaryType => Some(spec.BinaryType)
      case _ => None
    }

  /** Catalyst value → the JVM scalar the kernels expect. */
  private[functions] def fromCatalyst(v: Any): Any = v match {
    case null => null
    case s: UTF8String => s.toString
    case d: Decimal => d.toJavaBigDecimal
    case other => other
  }

  private[functions] def toCatalyst(v: Any, dt: DataType): Any = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case bd: java.math.BigDecimal =>
      val d = dt.asInstanceOf[DecimalType]
      Decimal(bd, d.precision, d.scale)
    case other => other
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): Iceberg bucket transform " +
        "(murmur3-x86-32 of the canonical byte layout, mod N)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets int, value); got $inputType")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket numBuckets must be int; got ${inputType.fields(0).dataType}")
      val src = inputType.fields(1).dataType
      val ice = iceTypeOf(src).getOrElse(throw new UnsupportedOperationException(
        s"bucket over ${src.catalogString} is not defined"))
      BucketBound(src, ice)
    }
  }

  private case class BucketBound(src: DataType, ice: spec.IcebergType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, src)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${src.catalogString})"
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(1)) return null
      val n = input.getInt(0)
      val v = fromCatalyst(input.get(1, src))
      Transforms.applyToValue(GT.Bucket(n), v, ice) match {
        case Some(i: Int) => Integer.valueOf(i)
        case _ => null
      }
    }
  }

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col): Iceberg truncate transform " +
        "(floor to a multiple of width; string prefix)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width int, value); got $inputType")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate width must be int; got ${inputType.fields(0).dataType}")
      val src = inputType.fields(1).dataType
      val ice = iceTypeOf(src).getOrElse(throw new UnsupportedOperationException(
        s"truncate over ${src.catalogString} is not defined"))
      TruncateBound(src, ice)
    }
  }

  private case class TruncateBound(src: DataType, ice: spec.IcebergType)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, src)
    override def resultType(): DataType = src
    override def name(): String = "truncate"
    override def canonicalName(): String =
      s"graft.truncate(${src.catalogString})"
    override def produceResult(input: InternalRow): Any = {
      if (input.isNullAt(1)) return null
      val w = input.getInt(0)
      val v = fromCatalyst(input.get(1, src))
      Transforms.applyToValue(GT.Truncate(w), v, ice)
        .map(toCatalyst(_, src)).orNull
    }
  }

  /** years/months/days/hours over date / timestamp / timestamp_ntz —
    * units since the 1970 epoch, matching written partition tuples. */
  private class TemporalUnbound(fname: String, t: GT) extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(col): Iceberg $fname transform (units since epoch)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fname takes one datetime argument; got $inputType")
      val src = inputType.fields(0).dataType
      val ok = src == DateType || src == TimestampType ||
        src == TimestampNTZType
      val hourOk = t != GT.Hour || src != DateType
      if (!ok || !hourOk) throw new UnsupportedOperationException(
        s"$fname over ${src.catalogString} is not defined")
      TemporalBound(fname, t, src,
        iceTypeOf(src).get)
    }
  }

  private case class TemporalBound(fname: String, t: GT, src: DataType,
      ice: spec.IcebergType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(src)
    override def resultType(): DataType = IntegerType
    override def name(): String = fname
    override def canonicalName(): String =
      s"graft.$fname(${src.catalogString})"
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(0)) return null
      val v = fromCatalyst(input.get(0, src))
      Transforms.applyToValue(t, v, ice) match {
        case Some(i: Int) => Integer.valueOf(i)
        case Some(l: Long) => Integer.valueOf(l.toInt)
        case _ => null
      }
    }
  }
}
