package graft.spec

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Single-value binary serialization for column bounds
  * (`spec/avro.go:814-883`): little-endian numerics, raw UTF-8 strings,
  * raw bytes. Extended (beyond the reference, per the Iceberg spec) to
  * cover date/time/timestamp (LE int32/int64), uuid (16 raw bytes) and
  * decimal (big-endian unscaled value).
  *
  * These bytes are what the stats pruner compares against, so the
  * serialize/deserialize pair must round-trip exactly (SURVEY §7 risk 3).
  */
object Bounds {

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le(n: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n).array()

  def serialize(value: Any, t: IcebergType): Array[Byte] = (t, value) match {
    case (BooleanType, b: Boolean) => Array[Byte](if (b) 1 else 0)
    case (IntType | DateType, i: Int) => le(i)
    case (LongType | TimeType | TimestampType | TimestampTzType, l: Long) =>
      le(l)
    case (IntType | DateType, l: Long) => le(l.toInt)
    case (FloatType, f: Float) => ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putFloat(f).array()
    case (DoubleType, d: Double) => ByteBuffer.allocate(8)
      .order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array()
    case (StringType, s: String) => s.getBytes(StandardCharsets.UTF_8)
    case (BinaryType | UUIDType | _: FixedType, b: Array[Byte]) => b
    case (DecimalType(_, scale), d: java.math.BigDecimal) =>
      d.setScale(scale).unscaledValue.toByteArray // big-endian, two's complement
    case (DecimalType(p, s), d: BigDecimal) =>
      serialize(d.bigDecimal, DecimalType(p, s))
    case _ => throw new IllegalArgumentException(
      s"cannot serialize ${value.getClass.getName} as $t")
  }

  def deserialize(data: Array[Byte], t: IcebergType): Any = {
    if (data == null || data.isEmpty) return null
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case BooleanType => data(0) != 0
      case IntType | DateType => buf.getInt
      case LongType | TimeType | TimestampType | TimestampTzType => buf.getLong
      case FloatType => buf.getFloat
      case DoubleType => buf.getDouble
      case StringType => new String(data, StandardCharsets.UTF_8)
      case BinaryType | UUIDType | _: FixedType => data
      case DecimalType(_, scale) =>
        new java.math.BigDecimal(new java.math.BigInteger(data), scale)
      case _ => data
    }
  }

  /** Total order over deserialized bound values of one type; used by the
    * pruner to compare predicate literals against [lower, upper]. */
  def compare(a: Any, b: Any, t: IcebergType): Int = (t, a, b) match {
    case (BooleanType, x: Boolean, y: Boolean) => x.compareTo(y)
    case (IntType | DateType, x: Int, y: Int) => x.compareTo(y)
    case (LongType | TimeType | TimestampType | TimestampTzType,
        x: Long, y: Long) => x.compareTo(y)
    case (FloatType, x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (DoubleType, x: Double, y: Double) => java.lang.Double.compare(x, y)
    // UTF-8 unsigned-byte order, NOT String.compareTo (UTF-16 code
    // units): parquet computes string min/max in UTF-8 byte order, so
    // the pruner must compare in the same order — the two diverge for
    // supplementary-plane chars (emoji, surrogate-paired) vs
    // [U+E000, U+FFFF], where UTF-16 would prune files that match
    case (StringType, x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(StandardCharsets.UTF_8),
        y.getBytes(StandardCharsets.UTF_8))
    case (DecimalType(_, _), x: java.math.BigDecimal, y: java.math.BigDecimal) =>
      x.compareTo(y)
    case (BinaryType | UUIDType | _: FixedType,
        x: Array[Byte], y: Array[Byte]) =>
      java.util.Arrays.compareUnsigned(x, y)
    case _ => throw new IllegalArgumentException(
      s"cannot compare ${a.getClass.getName} / ${b.getClass.getName} as $t")
  }
}
