package graft.table

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.spec._

/** Partition transform evaluation — declared but never computed in the
  * reference (`spec/partition.go:91-99`, `table/writer.go:247-253`).
  *
  * Semantics follow the Iceberg spec: calendar transforms count units
  * since the 1970 epoch; `bucket[N]` is murmur3-x86-32 (seed 0) of the
  * type's byte layout mod N; `truncate[W]` floors numerics to a multiple
  * of W and prefixes strings.
  */
object Transforms extends Serializable {

  /** Scalar (driver-side) evaluation, used by the pruner to project
    * predicate literals and by the writer for partition tuples.
    * Returns None when the value isn't projectable onto the transform. */
  def applyToValue(t: Transform, v: Any,
      sourceType: IcebergType): Option[Any] = {
    if (v == null) return Some(null)
    t match {
      case Transform.Identity => Some(v)
      case Transform.Void => Some(null)
      case Transform.Year => toDate(v, sourceType).map(d =>
        d.getYear - 1970)
      case Transform.Month => toDate(v, sourceType).map(d =>
        (d.getYear - 1970) * 12 + (d.getMonthValue - 1))
      case Transform.Day => toEpochDay(v, sourceType).map(_.toInt)
      case Transform.Hour => v match {
        case micros: Long => Some(Math.floorDiv(micros, 3600L * 1000000L).toInt)
        case _ => None
      }
      case Transform.Bucket(n) => bucketHash(v, sourceType).map { h =>
        (h & Int.MaxValue) % n
      }
      case Transform.Truncate(w) => v match {
        case i: Int => Some(i - Math.floorMod(i, w))
        case l: Long => Some(l - Math.floorMod(l, w.toLong))
        case s: String => Some(s.take(w))
        case d: java.math.BigDecimal =>
          val unscaled = d.unscaledValue()
          val wBig = java.math.BigInteger.valueOf(w.toLong)
          val mod = unscaled.mod(wBig) // sign-safe floor mod
          Some(new java.math.BigDecimal(unscaled.subtract(mod), d.scale()))
        case _ => None
      }
    }
  }

  private def toEpochDay(v: Any, t: IcebergType): Option[Long] = (t, v) match {
    case (DateType, days: Int) => Some(days.toLong)
    case (TimestampType | TimestampTzType, micros: Long) =>
      Some(Math.floorDiv(micros, 86400L * 1000000L))
    case _ => None
  }

  private def toDate(v: Any, t: IcebergType): Option[LocalDate] =
    toEpochDay(v, t).map(LocalDate.ofEpochDay)

  /** Iceberg single-value hash (spec "Appendix B"): murmur3-x86-32 of
    * the canonical byte layout, seed 0. int hashes as long. */
  def bucketHash(v: Any, t: IcebergType): Option[Int] = {
    def longBytes(l: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    val bytes: Option[Array[Byte]] = (t, v) match {
      case (IntType | LongType | DateType | TimeType |
          TimestampType | TimestampTzType, _) => v match {
        case i: Int => Some(longBytes(i.toLong))
        case l: Long => Some(longBytes(l))
        case _ => None
      }
      case (StringType, s: String) =>
        Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (BinaryType | UUIDType | _: FixedType, b: Array[Byte]) => Some(b)
      case (DecimalType(_, _), d: java.math.BigDecimal) =>
        Some(d.unscaledValue().toByteArray)
      case _ => None
    }
    bytes.map(b => scala.util.hashing.MurmurHash3.bytesHash(b, 0))
  }

  /** Column-level evaluation for the write path: the partition value as
    * a Spark expression over the source column.
    *
    * Calendar transforms are timezone-INDEPENDENT: tz-aware timestamps
    * use UTC epoch arithmetic (`unix_micros`), NTZ timestamps and dates
    * their literal calendar fields — so written partition tuples always
    * agree with the pruner's UTC projections in [[applyToValue]], no
    * matter what `spark.sql.session.timeZone` is (year()/month()/hour()
    * on a tz-aware column would silently follow the session zone).
    *
    * `sparkType` is the ACTUAL Spark type of the source column when the
    * caller knows it: a DataFrame may carry a tz-aware TimestampType for
    * an Iceberg NTZ field (or vice versa), and tz-dependence is a
    * property of the Spark type, not the declared Iceberg one. */
  def applyToColumn(t: Transform, source: Column,
      sourceType: IcebergType,
      sparkType: Option[org.apache.spark.sql.types.DataType] = None): Column = {
    import org.apache.spark.sql.types.{TimestampType => SparkTsType}
    val MicrosPerDay = 86400000000L
    val MicrosPerHour = 3600000000L
    // tz-aware instant → UTC epoch arithmetic; NTZ/date → literal fields
    val absoluteInstant = sparkType match {
      case Some(dt) => dt == SparkTsType
      case None => sourceType == TimestampTzType
    }
    // exact floor-division on longs: subtract the (non-negative) pmod,
    // divide as decimal (double division would round past 2^53 µs)
    def floorDiv(c: Column, d: Long): Column =
      ((c - pmod(c, lit(d))).cast("decimal(38,0)") / lit(d)).cast("long")
    def epochDay: Column =
      if (absoluteInstant) floorDiv(unix_micros(source), MicrosPerDay)
      else datediff(source.cast("date"), lit("1970-01-01")).cast("long")
    // the UTC calendar date of the value, independent of session zone
    def utcDate: Column =
      if (absoluteInstant)
        date_add(lit("1970-01-01").cast("date"), epochDay.cast("int"))
      else source.cast("date")
    t match {
      case Transform.Identity => source
      case Transform.Void => lit(null)
      case Transform.Year => year(utcDate) - lit(1970)
      case Transform.Month =>
        (year(utcDate) - lit(1970)) * lit(12) + month(utcDate) - lit(1)
      case Transform.Day => epochDay.cast("int")
      case Transform.Hour =>
        if (absoluteInstant)
          floorDiv(unix_micros(source), MicrosPerHour).cast("int")
        // NTZ: hours since epoch from literal calendar fields
        else (epochDay * lit(24) + hour(source)).cast("int")
      case Transform.Bucket(n) =>
        // native Catalyst expression with codegen (graft.functions) —
        // stays inside WholeStageCodegen, unlike a Scala UDF
        graft.functions.IcebergFunctions.icebergBucket(source, n)
      case Transform.Truncate(w) => sourceType match {
        case StringType => substring(source, 1, w)
        case _ => source - pmod(source, lit(w))
      }
    }
  }

  /** Spark JVM values → Iceberg canonical scalar for hashing. */
  private def coerceFromSpark(v: Any, t: IcebergType): Any = (t, v) match {
    case (TimestampType | TimestampTzType, ts: java.sql.Timestamp) =>
      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    case (TimestampType, ldt: java.time.LocalDateTime) =>
      ldt.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L +
        ldt.getNano / 1000
    case (TimestampTzType, i: Instant) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000
    case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
    case (DateType, d: LocalDate) => d.toEpochDay.toInt
    case (DecimalType(_, s), bd: java.math.BigDecimal) => bd.setScale(s)
    case (DecimalType(_, s), bd: BigDecimal) => bd.bigDecimal.setScale(s)
    case _ => v
  }
}
