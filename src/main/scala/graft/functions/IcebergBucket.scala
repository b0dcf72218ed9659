package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static murmur3 bucket kernels, shared by interpreted eval AND the
  * generated code (the codegen emits direct static calls, keeping the
  * expression inside WholeStageCodegen — SURVEY §2.10's one custom
  * Catalyst need, preference order (b) in the builder brief).
  *
  * Byte layouts follow the Iceberg single-value hash spec: integral and
  * temporal values hash as 8-byte little-endian longs, strings as UTF-8
  * bytes, decimals as big-endian unscaled bytes.
  */
object BucketUtil {
  private def murmur(bytes: Array[Byte]): Int =
    scala.util.hashing.MurmurHash3.bytesHash(bytes, 0)

  def bucketLong(v: Long, n: Int): Int = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    (murmur(b) & Int.MaxValue) % n
  }

  def bucketUTF8(s: UTF8String, n: Int): Int =
    (murmur(s.getBytes) & Int.MaxValue) % n

  def bucketBytes(b: Array[Byte], n: Int): Int =
    (murmur(b) & Int.MaxValue) % n

  def bucketDecimal(d: Decimal, n: Int): Int =
    (murmur(d.toJavaBigDecimal.unscaledValue.toByteArray) & Int.MaxValue) % n
}

/** `bucket[N]` partition transform as a native Catalyst expression with
  * code generation — replaces the Scala-UDF evaluation path (UDFs break
  * whole-stage codegen and add serialization overhead per row; at
  * 100 TB the bucket column is computed for every written row). */
case class IcebergBucketExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets > 0, "numBuckets must be positive")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType | TimestampNTZType | StringType | BinaryType |
          _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support type $other")
    }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case ByteType => BucketUtil.bucketLong(v.asInstanceOf[Byte].toLong, numBuckets)
    case ShortType => BucketUtil.bucketLong(v.asInstanceOf[Short].toLong, numBuckets)
    case IntegerType | DateType =>
      BucketUtil.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    case LongType | TimestampType | TimestampNTZType =>
      BucketUtil.bucketLong(v.asInstanceOf[Long], numBuckets)
    case StringType =>
      BucketUtil.bucketUTF8(v.asInstanceOf[UTF8String], numBuckets)
    case BinaryType =>
      BucketUtil.bucketBytes(v.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType =>
      BucketUtil.bucketDecimal(v.asInstanceOf[Decimal], numBuckets)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val util = BucketUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val call = child.dataType match {
      case ByteType | ShortType | IntegerType | DateType =>
        (c: String) => s"$util.bucketLong((long) $c, $numBuckets)"
      case LongType | TimestampType | TimestampNTZType =>
        (c: String) => s"$util.bucketLong($c, $numBuckets)"
      case StringType =>
        (c: String) => s"$util.bucketUTF8($c, $numBuckets)"
      case BinaryType =>
        (c: String) => s"$util.bucketBytes($c, $numBuckets)"
      case _: DecimalType =>
        (c: String) => s"$util.bucketDecimal($c, $numBuckets)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(
      newChild: Expression): IcebergBucketExpr = copy(child = newChild)
}

/** User-facing function surface. */
object IcebergFunctions {
  /** `bucket[N]` of any supported column — Column API. */
  def icebergBucket(c: Column, numBuckets: Int): Column =
    Bridge.column(IcebergBucketExpr(Bridge.expression(c), numBuckets))

  /** Register `iceberg_bucket(col, n)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iceberg_bucket",
      exprs => {
        require(exprs.size == 2, "iceberg_bucket(col, numBuckets)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"numBuckets must be a literal, got $other")
        }
        IcebergBucketExpr(exprs.head, n)
      },
      "scala_udf")
  }
}
