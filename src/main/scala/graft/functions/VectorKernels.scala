package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Static vector kernels shared by interpreted eval AND generated code
  * (the IcebergBucket pattern — SURVEY §2.10, preference order (b)).
  *
  * Why these exist: the ANN/semantic-dedup family's hot loop is a dot
  * product per CANDIDATE PAIR. The composable form —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a higher-order
  * function, which Spark evaluates as CodegenFallback with a boxed
  * closure call per element: measured ~30 µs per 64-dim pair, which
  * made the e8 within-cell prune 8.5 s at a mere 2000 vectors. The
  * kernels below run the same arithmetic as a tight primitive loop.
  *
  * Bit-exactness contract (what the DuckDB hash gates rely on): the
  * accumulation is the IDENTICAL in-order double fold — `acc +=
  * (double) a(i) * (double) b(i)` from index 0 — so results are
  * bit-for-bit equal to the HOF form and to the oracles' list_reduce
  * replay. Null semantics also mirror the fold: a null element or a
  * length mismatch yields NULL (zip_with pads the shorter side with
  * null, and `acc + null` poisons the fold).
  */
object VectorKernels {
  // element-reader codes (the HOF folds accepted any numeric element
  // via cast("double") — the kernels must not narrow that surface)
  final val FloatElem = 0
  final val DoubleElem = 1
  final val IntElem = 2
  final val LongElem = 3
  final val ShortElem = 4
  final val ByteElem = 5

  @inline private def read(a: ArrayData, i: Int, t: Int): Double =
    t match {
      case FloatElem => a.getFloat(i).toDouble
      case DoubleElem => a.getDouble(i)
      case IntElem => a.getInt(i).toDouble
      case LongElem => a.getLong(i).toDouble
      case ShortElem => a.getShort(i).toDouble
      case _ => a.getByte(i).toDouble
    }

  /** In-order dot product; `aType`/`bType` select the element reader
    * (narrower types widen per element, exactly like `x.cast("double")`
    * in the fold this replaces). Boxed return: null signals length
    * mismatch or a null element. */
  def dot(a: ArrayData, aType: Int, b: ArrayData,
      bType: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += read(a, i, aType) * read(b, i, bType)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** In-order squared Euclidean distance — `acc += (x - y)^2`. Same
    * null/mismatch contract as [[dot]]. */
  def sqDist(a: ArrayData, aType: Int, b: ArrayData,
      bType: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = read(a, i, aType) - read(b, i, bType)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Common scaffolding for the two binary vector kernels: both take a
  * float/double array on each side and return a nullable double. */
abstract class VectorKernelExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Element-reader code for [[VectorKernels]]; -1 = unsupported. */
  protected def elemCode(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _) => VectorKernels.FloatElem
    case ArrayType(DoubleType, _) => VectorKernels.DoubleElem
    case ArrayType(IntegerType, _) => VectorKernels.IntElem
    case ArrayType(LongType, _) => VectorKernels.LongElem
    case ArrayType(ShortType, _) => VectorKernels.ShortElem
    case ArrayType(ByteType, _) => VectorKernels.ByteElem
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(left) >= 0 && elemCode(right) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs arrays of fixed-width numeric elements " +
        s"(float/double/int/long/short/byte — cast decimals to " +
        s"array<double> first), got ${left.dataType} and ${right.dataType}")

  /** Static kernel method name in [[VectorKernels]]. */
  protected def kernel: String

  private def call(a: ArrayData, b: ArrayData): java.lang.Double =
    if (kernel == "dot")
      VectorKernels.dot(a, elemCode(left), b, elemCode(right))
    else VectorKernels.sqDist(a, elemCode(left), b, elemCode(right))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    call(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val util = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val r = ctx.freshName("vecKernel")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $r =
         |  $util.$kernel($a, ${elemCode(left)}, $b, ${elemCode(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }
}

/** In-order dot product of two vector columns — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) => x.cast("double") *
  * y.cast("double")), 0.0, _ + _)` but codegen'd (see
  * [[VectorKernels]]). `sqrt(dot(v, v))` is likewise bit-identical to
  * the l2-norm fold. */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorKernelExpr {
  override def prettyName: String = "vec_dot"
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** In-order squared Euclidean distance between two vector columns —
  * bit-identical to the `(x - c)^2` zip_with fold. */
case class SqDistExpr(left: Expression, right: Expression)
    extends VectorKernelExpr {
  override def prettyName: String = "vec_sqdist"
  override protected def kernel: String = "sqDist"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the vector kernels. */
object VectorFunctions {
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  def vecSqDist(a: Column, b: Column): Column =
    Bridge.column(SqDistExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Register `vec_dot(a, b)` / `vec_sqdist(a, b)` for SQL use (the
    * iceberg_bucket registration pattern). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => {
        require(exprs.size == 2, "vec_dot(a, b)")
        DotProductExpr(exprs.head, exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sqdist",
      exprs => {
        require(exprs.size == 2, "vec_sqdist(a, b)")
        SqDistExpr(exprs.head, exprs(1))
      },
      "scala_udf")
  }
}
