package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel decoding the URI percent-encoding in
  * `_metadata.file_path` back to the raw filesystem path, shared by
  * interpreted eval AND the generated code.
  *
  * Spark reports file-source paths in URI form — a partition dir
  * `__p_c=a b` surfaces as `a%20b` — while manifests carry the raw
  * path; every `_metadata`-derived path decodes through here so all
  * path comparisons use ONE form. Byte-level: each `%XX` hex triple
  * collapses to its byte (UTF-8 multi-byte sequences arrive as
  * consecutive triples, so operating on the UTF-8 bytes is exact);
  * a literal `+` passes through (URI PATH encoding never means space
  * by `+` — that is form encoding, which is why `url_decode` and
  * `URLDecoder` are both the wrong tool); a malformed `%` stays
  * literal. No-op (same object) for the common percent-free path.
  *
  * A custom expression rather than `functions.url_decode` because the
  * builtin is RuntimeReplaceable — inside the DSv2 connector's MoR
  * read plan the replacement rule has already run, and codegen then
  * dies with INTERNAL_ERROR "Cannot generate code for expression". */
object MetaPathDecode {
  private def hex(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case l if l >= 'a' && l <= 'f' => l - 'a' + 10
    case u if u >= 'A' && u <= 'F' => u - 'A' + 10
    case _ => -1
  }

  def decode(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    var has = false
    while (i < b.length && !has) {
      if (b(i) == '%') has = true
      i += 1
    }
    if (!has) return s
    val out = new Array[Byte](b.length)
    var o = 0
    i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == '%' && i + 2 < b.length && hex(b(i + 1)) >= 0 &&
          hex(b(i + 2)) >= 0) {
        out(o) = ((hex(b(i + 1)) << 4) | hex(b(i + 2))).toByte
        o += 1
        i += 3
      } else {
        out(o) = c
        o += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

/** [[MetaPathDecode.decode]] as a native Catalyst expression with code
  * generation — stays inside WholeStageCodegen on the MoR read path
  * (which decodes `_metadata.file_path` for every row of a scan that
  * carries position deletes). */
case class MetaPathDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "meta_path_decode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"meta_path_decode does not support type $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    MetaPathDecode.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val util = MetaPathDecode.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.decode($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MetaPathDecodeExpr = copy(child = newChild)
}

object MetaPathDecodeExpr {
  def column(c: Column): Column =
    Bridge.column(MetaPathDecodeExpr(Bridge.expression(c)))
}
