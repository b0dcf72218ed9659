package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not => sparkNot}

/** Filter-expression ADT mirroring the reference's 15-op AST
  * (`table/expression.go:10-26,66-73`) as a sealed Scala hierarchy —
  * the idiomatic replacement for its visitor double-dispatch
  * (`table/expression.go:302-354`): callers pattern-match.
  *
  * Null semantics: the compiled form uses Spark/SQL three-valued logic.
  * This matches the reference for every leaf op (its NULL-cell
  * comparisons yield false, `table/delete.go:344-346`) but diverges for
  * composed `Not(...)` over NULL, where the reference's pure boolean
  * negation yields true (`table/delete.go:306-310`) and SQL yields
  * unknown→filtered. We implement SQL 3VL and document the divergence
  * (SURVEY §2.2) — DuckDB-oracle testing demands it.
  */
sealed trait Expr {
  /** Compile to a Spark Column — Catalyst then gets boolean
    * simplification, pushdown, and codegen for free (SURVEY §4.1). */
  def toColumn: Column = ExprCompiler.compile(this)

  /** ANSI SQL rendering (DuckDB-compatible), used to build oracle SQL
    * for engine-routed queries. */
  def toSql: String = ExprCompiler.sql(this)

  def and(other: Expr): Expr = Expr.and(this, other)
  def or(other: Expr): Expr = Expr.or(this, other)
  def unary_! : Expr = Not(this)

  /** Rewrite every leaf's column name (used for case-insensitive
    * resolution against a schema). */
  def mapColumns(f: String => String): Expr = this match {
    case And(cs) => And(cs.map(_.mapColumns(f)))
    case Or(cs) => Or(cs.map(_.mapColumns(f)))
    case Not(c) => Not(c.mapColumns(f))
    case Eq(c, v) => Eq(f(c), v)
    case NotEq(c, v) => NotEq(f(c), v)
    case Lt(c, v) => Lt(f(c), v)
    case Lte(c, v) => Lte(f(c), v)
    case Gt(c, v) => Gt(f(c), v)
    case Gte(c, v) => Gte(f(c), v)
    case In(c, vs) => In(f(c), vs)
    case NotIn(c, vs) => NotIn(f(c), vs)
    case IsNull(c) => IsNull(f(c))
    case NotNull(c) => NotNull(f(c))
    case StartsWith(c, p) => StartsWith(f(c), p)
    case NotStartsWith(c, p) => NotStartsWith(f(c), p)
    case other => other
  }

  /** Column names referenced anywhere in this predicate
    * (`table/expression.go:435-458`). */
  def referencedColumns: Set[String] = this match {
    case And(cs) => cs.flatMap(_.referencedColumns).toSet
    case Or(cs) => cs.flatMap(_.referencedColumns).toSet
    case Not(c) => c.referencedColumns
    case l: Leaf => Set(l.column)
    case AlwaysTrue | AlwaysFalse => Set.empty
  }

  /** Structural simplification (`table/expression.go:383-433`): drop
    * empty AND/OR, unwrap singletons, eliminate double negation. The
    * compiled plan gets this from Catalyst anyway; this keeps the AST
    * form (used by the pruner) small. */
  def simplify: Expr = this match {
    case And(cs) =>
      val s = cs.map(_.simplify).filterNot(_ == AlwaysTrue)
      if (s.exists(_ == AlwaysFalse)) AlwaysFalse
      else s match {
        case Nil => AlwaysTrue
        case Seq(one) => one
        case many => And(many)
      }
    case Or(cs) =>
      val s = cs.map(_.simplify).filterNot(_ == AlwaysFalse)
      if (s.exists(_ == AlwaysTrue)) AlwaysTrue
      else s match {
        case Nil => AlwaysFalse
        case Seq(one) => one
        case many => Or(many)
      }
    case Not(Not(inner)) => inner.simplify
    case Not(AlwaysTrue) => AlwaysFalse
    case Not(AlwaysFalse) => AlwaysTrue
    case Not(c) => c.simplify match {
      case Not(inner) => inner
      case AlwaysTrue => AlwaysFalse
      case AlwaysFalse => AlwaysTrue
      case s => Not(s)
    }
    case other => other
  }

  override def toString: String = this match {
    case And(cs) => cs.mkString("(", " AND ", ")")
    case Or(cs) => cs.mkString("(", " OR ", ")")
    case Not(c) => s"NOT $c"
    case Eq(c, v) => s"$c = $v"
    case NotEq(c, v) => s"$c != $v"
    case Lt(c, v) => s"$c < $v"
    case Lte(c, v) => s"$c <= $v"
    case Gt(c, v) => s"$c > $v"
    case Gte(c, v) => s"$c >= $v"
    case In(c, vs) => s"$c IN ${vs.mkString("[", " ", "]")}"
    case NotIn(c, vs) => s"$c NOT IN ${vs.mkString("[", " ", "]")}"
    case IsNull(c) => s"$c IS NULL"
    case NotNull(c) => s"$c IS NOT NULL"
    case StartsWith(c, p) => s"$c STARTS WITH $p"
    case NotStartsWith(c, p) => s"$c NOT STARTS WITH $p"
    case AlwaysTrue => "true"
    case AlwaysFalse => "false"
  }
}

sealed trait Leaf extends Expr { def column: String }

final case class And(children: Seq[Expr]) extends Expr
final case class Or(children: Seq[Expr]) extends Expr
final case class Not(child: Expr) extends Expr
final case class Eq(column: String, value: Any) extends Leaf
final case class NotEq(column: String, value: Any) extends Leaf
final case class Lt(column: String, value: Any) extends Leaf
final case class Lte(column: String, value: Any) extends Leaf
final case class Gt(column: String, value: Any) extends Leaf
final case class Gte(column: String, value: Any) extends Leaf
final case class In(column: String, values: Seq[Any]) extends Leaf
final case class NotIn(column: String, values: Seq[Any]) extends Leaf
final case class IsNull(column: String) extends Leaf
final case class NotNull(column: String) extends Leaf
final case class StartsWith(column: String, prefix: String) extends Leaf
final case class NotStartsWith(column: String, prefix: String) extends Leaf
case object AlwaysTrue extends Expr
case object AlwaysFalse extends Expr

/** Fluent builder: `Col("age").gte(18) and Col("status").eqTo("active")`
  * — same shape as the reference's `Col(...).Eq(...)` DSL
  * (`table/expression.go:109-292`). */
final case class Col(name: String) {
  def eqTo(v: Any): Expr = Eq(name, v)
  def notEq(v: Any): Expr = NotEq(name, v)
  def lt(v: Any): Expr = Lt(name, v)
  def lte(v: Any): Expr = Lte(name, v)
  def gt(v: Any): Expr = Gt(name, v)
  def gte(v: Any): Expr = Gte(name, v)
  def in(vs: Any*): Expr = In(name, vs)
  def notIn(vs: Any*): Expr = NotIn(name, vs)
  def isNull: Expr = IsNull(name)
  def notNull: Expr = NotNull(name)
  def startsWith(p: String): Expr = StartsWith(name, p)
  def notStartsWith(p: String): Expr = NotStartsWith(name, p)
  /** Desugars to Gte AND Lte (`table/expression.go:294-300`). */
  def between(lo: Any, hi: Any): Expr = And(Seq(Gte(name, lo), Lte(name, hi)))
}

object Expr {
  /** N-ary combinators (`table/expression.go:225-247`). */
  def and(exprs: Expr*): Expr = exprs match {
    case Seq() => AlwaysTrue
    case Seq(one) => one
    case many => And(many.flatMap {
      case And(cs) => cs
      case e => Seq(e)
    })
  }
  def or(exprs: Expr*): Expr = exprs match {
    case Seq() => AlwaysFalse
    case Seq(one) => one
    case many => Or(many.flatMap {
      case Or(cs) => cs
      case e => Seq(e)
    })
  }
  def not(e: Expr): Expr = Not(e)
}

object ExprCompiler {

  /** Expression → Spark Column (SURVEY P4's compile table). */
  def compile(e: Expr): Column = e match {
    case And(cs) => cs.map(compile).reduce(_ && _)
    case Or(cs) => cs.map(compile).reduce(_ || _)
    case Not(c) => sparkNot(compile(c))
    case Eq(c, v) => col(c) === lit(v)
    case NotEq(c, v) => col(c) =!= lit(v)
    case Lt(c, v) => col(c) < lit(v)
    case Lte(c, v) => col(c) <= lit(v)
    case Gt(c, v) => col(c) > lit(v)
    case Gte(c, v) => col(c) >= lit(v)
    case In(c, vs) => col(c).isin(vs: _*)
    case NotIn(c, vs) => !col(c).isin(vs: _*)
    case IsNull(c) => col(c).isNull
    case NotNull(c) => col(c).isNotNull
    case StartsWith(c, p) => col(c).startsWith(p)
    case NotStartsWith(c, p) => sparkNot(col(c).startsWith(p))
    case AlwaysTrue => lit(true)
    case AlwaysFalse => lit(false)
  }

  /** Expression → ANSI SQL text (matches Spark 3VL semantics so the
    * DuckDB oracle computes the same result). */
  def sql(e: Expr): String = e match {
    case And(cs) => cs.map(sql).mkString("(", " AND ", ")")
    case Or(cs) => cs.map(sql).mkString("(", " OR ", ")")
    case Not(c) => s"(NOT ${sql(c)})"
    case Eq(c, v) => s"$c = ${sqlLit(v)}"
    case NotEq(c, v) => s"$c <> ${sqlLit(v)}"
    case Lt(c, v) => s"$c < ${sqlLit(v)}"
    case Lte(c, v) => s"$c <= ${sqlLit(v)}"
    case Gt(c, v) => s"$c > ${sqlLit(v)}"
    case Gte(c, v) => s"$c >= ${sqlLit(v)}"
    case In(c, vs) => s"$c IN ${vs.map(sqlLit).mkString("(", ", ", ")")}"
    case NotIn(c, vs) =>
      s"$c NOT IN ${vs.map(sqlLit).mkString("(", ", ", ")")}"
    case IsNull(c) => s"$c IS NULL"
    case NotNull(c) => s"$c IS NOT NULL"
    // ESCAPE is mandatory: ANSI/DuckDB LIKE has NO default escape
    // character, so without the clause the backslashes likePrefix
    // emits are literal backslashes, not escapes — a prefix containing
    // % or _ would silently match the wrong rows in the oracle
    case StartsWith(c, p) =>
      s"$c LIKE ${sqlLit(likePrefix(p))} ESCAPE '\\'"
    case NotStartsWith(c, p) =>
      s"NOT ($c LIKE ${sqlLit(likePrefix(p))} ESCAPE '\\')"
    case AlwaysTrue => "TRUE"
    case AlwaysFalse => "FALSE"
  }

  private def likePrefix(p: String): String =
    p.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_") + "%"

  private def sqlLit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case d: java.sql.Date => s"DATE '$d'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case null => "NULL"
    case other => other.toString
  }
}
