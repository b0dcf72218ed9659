package graft.table

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference expression suite (table/expression_test.go)
  * against the sealed-ADT form. */
class ExpressionSpec extends AnyFunSuite {

  test("builder constructs every op") {
    assert(Col("id").eqTo(123) == Eq("id", 123))
    assert(Col("s").notEq("deleted") == NotEq("s", "deleted"))
    assert(Col("age").lt(5) == Lt("age", 5))
    assert(Col("age").lte(5) == Lte("age", 5))
    assert(Col("age").gt(5) == Gt("age", 5))
    assert(Col("age").gte(5) == Gte("age", 5))
    assert(Col("r").in("a", "b") == In("r", Seq("a", "b")))
    assert(Col("r").notIn("a") == NotIn("r", Seq("a")))
    assert(Col("e").isNull == IsNull("e"))
    assert(Col("e").notNull == NotNull("e"))
    assert(Col("n").startsWith("John") == StartsWith("n", "John"))
    assert(Col("n").notStartsWith("J") == NotStartsWith("n", "J"))
  }

  test("between desugars to Gte AND Lte (expression_test.go:226-244)") {
    assert(Col("price").between(10.0, 100.0) ==
      And(Seq(Gte("price", 10.0), Lte("price", 100.0))))
  }

  test("nested expressions (expression_test.go:147-168)") {
    val e = (Col("age").gte(18) and Col("status").eqTo("active"))
      .or(Col("role").eqTo("admin"))
    assert(e == Or(Seq(
      And(Seq(Gte("age", 18), Eq("status", "active"))),
      Eq("role", "admin"))))
    assert(e.referencedColumns == Set("age", "status", "role"))
  }

  test("n-ary and/or flatten") {
    val e = Expr.and(Col("a").gt(1), Expr.and(Col("b").gt(2), Col("c").gt(3)))
    assert(e == And(Seq(Gt("a", 1), Gt("b", 2), Gt("c", 3))))
    assert(Expr.and() == AlwaysTrue)
    assert(Expr.or() == AlwaysFalse)
    assert(Expr.and(Col("x").gt(1)) == Gt("x", 1))
  }

  test("simplify (expression.go:383-433)") {
    assert(Not(Not(Eq("x", 1))).simplify == Eq("x", 1))
    assert(And(Seq(AlwaysTrue, Eq("x", 1))).simplify == Eq("x", 1))
    assert(Or(Seq(AlwaysFalse, Eq("x", 1))).simplify == Eq("x", 1))
    assert(And(Seq(AlwaysFalse, Eq("x", 1))).simplify == AlwaysFalse)
    assert(Or(Seq(AlwaysTrue, Eq("x", 1))).simplify == AlwaysTrue)
    assert(And(Nil).simplify == AlwaysTrue)
    assert(Or(Nil).simplify == AlwaysFalse)
    assert(Not(AlwaysTrue).simplify == AlwaysFalse)
  }

  test("string form smoke (expression_test.go String cases)") {
    assert(Eq("id", 123).toString == "id = 123")
    assert(And(Seq(Gte("age", 18), Eq("status", "active"))).toString ==
      "(age >= 18 AND status = active)")
    assert(IsNull("email").toString == "email IS NULL")
  }

  test("sql rendering escapes strings and prefixes") {
    assert(Eq("name", "O'Brien").toSql == "name = 'O''Brien'")
    // ESCAPE is mandatory: ANSI/DuckDB LIKE has no default escape
    // char, so without it the backslashes would match literally
    assert(StartsWith("n", "50%_x").toSql ==
      "n LIKE '50\\%\\_x%' ESCAPE '\\'")
    assert(In("r", Seq("a", "b")).toSql == "r IN ('a', 'b')")
    assert(Col("p").between(1, 2).toSql == "(p >= 1 AND p <= 2)")
  }

  test("referencedColumns of leaf-free exprs is empty") {
    assert(AlwaysTrue.referencedColumns.isEmpty)
    assert(Expr.and().referencedColumns.isEmpty)
  }
}
