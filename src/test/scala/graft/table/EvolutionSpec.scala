package graft.table

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.catalog._
import graft.io.HadoopFileIO
import graft.spec._

/** Schema evolution across snapshots: old data files must stay readable
  * through the scan's field-ID remap (SURVEY M6). */
class EvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(name: String): Table = {
    val dir = Files.createTempDirectory("graft-evo-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name),
      Fixtures4.usersSchema, io = new HadoopFileIO())
  }

  private def usersDf(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"user_$i", s"u$i@x.com",
      new java.sql.Timestamp(1704067200000L + i)))
      .toDF("id", "name", "email", "created_at")
  }

  test("add column: old files null-fill, new files carry values") {
    var t = freshTable("addcol")
    t = TableOps.append(t, usersDf(1 to 5))
    t = t.updateSchema().addColumn("age", IntType).commit()
    assert(t.schema.fieldByName("age").exists(_.id == 5))
    import spark.implicits._
    val withAge = (6 to 10).map(i => (i.toLong, s"user_$i", s"u$i@x.com",
      new java.sql.Timestamp(1704067200000L + i), i * 10))
      .toDF("id", "name", "email", "created_at", "age")
    t = TableOps.append(t, withAge)
    val rows = Scan(t, spark).toDF.select("id", "age")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(rows.size == 10)
    assert(rows(1L).isEmpty, "pre-evolution rows read age as null")
    assert(rows(7L).contains(70))
  }

  test("rename column: old files readable under the new name") {
    var t = freshTable("rename")
    t = TableOps.append(t, usersDf(1 to 5))
    t = t.updateSchema().renameColumn("name", "username").commit()
    val df = Scan(t, spark).toDF
    assert(df.columns.contains("username") && !df.columns.contains("name"))
    val names = df.select("username").collect().map(_.getString(0)).toSet
    assert(names == (1 to 5).map(i => s"user_$i").toSet,
      "field-ID remap must read old 'name' data as 'username'")
    // filter on the renamed column still prunes + evaluates
    assert(Scan(t, spark).filter(Col("username").eqTo("user_3"))
      .toDF.count() == 1)
  }

  test("drop column removes it from scans of old data") {
    var t = freshTable("drop")
    t = TableOps.append(t, usersDf(1 to 5))
    t = t.updateSchema().dropColumn("email").commit()
    val df = Scan(t, spark).toDF
    assert(!df.columns.contains("email"))
    assert(df.count() == 5)
  }

  test("int -> long type promotion on read") {
    val dir = Files.createTempDirectory("graft-promo-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    val schema = Schema(0, Seq(
      NestedField(1, "k", IntType, required = true),
      NestedField(2, "v", StringType, required = false)))
    var t = Table.create(cat, TableIdentifier(Seq("db"), "promo"), schema,
      io = new HadoopFileIO())
    import spark.implicits._
    t = TableOps.append(t, Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t = t.updateSchema().updateColumnType("k", LongType).commit()
    val vals = Scan(t, spark).toDF.select("k").collect().map(_.getLong(0))
    assert(vals.toSet == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      t.updateSchema().updateColumnType("v", IntType)
    }
  }

  test("mixed-schema scan groups both generations correctly") {
    var t = freshTable("mixed")
    t = TableOps.append(t, usersDf(1 to 5))
    t = t.updateSchema()
      .renameColumn("email", "contact")
      .addColumn("score", DoubleType)
      .commit()
    import spark.implicits._
    val gen2 = (6 to 8).map(i => (i.toLong, s"user_$i", s"c$i@x.com",
      new java.sql.Timestamp(1704067200000L + i), i * 1.5))
      .toDF("id", "name", "contact", "created_at", "score")
    t = TableOps.append(t, gen2)
    val df = Scan(t, spark).toDF
    assert(df.count() == 8)
    val contacts = df.where(col("id") <= 5).select("contact")
      .collect().map(_.getString(0)).toSet
    assert(contacts == (1 to 5).map(i => s"u$i@x.com").toSet)
    assert(df.where(col("score").isNotNull).count() == 3)
  }

  test("SchemaUpdate walks list elements and map values; keys frozen") {
    val dir = Files.createTempDirectory("graft-evo-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    // list<list<struct>> exercises chained `element` steps; the map
    // value struct exercises `value`
    val schema = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "grid", ListType(3,
        ListType(4, StructType(Seq(
          NestedField(5, "x", IntType, required = false))),
          elementRequired = true),
        elementRequired = true), required = false),
      NestedField(6, "m", MapType(7, StringType, 8, StructType(Seq(
        NestedField(9, "v", IntType, required = false))),
        valueRequired = true), required = false)))
    var t = Table.create(cat, TableIdentifier(Seq("db"), "walker"),
      schema, io = new HadoopFileIO())
    t = t.updateSchema()
      .renameColumnAt(Seq("grid", "element", "element", "x"), "y")
      .updateColumnTypeAt(Seq("grid", "element", "element", "y"), LongType)
      .addNestedColumn(Seq("m", "value", "w"), DoubleType)
      .commit()
    val grid = t.schema.fieldByName("grid").get.fieldType
      .asInstanceOf[ListType].element.asInstanceOf[ListType]
      .element.asInstanceOf[StructType]
    assert(grid.fields.map(f => (f.id, f.name, f.fieldType)) ==
      Seq((5, "y", LongType)), s"leaf must rename+promote in place: $grid")
    val mval = t.schema.fieldByName("m").get.fieldType
      .asInstanceOf[MapType].value.asInstanceOf[StructType]
    assert(mval.fields.map(_.name) == Seq("v", "w"))
    assert(mval.fields.last.id == 10, // past highestFieldId incl. nested
      s"added map-value field must take a fresh id, got ${mval.fields.last}")
    // map keys are frozen; non-struct paths rejected
    intercept[IllegalArgumentException] {
      t.updateSchema().addNestedColumn(Seq("m", "key", "extra"), IntType)
    }
    intercept[IllegalArgumentException] {
      t.updateSchema().renameColumnAt(Seq("id", "element", "x"), "y")
    }
  }
}
