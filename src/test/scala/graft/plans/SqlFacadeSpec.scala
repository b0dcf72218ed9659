package graft.plans

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkTestSession
import graft.catalog._
import graft.io.HadoopFileIO
import graft.spec._
import graft.table._

/** spark.sql / spark.table over engine tables: the GraftRelation leaf +
  * optimizer-rule substitution must deliver filter-aware manifest/file
  * pruning and MoR semantics, executing on the native parquet reader. */
class SqlFacadeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(name: String): Table = {
    val dir = Files.createTempDirectory("graft-sql-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name),
      Fixtures4.usersSchema, io = new HadoopFileIO())
  }

  private def usersDf(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"user_$i",
      if (i % 2 == 1) null else s"u$i@x.com",
      new java.sql.Timestamp(1704067200000L + i * 1000L)))
      .toDF("id", "name", "email", "created_at")
  }

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.relation.location.inputFiles.toSeq
      }.flatten

  test("spark.sql filter prunes files via the engine's stats") {
    var t = freshTable("sqlprune")
    t = TableOps.append(t, usersDf(1 to 10).coalesce(1))
    t = TableOps.append(t, usersDf(11 to 20).coalesce(1))
    GraftSQL.registerTable(spark, t, "users_sql")

    val q = spark.sql("SELECT id, name FROM users_sql WHERE id <= 3")
    val rows = q.collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L, 3L))
    val files = scannedFiles(q)
    assert(files.size == 1,
      s"bounds pruning must reach the SQL path (1 of 2 files): $files")

    // unfiltered query reads both files
    val all = spark.table("users_sql")
    assert(all.count() == 20)
    assert(scannedFiles(all).size == 2)
  }

  test("SQL aggregation + IN-list + null semantics match the engine") {
    var t = freshTable("sqlagg")
    t = TableOps.append(t, usersDf(1 to 20))
    GraftSQL.registerTable(spark, t, "users_agg")
    val n = spark.sql(
      """SELECT COUNT(*) AS n FROM users_agg
        |WHERE id IN (1, 2, 3, 999) AND email IS NULL""".stripMargin)
      .collect().head.getLong(0)
    assert(n == 2, "ids 1 and 3 have null emails")
  }

  test("MoR deletes apply through spark.sql") {
    var t = freshTable("sqlmor")
    t = TableOps.append(t, usersDf(1 to 10).coalesce(1))
    t = t.newDelete(spark).where(Col("id").lte(3L))
      .withMergeOnRead(true).execute()
    GraftSQL.registerTable(spark, t, "users_mor")
    val got = spark.sql("SELECT id FROM users_mor ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (4 to 10).map(_.toLong),
      s"MoR deletes must apply in the SQL path: $got")
  }

  test("SQL filter on a partitioned table prunes to one partition") {
    val dir = Files.createTempDirectory("graft-sqlpart-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    val spec = PartitionSpec.builder(0).day(4, "created_day").build()
    var t = Table.create(cat, TableIdentifier(Seq("db"), "sqlpart"),
      Fixtures4.usersSchema, spec, io = new HadoopFileIO())
    import spark.implicits._
    val df = (1 to 30).map { i =>
      val day = 19800 + (i % 3)
      (i.toLong, s"u$i", s"e$i", new java.sql.Timestamp(86400000L * day + i))
    }.toDF("id", "name", "email", "created_at")
    t = TableOps.append(t, df)
    GraftSQL.registerTable(spark, t, "users_part")
    val q = spark.sql(
      """SELECT id FROM users_part
        |WHERE created_at >= TIMESTAMP '2024-03-19 00:00:00'
        |  AND created_at < TIMESTAMP '2024-03-20 00:00:00'""".stripMargin)
    assert(q.count() == 10)
    val files = scannedFiles(q)
    assert(files.size == 1,
      s"partition-tuple pruning must reach the SQL path: $files")
  }

  test("SQL join against a registered table works (self + other)") {
    var t = freshTable("sqljoin")
    t = TableOps.append(t, usersDf(1 to 8))
    GraftSQL.registerTable(spark, t, "users_j")
    // self-join exercises MultiInstanceRelation exprId dedup
    val c = spark.sql(
      """SELECT COUNT(*) AS n FROM users_j a JOIN users_j b ON a.id = b.id""")
      .collect().head.getLong(0)
    assert(c == 8)
  }
}
