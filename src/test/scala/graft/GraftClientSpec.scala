package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.spec._
import graft.table.{Col, Scan, TableOps}

/** Top-level client facade lifecycle (iceberg.go surface). */
class GraftClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val usersSchema = Schema(0, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "name", StringType, required = false)))

  test("client lifecycle: namespaces, tables, data round-trip") {
    val client = GraftClient.local(
      Files.createTempDirectory("graft-client-").toString)
    client.createNamespace("analytics.raw")
    assert(client.namespaceExists("analytics.raw"))
    assert(client.listNamespaces().contains("analytics.raw"))

    var t = client.createTable("analytics.raw", "users", usersSchema)
    assert(client.tableExists("analytics.raw", "users"))
    assert(client.listTables("analytics.raw") == Seq("users"))

    import spark.implicits._
    t = TableOps.append(t, Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val reloaded = client.table("analytics.raw", "users")
    assert(Scan(reloaded, spark).filter(Col("id").gt(1L)).toDF.count() == 1)

    // SQL registration through the client
    client.registerSql(spark, "analytics.raw", "users")
    assert(spark.sql("SELECT name FROM users WHERE id = 2")
      .collect().map(_.getString(0)).toSeq == Seq("b"))

    client.renameTable("analytics.raw", "users", "analytics.raw", "users2")
    assert(client.tableExists("analytics.raw", "users2"))
    client.dropTable("analytics.raw", "users2", purge = true)
    assert(!client.tableExists("analytics.raw", "users2"))
    intercept[TableNotFoundException](client.table("analytics.raw", "users2"))
  }

  test("config defaults mirror the reference (config.go:87-100)") {
    val c = GraftConfig.default
    assert(c.writeMode == GraftConfig.CopyOnWrite)
    assert(c.targetFileSizeBytes == 512L * 1024 * 1024)
    assert(c.maxRetries == 3)
    assert(c.retryBackoffMs == 100L)
  }
}
