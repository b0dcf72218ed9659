package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

import graft.{GraftClient, GraftConfig}
import graft.spec._
import graft.table.{Col, Maintenance, Scan, TableOps}

/** Runnable reference-parity walkthrough, mirroring the reference's
  * examples/basic/main.go flow through the top-level client:
  * `sbt "runMain graft.tools.ClientDemo"` */
object ClientDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val client = GraftClient.local(
      Files.createTempDirectory("graft-demo-wh-").toString)
    println(s"[demo] config: writeMode=${client.config.writeMode} " +
      s"targetFileSize=${client.config.targetFileSizeBytes}")

    client.createNamespace("demo.db")
    val schema = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "name", StringType, required = true),
      NestedField(3, "email", StringType, required = false),
      NestedField(4, "created_at", TimestampType, required = true)))
    var t = client.createTable("demo.db", "users", schema)
    println(s"[demo] created: ${client.listTables("demo.db")}")

    // A1 fixture: 10 rows, null email on odd ids
    val rows = (0 until 10).map(i => (i.toLong, s"User$i",
      if (i % 2 == 1) null else s"user$i@example.com",
      new java.sql.Timestamp(1704067200000L + i * 1000)))
      .toDF("id", "name", "email", "created_at")
    t = TableOps.append(t, rows)
    println(s"[demo] scan id>5: " +
      Scan(t, spark).filter(Col("id").gt(5L)).count())
    println(s"[demo] email IS NULL: " +
      Scan(t, spark).filter(Col("email").isNull).count())

    t = t.newDelete(spark).where(Col("id").eqTo(0L)).execute()
    t = t.newUpdate(spark).where(Col("id").eqTo(1L))
      .set("name", "Renamed").execute()
    println(s"[demo] after delete+update: rows=${Scan(t, spark).count()} " +
      s"name(1)=" + Scan(t, spark).filter(Col("id").eqTo(1L))
        .select("name").toDF.head.getString(0))
    println(s"[demo] snapshots=${t.metadata.snapshots.size} " +
      s"history=${t.history.size}")

    t = Maintenance.expireSnapshots(t,
      olderThanMs = System.currentTimeMillis() + 1, retainLast = 1)
    println(s"[demo] after expiry: snapshots=${t.metadata.snapshots.size} " +
      s"rows=${Scan(t, spark).count()}")

    intercept(client)
    spark.stop()
  }

  private def intercept(client: GraftClient): Unit =
    try { client.table("demo.db", "missing"); println("[demo] UNEXPECTED") }
    catch { case _: graft.TableNotFoundException =>
      println("[demo] missing table -> TableNotFoundException (as iceberg.go)")
    }
}
