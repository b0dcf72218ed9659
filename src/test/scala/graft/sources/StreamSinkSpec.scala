package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.catalog.{LocalCatalog, TableIdentifier}
import graft.io.HadoopFileIO
import graft.spec._
import graft.table._

/** `writeStream.format("graft")` — the native sink (v1 Sink with
  * epoch-idempotent snapshot commits). */
class StreamSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val schema = Schema(0, Seq(
    NestedField(1, "event_id", LongType, required = true),
    NestedField(2, "user_id", LongType, required = true),
    NestedField(3, "value", DoubleType, required = true)))

  private def mkTable(name: String): (Table, String) = {
    val dir = Files.createTempDirectory(s"graft-sink-$name-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    val t = Table.create(cat, TableIdentifier(Seq("db"), name),
      schema, io = new HadoopFileIO())
    (t, dir)
  }

  private def loadTable(dir: String, name: String): Table =
    Table.load(new LocalCatalog(dir), TableIdentifier(Seq("db"), name),
      new HadoopFileIO())

  private def sinkWriter(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String) =
    df.writeStream.format("graft")
      .option("warehouse", dir).option("namespace", "db")
      .option("table", name)
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sink-ckpt-$name-").toString)

  test("branch option: micro-batches land on the branch, main untouched") {
    import spark.implicits._
    val (_, dir) = mkTable("wbr")
    val input = MemoryStream[(Long, Long, Double)]
    // empty table: the first branch micro-batch creates the ref
    val q = sinkWriter(
      input.toDF().toDF("event_id", "user_id", "value"), dir, "wbr")
      .option("branch", "audit")
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, 1.0), (2L, 2L, 2.0))
      q.processAllAvailable()
      // a main append BETWEEN micro-batches must not leak either way
      graft.table.TableOps.append(loadTable(dir, "wbr"),
        Seq((100L, 1L, 1.0)).toDF("event_id", "user_id", "value"))
      input.addData((3L, 0L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val t = loadTable(dir, "wbr")
    val onBranch = Scan(t.forBranch("audit"), spark).toDF
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(onBranch == Set(1L, 2L, 3L),
      s"branch must hold exactly the streamed rows, got $onBranch")
    val onMain = Scan(t, spark).toDF
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(onMain == Set(100L), s"main must hold only its append, got $onMain")
  }

  test("writeStream append lands one snapshot per micro-batch") {
    import spark.implicits._
    val (_, dir) = mkTable("w1")
    val input = MemoryStream[(Long, Long, Double)]
    val q = sinkWriter(
      input.toDF().toDF("event_id", "user_id", "value"), dir, "w1")
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, 1.0), (2L, 2L, 2.0))
      q.processAllAvailable()
      input.addData((3L, 0L, 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val t = loadTable(dir, "w1")
    val ids = Scan(t, spark).toDF.select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L))
    // one append snapshot per non-empty batch, each carrying the
    // stream watermark
    val snaps = t.metadata.snapshots
    assert(snaps.size == 2, s"expected 2 snapshots, got ${snaps.size}")
    assert(snaps.forall(_.summary.exists(
      _.extra.contains(GraftStreamSinkV1.StreamIdKey))))
  }

  test("replayed batch is skipped (exactly-once across restart)") {
    import spark.implicits._
    val (t0, dir) = mkTable("w2")
    val sink = new GraftStreamSinkV1(t0, streamId = "test-stream",
      complete = false)
    val batch = Seq((1L, 1L, 1.0), (2L, 2L, 2.0))
      .toDF("event_id", "user_id", "value")
    sink.addBatch(0L, batch)
    // crash-between-commit-and-offset-write replays the same epoch
    sink.addBatch(0L, batch)
    sink.addBatch(1L, Seq((3L, 3L, 3.0))
      .toDF("event_id", "user_id", "value"))
    val t = loadTable(dir, "w2")
    assert(Scan(t, spark).toDF.count() == 3,
      "replayed epoch 0 must not duplicate rows")
    assert(t.metadata.snapshots.size == 2)
  }

  test("complete mode overwrites table content each batch") {
    import spark.implicits._
    val (_, dir) = mkTable("w3")
    val input = MemoryStream[(Long, Long, Double)]
    // streaming agg: counts per user — Complete rewrites the table
    val agg = input.toDF().toDF("event_id", "user_id", "value")
      .groupBy("user_id")
      .agg(count(lit(1)).as("event_id"), sum("value").as("value"))
      .select(col("event_id"), col("user_id"),
        col("value").cast("double").as("value"))
    val q = sinkWriter(agg, dir, "w3").outputMode("complete").start()
    try {
      input.addData((1L, 7L, 1.0), (2L, 7L, 2.0), (3L, 8L, 4.0))
      q.processAllAvailable()
      input.addData((4L, 7L, 10.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = Scan(loadTable(dir, "w3"), spark).toDF
      .orderBy("user_id").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    assert(rows.toSeq == Seq((7L, 3L, 13.0), (8L, 1L, 4.0)),
      s"complete mode shows only the latest agg state, got ${rows.toSeq}")
  }

  test("graft-to-graft: readStream source into writeStream sink") {
    import spark.implicits._
    val (src0, dir) = mkTable("w4src")
    val (_, dirDst) = mkTable("w4dst")
    var src = TableOps.append(src0,
      Seq((1L, 1L, 1.0), (2L, 2L, 2.0))
        .toDF("event_id", "user_id", "value"))

    val q = sinkWriter(
      spark.readStream.format("graft")
        .option("warehouse", dir).option("namespace", "db")
        .option("table", "w4src").load(),
      dirDst, "w4dst")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      src = TableOps.append(src,
        Seq((3L, 1L, 3.0)).toDF("event_id", "user_id", "value"))
      q.processAllAvailable()
    } finally q.stop()

    val srcRows = Scan(src.refresh(), spark).toDF
      .select("event_id").collect().map(_.getLong(0)).toSet
    val dstRows = Scan(loadTable(dirDst, "w4dst"), spark).toDF
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(dstRows == srcRows && dstRows == Set(1L, 2L, 3L),
      s"end-to-end pipe parity, got $dstRows")
  }

  test("update mode is rejected with an actionable message") {
    import spark.implicits._
    val (_, dir) = mkTable("w5")
    val input = MemoryStream[(Long, Long, Double)]
    val e = intercept[Exception] {
      sinkWriter(input.toDF().toDF("event_id", "user_id", "value"),
        dir, "w5")
        .outputMode("update").start()
    }
    assert(e.getMessage.contains("upsert") ||
      Option(e.getCause).exists(_.getMessage.contains("upsert")),
      s"expected the upsert pointer, got: ${e.getMessage}")
  }

  test("sink aligns query column order and types by name") {
    import spark.implicits._
    val (_, dir) = mkTable("w6")
    val input = MemoryStream[(Int, Int, Int)]
    // columns intentionally out of order and integer-typed
    val q = sinkWriter(
      input.toDF().toDF("value", "user_id", "event_id"), dir, "w6")
      .outputMode("append").start()
    try {
      input.addData((10, 2, 1))
      q.processAllAvailable()
    } finally q.stop()
    val r = Scan(loadTable(dir, "w6"), spark).toDF.collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(2) == 10.0,
      s"name-aligned, cast write, got $r")
  }
}
