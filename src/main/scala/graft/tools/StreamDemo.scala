package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.{LocalCatalog, TableIdentifier}
import graft.io.HadoopFileIO
import graft.spec._
import graft.streaming.Streams
import graft.table._

/** Runnable streaming demo: feeds three micro-batches through a real
  * StreamingQuery into the Iceberg foreachBatch sink, then reads the
  * table back (current + time travel) and runs the windowed rollup.
  * `sbt "runMain graft.tools.StreamDemo"` */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("graft-streamdemo-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    val schema = Schema(0, Seq(
      NestedField(1, "event_id", LongType, required = true),
      NestedField(2, "user_id", LongType, required = true),
      NestedField(3, "value", DoubleType, required = true)))
    val table = Table.create(cat, TableIdentifier(Seq("db"), "events"),
      schema, io = new HadoopFileIO())
    val sink = Streams.icebergSink(table)

    val input = MemoryStream[(Long, Long, Double)]
    val q = input.toDF().toDF("event_id", "user_id", "value")
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.addBatch(df, id))
      .start()
    try {
      for (batch <- 1 to 3) {
        input.addData((1 to 4).map(i =>
          ((batch * 10 + i).toLong, (i % 2).toLong, i * 1.0)): _*)
        q.processAllAvailable()
        val t = sink.table
        println(s"[demo] after batch $batch: snapshots=" +
          s"${t.metadata.snapshots.size} rows=${Scan(t, spark).count()}")
      }
    } finally q.stop()

    val t = sink.table
    println("[demo] summary of last snapshot: " +
      t.currentSnapshot.get.summary.get.counters.toSeq.sorted.mkString(", "))
    val firstSnap = t.metadata.snapshots.head
    println(s"[demo] time travel to first snapshot: rows=" +
      s"${Scan(t, spark).useSnapshot(firstSnap.snapshotId).toDF.count()}")
    println(s"[demo] per-user totals: " +
      Scan(t, spark).toDF.groupBy("user_id").agg(sum("value").as("v"))
        .orderBy("user_id").collect().mkString(" "))
    spark.stop()
  }
}
