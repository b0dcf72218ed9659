package graft.table

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.catalog.{LocalCatalog, TableIdentifier}
import graft.io.HadoopFileIO
import graft.spec._

class AddFilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(name: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned): Table = {
    val dir = Files.createTempDirectory("graft-af-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name), schema, spec,
      io = new HadoopFileIO())
  }

  private def externalParquet(n: Int): (String, Seq[String]) = {
    val dir = Files.createTempDirectory("graft-ext-").toString
    (0 until n).map(i => (i.toLong, s"user_$i"))
      .toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    (dir, parts)
  }

  private val schema = Schema(0, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "name", StringType, required = false)))

  test("imported files are referenced in place with harvested stats") {
    val (_, parts) = externalParquet(10)
    val t = TableOps.addFiles(freshTable("t1", schema), spark, parts)
    val tasks = Scan(t, spark).planFiles()
    assert(tasks.map(x => DataWriter.normalizePath(x.file.filePath)).toSet
      == parts.map(DataWriter.normalizePath).toSet) // no rewrite, no copy
    val f = tasks.head.file
    assert(f.recordCount == 10L)
    assert(f.lowerBounds.contains(1) && f.upperBounds.contains(1))
    assert(Scan(t, spark).toDF.count() == 10L)
    // harvested bounds must prune like native ones
    assert(Scan(t, spark).filter(Col("id").gt(100L)).planFiles().isEmpty)
  }

  test("re-adding a live file is rejected; explicit opt-out double-counts") {
    val (_, parts) = externalParquet(5)
    val t = TableOps.addFiles(freshTable("t2", schema), spark, parts)
    val ex = intercept[IllegalArgumentException] {
      TableOps.addFiles(t, spark, parts)
    }
    assert(ex.getMessage.contains("already referenced"))
    val t2 = TableOps.addFiles(t, spark, parts, checkDuplicates = false)
    assert(Scan(t2, spark).toDF.count() == 10L)
  }

  test("missing required column fails loud at import time") {
    val withExtra = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "name", StringType, required = false),
      NestedField(3, "score", DoubleType, required = true)))
    val (_, parts) = externalParquet(3)
    val ex = intercept[IllegalArgumentException] {
      TableOps.addFiles(freshTable("t3", withExtra), spark, parts)
    }
    assert(ex.getMessage.contains("score"))
  }

  test("stated identity partition values are cross-checked against " +
      "harvested bounds; stray keys rejected") {
    val spec = PartitionSpec.builder(0).identity(1, "id").build()
    val t0 = freshTable("t5", schema, spec)
    // constant-id file: legal only under the matching stated value
    val dir = Files.createTempDirectory("graft-ext-const-").toString
    Seq((7L, "a"), (7L, "b")).toDF("id", "name")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val wrong = intercept[IllegalArgumentException] {
      TableOps.addFiles(t0, spark, parts, partition = Map("id" -> 9L))
    }
    assert(wrong.getMessage.contains("lies outside"))
    val t = TableOps.addFiles(t0, spark, parts,
      partition = Map("id" -> 7L))
    assert(Scan(t, spark).toDF.count() == 2L)
    // non-constant column can never carry an identity value
    val (_, mixed) = externalParquet(5) // ids 0..4
    val t1 = freshTable("t6", schema, spec)
    val bad = intercept[IllegalArgumentException] {
      TableOps.addFiles(t1, spark, mixed, partition = Map("id" -> 2L))
    }
    assert(bad.getMessage.contains("not") &&
      bad.getMessage.contains("constant"))
    // keys outside the spec fail loud (typos would otherwise embed)
    val t2 = freshTable("t7", schema)
    val stray = intercept[IllegalArgumentException] {
      TableOps.addFiles(t2, spark, parts, partition = Map("typo" -> 1L))
    }
    assert(stray.getMessage.contains("typo"))
  }

  test("partitioned import needs explicit values; tuple recorded + pruned") {
    val spec = PartitionSpec.builder(0).identity(1, "id_part").build()
    val specked = Schema(0, Seq(
      NestedField(1, "bucket_key", LongType, required = false),
      NestedField(2, "name", StringType, required = false)))
    // identity partition on field 1 named id_part
    val t0 = freshTable("t4", specked, spec)
    val (_, parts) = externalParquet(4)
    val ex = intercept[IllegalArgumentException] {
      TableOps.addFiles(t0, spark, parts)
    }
    assert(ex.getMessage.contains("id_part"))
    val t = TableOps.addFiles(t0, spark, parts,
      partition = Map("id_part" -> 7L))
    val tasks = Scan(t, spark).planFiles()
    assert(tasks.forall(_.file.partition.get("id_part").contains(7L)))
  }
}
