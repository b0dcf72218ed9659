package graft.table

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.catalog._
import graft.io.HadoopFileIO
import graft.spec._

/** Z-order rewrite: files must become prunable on EVERY clustered
  * column — the property a linear sort cannot deliver. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val gridSchema = Schema(0, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "x", LongType, required = false),
    NestedField(3, "y", LongType, required = false)))

  private def freshTable(name: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned): Table = {
    val dir = Files.createTempDirectory("graft-zo-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name), schema, spec,
      io = new HadoopFileIO())
  }

  /** 32×32 uniform grid, shuffled so the input file has full-range
    * bounds on both axes. */
  private def gridDf: DataFrame = {
    import spark.implicits._
    scala.util.Random.shuffle((0L until 1024L).toList)
      .map(i => (i, i % 32, i / 32)).toDF("id", "x", "y")
  }

  test("zorder rewrite makes BOTH columns prunable") {
    var t = freshTable("grid", gridSchema)
    t = TableOps.append(t, gridDf.coalesce(1))
    val bytes = Scan(t, spark).planFiles().map(_.file.fileSizeInBytes).sum

    t = Maintenance.zorderRewrite(t, spark, Seq("x", "y"),
      targetFileSizeBytes = math.max(1L, bytes / 16))
    val total = Scan(t, spark).planFiles().size
    assert(total >= 8, s"rewrite must split into many files, got $total")
    assert(t.currentSnapshot.get.summary.get.operation == Operation.Replace)

    val xPruned = Scan(t, spark)
      .filter(Col("x").between(0L, 3L)).planFiles().size
    val yPruned = Scan(t, spark)
      .filter(Col("y").between(0L, 3L)).planFiles().size
    assert(xPruned <= total / 2,
      s"x-filter must prune files: $xPruned of $total")
    assert(yPruned <= total / 2,
      s"y-filter must prune files: $yPruned of $total")

    // and the data survives byte-for-byte
    val ids = Scan(t, spark).toDF.select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == (0L until 1024L).toSet)
  }

  test("zorder on a partitioned table clusters within partitions " +
      "and absorbs MoR deletes") {
    val schema = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "cat", StringType, required = false),
      NestedField(3, "x", LongType, required = false),
      NestedField(4, "y", LongType, required = false)))
    val spec = PartitionSpec.builder(0).identity(2, "cat").build()
    var t = freshTable("pgrid", schema, spec)
    import spark.implicits._
    val df = scala.util.Random.shuffle((0L until 512L).toList)
      .map(i => (i, if (i % 2 == 0) "a" else "b", i % 16, i / 32))
      .toDF("id", "cat", "x", "y")
    t = TableOps.append(t, df)
    t = Mutations.deleteMoR(t, spark, Col("id").eqTo(100L))
    assert(Scan(t, spark).planFiles().exists(_.deleteFiles.nonEmpty))

    t = Maintenance.zorderRewrite(t, spark, Seq("x", "y"))
    // partition layout intact, deletes absorbed
    val tasks = Scan(t, spark).planFiles()
    assert(tasks.forall(_.deleteFiles.isEmpty), "deletes must be absorbed")
    assert(tasks.map(_.file.partition("cat")).toSet == Set("a", "b"))
    val ids = Scan(t, spark).toDF.select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == (0L until 512L).toSet - 100L)
  }

  test("4-column zorder keeps every column prunable (effBits sign-bit guard)") {
    // 4 columns force effBits = 63/4 = 15: without the truncation, the
    // 4th column's MSB lands on bit 63 (b*k+i = 15*4+3) and flips the
    // sign of the Morton key, inverting its coarsest split. An 8^4 grid
    // exercises the path; each axis filter must still prune.
    val schema = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "a", LongType, required = false),
      NestedField(3, "b", LongType, required = false),
      NestedField(4, "c", LongType, required = false),
      NestedField(5, "d", LongType, required = false)))
    var t = freshTable("grid4", schema)
    import spark.implicits._
    val df = scala.util.Random.shuffle((0L until 4096L).toList)
      .map(i => (i, i % 8, (i / 8) % 8, (i / 64) % 8, i / 512))
      .toDF("id", "a", "b", "c", "d")
    t = TableOps.append(t, df.coalesce(1))
    val bytes = Scan(t, spark).planFiles().map(_.file.fileSizeInBytes).sum
    t = Maintenance.zorderRewrite(t, spark, Seq("a", "b", "c", "d"),
      targetFileSizeBytes = math.max(1L, bytes / 16))
    val total = Scan(t, spark).planFiles().size
    assert(total >= 8, s"rewrite must split into many files, got $total")
    for (cn <- Seq("a", "b", "c", "d")) {
      val pruned = Scan(t, spark)
        .filter(Col(cn).between(0L, 1L)).planFiles().size
      assert(pruned <= total / 2,
        s"$cn-filter must prune files: kept $pruned of $total")
    }
    // sign-bit inversion would scramble which rows co-locate; the data
    // itself must survive regardless
    val ids = Scan(t, spark).toDF.select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == (0L until 4096L).toSet)
  }

  test("partitioned zorder splits each partition at the target size " +
      "with tight per-file ranges") {
    val schema = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "cat", StringType, required = false),
      NestedField(3, "x", LongType, required = false),
      NestedField(4, "y", LongType, required = false)))
    val spec = PartitionSpec.builder(0).identity(2, "cat").build()
    var t = freshTable("psplit", schema, spec)
    import spark.implicits._
    val df = scala.util.Random.shuffle((0L until 2048L).toList)
      .map(i => (i, if (i % 2 == 0) "a" else "b", i % 32, (i / 32) % 32))
      .toDF("id", "cat", "x", "y")
    t = TableOps.append(t, df)
    val bytes = Scan(t, spark).planFiles().map(_.file.fileSizeInBytes).sum
    t = Maintenance.zorderRewrite(t, spark, Seq("x", "y"),
      targetFileSizeBytes = math.max(1L, bytes / 8))

    val tasks = Scan(t, spark).planFiles()
    val byPart = tasks.groupBy(_.file.partition("cat"))
    assert(byPart.keySet == Set("a", "b"))
    byPart.foreach { case (cat, fs) =>
      assert(fs.size > 1,
        s"partition $cat must split into multiple files, got ${fs.size}")
    }
    // maxRecordsPerFile actually bounded the files (no giant catch-all)
    val maxRecs = tasks.map(_.file.recordCount).max
    assert(maxRecs <= 2048 / 8 * 2,
      s"per-file record count must respect the target split, got $maxRecs")
    // intra-partition z-sort gives tight per-file ranges: an x-filter
    // must prune files WITHIN partitions, not just across them (with
    // ~5 z-chunks per partition the per-file x-bounds are wide, so the
    // bar is "some intra-partition pruning", not a fixed ratio)
    val total = tasks.size
    val pruned = Scan(t, spark)
      .filter(Col("x").between(0L, 1L)).planFiles().size
    assert(pruned <= total - 2,
      s"x-filter must prune within partitions: kept $pruned of $total")
    val ids = Scan(t, spark).toDF.select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == (0L until 2048L).toSet)
  }

  test("string and timestamp columns quantize without error") {
    val schema = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "name", StringType, required = false),
      NestedField(3, "ts", TimestampType, required = false)))
    var t = freshTable("mix", schema)
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"${('a' + (i % 26).toInt).toChar}$i",
      new java.sql.Timestamp(1704067200000L + i * 60000L)))
      .toDF("id", "name", "ts")
    t = TableOps.append(t, df.coalesce(1))
    val bytes = Scan(t, spark).planFiles().map(_.file.fileSizeInBytes).sum
    t = Maintenance.zorderRewrite(t, spark, Seq("name", "ts"),
      targetFileSizeBytes = math.max(1L, bytes / 4))
    assert(Scan(t, spark).toDF.count() == 200)
  }
}
