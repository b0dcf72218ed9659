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
