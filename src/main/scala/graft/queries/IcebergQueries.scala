package graft.queries

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{LocalCatalog, TableIdentifier}
import graft.io.HadoopFileIO
import graft.spec.SchemaConverters
import graft.table._

/** Queries routed END-TO-END through the Iceberg engine: testdata
  * parquet → create table → append (real manifests, snapshots, stats) →
  * scan (snapshot resolve, pruning, DataFrame assembly). The oracle runs
  * plain SQL over the ORIGINAL parquet, so a hash match proves the whole
  * format layer round-trips data exactly.
  */
object IcebergQueries {

  // one warehouse per JVM; tables built once per (sfDir, variant)
  private lazy val warehouse =
    Files.createTempDirectory("graft-iceberg-wh-").toString
  private val cache = TrieMap[String, Table]()

  private def io = new HadoopFileIO()

  /** lineitem as a single-snapshot Iceberg table. */
  private def lineitemTable(spark: SparkSession, sfDir: String): Table =
    cache.getOrElseUpdate(s"li:$sfDir", {
      val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val cat = new LocalCatalog(warehouse)
      val ns = Seq("sf" + sfDir.replaceAll("[^0-9a-zA-Z]", "_"))
      if (!cat.namespaceExists(ns)) cat.createNamespace(ns)
      val id = TableIdentifier(ns, "lineitem")
      val t = Table.create(cat, id,
        SchemaConverters.fromSparkSchema(df.schema), io = io)
      TableOps.append(t, df)
    })

  /** lineitem split across two snapshots for time travel:
    * snap1 = linenumber <= 3, snap2 adds the rest. */
  private def lineitemTwoSnaps(spark: SparkSession,
      sfDir: String): (Table, Long) = {
    val t = cache.getOrElseUpdate(s"li2:$sfDir", {
      val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val cat = new LocalCatalog(warehouse)
      val ns = Seq("sf2" + sfDir.replaceAll("[^0-9a-zA-Z]", "_"))
      if (!cat.namespaceExists(ns)) cat.createNamespace(ns)
      val id = TableIdentifier(ns, "lineitem")
      var tbl = Table.create(cat, id,
        SchemaConverters.fromSparkSchema(df.schema), io = io)
      tbl = TableOps.append(tbl, df.filter(col("l_linenumber") <= 3))
      TableOps.append(tbl, df.filter(col("l_linenumber") > 3))
    })
    (t, t.metadata.snapshots.head.snapshotId)
  }

  // ------------------------------------------------------------ queries

  private val i1Cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
    "l_returnflag")
  private val i1Expr = Col("l_quantity").gt(45.0)

  def i1ScanFilter(s: SparkSession, dir: String): DataFrame =
    Scan(lineitemTable(s, dir), s)
      .filter(i1Expr)
      .select(i1Cols: _*)
      .toDF.orderBy("l_orderkey", "l_linenumber")

  val i1Sql: String =
    s"""SELECT ${i1Cols.mkString(", ")} FROM lineitem
       |WHERE ${i1Expr.toSql} ORDER BY l_orderkey, l_linenumber""".stripMargin

  private val i2Expr = (Col("l_returnflag").eqTo("A") and
    Col("l_quantity").lte(5.0))
    .or(Col("l_linestatus").eqTo("O") and Col("l_quantity").gte(49.0))

  def i2ComplexPredicate(s: SparkSession, dir: String): DataFrame =
    Scan(lineitemTable(s, dir), s)
      .filter(i2Expr)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_linestatus")
      .toDF.orderBy("l_orderkey", "l_linenumber")

  val i2Sql: String =
    s"""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
       |FROM lineitem WHERE ${i2Expr.toSql}
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  def i3TimeTravel(s: SparkSession, dir: String): DataFrame = {
    val (t, firstSnap) = lineitemTwoSnaps(s, dir)
    Scan(t, s).useSnapshot(firstSnap).toDF
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  val i3Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_linenumber <= 3
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def i4MetadataCount(s: SparkSession, dir: String): DataFrame = {
    val n = Scan(lineitemTable(s, dir), s).count()
    import s.implicits._
    Seq(n).toDF("cnt")
  }

  val i4Sql: String = "SELECT COUNT(*) AS cnt FROM lineitem"

  /** Scan the current snapshot after both appends — proves manifest
    * carry-forward reconstructs the FULL table. */
  def i5MultiSnapshot(s: SparkSession, dir: String): DataFrame = {
    val (t, _) = lineitemTwoSnaps(s, dir)
    Scan(t, s).toDF
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_linestatus")
  }

  val i5Sql: String =
    """SELECT l_linestatus, COUNT(*) AS n FROM lineitem
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "i1_scan_filter" -> (i1ScanFilter _),
    "i2_scan_complex_pred" -> (i2ComplexPredicate _),
    "i3_time_travel" -> (i3TimeTravel _),
    "i4_metadata_count" -> (i4MetadataCount _),
    "i5_multi_snapshot" -> (i5MultiSnapshot _),
  )

  val oracles: Map[String, String] = Map(
    "i1_scan_filter" -> i1Sql,
    "i2_scan_complex_pred" -> i2Sql,
    "i3_time_travel" -> i3Sql,
    "i4_metadata_count" -> i4Sql,
    "i5_multi_snapshot" -> i5Sql,
  )
}
