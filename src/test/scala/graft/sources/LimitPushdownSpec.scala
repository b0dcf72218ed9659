package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.{
  AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Limit pushdown: `SELECT ... LIMIT n` plans only enough files to
  * cover n rows — a LIMIT 10 over a million-file table launches one
  * task. Truncation happens only when file row counts are exact
  * (no filter, no MoR deletes). */
class LimitPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withCatalog(tag: String)(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory(s"graft-lim-$tag-").toString
    val name = s"glim$tag"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    f(name)
  }

  private def scanRows(df: DataFrame): Long = {
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(
      _.metrics("numOutputRows").value).sum
  }

  test("LIMIT plans only enough files") {
    withCatalog("files") { c =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      // 3 snapshots → at least 3 files of 1000 rows each
      (0 until 3).foreach { i =>
        spark.sql(s"INSERT INTO $c.db.t SELECT id + ${i * 1000} " +
          "FROM range(1000)")
      }
      val df = spark.sql(s"SELECT * FROM $c.db.t LIMIT 5")
      assert(df.collect().length == 5)
      // only the first planned file was read, not all 3000 rows
      assert(scanRows(df) <= 1000, s"scan read ${scanRows(df)} rows")

      // limit larger than the table: all rows come back
      assert(spark.sql(s"SELECT * FROM $c.db.t LIMIT 99999")
        .collect().length == 3000)
    }
  }

  test("LIMIT with WHERE or deletes still returns enough rows") {
    withCatalog("guard") { c =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      (0 until 3).foreach { i =>
        spark.sql(s"INSERT INTO $c.db.t SELECT id + ${i * 100} " +
          "FROM range(100)")
      }
      // predicate selective in LATER files: truncation must not apply
      val f = spark.sql(s"SELECT * FROM $c.db.t WHERE id >= 250 LIMIT 20")
      assert(f.collect().length == 20)

      // MoR deletes: first file's recordCount overstates its live rows
      import graft.catalog.{LocalCatalog, TableIdentifier}
      val warehouse = spark.conf.get(s"spark.sql.catalog.$c.warehouse")
      val t = graft.table.Table.load(new LocalCatalog(warehouse),
        TableIdentifier(Seq("db"), "t"), new graft.io.HadoopFileIO())
      graft.table.Mutations.deleteMoR(t, spark,
        graft.table.Col("id") lt 95L)
      val d = spark.sql(s"SELECT * FROM $c.db.t LIMIT 100")
      assert(d.collect().length == 100) // 205 live rows remain
    }
  }
}
