package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.{LocalCatalog, TableIdentifier}
import graft.io.HadoopFileIO
import graft.spec.SchemaConverters
import graft.table._

/** Measures the BASELINE.md mutation-path metrics at a given SF:
  * insert→committed snapshot, CoW delete, MoR delete write + read-
  * apply, upsert (~10% match), and planning time with pruning on/off.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.MutationBench"` */
object MutationBench {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val warehouse = Files.createTempDirectory("graft-mbench-").toString
    val cat = new LocalCatalog(warehouse)
    cat.createNamespace(Seq("bench"))
    val io = new HadoopFileIO()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm footers

    // 1. insert -> committed snapshot
    var t = Table.create(cat, TableIdentifier(Seq("bench"), "li"),
      SchemaConverters.fromSparkSchema(li.schema), io = io)
    val (t1, insertSec) = timed { TableOps.append(t, li) }
    t = t1

    // 2. planning time, selective predicate, pruning on
    val pred = Col("l_orderkey").lt(1000L)
    val (planned, planSec) = timed {
      Scan(t, spark).filter(pred).planFiles()
    }
    val (all, _) = timed(Scan(t, spark).planFiles())

    // 3. CoW delete (selective predicate)
    val (t2, cowSec) = timed {
      t.newDelete(spark).where(Col("l_quantity").gt(45.0)).execute()
    }

    // 4. MoR delete write + read-apply
    val (t3, morWriteSec) = timed {
      t2.newDelete(spark).where(Col("l_returnflag").eqTo("R"))
        .withMergeOnRead(true).execute()
    }
    val (nAfter, morReadSec) = timed { Scan(t3, spark).toDF.count() }

    // 5. upsert, ~10% of order keys matched
    val incoming = li.filter(col("l_orderkey") % 10 === 0)
      .withColumn("l_extendedprice", col("l_extendedprice") * 1.01)
    val (t4, upsertSec) = timed {
      t3.newUpsert(spark).withData(incoming)
        .withKeyColumns("l_orderkey", "l_linenumber").execute()
    }

    println(f"""{"sf":"$sfDir","insert_sec":$insertSec%.2f,""" +
      f""""plan_pruned_sec":$planSec%.3f,"pruned_files":${planned.size},""" +
      f""""total_files":${all.size},"cow_delete_sec":$cowSec%.2f,""" +
      f""""mor_delete_write_sec":$morWriteSec%.2f,""" +
      f""""mor_read_apply_sec":$morReadSec%.2f,""" +
      f""""rows_after_deletes":$nAfter,"upsert_sec":$upsertSec%.2f,""" +
      f""""final_snapshots":${t4.metadata.snapshots.size}}""")
    spark.stop()
  }
}
