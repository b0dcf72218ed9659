package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes `explain("formatted")` for bench queries to files — the
  * round's plan evidence (`plans/r<N>/<query>_<tag>.txt`).
  *
  * `runMain graft.tools.PlanExplain <outDir> <tag> [query ...]`
  * (no query args = the full bench set). Sessions mirror the bench
  * config (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE on)
  * so the captured initial plans match what the bench runs. */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val tag = args.lift(1).getOrElse("before")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.benchQueries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // executed once so memoized index builds (e17/e18/d41) are warm
      // and the plan captured is the steady-state one the bench times
      df.count()
      val df2 = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df2.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $name")
    }
    spark.stop()
  }
}
