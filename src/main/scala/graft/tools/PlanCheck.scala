package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: dump formatted plans for the headline queries so pushdown,
  * broadcast choice, and WholeStageCodegen coverage are inspectable
  * (the "explain and iterate" loop the builder brief requires). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    names.foreach { name =>
      println(s"\n===================== $name =====================")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
