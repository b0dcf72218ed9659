package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `runMain graft.tools.PlanDump <query> <sfDir>`
  * prints the AQE-final executed plan's join/exchange/scan skeleton. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q5_nation_revenue")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.count()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("Aggregate"))
      .map(_.take(140)).mkString("\n"))
    spark.stop()
  }
}
