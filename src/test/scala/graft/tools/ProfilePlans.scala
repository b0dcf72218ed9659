package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Dev-only: print the optimized plans of the slow vs fast shingle shapes. */
object ProfilePlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("doc_id").as("__id"),
      split(TextAnalysis.normalized(col("text")), " ").as("__toks"))
    val slow = toks
      .select(col("__id"), Dedup.shinglesOfTokens(col("__toks"), 3).as("__grams"))
      .select(col("__id"), explode(col("__grams")).as("g"))
    println("===== SLOW (two-step) optimized =====")
    println(slow.queryExecution.optimizedPlan.treeString.take(4000))
    val fast = toks.select(col("__id"),
      explode(Dedup.shinglesOfTokens(col("__toks"), 3)).as("g"))
    println("===== FAST (fused) optimized =====")
    println(fast.queryExecution.optimizedPlan.treeString.take(4000))
    spark.stop()
  }
}
