package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Dev-only micro-profile of the shingle expression variants. */
object ProfileShingle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime; val n = f
        println(f"$name%-34s iter$i rows=$n%-9d ${(System.nanoTime - t0) / 1e9}%.3f s")
      }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("doc_id").as("__id"),
      split(TextAnalysis.normalized(col("text")), " ").as("__toks"))

    time("A explode(ngrams)") {
      toks.select(col("__id"), explode(TextAnalysis.ngrams(col("__toks"), 3)).as("g")).count()
    }
    time("B explode(shinglesOfTokens)") {
      toks.select(col("__id"), explode(Dedup.shinglesOfTokens(col("__toks"), 3)).as("g")).count()
    }
    val justWhen = when(size(col("__toks")) < 3, array(concat_ws(" ", col("__toks"))))
      .otherwise(TextAnalysis.ngrams(col("__toks"), 3))
    time("C explode(when inline)") {
      toks.select(col("__id"), explode(justWhen).as("g")).count()
    }
    // D: fallback via coalesce-on-empty instead of CASE WHEN
    val viaConcat = concat(TextAnalysis.ngrams(col("__toks"), 3),
      when(size(col("__toks")) < 3, array(concat_ws(" ", col("__toks"))))
        .otherwise(array().cast("array<string>")))
    time("D explode(concat form)") {
      toks.select(col("__id"), explode(viaConcat).as("g")).count()
    }
    spark.stop()
  }
}
