package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Retrieval, TextAnalysis}

/** Stage-cost profiler for e13 (BM25) — dev-only. */
object ProfileE13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs  rows=$n")
    }
    println("docs=" + docs.count())
    time("postings")(Retrieval.postings(docs).count())
    time("postings2")(Retrieval.postings(docs).count())
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val probes = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(norm, " "), 1, 4)).as("query"))
    time("full bm25")(Retrieval.bm25TopK(docs, probes, 10).count())
    time("full bm25 x2")(Retrieval.bm25TopK(docs, probes, 10).count())
    val toks = split(TextAnalysis.normalized(col("text")), " ")
    time("explode only")(docs.select(explode(toks)).count())
    time("stats only")(docs.agg(count(lit(1)),
      sum(size(toks).cast("long"))).count())
    spark.stop()
  }
}
