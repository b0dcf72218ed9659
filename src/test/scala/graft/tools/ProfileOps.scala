package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (test scope — never ships): times individual
  * pipeline stages of the heavier bench queries so optimization targets
  * the measured stage, not a guess. Run:
  * sbt "Test/runMain graft.tools.ProfileOps /root/testdata/sf0.1"
  */
object ProfileOps {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime; val n = f
        println(f"$name%-30s iter$i rows=$n%-9d ${(System.nanoTime - t0) / 1e9}%.3f s")
      }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("docs=" + docs.count())
    val bench = docs.where(pmod(col("doc_id"), lit(20)) === 0)

    val toks = docs.select(col("doc_id").as("__id"),
      split(graft.ops.TextAnalysis.normalized(col("text")), " ").as("__toks"))
    time("tokenize only") { toks.select(size(col("__toks"))).agg(sum("size(__toks)")).count() }
    val sh = toks.select(col("__id"),
      graft.ops.Dedup.shinglesOfTokens(col("__toks"), 3).as("__grams"))
    time("shingle explode") { sh.select(explode(col("__grams"))).count() }
    val shd = toks.select(col("__id"),
      array_distinct(graft.ops.Dedup.shinglesOfTokens(col("__toks"), 3)).as("__grams"))
    time("shingle+array_distinct") { shd.select(explode(col("__grams"))).count() }
    time("full d13 overlap") { graft.ops.Contamination.overlap(docs, bench).count() }
    time("full d18 dupNgrams") { graft.ops.Contamination.corpusDupNgrams(docs).count() }
    time("full d6 minhashDedup") { graft.ops.Dedup.minhashDedup(docs, numHashes = 32, bands = 8, threshold = 0.7).count() }
    spark.stop()
  }
}
