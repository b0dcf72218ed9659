package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Dev-only micro-profiler for minhash signature variants. The
  * per-seed re-mix goes through `Dedup.mixHash` (package-private), so
  * the profiled expression tracks production if the mix changes. */
object ProfileSig {
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
    def tokenized: DataFrame = docs.select(col("doc_id").as("__id"),
      split(TextAnalysis.normalized(col("text")), " ").as("__toks"))

    // (a) old shape: explode string shingles, hash per row
    time("a_explode_strings_then_hash") {
      val exploded = tokenized
        .select(col("__id"), explode(Dedup.shinglesOfTokens(col("__toks"))).as("__s"))
        .select(col("__id"), xxhash64(col("__s")).as("__h"))
      val aggs = (0 until 32).map(k => min(Dedup.mixHash(col("__h"), k)).as(s"__h$k"))
      exploded.groupBy("__id").agg(aggs.head, aggs.tail: _*).count()
    }
    // (b) hashed-set shape, no distinct
    time("b_transform_hash_no_distinct") {
      val hs = tokenized.select(col("__id"),
        transform(Dedup.shinglesOfTokens(col("__toks")), s => xxhash64(s)).as("__hs"))
      val exploded = hs.select(col("__id"), explode(col("__hs")).as("__h"))
      val aggs = (0 until 32).map(k => min(Dedup.mixHash(col("__h"), k)).as(s"__h$k"))
      exploded.groupBy("__id").agg(aggs.head, aggs.tail: _*).count()
    }
    // (c) hashed-set shape with distinct (current)
    time("c_transform_hash_distinct") {
      val hs = tokenized.select(col("__id"),
        array_distinct(transform(Dedup.shinglesOfTokens(col("__toks")),
          s => xxhash64(s))).as("__hs"))
      val exploded = hs.select(col("__id"), explode(col("__hs")).as("__h"))
      val aggs = (0 until 32).map(k => min(Dedup.mixHash(col("__h"), k)).as(s"__h$k"))
      exploded.groupBy("__id").agg(aggs.head, aggs.tail: _*).count()
    }
    // (d) shingle projection barrier then distinct+hash
    time("d_project_shingles_then_hash") {
      val sh = tokenized.select(col("__id"),
        Dedup.shinglesOfTokens(col("__toks")).as("__shs"))
      val hs = sh.select(col("__id"),
        array_distinct(transform(col("__shs"), s => xxhash64(s))).as("__hs"))
      val exploded = hs.select(col("__id"), explode(col("__hs")).as("__h"))
      val aggs = (0 until 32).map(k => min(Dedup.mixHash(col("__h"), k)).as(s"__h$k"))
      exploded.groupBy("__id").agg(aggs.head, aggs.tail: _*).count()
    }
    val hsPlan = tokenized.select(col("__id"),
      array_distinct(transform(Dedup.shinglesOfTokens(col("__toks")),
        s => xxhash64(s))).as("__hs"))
      .select(col("__id"), explode(col("__hs")).as("__h"))
    hsPlan.explain("formatted")
    spark.stop()
  }
}
