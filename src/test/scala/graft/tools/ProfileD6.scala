package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev-only stage profiler for the d6 minhash pipeline. */
object ProfileD6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime; val n = f
        println(f"$name%-30s iter$i rows=$n%-9d ${(System.nanoTime - t0) / 1e9}%.3f s")
      }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("signatures(32)") {
      Dedup.minhashSignatures(docs, "text", "doc_id", 32).count()
    }
    time("candidates(32,8)") {
      Dedup.minhashCandidates(docs, "text", "doc_id", 32, 8).count()
    }
    time("edges(32,8,0.7)") {
      Dedup.minhashEdges(docs, "text", "doc_id", 32, 8, 0.7,
        emitJaccard = false).count()
    }
    val edges = Dedup.minhashEdges(docs, "text", "doc_id", 32, 8, 0.7,
      emitJaccard = false)
    time("components") {
      Dedup.connectedComponents(edges, docs.select(col("doc_id"))).count()
    }
    time("full minhashDedup") {
      Dedup.minhashDedup(docs, numHashes = 32, bands = 8, threshold = 0.7).count()
    }
    spark.stop()
  }
}
