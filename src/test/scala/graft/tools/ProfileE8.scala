package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Dev-only: e8 semantic-dedup cost split and cell balance. */
object ProfileE8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime; val n = f
        println(f"$name%-28s iter$i rows=$n%-9d ${(System.nanoTime - t0) / 1e9}%.3f s")
      }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = emb.agg(max(size(col("embedding")))).head.getInt(0)
    println(s"rows=${emb.count()} dim=$dim")
    def centroid(stride: Int)(cell: Int) = Array.tabulate(dim)(d =>
      (((1103515245L * (stride + cell.toLong * 1000L + d) + 12345L) % 2001L) - 1000L).toDouble / 1000.0)
    val planted = emb.select(col("vec_id"), col("embedding")).unionByName(
      emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    for (cells <- Seq(8, 32, 64)) {
      val ctrs = (0 until cells).map(centroid(131))
      val hist = planted.withColumn("c",
          Similarity.nearestCell(col("embedding"), ctrs))
        .groupBy("c").count().orderBy(desc("count"))
        .collect().map(_.getLong(1))
      println(s"cells=$cells top-sizes=${hist.take(5).mkString(",")} n=${hist.length}")
      time(s"assign cells=$cells") {
        planted.withColumn("c",
          Similarity.nearestCell(col("embedding"), ctrs)).agg(sum("c")).count()
      }
      time(s"semanticDedup cells=$cells") {
        Dedup.semanticDedup(planted, ctrs, 0.95).count()
      }
    }
    spark.stop()
  }
}
