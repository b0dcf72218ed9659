package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Microbench for tokenization variants over the documents table —
  * guide §1 "measure first" evidence for the round-21 tokenizer work.
  * Times each variant with a hash-fold action (defeats column pruning,
  * no sink cost) and prints a checksum so variants can be proven
  * value-equal before any query adopts them. */
object MicroTok {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")

    // checksum of a token-array column: order-sensitive hash per row,
    // summed — equal arrays => equal sums
    def check(c: Column): Column = bit_xor(xxhash64(c))

    val t = col("text")
    val collapseToks = split(lower(trim(regexp_replace(t, "\\s+", " "))), " ")
    val regexToks = array_remove(split(lower(t), "\\s+"), "")
    // pipeline shape: tokens projected into a bound attribute FIRST,
    // downstream stages reference the attribute (the Dedup.tokenized /
    // Retrieval.postings discipline)
    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "toks collapse" ->
        docs.select(col("doc_id"), collapseToks.as("tk"))
          .agg(check(col("tk"))),
      "toks regexsplit" ->
        docs.select(col("doc_id"), regexToks.as("tk"))
          .agg(check(col("tk"))),
      "hs collapse" ->
        docs.select(col("doc_id"), collapseToks.as("tk"))
          .select(col("doc_id"), array_distinct(transform(
            Dedup3(col("tk")), s => xxhash64(s))).as("hs"))
          .agg(check(col("hs"))),
      "hs regexsplit" ->
        docs.select(col("doc_id"), regexToks.as("tk"))
          .select(col("doc_id"), array_distinct(transform(
            Dedup3(col("tk")), s => xxhash64(s))).as("hs"))
          .agg(check(col("hs"))),
      "postings collapse" -> {
        val tk = array_remove(collapseToks, "")
        val d = docs.select(col("doc_id"), tk.as("tk"))
          .select(col("doc_id"), explode(col("tk")).as("term"),
            size(col("tk")).cast("long").as("dl"))
          .groupBy(col("doc_id"), col("term"), col("dl"))
          .agg(count(lit(1)).as("tf"))
        d.agg(check(struct(col("term"), col("tf"), col("dl"))))
      },
      "postings regexsplit" -> {
        val d = docs.select(col("doc_id"), regexToks.as("tk"))
          .select(col("doc_id"), explode(col("tk")).as("term"),
            size(col("tk")).cast("long").as("dl"))
          .groupBy(col("doc_id"), col("term"), col("dl"))
          .agg(count(lit(1)).as("tf"))
        d.agg(check(struct(col("term"), col("tf"), col("dl"))))
      }
    )

    variants.foreach { case (name, q) =>
      q.collect() // warmup
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val v = q.collect()(0)
        ((System.nanoTime() - t0) / 1e9, v.get(0))
      }
      val med = times.map(_._1).sorted.apply(iters / 2)
      println(f"$name%-22s med=$med%.3fs  checksum=${times.head._2}")
    }
    spark.stop()
  }

  private def Dedup3(toks: Column): Column =
    graft.ops.Dedup.shinglesOfTokens(toks, 3)
}
