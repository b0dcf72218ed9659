package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-cost profiler for d41b (index-backed minhash batch dedup) —
  * dev-only, lives in `graft.ops` to reach Dedup's private stages.
  * Reproduces the bench shape: the signature index is pre-built and
  * cached (the warmup pass), then each stage of
  * [[Dedup.indexedMinhashRemovals]] is timed in isolation. */
object ProfileD41 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val index = Dedup.signatureFrame(docs).cache()
    println("index rows=" + index.count())
    val batch = docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text")))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text")))

    // full path, repeated — the bench's timed unit
    time("full run 1")(
      Dedup.indexedMinhashRemovals(batch, index).count())
    time("full run 2")(
      Dedup.indexedMinhashRemovals(batch, index).count())
    time("full run 3")(
      Dedup.indexedMinhashRemovals(batch, index).count())

    // stage isolation (mirrors indexedMinhashRemovals's internals)
    val numHashes = 64; val bands = 16
    val newHs = Dedup.hashedShingleSets(batch, "text", "doc_id").cache()
    time("batch shingle+cache")(newHs.count())
    val sigs = Dedup.signaturesOfHashedSets(newHs, numHashes)
    time("batch signatures")(sigs.count())
    val bandedNew = Dedup.bandExplode(sigs, numHashes, bands).cache()
    time("band batch+cache")(bandedNew.count())
    val idxSig = index.select(col("doc_id").as("__id"),
      col("hs").as("__hs"), col("sig").as("__sig"))
    val bandedIdx = Dedup.bandExplode(
      idxSig.where(col("__sig").isNotNull).select("__id", "__sig"),
      numHashes, bands)
    time("band index")(bandedIdx.count())
    val cands = bandedNew.as("a")
      .join(bandedIdx.unionAll(bandedNew).as("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__bucket") === col("b.__bucket") &&
          col("a.__id") =!= col("b.__id"))
      .select(least(col("a.__id"), col("b.__id")).as("id_a"),
        greatest(col("a.__id"), col("b.__id")).as("id_b"))
      .distinct()
    time("cand join+distinct")(cands.count())
    val pairs = cands.cache(); pairs.count()
    val hsAll = newHs.select("__id", "__hs")
      .unionAll(idxSig.select("__id", "__hs"))
    val edges = pairs
      .join(hsAll.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__hs", "__hs_a"), "id_a")
      .join(hsAll.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__hs", "__hs_b"), "id_b")
      .where(Dedup.jaccard(col("__hs_a"), col("__hs_b")) >= 0.8)
      .select("id_a", "id_b")
    time("verify joins")(edges.count())
    println("--- plans ---")
    cands.explain("formatted")
    spark.stop()
  }
}
