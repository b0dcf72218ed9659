package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-cost profiler for the round-21 hot bench queries (guide §1):
  * times each sub-stage of e13 (unindexed BM25) and d6 (minhash dedup)
  * in isolation, and counts Spark jobs per full query via a listener.
  * Dev-only measurement tool. */
object MicroStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_MPS").foreach(v => builder.config(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // job counter + per-job trace (id, wall ms, task count, callsite)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val trace = sys.env.contains("GRAFT_JOB_TRACE")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, String, Int)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (trace) jobStart.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("callSite.short"))
              .getOrElse(""),
            j.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (trace) Option(jobStart.remove(j.jobId)).foreach {
            case (t0, cs, nt) =>
              println(f"    [job ${j.jobId}%3d] ${(System.nanoTime() - t0) / 1e6}%7.1f ms  tasks=$nt%-4d $cs")
          }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = stages.incrementAndGet()
      })

    def time(name: String)(f: => Long): Unit = {
      // warmup
      f
      val j0 = jobs.get(); val s0 = stages.get()
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $dt%.3fs  rows=$n  jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
    }

    // ---- full queries
    Seq("e13_bm25", "d6_minhash_dedup", "e20_hybrid_rrf",
        "e8_semantic_dedup", "e22_hybrid_indexed", "e18_bm25_indexed",
        "d41b_indexed_minhash_batch", "d13_contamination",
        "q5_nation_revenue", "d48_unigram_tokenize",
        "d27_dup_passages").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      time(s"FULL $q")(fn(spark, dir).count())
    }

    // ---- e13 stages
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val probes = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(norm, " "), 1, 4)).as("query"))
    val toksC = array_remove(
      split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "), "")
    time("e13 qterms distinct") {
      probes.select(explode(array_distinct(
        array_remove(split(lower(trim(regexp_replace(col("query"),
          "\\s+", " "))), " "), ""))).as("term"))
        .distinct().count()
    }
    time("e13 stats agg") {
      docs.agg(count(lit(1)).as("n"),
        sum(size(toksC).cast("long")).as("dl")).count()
    }
    time("e13 matched+post") {
      val qt = probes.select(explode(array_distinct(
        array_remove(split(lower(trim(regexp_replace(col("query"),
          "\\s+", " "))), " "), ""))).as("term")).distinct()
      docs.select(col("doc_id"), toksC.as("tk"))
        .select(col("doc_id"), explode(col("tk")).as("term"),
          size(col("tk")).cast("long").as("dl"))
        .join(broadcast(qt), "term")
        .groupBy(col("doc_id"), col("term"), col("dl"))
        .agg(count(lit(1)).as("tf")).count()
    }
    time("e13 full bm25TopK") {
      graft.ops.Retrieval.bm25TopK(docs, probes, k = 10).count()
    }

    // ---- d6 stages
    val d = docs.select("doc_id", "text", "lang")
    time("d6 exact() reps") {
      graft.ops.Dedup.exact(d.where(col("text").isNotNull)).count()
    }
    time("d6 minhashEdges") {
      graft.ops.Dedup.minhashEdges(d, "text", "doc_id", 32, 8, 0.7,
        emitJaccard = false).count()
    }
    time("d6 full minhashDedup") {
      graft.ops.Dedup.minhashDedup(d, numHashes = 32, bands = 8,
        threshold = 0.7).count()
    }
    spark.stop()
  }
}
