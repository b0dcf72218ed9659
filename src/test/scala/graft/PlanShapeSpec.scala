package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ShuffleExchangeExec}

/** Plan-SHAPE regression guards: the correctness gate can't see a
  * query that silently gained a shuffle or lost a broadcast — these
  * assert the structural properties the 100 TB design depends on.
  * AQE is disabled around planning so the static plan is inspected
  * (AQE only ever REMOVES exchanges at runtime, so a static bound is
  * a safe upper bound). */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def staticPlan(name: String): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
  private def shuffles(p: SparkPlan): Int =
    p.collect { case e: ShuffleExchangeExec => e }.size
  private def broadcasts(p: SparkPlan): Int =
    p.collect { case e: BroadcastExchangeExec => e }.size

  test("d10 stratified sample: one stratum shuffle + the final sort") {
    val p = staticPlan("d10_stratified_sample")
    assert(shuffles(p) <= 2,
      s"stratified sampling must not gain shuffles, got ${shuffles(p)}:\n$p")
  }

  test("d2 text stats: per-row pipeline, only the output sort shuffles") {
    val p = staticPlan("d2_text_stats")
    assert(shuffles(p) <= 1,
      s"per-row stats must not shuffle data, got ${shuffles(p)}:\n$p")
  }

  test("e1 brute-force ANN: query side broadcast, corpus never " +
      "pre-shuffled") {
    val p = staticPlan("e1_ann_bruteforce")
    assert(broadcasts(p) >= 1,
      s"the query set must broadcast (corpus scans once):\n$p")
    // window top-k + output sort are the only legitimate shuffles
    assert(shuffles(p) <= 2,
      s"the corpus must not shuffle before scoring, got ${shuffles(p)}:\n$p")
  }

  test("d44 mixture sample: quotas broadcast, one stratum shuffle " +
      "+ the output sort") {
    val p = staticPlan("d44_mixture_sample")
    assert(broadcasts(p) >= 1,
      s"the model-sized quota table must broadcast:\n$p")
    assert(shuffles(p) <= 2,
      s"mixture take is one stratum window, got ${shuffles(p)}:\n$p")
  }

  test("d45 budget sample: one stratum shuffle + the output sort") {
    val p = staticPlan("d45_budget_sample")
    assert(shuffles(p) <= 2,
      s"budget cut is one running-sum window, got ${shuffles(p)}:\n$p")
  }

  test("e20 hybrid RRF: both retrievers keep their broadcast shapes; " +
      "fusion never joins the corpus") {
    val p = staticPlan("e20_hybrid_rrf")
    // bm25's query-idf broadcast + brute-force's query broadcast
    assert(broadcasts(p) >= 2,
      s"both query sides must broadcast:\n$p")
    assert(p.collect { case n if
      n.nodeName.contains("CartesianProduct") => n }.isEmpty,
      s"no non-broadcast cartesian anywhere:\n$p")
  }

  test("e22 indexed hybrid: both query sides broadcast, no cartesian " +
      "— neither retriever rescans a corpus inside the fusion") {
    val p = staticPlan("e22_hybrid_indexed")
    // bm25FromIndex's qterms/qidf broadcasts + the probed-query
    // broadcast into the cell join
    assert(broadcasts(p) >= 2,
      s"both query sides must broadcast:\n$p")
    assert(p.collect { case n if
      n.nodeName.contains("CartesianProduct") => n }.isEmpty,
      s"no non-broadcast cartesian anywhere:\n$p")
  }

  test("d42 trigram LM: dictionaries join as equi-joins — no " +
      "cartesian, the corpus-stats single row broadcasts") {
    val p = staticPlan("d42_trigram_backoff")
    assert(broadcasts(p) >= 1,
      s"the 1-row total-count aggregate must broadcast:\n$p")
    assert(p.collect { case n if
      n.nodeName.contains("CartesianProduct") => n }.isEmpty,
      s"gram scoring must stay equi-join shaped:\n$p")
  }

  test("d46 unigram vocab: no unpartitioned WindowExec — the top-V " +
      "cut is TakeOrderedAndProject, never a single-partition window") {
    val p = staticPlan("d46_unigram_vocab")
    val globalWindows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"vocab cut must not serialize through one partition:\n$p")
  }

  test("d27 dup passages: ONE corpus scan — occurrence counts are " +
      "window functions over the hash exchange, not a self-join (r22)") {
    val p = staticPlan("d27_dup_passages")
    val scans = p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1,
      s"dup-passage marking must tokenize the corpus once, got " +
        s"${scans.size} scans:\n$p")
    // 3 WindowExec nodes exactly: the fused count+first marker over
    // the hash exchange, plus the two inherently-dependent span-merge
    // windows (prev-end feeds the span counter)
    val wins = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.size == 3,
      s"marking must fuse count+first into one WindowExec " +
        s"(3 total), got ${wins.size}:\n$p")
  }

  test("d48 unigram tokenize: dictionary-sized DP, corpus touched by " +
      "equi-joins only") {
    val p = staticPlan("d48_unigram_tokenize")
    assert(p.collect { case n if
      n.nodeName.contains("CartesianProduct") ||
      n.nodeName.contains("BroadcastNestedLoop") => n }.isEmpty,
      s"word-pieces deployment must stay equi-join shaped:\n$p")
  }

  test("e15 PQ-ADC ANN: codebook distance tables broadcast with the " +
      "queries, corpus never pre-shuffled") {
    val p = staticPlan("e15_pq_adc_verify")
    assert(broadcasts(p) >= 1,
      s"the query set (with its ADC tables) must broadcast:\n$p")
    // window top-k + output sort are the only legitimate shuffles
    assert(shuffles(p) <= 2,
      s"the corpus must not shuffle before ADC scoring, got ${shuffles(p)}:\n$p")
  }

  test("e17 indexed IVF: probed queries broadcast into the cell join, " +
      "the index read never shuffles before scoring") {
    val p = staticPlan("e17_ivf_indexed_search")
    assert(broadcasts(p) >= 1,
      s"the probed query set must broadcast (index side scans once):\n$p")
    // window top-k + output sort are the only legitimate shuffles
    assert(shuffles(p) <= 2,
      s"the probed-cells read must not shuffle, got ${shuffles(p)}:\n$p")
  }

  test("e18 indexed BM25: query terms broadcast-filter the postings " +
      "read; only matched postings ever shuffle") {
    val p = staticPlan("e18_bm25_indexed")
    // qterms into the load filter, stats + qidf into the score joins
    assert(broadcasts(p) >= 2,
      s"query-side frames must broadcast (postings scan once):\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no cartesian anywhere:\n$p")
    // df agg + per-doc score agg + top-k window + output sort: every
    // shuffle moves only query-term-matched postings, never the corpus
    assert(shuffles(p) <= 5,
      s"only matched postings may shuffle, got ${shuffles(p)}:\n$p")
  }

  test("e19 composed IVF+PQ: probed queries (with ADC tables) " +
      "broadcast, the encoded corpus never shuffles before ranking") {
    val p = staticPlan("e19_ivfpq_compose")
    assert(broadcasts(p) >= 1,
      s"the probed query set must broadcast into the cell join:\n$p")
    // window top-k + output sort are the only legitimate shuffles
    assert(shuffles(p) <= 2,
      s"the corpus must not shuffle before ADC, got ${shuffles(p)}:\n$p")
  }

  test("d34 quality classifier: the weight model broadcasts — the " +
      "corpus never shuffles on a feature key") {
    val p = staticPlan("d34_quality_classifier")
    assert(broadcasts(p) >= 1,
      s"the <=65536-row model must broadcast into the scoring join:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no cartesian anywhere:\n$p")
  }

  test("d35 domain counts: one domain-key aggregation + output sort") {
    val p = staticPlan("d35_domain_counts")
    // partial agg is map-side; distinct-doc count adds one expand pass
    assert(shuffles(p) <= 3,
      s"domain profile must be one scan + domain-key agg, got ${shuffles(p)}:\n$p")
  }

  test("e6 sessionization: both windows + rollup share ONE user-key " +
      "shuffle (plus the output sort)") {
    val p = staticPlan("e6_sessionize")
    assert(shuffles(p) <= 2,
      s"sessionization must reuse the user-key Exchange, got ${shuffles(p)}:\n$p")
  }

  test("d14 temperature sample: count and rank share ONE stratum " +
      "shuffle (plus the output sort)") {
    val p = staticPlan("d14_temperature_sample")
    // per-stratum count rides the same window partitioning as the
    // rank — no aggregate/join side-trip, no broadcast needed
    assert(shuffles(p) <= 2,
      s"temperature sampling gained a shuffle, got ${shuffles(p)}:\n$p")
  }

  test("d13 contamination: gram join, never a cartesian product") {
    val p = staticPlan("d13_contamination")
    assert(!p.toString.contains("CartesianProduct"),
      s"contamination must join on the gram key:\n$p")
  }

  test("d13 contamination: the tokenizer split never lands inside a " +
      "scan-side Filter (the InferFiltersFromGenerate re-eval trap)") {
    // regression guard for the 8x d13 fix: an inferred size(grams) > 0
    // filter over an ALIASED gram column gets the whole shingle tree
    // (inline tokenizer inside the HOF lambda) substituted and pushed
    // to the scan, where it re-evaluates per gram element
    val p = staticPlan("d13_contamination")
    val badFilter = p.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("regexp_replace") => f
    }
    assert(badFilter.isEmpty,
      s"shingle expression leaked into a Filter:\n${badFilter.headOption}")
  }

  test("e8 semantic dedup: cell self-join + anti-join only, no " +
      "cartesian pairing") {
    val p = staticPlan("e8_semantic_dedup")
    assert(!p.toString.contains("CartesianProduct"),
      s"semantic dedup must pair within cells via the cell key:\n$p")
  }

  test("d18 dup-ngrams: gram-key joins with map-side partial counts") {
    val p = staticPlan("d18_dup_ngrams")
    assert(!p.toString.contains("CartesianProduct"),
      s"dup-ngram profiling must join on the gram key:\n$p")
    assert(p.toString.contains("partial"),
      s"d18 lost map-side partial aggregation:\n$p")
  }

  test("e9 quantization: pure per-row pipeline — only the output sort " +
      "may exchange") {
    val p = staticPlan("e9_quantize_int8")
    assert(shuffles(p) <= 1,
      s"quantization must not shuffle data, got ${shuffles(p)}:\n$p")
  }

  test("d23 line dedup: fingerprint-key join with map-side partial " +
      "counts, never a cartesian pairing") {
    val p = staticPlan("d23_line_dedup")
    assert(!p.toString.contains("CartesianProduct"),
      s"line dedup must join on the line fingerprint:\n$p")
    assert(p.toString.contains("partial"),
      s"d23 lost map-side partial aggregation on the banned-set count:\n$p")
  }

  test("d24 bigram surprise: gram-key join + per-doc partial agg, no " +
      "cartesian product") {
    val p = staticPlan("d24_bigram_surprise")
    assert(!p.toString.contains("CartesianProduct"),
      s"LM scoring must join occurrences to counts on the gram key:\n$p")
    assert(p.toString.contains("partial"),
      s"d24 lost map-side partial aggregation:\n$p")
  }

  test("d34 classifier: the ≤65k-bucket model broadcasts — the " +
      "corpus is never shuffled on a feature key for scoring") {
    val p = staticPlan("d34_quality_classifier")
    assert(broadcasts(p) >= 1,
      s"the bounded weight model must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"scoring must join on the bucket key:\n$p")
    assert(p.toString.contains("partial"),
      s"d34 lost map-side partial aggregation:\n$p")
  }

  test("d42 trigram LM: dictionary joins are gram-key equi-joins " +
      "(the 1-row token total broadcasts); per-doc agg stays partial") {
    val p = staticPlan("d42_trigram_backoff")
    assert(broadcasts(p) >= 1,
      s"the single-row train-token total must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"backoff scoring must join occurrences on gram keys:\n$p")
    assert(p.toString.contains("partial"),
      s"d42 lost map-side partial aggregation:\n$p")
  }

  test("e13 BM25: query terms broadcast — the corpus postings are " +
      "never shuffled for scoring") {
    val p = staticPlan("e13_bm25")
    assert(broadcasts(p) >= 1,
      s"the idf-attached query-term set must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"BM25 must join postings on the term key:\n$p")
  }

  test("d27 exact-substring dedup: window-hash joins with partial " +
      "counts, never pairwise") {
    val p = staticPlan("d27_dup_passages")
    assert(!p.toString.contains("CartesianProduct"),
      s"passage detection must join on the window hash:\n$p")
    assert(p.toString.contains("partial"),
      s"d27 lost map-side partial aggregation on window counts:\n$p")
  }

  test("d28 importance weights: the feature model broadcasts — the " +
      "corpus is never shuffled on a feature key for scoring") {
    val p = staticPlan("d28_dsir_weights")
    assert(broadcasts(p) >= 1, s"the bounded model must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"scoring must join on the bucket key:\n$p")
  }

  test("d39 BPE dict tokenization: dictionary equi-joins only, no " +
      "cartesian/NLJ pairing") {
    val p = staticPlan("d39_bpe_tokenize_dict")
    assert(!p.toString.contains("CartesianProduct") &&
      !p.toString.contains("BroadcastNestedLoopJoin"),
      s"tokenize-by-dict must equi-join on the word key:\n$p")
    // word-key join both ways + per-doc agg + output sort; anything
    // beyond that means the corpus started shuffling per merge rule
    assert(shuffles(p) <= 5,
      s"tokenize-by-dict gained shuffles, got ${shuffles(p)}:\n$p")
  }

  test("d38 BPE expression tokenization: pure per-row pipeline — only " +
      "the output sort shuffles") {
    val p = staticPlan("d38_bpe_apply")
    assert(shuffles(p) <= 1,
      s"the expression tokenizer must stay per-row, got ${shuffles(p)}:\n$p")
  }

  test("q1 pricing summary: one partial-agg shuffle + output sort") {
    val p = staticPlan("q1_pricing_summary")
    assert(shuffles(p) <= 2,
      s"q1 must keep map-side partial aggregation, got ${shuffles(p)}:\n$p")
    // partial aggregation must be present (map-side combine before the
    // exchange) — its loss would ship every row at 100 TB
    assert(p.toString.contains("partial"),
      s"q1 lost map-side partial aggregation:\n$p")
  }

  /** The persisted-index dedup claims "batch cost = narrow index
    * column scans, never a base text pass" — prove column pruning
    * actually reaches a parquet-backed index (the bench memoizes a
    * cached frame; the 100 TB shape reads a persisted table). */
  private def indexScans(p: SparkPlan,
      tmp: String): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(tmp))
        => f
    }

  test("d41 indexed exact dedup: the index parquet scan reads ONLY " +
      "the fp column — no text, no shingle sets, no signatures") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-idxplan-").toString
    graft.ops.Dedup.signatureFrame(docs)
      .write.mode("overwrite").parquet(tmp)
    val idx = spark.read.parquet(tmp)
    val batch = docs.limit(50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = graft.ops.Dedup.indexedExactRemovals(batch, idx)
        .queryExecution.executedPlan
      val scans = indexScans(p, tmp)
      assert(scans.nonEmpty, s"expected an index scan in:\n$p")
      scans.foreach(f => assert(
        f.requiredSchema.fieldNames.toSet == Set("fp"),
        s"exact mode must read only fp from the index, got " +
          s"${f.requiredSchema.fieldNames.mkString(",")}:\n$p"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("d41b indexed minhash dedup: index scans read only what each " +
      "stage needs — sig for banding, hs for verify, never fp or text") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val tmpDir = java.nio.file.Files
      .createTempDirectory("graft-idxplan-")
    val tmp = tmpDir.toString
    val marker = tmpDir.getFileName.toString
    graft.ops.Dedup.signatureFrame(docs)
      .write.mode("overwrite").parquet(tmp)
    val idx = spark.read.parquet(tmp)
    val batch = docs.limit(50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    // the pipeline materializes eagerly (checkpointed candidate/edge
    // lists), so the index scans never reach the FINAL plan — capture
    // every execution's physical plan as it starts instead
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.
              SparkListenerSQLExecutionStart =>
            seen.add(s.physicalPlanDescription)
          case _ =>
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.ops.Dedup.indexedMinhashRemovals(batch, idx).collect()
      // the formatted plan description puts each scan's Location and
      // ReadSchema on separate lines — pair them per scan block
      val scanRe = ("Location[^\n]*" +
        java.util.regex.Pattern.quote(marker) +
        "[^\n]*\n(?:[^\n]*\n)*?ReadSchema: ([^\n]*)").r
      // listener events are async; wait for the scan blocks to land
      val deadline = System.nanoTime() + 15_000_000_000L
      def readSchemas = seen.toArray(Array.empty[String])
        .flatMap(d => scanRe.findAllMatchIn(d).map(_.group(1)))
      var schemas = readSchemas
      while ((!schemas.exists(_.contains("sig")) ||
          !schemas.exists(_.contains("hs"))) &&
          System.nanoTime() < deadline) {
        Thread.sleep(200); schemas = readSchemas
      }
      assert(schemas.nonEmpty, s"no index scans captured; executions: " +
        s"${seen.size}")
      schemas.foreach(sc => assert(!sc.contains("fp"),
        s"minhash mode must never read the fp column:\n$sc"))
      assert(schemas.exists(sc => sc.contains("sig") && !sc.contains("hs")),
        s"banding must read sig without hs:\n${schemas.mkString("\n")}")
      assert(schemas.exists(sc => sc.contains("hs") && !sc.contains("sig")),
        s"verify must read hs without sig:\n${schemas.mkString("\n")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
