package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PredicateQueries.queries ++
      IcebergQueries.queries ++ MutationQueries.queries ++
      OpsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Every oracle passes through [[graft.queries.OracleSql]]'s
    * evaluate-CTEs-once rewrite — see its scaladoc for why (DuckDB
    * CTE inlining makes the MMR-unroll oracles combinatorial). */
  def oracleSql: Map[String, String] =
    OracleSql.materializeCtes(
      CoreQueries.oracles ++ PredicateQueries.oracles ++
        IcebergQueries.oracles ++ MutationQueries.oracles ++
        OpsQueries.oracles)

  /** Headline subset Bench.scala times per round (kept separate so the
    * bench isn't diluted by correctness-only micro-queries). */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q2_filter_project", "q3_topk_orders",
    "q4_segment_revenue", "q5_nation_revenue", "q6_forecast_revenue",
    "q9_window_rank", "q13_events_hourly",
    "d1_dedup_exact", "d6_minhash_dedup", "e1_ann_bruteforce",
    "e6_sessionize", "d13_contamination", "e8_semantic_dedup",
    "d18_dup_ngrams", "d23_line_dedup", "d24_bigram_surprise",
    "e13_bm25", "d26_filter_funnel", "d27_dup_passages",
    "d28_dsir_weights",
    // round 15: PQ-ADC ANN and the end-to-end image near-dedup join
    // the headline set (no BASELINE.md comparables — tracked round
    // over round from r15 on)
    "e15_pq_adc_verify", "e14_image_neardup",
    // round 16: index-backed daily-batch dedup (exact + near-dup) —
    // the operational contrast to d6's full-corpus re-dedup: the
    // signature index is built in the warmup pass, so the timed path
    // is batch-vs-index only, the shape a daily pipeline actually runs
    "d41_indexed_batch_dedup", "d41b_indexed_minhash_batch",
    // round 16: indexed IVF ANN search — the inverted file is built in
    // the warmup pass (the persisted build_ann_index shape i36 gates
    // through SQL); the timed path probes, loads ONLY probed cells,
    // and re-ranks — contrast with e3-family full assign-and-search
    "e17_ivf_indexed_search",
    // round 16: indexed BM25 — postings built in the warmup pass (the
    // persisted build_text_index shape i38 gates through SQL); timed
    // path = query-term bucket load + score — contrast with e13's
    // full corpus tokenization pass
    "e18_bm25_indexed",
    // round 16: composed IVF+PQ — probe coarse cells, rank by ADC
    // over codes; the standard memory-bound large-scale ANN layout
    "e19_ivfpq_compose",
    // round 17: trigram stupid-backoff LM scoring (train on half the
    // corpus, score everything — the CCNet perplexity-filter shape),
    // hybrid BM25+ANN retrieval fused by reciprocal-rank fusion, and
    // the unigram (SentencePiece-style) tokenizer's corpus
    // deployment path (train vocab + segment distinct words + one
    // word→pieces join)
    "d42_trigram_backoff", "e20_hybrid_rrf", "d48_unigram_tokenize",
    // round 18: hybrid fusion riding the INDEXED retrievers — both
    // indexes built in the warmup pass, so the timed path is
    // bucket-load + probed-cells-load + fuse, never a corpus scan
    // (the answer to e20's "at 100x, ride the indexes" plan note)
    "e22_hybrid_indexed",
    // round 19: packed-text materialization — the terminal
    // training-pipeline stage (token-count, shard-local greedy fill,
    // per-bin ordered concat + digest), newly writable from SQL via
    // CALL pack_corpus (i61/i63); benched here as the pure
    // query-shaped core so the shard-writer path has a tracked row
    "d21_packed_text")
}
