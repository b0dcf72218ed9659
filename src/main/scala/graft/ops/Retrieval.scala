package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — BM25 top-k, the lexical
  * side of training-data selection (mining domain-relevant documents
  * by keyword probe, DSIR-style targeted subset extraction, eval-set
  * neighborhood pulls).
  *
  * Two deliberate determinism choices, both following conventions the
  * e9/e10 quantization gates established:
  *   - the idf is the RATIONAL variant `(N - df + 0.5) / (df + 0.5)`
  *     (no logarithm): `ln` is not required correctly rounded by IEEE
  *     754, so classical BM25 idf is not reproducible bit-for-bit
  *     across engines. The rational form is strictly monotone
  *     decreasing in `df` like the log form, so per-term ORDERING —
  *     what retrieval consumes — is preserved; +, −, ×, ÷ are all
  *     correctly rounded, so the score is bit-identical everywhere.
  *   - per-term scores are scaled to integers with `floor(s·10⁹ + ½)`
  *     BEFORE the per-document sum: a double sum's value depends on
  *     partial-aggregation order, an integer sum does not.
  *
  * Scale shape (the 100 TB story): the corpus is scanned once into
  * postings `(doc, term, tf, dl)` via one map-side-combining
  * aggregation; corpus stats (N, avgdl) are a single-row aggregate;
  * document frequencies reduce to vocabulary size. The query side is
  * small by definition, so query terms (with idf attached) BROADCAST
  * to the postings scan — the corpus is never shuffled for scoring;
  * only matched postings (docs containing a query term) move, keyed by
  * `(query, doc)`. Top-k runs as a per-query window that Spark
  * executes with a partial WindowGroupLimit before the final rank.
  */
object Retrieval {

  /** Score scale for the integer per-term scores (10⁹). */
  val ScoreScale = 1.0e9

  /** Hard cap on the `(query, term)` pairs [[collectQueryTerms]] will
    * pull to the driver (r22 guard): the "query batch is small by
    * definition" contract was previously documented but unenforced — a
    * caller handing a corpus-sized frame to a retrieval entry point
    * would OOM the driver silently. 1M pairs ≈ tens of MB collected,
    * safely inside any driver heap; past it the caller is holding the
    * API wrong and gets told so instead of a dead driver. Deployment
    * override: conf `graft.retrieval.max-query-term-rows` (a larger
    * driver can legitimately raise it). */
  val MaxQueryTermRows = 1 << 20

  /** Past this many DISTINCT query terms, the corpus-token filter
    * switches from a literal `In` to a broadcast semi-join (r22
    * guard): a six-figure literal list bloats the plan tree and its
    * codegen, while a semi-join against the (already collected,
    * LocalRelation) vocabulary costs one broadcast of the same data.
    * Both filter identically. Override: conf
    * `graft.retrieval.in-filter-max-terms`. */
  val InFilterMaxTerms = 10000

  /** Past this many terms in a single query, [[rankMatchedPostings]]
    * falls back from the shared query-id exchange to the two-exchange
    * shape (r22 guard; the r21 verdict's skew note): the shared
    * exchange ships UN-combined per-term rows — ×(terms per query)
    * multiplicity — into one per-query window task with no map-side
    * combine, which a hot many-term query at 100 TB concentrates on
    * one straggler. Below the threshold the multiplicity is a small
    * constant and saving a whole exchange wins; above it, a
    * (query, doc)-keyed partial aggregation first combines map-side
    * and spreads the sum across the cluster. Override: conf
    * `graft.retrieval.shared-exchange-max-terms`. */
  val SharedExchangeMaxTermsPerQuery = 64

  /** Tokenize, with the empty token REMOVED: `split("", " ")` yields
    * `[""]`, so without the filter an empty/whitespace-only document
    * would index as dl = 1 with a `""` posting (skewing avgdl), and an
    * empty query's `""` probe term would retrieve every such document
    * as a BM25 hit. With it, empty docs produce no postings and a
    * dl of 0, matching [[TextAnalysis.tokenCount]]'s empty→0 rule
    * (the same artifact Classifier.labelCounts guards against). */
  private def toks(text: Column): Column =
    // ONE regex pass (r22): split on the whitespace class directly
    // instead of normalize-then-split — `regexp_replace(\s+ -> " ")`
    // materialized a full copy of every document before a second
    // regex-split scanned it. Equivalent BECAUSE this tokenizer strips
    // empties: leading/trailing whitespace (which normalized()'s trim
    // used to absorb, including the tabs/newlines ASCII-trim alone
    // would miss) yields "" elements that array_remove drops, and both
    // forms split on the same \s+ class, so the token multiset is
    // identical for every input (e13/e18/e20/e22 + i38/i39/i42/i56
    // hash gates replay the normalize-then-split form in DuckDB and
    // stay green). Do NOT copy this into operators that keep empty
    // tokens — without the remove, the forms differ on leading
    // whitespace.
    array_remove(split(lower(text), "\\s+"), "")

  /** Postings list: one row per distinct `(idCol, term)` with the term
    * frequency and the document length in tokens. Tokenizes ONCE into
    * a bound attribute before exploding — an inline `size(toks(text))`
    * next to the generator re-runs the whole tokenizer per OUTPUT row
    * (the measured re-evaluation trap documented at Dedup.scala:35-39;
    * here it made postings ~20× the cost of the explode itself). */
  def postings(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tk = graft.util.Names.fresh(docs.columns)(i => s"__graft_tk$i")
    docs.select(col(idCol), toks(col(textCol)).as(tk))
      .select(col(idCol), explode(col(tk)).as("term"),
        size(col(tk)).cast("long").as("dl"))
      .groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
  }

  /** BM25 top-k: for every query row, the `k` highest-scoring
    * documents. Returns `(qIdCol, rank, idCol, score_scaled)` with
    * rank 1..k (ties broken by ascending document id) and
    * `score_scaled` = Σ_terms floor(score_t · 10⁹ + ½) as an exact
    * long. Queries are tokenized with the same normalization as
    * documents; repeated query terms count once (standard bag-of-words
    * probe). Documents sharing no term with a query are absent.
    *
    * IDF VARIANT — read before comparing rankings to another engine.
    * The default idf is the RATIONAL Robertson form without the log:
    * `(N - df + 0.5) / (df + 0.5)`. It is monotone-decreasing in df,
    * so any SINGLE-term ranking is identical to standard BM25, but
    * multi-term scores weight rare terms more steeply than the
    * textbook `ln(1 + (N - df + 0.5)/(df + 0.5))`, and multi-term
    * rankings can therefore differ. The rational form is the default
    * because every arithmetic op in it (add/div/mul) is an exact
    * IEEE-754 operation that any engine reproduces bit-for-bit, which
    * is what lets the e13 gate hash-compare `score_scaled` against
    * DuckDB; a transcendental `ln` is only correctly-rounded to ~1 ulp
    * per libm, so cross-engine hashes could flip on scale-boundary
    * values. Pass `logIdf = true` for the textbook scoring (same plan
    * shape, same exactness of everything but the idf). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id",
      qIdCol: String = "query_id", qTextCol: String = "query",
      k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = false): DataFrame = {
    val tk = graft.util.Names.fresh(docs.columns)(i => s"__graft_tk$i")
    // Query terms collected driver-side ONCE and re-emitted as a
    // LocalRelation — a query batch is small by definition (the
    // [[bm25FromIndex]] collect discipline). The literal In-filter
    // over the exploded tokens replaces the former distinct-shuffle +
    // broadcast-exchange job chain, and the LocalRelation stops every
    // later reference to the query frame from re-running its scan.
    val (qterms, terms, maxTermsPerQ) =
      collectQueryTerms(queries, qIdCol, qTextCol)
    // ONE corpus text pass (r21, guide §2.3 "don't compute twice"):
    // the former shape tokenized the corpus TWICE — once for matched
    // postings, once for the (n_docs, avgdl) stats aggregate, two full
    // regex passes over 100 TB of text. Here each document's token
    // array is exploded WITH a sentinel "" row carrying its dl ("" can
    // never be a real token: [[toks]] strips empties), so one
    // aggregation yields query-term postings AND one stats row per
    // document. That aggregate — postings plus one tiny row per doc,
    // counts not text — is pinned once (localCheckpoint) and both the
    // stats fold and the scoring read it; the text is never re-read.
    // NULL-text docs sentinel with a NULL dl (coalesce only fills the
    // ARRAY), so `sum(dl)` skips them exactly like the old
    // `sum(size(toks(NULL)))` did while `count` still counts them.
    val exploded = filterToTerms(docs
      .select(col(idCol), toks(col(textCol)).as(tk))
      .select(col(idCol),
        explode(coalesce(concat(col(tk), array(lit(""))),
          array(lit("")))).as("term"),
        size(col(tk)).cast("long").as("dl")),
      terms, keepEmpty = true)
    val post0 = exploded.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val post = post0.where(col("term") =!= "")
    // single-row corpus stats off the sentinel rows; 1-row broadcast
    val stats = post0.where(col("term") === "")
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(col("dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    rankMatchedPostings(post, qterms, stats, k, idCol, qIdCol, k1, b,
      logIdf, combineFirst = maxTermsPerQ > sharedExchangeCap(docs))
  }

  /** Conf-overridable [[SharedExchangeMaxTermsPerQuery]]. */
  private def sharedExchangeCap(df: DataFrame): Int =
    graft.util.DriverCollect.confInt(df,
      "graft.retrieval.shared-exchange-max-terms",
      SharedExchangeMaxTermsPerQuery)

  /** Corpus-level BM25 stats as exact longs, computed with the same
    * expressions [[bm25TopK]]'s stats aggregate uses — what
    * `build_text_index` stamps on the index table so a later
    * [[bm25FromIndex]] reproduces `n_docs`/`avgdl` (and therefore
    * every score) bit-for-bit. NULL-text docs count toward `n_docs`
    * (they are corpus members that simply match nothing) and
    * contribute nothing to `total_dl` — both additive across disjoint
    * doc sets, which is what lets an incremental index chain keep
    * exact stats with arithmetic alone. */
  def corpusStats(docs: DataFrame, textCol: String = "text"):
      (Long, Long) = {
    val r = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(toks(col(textCol))).cast("long")).as("total_dl")).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** BM25 top-k from a PERSISTED postings index — a table of
    * `(idCol, term, dl, tf)` rows (the exact [[postings]] shape)
    * written term-bucket-partitioned by `CALL build_text_index`, plus
    * the stamped corpus stats. `loadPostings` receives the distinct
    * query terms (collected driver-side — a query batch's vocabulary,
    * small by definition) and returns AT LEAST every stored posting of
    * those terms; because the index is partitioned by `bucket(term)`,
    * that read is answered by manifest partition pruning — the
    * inverted-index "read only the probed lists" property, so a search
    * touches |query-term buckets|/N of the postings instead of
    * scanning the corpus. Bucket co-residents (other terms hashing
    * into a probed bucket) are filtered right back out here, so the
    * load may safely return whole buckets. Document frequencies come
    * from the loaded rows (a term's postings all live in its bucket,
    * so restricted df == corpus df), stats from the stamped longs with
    * the same double division [[bm25TopK]] performs — results are
    * bit-identical to the unindexed path over the same corpus. */
  def bm25FromIndex(loadPostings: Seq[String] => DataFrame,
      queries: DataFrame, nDocs: Long, totalDl: Long, k: Int,
      idCol: String = "doc_id", qIdCol: String = "query_id",
      qTextCol: String = "query", k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = false): DataFrame = {
    // one driver collect for both the bucket-probe term list and the
    // scoring joins (see [[bm25TopK]]); bucket co-residents are
    // filtered back out by the literal In over the loaded postings
    val (qterms, terms, maxTermsPerQ) =
      collectQueryTerms(queries, qIdCol, qTextCol)
    val post = filterToTerms(loadPostings(terms)
      .select(col(idCol), col("term"), col("dl"), col("tf")),
      terms, keepEmpty = false)
    val stats = queries.sparkSession.range(1).select(
      lit(nDocs).cast("double").as("n_docs"),
      (lit(totalDl).cast("double") / lit(nDocs).cast("double"))
        .as("avgdl"))
    rankMatchedPostings(post, qterms, stats, k, idCol, qIdCol, k1, b,
      logIdf, combineFirst = maxTermsPerQ > sharedExchangeCap(queries))
  }

  /** One driver collect of a query batch's `(qIdCol, term)` pairs:
    * returns them re-emitted as a LocalRelation (true size stats, no
    * re-scan per reference), the sorted distinct term vocabulary, and
    * the largest single query's term count (the
    * [[SharedExchangeMaxTermsPerQuery]] heuristic input). Query
    * batches are small by definition — and since r22 that contract is
    * ENFORCED ([[MaxQueryTermRows]]): the collect is bounded by a
    * limit probe, so an oversized frame fails fast with a named cap
    * instead of OOMing the driver. */
  private def collectQueryTerms(queries: DataFrame, qIdCol: String,
      qTextCol: String): (DataFrame, Seq[String], Int) = {
    val qterms0 = queries.select(col(qIdCol),
      explode(array_distinct(toks(col(qTextCol)))).as("term"))
    val cap = graft.util.DriverCollect.confInt(queries,
      "graft.retrieval.max-query-term-rows", MaxQueryTermRows)
    val (rows, qterms) = graft.util.DriverCollect.asLocalRelation(
      qterms0, cap, "retrieval query batch (query, term) pairs " +
        "(Retrieval.MaxQueryTermRows / conf " +
        "graft.retrieval.max-query-term-rows)")
    val maxPerQuery =
      if (rows.isEmpty) 0
      else rows.groupBy(_.get(0)).valuesIterator.map(_.length).max
    (qterms, rows.map(_.getAs[String]("term")).distinct.toSeq.sorted,
      maxPerQuery)
  }

  /** Corpus-token filter for a collected query vocabulary: a literal
    * `In` while the vocabulary is plan-friendly, a broadcast semi-join
    * against the (LocalRelation) term list past
    * [[InFilterMaxTerms]] — identical filtering either way.
    * `keepEmpty` additionally passes the `""` sentinel rows
    * [[bm25TopK]] threads through its postings aggregation. */
  private def filterToTerms(df: DataFrame, terms: Seq[String],
      keepEmpty: Boolean): DataFrame = {
    val spark = df.sparkSession
    val inMax = graft.util.DriverCollect.confInt(df,
      "graft.retrieval.in-filter-max-terms", InFilterMaxTerms)
    if (terms.size <= inMax) {
      val inTerms =
        if (terms.isEmpty) lit(false) else col("term").isin(terms: _*)
      df.where(if (keepEmpty) col("term") === "" || inTerms else inTerms)
    } else {
      import spark.implicits._
      val vocab = (if (keepEmpty) terms :+ "" else terms).toDF("term")
      df.join(broadcast(vocab), Seq("term"), "left_semi")
    }
  }

  /** The scoring tail shared by [[bm25TopK]] and [[bm25FromIndex]]:
    * df from the (query-term-restricted) postings, idf attached to the
    * small query-term set and broadcast, integer-scaled per-term
    * scores, per-document sum, per-query window top-k. One definition
    * so the indexed and unindexed paths can never drift. */
  private def rankMatchedPostings(post: DataFrame, qterms: DataFrame,
      stats: DataFrame, k: Int, idCol: String, qIdCol: String,
      k1: Double, b: Double, logIdf: Boolean,
      combineFirst: Boolean = false): DataFrame = {
    // df over the restricted postings equals full-corpus df for every
    // query term (each (doc, term) row appears exactly once)
    val df_ = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    // idf attached to the (small) query-term set, then broadcast:
    // the corpus-sized postings never shuffle for the score join
    val rationalIdf = (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)
    val qidf = qterms.join(df_, "term").crossJoin(broadcast(stats))
      .select(col(qIdCol), col("term"),
        (if (logIdf) log(lit(1.0) + rationalIdf) else rationalIdf)
          .as("idf"),
        col("avgdl"))
    val perTerm = post.join(broadcast(qidf), "term")
      .select(col(qIdCol), col(idCol), floor(
        col("idf") * (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) *
              (col("dl").cast("double") / col("avgdl"))))
          * ScoreScale + 0.5).cast("long").as("s"))
    // ONE exchange for the per-document sum AND the top-k window
    // (guide §2.4 — operations keyed the same way share an exchange):
    // hash-partitioning by the query id alone satisfies the
    // (qIdCol, idCol) aggregation's clustering AND the window's, so
    // the aggregate runs complete-mode after this exchange and
    // WindowExec adds only a local sort. The window always forced
    // per-query locality anyway, so the keying loses no parallelism
    // the old two-exchange plan actually had; per-(query, doc) term
    // multiplicity is bounded by the query vocabulary, so the skipped
    // map-side combine costs at most that small factor in rows.
    //
    // GUARDED (r22): past [[SharedExchangeMaxTermsPerQuery]] terms in
    // a single query the multiplicity is no longer a small constant —
    // a hot query's un-combined doc×term rows would concentrate on
    // one window task (AQE cannot skew-split window partitions) — so
    // `combineFirst` restores the two-exchange shape: a (query, doc)
    // keyed aggregation with map-side partial combine, then the
    // window's own query-id exchange over one row per (query, doc).
    // The integer score sum is order-independent, so both shapes are
    // bit-identical.
    val scored =
      (if (combineFirst) perTerm else perTerm.repartition(col(qIdCol)))
        .groupBy(col(qIdCol), col(idCol))
        .agg(sum(col("s")).as("score_scaled"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score_scaled").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("score_scaled"))
  }

  /** RRF contribution scale (10⁹): `RrfScale div (kRrf + rank)` is the
    * integer-quotient form of the classical `1 / (k + rank)`. */
  val RrfScale = 1000000000L

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way
    * to combine a lexical (BM25) and a vector (ANN) retriever into one
    * hybrid ranking without score calibration: each input ranking
    * contributes `1 / (kRrf + rank)` per document, summed across
    * rankings, re-ranked by the fused score. Rank-based, so it is
    * immune to the incomparable score scales of its inputs — exactly
    * why it is the default hybrid fusion in production search stacks.
    *
    * Inputs are per-query top-k rankings `(qIdCol, idCol, rankCol)`
    * (extra columns ignored); output is
    * `(qIdCol, rank, idCol, rrf_scaled, n_lists)` with rank 1..k by
    * `(rrf_scaled DESC, idCol ASC)` and `rrf_scaled` the exact long
    * Σ `RrfScale div (kRrf + rank_i)` — integer arithmetic throughout
    * (the e13/d24 determinism contract), so fused scores hash-gate
    * across engines and aggregation orders.
    *
    * Scale shape: the inputs are already per-query TOP-K lists — a
    * few hundred rows per query regardless of corpus size — so the
    * union, the (query, doc) fused sum, and the per-query window all
    * operate on query-volume-sized data; the corpus is only touched
    * inside the upstream retrievers. The final top-k window runs with
    * a partial WindowGroupLimit like every other rank gate. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60,
      qIdCol: String = "query_id", idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings.map(_.select(col(qIdCol), col(idCol),
      expr(s"${RrfScale}L div (${kRrf}L + `$rankCol`)").as("__rrf")))
    // fused sum and top-k window share one query-id exchange (the
    // rankMatchedPostings §2.4 pattern); inputs are top-k lists, so
    // the skipped map-side combine is over a few hundred rows
    val fused = contribs.reduce(_ unionByName _)
      .repartition(col(qIdCol))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("__rrf")).as("rrf_scaled"),
        count(lit(1)).as("n_lists"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("rrf_scaled").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("rrf_scaled"),
        col("n_lists"))
  }
}
