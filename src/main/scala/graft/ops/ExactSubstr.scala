package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Names

/** Exact-substring duplicate-passage detection — the ExactSubstr dedup
  * of "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al., 2022) at token-window granularity: a passage is
  * duplicated when one of its fixed-width token windows occurs more
  * than once in the corpus (within OR across documents), and maximal
  * runs of duplicated windows merge into spans. Suffix arrays find
  * arbitrary-length repeats; fixed windows find every repeat of at
  * least `window` tokens — the same filter signal, and embarrassingly
  * parallel.
  *
  * Scale shape: ONE corpus scan explodes each document into its
  * window hashes (tokenized ONCE into a bound attribute — the
  * Dedup.scala:35-39 re-eval trap); occurrence counting and canonical
  * marking run as window functions over one hash-keyed exchange (r22
  * — the former count+join shape scanned the corpus twice), and the
  * interval merge is one document-key window pass. Nothing is ever
  * pairwise: a window shared by 10⁶ documents costs 10⁶ marked rows,
  * not 10¹² pairs.
  */
object ExactSubstr {

  /** Maximal duplicated spans per document. Returns
    * `(idCol, span_start, span_end, n_windows)` — token offsets,
    * end exclusive, one row per maximal span of corpus-duplicated
    * `window`-token windows. With `keepFirst` the canonical first
    * occurrence of each window (lowest `(id, pos)`) is exempt, so the
    * spans are exactly what a dedup pass would REMOVE; without it they
    * are everything a contamination audit would FLAG. Documents
    * shorter than `window` tokens have no windows and emit nothing. */
  def dupPassages(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", window: Int = 20,
      keepFirst: Boolean = true): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val Seq(cTk, cPos, cH, cNew, cSpan) =
      Seq("tk", "pos", "h", "new", "span").map(s =>
        Names.fresh(docs.columns)(i => s"__graft_${s}$i"))
    val toks = split(TextAnalysis.normalized(col(textCol)), " ")
    val hashes = when(size(col(cTk)) < window,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(col(cTk)) - window),
        i => md5(concat_ws(" ", slice(col(cTk), i + 1, lit(window))))))
    val windows = docs.select(col(idCol), toks.as(cTk))
      .select(col(idCol), posexplode(hashes).as(Seq(cPos, cH)))
      .withColumn(cPos, col(cPos).cast("long"))
    // ONE corpus pass (r22, guide §2.3): the per-hash occurrence count
    // and canonical first occurrence are WINDOW functions over a
    // single hash-keyed exchange — the former groupBy + self-join
    // evaluated the tokenize+md5 subtree twice (a (doc, pos, hash)
    // frame is larger than the text itself, so pinning was not an
    // option), and its probe side shuffled the same raw rows this
    // window shape shuffles. Skew trade, documented: a window
    // partition cannot be AQE-split like the old join could, so one
    // ultra-hot boilerplate window hash (10⁹ copies at 100 TB) now
    // processes on one task — linearly (count + min, spillable
    // buffer), not quadratically; the saved full corpus scan dominates
    // until that extreme.
    val byH = Window.partitionBy(col(cH))
    // one SELECT for both window expressions: sequential withColumns
    // insert a Project between the Window operators, which blocks
    // CollapseWindow and would buffer every hash partition twice
    // (plan-pinned by PlanShapeSpec's d27 WindowExec count)
    val marked = windows
      .select(col(idCol), col(cPos),
        count(lit(1)).over(byH).as("__n"),
        min(struct(col(idCol), col(cPos))).over(byH).as("__first"))
      .where(col("__n") >= 2 &&
        (if (keepFirst)
          !(col("__first")(idCol) === col(idCol) &&
            col("__first")(cPos) === col(cPos))
        else lit(true)))
      .select(col(idCol), col(cPos))
    // merge overlapping/adjacent windows into maximal spans: a new
    // span starts where a window clears every previous window's end
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col(cPos))
    val prevEnd = max(col(cPos) + window).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = marked
      .withColumn(cNew,
        when(prevEnd.isNull || col(cPos) > prevEnd, 1L).otherwise(0L))
      .withColumn(cSpan, sum(col(cNew)).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    spans.groupBy(col(idCol), col(cSpan))
      .agg(min(col(cPos)).as("span_start"),
        (max(col(cPos)) + window).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** The rewrite half of the dedup pass: drop every token covered by a
    * duplicated span ([[dupPassages]] with its keep-first exemption)
    * and rebuild the document from the survivors. The exemption is
    * per-WINDOW, so each duplicated window's canonical occurrence
    * survives unless an overlapping marked span in the same document
    * swallows its tokens — a corner where a passage can lose every
    * copy (the suffix-array original has the same overlap ambiguity;
    * dedup pipelines accept it because over-removal of near-boilerplate
    * is harmless). Returns
    * `(idCol, textCol, n_tokens, n_tokens_removed)` for EVERY input
    * document; the rebuilt text is the NORMALIZED token stream (the
    * pass operates post-normalization, as real pipelines do between
    * cleaning and tokenization). The span table is tiny next to the
    * corpus, so the join back is AQE-broadcastable; the rebuild itself
    * is per-row array work. */
  def removeDupPassages(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", window: Int = 20): DataFrame = {
    val Seq(cTk, cSp) = Seq("tk", "sp").map(s =>
      Names.fresh(docs.columns)(i => s"__graft_${s}$i"))
    val spans = dupPassages(docs, textCol, idCol, window,
        keepFirst = true)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as(cSp))
    // null text reads as empty (the LineDedup contract) — without the
    // coalesce the rebuilt text would be NULL-vs-'' engine-dependent
    val joined = docs
      .select(col(idCol),
        split(TextAnalysis.normalized(coalesce(col(textCol), lit(""))),
          " ").as(cTk))
      .join(spans, Seq(idCol), "left")
    val sps = coalesce(col(cSp),
      array().cast("array<struct<span_start:long,span_end:long>>"))
    val keptIdx = filter(sequence(lit(0L), size(col(cTk)).cast("long") - 1L),
      i => !exists(sps, sp =>
        i >= sp.getField("span_start") && i < sp.getField("span_end")))
    // blank/NULL text splits to [""] (size 1), but its token count is
    // 0 by the TextAnalysis.tokenCount contract — align the reported
    // n_tokens with it ([""] is only produced by the empty normalized
    // string, since normalization trims). n_tokens_removed needs no
    // blank guard: a blank doc has no window hashes, so keptIdx keeps
    // its one empty slot and size(cTk) - size(keptIdx) is already 0.
    val nTokens = when(
        size(col(cTk)) === 1 && element_at(col(cTk), 1) === "", lit(0L))
      .otherwise(size(col(cTk)).cast("long"))
    joined.select(col(idCol),
      concat_ws(" ", transform(keptIdx,
        i => element_at(col(cTk), (i + 1L).cast("int")))).as(textCol),
      nTokens.as("n_tokens"),
      (size(col(cTk)).cast("long") - size(keptIdx))
        .as("n_tokens_removed"))
  }

  /** Per-document duplicated-token accounting over [[dupPassages]]:
    * `(idCol, n_tokens, dup_tokens, dup_fraction)` for every document
    * (zero rows for clean ones — left join keeps them). */
  def dupStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", window: Int = 20,
      keepFirst: Boolean = true): DataFrame = {
    val spans = dupPassages(docs, textCol, idCol, window, keepFirst)
      .groupBy(col(idCol))
      .agg(sum(col("span_end") - col("span_start")).as("dup_tokens"))
    docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(
            coalesce(col("dup_tokens"), lit(0L)).cast("double") /
              col("n_tokens"), 6)).as("dup_fraction"))
  }
}
