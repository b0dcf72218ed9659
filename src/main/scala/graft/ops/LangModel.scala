package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Names

/** Corpus-trained n-gram language-model scoring — the quality-filter
  * shape of CCNet/RedPajama's KenLM perplexity pass: train token
  * statistics ON the corpus, score every document against them, and
  * filter the tails. A document whose word pairs are mostly corpus
  * hapaxes is boilerplate, OCR noise, or keyword stuffing; one whose
  * pairs are all ultra-common is templated filler.
  *
  * The score is an integer-arithmetic surprise proxy rather than a
  * log-probability: per bigram occurrence,
  * `surprise = SCALE div corpusCount` (integral division; SCALE =
  * 10^12), summed per document as exact longs. `1/count` is monotone
  * in the same direction as `-log p(count/total)` — rare pairs score
  * high, common pairs score ~0 — but every step is integer, so the
  * result is bit-identical across engines and summation orders
  * (`ln` is not required to be correctly rounded by IEEE 754, and a
  * float sum's value depends on Spark's partial-aggregation order;
  * both would break hash-gating AND run-to-run reproducibility of the
  * filter itself). Overflow headroom: SCALE · bigrams-per-doc ≤
  * 10^12 · 10^5 = 10^17 < 2^63.
  *
  * Scale shape: the training pass is one `groupBy(gram).count` with
  * map-side partial aggregation (the exchange carries per-partition
  * distinct grams, not token volume); the scoring pass joins bigram
  * occurrences to their counts on the gram — ultra-common grams (`of
  * the`) hash their occurrences to one partition, which is exactly the
  * skew AQE's skew-join splitting redistributes — then reduces per
  * document (map-side partial again). No driver-side state: the LM
  * "model" is a DataFrame, never collected.
  */
object LangModel {

  /** Surprise scale: integer quotient numerator (10^12). */
  val Scale = 1000000000000L

  /** Whitespace tokens of the normalized text (shared definition with
    * [[TextAnalysis]] so LM grams match the dedup/repetition grams). */
  private def toks(text: Column): Column =
    split(TextAnalysis.normalized(text), " ")

  /** Corpus bigram counts — the LM training pass. Returns
    * `(gram, n)` with one row per distinct token bigram. */
  def bigramCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(TextAnalysis.ngrams(toks(col(textCol)), 2))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))

  /** Score every document against the corpus-trained bigram counts.
    * Returns one row per input document:
    * `(idCol, n_bigrams, n_hapax, surprise_scaled, mean_surprise)` —
    * `n_hapax` = bigram occurrences unique in the corpus,
    * `surprise_scaled` = Σ (SCALE div count) as an exact long,
    * `mean_surprise` = surprise_scaled / n_bigrams / SCALE rounded to
    * 6 (0.0 for documents with fewer than two tokens). */
  def bigramSurprise(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val Seq(cG, cN) = Seq("gram", "n").map(s =>
      Names.fresh(df.columns)(i => s"__graft_${s}$i"))
    val bg = df.select(col(idCol),
      explode(TextAnalysis.ngrams(toks(col(textCol)), 2)).as(cG))
    val counts = bg.groupBy(cG).agg(count(lit(1)).as(cN))
    val perDoc = bg.join(counts, cG)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col(cN) === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(expr(s"$Scale div `$cN`")).as("surprise_scaled"))
    // left join back so <2-token documents keep a row (zero scores)
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        coalesce(col("surprise_scaled"), lit(0L)).as("surprise_scaled"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(round(
            col("surprise_scaled").cast("double") / col("n_bigrams")
              / Scale.toDouble, 6)).as("mean_surprise"))
  }
}
