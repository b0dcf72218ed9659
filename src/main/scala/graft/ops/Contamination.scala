package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents whose
  * n-gram content overlaps an evaluation/benchmark set — the
  * decontamination pass every serious pretraining pipeline runs before
  * training (held-out test questions leaking into the corpus inflate
  * eval scores).
  *
  * Scale design: the real-world shape — corpus >> benchmark — is an
  * explode-join on the n-gram key. The benchmark side collapses to its
  * DISTINCT gram set first (a few million grams for any real benchmark
  * suite, broadcastable; left to AQE here so an unusually large bench
  * side still shuffle-joins correctly), and the corpus side streams
  * through one explode → join → count, shuffling only (id, gram hit)
  * pairs, never the text. No all-pairs comparison anywhere.
  *
  * Determinism: grams are exact strings from the shared normalization
  * ([[TextAnalysis.normalized]] → 3-token shingles), counts are
  * integers — the d13 gate hash-matches DuckDB end to end.
  */
object Contamination {

  /** Per-document overlap against `bench`: distinct grams hit,
    * distinct grams total, overlap fraction (round 6), and a 0/1
    * `contaminated` flag at `threshold`. Documents with zero overlap
    * are kept — the common case, and the one a filter downstream
    * needs to see.
    *
    * ONE pass over the corpus text: tokenize/shingle once into a bound
    * column (the `Dedup.scala:35-39` HOF pitfall — a raw-text shingle
    * subtree would re-run the normalize+split regex per gram), explode,
    * LEFT-join the benchmark gram set with a hit marker, and fold both
    * `n_grams` (count of all grams) and `n_hit` (count of marked ones)
    * out of the same grouped pass. Shingle arrays always have ≥ 1
    * element (short docs collapse to one whole-text gram), so the
    * explode never drops a document. */
  def overlap(corpus: DataFrame, bench: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // explode FUSED over the shingle expression, never over an aliased
    // grams column: with an attribute input, InferFiltersFromGenerate
    // adds `size(__grams) > 0`, and pushdown then substitutes the whole
    // shingle tree (inline tokenizer split inside the HOF lambda — the
    // Dedup.scala:35-39 re-eval pitfall) into a Filter at the scan —
    // measured 8x on the d13 bench (3.8 s -> 0.5 s at sf0.1). The rule
    // skips non-attribute generator inputs, so fusing sidesteps it.
    // NULL text ≡ empty text (one whole-text "" gram), so a document
    // with a missing body stays in the output — shingles(NULL) would be
    // NULL and explode would silently drop the document otherwise
    val shingled = (df: DataFrame) => df.select(col(idCol).as("__id"),
        split(graft.ops.TextAnalysis.normalized(
          coalesce(col(textCol), lit(""))), " ")
          .as("__toks"))
      .select(col("__id"),
        explode(array_distinct(Dedup.shinglesOfTokens(col("__toks"), n)))
          .as("__gram"))
    val benchGrams = shingled(bench)
      .select(col("__gram")).distinct()
      .withColumn("__hit", lit(1L))
    shingled(corpus)
      .join(benchGrams, Seq("__gram"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
      .withColumn("overlap_frac",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
      .withColumn("contaminated",
        when(col("overlap_frac") >= threshold, 1L).otherwise(0L))
      .select(col("__id").as(idCol), col("n_hit"), col("n_grams"),
        col("overlap_frac"), col("contaminated"))
  }

  /** Corpus-GLOBAL duplicate n-gram profile — the repeated-substring
    * signal of exact-substring dedup (long n-grams recurring across
    * documents mark boilerplate/templates worth cutting before
    * training). For each document: total n-gram instances, instances
    * whose gram occurs in >= `minDf` DISTINCT documents, and the
    * duplicated fraction.
    *
    * Scale design — three key-partitioned shuffles, none carrying text
    * beyond the gram itself:
    *   1. explode → groupBy (doc, gram) with map-side partial count —
    *      per-doc repeats collapse before the shuffle;
    *   2. groupBy gram over the already-distinct (doc, gram) pairs →
    *      document frequency (count, not countDistinct — distinctness
    *      is structural after step 1);
    *   3. join DF back on gram and fold per doc. The gram-key join
    *      self-balances under AQE (a viral gram is ONE hot key; skew
    *      split applies); no all-pairs product anywhere.
    * Documents shorter than n tokens have zero n-grams and report
    * (0, 0, 0.0) via the left join — a filter downstream must see
    * them, not lose them.
    *
    * Integer counts + one round-6 division — hash-gated end to end
    * (d18). */
  def corpusDupNgrams(corpus: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 5, minDf: Int = 2): DataFrame = {
    val grams = corpus.select(col(idCol).as("__id"),
        split(TextAnalysis.normalized(col(textCol)), " ").as("__toks"))
      .select(col("__id"),
        explode(TextAnalysis.ngrams(col("__toks"), n)).as("__gram"))
      .groupBy("__id", "__gram").agg(count(lit(1)).as("__c"))
    val dfreq = grams.groupBy("__gram")
      .agg(count(lit(1)).as("__df"))
    val perDoc = grams.join(dfreq, Seq("__gram"))
      .groupBy("__id")
      .agg(sum(col("__c")).as("n_grams"),
        sum(when(col("__df") >= minDf, col("__c")).otherwise(0L))
          .as("n_dup"))
    corpus.select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        when(col("n_grams") === 0, lit(0.0)).otherwise(
          round(col("n_dup").cast("double") / col("n_grams"), 6)))
  }
}
