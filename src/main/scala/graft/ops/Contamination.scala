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
    * are kept (left join) — the common case, and the one a filter
    * downstream needs to see. */
  def overlap(corpus: DataFrame, bench: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val grams = (df: DataFrame) => df.select(col(idCol).as("__id"),
      explode(array_distinct(Dedup.shingles(col(textCol), n)))
        .as("__gram"))
    val benchGrams = grams(bench).select("__gram").distinct()
    val hits = grams(corpus).join(benchGrams, "__gram")
      .groupBy("__id").agg(count(lit(1)).as("n_hit"))
    val totals = corpus.select(col(idCol).as("__id"),
      size(array_distinct(Dedup.shingles(col(textCol), n)))
        .cast("long").as("n_grams"))
    totals.join(hits, Seq("__id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("overlap_frac",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
      .withColumn("contaminated",
        when(col("overlap_frac") >= threshold, 1L).otherwise(0L))
      .select(col("__id").as(idCol), col("n_hit"), col("n_grams"),
        col("overlap_frac"), col("contaminated"))
  }
}
