package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Names

/** Hashed-feature linear text classifier — the fastText-style quality
  * filter every large-scale pretraining pipeline runs (score each
  * document against a small learned model; keep what clears the bar).
  *
  * The feature space is bounded: each token hashes into one of 65 536
  * md5-prefix buckets (the [[Importance]] convention), so the model is
  * a table of at most 65 536 `(bucket, weight)` rows regardless of
  * corpus size and always BROADCASTS. Scoring is one corpus explode +
  * a map-side broadcast join + one per-document partial aggregation —
  * the corpus never shuffles on a feature key. At 100 TB the whole
  * cost is a single scan.
  *
  * Determinism follows the d24/d28/e13 conventions: weights are
  * INTEGER-scaled rational log-odds surrogates
  * (`SCALE·(p+1) div (p+n+2) − SCALE/2` — positive iff the feature is
  * more frequent in the positive sample, add-one smoothed, no
  * transcendental), and a document's margin is the exact long sum of
  * its tokens' weights — order-independent and bit-identical across
  * engines, which is what lets d34 hash-gate fit AND scoring
  * end-to-end against DuckDB.
  */
object Classifier {

  /** Weight scale (10⁹) for the integral rational weights. */
  val Scale = 1000000000L

  /** Token feature bucket — delegates to [[Importance.featureBucket]]
    * (first 4 hex chars of md5, ≤ 65 536 distinct) so the shared
    * bucketing convention has exactly one definition. */
  def featureBucket(token: Column): Column =
    Importance.featureBucket(token)

  private def toks(text: Column): Column =
    split(TextAnalysis.normalized(text), " ")

  /** The classifier's COUNT LEDGER — one row per feature bucket with
    * its occurrence counts in the positive / negative sample,
    * `(bucket, p_cnt, n_cnt)`. This is the persistable form of the
    * model: raw counts, not the derived weights, so the ledger is
    * ADDITIVE over disjoint document sets — which is what lets
    * `CALL train_classifier(incremental => true)` chain count deltas
    * and still equal a full refit bit-for-bit after
    * [[weightsFromCounts]]'s sum-merge. Labels come from `labelPred`
    * under SQL three-valued logic: rows where the predicate is true
    * are positive, false are negative, NULL contribute to neither
    * (exactly the `lang === "en"` / `lang =!= "en"` split d34
    * gates). Both count streams collapse map-side to ≤ 65 536 rows,
    * so the cost is one corpus scan however large the samples. */
  def labelCounts(df: DataFrame, labelPred: Column,
      textCol: String = "text"): DataFrame =
    df.select(labelPred.as("__lbl"),
        explode(toks(col(textCol))).as("__t"))
      .where(col("__t") =!= "" && col("__lbl").isNotNull)
      .select(col("__lbl"), featureBucket(col("__t")).as("bucket"))
      .groupBy("bucket").agg(
        sum(when(col("__lbl"), 1L).otherwise(0L)).as("p_cnt"),
        sum(when(col("__lbl"), 0L).otherwise(1L)).as("n_cnt"))

  /** Derive the `(bucket, weight_scaled)` scoring model from a
    * [[labelCounts]] ledger — the read half of the persisted
    * classifier. The ledger may hold DUPLICATE bucket rows (a full
    * train plus chained `incremental` deltas), so it is sum-merged
    * per bucket first; counts being additive, the merged ledger IS
    * the full-refit ledger and the weights are bit-identical to
    * [[fit]] over the union corpus. Weight: `SCALE·(p+1) div
    * (p+n+2) − SCALE/2` — positive iff the bucket is more frequent
    * in the positive sample, add-one smoothed, no transcendental. */
  def weightsFromCounts(ledger: DataFrame): DataFrame =
    // the SCALE·(p+1) product runs through decimal(38,0): with 65 536
    // buckets a hot-token bucket can exceed Long.Max/SCALE ≈ 9.2e9
    // occurrences at corpus scale, and the Long product would throw
    // under ANSI (or wrap). div on decimals still yields the exact
    // integral quotient as a long.
    ledger.groupBy("bucket").agg(
        sum(col("p_cnt")).as("__p"), sum(col("n_cnt")).as("__n"))
      .select(col("bucket"), expr(
        s"cast($Scale as decimal(38,0)) * (__p + 1L) div " +
          s"(__p + __n + 2L) - ${Scale / 2}")
        .as("weight_scaled"))

  /** Fit a model from labeled samples: per-bucket weight
    * `SCALE·(p+1) div (p+n+2) − SCALE/2` where p / n are the bucket's
    * occurrence counts in the positive / negative sample. Buckets seen
    * in neither sample are absent (weight 0 at scoring time).
    * Delegates to [[labelCounts]] + [[weightsFromCounts]] — one
    * definition shared with the persisted `CALL train_classifier`
    * model, so the d34 oracle gates both paths. */
  def fit(pos: DataFrame, neg: DataFrame,
      textCol: String = "text"): DataFrame =
    weightsFromCounts(labelCounts(
      pos.select(col(textCol)).withColumn("__is_pos", lit(true))
        .unionByName(neg.select(col(textCol))
          .withColumn("__is_pos", lit(false))),
      col("__is_pos"), textCol))

  /** Score documents against a `(bucket, weight_scaled)` model:
    * `(idCol, n_feats, margin_scaled, mean_margin, accept)`.
    * `margin_scaled` is the exact long sum of token weights (unseen
    * buckets contribute 0), `mean_margin` descales per token, `accept`
    * is the margin-positive decision. Zero-token documents keep
    * margin 0 and accept = false. */
  def linearScore(docs: DataFrame, model: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cB = Names.fresh(docs.columns)(i => s"__graft_b$i")
    // explode_OUTER keeps one null-bucket row per token-less document
    // (null/blank text), so zero-margin rows fall out of the SAME
    // aggregation — no join-back against the corpus, which would cost
    // a second scan plus a corpus-sized shuffle join at 100 TB. A null
    // bucket matches nothing in the left join, so it contributes
    // weight 0, and n_feats counts only real tokens.
    val exploded = docs
      .select(col(idCol), explode_outer(toks(col(textCol))).as("__t"))
      .select(col(idCol),
        when(col("__t").isNotNull && col("__t") =!= "",
          featureBucket(col("__t"))).as(cB))
    exploded
      .join(broadcast(model.withColumnRenamed("bucket", cB)),
        Seq(cB), "left")
      .groupBy(col(idCol))
      .agg(
        count(col(cB)).as("n_feats"),
        sum(coalesce(col("weight_scaled"), lit(0L))).as("margin_scaled"))
      .select(col(idCol), col("n_feats"),
        coalesce(col("margin_scaled"), lit(0L)).as("margin_scaled"),
        when(col("n_feats") === 0L, lit(0.0))
          .otherwise(round(
            coalesce(col("margin_scaled"), lit(0L)).cast("double")
              / col("n_feats") / Scale.toDouble, 6)).as("mean_margin"),
        (coalesce(col("margin_scaled"), lit(0L)) > 0L).as("accept"))
  }
}
