package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Names

/** DSIR-style importance weighting ("Data Selection for Language
  * Models via Importance Resampling", Xie et al., 2023): score every
  * source document by how much its hashed n-gram features look like a
  * TARGET distribution (a benchmark, a curated domain), then keep the
  * top of the ranking. The feature space is bucketed so the "model" is
  * a bounded table regardless of corpus size.
  *
  * Determinism follows the d24/e13 conventions: the per-bucket weight
  * is the add-one-smoothed rational likelihood ratio
  * `(SCALE · (t_f + 1)) div (s_f + B)` — integral division, no
  * logarithm — summed per document as exact longs, so scores are
  * bit-identical across engines and summation orders. Monotone in
  * `t_f / s_f` per feature like the true log-ratio.
  *
  * Scale shape: feature buckets are the first 4 hex chars of the
  * bigram's md5 — at most 65 536 distinct — so both count tables
  * collapse map-side to ≤ B rows and the weight model BROADCASTS; the
  * scoring pass is one corpus explode + a map-side broadcast join +
  * one per-document partial aggregation. The corpus never shuffles on
  * a feature key.
  */
object Importance {

  /** Weight scale (10⁹) for the integral likelihood ratios. */
  val Scale = 1000000000L

  /** Feature-bucket count: 16⁴ md5 prefixes. */
  val Buckets = 65536L

  /** Hashed-bigram feature bucket — engine-portable (md5 + substring,
    * the d25 convention). */
  def featureBucket(gram: Column): Column = substring(md5(gram), 1, 4)

  private def grams(text: Column): Column =
    TextAnalysis.ngrams(split(TextAnalysis.normalized(text), " "), 2)

  /** Per-document importance scores of `source` docs against the
    * `target` sample: `(idCol, n_feats, weight_scaled, mean_weight)`.
    * `weight_scaled` = Σ_occurrences (SCALE·(t+1)) div (s+B) as an
    * exact long; `mean_weight` divides by the occurrence count and
    * descales (0.0 for docs with < 2 tokens). Resample by ordering on
    * `(weight_scaled / n_feats)` or feed `mean_weight` to
    * [[FilterPipeline.funnel]] as a stage. */
  def importanceWeights(source: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val Seq(cB, cS, cT) = Seq("b", "s", "t").map(n =>
      Names.fresh(source.columns)(i => s"__graft_${n}$i"))
    def buckets(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(grams(col(textCol))).as("__g"): _*)
        .select(cols :+ featureBucket(col("__g")).as(cB): _*)
    // Deliberately TWO source passes (r22, examined — the d24
    // analysis): a shared per-(doc, bucket) pre-aggregate never gets
    // its stage reused (the outer join's inferred isnotnull(id)
    // pushes into only one reference, breaking canonical equality),
    // so the "one pass" rewrite measured as extra exchange + same two
    // scans. The counts exchange collapses map-side to ≤ B rows per
    // partition, so the second pass's shuffle is already trivial.
    val sCounts = buckets(source).groupBy(cB)
      .agg(count(lit(1)).as(cS))
    val tCounts = buckets(target).groupBy(cB)
      .agg(count(lit(1)).as(cT))
    // weights only needed for buckets the SOURCE can produce
    // decimal(38,0) product: a hot bucket past ~9.2e9 target
    // occurrences would overflow the Long SCALE·(t+1) product at
    // corpus scale (throwing under ANSI); decimal div keeps the exact
    // integral quotient as a long
    val model = sCounts.join(tCounts, Seq(cB), "left")
      .select(col(cB), expr(
        s"cast($Scale as decimal(38,0)) * (coalesce(`$cT`, 0L) + 1L) " +
          s"div (`$cS` + $Buckets)")
        .as("__w"))
    val perDoc = buckets(source, col(idCol))
      .join(broadcast(model), cB)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("__w")).as("weight_scaled"))
    source.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("weight_scaled"), lit(0L)).as("weight_scaled"),
        when(col("n_feats").isNull, lit(0.0))
          .otherwise(round(
            col("weight_scaled").cast("double") / col("n_feats")
              / Scale.toDouble, 6)).as("mean_weight"))
  }
}
