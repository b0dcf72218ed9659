package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data assembly operators: sequence packing (fill fixed-size
  * context windows with documents) and deterministic stratified
  * sampling (per-stratum quotas for corpus mixing).
  *
  * Scale design: packing is greedy WITHIN a shard and embarrassingly
  * parallel ACROSS shards — the sequential dependence of greedy
  * bin-packing never crosses a shard boundary, so 100 TB packs as
  * (shards in parallel) × (bounded docs per shard). Sampling is one
  * window over the stratum partitioning — a single shuffle on the
  * stratum key, quota applied map-side per partition after sort.
  */
object Packing {

  /** Greedy contiguous sequence packing: within each `shardCol` group,
    * documents in ascending `idCol` order fill bins of `capacity`
    * tokens; a document that would overflow the open bin starts the
    * next one (an oversized document occupies a bin alone — callers
    * should pre-filter or split those). Emits (shard, id, tokens, bin).
    *
    * Deterministic: bin assignment depends only on (shard, id order,
    * token counts). Greedy-sequential is the industry-standard packing
    * for LLM pretraining batches — better-than-greedy (FFD etc.)
    * reorders documents, which breaks curriculum/temporal ordering and
    * reproducibility, so the contiguous flavor is the one pipelines
    * actually run.
    *
    * Implementation: `flatMapGroups` per shard. The group is sorted
    * and folded in memory — shards are BOUNDED by construction (the
    * caller picks the sharding, e.g. `doc_id div 1000`), which keeps
    * per-task state small no matter the corpus size; the alternative, a
    * window prefix-sum, cannot express the carry-reset recurrence. */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
      shardCol: String, capacity: Long): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(
      col(shardCol).cast("long").as("shard"),
      col(idCol).cast("long").as("id"),
      col(tokenCol).cast("long").as("tokens"))
    import spark.implicits._
    val packed = in.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        val docs = rows.toArray.sortBy(_._2)
        var bin = 0L
        var acc = 0L
        docs.iterator.zipWithIndex.map { case ((_, id, tokens), i) =>
          if (i == 0) acc = tokens
          else if (acc + tokens > capacity) { bin += 1; acc = tokens }
          else acc += tokens
          (shard, id, tokens, bin)
        }
      }
    packed.toDF("shard", "id", "tokens", "bin")
  }

  /** Deterministic stratified sample: up to `quota` rows per stratum,
    * chosen by a pseudo-random but engine-portable order —
    * `md5(id)` (any engine computes the same digest), with the id as
    * final tiebreak. One shuffle on the stratum key; no scan of
    * rejected rows beyond the window. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // collision-free working column — never clobber a user column
    val rk = graft.util.Names.fresh(df.columns)(i => s"__graft_rk$i")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= quota)
      .drop(rk)
  }
}
