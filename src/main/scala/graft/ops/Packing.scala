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
    * should pre-filter or split those). Emits (shard, id, tokens, bin,
    * bin_offset) — the offset is the document's starting token position
    * WITHIN its bin, which is what the training loader needs to build
    * position ids and the block-diagonal attention mask over a packed
    * context window.
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
    // NULL ids/sizes/shards are refused loudly (same contract as the
    // samplers): the typed fold below would otherwise die in the
    // encoder with a message that names a tuple field, not the column
    // — and a packer that silently guessed a size would corrupt every
    // downstream offset. Callers with NULL-able token counts decide
    // the semantics themselves (the d9/d21/pack_corpus sites coalesce
    // a NULL-text tokenCount to 0).
    def req(c: String) = when(col(c).isNull, raise_error(lit(
      s"packGreedy: NULL $c — packing needs concrete ids and sizes")))
      .otherwise(col(c))
    val in = df.select(
      req(shardCol).cast("long").as("shard"),
      req(idCol).cast("long").as("id"),
      req(tokenCol).cast("long").as("tokens"))
    import spark.implicits._
    val packed = in.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        val docs = rows.toArray.sortBy(_._2)
        var bin = 0L
        var acc = 0L
        docs.iterator.zipWithIndex.map { case ((_, id, tokens), i) =>
          val offset =
            if (i == 0) { acc = tokens; 0L }
            else if (acc + tokens > capacity) { bin += 1; acc = tokens; 0L }
            else { val o = acc; acc += tokens; o }
          (shard, id, tokens, bin, offset)
        }
      }
    packed.toDF("shard", "id", "tokens", "bin", "bin_offset")
  }

  /** Materialize packed context windows: join [[packGreedy]]'s
    * assignments back to the document text and emit ONE row per
    * (shard, bin) — doc count, token total, and the documents'
    * concatenated text in id order (single-space separated), the blob
    * a training shard-writer serializes.
    *
    * Scale design: one join on the id key, one (shard, bin) hash-agg;
    * the per-bin sort happens INSIDE the aggregated struct array
    * (`array_sort` over ≤ bin-capacity elements — per-row, not a
    * shuffle). Bin text size is bounded by `capacity` tokens, so rows
    * stay small no matter the corpus. Deterministic for unique ids —
    * the d21 gate digests every bin's exact text. */
  def materializePacked(docs: DataFrame, assignments: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val joined = assignments.join(
      docs.select(col(idCol).as("id"), col(textCol).as("__text")), "id")
    joined.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("n_tokens"),
        array_sort(collect_list(struct(col("id").as("i"),
          col("__text").as("t")))).as("__parts"))
      .withColumn("packed_text",
        array_join(transform(col("__parts"), p => p.getField("t")), " "))
      .drop("__parts")
  }

  /** The engine-portable sample order key: `md5(id)`, with NULL ids
    * REFUSED loudly — NULL hashes to NULL and the id tiebreak is NULL
    * too, so all NULL-id rows would tie, sort first (asc nulls-first),
    * and fill quotas with an arbitrary run-dependent subset, silently
    * breaking the samplers' deterministic contract. The
    * [[globalOrderIndex]] rule, applied to all four samplers. */
  private def md5Order(idCol: String): org.apache.spark.sql.Column =
    when(col(idCol).isNull,
      raise_error(lit("sampling requires non-null ids (md5 order)")))
      .otherwise(md5(col(idCol).cast("string")))

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
      .orderBy(md5Order(idCol), col(idCol))
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= quota)
      .drop(rk)
  }

  /** Deterministic global training order: every row gets a contiguous
    * 0-based `order_idx` in the engine-portable `md5(id)` shuffle
    * order — reproducible corpus shuffling, the property a resumable
    * training run needs (epoch N's order must be recomputable by any
    * engine, any cluster size).
    *
    * Scale design: a single GLOBAL `row_number` would sort the corpus
    * into ONE partition — the canonical driver-bottleneck mistake.
    * Instead, two-level numbering: rows bucket by their digest's first
    * byte (256 buckets), each bucket numbers its rows independently
    * (one shuffle, 256-way parallel), and each bucket's global offset
    * is the running sum of bucket COUNTS — a 256-row aggregate
    * broadcast back. `global_idx = offset(bucket) + rank - 1`. The
    * md5 order sorts digest-first, so bucket-major numbering equals
    * the global order exactly. */
  def globalOrderIndex(df: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dig = graft.util.Names.fresh(df.columns)(i => s"__graft_md5$i")
    val bkt = graft.util.Names.fresh(df.columns :+ dig)(i => s"__graft_b$i")
    val rk = graft.util.Names.fresh(df.columns ++ Seq(dig, bkt))(
      i => s"__graft_rk$i")
    val off = graft.util.Names.fresh(df.columns ++ Seq(dig, bkt, rk))(
      i => s"__graft_off$i")
    // a NULL id has no digest, so no place in a REPRODUCIBLE order (and
    // ties among several NULLs would be nondeterministic) — fail loud
    // instead of silently dropping the row at the bucket join
    val keyed = df
      .withColumn(dig, when(col(idCol).isNull,
          raise_error(lit("globalOrderIndex requires non-null ids")))
        .otherwise(md5(col(idCol).cast("string"))))
      .withColumn(bkt, substring(col(dig), 1, 2))
    val offsets = keyed.groupBy(col(bkt))
      .agg(count(lit(1)).as(off))
      .withColumn(off,
        coalesce(sum(col(off)).over(
          Window.orderBy(col(bkt))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val w = Window.partitionBy(col(bkt)).orderBy(col(dig), col(idCol))
    keyed.withColumn(rk, row_number().over(w))
      .join(broadcast(offsets), Seq(bkt))
      .withColumn("order_idx", col(off) + col(rk) - 1L)
      .drop(dig, bkt, rk, off)
  }

  /** Sliding-window document chunking: split each document into
    * token-window chunks of `chunkSize` with `overlap` tokens carried
    * between consecutive chunks (the step before embedding or packing
    * — long documents must be cut to the model's context, and the
    * overlap keeps boundary sentences visible to both sides).
    *
    * Chunk starts advance by `stride = chunkSize - overlap`; the last
    * chunk may be shorter; a document with at most `chunkSize` tokens
    * yields exactly one chunk; an empty document yields none. Emits
    * (id, chunk_idx, n_tokens, chunk_text).
    *
    * Scale design: pure per-row array expressions (tokenize once,
    * `transform` over the chunk-start sequence, one `explode`) — no
    * shuffle, no UDF; output row count is input tokens / stride. The
    * chunk count per row is integer arithmetic, so the operator is
    * engine-portable and d16 hash-gates it end to end. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    // raw whitespace tokens (no case folding — chunk text must be
    // faithful to the source document). Whitespace is collapsed BEFORE
    // the trim: Spark's trim() strips only spaces and split(limit -1)
    // keeps edge empty strings, so text ending in '\n' would otherwise
    // grow a phantom '' token that inflates n_tokens and shifts every
    // chunk. chunk_text space-joins tokens anyway, so collapsing runs
    // of whitespace loses no digest information.
    val normText = trim(regexp_replace(col(textCol), "\\s+", " "))
    val toks = split(normText, " ")
    val n = when(length(normText) === 0, lit(0L))
      .otherwise(size(toks).cast("long"))
    // exact integer ceil((n - chunkSize) / stride) + 1, floor-safe for
    // positives; doubles are exact far beyond any real token count
    val nChunks = when(n === 0, lit(0L))
      .when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + stride - 1).cast("double") /
        stride).cast("long") + 1L)
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .where(col("__nc") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), col("__nc") - 1L)).as("chunk_idx"),
        col("__toks"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkSize)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Content-defined chunking (the FastCDC/rolling-hash shape at token
    * granularity): a chunk boundary falls AFTER token position e
    * whenever the `window`-token span ending at e hashes into the
    * boundary set (md5 hex starting with `boundaryPrefix`; P(cut) =
    * 16^-len(prefix) per position), plus a forced final cut at the
    * document end. Boundaries depend only on LOCAL content, so an
    * insertion early in a document disturbs chunks only up to the next
    * qualifying window — every later chunk re-aligns and keeps its
    * digest. That re-alignment is what makes chunk-level dedup robust
    * to edits; fixed-stride chunking ([[chunkByTokens]]) loses every
    * chunk after an insertion. Deliberately unclamped (no min/max
    * chunk size): expected chunk length is 16^len(prefix) tokens with
    * a geometric tail, and clamping would make each cut depend on the
    * previous one — a sequential fold both engines would then have to
    * replay instead of an independent per-position test.
    *
    * Emits (id, chunk_idx, n_tokens, chunk_md5). Tokens are raw
    * whitespace splits (no case folding — the digest must witness the
    * source text). Pure per-row array expressions, no shuffle; md5 is
    * the portable hash so the d40 oracle replays windows, cuts, and
    * chunk digests verbatim in DuckDB (the d27 discipline). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 5, boundaryPrefix: String = "0"): DataFrame = {
    require(window > 0 && boundaryPrefix.nonEmpty &&
      boundaryPrefix.forall("0123456789abcdef".contains(_)),
      "window > 0; boundaryPrefix must be lowercase hex")
    // collapse whitespace before the trim (same rationale as
    // [[chunkByTokens]]): otherwise newline-terminated text — common in
    // crawled corpora — grows a phantom '' edge token that shifts every
    // window hash and chunk digest, and an all-'\n' document would slip
    // past the space-only trim() emptiness filter
    val normText = trim(regexp_replace(col(textCol), "\\s+", " "))
    val toks = split(normText, " ")
    val base = df
      .where(col(textCol).isNotNull && length(normText) > 0)
      .select(col(idCol), toks.as("__toks"))
    val n = size(col("__toks"))
    // candidate cut positions: ascending by construction (transform
    // over an ascending sequence), so the final forced cut appends
    // in order — no sort, no order-destroying distinct
    val cand = when(n < window, array().cast("array<int>"))
      .otherwise(filter(
        transform(sequence(lit(1), n - window + 1), i =>
          when(substring(md5(concat_ws(" ",
              slice(col("__toks"), i, lit(window)))),
            1, boundaryPrefix.length) === boundaryPrefix,
            (i + window - 1).cast("int"))
            .otherwise(lit(null).cast("int"))),
        x => x.isNotNull))
    val cuts = when(size(cand) > 0 && element_at(cand, -1) === n, cand)
      .otherwise(concat(cand, array(n.cast("int"))))
    base.select(col(idCol), col("__toks"), cuts.as("__cuts"))
      .select(col(idCol), col("__toks"), col("__cuts"),
        posexplode(col("__cuts")).as(Seq("__k", "__end")))
      .withColumn("__prev", when(col("__k") === 0, lit(0))
        .otherwise(element_at(col("__cuts"), col("__k"))))
      .select(col(idCol), col("__k").cast("long").as("chunk_idx"),
        slice(col("__toks"), col("__prev") + 1,
          col("__end") - col("__prev")).as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_md5"))
  }

  /** Temperature-style corpus rebalancing: each stratum's quota is
    * `ceil(n^(1/temperature))` of its own row count, rows chosen by the
    * same portable md5 order as [[stratifiedSample]] — big sources are
    * downweighted sub-linearly instead of clipped to a flat quota (the
    * multi-source mixing rule LLM pretraining uses; temperature 1 keeps
    * everything).
    *
    * Scale design: the per-stratum count rides the SAME stratum-key
    * window partitioning as the rank — one shuffle total, no
    * aggregate/join side-trip (and, unlike an inner equi-join on the
    * stratum, a NULL stratum — rows with a missing source label — is a
    * partition like any other and samples instead of vanishing).
    * Unlike [[stratifiedSample]]'s literal quota, a column-valued
    * quota can't ride WindowGroupLimit's map-side pruning — every
    * stratum row is ranked before the filter — but ranking is a
    * streaming pass over the sorted partition, so the extra cost is
    * the rank itself, not a second shuffle.
    *
    * Determinism: `temperature = 2` computes quotas with `sqrt` (an
    * exact, correctly-rounded IEEE op every engine agrees on — what the
    * d14 gate uses); other temperatures go through `pow`, which is
    * 1-ulp-accurate rather than exact, so quotas at pathological
    * boundaries could differ across engines by one row (rows-only
    * confidence there). */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
      temperature: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(temperature >= 1.0, "temperature must be >= 1")
    val rk = graft.util.Names.fresh(df.columns)(i => s"__graft_rk$i")
    val qt = graft.util.Names.fresh(df.columns :+ rk)(i => s"__graft_q$i")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5Order(idCol), col(idCol))
    val nCol = count(lit(1))
      .over(Window.partitionBy(col(stratumCol))).cast("double")
    val quota = ceil(
      if (temperature == 2.0) sqrt(nCol)
      else pow(nCol, lit(1.0 / temperature))).cast("long")
    df.withColumn(rk, row_number().over(w))
      .withColumn(qt, quota)
      .where(col(rk) <= col(qt))
      .drop(rk, qt)
  }

  /** Deterministic mixture composition — build an epoch sample whose
    * per-domain counts hit EXACT integer targets apportioned from
    * relative weights (the DoReMi/Pile "data mixture" recipe executed
    * exactly): quotas are the Hamilton / largest-remainder
    * apportionment of `totalN` over `weights` (floor of the
    * proportional share, leftover seats to the largest remainders,
    * remainder ties broken by stratum name), and each stratum takes
    * its quota's docs in the md5-hash order [[temperatureSample]]
    * established (uniform, seedless, reproducible). Strata missing
    * from `weights` contribute nothing; a stratum smaller than its
    * quota yields everything it has (the shortfall is visible as
    * fewer result rows than `totalN`).
    *
    * Returns the kept rows as `(stratumCol, idCol, quota)`.
    *
    * Scale shape: apportionment runs driver-side over the WEIGHT MAP
    * (model-sized, never data-sized); quotas broadcast-join onto the
    * corpus, and the per-stratum take is one hash-partition + ranked
    * window — the d14 sampling shape. All arithmetic is integer, so
    * the composition is bit-stable across engines and cluster
    * layouts. */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
      weights: Map[String, Long], totalN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(totalN >= 0, "totalN must be >= 0")
    val bigW = weights.values.foldLeft(BigInt(0))(_ + _)
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      bigW > 0, "weights must be non-negative, sum > 0")
    val spark = df.sparkSession
    import spark.implicits._
    // apportionment in BigInt: totalN * w overflows Long for
    // trillion-row corpora with large weights; the work is
    // model-sized (one entry per stratum), so exact arithmetic is
    // free — quotas convert back to Long at the end
    val base = weights.toSeq.map { case (s, w) =>
      val share = BigInt(totalN) * w
      (s, (share / bigW).toLong, share % bigW) }
    val leftover = (totalN - base.map(_._2).sum).toInt
    val quotas = base.sortBy { case (s, _, r) => (-r, s) }
      .zipWithIndex
      .map { case ((s, q, _), i) =>
        (s, q + (if (i < leftover) 1L else 0L)) }
      .toDF(stratumCol, "quota")
    val rk = graft.util.Names.fresh(df.columns :+ "quota")(i =>
      s"__graft_rk$i")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5Order(idCol), col(idCol))
    df.select(col(stratumCol), col(idCol))
      .join(broadcast(quotas), stratumCol)
      .withColumn(rk, row_number().over(w))
      .where(col(rk) <= col("quota"))
      .select(col(stratumCol), col(idCol), col("quota"))
  }

  /** Per-stratum BUDGET sampling — take documents in the deterministic
    * md5-hash order until a cumulative cost budget is exhausted: a row
    * is kept while its INCLUSIVE running cost stays ≤ `budget` (so the
    * sample never exceeds the budget; a first doc larger than the
    * whole budget is dropped). This is the "N tokens per domain" epoch
    * cut, with `costCol` supplying the per-doc cost (token count,
    * char count, bytes).
    *
    * Returns kept rows `(stratumCol, idCol, cost, cum_cost)`.
    *
    * Scale shape: one hash-partition by stratum + a running-sum
    * window over the hash order — the same single-shuffle shape as
    * [[temperatureSample]]; integer running sums keep the cut
    * bit-stable. Giant strata serialize through one partition's sort
    * (inherent to an exact per-stratum prefix cut) — salt-split very
    * large strata upstream if that ever dominates. */
  def budgetSample(df: DataFrame, stratumCol: String, idCol: String,
      costCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be >= 0")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5Order(idCol), col(idCol))
    val cum = graft.util.Names.fresh(df.columns)(i => s"__graft_cum$i")
    df.select(col(stratumCol), col(idCol),
        col(costCol).cast("long").as("cost"))
      .withColumn(cum, sum(col("cost")).over(w))
      .where(col(cum) <= budget)
      .select(col(stratumCol), col(idCol), col("cost"),
        col(cum).as("cum_cost"))
  }
}
