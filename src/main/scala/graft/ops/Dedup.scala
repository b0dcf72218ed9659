package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for ~100 TB corpora. Design notes per
  * operator on how the plan scales:
  *
  *  - exact: one hash-aggregate on a 128-bit digest (never the raw
  *    text) — shuffle carries (digest, id), not documents.
  *  - minhash LSH: per-row signature (narrow), explode to b band keys,
  *    shuffle on band key only; candidate pairs verified with true
  *    Jaccard before clustering. No all-pairs product anywhere.
  *  - simhash: 64-bit fingerprint, banded into 16-bit chunks for
  *    candidate generation, hamming-verified.
  *  - connected components: iterative min-label propagation over the
  *    candidate edge list (converges in O(log cluster-diameter) joins,
  *    each a key-partitioned shuffle — no driver-side union-find).
  */
object Dedup {

  /** Upper bound on [[semanticDedup]]'s probe-side salt replication —
    * the skew-split trade's shuffle-byte multiplier is capped here
    * (probe rows carry the full vector payload `salts` times). */
  val SemanticDedupMaxSalts = 16

  /** Exact dedup: keep the smallest id per identical (normalized)
    * text. NULL-text rows are never collapsed — a missing document
    * body is not "the same document" as another missing body — which
    * aligns the destructive semantics with [[minhashDedup]] and
    * [[minhashDedupBest]] (both keep every NULL-text row). Each NULL
    * row gets its own id-derived partition key, so a corpus with many
    * NULL texts does not funnel them into one skewed window
    * partition. */
  def exact(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val keyed = df.withColumn("__fp",
      coalesce(fp, concat(lit(" null:"), col(idCol).cast("string"))))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)
    keyed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Word shingles of size n over a PRE-SPLIT token array. Callers on
    * a hot path should project the token split into its own column
    * first ([[tokenized]]): higher-order functions evaluate outside
    * codegen, where a `toks` SUBTREE (vs. a bound attribute) re-runs
    * the normalize+split regex once per reference per row — measured
    * ~2x on the d6 verify stage. */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column =
    // gram construction shared with TextAnalysis.ngrams (d12/d13 use
    // the same definition); the short-doc fallback — the whole text as
    // ONE shingle, so tiny documents still dedup — is dedup-specific
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(TextAnalysis.ngrams(toks, n))

  /** (id, token array) projection — the stage boundary that makes the
    * token split evaluate exactly once per document. */
  private def tokenized(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      split(TextAnalysis.normalized(col(textCol)), " ").as("__toks"))

  /** Word shingles of size n over the normalized text. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(split(TextAnalysis.normalized(text), " "), n)

  /** Per-seed re-hash of a base hash — the one-strong-hash + k cheap
    * re-mixes MinHash family: the shingle STRING is hashed once
    * (xxhash64), each of the k "hash functions" then re-hashes the
    * fixed-width (long, seed) pair. Hashing 12 fixed bytes per seed
    * replaces hashing the ~20-char shingle k times — the signature
    * stage's dominant cost. (A wrapping affine mix would be cheaper
    * still, but long multiply throws under ANSI mode, which is the
    * Spark 4 session default.) */
  private[graft] def mixHash(base: Column, k: Int): Column =
    xxhash64(base, lit(k))

  /** MinHash signature: base-hash each shingle once, k re-mixes, min
    * per seed. No distinct pass — a duplicate shingle cannot change a
    * min, and de-duplicating ~150-element string arrays is O(n²)
    * comparisons per document for nothing. Pure built-ins — stays in
    * codegen, no UDF. */
  def minhashSignature(text: Column, numHashes: Int): Column = {
    val base = transform(shingles(text), s => xxhash64(s))
    val hashes = (0 until numHashes).map { k =>
      array_min(transform(base, h => mixHash(h, k)))
    }
    array(hashes: _*)
  }

  /** (id, DISTINCT 64-bit-hashed shingle set) — the ONE corpus pass
    * the whole minhash pipeline derives from: signatures take per-seed
    * re-mix minimums over it ([[minhashSignatures]] — a duplicate
    * shingle cannot change a min, so the distinct is free for them),
    * and the verify stage computes Jaccard over it directly.
    *
    * Hashing shingles to longs BEFORE the set operations is the scale
    * lever: `array_distinct` / `array_intersect` / `array_union` on
    * string arrays are pairwise scans (O(m²) comparisons per document
    * — ~22k string compares at m≈150), while the primitive long path
    * uses an open hash set (O(m)); the verify-join payload also drops
    * from ~m×20 chars to m×8 bytes. Jaccard over the hashed sets
    * equals string-set Jaccard unless two DISTINCT shingles collide in
    * 64 bits — p ≈ m²·2⁻⁶⁵ per document (~10⁻¹⁶ at m=150), negligible
    * even across 10¹¹ documents. The d6b/d6c gates stay exact: d6c
    * gates the string-set [[jaccard]] column itself (unchanged), d6b's
    * planted pairs are exact copies (identical sets hash identically). */
  private[ops] def hashedShingleSets(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    tokenized(df, textCol, idCol)
      .select(col("__id"), array_distinct(
        transform(shinglesOfTokens(col("__toks")),
          s => xxhash64(s))).as("__hs"))

  /** MinHash signatures as an AGGREGATION: explode the hashed shingle
    * set to rows, re-mix once per seed, min-combine per document
    * (map-side partial min — parity-tested against
    * [[minhashSignature]]; the distinct in [[hashedShingleSets]]
    * cannot change any min).
    *
    * Why two forms exist: the column form is fastest when its stage
    * codegen-compiles, but fused into a join stage the k-wide tree
    * overflows the generated-method limit, the stage falls back to
    * interpreted eval, and without CSE the shingling regex re-runs per
    * seed per shingle — measured 100x+ on the d6 bench. The pipeline
    * therefore CACHES the banded frame ([[minhashCandidates]]) to keep
    * the column expression in its own codegen stage; this aggregate
    * form is the fallback shape for callers that need signatures
    * joined elsewhere without managing stage isolation themselves. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int): DataFrame = {
    // Explode the STRING shingles and hash per exploded row (rather
    // than deriving from [[hashedShingleSets]]): on an uncached input,
    // exploding a transform(...) subtree trips InferFiltersFromGenerate
    // — the inferred size>0/isnotnull filter is pushed below the
    // projection and re-evaluates the whole regex+shingle+hash tree
    // per row (measured 7x on this stage). The string-shingle generator
    // child dodges the inference; the hashed-set derivation is used
    // only on the CACHED pipeline path ([[minhashEdges]]), where the
    // generator child is a cache attribute and the filter is free.
    val exploded = tokenized(df, textCol, idCol)
      // no array_distinct: duplicates cannot change a min (see
      // [[minhashSignature]]), and the string distinct is O(m²)
      .select(col("__id"),
        explode(shinglesOfTokens(col("__toks"))).as("__s"))
      .select(col("__id"), xxhash64(col("__s")).as("__h"))
    val aggs = (0 until numHashes).map(k =>
      min(mixHash(col("__h"), k)).as(s"__h$k"))
    exploded.groupBy("__id").agg(aggs.head, aggs.tail: _*)
      .select(col("__id"),
        array((0 until numHashes).map(k => col(s"__h$k")): _*).as("__sig"))
  }

  /** Signature aggregation over an ALREADY-CACHED [[hashedShingleSets]]
    * frame — the pipeline-internal form ([[minhashEdges]] and the
    * incremental/indexed removal paths). Same values as
    * [[minhashSignatures]] (the set's distinct cannot change a min;
    * re-mix of the same base hashes). The AGGREGATE form (explode
    * hashed shingles once, re-mix once per seed, map-side min-combine)
    * is required here, not the k-wide column expression: even isolated
    * in its own cached stage, the column form's 32+ copies of the
    * shingling subtree overflow codegen's method limit, the stage
    * falls back to interpreted eval with no CSE, and the regex re-runs
    * per seed per shingle — measured 15x (12 s vs 0.8 s at sf0.001)
    * on the d6 bench. */
  private[ops] def signaturesOfHashedSets(hs: DataFrame,
      numHashes: Int): DataFrame = {
    val exploded = hs.select(col("__id"), explode(col("__hs")).as("__h"))
    val aggs = (0 until numHashes).map(k =>
      min(mixHash(col("__h"), k)).as(s"__h$k"))
    exploded.groupBy("__id").agg(aggs.head, aggs.tail: _*)
      .select(col("__id"),
        array((0 until numHashes).map(k => col(s"__h$k")): _*).as("__sig"))
  }

  /** Eagerly materialize a SMALL frame via localCheckpoint and release
    * the given upstream caches. Caches registered with CacheManager
    * leak until explicitly unpersisted; checkpoint blocks are released
    * by the ContextCleaner when the result is garbage-collected, so
    * repeated pipeline invocations in a long-lived session don't
    * accumulate executor storage. */
  private def materializeAndRelease(out: DataFrame,
      caches: DataFrame*): DataFrame = {
    val result = out.localCheckpoint(true)
    caches.foreach(_.unpersist(false))
    result
  }

  /** Candidate duplicate pairs via LSH banding: equal band-slices of
    * the minhash signature land in the same bucket. Returns (idA, idB)
    * with idA < idB, distinct.
    *
    * EAGER: the pair set (tiny relative to the corpus — that is the
    * point of LSH) is materialized before returning so the banded
    * cache below can be released immediately. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame =
    // Standalone entry point: the UNCACHED string-explode signature
    // path. Routing through a cached [[hashedShingleSets]] frame here
    // would materialize ~m×8 bytes/doc of corpus-wide hashed sets into
    // block storage solely to compute candidates — a storage/IO cost
    // only [[minhashEdges]] amortizes (its verify joins re-read the
    // sets). [[minhashSignatures]]' string-explode generator already
    // dodges the InferFiltersFromGenerate re-evaluation trap without
    // any cache (see its note), and the small banded frame is still
    // cached inside the banding step.
    bandedCandidates(
      minhashSignatures(df, textCol, idCol, numHashes), numHashes, bands)

  /** Band-explode a `(__id, __sig)` signature frame to
    * `(__id, __band, __bucket)` rows. */
  private[ops] def bandExplode(sig: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    sig.select(col("__id"), col("__sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("__band"))
      .withColumn("__bucket",
        hash(col("__band"), slice(col("__sig"),
          col("__band") * rows + 1, lit(rows))))
      .select("__id", "__band", "__bucket")
  }

  /** LSH banding over a `(__id, __sig)` signature frame. */
  private def bandedCandidates(sig: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    // CACHE the banded frame: both sides of the self-join read it, so
    // the signature aggregation runs once, not twice.
    val banded = bandExplode(sig, numHashes, bands).cache()
    val a = banded.as("a")
    val b = banded.as("b")
    val cands = a.join(b, col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    materializeAndRelease(cands, banded)
  }

  /** True n-gram Jaccard similarity between two shingle arrays —
    * array_intersect/array_union are codegen'd built-ins. */
  def jaccard(a: Column, b: Column): Column =
    when(size(a) === 0 && size(b) === 0, lit(1.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)))

  /** Verified near-duplicate edges: LSH candidates filtered by true
    * Jaccard over the hashed shingle sets. EAGER like
    * [[minhashCandidates]] — the verified edge list is even smaller
    * than the candidate set.
    *
    * ONE corpus pass: the cached [[hashedShingleSets]] frame feeds both
    * the signature aggregation (via [[candidatesOfHashedSets]]) and the
    * verify joins — the tokenize+shingle regex work runs once, not
    * twice, and the verify comparisons run on primitive longs (see the
    * [[hashedShingleSets]] scale note, including why the 2⁻⁶⁵ hash
    * collision odds don't move the d6b/d6c gates).
    *
    * `emitJaccard = false` drops the Jaccard column from the OUTPUT
    * (graph callers like [[minhashDedup]] never read it, and the
    * materialized edge list is then two ids narrower); the verify
    * filter always computes it. When emitted, the value is the Jaccard
    * of the 64-BIT HASHED shingle sets, not of the raw string-shingle
    * sets: it equals exact string-set Jaccard unless two distinct
    * shingles of the pair collide in 64 bits (~m²·2⁻⁶⁵ per document
    * pair — negligible, but a consumer treating the column as exact
    * string-set Jaccard should know the contract). The quotient itself
    * is an integer set-size division in double — bit-reproducible by
    * any engine: d6c_jaccard_arith hash-gates the non-trivial
    * quotients of the [[jaccard]] kernel, d6b_jaccard_verify gates
    * this pipeline end-to-end on planted exact pairs. */
  def minhashEdges(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, emitJaccard: Boolean = true): DataFrame = {
    // cached: the candidate stage's signature aggregation and both
    // verify-join sides read it; also keeps the shingle expression in
    // its own codegen stage instead of fusing into the join stages
    val hs = hashedShingleSets(df, textCol, idCol).cache()
    // LAZY candidate stage (r21): the verify join reads the candidate
    // subtree exactly once, so the intermediate pair-list barrier the
    // pipeline used to pay (an extra eager localCheckpoint job between
    // banding and verify) bought nothing — one barrier at the verified
    // edge list is enough, and the banded cache is released with it.
    val banded = bandExplode(
      signaturesOfHashedSets(hs, numHashes), numHashes, bands).cache()
    val cands = banded.as("a")
      .join(banded.as("b"), col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val edges = cands
      .join(hs.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__hs", "__hs_a"), "id_a")
      .join(hs.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__hs", "__hs_b"), "id_b")
      .withColumn("jaccard", jaccard(col("__hs_a"), col("__hs_b")))
      .where(col("jaccard") >= threshold)
    val out =
      if (emitJaccard) edges.select("id_a", "id_b", "jaccard")
      else edges.select("id_a", "id_b")
    materializeAndRelease(out, hs, banded)
  }

  /** Connected components over a near-dup edge list. Returns
    * (id, component = min id in the component).
    *
    * Two regimes, chosen by the materialized edge count:
    *  - `<= driverMaxEdges` (default 1M pairs ≈ 16 MB): union-find with
    *    path compression on the driver. A dedup graph's edge set is the
    *    VERIFIED near-dup pairs — tiny relative to the corpus even at
    *    100 TB — and 20 Spark rounds of joins over a few thousand rows
    *    cost more in job scheduling than the whole problem.
    *  - larger: distributed min-label propagation PLUS pointer doubling
    *    (each node also adopts its label's label), so path-shaped
    *    components collapse in O(log n) rounds, not O(n).
    *
    * Scale discipline in the distributed regime: the symmetric edge
    * list is cached once (it is re-joined every round — without the
    * cache the whole upstream LSH pipeline re-executes per iteration),
    * superseded label caches are unpersisted as soon as the next round
    * is materialized, and lineage is truncated via localCheckpoint
    * every `checkpointInterval` rounds — bounded executor memory and no
    * 20-deep lineage at convergence. Only edge-touched nodes propagate;
    * singletons (the vast majority) rejoin at the end. */
  def connectedComponents(edges: DataFrame, ids: DataFrame,
      maxIter: Int = 20, checkpointInterval: Int = 5,
      driverMaxEdges: Int = 1000000): DataFrame = {
    val (labels, nodes) = edgeComponents(edges, maxIter,
      checkpointInterval, driverMaxEdges)
    val singletons = ids.select(col(ids.columns.head).as("id"))
      .join(broadcastIfLocal(nodes.select("id")), Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    labels.unionByName(singletons)
  }

  /** `broadcast()` hint only when the frame is a driver-local relation
    * (the [[driverComponents]] regime, provably tiny); a distributed
    * label frame keeps its planner-chosen strategy. */
  private def broadcastIfLocal(df: DataFrame): DataFrame =
    if (df.queryExecution.logical.collectFirst {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          true
      }.nonEmpty) broadcast(df)
    else df

  /** Component labels over EDGE-TOUCHED nodes only — the shared core
    * of [[connectedComponents]] (which rejoins singletons from a
    * caller id set) and the dedup drop-set paths (which never need
    * singletons: an untouched node is kept by construction). Returns
    * `(labels, nodes)`: labels = (id, component) for every node that
    * appears in an edge, nodes = those ids. In the driver regime both
    * are LocalRelations, so later joins against them carry true size
    * stats and broadcast at planning time. */
  private[ops] def edgeComponents(edges: DataFrame, maxIter: Int = 20,
      checkpointInterval: Int = 5,
      driverMaxEdges: Int = 1000000): (DataFrame, DataFrame) = {
    val e = edges.select(col("id_a"), col("id_b")).cache()
    val probe = e.limit(driverMaxEdges + 1).collect()
    if (probe.length <= driverMaxEdges) {
      e.unpersist(false)
      val labels = driverLabels(probe.map(r => (r.get(0), r.get(1))), edges)
      return (labels, labels.select("id"))
    }
    // symmetric edge list, reused every iteration
    val sym = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    // only nodes that appear in an edge participate in propagation —
    // in a dedup graph the overwhelming majority of documents are
    // singletons, and shuffling them through every iteration would
    // dominate the cost; they rejoin as (id, id) components at the end
    val edgeNodes = sym.select(col("src").as("id")).distinct().cache()
    var labels = edgeNodes.withColumn("component", col("id"))
    // plain caches are unpersisted as soon as the next round is FULLY
    // materialized (the count() below scans every partition, so the
    // successor never reads its parent again); checkpoint blocks ARE
    // the data of a lineage-truncated plan, so a checkpoint is only
    // released once the NEXT checkpoint exists
    var prevPlain: Option[DataFrame] = None
    var prevCheckpoint: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("component")).as("nmin"))
      val step = labels
        .join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"), col("component"),
          least(col("component"),
            coalesce(col("nmin"), col("component"))).as("c1"))
      // pointer doubling: labels form a forest pointing at smaller ids,
      // so label(label(u)) halves the distance to the root each round
      val parents = labels
        .select(col("id").as("p_id"), col("component").as("p_comp"))
      val updated0 = step
        .join(parents, step("c1") === col("p_id"), "left")
        .select(col("id"), col("component"),
          least(col("c1"), coalesce(col("p_comp"), col("c1")))
            .as("newcomp"))
        .select(col("id"), col("newcomp").as("component"),
          (col("newcomp") < col("component")).as("changed"))
      val checkpointRound = (iter + 1) % checkpointInterval == 0
      // eager localCheckpoint materializes every partition and truncates
      // lineage; on other rounds cache() + the full count() below does
      // the materializing
      val updated =
        if (checkpointRound) updated0.localCheckpoint(true)
        else { updated0.cache(); updated0 }
      // FULL count (no limit-1 short-circuit): every partition of this
      // round lands in the cache, so superseded rounds really are dead
      val t0 = System.nanoTime()
      val changes = updated.where(col("changed")).count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] iter=$iter changes=$changes " +
          f"took=${(System.nanoTime() - t0) / 1e9}%.2fs")
      prevPlain.foreach(_.unpersist(false))
      prevPlain = if (checkpointRound) None else Some(updated)
      if (checkpointRound) {
        prevCheckpoint.foreach(_.unpersist(false))
        prevCheckpoint = Some(updated)
      }
      labels = updated.select("id", "component")
      converged = changes == 0
      iter += 1
    }
    // Pin the (bounded: edge-touched nodes only) final labels and node
    // set as checkpoint blocks, then release every CacheManager entry
    // the loop created — the returned plan must not depend on caches a
    // long-lived session would otherwise accumulate. Checkpoint blocks
    // free themselves when the result is GC'd (ContextCleaner).
    val finalLabels = labels.localCheckpoint(true)
    val nodeSet = edgeNodes.localCheckpoint(true)
    prevPlain.foreach(_.unpersist(false))
    prevCheckpoint.foreach(_.unpersist(false))
    edgeNodes.unpersist(false)
    sym.unpersist(false)
    e.unpersist(false)
    (finalLabels, nodeSet)
  }

  /** Small-graph path: union-find with path compression on the driver,
    * canonical label = min member per set, emitted as a LocalRelation
    * (true size stats — see [[edgeComponents]]). Exact same semantics
    * as the distributed loop. */
  private def driverLabels(pairs: Array[(Any, Any)],
      edges: DataFrame): DataFrame = {
    val parent = collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(rb) = ra
    }
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    // canonical label: the minimum member of each set
    val minOf = collection.mutable.HashMap.empty[Any, Any]
    parent.keys.foreach { m =>
      val r = find(m)
      minOf.get(r) match {
        case Some(cur) => if (lt(m, cur)) minOf(r) = m
        case None => minOf(r) = m
      }
    }
    val spark = edges.sparkSession
    val idType = edges.schema("id_a").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("component", idType)))
    val rows = parent.keys.toSeq.map(m =>
      org.apache.spark.sql.Row(m, minOf(find(m))))
    // LocalRelation, not parallelize: a driver-local row list behind an
    // RDD planned as LogicalRDD carries defaultSizeInBytes (treated as
    // huge), so every later join against the labels planned sort-merge
    // and shuffled the OTHER side; the LocalRelation's true size lets
    // Catalyst broadcast it at planning time (r21, guide §3.1).
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  /** MinHash-LSH near-dedup end to end: keep the minimum id per
    * verified duplicate cluster.
    *
    * EXACT duplicates are collapsed to one representative (min id per
    * normalized-text fingerprint) BEFORE the LSH stage. This is not an
    * approximation — identical texts have identical signatures, so
    * every group member shares every bucket with its representative
    * and lands in the representative's component with Jaccard exactly
    * 1; the kept set (min id per component) is provably unchanged. It
    * is a SCALE requirement: a B-copy boilerplate group (B can reach
    * millions at 100 TB) would otherwise emit B² candidate pairs from
    * each of its shared buckets — the one quadratic blowup LSH banding
    * cannot protect against on its own. After the collapse, B copies
    * cost one digest-window pass and contribute ONE row to the pair
    * stage; the kept representative per component is the component
    * label itself (min doc id = min rep id, since each rep is already
    * the minimum of its copy group).
    *
    * NULL-text documents are EXCLUDED from the collapse (a NULL
    * fingerprint groups all of them, but they produce no shingles and
    * so never reach any component — the equivalence proof above holds
    * only for actual identical texts). They pass through as their own
    * representatives and are all kept, exactly as before the
    * collapse. */
  def minhashDedup(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    // exact() IS the collapse (min id per normalized-text fingerprint,
    // one fingerprint-keyed window) — reuse it rather than restate it
    val reps = exact(df.where(col(textCol).isNotNull), textCol, idCol)
      .unionByName(df.where(col(textCol).isNull))
    val edges = minhashEdges(reps, textCol, idCol, numHashes, bands,
      threshold, emitJaccard = false) // graph caller: ids only
    // Keep = reps MINUS the small drop set, not a corpus-sized keep
    // set (r21, guide §2.4): a representative drops iff it is
    // edge-touched and not its component's min — so components are
    // labeled over EDGE-TOUCHED nodes only (tiny: the verified
    // near-dup neighborhood) and the final step is one anti-join of
    // the windowed reps against that drop list. The previous shape
    // (components over ALL rep ids, then df ⋈ distinct component
    // labels) re-ran the exact() window a second time for the
    // singleton id set and shuffled a corpus-sized keep list twice;
    // all three corpus-sized exchanges are gone. The drop list is
    // bounded by the touched set; at bench scale AQE broadcasts it,
    // at 100 TB a huge near-dup neighborhood degrades to a shuffled
    // anti-join of ids — still never a corpus-payload shuffle.
    reps.join(dropSet(edges, idCol), Seq(idCol), "left_anti")
  }

  /** Ids to DROP among a verified edge list's touched nodes: every
    * edge-touched node that is not its component's min-id label.
    * Shared by [[minhashDedup]] and [[minhashDedupBest]] (the latter
    * ranks by quality instead — see its inline window). */
  private def dropSet(edges: DataFrame, idCol: String): DataFrame =
    edgeComponents(edges)._1
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))

  /** Near-dup dedup keeping the BEST copy per duplicate cluster —
    * highest `qualityCol`, ties broken by lowest id — instead of
    * [[minhashDedup]]'s arbitrary min-id canonical. This is the
    * variant a real training-data pipeline wants: among near-duplicate
    * crawls of a page, keep the cleanest capture (longest text, best
    * quality score), not whichever happened to get the smallest id.
    *
    * Scale shape: exact copies pre-collapse to their QUALITY-BEST
    * member per normalized-text fingerprint (one fingerprint-keyed
    * window — the same scale requirement [[minhashDedup]]'s min-id
    * collapse serves: a boilerplate group of B byte-identical docs
    * would otherwise share every LSH bucket and emit ~B² candidate
    * pairs, the one quadratic blowup banding cannot protect against).
    * The collapse preserves keep-best semantics exactly: a cluster's
    * global (max quality, min id) winner is also the winner of its own
    * exact group, so it IS that group's representative and wins among
    * representatives. The quality window then runs over CLUSTERED
    * representatives only — untouched representatives survive the
    * drop-set anti-join by construction (they are in no component), so
    * no singleton bypass is needed. NULL-text rows cannot cluster and
    * are always kept. */
  def minhashDedupBest(df: DataFrame, qualityCol: String,
      textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cFp = graft.util.Names.fresh(df.columns)(i => s"__graft_fp$i")
    val wExact = Window.partitionBy(col(cFp))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    val reps = df.where(col(textCol).isNotNull)
      .withColumn(cFp, TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rk", row_number().over(wExact))
      .where(col("__rk") === 1)
      .drop("__rk", cFp)
    val edges = minhashEdges(reps, textCol, idCol, numHashes, bands,
      threshold, emitJaccard = false)
    // the components frame's (id, component) columns get fresh names
    // BEFORE the join: a caller whose idCol is literally "id" (or
    // qualityCol "component") would otherwise make the unqualified
    // window references below ambiguous at analysis
    val cId = graft.util.Names.fresh(df.columns)(i => s"__graft_cid$i")
    val cComp = graft.util.Names.fresh(df.columns :+ cId)(
      i => s"__graft_comp$i")
    val comps = edgeComponents(edges)._1
      .select(col("id").as(cId), col("component").as(cComp))
    // Drop-set shape (r21, guide §2.3/§2.4 — see [[minhashDedup]]):
    // a clustered representative drops iff it is NOT its component's
    // quality-best member. Quality is looked up with a NARROW
    // (id, quality) corpus projection hash-joined against the tiny
    // components frame — not by re-running the exact-collapse window a
    // second and third time as the previous best/untouched unions did
    // — and the final step is one anti-join of the windowed reps
    // against the drop list plus the NULL-text bypass, replacing the
    // corpus-sized keep-list semi-join.
    val quality = df.select(col(idCol).as(cId),
      col(qualityCol).as("__graft_q"))
    val w = Window.partitionBy(cComp)
      .orderBy(col("__graft_q").desc, col(cId).asc)
    val dropped = quality.join(comps, Seq(cId))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") > 1)
      .select(col(cId).as(idCol))
    reps.join(dropped, Seq(idCol), "left_anti")
      .unionByName(df.where(col(textCol).isNull))
  }

  // ------------- incremental dedup: new batch vs a canonical base

  /** Ids of NEW rows to drop so `base ∪ new` stays exact-duplicate
    * free when `base` is canonical (already deduplicated, never
    * rewritten): a new row duplicating ANY base row is dropped — base
    * always wins, whatever the ids — and within new-only duplicate
    * groups the smallest id survives. NULL-text new rows are always
    * kept (the [[exact]] convention). Ids must be unique across
    * base ∪ new.
    *
    * THE operational dedup shape at 100 TB: a daily batch must not pay
    * a full-corpus re-dedup (read + REWRITE of everything). Cost here
    * is one digest-only projection of the base — the corpus is scanned
    * once and, when the new batch is broadcastable, never shuffled at
    * all (the base side carries only a 32-byte fingerprint per row
    * into a hash join against the batch's fingerprints; no base
    * pre-distinct, which would force a corpus-wide shuffle) — plus one
    * window over the batch. The result is a removal id list the caller
    * commits as a row-level delete of NEW rows only. */
  def incrementalExactRemovals(newDf: DataFrame, baseDf: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    exactRemovalsVsFingerprints(
      newDf.where(col(textCol).isNotNull)
        .select(col(idCol),
          TextAnalysis.fingerprint(col(textCol)).as("__fp")),
      baseDf.where(col(textCol).isNotNull)
        .select(TextAnalysis.fingerprint(col(textCol)).as("__fp")),
      idCol)

  /** [[incrementalExactRemovals]] with the base side read from a
    * persisted [[signatureFrame]] index instead of the base corpus —
    * the daily-batch cost drops from one base TEXT pass to one scan of
    * the index's 16-byte `fp` column. Same policy, same output. */
  def indexedExactRemovals(newDf: DataFrame, indexDf: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    exactRemovalsVsFingerprints(
      newDf.where(col(textCol).isNotNull)
        .select(col(idCol),
          TextAnalysis.fingerprint(col(textCol)).as("__fp")),
      indexDf.select(col("fp").as("__fp")),
      idCol)

  /** Shared exact-mode tail: `nf` = (idCol, __fp) of the new batch,
    * `bf` = (__fp) of the canonical base. */
  private def exactRemovalsVsFingerprints(nf: DataFrame, bf: DataFrame,
      idCol: String): DataFrame = {
    // one match row per (base row, batch fp) hit; ids dedup below —
    // cheaper than pre-distincting the corpus-sized digest set
    val dupVsBase = bf.join(nf, Seq("__fp")).select(col(idCol))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)
    val dupWithinNew = nf.withColumn("__rn", row_number().over(w))
      .where(col("__rn") > 1).select(col(idCol))
    dupVsBase.unionAll(dupWithinNew).distinct()
  }

  /** Ids of NEW rows to drop so `base ∪ new` stays NEAR-duplicate free
    * when `base` is canonical: a new row whose near-dup component
    * contains ANY base member is dropped (base wins); a new-only
    * component keeps its smallest id — or, with `qualityCol`, its
    * best-quality member (min id on ties), the [[minhashDedupBest]]
    * rule. NULL-text rows never cluster and are kept. Ids must be
    * unique across base ∪ new.
    *
    * Scale shape: signatures + banding run over base ∪ new — ONE
    * corpus pass, the unavoidable cost without a persisted signature
    * index — but the candidate band-join is one-sided: only buckets'
    * NEW members probe, so old–old pairs are never generated and the
    * verify/component stages scale with the new batch's neighborhood,
    * not the corpus. */
  def incrementalMinhashRemovals(newDf: DataFrame, baseDf: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.8,
      qualityCol: Option[String] = None): DataFrame = {
    val all = baseDf.select(col(idCol), col(textCol))
      .unionAll(newDf.select(col(idCol), col(textCol)))
    val newIds = newDf.select(col(idCol).as("__nid"))
    // one corpus pass: cached hashed shingle sets feed the signature
    // aggregation and both verify-join sides (the minhashEdges shape)
    val hs = hashedShingleSets(all, textCol, idCol).cache()
    val banded = bandExplode(
      signaturesOfHashedSets(hs, numHashes), numHashes, bands).cache()
    // ONE-SIDED band join: new members probe the full bucket list, so
    // every candidate pair touches ≥1 new row by construction
    val bandedNew = banded
      .join(newIds, banded("__id") === col("__nid"), "left_semi")
    val cands = bandedNew.as("a")
      .join(banded.as("b"), col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") =!= col("b.__id"))
      .select(least(col("a.__id"), col("b.__id")).as("id_a"),
        greatest(col("a.__id"), col("b.__id")).as("id_b"))
      .distinct()
    // single barrier (r21): the verify join reads the candidate
    // subtree exactly once, so candidates stay lazy and only the
    // verified edge list is materialized — one checkpoint job instead
    // of two; both caches release at that point
    val edges = cands
      .join(hs.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__hs", "__hs_a"), "id_a")
      .join(hs.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__hs", "__hs_b"), "id_b")
      .where(jaccard(col("__hs_a"), col("__hs_b")) >= threshold)
      .select("id_a", "id_b")
    val verified = materializeAndRelease(edges, hs, banded)
    removalPolicy(verified, newIds, newDf, idCol, qualityCol)
  }

  /** Shared incremental removal policy over VERIFIED new-touching
    * edges: new members of a base-containing component always drop
    * (base wins, whatever the ids); a new-only component keeps its
    * min id — or, with `qualityCol`, its best-quality member. */
  private def removalPolicy(verified: DataFrame, newIds: DataFrame,
      newDf: DataFrame, idCol: String,
      qualityCol: Option[String]): DataFrame = {
    // edgeComponents, not connectedComponents(verified, touched): the
    // id set of interest IS the edge-touched set, so the singleton
    // rejoin was a no-op — and skipping it keeps the driver-regime
    // labels a LocalRelation with true size stats (broadcast joins
    // below instead of shuffling the batch side; r21, guide §3.1)
    val flagged = edgeComponents(verified)._1
      .join(newIds, col("id") === col("__nid"), "left")
      .select(col("id"), col("component"),
        col("__nid").isNotNull.as("__is_new"))
    // ONE window pass for both drop rules (r21): the former
    // dropVsBase ∪ dropWithinNew union evaluated the flagged subtree
    // (components ⋈ batch ids, plus the batch scan for quality) once
    // per branch and paid a distinct exchange to merge. Fused rule:
    // a NEW member drops iff its component contains an old member, OR
    // it is not rank 1 within its component. Equivalence: in a
    // has-old component `__has_old` alone drops every new member
    // (rank irrelevant); in a new-only component there are no old
    // rows, so the rank over ALL members equals the old rank over new
    // members (old rows, when quality-joined, carry NULL quality and
    // sort last — also irrelevant, has-old components never reach the
    // rank test). Ids are unique per component member, so no distinct
    // is needed.
    // ONE Window node (r22): the rank and the has-old flag share the
    // same partition key AND the same ordering, so both window
    // functions live in a single WindowExec — the flag's max declares
    // an explicit whole-partition frame (a full-partition max is
    // ordering-independent, so attaching the rank's ordering changes
    // no value). The previous unordered second spec planned a second
    // Window node (and its sort) over the same exchange.
    val (ranked, w) = qualityCol match {
      case Some(q) =>
        val quality = newDf.select(col(idCol).as("__qid"),
          col(q).as("__qv"))
        (flagged.join(quality, col("id") === col("__qid"), "left"),
          Window.partitionBy(col("component"))
            .orderBy(col("__qv").desc, col("id").asc))
      case None =>
        (flagged, Window.partitionBy(col("component"))
          .orderBy(col("id").asc))
    }
    val wFull = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // one SELECT carrying both window expressions: sequential
    // withColumn calls insert a Project between the two Window
    // operators, which blocks CollapseWindow — extracted together,
    // the analyzer groups them into the single node (plan-pinned by
    // DedupSpec)
    ranked
      .select(col("id"), col("__is_new"),
        row_number().over(w).as("__rk"),
        (max(when(!col("__is_new"), 1).otherwise(0)).over(wFull) === 1)
          .as("__has_old"))
      .where(col("__is_new") && (col("__has_old") || col("__rk") > 1))
      .select(col("id").as(idCol))
  }

  // ------------- persisted signature index

  /** Per-row signature over an already-hashed shingle set — the same
    * values as [[minhashSignature]] / [[signaturesOfHashedSets]] (min
    * of per-seed re-mixes; order and duplicates cannot change a min).
    * Per-row beats the explode+groupBy form here because `hs` is a
    * bound attribute, not an expensive subtree: each of the k
    * `array_min(transform(...))` branches is independent O(m) work
    * with nothing shared to lose to a codegen fallback, and the
    * shuffle the aggregation form pays disappears entirely. */
  private def sigOfHashedSet(hs: Column, numHashes: Int): Column =
    array((0 until numHashes).map(k =>
      array_min(transform(hs, h => mixHash(h, k)))): _*)

  /** The persistable dedup-index payload — ONE corpus text pass
    * produces `(idCol, fp, hs, sig)` per non-NULL-text document:
    * `fp` the [[exact]]-mode 128-bit normalized-text fingerprint,
    * `hs` the DISTINCT 64-bit-hashed shingle set (the verify-stage
    * operand), `sig` the k-minhash signature (NULL for zero-shingle
    * documents, which never band — the pipeline's behavior for them).
    * Persist this once (e.g. as a table via
    * `CALL graft.system.build_dedup_index`), then every daily batch
    * dedups against the INDEX — [[indexedExactRemovals]] /
    * [[indexedMinhashRemovals]] — without ever re-reading or
    * re-shingling the base corpus: the 100 TB text pass is paid once,
    * not once per batch. */
  def signatureFrame(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 64): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(idCol),
        TextAnalysis.fingerprint(col(textCol)).as("fp"),
        split(TextAnalysis.normalized(col(textCol)), " ").as("__toks"))
      .select(col(idCol), col("fp"), array_distinct(
        transform(shinglesOfTokens(col("__toks")),
          s => xxhash64(s))).as("hs"))
      .select(col(idCol), col("fp"), col("hs"),
        when(size(col("hs")) > 0,
          sigOfHashedSet(col("hs"), numHashes)).as("sig"))

  /** [[incrementalMinhashRemovals]] with the base side read from a
    * persisted [[signatureFrame]] index: the base corpus is never
    * re-read, re-tokenized, or re-shingled — banding probes the
    * index's stored signatures and the verify joins read its stored
    * hashed shingle sets. Identical policy and (up to identical
    * signatures, which the index stores exactly) identical output.
    *
    * Scale shape: per-batch cost is one batch text pass plus two
    * index COLUMN scans (`sig` for banding, `hs` for verify — both
    * narrow relative to text); when the batch's banded frame
    * broadcasts, the index side of the candidate join never shuffles.
    * `numHashes`/`bands` must match the index build (the procedure
    * validates via the index table's properties).
    *
    * Profiled at sf0.1 (graft.ops.ProfileD41, 5 000-doc index,
    * 1 625-doc batch): no stage dominates — batch shingle 0.29 s,
    * signatures 0.25 s, band+cache 0.59 s, index banding 0.13 s,
    * candidate join 0.51 s (plan-verified BroadcastHashJoin,
    * batch side built), verify joins 0.49 s. The remaining wall time
    * is per-job scheduling overhead across the six small stages and
    * the two deliberate materialization barriers (the checkpoints
    * that keep the candidate subtree from evaluating twice in the
    * verify join), NOT a shuffle or scan problem: the barriers are
    * O(pair-count), and every data-sized exchange is already
    * eliminated. At production scale the stages amortize; at bench
    * scale this overhead is the floor. */
  def indexedMinhashRemovals(newDf: DataFrame, indexDf: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.8,
      qualityCol: Option[String] = None): DataFrame = {
    // batch-sized (not corpus-sized) cache: feeds the signature
    // aggregation AND the verify joins — the hot path uses the
    // codegen'd AGG signature form, not [[sigOfHashedSet]]'s per-row
    // transform tree (higher-order functions evaluate interpreted;
    // measured ~2x on the batch stage — per-row is reserved for the
    // one-time index BUILD, where it saves a corpus-wide shuffle)
    val newHs = hashedShingleSets(newDf, textCol, idCol).cache()
    val newIds = newDf.select(col(idCol).as("__nid"))
    val idxSig = indexDf.select(col(idCol).as("__id"),
      col("hs").as("__hs"), col("sig").as("__sig"))
    // cached: probe side of the band join AND part of its bucket list
    val bandedNew = bandExplode(
      signaturesOfHashedSets(newHs, numHashes), numHashes, bands).cache()
    val bandedIdx = bandExplode(
      idxSig.where(col("__sig").isNotNull).select("__id", "__sig"),
      numHashes, bands)
    // one-sided probe: batch members vs (batch ∪ index) buckets —
    // old–old pairs are never generated, exactly the
    // [[incrementalMinhashRemovals]] candidate contract
    val cands = bandedNew.as("a")
      .join(bandedIdx.unionAll(bandedNew).as("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__bucket") === col("b.__bucket") &&
          col("a.__id") =!= col("b.__id"))
      .select(least(col("a.__id"), col("b.__id")).as("id_a"),
        greatest(col("a.__id"), col("b.__id")).as("id_b"))
      .distinct()
    // single barrier (r21): candidates stay lazy — the verify join
    // reads the candidate subtree exactly once, so the old
    // intermediate pair-list checkpoint bought nothing; one
    // materialization at the verified edge list releases both caches
    val hsAll = newHs.select("__id", "__hs")
      .unionAll(idxSig.select("__id", "__hs"))
    val edges = cands
      .join(hsAll.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__hs", "__hs_a"), "id_a")
      .join(hsAll.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__hs", "__hs_b"), "id_b")
      .where(jaccard(col("__hs_a"), col("__hs_b")) >= threshold)
      .select("id_a", "id_b")
    val verified = materializeAndRelease(edges, newHs, bandedNew)
    removalPolicy(verified, newIds, newDf, idCol, qualityCol)
  }

  /** 64-bit SimHash over word tokens: sign-aggregate each bit of each
    * token hash. Near-dups have small hamming distance. */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(TextAnalysis.normalized(text), " "))
    val hashes = transform(toks, t => xxhash64(t))
    val bitVotes = (0 until 64).map { bit =>
      // vote: +1 when bit set, -1 otherwise; popcount via shift & mask
      val votes = transform(hashes, h =>
        when(shiftright(h, bit).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(aggregate(votes, lit(0), (acc, v) => acc + v) > 0,
        shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    // NULL text fingerprints NULL, matching the aggregation form
    // ([[simhashFingerprints]] drops NULL-text docs): the bit votes'
    // `when(NULL > 0, ...)` would otherwise default every bit to 0 and
    // all NULL documents would share fingerprint 0L — banding would
    // then collapse a corpus's missing-body rows as mutual near-dups
    when(text.isNull, lit(null).cast("long"))
      .otherwise(bitVotes.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** SimHash fingerprints as an AGGREGATION — same rationale as
    * [[minhashSignatures]]: the column form inlines the tokenization
    * into all 64 bit-vote subtrees, which melts down if the stage drops
    * out of codegen (no CSE in interpreted eval). Explode tokens once,
    * hash once, sum the 64 bit votes map-side. */
  def simhashFingerprints(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      explode(array_distinct(
        split(TextAnalysis.normalized(col(textCol)), " "))).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val votes = (0 until 64).map(bit =>
      sum(when(shiftright(col("__h"), bit).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$bit"))
    toks.groupBy("__id").agg(votes.head, votes.tail: _*)
      .select(col("__id"),
        (0 until 64).map(bit =>
          when(col(s"__b$bit") > 0, shiftleft(lit(1L), bit))
            .otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("__fp"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup edges: band the 64-bit fingerprint into four
    * 16-bit chunks (any pair within hamming<=3 of a 64-bit hash shares
    * at least one exact chunk), verify by full hamming distance. */
  def simhashEdges(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val fp = simhashFingerprints(df, textCol, idCol)
    val banded = fp.select(col("__id"), col("__fp"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("__fp"), i * 16).bitwiseAND(0xFFFF)
            .as("value"))): _*)).as("__b"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.__b") === col("b.__b") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__fp").as("__fa"), col("b.__fp").as("__fb"))
      .distinct()
      .where(hamming(col("__fa"), col("__fb")) <= maxHamming)
      .select("id_a", "id_b")
  }

  /** SemDeDup-style semantic dedup with explicit centroids: assign
    * every vector to its nearest centroid (per-row codegen argmin —
    * [[Similarity.nearestCell]], no corpus shuffle), then within each
    * cell drop any vector whose cosine to a LOWER-id cell-mate reaches
    * `threshold`. Returns the kept rows as (id, cell).
    *
    * The cluster-then-compare shape is the published algorithm's whole
    * point at scale: pairwise cosine runs only WITHIN a cell, so the
    * self-join shuffles by cell id and the pair count is bounded by the
    * largest cluster, never corpus². The keep rule (survive unless a
    * smaller id in your cell is this similar) is deterministic and
    * non-transitive — exactly what the e8 gate's DuckDB NOT-EXISTS
    * oracle replays. Norms are hoisted per row so the pair loop pays
    * one dot product per candidate ([[Similarity.cosineWithNorms]]).
    *
    * Production fit path: [[semanticDedupFit]] (KMeans centroids, same
    * downstream code). */
  def semanticDedup(df: DataFrame, centroids: Seq[Array[Double]],
      threshold: Double, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // cached: both self-join sides read it — the centroid argmin and
    // the norm evaluate once per vector, in their own codegen stage
    val assigned = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__n", Similarity.l2norm(col("__v")))
      .withColumn("__cell", Similarity.nearestCell(col("__v"), centroids))
      .cache()
    // SALTED pair join (r21, guide §2.5): keyed by cell alone, the
    // within-cell pair stage's parallelism is bounded by the NUMBER OF
    // CELLS (k reduce partitions at 100 TB however large the cluster)
    // — and when the build side broadcasts, by the probe side's input
    // split count. Each right-side row takes one deterministic salt
    // (id-hash — never rand(), SPARK-38388); the left side replicates
    // across all salts and is exchanged by (cell, salt), splitting
    // every cell's O(m²) dot products into `salts` independent
    // partitions. Pair coverage is exact: a (a, b) pair meets exactly
    // once, at b's salt. The dropped set is unchanged (and distinct()
    // guards it regardless).
    //
    // CAPPED at [[SemanticDedupMaxSalts]] (r22): each salt replicates
    // the probe side's VECTOR payload through the exchange, so
    // `defaultParallelism / nCells` unbounded would multiply shuffle
    // bytes ~1000x on a 10k-core cluster with few cells. 16 splits the
    // worst per-cell O(m²) pair work well past where scheduling
    // overhead dominates, for at most 16x payload replication.
    val salts = math.min(SemanticDedupMaxSalts,
      math.max(1, df.sparkSession.sparkContext
        .defaultParallelism / math.max(1, centroids.size)))
    val probe = assigned.withColumn("__salt",
        explode(array((0 until salts).map(lit(_)): _*)))
      .repartition(col("__cell"), col("__salt"))
    val build = assigned.withColumn("__salt",
      pmod(xxhash64(col("__id")), lit(salts.toLong)).cast("int"))
    val dropped = probe.as("a").join(build.as("b"),
        col("a.__cell") === col("b.__cell") &&
          col("a.__salt") === col("b.__salt") &&
          col("a.__id") < col("b.__id"))
      .where(Similarity.cosineWithNorms(col("a.__v"), col("b.__v"),
        col("a.__n"), col("b.__n")) >= threshold)
      .select(col("b.__id").as("__id")).distinct()
    val kept = assigned.join(dropped, Seq("__id"), "left_anti")
      .select(col("__id").as("id"), col("__cell").as("cell"))
    materializeAndRelease(kept, assigned)
  }

  /** [[semanticDedup]] with KMeans-fitted centroids (bounded
    * deterministic sample, the [[Similarity.ivfTopK]] fit posture) —
    * the production path when no codebook exists yet. Seed-dependent
    * via the fit, so gates run [[semanticDedup]] with planted
    * centroids instead (same downstream code path). */
  def semanticDedupFit(df: DataFrame, k: Int, threshold: Double,
      vecCol: String = "embedding", idCol: String = "vec_id",
      seed: Long = 42L, maxFitRows: Long = 100000L,
      rowCountHint: Option[Long] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = df.select(col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__features", array_to_vector(col("__cv")))
    val rows = rowCountHint.getOrElse(feats.count())
    val fitSet =
      if (rows <= maxFitRows) feats
      else feats.sample(withReplacement = false,
        math.min(1.0, maxFitRows.toDouble * 1.1 / rows), seed)
    val km = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("__cell")
    val model = km.fit(fitSet)
    semanticDedup(df, model.clusterCenters.map(_.toArray).toSeq,
      threshold, vecCol, idCol)
  }

  /** Embedding near-dup edges: cosine >= threshold, candidates via
    * random-hyperplane LSH (see [[Similarity.hyperplaneSignature]]). */
  def embeddingEdges(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", planes: Int = 16,
      threshold: Double = 0.95, seed: Long = 42L): DataFrame = {
    // cached: both self-join sides read it — signature AND norm
    // computed once per vector, and the planes-wide expression stays in
    // its own codegen stage instead of fusing into the join; the hoisted
    // norm keeps the verify stage at one dot product per candidate pair
    val sig = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__n", Similarity.l2norm(col("__v")))
      .withColumn("__sig",
        Similarity.hyperplaneSignature(col("__v"), planes, seed))
      .cache()
    val a = sig.as("a")
    val b = sig.as("b")
    val edges = a.join(b, col("a.__sig") === col("b.__sig") &&
        col("a.__id") < col("b.__id"))
      .where(Similarity.cosineWithNorms(col("a.__v"), col("b.__v"),
        col("a.__n"), col("b.__n")) >= threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
    materializeAndRelease(edges, sig)
  }
}
