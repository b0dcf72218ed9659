package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * Scale design: the brute-force path is a broadcast of the (small)
  * query set against a full corpus scan — one pass, no shuffle of the
  * corpus. The LSH path buckets the corpus by random-hyperplane
  * signature so each query probes one bucket (plus multi-probe
  * neighbors); the IVF path clusters with KMeans and probes the nearest
  * `nprobe` centroids — both cut the candidate set by orders of
  * magnitude before the exact re-rank.
  */
object Similarity {

  /** Hard cap on the `(query, probed cell)` rows the indexed/IVFPQ
    * search paths collect to the driver (r22 guard — the
    * Retrieval.MaxQueryTermRows discipline): probe rows carry vector
    * payloads (query vectors / ADC distance tables), so an oversized
    * "query batch" would OOM the driver silently. 128k rows of even
    * 4 KB payloads is ~0.5 GB — the intended batches are thousands of
    * times smaller. Override: conf `graft.ann.max-probed-rows`. */
  val MaxProbedQueryRows = 1 << 17

  private def probeCap(df: org.apache.spark.sql.DataFrame): Int =
    graft.util.DriverCollect.confInt(df,
      "graft.ann.max-probed-rows", MaxProbedQueryRows)

  /** L2 norm of a float-array column — `sqrt` of the self-dot, via the
    * codegen'd [[graft.functions.VectorKernels]] kernel (bit-identical
    * to the in-order `acc + x²` fold every oracle replays). Exposed so
    * pair loops can hoist it per ROW. */
  def l2norm(v: Column): Column =
    sqrt(graft.functions.VectorFunctions.vecDot(v, v))

  /** Cosine with caller-supplied norms — bit-identical arithmetic to
    * [[cosine]] (same in-order dot fold, same zero guard, same
    * `na * nb` division order), but the norms can be projected once per
    * corpus / query row instead of recomputed for every candidate PAIR.
    * In a top-k scan that turns 3·dim multiplies per pair into dim per
    * pair plus dim per row — the norms drop out of the O(pairs) term.
    * The dot itself is the codegen'd kernel: the HOF fold it replaces
    * evaluates as a boxed closure per element (~30 µs per 64-dim pair),
    * which dominated every candidate-pair loop. */
  def cosineWithNorms(a: Column, b: Column, na: Column,
      nb: Column): Column = {
    val dot = graft.functions.VectorFunctions.vecDot(a, b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Cosine similarity between two float-array columns, computed in
    * double via an in-order fold (deterministic across engines). */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, l2norm(a), l2norm(b))

  /** Exact top-k neighbors of each query vector (brute force — the
    * correctness baseline). Queries are broadcast; the corpus is
    * scanned once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
      .withColumn("__cn", l2norm(col("__cv")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
      .withColumn("__qn", l2norm(col("__qv")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .withColumn("score", cosineWithNorms(col("__qv"), col("__cv"),
        col("__qn"), col("__cn")))
      // NULL scores are NULL/dim-mismatched vectors (vecDot's NULL
      // contract): dropped EXPLICITLY — desc ordering happens to sort
      // them last, but with fewer than k real candidates they would
      // otherwise fill top-k ranks with non-neighbors. Zero-norm
      // vectors keep their defined 0.0. Pinned by planted parity.
      .where(col("score").isNotNull)
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "score")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash mapped to [-1, 1]. Pure built-ins — reproducible. */
  private def planeComponent(plane: Column, dim: Column,
      seed: Long): Column =
    (pmod(xxhash64(plane, dim, lit(seed)), lit(2000001L)).cast("double")
      / 1000000.0) - 1.0

  /** Random-hyperplane LSH signature: one sign bit per plane packed
    * into a long. Same-signature vectors are cosine-close with high
    * probability.
    *
    * `component` supplies the hyperplane entry for (plane, dim) —
    * defaults to the xxhash64-derived pseudo-random plane. The
    * dot/sign/pack machinery is identical for any generator, which is
    * what lets e2b_bucket_determinism gate this exact code path against
    * a DuckDB oracle using an integer-LCG generator both engines can
    * compute bit-identically (xxhash64 itself has no DuckDB analog). */
  /** Degenerate rows: a NULL or EMPTY vector dots NULL against every
    * plane (zip_with pads the empty side with nulls), so no sign bit
    * sets and all such rows land in bucket 0 — deterministic, and
    * harmless for recall because their exact-cosine re-rank score can
    * never reach a top-k. Pinned by the planted-parity harness. */
  def hyperplaneSignature(vec: Column, planes: Int, seed: Long,
      component: Option[(Column, Column) => Column] = None): Column = {
    val comp = component.getOrElse(
      (p: Column, i: Column) => planeComponent(p, i, seed))
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v.cast("double") * comp(lit(p), i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via hyperplane LSH: candidates share the query's bucket (or a
    * bucket within `multiProbe` flipped bits), then exact cosine
    * re-ranks. Recall rises with fewer planes / more probes. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 12, multiProbe: Int = 1, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
      .withColumn("__cn", l2norm(col("__cv")))
      .withColumn("__bucket", hyperplaneSignature(col("__cv"), planes, seed))
    val probes = (0 until planes).map(b => lit(1L << b))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
      .withColumn("__qn", l2norm(col("__qv")))
      .withColumn("__sig", hyperplaneSignature(col("__qv"), planes, seed))
      .withColumn("__probe",
        explode(array((lit(0L) +: (if (multiProbe > 0) probes else Nil)): _*)))
      .withColumn("__bucket", col("__sig").bitwiseXOR(col("__probe")))
      .select("qid", "__qv", "__qn", "__bucket")
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("score", cosineWithNorms(col("__qv"), col("__cv"),
        col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("nid").asc)
    scored.select("qid", "nid", "score").distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** ANN via IVF (inverted file): KMeans centroids (Spark ML, fixed
    * seed), corpus partitioned by nearest centroid, queries probe the
    * `nprobe` nearest centroids, exact cosine re-rank inside. The
    * assignment/probe/re-rank stages live in [[ivfTopKWithCentroids]]
    * so a caller with known centroids (and the e3b correctness gate)
    * exercises the identical code path without the fit. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nprobe: Int = 2, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id",
      maxFitRows: Long = 100000L,
      /** Known corpus row count (e.g. the engine's metadata-only count,
        * SURVEY A1) — sizing the KMeans fit sample from it skips a
        * full counting pre-pass over the corpus, one wasted scan at
        * 100 TB. Only used to pick the sampling fraction, so a stale
        * hint degrades sample size, never correctness. */
      rowCountHint: Option[Long] = None): DataFrame =
    ivfTopKWithCentroids(corpus, queries,
      ivfFitCentroids(corpus, nCentroids, seed, vecCol, idCol,
        maxFitRows, rowCountHint), k, nprobe, vecCol, idCol)

  /** The KMeans centroid fit [[ivfTopK]] runs, exposed so an index
    * BUILD (`CALL graft.system.build_ann_index`) can persist the
    * centroids and later searches skip the fit entirely. */
  def ivfFitCentroids(corpus: DataFrame, nCentroids: Int,
      seed: Long = 42L, vecCol: String = "embedding",
      idCol: String = "vec_id", maxFitRows: Long = 100000L,
      rowCountHint: Option[Long] = None): Seq[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
      .withColumn("__features", array_to_vector(
        col("__cv").cast("array<double>")))
    val km = new KMeans().setK(nCentroids).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("__cell")
    // fit on a bounded deterministic sample: centroid quality needs only
    // a sketch of the distribution, and a full-corpus fit at 100 TB
    // would iterate the whole table once per KMeans round
    val corpusRows = rowCountHint.getOrElse(c.count())
    val fitSet =
      if (corpusRows <= maxFitRows) c
      else c.sample(withReplacement = false,
        // oversample slightly so the sampled count stays >= nCentroids
        math.min(1.0, maxFitRows.toDouble * 1.1 / corpusRows), seed)
    km.fit(fitSet).clusterCenters.map(_.toArray).toSeq
  }

  /** Squared Euclidean distance from a float-array column to a fixed
    * centroid — the codegen'd in-order `(x - c)²` fold
    * ([[graft.functions.VectorKernels]]), deterministic across
    * engines. */
  private def dist2(vec: Column, centroid: Array[Double]): Column =
    graft.functions.VectorFunctions.vecSqDist(vec, typedlit(centroid.toSeq))

  /** Nearest-centroid cell id for a vector column: a per-row
    * `least(struct(dist², cell))` argmin — pure codegen'd expressions,
    * NO shuffle of the corpus (a window/groupBy argmin would reshuffle
    * 100 TB by row id). Ties prefer the lowest cell id (struct
    * ordering), so assignment is a total function of the inputs —
    * deterministic across engines for fixed centroids. Shared by the
    * IVF probe path ([[ivfTopKWithCentroids]]) and semantic dedup
    * ([[Dedup.semanticDedup]]). */
  def nearestCell(vec: Column, centroids: Seq[Array[Double]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cellStructs = centroids.zipWithIndex.map { case (ctr, cell) =>
      struct(dist2(vec, ctr).as("d"), lit(cell).as("c"))
    }
    (if (cellStructs.size == 1) cellStructs.head
     else least(cellStructs: _*)).getField("c")
  }

  /** IVF assignment → probe → re-rank with explicit centroids (the
    * post-fit stages of [[ivfTopK]], shared verbatim with it).
    *
    * Scale design: assignment is a per-row `least(struct(dist², cell))`
    * argmin — pure codegen'd expressions, no shuffle of the corpus
    * (unlike a window/groupBy argmin, which would reshuffle 100 TB by
    * row id). Probing is likewise a per-row sorted-array slice on the
    * (small) query side. The expression tree is O(nCentroids · dim) per
    * row — the same work KMeans' own predict does — and stays
    * codegen-friendly for the ≤ a-few-hundred-centroid lists an IVF
    * this shape uses; a million-centroid index would shard the list
    * first. Candidate matching broadcasts the probed (qid, cell) pairs,
    * so the corpus is scanned exactly once.
    *
    * Ties: assignment prefers the lowest cell id at equal distance
    * (struct ordering); probe order is cosine desc, cell asc; the final
    * rank breaks score ties by neighbor id asc. All three are total
    * orders, so the output is deterministic for fixed centroids — what
    * lets e3b hash-gate this path against a DuckDB oracle. */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[Array[Double]], k: Int, nprobe: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(centroids.nonEmpty, "ivf needs at least one centroid")
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
    val assigned = c.withColumn("__cn", l2norm(col("__cv")))
      .withColumn("__cell", nearestCell(col("__cv"), centroids))

    val probed = probedQueries(queries, centroids, nprobe, vecCol, idCol)

    val scored = assigned.join(broadcast(probed), Seq("__cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("score", cosineWithNorms(col("__qv"), col("__cv"),
        col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("nid").asc)
    // no distinct(): each corpus vector lives in exactly ONE cell and a
    // query probes a slice of DISTINCT cells, so a (qid, nid) pair can
    // meet only once — unlike lshTopK's multi-probe, which can hit the
    // same bucket through several flipped bits and must dedup
    scored.select("qid", "nid", "score")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Composed IVF + PQ ANN — the standard large-scale layout (an
    * IVFPQ-style index): the corpus is assigned to coarse cells (the
    * IVF half) AND product-quantized to m small ints per vector (the
    * PQ half); a query probes its `nprobe` cells by centroid cosine
    * and ranks ONLY those cells' vectors by the ADC distance estimate
    * over their codes. At 100 TB the two halves compose
    * MULTIPLICATIVELY: cell partitioning prunes WHICH rows are read
    * (nprobe/nCells of the corpus) and quantization shrinks WHAT is
    * read per row (~dim·4/m×) — together the read is a sliver of the
    * raw vectors. Ranking is (ADC asc, id asc); ADC estimates
    * L2 distance, not exact cosine — the PQ recall/IO trade. Each
    * (query, vector) pair meets exactly once (one cell per vector,
    * distinct probed cells), so no dedup pass is needed. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[Array[Double]], codebooks: Seq[Seq[Array[Double]]],
      k: Int, nprobe: Int = 2, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val m = codebooks.size
    val ksub = codebooks.head.size
    require(codebooks.forall(_.size == ksub),
      "all subspaces must have the same centroid count")
    val dsub = codebooks.head.head.length
    val cv = col(vecCol).cast("array<double>")
    val codesExpr = array(codebooks.zipWithIndex.map { case (cb, j) =>
      nearestCell(slice(cv, j * dsub + 1, dsub), cb)
    }: _*)
    // ONE corpus pass builds the in-memory inverted file: cell + codes
    // (the persisted twin would store exactly these columns,
    // cell-partitioned — build_ann_index's layout with codes for the
    // vector payload)
    val index = corpus.select(col(idCol).as("nid"),
      nearestCell(col(vecCol), centroids).as("__cell"),
      codesExpr.as("codes"))
    // per-(query, probed-cell) row with the query's ADC distance
    // table — nprobe duplicates of a small array on a broadcast side.
    // ONE driver collect re-emitted as a LocalRelation (r22 — the
    // e17/ivfTopKFromIndex discipline): the probe expressions and the
    // distance tables evaluate once, and the join's build side carries
    // true size stats instead of re-running the query-side scan at
    // broadcast-build time. Tiny by contract (|queries| × nprobe rows
    // of m·ksub doubles); values round-trip through Rows verbatim, so
    // results are bit-identical (the e19 oracle pins this).
    val qv = col("__qv").cast("array<double>")
    val dtab = array((for (j <- 0 until m; c <- 0 until ksub) yield
      graft.functions.VectorFunctions.vecSqDist(
        slice(qv, j * dsub + 1, dsub),
        typedlit(codebooks(j)(c).toSeq))): _*)
    val probed0 = probedQueries(queries, centroids, nprobe, vecCol, idCol)
      .select(col("qid"), col("__cell"), dtab.as("__dtab"))
    val (_, probed) = graft.util.DriverCollect.asLocalRelation(probed0,
      probeCap(queries), "IVFPQ probe rows (Similarity." +
        "MaxProbedQueryRows / conf graft.ann.max-probed-rows)")
    val scored = index.join(broadcast(probed), Seq("__cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
          (code, j) => element_at(col("__dtab"),
            (j * ksub + code + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("qid")
      .orderBy(col("adc").asc, col("nid").asc)
    scored.select("qid", "nid", "adc")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Centroid matrix ⇄ JSON, for stamping a trained IVF model on the
    * index table's properties. `Double.toString` shortest-repr
    * round-trips exactly through `toDouble`, so a persisted model
    * reloads bit-identically — what lets i36 hash-gate search results
    * against the build. */
  def centroidsToJson(cbs: Seq[Array[Double]]): String =
    cbs.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  def centroidsFromJson(s: String): Seq[Array[Double]] = {
    val inner = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) Nil
    else inner.split("\\]\\s*,\\s*\\[").toSeq.map(row =>
      row.stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim.toDouble))
  }

  /** PQ codebooks (m × ksub × dsub) ⇄ the SAME flat JSON encoding as
    * [[centroidsToJson]] — the m·ksub centroids concatenated in
    * subspace-major order; `ksub` (stamped separately) regroups them.
    * Reusing the 2-level codec keeps one bit-exact round-trip. */
  def pqCodebooksToJson(cbs: Seq[Seq[Array[Double]]]): String =
    centroidsToJson(cbs.flatten)

  def pqCodebooksFromJson(s: String,
      ksub: Int): Seq[Seq[Array[Double]]] =
    centroidsFromJson(s).grouped(ksub).map(_.toSeq).toSeq

  /** Query-side probe stage shared by [[ivfTopKWithCentroids]] and
    * [[ivfTopKFromIndex]]: `(qid, __qv, __qn, __cell)` — one row per
    * (query, probed cell), top-`nprobe` centroids by cosine desc then
    * cell asc, all per-row expression work (no window/shuffle). */
  private def probedQueries(queries: DataFrame,
      centroids: Seq[Array[Double]], nprobe: Int, vecCol: String,
      idCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
      .withColumn("__qn", l2norm(col("__qv")))
    val cosStructs = centroids.zipWithIndex.map { case (ctr, cell) =>
      struct(cosine(col("__qv"), typedlit(ctr.toSeq)).as("s"),
        lit(cell).as("c"))
    }
    // top-nprobe centroids by cosine desc, cell asc — a per-row sort of
    // an nCentroids-long array, no window/shuffle
    val byScoreDesc = (l: Column, r: Column) =>
      when(l.getField("s") > r.getField("s"), -1)
        .when(l.getField("s") < r.getField("s"), 1)
        .otherwise(l.getField("c") - r.getField("c"))
    q.withColumn("__pc", explode(slice(
        array_sort(array(cosStructs: _*), byScoreDesc),
        1, math.min(nprobe, centroids.size))))
      .select(col("qid"), col("__qv"), col("__qn"),
        col("__pc.c").as("__cell"))
  }

  /** IVF search against a PERSISTED index — a table of
    * `(idCol, cell, norm, vecCol)` rows written cell-partitioned by
    * `CALL graft.system.build_ann_index`. The query batch's probed
    * cells are collected first (driver-side — |queries| × nprobe ints)
    * and handed to `loadCells`, which returns ONLY those cells' rows;
    * because the index table is partitioned by `cell`, that filter is
    * answered by manifest-level PARTITION PRUNING — the inverted-file
    * "read only the probed lists" property realized as Iceberg
    * partitions, so a search touches nprobe/nCells of the corpus
    * instead of scanning it. Assignment and norms are read back, not
    * recomputed; ranking is [[ivfTopKWithCentroids]]'s exact tail, so
    * results are identical to the unindexed path for the same
    * centroids (i36 hash-gates this). */
  def ivfTopKFromIndex(loadCells: Seq[Int] => DataFrame,
      queries: DataFrame, centroids: Seq[Array[Double]], k: Int,
      nprobe: Int = 2, vecCol: String = "embedding",
      idCol: String = "vec_id", withVec: Boolean = false): DataFrame = {
    // tiny (|queries| × nprobe): ONE driver collect serves both the
    // probed-cell list and the join's build side — re-emitted as a
    // LocalRelation so the probe expressions run once and the join
    // side carries true size stats (r21; formerly a localCheckpoint
    // job PLUS a separate distinct+collect job). Capped (r22): the
    // rows carry query vectors.
    val probed0 = probedQueries(queries, centroids, nprobe, vecCol, idCol)
    val (probedRows, probed) = graft.util.DriverCollect.asLocalRelation(
      probed0, probeCap(queries), "IVF probe rows (Similarity." +
        "MaxProbedQueryRows / conf graft.ann.max-probed-rows)")
    val cells = probedRows.map(_.getAs[Int]("__cell")).distinct.toSeq.sorted
    val assigned = loadCells(cells).select(col(idCol).as("nid"),
      col(vecCol).as("__cv"), col("norm").as("__cn"),
      col("cell").as("__cell"))
    val scored = assigned.join(broadcast(probed), Seq("__cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("score", cosineWithNorms(col("__qv"), col("__cv"),
        col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("nid").asc)
    // withVec: carry the neighbor vector (already loaded from the
    // probed cells) into the top-k — lets a re-ranker (e.g. MMR) use
    // candidate vectors without a second index read
    val base = if (withVec)
      scored.select(col("qid"), col("nid"), col("score"),
        col("__cv").as("vec"))
    else scored.select("qid", "nid", "score")
    base.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Product-quantization encode: split each vector into `m = |codebooks|`
    * contiguous subspaces and store, per subspace, the id of the nearest
    * codebook centroid — `dim · 8` bytes of floats become `m` small ints
    * (the FAISS `PQm` scheme, the standard memory-bound ANN layout at
    * 100 TB). `codebooks(j)` holds subspace j's centroids, all of equal
    * sub-dimension `dim / m`.
    *
    * Per-row codegen'd expressions only (slice + the [[nearestCell]]
    * `least(struct)` argmin per subspace) — the corpus is NEVER
    * shuffled, exactly like the IVF assign stage. Ties prefer the
    * lowest centroid id, so codes are a total function of the inputs —
    * deterministic across engines for fixed codebooks (the e15 gate). */
  def pqEncode(df: DataFrame, codebooks: Seq[Seq[Array[Double]]],
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(codebooks.nonEmpty, "pq needs at least one subspace codebook")
    val dsub = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == dsub)),
      "all codebook centroids must share the sub-dimension")
    val v = col(vecCol).cast("array<double>")
    val codes = array(codebooks.zipWithIndex.map { case (cb, j) =>
      nearestCell(slice(v, j * dsub + 1, dsub), cb)
    }: _*)
    df.select(col(idCol), codes.as("codes"))
  }

  /** PQ top-k via asymmetric distance computation (ADC): the corpus is
    * scanned as codes; each query precomputes an `m × ksub` table of
    * exact subspace distances to every codebook centroid, and a
    * corpus row scores as the SUM OF m TABLE LOOKUPS — O(m) per pair
    * instead of O(dim), the whole point of PQ.
    *
    * Scale shape (the e1 pattern): queries + their distance tables
    * BROADCAST; the corpus encodes per-row and never shuffles — one
    * scan total, plan-guarded by PlanShapeSpec. Returns
    * `(qid, nid, adc, rank)` with rank 1..k by ADC distance asc, ties
    * by neighbor id asc. Every arithmetic step is an in-order IEEE
    * double fold over exact inputs, so ranks are engine-reproducible
    * for planted codebooks (e15's full DuckDB replay). For recall on
    * learned codebooks, compose with an exact re-rank of the top-R
    * like [[ivfTopKWithCentroids]]'s verify stage. */
  def pqTopKWithCodebooks(corpus: DataFrame, queries: DataFrame,
      codebooks: Seq[Seq[Array[Double]]], k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    pqTopKFromCodes(
      pqEncode(corpus, codebooks, vecCol, idCol)
        .select(col(idCol).as("__pq_id"), col("codes")),
      queries, codebooks, k, vecCol, idCol, codesIdCol = "__pq_id")

  /** PQ-ADC top-k over PRE-ENCODED codes — a `(codesIdCol, codes)`
    * frame, typically a table persisted by `CALL build_pq_index` (the
    * memory-bound ANN shape: the search reads m bytes-ish per vector
    * instead of the full floats, ~dim·4/m× less I/O at 100 TB).
    * Distance tables are computed per query against the SAME codebooks
    * that produced the codes and broadcast; the codes frame never
    * shuffles. Identical results to [[pqTopKWithCodebooks]] over the
    * corpus the codes were encoded from (that path now delegates
    * here — one ranking definition). */
  def pqTopKFromCodes(codes: DataFrame, queries: DataFrame,
      codebooks: Seq[Seq[Array[Double]]], k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      codesIdCol: String = "vec_id"): DataFrame = {
    val m = codebooks.size
    val ksub = codebooks.head.size
    require(codebooks.forall(_.size == ksub),
      "all subspaces must have the same centroid count")
    val dsub = codebooks.head.head.length
    val encoded = codes.select(col(codesIdCol).as("nid"), col("codes"))
    val qv = col(vecCol).cast("array<double>")
    val dtab = array((for (j <- 0 until m; c <- 0 until ksub) yield
      graft.functions.VectorFunctions.vecSqDist(
        slice(qv, j * dsub + 1, dsub),
        typedlit(codebooks(j)(c).toSeq))): _*)
    val q = queries.select(col(idCol).as("qid"), dtab.as("__dtab"))
    val scored = encoded.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
          (code, j) => element_at(col("__dtab"),
            (j * ksub + code + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("qid")
      .orderBy(col("adc").asc, col("nid").asc)
    scored.select("qid", "nid", "adc")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Train PQ codebooks on the corpus: per contiguous subspace, a
    * KMeans fit (Spark ML, fixed per-subspace seed) over the vector
    * SLICES of a bounded deterministic sample — the [[ivfTopK]] fit
    * discipline applied m times. The sample is drawn ONCE and cached,
    * so the corpus is scanned once however many subspaces there are;
    * each fit then iterates only the ≤ `maxFitRows` sample. Vectors
    * shorter than the (max-length) trained dimension are excluded
    * from the fit; sub-dimension is `max(1, dim / m)` — the
    * [[pqEncode]] convention, so trained codebooks plug straight into
    * [[pqTopKWithCodebooks]] (the e15b gate replays exactly that
    * composition with the trained centroids as oracle literals). */
  def pqTrainCodebooks(corpus: DataFrame, m: Int, ksub: Int,
      seed: Long = 42L, vecCol: String = "embedding",
      maxFitRows: Long = 100000L,
      rowCountHint: Option[Long] = None): Seq[Seq[Array[Double]]] = {
    require(m > 0 && ksub > 0, "need m > 0 subspaces, ksub > 0 centroids")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = corpus.select(col(vecCol).cast("array<double>").as("__v"))
    val corpusRows = rowCountHint.getOrElse(v.count())
    val sampled =
      if (corpusRows <= maxFitRows) v
      else v.sample(withReplacement = false,
        math.min(1.0, maxFitRows.toDouble * 1.1 / corpusRows), seed)
    val dim = sampled.agg(max(size(col("__v"))).as("d")).head(1)
      .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0)))
      .getOrElse(throw new IllegalArgumentException(
        "pqTrainCodebooks: empty corpus"))
    val dsub = math.max(1, dim / m)
    val fit = sampled.where(size(col("__v")) === dim).cache()
    try (0 until m).map { j =>
      val sub = fit.select(array_to_vector(
        slice(col("__v"), j * dsub + 1, dsub)).as("__features"))
      new KMeans().setK(ksub).setSeed(seed + j)
        .setFeaturesCol("__features").setPredictionCol("__cell")
        .fit(sub).clusterCenters.map(_.toArray).toSeq
    } finally fit.unpersist()
  }

  /** PQ top-k with a bounded-sample trained codebook — the composition
    * a user runs when no codebook is planted: [[pqTrainCodebooks]] +
    * [[pqTopKWithCodebooks]]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 4, ksub: Int = 8, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id",
      maxFitRows: Long = 100000L,
      rowCountHint: Option[Long] = None): DataFrame =
    pqTopKWithCodebooks(corpus, queries,
      pqTrainCodebooks(corpus, m, ksub, seed, vecCol, maxFitRows,
        rowCountHint), k, vecCol, idCol)

  /** Scalar int8 quantization of an embedding column — the 4x storage
    * shrink an embedding store applies before indexing (per-vector
    * min/max affine codes, the FAISS `SQ8` scheme). Returns one row per
    * vector: the uint8 code array, the dequantization params, and the
    * reconstruction MSE.
    *
    * Per-row arithmetic only — no shuffle, no UDF, stays in codegen
    * except the HOF lambdas (which bind only attributes, so nothing
    * re-evaluates per element — the `Dedup.scala:35-39` pitfall).
    * Determinism: codes use `floor(x + 0.5)` (not `round`, whose
    * half-even/half-up convention differs across engines); every
    * operation is an in-order IEEE double op, so codes AND the MSE fold
    * are bit-reproducible by any engine — what lets e9 hash-gate this
    * against DuckDB. Degenerate vectors (max = min) code to all-zeros
    * with scale 0 and reconstruct exactly. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val v = col("__v")
    val withRange = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      // empty vectors: array_min/max are null — params degrade to 0
      .withColumn("__lo", coalesce(array_min(v), lit(0.0)))
      .withColumn("__scale",
        coalesce((array_max(v) - col("__lo")) / lit(255.0), lit(0.0)))
    val code = (x: Column) =>
      when(col("__scale") === 0.0, lit(0L)).otherwise(
        least(greatest(
          floor((x - col("__lo")) / col("__scale") + 0.5), lit(0.0)),
          lit(255.0)).cast("long"))
    val codes = transform(v, x => code(x))
    val err = (x: Column) => {
      val d = x - (col("__lo") + code(x).cast("double") * col("__scale"))
      d * d
    }
    withRange.select(col(idCol),
      codes.as("codes"),
      col("__lo").as("lo"),
      col("__scale").as("scale"),
      when(size(v) === 0, lit(0.0)).otherwise(
        aggregate(v, lit(0.0), (acc, x) => acc + err(x)) / size(v))
        .as("mse"))
  }

  /** Exact integer dot product of two int8-code array columns —
    * ≤ 255²·dim per term, engine-portable (the [[mmrDiversify]]
    * sim/rel arithmetic). */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
      (acc, x) => acc + x)

  /** The full ordered pair grid over a top-k candidate id list with
    * [[codeDot]] similarities, and a DELIBERATE 0 where either side
    * has no codes row — satisfying [[mmrDiversify]]'s full-pair-
    * coverage contract for candidate lists wider than the coded
    * corpus (a hybrid list's lexical-only hit has no vector: zero
    * redundancy is the intended semantics, distinct from the
    * missing-pair fail-fast). ONE definition shared by
    * `hybrid_mmr_search` and the i62/i64 gate compositions so the
    * 0-fill rule can never drift between the procedure and the gates
    * that assert against it. `ids` is one id column (`idCol`);
    * `codes` is `(codesIdCol, codesCol)`. Both sides are candidate-
    * count-sized; every join side is broadcast. Output:
    * `(qid = 0, a, b, sim)`. */
  def zeroFilledCodeSims(ids: DataFrame, idCol: String,
      codes: DataFrame, codesIdCol: String,
      codesCol: String = "codes"): DataFrame = {
    val grid = ids.select(col(idCol).as("a"))
      .crossJoin(broadcast(ids.select(col(idCol).as("b"))))
      .where(col("a") =!= col("b"))
    grid
      .join(broadcast(codes.select(col(codesIdCol).as("a"),
        col(codesCol).as("ca"))), Seq("a"), "left")
      .join(broadcast(codes.select(col(codesIdCol).as("b"),
        col(codesCol).as("cb"))), Seq("b"), "left")
      .select(lit(0L).as("qid"), col("a"), col("b"),
        coalesce(when(col("ca").isNotNull && col("cb").isNotNull,
          codeDot(col("ca"), col("cb"))), lit(0L)).as("sim"))
  }

  /** Maximal-marginal-relevance diversification (Carbonell &
    * Goldstein 1998) of per-query candidate lists — the re-rank step
    * that keeps a RAG / few-shot retrieval context from filling with
    * near-duplicates of the best hit: greedily pick
    * `argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` k times.
    *
    * All arithmetic is INTEGER: `rel` and `sim` are caller-supplied
    * longs (e.g. dot products of int8 codes — exact, engine-portable),
    * λ is the rational `lamNum/lamDen`, and the reported score is the
    * λ-denominator-scaled `lamNum·rel − (lamDen−lamNum)·maxSim`
    * (first pick: maxSim = 0). Ties break by ascending candidate id;
    * a query with fewer than k candidates yields them all.
    *
    * Inputs: `candidates` = `(qIdCol, idCol, relCol)`;
    * `sims` = `(qIdCol, aCol, bCol, simCol)` covering every ordered
    * candidate pair of a query — ENFORCED: a looked-up pair that is
    * absent throws rather than silently defaulting (a 0 default would
    * clamp the max at >= 0 under all-negative sims and change
    * selections with no signal). Output:
    * `(qIdCol, step, idCol, mmr_scaled)` with step 1..k in selection
    * order.
    *
    * Scale shape: greedy selection is inherently sequential IN k, but
    * each query's problem is tiny (k ≤ candidates ≈ dozens — MMR is a
    * re-rank of an upstream retriever's top-N, never a corpus scan).
    * So the operator aggregates each query's candidates and sims to
    * ONE row (two map-side-combined aggregations), then runs the
    * greedy loop as a typed per-row map — embarrassingly parallel
    * over queries, bounded memory per row, no driver involvement. */
  def mmrDiversify(candidates: DataFrame, sims: DataFrame, k: Int,
      lamNum: Long, lamDen: Long,
      qIdCol: String = "qid", idCol: String = "nid",
      relCol: String = "rel", aCol: String = "a", bCol: String = "b",
      simCol: String = "sim"): DataFrame = {
    require(k >= 1 && lamDen > 0 && lamNum >= 0 && lamNum <= lamDen,
      "need k >= 1 and 0 <= lamNum/lamDen <= 1")
    val spark = candidates.sparkSession
    import spark.implicits._
    val candAgg = candidates.groupBy(col(qIdCol).cast("long").as("q"))
      .agg(collect_list(struct(col(idCol).cast("long").as("_1"),
        col(relCol).cast("long").as("_2"))).as("cs"))
    val simAgg = sims.groupBy(col(qIdCol).cast("long").as("q"))
      .agg(collect_list(struct(col(aCol).cast("long").as("_1"),
        col(bCol).cast("long").as("_2"),
        col(simCol).cast("long").as("_3"))).as("ss"))
    val picked = candAgg.join(simAgg, Seq("q"), "left")
      .select(col("q"), col("cs"), coalesce(col("ss"),
        array().cast("array<struct<_1:bigint,_2:bigint,_3:bigint>>"))
        .as("ss"))
      .as[(Long, Seq[(Long, Long)], Seq[(Long, Long, Long)])]
      .flatMap { case (qid, cs, ss) =>
        val simMap = ss.iterator.map { case (a, b, s) => (a, b) -> s }
          .toMap
        // deterministic candidate order: (rel desc, id asc)
        val pool = scala.collection.mutable.ArrayBuffer(
          cs.sortBy { case (id, rel) => (-rel, id) }: _*)
        val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = Seq.newBuilder[(Long, Long, Long, Long)]
        var step = 1L
        while (step <= k && pool.nonEmpty) {
          var bestIx = -1; var bestScore = Long.MinValue
          var bestId = Long.MaxValue
          var ix = 0
          while (ix < pool.length) {
            val (id, rel) = pool(ix)
            var mx = 0L
            var first = true
            sel.foreach { sid =>
              // full-pair coverage is a hard contract: a silent 0
              // default would clamp the max at >= 0 when every present
              // sim is negative, changing selections without any error
              val sv = simMap.getOrElse((id, sid),
                throw new IllegalArgumentException(
                  s"mmrDiversify: sims is missing the ordered pair " +
                    s"($id, $sid) for query $qid — sims must cover " +
                    "every ordered candidate pair"))
              if (first || sv > mx) { mx = sv; first = false }
            }
            val score = lamNum * rel - (lamDen - lamNum) * mx
            if (score > bestScore ||
                (score == bestScore && id < bestId)) {
              bestScore = score; bestId = id; bestIx = ix
            }
            ix += 1
          }
          val (id, _) = pool.remove(bestIx)
          sel += id
          out += ((qid, step, id, bestScore))
          step += 1
        }
        out.result()
      }
    picked.toDF(qIdCol, "step", idCol, "mmr_scaled")
  }
}
