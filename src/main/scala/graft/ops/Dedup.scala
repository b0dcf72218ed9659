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

  /** Exact dedup: keep the smallest id per identical (normalized)
    * text. */
  def exact(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val keyed = df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)
    keyed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Word shingles of size n over the normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(TextAnalysis.normalized(text), " ")
    when(size(toks) < n, array(TextAnalysis.normalized(text)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature: k independent hash functions simulated as
    * xxhash64(shingle, seed_k); signature[k] = min over shingles.
    * Pure built-ins — stays in codegen, no UDF. */
  def minhashSignature(text: Column, numHashes: Int): Column = {
    val sh = array_distinct(shingles(text))
    val hashes = (0 until numHashes).map { k =>
      array_min(transform(sh, s => xxhash64(s, lit(k))))
    }
    array(hashes: _*)
  }

  /** Candidate duplicate pairs via LSH banding: equal band-slices of
    * the minhash signature land in the same bucket. Returns (idA, idB)
    * with idA < idB, distinct. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df
      .select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__sig", minhashSignature(col("__text"), numHashes))
    val banded = sig.select(col("__id"), col("__sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("__band"))
      .withColumn("__bucket",
        hash(col("__band"), slice(col("__sig"),
          col("__band") * rows + 1, lit(rows))))
      .select("__id", "__band", "__bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** True n-gram Jaccard similarity between two shingle arrays —
    * array_intersect/array_union are codegen'd built-ins. */
  def jaccard(a: Column, b: Column): Column =
    when(size(a) === 0 && size(b) === 0, lit(1.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)))

  /** Verified near-duplicate edges: LSH candidates filtered by true
    * Jaccard over shingle sets. */
  def minhashEdges(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, numHashes, bands)
    val sh = df.select(col(idCol).as("__id"),
      array_distinct(shingles(col(textCol))).as("__sh"))
    cands
      .join(sh.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__sh", "__sh_a"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__sh", "__sh_b"), "id_b")
      .where(jaccard(col("__sh_a"), col("__sh_b")) >= threshold)
      .select("id_a", "id_b")
  }

  /** Distributed connected components: min-label propagation PLUS
    * pointer doubling (each node also adopts its label's label), so
    * path-shaped components collapse in O(log n) rounds, not O(n).
    * Returns (id, component = min id in the component).
    *
    * Scale discipline: the symmetric edge list is cached once (it is
    * re-joined every round — without the cache the whole upstream LSH
    * pipeline re-executes per iteration), superseded label caches are
    * unpersisted as soon as the next round is materialized, and lineage
    * is truncated via localCheckpoint every `checkpointInterval` rounds
    * — bounded executor memory and no 20-deep lineage at convergence. */
  def connectedComponents(edges: DataFrame, ids: DataFrame,
      maxIter: Int = 20, checkpointInterval: Int = 5): DataFrame = {
    // symmetric edge list, reused every iteration
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    var labels = ids.select(col(ids.columns.head).as("id"))
      .withColumn("component", col("id"))
    var prevCached: Option[DataFrame] = None
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
      // truncate lineage periodically; localCheckpoint itself persists,
      // so only cache() on non-checkpoint rounds
      val updated =
        if ((iter + 1) % checkpointInterval == 0)
          updated0.localCheckpoint(true)
        else { updated0.cache(); updated0 }
      val changes = updated.where(col("changed")).limit(1).count()
      prevCached.foreach(_.unpersist(false))
      prevCached = Some(updated)
      labels = updated.select("id", "component")
      converged = changes == 0
      iter += 1
    }
    sym.unpersist(false)
    labels
  }

  /** MinHash-LSH near-dedup end to end: keep the minimum id per
    * verified duplicate cluster. */
  def minhashDedup(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val edges = minhashEdges(df, textCol, idCol, numHashes, bands, threshold)
    val comps = connectedComponents(edges, df.select(col(idCol)))
    val w = Window.partitionBy("component").orderBy(col("id").asc)
    val keep = comps.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).select(col("id").as("__keep"))
    df.join(keep, df(idCol) === col("__keep"), "left_semi")
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
    bitVotes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup edges: band the 64-bit fingerprint into four
    * 16-bit chunks (any pair within hamming<=3 of a 64-bit hash shares
    * at least one exact chunk), verify by full hamming distance. */
  def simhashEdges(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("__id"),
      simhash(col(textCol)).as("__fp"))
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

  /** Embedding near-dup edges: cosine >= threshold, candidates via
    * random-hyperplane LSH (see [[Similarity.hyperplaneSignature]]). */
  def embeddingEdges(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", planes: Int = 16,
      threshold: Double = 0.95, seed: Long = 42L): DataFrame = {
    val sig = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__sig",
        Similarity.hyperplaneSignature(col("__v"), planes, seed))
    val a = sig.as("a")
    val b = sig.as("b")
    a.join(b, col("a.__sig") === col("b.__sig") &&
        col("a.__id") < col("b.__id"))
      .where(Similarity.cosine(col("a.__v"), col("b.__v")) >= threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
  }
}
