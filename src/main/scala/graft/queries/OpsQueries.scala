package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Bpe, Classifier, Contamination, Dedup,
  ExactSubstr, FilterPipeline,
  Funnel, Importance,
  LangModel, LineDedup, Multimodal, Packing, RangeJoin, Retrieval,
  Sessionize, Similarity, Skew, Splits, Unigram,
  TextAnalysis}

/** LLM-pipeline operators over the documents/embeddings testdata, each
  * under the driver gate. SQL-expressible ops carry DuckDB oracles;
  * the LSH/IVF/minhash families are oracle-free (rows-only driver
  * check) but recall-tested against the exact baseline in OpsSpec.
  */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // -------------------------------------------------- d1 exact dedup
  def d1DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang")

  val d1Sql: String =
    """SELECT d.lang, COUNT(*) AS n
      |FROM documents d
      |JOIN (SELECT MIN(doc_id) AS keep
      |      FROM documents WHERE text IS NOT NULL
      |      GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
      |      UNION ALL
      |      SELECT doc_id FROM documents WHERE text IS NULL) k
      |  ON d.doc_id = k.keep
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // -------------------------------------------------- d2 token stats
  def d2TextStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_measured"),
        round(TextAnalysis.meanTokenLength(col("text")), 6)
          .as("mean_token_len"))
      .orderBy("doc_id")
  }

  val d2Sql: String =
    """SELECT doc_id,
      |  CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      |       ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_measured,
      |  CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0.0
      |       ELSE round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
      |            / len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')), 6) END
      |    AS mean_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ d3 fingerprints
  def d3Fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("fp")).as("n_unique"))
      .orderBy("source")

  val d3Sql: String =
    """SELECT source, COUNT(*) AS n,
      |  COUNT(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))
      |    AS n_unique
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------- d4 language ID (oracle)
  def d4LangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")

  // Shared SQL builders for the langId argmax (used by d4 AND the d26
  // funnel so the two oracles can never drift from each other — both
  // already share TextAnalysis.langProfiles with the engine side).
  private def langScoreColsSql: String =
    TextAnalysis.langProfiles.map { case (lang, ms) =>
      ms.map(m => s"(CASE WHEN contains(p, '$m') THEN 1 ELSE 0 END)")
        .mkString("(", " + ", s") AS s_$lang")
    }.mkString(",\n    ")
  private def langGmaxSql: String =
    TextAnalysis.langProfiles.map(p => s"s_${p._1}")
      .mkString("GREATEST(", ", ", ")")
  private def langArgmaxSql: String =
    TextAnalysis.langProfiles.map { case (lang, _) =>
      s"WHEN s_$lang = m THEN '$lang'"
    }.mkString("\n      ")

  /** DuckDB replica of [[TextAnalysis.langId]]: marker containment
    * sums per language, argmax with ties going to the lexicographically
    * first language (the CASE order below), `unknown` on zero — integer
    * arithmetic end to end, so the hash gate is exact. */
  val d4Sql: String = {
    val scoreCols = langScoreColsSql
    val gmax = langGmaxSql
    val argmax = langArgmaxSql
    s"""WITH padded AS (
       |  SELECT lang,
       |    ' ' || lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) || ' '
       |      AS p
       |  FROM documents
       |), scored AS (
       |  SELECT lang,
       |    $scoreCols
       |  FROM padded
       |), best AS (
       |  SELECT lang, $gmax AS m, * FROM scored
       |)
       |SELECT lang,
       |  CASE WHEN m = 0 THEN 'unknown'
       |      $argmax
       |  END AS lang_pred,
       |  COUNT(*) AS n
       |FROM best GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ------------------- d5 quality score (oracle: round-3 verdict #8 —
  // every component is plain SQL; the DuckDB form mirrors the exact
  // operation order so IEEE doubles agree bit-for-bit)
  val d5Sql: String =
    """WITH scored AS (
      |  SELECT
      |    -- carried so sq can NULL the score for NULL text: DuckDB's
      |    -- LEAST/GREATEST skip NULL operands exactly like Spark's,
      |    -- so without the guard a missing-body doc would score the
      |    -- constant 0.7 and land in a real quality bucket
      |    text IS NULL AS is_null_text,
      |    LEAST(LENGTH(text) / 500.0, 1.0) AS len_score,
      |    CASE WHEN LENGTH(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0.0
      |         ELSE LEN(list_filter(
      |                string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
      |                t -> t IN ('the','a','an','and','or','of','to','in',
      |                           'is','it','that','for','on','with','as',
      |                           'at','by')))
      |              * 1.0 / LEN(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
      |    END AS stop_ratio,
      |    CASE WHEN LENGTH(text) = 0 THEN 0.0
      |         ELSE (LENGTH(text) - LENGTH(regexp_replace(text,
      |                '[!-/:-@\[-`{-~]', '', 'g'))) * 1.0 / LENGTH(text)
      |    END AS punct_ratio
      |  FROM documents
      |), sq AS (
      |  SELECT CASE WHEN is_null_text THEN NULL
      |    ELSE ROUND(len_score * 0.4
      |             + LEAST(stop_ratio * 5.0, 1.0) * 0.3
      |             + GREATEST(0.0, 1.0 - punct_ratio * 4.0) * 0.3, 6)
      |    END AS q
      |  FROM scored
      |)
      |SELECT FLOOR(q * 10) / 10 AS quality_bucket, COUNT(*) AS n
      |FROM sq GROUP BY 1 ORDER BY 1""".stripMargin

  def d5Quality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .groupBy((floor(col("q") * 10) / 10).as("quality_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("quality_bucket")

  // ----------------------------------- d6 minhash near-dedup (no SQL)
  def d6MinhashDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val kept = Dedup.minhashDedup(docs, numHashes = 32, bands = 8,
      threshold = 0.7)
    kept.groupBy("lang").agg(count(lit(1)).as("n_kept")).orderBy("lang")
  }

  // -------------------------------------- d7 simhash near-dup pairs
  def d7SimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val edges = Dedup.simhashEdges(t(s, dir, "documents"), maxHamming = 3)
    edges.agg(count(lit(1)).as("n_pairs"))
  }

  // -------------------------------------------- e1 exact ANN (oracle)
  /** Rank-only output: scores are float-order-sensitive across engines,
    * ranks are not (ties broken by id). */
  def e1AnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  val e1Sql: String =
    """SELECT qid, nid, rank FROM (
      |  SELECT qid, nid,
      |    ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY score DESC, nid ASC) AS rank
      |  FROM (
      |    -- NULL/dim-mismatched candidates are excluded (the engine's
      |    -- vecDot NULLs them and bruteForceTopK drops NULL scores;
      |    -- DuckDB's list_cosine_similarity would THROW); zero-norm
      |    -- vectors score 0.0 on both engines (DuckDB would NaN,
      |    -- which sorts ABOVE every real score in DESC)
      |    SELECT q.vec_id AS qid, e.vec_id AS nid,
      |      CASE WHEN list_inner_product(CAST(q.embedding AS DOUBLE[]),
      |                  CAST(q.embedding AS DOUBLE[])) = 0
      |             OR list_inner_product(CAST(e.embedding AS DOUBLE[]),
      |                  CAST(e.embedding AS DOUBLE[])) = 0 THEN 0.0
      |        ELSE list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                    CAST(e.embedding AS DOUBLE[]))
      |        END AS score
      |    FROM embeddings q, embeddings e
      |    WHERE q.vec_id < 3 AND e.vec_id <> q.vec_id
      |      AND q.embedding IS NOT NULL AND e.embedding IS NOT NULL
      |      AND len(e.embedding) = len(q.embedding)) s0) sub
      |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ------------------------------------------- e2 LSH ANN (no SQL)
  def e2AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), k = 5,
      planes = 5, multiProbe = 1)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  // ------------------------------------------- e3 IVF ANN (no SQL)
  def e3AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 3), k = 5,
      nCentroids = 8, nprobe = 4)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  // ----------------------------- e4 embedding near-dup edges (no SQL)
  def e4EmbeddingDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Dedup.embeddingEdges(emb, planes = 8, threshold = 0.9)
      .agg(count(lit(1)).as("n_near_dup_pairs"))
  }

  // --------------------------------------- d8 token frequency (oracle)
  /** Corpus-wide token frequency — the exact flavor of the vocabulary
    * pass a tokenizer-training pipeline runs. */
  def d8TokenFreq(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(TextAnalysis.normalized(col("text")), " "))
        .as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)

  val d8Sql: String =
    """SELECT tok, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(
      |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents) sub
      |WHERE tok <> ''
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin

  // -------------------------------------------- e5 as-of join (oracle)
  /** Enrich each purchase with the user's latest preceding error —
    * checked against DuckDB's NATIVE ASOF JOIN. */
  def e5AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = CoreQueries.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    AsOf.asOfJoin(purchases, errors, Seq("user_id"), "ts",
        rightPrefix = "err_")
      .select(col("user_id"), col("event_id"),
        col("err_event_id"))
      .orderBy("user_id", "event_id")
  }

  val e5Sql: String =
    """SELECT p.user_id, p.event_id, e.event_id AS err_event_id
      |FROM (SELECT user_id, ts, event_id FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
      |                WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.ts >= e.ts
      |ORDER BY p.user_id, p.event_id""".stripMargin

  // ------------------------------ d6b exact-Jaccard verify (oracle)
  /** Hash-gated companion for the MinHash family (the d6 pipeline is
    * seed-dependent, so it can only be rows-checked). Every document
    * plus an EXACT copy runs the REAL pipeline — LSH banding →
    * candidate pairs → exact-Jaccard verify — and the emitted planted
    * edges (ids AND Jaccard values) must equal DuckDB's restricted
    * all-pairs exact Jaccard. Both sides keep only the planted pair
    * space (`id_b = id_a + 1000000`), where recall is STRUCTURAL:
    * identical texts give identical shingle sets, identical minhash
    * signatures, and therefore share every band — no banding-miss
    * probability rides on the gate, so a testdata vintage can never
    * flip it via a naturally-occurring pair that sits just above the
    * threshold (those have ≈2·10⁻⁴ miss probability per pair and are
    * excluded from BOTH sides). Near-dup (J < 1) recall behavior stays
    * covered by d6's rows gate and the recall units. */
  def d6bJaccardVerify(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val planted = docs.unionByName(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("text")))
    Dedup.minhashEdges(planted, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.8)
      .where(col("id_b") === col("id_a") + 1000000L)
      .orderBy("id_a", "id_b")
  }

  val d6bSql: String =
    """WITH planted AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |), toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
      |                 ' ') AS tk
      |  FROM planted
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |    ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
      |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END AS sh
      |  FROM toks
      |)
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.sh, b.sh))::DOUBLE
      |      / len(list_distinct(a.sh || b.sh)) AS jaccard
      |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1000000
      |) WHERE jaccard >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  // ------------- d6d near-copy full-pipeline hashed-set gate (oracle)
  /** Non-trivial quotients through the REAL [[Dedup.minhashEdges]]
    * pipeline (d6b's planted pairs are exact copies, so its hash gate
    * only ever sees jaccard = 1.0; d6c scores the jaccard kernel but
    * bypasses the pipeline). Each ≥50-token document is paired with
    * its 3-token-suffixed near-copy at id + 2 000 000 and the FULL
    * hashed-set pipeline runs — shingle → hash → LSH band → verify —
    * restricted to the planted id space. The token floor makes recall
    * structural in practice: suffixing m ≥ 48 distinct shingles gives
    * jaccard = m/(m+3) ≥ 0.94, so a band match (r=4, b=16) is missed
    * with probability (1 − 0.94⁴)¹⁶ ≈ 3·10⁻¹¹. The emitted jaccard is
    * the hashed-set quotient, equal to string-set Jaccard barring a
    * 2⁻⁶⁵ shingle-hash collision — exactly the contract the
    * minhashEdges docstring states, now hash-gated on values in
    * (0, 1). */
  def d6dNearCopyPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
      .where(size(split(TextAnalysis.normalized(col("text")), " ")) >= 50)
    val planted = docs.unionByName(docs.select(
      (col("doc_id") + 2000000L).as("doc_id"),
      concat(col("text"), lit(" zz0 zz1 zz2")).as("text")))
    Dedup.minhashEdges(planted, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.5)
      .where(col("id_b") === col("id_a") + 2000000L)
      .orderBy("id_a", "id_b")
  }

  val d6dSql: String = {
    def shingleExpr(tk: String): String =
      s"""CASE WHEN len($tk) < 3 THEN [array_to_string($tk, ' ')]
         |    ELSE list_distinct(list_transform(
         |      generate_series(1, len($tk) - 2),
         |      i -> $tk[i] || ' ' || $tk[i+1] || ' ' || $tk[i+2])) END"""
        .stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    string_split(lower(trim(regexp_replace(text,
       |      '\\s+', ' ', 'g'))), ' ') AS tk,
       |    string_split(lower(trim(regexp_replace(text || ' zz0 zz1 zz2',
       |      '\\s+', ' ', 'g'))), ' ') AS tk2
       |  FROM documents
       |), f AS (
       |  SELECT * FROM toks WHERE len(tk) >= 50
       |), sh AS (
       |  SELECT doc_id,
       |    ${shingleExpr("tk")} AS a,
       |    ${shingleExpr("tk2")} AS b
       |  FROM f
       |)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT doc_id AS id_a, doc_id + 2000000 AS id_b,
       |    len(list_intersect(a, b))::DOUBLE / len(list_distinct(a || b))
       |      AS jaccard
       |  FROM sh
       |) WHERE jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  // --------------------- d6c exact-Jaccard arithmetic (oracle)
  /** Non-trivial exact-Jaccard gate: each document paired with its
    * 3-token-suffixed near-copy BY ID (no LSH anywhere in the loop, so
    * no banding-miss probability can flip the gate), scored with the
    * REAL shingle/Jaccard columns ([[Dedup.shingles]] /
    * [[Dedup.jaccard]] — the verify stage of minhashEdges). Quotients
    * span (0, 1]; integer set sizes divided in double are bit-exact in
    * both engines. Complements d6b, whose structural-recall
    * restriction leaves it comparing only the trivial 1.0 quotient. */
  def d6cJaccardArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(Dedup.shingles(col("text"))).as("__a"),
        array_distinct(Dedup.shingles(
          concat(col("text"), lit(" zz0 zz1 zz2")))).as("__b"))
      .select(col("doc_id"),
        Dedup.jaccard(col("__a"), col("__b")).as("jaccard"))
      .orderBy("doc_id")

  val d6cSql: String = {
    def shingleExpr(tk: String): String =
      s"""CASE WHEN len($tk) < 3 THEN [array_to_string($tk, ' ')]
         |    ELSE list_distinct(list_transform(
         |      generate_series(1, len($tk) - 2),
         |      i -> $tk[i] || ' ' || $tk[i+1] || ' ' || $tk[i+2])) END"""
        .stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    string_split(lower(trim(regexp_replace(text,
       |      '\\s+', ' ', 'g'))), ' ') AS tk,
       |    string_split(lower(trim(regexp_replace(text || ' zz0 zz1 zz2',
       |      '\\s+', ' ', 'g'))), ' ') AS tk2
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    ${shingleExpr("tk")} AS a,
       |    ${shingleExpr("tk2")} AS b
       |  FROM toks
       |)
       |SELECT doc_id,
       |  len(list_intersect(a, b))::DOUBLE / len(list_distinct(a || b))
       |    AS jaccard
       |FROM sh ORDER BY doc_id""".stripMargin
  }

  // ------------------------------- d7b simhash exact-verify (oracle)
  /** Hash-gated companion for SimHash: documents plus exact copies run
    * fingerprint → 16-bit-chunk banding → hamming-0 → an exact
    * distinct-token-set verify. Recall is structural, not
    * probabilistic: equal token sets give equal fingerprints, equal
    * fingerprints share every chunk, so no qualifying pair can be
    * missed; the exact verify removes 64-bit collisions. The result —
    * all pairs with identical distinct-token sets — is what the DuckDB
    * oracle computes directly. */
  def d7bSimhashVerify(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val planted = docs.unionByName(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val edges = Dedup.simhashEdges(planted, maxHamming = 0)
    val keyed = planted.select(col("doc_id"),
      array_sort(array_distinct(
        split(TextAnalysis.normalized(col("text")), " "))).as("__k"))
    edges
      .join(keyed.select(col("doc_id").as("id_a"), col("__k").as("__ka")),
        "id_a")
      .join(keyed.select(col("doc_id").as("id_b"), col("__k").as("__kb")),
        "id_b")
      .where(col("__ka") === col("__kb"))
      .select("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }

  val d7bSql: String =
    """WITH planted AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |), keyed AS (
      |  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
      |                 ' '))), ' ')) AS k
      |  FROM planted
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------- e4b embedding-dedup exact-verify (oracle)
  /** Hash-gated companion for embedding near-dedup: embeddings plus
    * exact copies run the REAL pipeline — hyperplane-LSH bucket
    * self-join, then exact-cosine verify at 0.999. Both sides keep
    * only the planted pair space (`id_b = id_a + 1000000`), where
    * recall is structural: identical vectors get identical signatures
    * regardless of the hash family. A naturally near-parallel vector
    * pair in some future testdata vintage (whose bucket collision IS
    * probabilistic) therefore can't flip the gate — it is excluded
    * from both sides. */
  def e4bEmbeddingDedupVerify(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
    val planted = emb.unionByName(emb.select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    Dedup.embeddingEdges(planted, planes = 16, threshold = 0.999)
      .where(col("id_b") === col("id_a") + 1000000L)
      .orderBy("id_a", "id_b")
  }

  val e4bSql: String =
    """WITH planted AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
      |)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM planted a JOIN planted b ON b.vec_id = a.vec_id + 1000000
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                             CAST(b.embedding AS DOUBLE[])) >= 0.999
      |ORDER BY id_a, id_b""".stripMargin

  // -------------------- e2b hyperplane bucket determinism (oracle)
  private val E2bPlanes = 12

  /** Integer-LCG hyperplane entry for (plane, dim): BIGINT arithmetic
    * mapped to [-1000, 1000] — exactly computable by any engine, unlike
    * the production xxhash64 plane. */
  private def lcgComponent(p: Column, i: Column): Column =
    (pmod(lit(1103515245L) * (lit(42L) + p.cast("long") * lit(1000L)
        + i.cast("long")) + lit(12345L),
      lit(2001L)) - lit(1000L)).cast("double")

  /** Hash-gated companion for the ANN-LSH family: the exact
    * dot/sign/pack bucketing code path of [[Similarity.lshTopK]], run
    * with LCG hyperplanes both engines compute bit-identically (the
    * in-order double fold makes the dot product reproducible). Gates
    * that LSH bucket assignment is deterministic and engine-portable —
    * the property the e2 recall unit assumes. */
  def e2bBucketDeterminism(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb.select(col("vec_id"),
        Similarity.hyperplaneSignature(col("embedding"), E2bPlanes, 0L,
          Some(lcgComponent _)).as("bucket"))
      .orderBy("vec_id")
  }

  val e2bSql: String = {
    // the len-0 guard mirrors the engine: an EMPTY vector's plane dot
    // is NULL (zip_with pads the empty side with nulls), so no sign
    // bit sets and the bucket is 0 — same as a NULL vector. DuckDB's
    // list_reduce THROWS on an empty list instead of returning NULL.
    def plane(p: Int): String =
      s"""(CASE WHEN (CASE WHEN len(embedding) = 0 THEN NULL
         |  ELSE list_reduce(list_transform(
         |    generate_series(1, len(embedding)),
         |    i -> embedding[i]::DOUBLE *
         |      (((1103515245 * (42 + $p * 1000 + (i - 1)) + 12345)
         |        % 2001) - 1000)),
         |  (acc, x) -> acc + x) END) >= 0
         |  THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)""".stripMargin
    s"""SELECT vec_id,
       |${(0 until E2bPlanes).map(plane).mkString(" +\n")} AS bucket
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** Shared DuckDB SQL builders for the planted-centroid oracle family
    * (e3b, e8): the LCG centroid term, per-cell squared-distance
    * columns + LEAST/argmin CASE, and the in-order-fold cosine. ONE
    * definition, parameterized by stride base / cell count / column
    * name, so a fix to the shared arithmetic can never drift the two
    * gates' oracles apart. */
  private[queries] object PlantedSql {
    /** Centroid entry for (cell, dim i-1) — `cell` may be a literal or
      * a column captured by the enclosing lambda. */
    def centroid(stride: Int, cell: String): String =
      s"(CAST((((1103515245 * ($stride + $cell * 1000 + (i - 1)) + 12345) % 2001) - 1000) AS DOUBLE) / 1000)"

    /** One `dN` squared-distance column per cell over vector column
      * `vec` (in-order double fold — [[Similarity]]'s dist2 shape). */
    def distCols(stride: Int, cells: Int, vec: String): String =
      (0 until cells).map { cl =>
        s"""list_reduce(list_transform(generate_series(1, len($vec)),
           |      i -> ($vec[i] - ${centroid(stride, cl.toString)}) * ($vec[i] - ${centroid(stride, cl.toString)})),
           |    (acc, x) -> acc + x) AS d$cl""".stripMargin
      }.mkString(",\n    ")

    def leastList(cells: Int): String =
      (0 until cells).map(cl => s"d$cl").mkString(", ")

    def argminCase(cells: Int): String =
      (0 until cells).map(cl => s"WHEN d$cl = m THEN $cl").mkString(" ")

    /** In-order-fold cosine with the zero-norm guard — the exact SQL
      * replay of [[Similarity.cosineWithNorms]]. */
    def cos(a: String, b: String): String =
      s"""(CASE WHEN sqrt(list_reduce(list_transform(
         |        generate_series(1, len($a)), i -> $a[i] * $a[i]),
         |        (acc, x) -> acc + x)) = 0
         |      OR sqrt(list_reduce(list_transform(
         |        generate_series(1, len($b)), i -> $b[i] * $b[i]),
         |        (acc, x) -> acc + x)) = 0
         |  THEN 0.0
         |  ELSE list_reduce(list_transform(
         |        generate_series(1, len($a)), i -> $a[i] * $b[i]),
         |        (acc, x) -> acc + x)
         |    / (sqrt(list_reduce(list_transform(
         |        generate_series(1, len($a)), i -> $a[i] * $a[i]),
         |        (acc, x) -> acc + x))
         |     * sqrt(list_reduce(list_transform(
         |        generate_series(1, len($b)), i -> $b[i] * $b[i]),
         |        (acc, x) -> acc + x)))
         |  END)""".stripMargin
  }

  // ----------------------- e3b IVF planted-centroid verify (oracle)
  private val E3bCells = 8
  private val E3bNprobe = 3

  /** Integer-LCG centroid entry for (cell, dim): the e2b portable-
    * randomness trick, stride-base-parameterized so each gate plants a
    * DIFFERENT codebook (77 = e3b, 131 = e8 — neither the e2b
    * hyperplanes). The integer is scaled to [-1, 1] (the embeddings'
    * own range — otherwise every corpus row's Euclidean argmin would
    * collapse into the smallest-norm cell and the gate would be
    * trivial); integer arithmetic then one IEEE division by 1000 is
    * bit-exact in Scala, Spark, and DuckDB — the Scala twin of
    * [[PlantedSql.centroid]]. */
  private def plantedCentroid(stride: Int, cell: Int, dim: Int): Double =
    (((1103515245L * (stride.toLong + cell.toLong * 1000L + dim.toLong)
      + 12345L) % 2001L) - 1000L).toDouble / 1000.0

  private def e3bCentroid(cell: Int, dim: Int): Double =
    plantedCentroid(77, cell, dim)

  /** Hash-gated companion for IVF ANN (e3 itself is seed-dependent via
    * the KMeans fit, so it can only be rows-checked). Fixed LCG
    * centroids bypass the fit and feed
    * [[Similarity.ivfTopKWithCentroids]] — the REAL assignment →
    * nprobe-probe → exact-re-rank path that [[Similarity.ivfTopK]]
    * itself calls — against DuckDB computing the same argmin-distance
    * cell, cosine probe ranking, and re-rank in SQL. Every step is an
    * in-order double fold over exact inputs (float→double casts and
    * small-integer centroids are exact), so cell assignment and both
    * rankings agree bit-for-bit; rank-only output keeps the hash
    * insensitive to float formatting (e1 pattern). */
  def e3bIvfPlantedVerify(s: SparkSession, dir: String): DataFrame = {
    val emb0 = t(s, dir, "embeddings")
    // size centroids by the MAX embedding length (the same aggregate the
    // oracle computes) and keep only max-length rows on BOTH sides: a
    // ragged-dimension vintage would otherwise null-pad zip_with on the
    // Spark side while DuckDB loops to each row's own length — silent
    // gate divergence with no hint that dimensionality was the cause
    val dim = emb0.agg(max(size(col("embedding"))).as("d")).head(1)
      .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0)))
      .getOrElse(8)
    val emb = emb0.where(size(col("embedding")) === dim)
    val centroids = (0 until E3bCells).map(cell =>
      Array.tabulate(dim)(d => e3bCentroid(cell, d)))
    Similarity.ivfTopKWithCentroids(emb, emb.filter(col("vec_id") < 3),
        centroids, k = 5, nprobe = E3bNprobe)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  val e3bSql: String = plantedIvfSearchSql(77, E3bCells, E3bNprobe)

  /** The full planted-codebook IVF replay (assignment argmin → nprobe
    * probe → exact re-rank), stride-parameterized so the unindexed
    * (e3b) and indexed (e17) gates share one SQL definition — a fix to
    * the shared arithmetic can never drift their oracles apart. */
  private def plantedIvfSearchSql(stride: Int, nCells: Int,
      nprobe: Int, probeMaxId: Int = 3, k: Int = 5): String = {
    import PlantedSql.cos
    def f(cell: String): String = PlantedSql.centroid(stride, cell)
    val distCols = PlantedSql.distCols(stride, nCells, "cv")
    val dls = PlantedSql.leastList(nCells)
    val argmin = PlantedSql.argminCase(nCells)
    s"""WITH dim AS (
       |  SELECT max(len(embedding)) AS d FROM embeddings
       |), corpus AS (
       |  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE len(embedding) = (SELECT d FROM dim)
       |), q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings
       |  WHERE vec_id < $probeMaxId
       |    AND len(embedding) = (SELECT d FROM dim)
       |), cells AS (
       |  SELECT cell, list_transform(
       |    generate_series(1, (SELECT d FROM dim)),
       |    i -> CAST(${f("cell")} AS DOUBLE)) AS ctr
       |  FROM (SELECT unnest(generate_series(0, ${nCells - 1})) AS cell)
       |), dists AS (
       |  SELECT nid, cv,
       |    $distCols
       |  FROM corpus
       |), assigned AS (
       |  SELECT nid, cv, CASE $argmin END AS cell
       |  FROM (SELECT *, LEAST($dls) AS m FROM dists)
       |), probes AS (
       |  SELECT qid, qv, cell FROM (
       |    SELECT q.qid, q.qv, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY ${cos("q.qv", "c.ctr")} DESC, c.cell ASC) AS cr
       |    FROM q CROSS JOIN cells c
       |  ) WHERE cr <= $nprobe
       |)
       |SELECT qid, nid, rank FROM (
       |  SELECT p.qid, a.nid,
       |    ROW_NUMBER() OVER (PARTITION BY p.qid
       |      ORDER BY ${cos("p.qv", "a.cv")} DESC, a.nid ASC) AS rank
       |  FROM probes p JOIN assigned a
       |    ON a.cell = p.cell AND a.nid <> p.qid
       |) WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  // ------------- e17 indexed IVF search over a cached inverted file
  private val E17Cells = 8
  private val E17Nprobe = 3
  private def e17Centroid(cell: Int, dim: Int): Double =
    plantedCentroid(53, cell, dim)

  /** Memoized per-sfDir inverted file: the embeddings corpus assigned
    * to planted-LCG cells WITH norms, cached — the bench analog of a
    * `build_ann_index` table (the d41 pattern: built once in the
    * warmup pass, so the timed path reads only probed cells; on a real
    * cluster this is the cell-partitioned index table i36 drives
    * through SQL). Stride 53 — a codebook distinct from e2b (42) /
    * e3b (77) / e8 (131) / d6d-family (191). */
  private val e17Index = new scala.collection.concurrent.TrieMap[
    String, (Seq[Array[Double]], DataFrame)]
  private def e17IndexFor(s: SparkSession,
      dir: String): (Seq[Array[Double]], DataFrame) =
    e17Index.getOrElseUpdate(dir, {
      val emb0 = t(s, dir, "embeddings")
      val dim = emb0.agg(max(size(col("embedding"))).as("d")).head(1)
        .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0)))
        .getOrElse(8)
      val emb = emb0.where(size(col("embedding")) === dim)
      val centroids = (0 until E17Cells).map(cell =>
        Array.tabulate(dim)(d => e17Centroid(cell, d)))
      val assigned = emb.select(col("vec_id"),
        Similarity.nearestCell(col("embedding"), centroids).as("cell"),
        Similarity.l2norm(col("embedding")).as("norm"), col("embedding"))
        .cache()
      (centroids, assigned)
    })

  /** [[Similarity.ivfTopKFromIndex]] against the cached inverted
    * file — assignment and norms are READ, never recomputed; the timed
    * work is the nprobe probe, the probed-cells load, and the exact
    * re-rank. Results must equal the unindexed path bit-for-bit, so
    * the oracle is e3b's replay at this gate's stride. */
  def e17IvfIndexedSearch(s: SparkSession, dir: String): DataFrame = {
    val (centroids, assigned) = e17IndexFor(s, dir)
    val dim = centroids.head.length
    val qs = t(s, dir, "embeddings")
      .where(col("vec_id") < 3 && size(col("embedding")) === dim)
    Similarity.ivfTopKFromIndex(
      cells => assigned.where(col("cell").isin(cells: _*)),
      qs, centroids, k = 5, nprobe = E17Nprobe)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  val e17Sql: String = plantedIvfSearchSql(53, E17Cells, E17Nprobe)

  // ------------------ e15 PQ-ADC planted-codebook verify (oracle)
  private val E15M = 4     // subspaces
  private val E15Ksub = 8  // centroids per subspace

  /** Planted PQ codebook entry: subspace j, centroid c, sub-dim d —
    * the LCG family with stride 191 (distinct from e2b 42 / e3b 77 /
    * e8 131), combined cell index `j·ksub + c`. */
  private def e15Cent(j: Int, c: Int, d: Int): Double =
    plantedCentroid(191, j * E15Ksub + c, d)

  /** Hash-gated product-quantization ANN ([[Similarity.pqEncode]] +
    * [[Similarity.pqTopKWithCodebooks]] — the memory-bound ANN layout
    * at 100 TB; codebooks in practice come from a bounded-sample fit
    * like IVF's, planted here to bypass seed dependence, the e3b
    * pattern). DuckDB replays the ENTIRE pipeline: per-subspace
    * argmin codes over the corpus, per-query exact subspace distance
    * tables, the m-lookup ADC sum, and the (distance asc, nid asc)
    * ranking. Every step is an in-order IEEE double fold over exact
    * inputs, so codes, sums and ranks agree bit-for-bit; rank-only
    * output keeps the hash insensitive to float formatting. */
  def e15PqAdcVerify(s: SparkSession, dir: String): DataFrame = {
    val emb0 = t(s, dir, "embeddings")
    // e3b's ragged-vintage guard: size the codebooks by the max
    // embedding length, keep only max-length rows on both sides
    val dim = emb0.agg(max(size(col("embedding"))).as("d")).head(1)
      .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0)))
      .getOrElse(64)
    val dsub = math.max(1, dim / E15M)
    val emb = emb0.where(size(col("embedding")) === dim)
    val codebooks: Seq[Seq[Array[Double]]] = (0 until E15M).map(j =>
      (0 until E15Ksub).map(c =>
        Array.tabulate(dsub)(d => e15Cent(j, c, d))): Seq[Array[Double]])
    Similarity.pqTopKWithCodebooks(emb, emb.filter(col("vec_id") < 3),
        codebooks, k = 5)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  val e15Sql: String = {
    // squared distance between subspace j of `vec` and planted
    // centroid (j, c): in-order fold over the dsub sub-dims. `s` is
    // the cross-joined sub-dimension column (DuckDB rejects scalar
    // subqueries inside lambdas, so it must be a plain column here).
    def pd(vec: String, j: Int, c: Int): String = {
      val cent = PlantedSql.centroid(191, (j * E15Ksub + c).toString)
      s"""list_reduce(list_transform(generate_series(1, s),
         |      i -> ($vec[$j * s + i] - $cent) * ($vec[$j * s + i] - $cent)),
         |    (acc, x) -> acc + x)""".stripMargin
    }
    val cdistCols = (for (j <- 0 until E15M; c <- 0 until E15Ksub)
      yield s"${pd("cv", j, c)} AS pd_${j}_$c").mkString(",\n    ")
    val codeCols = (0 until E15M).map { j =>
      val least = (0 until E15Ksub).map(c => s"pd_${j}_$c").mkString(", ")
      val cases = (0 until E15Ksub)
        .map(c => s"WHEN pd_${j}_$c = LEAST($least) THEN $c").mkString(" ")
      s"CASE $cases END AS code_$j"
    }.mkString(",\n    ")
    val qdistCols = (for (j <- 0 until E15M; c <- 0 until E15Ksub)
      yield s"${pd("qv", j, c)} AS qd_${j}_$c").mkString(",\n    ")
    val score = (0 until E15M).map { j =>
      val cases = (0 until E15Ksub)
        .map(c => s"WHEN c.code_$j = $c THEN q.qd_${j}_$c").mkString(" ")
      s"(CASE $cases END)"
    }.mkString(" + ")
    s"""WITH dim AS (
       |  SELECT max(len(embedding)) AS d FROM embeddings
       |), ds AS (
       |  SELECT GREATEST(1, (SELECT d FROM dim) // $E15M) AS s
       |), corpus AS (
       |  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE len(embedding) = (SELECT d FROM dim)
       |), q0 AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings
       |  WHERE vec_id < 3 AND len(embedding) = (SELECT d FROM dim)
       |), cdist AS (
       |  SELECT nid,
       |    $cdistCols
       |  FROM corpus, ds
       |), codes AS (
       |  SELECT nid,
       |    $codeCols
       |  FROM cdist
       |), qdist AS (
       |  SELECT qid,
       |    $qdistCols
       |  FROM q0, ds
       |)
       |SELECT qid, nid, rank FROM (
       |  SELECT q.qid, c.nid,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid
       |      ORDER BY ($score) ASC, c.nid ASC) AS rank
       |  FROM qdist q CROSS JOIN codes c
       |  WHERE c.nid <> q.qid
       |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // ------ e15b PQ-ADC trained-codebook verify (stash-literal oracle)
  /** Codebooks trained by the last [[e15bPqAdcTrained]] run in this
    * JVM — the oracle SQL embeds them as literals. Populated before
    * the oracle is built: Verify runs every query FIRST and dumps
    * `oracle_sql.json` last, and [[oracles]] is a `def` so the map is
    * (re)built at dump time. */
  @volatile private var e15bStash: Option[Seq[Seq[Array[Double]]]] = None

  /** The TRAINED-codebook PQ path, hash-gated at last (e15 plants LCG
    * codebooks to bypass seed dependence; this gate closes the gap for
    * the path users actually run): [[Similarity.pqTrainCodebooks]]
    * fits per-subspace KMeans on the real embeddings fixture
    * (bounded sample, fixed seed), the codebooks are stashed, and the
    * DuckDB oracle replays encode + ADC + ranking with the trained
    * centroids as double literals (Double.toString shortest-repr
    * round-trips exactly through DuckDB's correctly-rounded parser).
    * Rank-only output keeps the hash insensitive to float printing. */
  def e15bPqAdcTrained(s: SparkSession, dir: String): DataFrame = {
    val emb0 = t(s, dir, "embeddings")
    val dim = emb0.agg(max(size(col("embedding"))).as("d")).head(1)
      .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0)))
      .getOrElse(64)
    val emb = emb0.where(size(col("embedding")) === dim)
    val cbs = Similarity.pqTrainCodebooks(emb, E15M, E15Ksub,
      seed = 4242L)
    e15bStash = Some(cbs)
    Similarity.pqTopKWithCodebooks(emb, emb.filter(col("vec_id") < 3),
        cbs, k = 5)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  /** e15b oracle: generic literal-codebook PQ replay (the VALUES CTE
    * keeps the SQL size O(m·ksub) rows instead of e15's unrolled
    * O(m·ksub) expressions). Argmin tie-break (d2 asc, c asc), the
    * j-ordered ADC fold, and the (dist asc, nid asc) rank mirror the
    * Spark side's total orders exactly. */
  private def e15bSql: String = pqReplaySql(e15bStash)

  /** The full trained-codebook PQ replay (encode argmin → ADC fold →
    * rank), parameterized by corpus/dim sources so e15b (cached
    * corpus) and i44 (persisted `build_pq_index` table, incrementally
    * chained) share one oracle definition. */
  private[queries] def pqReplaySql(
      stash: Option[Seq[Seq[Array[Double]]]],
      corpusSql: String = "SELECT vec_id, embedding FROM embeddings",
      dimSql: String =
        "SELECT max(len(embedding)) AS d FROM embeddings",
      qSql: Option[String] = None):
      String = stash match {
    case None =>
      // dev-subset runs that skip the gate have no stash (and no spark
      // output either) — emit a schema-shaped empty result
      "SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS nid," +
        " CAST(NULL AS BIGINT) AS rank WHERE 1 = 0"
    case Some(cbs) =>
      // DOUBLE[] cast for the same reason as the IVF cells VALUES:
      // bare array literals type as DECIMAL and overflow the fold
      val values = (for {
        (cb, j) <- cbs.zipWithIndex
        (cent, c) <- cb.zipWithIndex
      } yield s"($j, $c, CAST([${cent.mkString(", ")}] AS DOUBLE[]))")
        .mkString(",\n    ")
      s"""WITH dim AS (
         |  $dimSql
         |), src AS (
         |  $corpusSql
         |), corpus AS (
         |  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM src WHERE len(embedding) = (SELECT d FROM dim)
         |), q0 AS (
         |  ${qSql.getOrElse("SELECT vec_id AS qid, " +
             "CAST(embedding AS DOUBLE[]) AS qv FROM src WHERE " +
             "vec_id < 3 AND len(embedding) = (SELECT d FROM dim)")}
         |), cents(j, c, v) AS (
         |  VALUES $values
         |), cdist AS (
         |  SELECT nid, j, c,
         |    list_reduce(list_transform(generate_series(1, len(v)),
         |      i -> (cv[j * len(v) + i] - v[i])
         |         * (cv[j * len(v) + i] - v[i])),
         |      (acc, x) -> acc + x) AS d2
         |  FROM corpus CROSS JOIN cents
         |), codes AS (
         |  SELECT nid, j, (list(c ORDER BY d2 ASC, c ASC))[1] AS code
         |  FROM cdist GROUP BY nid, j
         |), qdist AS (
         |  SELECT qid, j, c,
         |    list_reduce(list_transform(generate_series(1, len(v)),
         |      i -> (qv[j * len(v) + i] - v[i])
         |         * (qv[j * len(v) + i] - v[i])),
         |      (acc, x) -> acc + x) AS d2
         |  FROM q0 CROSS JOIN cents
         |), adc AS (
         |  SELECT q.qid, k.nid,
         |    list_reduce(list(q.d2 ORDER BY q.j),
         |      (acc, x) -> acc + x) AS dist
         |  FROM codes k JOIN qdist q ON q.j = k.j AND q.c = k.code
         |  WHERE k.nid <> q.qid
         |  GROUP BY q.qid, k.nid
         |)
         |SELECT qid, nid, rank FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY dist ASC, nid ASC) AS rank FROM adc
         |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // --------------------- ccb connected-components verify (oracle)
  /** Planted doc-id graph: chains of 10 (ids < 200, `k → k+1` except
    * across decade boundaries), 5-cliques (ids 200–299, all pairs
    * within `id / 5` groups), everything else singleton. Path-shaped
    * chains exercise pointer doubling; cliques exercise min-label
    * fan-in; singletons exercise the anti-join rejoin. Both endpoints
    * are joined against the table so the graph adapts to any vintage's
    * doc count. */
  private def ccbEdges(docs: DataFrame): DataFrame = {
    val d = docs.select("doc_id")
    val chain = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1)
      .where(col("a.doc_id") < 200 && pmod(col("a.doc_id"), lit(10)) =!= 9)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val clique = d.as("a").join(d.as("b"),
        floor(col("a.doc_id") / 5) === floor(col("b.doc_id") / 5) &&
          col("a.doc_id") < col("b.doc_id"))
      .where(col("a.doc_id") >= 200 && col("a.doc_id") < 300)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    chain.unionByName(clique)
  }

  /** Hash-gated companion for connected components (unit-only until
    * now — the one ops stage with no driver gate). The planted graph
    * runs through BOTH regimes of [[Dedup.connectedComponents]] — the
    * driver union-find (default threshold) and the distributed
    * pointer-doubling loop (forced via `driverMaxEdges = 10`) — and
    * each must equal DuckDB's recursive-CTE reachability closure with
    * min-label components. Exact integer labels, so the gate is a full
    * hash match. */
  def ccbComponentsVerify(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val edges = ccbEdges(docs)
    val ids = docs.select(col("doc_id"))
    val dist = Dedup.connectedComponents(edges, ids, driverMaxEdges = 10)
      .withColumn("regime", lit("distributed"))
    val drv = Dedup.connectedComponents(edges, ids)
      .withColumn("regime", lit("driver"))
    dist.unionByName(drv)
      .select("regime", "id", "component")
      .orderBy("regime", "id")
  }

  val ccbSql: String = {
    def body(regime: String) =
      s"""SELECT '$regime' AS regime, d.doc_id AS id,
         |  COALESCE(c.component, d.doc_id) AS component
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id""".stripMargin
    s"""WITH RECURSIVE edges AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
       |  WHERE a.doc_id < 200 AND a.doc_id % 10 <> 9
       |  UNION ALL
       |  SELECT a.doc_id, b.doc_id
       |  FROM documents a JOIN documents b
       |    ON a.doc_id // 5 = b.doc_id // 5 AND a.doc_id < b.doc_id
       |  WHERE a.doc_id >= 200 AND a.doc_id < 300
       |), sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM edges
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM edges
       |), walk AS (
       |  SELECT src AS id, dst AS reach FROM sym
       |  UNION
       |  SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach
       |), comp AS (
       |  SELECT id, LEAST(id, MIN(reach)) AS component
       |  FROM walk GROUP BY id
       |)
       |SELECT * FROM (
       |  ${body("distributed")}
       |  UNION ALL
       |  ${body("driver")}
       |) ORDER BY regime, id""".stripMargin
  }

  // ------------------------------------ d9 sequence packing (oracle)
  /** Context-window packing over the documents table: shards of 100
    * ids pack greedily into 512-token bins. Row-level gate — every
    * (shard, id, tokens, bin, bin_offset) must match DuckDB's
    * recursive-CTE replay of the same greedy recurrence (the offset —
    * the doc's start position within its bin, what position-id /
    * attention-mask construction reads — falls out of the replay as
    * `acc - tokens`). */
  def d9SeqPack(s: SparkSession, dir: String): DataFrame = {
    // NULL text packs as 0 tokens (tokenCount is NULL-in-NULL-out,
    // but a packing slot must have a concrete size)
    val docs = t(s, dir, "documents").select(col("doc_id"),
      floor(col("doc_id") / 100).cast("long").as("shard"),
      coalesce(TextAnalysis.tokenCount(col("text")), lit(0L))
        .as("tokens"))
    Packing.packGreedy(docs, "doc_id", "tokens", "shard", capacity = 512)
      .orderBy("shard", "id")
  }

  val d9Sql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, doc_id // 100 AS shard,
      |    -- COALESCE: NULL text packs as 0 tokens (the engine-side
      |    -- coalesce over tokenCount), not a NULL that nulls the bin
      |    COALESCE(CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      |         ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END, 0) AS tokens
      |  FROM documents
      |), ordered AS (
      |  SELECT shard, doc_id, tokens,
      |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      |  FROM toks
      |), packed AS (
      |  SELECT shard, rn, doc_id, tokens,
      |    CAST(0 AS BIGINT) AS bin, CAST(tokens AS BIGINT) AS acc
      |  FROM ordered WHERE rn = 1
      |  UNION ALL
      |  SELECT o.shard, o.rn, o.doc_id, o.tokens,
      |    CASE WHEN p.acc + o.tokens > 512 THEN p.bin + 1 ELSE p.bin END,
      |    CASE WHEN p.acc + o.tokens > 512 THEN o.tokens
      |         ELSE p.acc + o.tokens END
      |  FROM packed p JOIN ordered o
      |    ON o.shard = p.shard AND o.rn = p.rn + 1
      |)
      |SELECT shard, doc_id AS id, CAST(tokens AS BIGINT) AS tokens, bin,
      |  acc - tokens AS bin_offset
      |FROM packed ORDER BY shard, id""".stripMargin

  // ------------------------------ e11 funnel analysis (oracle)
  /** First-touch funnel signup → view → click → purchase over the
    * events table ([[Funnel.firstTouch]]): per user, the first time
    * each step completed at-or-after the previous step's first
    * completion. DuckDB replays the identical prior-state fold as a
    * recursive CTE over (user, event-rank); integer µs — full hash. */
  def e11Funnel(s: SparkSession, dir: String): DataFrame =
    Funnel.firstTouch(CoreQueries.events(s, dir), "user_id", "ts",
        "event_id", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy("user_id")

  val e11Sql: String = {
    val steps = Seq("signup", "view", "click", "purchase")
    def cond(j: Int): String =
      if (j == 0) s"e.event_type = '${steps(0)}'"
      else s"e.event_type = '${steps(j)}' AND w.t${j - 1} IS NOT NULL AND e.us >= w.t${j - 1}"
    val initCols = steps.indices.map(j =>
      if (j == 0) s"CASE WHEN event_type = '${steps(0)}' THEN us END AS t0"
      else s"CAST(NULL AS BIGINT) AS t$j").mkString(",\n    ")
    val stepCols = steps.indices.map(j =>
      s"COALESCE(w.t$j, CASE WHEN ${cond(j)} THEN e.us END) AS t$j")
      .mkString(",\n    ")
    val outCols = steps.indices.map(j => s"t$j AS s${j}_us").mkString(", ")
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_type,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY user_id) AS cnt
       |  FROM events
       |), walk AS (
       |  SELECT user_id, rn, cnt,
       |    $initCols
       |  FROM e WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.rn, e.cnt,
       |    $stepCols
       |  FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1
       |)
       |SELECT user_id, $outCols
       |FROM walk WHERE rn = cnt ORDER BY user_id""".stripMargin
  }

  // ------------------------------ e12 retention cohorts (oracle)
  /** Weekly retention triangle over the events table
    * ([[Funnel.weeklyRetention]]): cohort = week of first event,
    * distinct users active per (cohort, weeks-since). Monday-start
    * `date_trunc('week')` in both engines; exact integer µs offsets —
    * full hash. */
  def e12Retention(s: SparkSession, dir: String): DataFrame =
    Funnel.weeklyRetention(CoreQueries.events(s, dir), "user_id", "ts")
      .orderBy("cohort_us", "weeks_since")

  val e12Sql: String =
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
      |  FROM events GROUP BY 1
      |), a AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
      |)
      |SELECT epoch_us(f.cw) AS cohort_us,
      |  (epoch_us(a.w) - epoch_us(f.cw)) // CAST(604800000000 AS BIGINT)
      |    AS weeks_since,
      |  COUNT(DISTINCT a.user_id) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------- d22 BPE pair frequencies (oracle)
  /** One BPE merge-training iteration's statistic: corpus-wide
    * adjacent-character-pair counts within words, top 20 — the pair a
    * tokenizer trainer would merge next. Explode words → per-word pair
    * arrays ([[TextAnalysis.charPairs]]) → partial hash-agg; exact
    * strings and integer counts, full hash gate (the d8 shape one
    * level below tokens). */
  def d22BpePairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(TextAnalysis.normalized(col("text")), " "))
        .as("__w"))
      .select(explode(TextAnalysis.charPairs(col("__w"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  val d22Sql: String =
    """WITH words AS (
      |  SELECT unnest(string_split(
      |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |  FROM documents
      |), pairs AS (
      |  SELECT unnest(list_transform(generate_series(1, length(w) - 1),
      |    i -> substring(w, i, 2))) AS pair
      |  FROM words WHERE length(w) >= 2
      |)
      |SELECT pair, COUNT(*) AS n FROM pairs
      |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin

  // ------------------------- d21 packed-text materialization (oracle)
  /** The d9 packing materialized into actual training blobs: one row
    * per (shard, bin) with the bin's exact concatenated text digested
    * — the shard-writer's output, gated end to end (assignment replay
    * via the same recursive CTE, then ordered string_agg). */
  def d21PackedText(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sized = docs.select(col("doc_id"),
      floor(col("doc_id") / 100).cast("long").as("shard"),
      coalesce(TextAnalysis.tokenCount(col("text")), lit(0L))
        .as("tokens"))
    val assignments = Packing.packGreedy(sized, "doc_id", "tokens",
      "shard", capacity = 512)
    Packing.materializePacked(docs, assignments)
      .select(col("shard"), col("bin"), col("n_docs"), col("n_tokens"),
        md5(col("packed_text")).as("packed_fp"))
      .orderBy("shard", "bin")
  }

  val d21Sql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, doc_id // 100 AS shard,
      |    -- COALESCE: NULL text packs as 0 tokens (the engine-side
      |    -- coalesce over tokenCount), not a NULL that nulls the bin
      |    COALESCE(CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      |         ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END, 0) AS tokens
      |  FROM documents
      |), ordered AS (
      |  SELECT shard, doc_id, tokens,
      |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      |  FROM toks
      |), packed AS (
      |  SELECT shard, rn, doc_id, tokens,
      |    CAST(0 AS BIGINT) AS bin, CAST(tokens AS BIGINT) AS acc
      |  FROM ordered WHERE rn = 1
      |  UNION ALL
      |  SELECT o.shard, o.rn, o.doc_id, o.tokens,
      |    CASE WHEN p.acc + o.tokens > 512 THEN p.bin + 1 ELSE p.bin END,
      |    CASE WHEN p.acc + o.tokens > 512 THEN o.tokens
      |         ELSE p.acc + o.tokens END
      |  FROM packed p JOIN ordered o
      |    ON o.shard = p.shard AND o.rn = p.rn + 1
      |)
      |SELECT p.shard, p.bin, COUNT(*) AS n_docs,
      |  CAST(SUM(p.tokens) AS BIGINT) AS n_tokens,
      |  md5(string_agg(d.text, ' ' ORDER BY p.doc_id)) AS packed_fp
      |FROM packed p JOIN documents d ON d.doc_id = p.doc_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------ d10 stratified sampling (oracle)
  /** Per-language quota sample via the portable md5 order — the
    * corpus-mixing primitive (e.g. balance languages before
    * training). */
  def d10StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Packing.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "lang"),
        "lang", "doc_id", quota = 30)
      .orderBy("lang", "doc_id")

  val d10Sql: String =
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      |  FROM documents
      |) WHERE rk <= 30 ORDER BY lang, doc_id""".stripMargin

  // ------------------------------------ d11 PII redaction (oracle)
  /** PII scrub gate: every document gets a planted contact trailer
    * (email + phone + IPv4 derived from its id), then the REAL
    * [[TextAnalysis.redactPii]]/[[TextAnalysis.piiCount]] pass runs and
    * the per-doc match counts and redacted-text digest must equal
    * DuckDB running the same RE2-safe patterns. Counts are on the
    * original text; redaction order (email → phone → IP) is fixed, so
    * both engines transform identically even where the lorem corpus
    * happens to contain accidental matches. */
  def d11PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 555-867-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10.0."),
        pmod(col("doc_id"), lit(256)).cast("string"), lit(".7"))
        .as("text"))
    planted.select(col("doc_id"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.EmailRe)
          .as("n_email"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.PhoneRe)
          .as("n_phone"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.Ipv4Re)
          .as("n_ip"),
        md5(TextAnalysis.redactPii(col("text"))).as("red_fp"))
      .orderBy("doc_id")
  }

  val d11Sql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com or 555-867-'
       |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
       |      AS text
       |  FROM documents
       |)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$email')) AS n_email,
       |  len(regexp_extract_all(text, '$phone')) AS n_phone,
       |  len(regexp_extract_all(text, '$ip')) AS n_ip,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$email', '<EMAIL>', 'g'),
       |    '$phone', '<PHONE>', 'g'),
       |    '$ip', '<IP>', 'g')) AS red_fp
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------ e6 sessionization (oracle)
  /** Gap-based sessions over the events table (30-minute inactivity
    * boundary), rolled up per (user, session). Exact integer
    * microsecond arithmetic end to end — full hash gate against DuckDB
    * running the identical lag → running-sum recurrence. */
  def e6Sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(CoreQueries.events(s, dir), "user_id", "ts",
        "event_id", gap = lit(30L * 60L * 1000000L))
      .orderBy("user_id", "session_idx")

  val e6Sql: String =
    """WITH o AS (
      |  -- NULL-timestamp events are excluded by the sessionize
      |  -- contract: un-filtered, Spark's NULLS-FIRST window order
      |  -- fabricates a NaN session while DuckDB's NULLS-LAST merges
      |  -- the event into the last session — neither is a session
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events WHERE ts IS NOT NULL
      |), b AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN prev IS NULL OR us - prev > 1800000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM o
      |), sess AS (
      |  SELECT user_id, us,
      |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
      |      AS BIGINT) AS session_idx
      |  FROM b
      |)
      |SELECT user_id, session_idx, COUNT(*) AS n_events,
      |  MIN(us) AS start_us, MAX(us) AS end_us,
      |  MAX(us) - MIN(us) AS span_us
      |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------- d12 repetition signals (oracle)
  /** Gopher-style within-doc repetition metrics — distinct-token
    * ratio, top-token fraction, duplicate-2-gram fraction. Integer set
    * sizes divided in double, round 6 — full hash gate.
    *
    * Tokenizes ONCE into a bound column and feeds the `*OfTokens`
    * metric forms: higher-order functions re-evaluate non-attribute
    * subtrees per lambda element (`Dedup.scala:35-39`), so passing the
    * raw text column would re-run the normalize+split regex once per
    * token per metric. */
  def d12Repetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("__toks"),
        TextAnalysis.tokenCount(col("text")).as("__n"))
      .select(col("doc_id"),
        round(when(col("__n") === 0, lit(1.0)).otherwise(
          TextAnalysis.distinctTokenRatioOfTokens(col("__toks"))), 6)
          .as("distinct_ratio"),
        round(when(col("__n") === 0, lit(0.0)).otherwise(
          TextAnalysis.topTokenFractionOfTokens(col("__toks"))), 6)
          .as("top_token_frac"),
        round(when(col("__n") < 2, lit(0.0)).otherwise(
          TextAnalysis.dupNgramFractionOfTokens(col("__toks"), 2)), 6)
          .as("dup_2gram_frac"))
      .orderBy("doc_id")

  val d12Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
      |                 ' ') AS tk,
      |    CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      |         ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CASE WHEN n = 0 THEN 1.0
      |       ELSE round(len(list_distinct(tk)) * 1.0 / len(tk), 6)
      |  END AS distinct_ratio,
      |  CASE WHEN n = 0 THEN 0.0
      |       ELSE round(list_aggregate(list_transform(list_distinct(tk),
      |              t -> len(list_filter(tk, x -> x = t))), 'max')
      |            * 1.0 / len(tk), 6)
      |  END AS top_token_frac,
      |  CASE WHEN n < 2 THEN 0.0
      |       ELSE round(1.0 - len(list_distinct(list_transform(
      |              generate_series(1, len(tk) - 1),
      |              i -> tk[i] || ' ' || tk[i+1])))
      |            * 1.0 / (len(tk) - 1), 6)
      |  END AS dup_2gram_frac
      |FROM toks ORDER BY doc_id""".stripMargin

  // ------------------------------ d13 contamination check (oracle)
  /** Benchmark decontamination: every document scored for 3-gram
    * overlap against a planted "benchmark" subset (doc_id % 20 = 0).
    * The explode → gram-join → count shape is the real 100 TB
    * decontamination pass; exact strings and integer counts — full
    * hash gate. */
  def d13Contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.where(pmod(col("doc_id"), lit(20)) === 0)
    Contamination.overlap(docs, bench).orderBy("doc_id")
  }

  val d13Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(COALESCE(text, ''),
      |                 '\s+', ' ', 'g'))),
      |                 ' ') AS tk
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |    ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
      |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END AS sh
      |  FROM toks
      |), bench AS (
      |  SELECT DISTINCT unnest(sh) AS gram FROM sh WHERE doc_id % 20 = 0
      |), grams AS (
      |  SELECT doc_id, unnest(sh) AS gram FROM sh
      |), hits AS (
      |  SELECT g.doc_id, COUNT(*) AS n_hit
      |  FROM grams g JOIN bench b ON g.gram = b.gram GROUP BY 1
      |)
      |SELECT s.doc_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
      |  CAST(len(s.sh) AS BIGINT) AS n_grams,
      |  round(COALESCE(h.n_hit, 0) * 1.0 / len(s.sh), 6) AS overlap_frac,
      |  CAST(CASE WHEN round(COALESCE(h.n_hit, 0) * 1.0 / len(s.sh), 6)
      |    >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      |FROM sh s LEFT JOIN hits h ON h.doc_id = s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  // ---------------------------- d14 temperature sampling (oracle)
  /** Temperature-2 corpus rebalancing: per-source `ceil(sqrt(n))`
    * quotas via the portable md5 order — the multi-source mixing rule
    * (big sources downweighted sub-linearly). sqrt/ceil are exact IEEE
    * ops — full hash gate. */
  def d14TemperatureSample(s: SparkSession, dir: String): DataFrame =
    Packing.temperatureSample(
        t(s, dir, "documents").select("doc_id", "source"),
        "source", "doc_id")
      .orderBy("source", "doc_id")

  val d14Sql: String =
    """SELECT source, doc_id FROM (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk,
      |    CAST(ceil(sqrt(COUNT(*) OVER (PARTITION BY source) * 1.0))
      |      AS BIGINT) AS quota
      |  FROM documents
      |) WHERE rk <= quota ORDER BY source, doc_id""".stripMargin

  // -------------------------------------- e7 range join (oracle)
  /** Binned range join gate: purchases (points) matched into 6-hour
    * post-error windows per user — "which purchases happened within
    * six hours of an error". The engine's equi-join-on-bins plan vs
    * DuckDB's plain inequality join; integer µs arithmetic, so the
    * gate is a full hash match. binWidth = 2 h < the 6 h window, so
    * the gate exercises the multi-bin explode (each interval covers
    * 4 bins) AND the pairs-meet-once property. */
  def e7RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = CoreQueries.events(s, dir)
    val hourUs = 3600L * 1000000L
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("pt"))
    val windows = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_event_id"),
        unix_micros(col("ts")).as("w_start"),
        (unix_micros(col("ts")) + 6L * hourUs).as("w_end"))
    RangeJoin.pointInInterval(purchases, windows, Seq("user_id"),
        "pt", "w_start", "w_end", binWidth = 2L * hourUs,
        rightPrefix = "r_")
      .select(col("user_id"), col("event_id"),
        col("r_err_event_id").as("err_event_id"))
      .orderBy("user_id", "event_id", "err_event_id")
  }

  val e7Sql: String =
    """SELECT p.user_id, p.event_id, e.event_id AS err_event_id
      |FROM (SELECT user_id, event_id, epoch_us(ts) AS pt FROM events
      |      WHERE event_type = 'purchase') p
      |JOIN (SELECT user_id, event_id, epoch_us(ts) AS ws FROM events
      |      WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id
      | AND p.pt >= e.ws AND p.pt <= e.ws + 21600000000
      |ORDER BY p.user_id, p.event_id, err_event_id""".stripMargin

  // ------------------------------- d16 document chunking (oracle)
  /** Sliding-window chunking gate: 64-token chunks, 16-token overlap
    * (stride 48). Chunk text is digested (md5) so the gate compares
    * exact chunk CONTENT, not just counts; integer chunk arithmetic —
    * full hash match. */
  def d16Chunking(s: SparkSession, dir: String): DataFrame =
    Packing.chunkByTokens(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 64, overlap = 16)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        md5(col("chunk_text")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")

  val d16Sql: String =
    """WITH norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS nt
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, string_split(nt, ' ') AS tk,
      |    CASE WHEN length(nt) = 0 THEN 0
      |         ELSE len(string_split(nt, ' ')) END AS n
      |  FROM norm
      |), counted AS (
      |  SELECT doc_id, tk,
      |    CASE WHEN n = 0 THEN 0
      |         WHEN n <= 64 THEN 1
      |         ELSE (n - 64 + 47) // 48 + 1 END AS nc
      |  FROM toks
      |), chunks AS (
      |  SELECT doc_id, unnest(generate_series(0, nc - 1)) AS chunk_idx, tk
      |  FROM counted WHERE nc > 0
      |)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  CAST(len(list_slice(tk, chunk_idx * 48 + 1, chunk_idx * 48 + 64))
      |    AS BIGINT) AS n_tokens,
      |  md5(array_to_string(
      |    list_slice(tk, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' '))
      |    AS chunk_fp
      |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------- d17 global shuffle order (oracle)
  /** Reproducible-training-order gate: contiguous global index in the
    * portable md5 shuffle order, computed with the two-level
    * (bucket-parallel) numbering — vs DuckDB's direct global
    * ROW_NUMBER. A hash match proves bucket-major numbering equals the
    * true global order. */
  def d17GlobalOrder(s: SparkSession, dir: String): DataFrame =
    Packing.globalOrderIndex(
        t(s, dir, "documents").select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "order_idx")
      .orderBy("order_idx")

  val d17Sql: String =
    """SELECT doc_id, lang,
      |  ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1
      |    AS order_idx
      |FROM documents ORDER BY order_idx""".stripMargin

  // --------------------------- d15 percentile profile (oracle)
  /** Per-language token-count percentiles (p50/p90/p99) — the corpus
    * length-distribution profile a curriculum/packing step reads.
    * Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    * same linear-interpolation definition over exact integer inputs;
    * round 6 absorbs any final-ulp divergence. */
  def d15LengthPercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n"))
      .groupBy("lang")
      .agg(round(percentile(col("n"), lit(0.5)), 6).as("p50"),
        round(percentile(col("n"), lit(0.9)), 6).as("p90"),
        round(percentile(col("n"), lit(0.99)), 6).as("p99"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  val d15Sql: String =
    """SELECT lang,
      |  round(quantile_cont(n, 0.5), 6) AS p50,
      |  round(quantile_cont(n, 0.9), 6) AS p90,
      |  round(quantile_cont(n, 0.99), 6) AS p99,
      |  COUNT(*) AS n_docs
      |FROM (
      |  SELECT lang,
      |    CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      |         ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n
      |  FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ----------------------- e8 semantic dedup, planted codebook (oracle)
  private val E8Cells = 8
  private val E8Threshold = 0.95

  /** e8's planted codebook: [[plantedCentroid]] at stride base 131 —
    * distinct from both the e2b hyperplanes (42) and e3b (77). */
  private def e8Centroid(cell: Int, dim: Int): Double =
    plantedCentroid(131, cell, dim)

  /** SemDeDup gate ([[Dedup.semanticDedup]] — cluster-then-prune
    * semantic dedup): embeddings plus exact copies (id + 1000000) run
    * the REAL assignment → within-cell cosine → keep-lowest-id path
    * with planted LCG centroids (the production KMeans fit is
    * seed-dependent; [[Dedup.semanticDedupFit]] shares this exact
    * downstream code). Every copy must drop (its original is a
    * lower-id cell-mate at cosine exactly 1); any naturally-similar
    * pair prunes identically in both engines because assignment and
    * cosine are in-order double folds DuckDB replays bit-identically
    * (e3b argmin + NOT-EXISTS prune). Output = kept (id, cell) —
    * integers, full hash gate. */
  def e8SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb0 = t(s, dir, "embeddings")
    // max-dim guard: same reasoning as e3b — a ragged vintage would
    // null-pad zip_with on the Spark side while DuckDB loops per-row
    val dim = emb0.agg(max(size(col("embedding"))).as("d")).head(1)
      .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0)))
      .getOrElse(8)
    val emb = emb0.where(size(col("embedding")) === dim)
      .select("vec_id", "embedding")
    val planted = emb.unionByName(emb.select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val centroids = (0 until E8Cells).map(cell =>
      Array.tabulate(dim)(d => e8Centroid(cell, d)))
    Dedup.semanticDedup(planted, centroids, E8Threshold)
      .orderBy("id")
  }

  val e8Sql: String = {
    import PlantedSql.cos
    val distCols = PlantedSql.distCols(131, E8Cells, "v")
    val dls = PlantedSql.leastList(E8Cells)
    val argmin = PlantedSql.argminCase(E8Cells)
    s"""WITH dim AS (
       |  SELECT max(len(embedding)) AS d FROM embeddings
       |), planted AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE len(embedding) = (SELECT d FROM dim)
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE len(embedding) = (SELECT d FROM dim)
       |), dists AS (
       |  SELECT id, v,
       |    $distCols
       |  FROM planted
       |), assigned AS (
       |  SELECT id, v, CASE $argmin END AS cell
       |  FROM (SELECT *, LEAST($dls) AS m FROM dists)
       |)
       |SELECT a.id, a.cell FROM assigned a
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM assigned b
       |  WHERE b.cell = a.cell AND b.id < a.id
       |    AND ${cos("a.v", "b.v")} >= $E8Threshold)
       |ORDER BY a.id""".stripMargin
  }

  // ------------------------------ e9 int8 quantization (oracle)
  /** Scalar-quantization gate ([[Similarity.quantizeInt8]]): per-vector
    * affine int8 codes, dequant params, reconstruction MSE. Codes are
    * digested (md5 over the comma-joined code list) so the gate
    * compares exact CODE CONTENT without array-formatting hazards;
    * floor(x + 0.5) on both sides dodges the engines' differing
    * round() conventions; lo/scale/mse are in-order IEEE folds —
    * bit-identical, emitted round-6. */
  def e9QuantizeInt8(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(t(s, dir, "embeddings"))
      .select(col("vec_id"),
        md5(array_join(col("codes").cast("array<string>"), ","))
          .as("code_fp"),
        round(col("lo"), 6).as("lo_r"),
        round(col("scale"), 6).as("scale_r"),
        round(col("mse"), 6).as("mse_r"))
      .orderBy("vec_id")

  val e9Sql: String = {
    val code = "CAST(LEAST(GREATEST(floor((x - lo) / scale + 0.5), 0.0), 255.0) AS BIGINT)"
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    COALESCE(list_min(CAST(embedding AS DOUBLE[])), 0.0) AS lo,
       |    COALESCE((list_max(CAST(embedding AS DOUBLE[]))
       |      - list_min(CAST(embedding AS DOUBLE[]))) / 255.0, 0.0) AS scale
       |  FROM embeddings
       |), coded AS (
       |  SELECT vec_id, v, lo, scale,
       |    CASE WHEN scale = 0
       |      THEN list_transform(v, x -> CAST(0 AS BIGINT))
       |      ELSE list_transform(v, x -> $code) END AS codes
       |  FROM base
       |)
       |SELECT vec_id,
       |  -- COALESCE: DuckDB's array_to_string([]) is NULL where the
       |  -- engine's array_join([]) is '' — an EMPTY vector must
       |  -- fingerprint md5('') on both sides, while NULL stays NULL
       |  CASE WHEN codes IS NULL THEN NULL
       |    ELSE md5(COALESCE(array_to_string(codes, ','), '')) END
       |    AS code_fp,
       |  round(lo, 6) AS lo_r,
       |  round(scale, 6) AS scale_r,
       |  round(CASE WHEN len(v) = 0 THEN 0.0 ELSE
       |    list_reduce(list_transform(generate_series(1, len(v)),
       |      i -> (v[i] - (lo + CASE WHEN scale = 0 THEN 0.0
       |              ELSE CAST(LEAST(GREATEST(
       |                floor((v[i] - lo) / scale + 0.5), 0.0), 255.0)
       |                AS DOUBLE) END * scale))
       |         * (v[i] - (lo + CASE WHEN scale = 0 THEN 0.0
       |              ELSE CAST(LEAST(GREATEST(
       |                floor((v[i] - lo) / scale + 0.5), 0.0), 255.0)
       |                AS DOUBLE) END * scale))),
       |      (acc, x) -> acc + x) / len(v) END, 6) AS mse_r
       |FROM coded ORDER BY vec_id""".stripMargin
  }

  // -------------------- d18 corpus-global duplicate n-grams (oracle)
  /** Exact-substring-dedup signal ([[Contamination.corpusDupNgrams]]):
    * per document, the fraction of its 5-gram instances whose gram
    * occurs in >= 2 distinct documents corpus-wide. Distinct from d13
    * (overlap vs a planted benchmark subset) — this is the
    * corpus-global repeated-boilerplate profile. Integer counts plus
    * one round-6 division — full hash gate. */
  def d18DupNgrams(s: SparkSession, dir: String): DataFrame =
    Contamination.corpusDupNgrams(t(s, dir, "documents"))
      .orderBy("doc_id")

  val d18Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
      |                 ' ') AS tk
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(tk) - 4),
      |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
      |      || tk[i+3] || ' ' || tk[i+4])) AS gram
      |  FROM toks WHERE len(tk) >= 5
      |), gc AS (
      |  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT gram, COUNT(*) AS df FROM gc GROUP BY 1
      |), per AS (
      |  SELECT gc.doc_id, SUM(c) AS n_grams,
      |    SUM(CASE WHEN df >= 2 THEN c ELSE 0 END) AS n_dup
      |  FROM gc JOIN dfreq USING (gram) GROUP BY 1
      |)
      |SELECT d.doc_id,
      |  CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup,
      |  CASE WHEN COALESCE(per.n_grams, 0) = 0 THEN 0.0
      |       ELSE round(per.n_dup * 1.0 / per.n_grams, 6) END AS dup_frac
      |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------ d19 BPE-ish token counts (oracle)
  /** Tokenizer-cost profile: whitespace tokens vs BPE-ish pieces
    * (word runs + standalone punctuation — the pre-tokenization split
    * every BPE vocabulary builds on). [[TextAnalysis.bpeishTokenCount]]
    * was unit-only until now. */
  def d19BpeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe"))
      .orderBy("doc_id")

  val d19Sql: String =
    """SELECT doc_id,
      |  CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      |       ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n_ws,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_bpe
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------- e10 quantized ANN composition (oracle)
  /** End-to-end int8 ANN: quantize → dequantize → exact top-k over the
    * RECONSTRUCTED vectors ([[Similarity.quantizeInt8]] composed into
    * [[Similarity.bruteForceTopK]]) — gates that the code path a
    * quantized vector store actually serves (codes, not floats)
    * preserves neighbor ranking deterministically. Every step is the
    * same bit-exact arithmetic e9/e1 gate individually; this gate pins
    * the COMPOSITION. Rank-only output (e1 pattern). */
  def e10QuantizedAnn(s: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(t(s, dir, "embeddings"))
    val recon = q.select(col("vec_id"),
      transform(col("codes"),
        c => col("lo") + c.cast("double") * col("scale")).as("embedding"))
    Similarity.bruteForceTopK(recon, recon.filter(col("vec_id") < 3), k = 5)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  val e10Sql: String = {
    val code = "CAST(LEAST(GREATEST(floor((x - lo) / scale + 0.5), 0.0), 255.0) AS BIGINT)"
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    COALESCE(list_min(CAST(embedding AS DOUBLE[])), 0.0) AS lo,
       |    COALESCE((list_max(CAST(embedding AS DOUBLE[]))
       |      - list_min(CAST(embedding AS DOUBLE[]))) / 255.0, 0.0) AS scale
       |  FROM embeddings
       |), recon AS (
       |  SELECT vec_id,
       |    CASE WHEN scale = 0 THEN list_transform(v, x -> lo + 0.0 * scale)
       |    ELSE list_transform(v, x -> lo + CAST($code AS DOUBLE) * scale)
       |    END AS rv
       |  FROM base
       |)
       |SELECT qid, nid, rank FROM (
       |  -- NULL/dim-mismatched candidates excluded, like e1: the
       |  -- engine's vecDot NULLs them and bruteForceTopK drops NULL
       |  -- scores (the truncated-dot the index arithmetic would
       |  -- compute for a longer list is not a neighbor score)
       |  SELECT q.vec_id AS qid, e.vec_id AS nid,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${PlantedSql.cos("q.rv", "e.rv")} DESC,
       |               e.vec_id ASC) AS rank
       |  FROM recon q, recon e
       |  WHERE q.vec_id < 3 AND e.vec_id <> q.vec_id
       |    AND q.rv IS NOT NULL AND e.rv IS NOT NULL
       |    AND len(e.rv) = len(q.rv)) sub
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // ------------------------------------ d20 salted join (oracle)
  /** Salted-join parity gate ([[Skew.saltedJoin]] was unit-only):
    * lineitem salt-joined to part on the part key, rolled up per
    * brand, must equal DuckDB's plain join — the salt must be
    * invisible in the RESULT (its whole contract). Decimal-cast sums
    * keep the rollup order-independent and exact. */
  def d20SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
    val part = t(s, dir, "part").select("p_partkey", "p_brand")
    Skew.saltedJoin(li, part, "p_partkey", saltFactor = 4)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).cast("double").as("total_qty"))
      .orderBy("p_brand")
  }

  val d20Sql: String =
    """SELECT p.p_brand, COUNT(*) AS n,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_qty
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------ d23 line-level dedup (oracle)
  /** Corpus line-dedup gate ([[LineDedup.dedupLines]] — the
    * CCNet-style boilerplate strip). Planted multi-line corpus: each
    * document (ids < 500) gets four lines — its own text (naturally
    * duplicated texts in the corpus must be stripped everywhere), a
    * boilerplate banner shared by every doc (always stripped), a
    * per-doc unique body line (always kept), and a 1-in-7 shared
    * cookie line (stripped for the 7-multiples, kept as a unique tail
    * elsewhere). Output = rebuilt text + kept/removed counts per doc —
    * exact strings and integers, full hash gate. */
  def d23LineDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 500)
    val planted = docs.select(col("doc_id"),
      concat_ws("\n",
        col("text"),
        lit("subscribe to our newsletter for updates"),
        concat(lit("doc body "), col("doc_id")),
        when(pmod(col("doc_id"), lit(7)) === 0,
            lit("cookie policy accepted"))
          .otherwise(concat(lit("tail "), col("doc_id")))).as("text"))
    LineDedup.dedupLines(planted, "text", "doc_id")
      .orderBy("doc_id")
  }

  val d23Sql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    -- concat_ws, not ||: both engines SKIP a NULL text here, so
      |    -- a missing-body doc plants 3 boilerplate lines instead of
      |    -- vanishing into a NULL document (|| would null the whole
      |    -- concatenation and the oracle would drop the doc row that
      |    -- the engine keeps — found by the planted-parity harness)
      |    concat_ws(chr(10), text,
      |      'subscribe to our newsletter for updates',
      |      'doc body ' || doc_id,
      |      CASE WHEN doc_id % 7 = 0 THEN 'cookie policy accepted'
      |           ELSE 'tail ' || doc_id END) AS text
      |  FROM documents WHERE doc_id < 500
      |), ls AS (
      |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted
      |), lines AS (
      |  SELECT doc_id, pos, ls[pos] AS line
      |  FROM ls, UNNEST(generate_series(1, len(ls))) AS t(pos)
      |), fp AS (
      |  SELECT doc_id, pos, line,
      |    md5(lower(trim(regexp_replace(line, '\s+', ' ', 'g')))) AS f,
      |    length(lower(trim(regexp_replace(line, '\s+', ' ', 'g')))) AS ln
      |  FROM lines
      |), banned AS (
      |  SELECT f FROM fp WHERE ln >= 1 GROUP BY f HAVING COUNT(*) > 1
      |), marked AS (
      |  SELECT doc_id, pos, line, f IN (SELECT f FROM banned) AS b FROM fp
      |)
      |SELECT doc_id,
      |  COALESCE(string_agg(line, chr(10) ORDER BY pos)
      |    FILTER (WHERE NOT b), '') AS text,
      |  COUNT(*) FILTER (WHERE NOT b) AS n_lines_kept,
      |  COUNT(*) FILTER (WHERE b) AS n_lines_removed
      |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------- d24 bigram LM surprise (oracle)
  /** Corpus-LM quality scoring gate ([[LangModel.bigramSurprise]] —
    * the KenLM-perplexity-filter shape with integer-exact surprise).
    * Full table through train + score; every per-doc count and the
    * scaled surprise sum are exact integers, so the gate is a full
    * hash match (the one double is a fixed-order division rounded to
    * 6). */
  def d24BigramSurprise(s: SparkSession, dir: String): DataFrame =
    LangModel.bigramSurprise(t(s, dir, "documents"))
      .orderBy("doc_id")

  val d24Sql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
      |                 ' ') AS tk
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
      |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS t(i)
      |  WHERE len(tk) >= 2
      |), counts AS (
      |  SELECT g, COUNT(*) AS c FROM bg GROUP BY g
      |), perdoc AS (
      |  SELECT b.doc_id, COUNT(*) AS n_bigrams,
      |    SUM(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS n_hapax,
      |    SUM(${LangModel.Scale} // c.c) AS surprise_scaled
      |  FROM bg b JOIN counts c ON b.g = c.g GROUP BY b.doc_id
      |)
      |SELECT d.doc_id,
      |  COALESCE(p.n_bigrams, 0) AS n_bigrams,
      |  CAST(COALESCE(p.n_hapax, 0) AS BIGINT) AS n_hapax,
      |  CAST(COALESCE(p.surprise_scaled, 0) AS BIGINT) AS surprise_scaled,
      |  CASE WHEN p.n_bigrams IS NULL THEN 0.0
      |       ELSE round(CAST(p.surprise_scaled AS DOUBLE) / p.n_bigrams
      |            / ${LangModel.Scale}.0, 6) END AS mean_surprise
      |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------- e13 BM25 retrieval (oracle)
  /** BM25 keyword-retrieval gate ([[Retrieval.bm25TopK]]). Probe
    * queries are the first four tokens of documents 0–4; every
    * arithmetic step is either integer, a correctly-rounded IEEE
    * +/−/×/÷ chain mirrored operation-for-operation in the SQL, or the
    * e9 `floor(x·10⁹ + ½)` integer scaling — so ranks AND scores hash
    * exactly. */
  def e13Bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val probes = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(norm, " "), 1, 4)).as("query"))
    Retrieval.bm25TopK(docs, probes, k = 10)
      .orderBy("query_id", "rank")
  }

  val e13Sql: String = bm25ReplaySql(5, 10)

  /** The full BM25 replay (postings, rational idf, integer-scaled
    * per-term scores, per-query top-k), parameterized by the probe
    * window and k — shared by e13 (unindexed), i38 (persisted text
    * index), and i39 (incrementally chained index), so the three
    * paths' oracles are one definition. */
  private[queries] def bm25ReplaySql(probeMaxId: Int, k: Int,
      corpusSql: String = "SELECT doc_id, text FROM documents",
      qtermsSql: Option[String] = None): String =
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |    -- the empty token is dropped (Retrieval.toks's array_remove
      |    -- rule): an empty/whitespace-only doc must index as dl 0,
      |    -- not dl 1 — a phantom '' token here inflates avgdl and
      |    -- shifts EVERY BM25 score in the corpus
      |    list_filter(
      |      string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
      |                   ' '), t -> t <> '') AS tk
      |  FROM ($corpusSql) AS src
      |), post AS (
      |  SELECT doc_id, tk[i] AS term, len(tk) AS dl, COUNT(*) AS tf
      |  FROM toks, UNNEST(generate_series(1, len(tk))) AS t(i)
      |  GROUP BY doc_id, tk[i], len(tk)
      |), stats AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |    CAST(SUM(len(tk)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      |  FROM toks
      |), dfreq AS (
      |  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post GROUP BY term
      |), qterms AS (
      |  ${qtermsSql.getOrElse("SELECT doc_id AS query_id, " +
          "UNNEST(list_distinct(tk[1:4])) AS term FROM toks " +
          s"WHERE doc_id < $probeMaxId")}
      |), qidf AS (
      |  SELECT q.query_id, q.term,
      |    (s.n_docs - d.df + 0.5) / (d.df + 0.5) AS idf, s.avgdl
      |  FROM qterms q JOIN dfreq d ON d.term = q.term, stats s
      |), perterm AS (
      |  SELECT q.query_id, p.doc_id,
      |    CAST(floor(q.idf * (p.tf * CAST(2.2 AS DOUBLE))
      |      / (p.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
      |          + CAST(0.75 AS DOUBLE) * (p.dl / q.avgdl)))
      |      * 1000000000.0 + 0.5) AS BIGINT) AS s
      |  FROM post p JOIN qidf q ON q.term = p.term
      |), scored AS (
      |  SELECT query_id, doc_id,
      |    CAST(SUM(s) AS BIGINT) AS score_scaled
      |  FROM perterm GROUP BY query_id, doc_id
      |)
      |SELECT query_id, rank, doc_id, score_scaled FROM (
      |  SELECT query_id, doc_id, score_scaled,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score_scaled DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM scored) r
      |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // --------------- e19 composed IVF + PQ ANN (planted, oracle)
  private val E19Cells = 8
  private val E19Nprobe = 3
  private val E19M = 4
  private val E19Ksub = 8
  // strides 29 (coarse cells) and 311 (codebooks): distinct from every
  // other planted family (42 / 77 / 131 / 191 / 53)
  private def e19Cell(cell: Int, d: Int): Double =
    plantedCentroid(29, cell, d)
  private def e19Cent(j: Int, c: Int, d: Int): Double =
    plantedCentroid(311, j * E19Ksub + c, d)

  /** Composed IVF+PQ gate ([[Similarity.ivfPqTopK]] — coarse-cell
    * probe, ADC-over-codes rank: the IVFPQ layout). Both models are
    * planted LCG (the e3b/e15 pattern — bypasses seed dependence), so
    * the DuckDB oracle replays the ENTIRE composition: coarse argmin
    * assignment, nprobe cosine probe, per-subspace argmin codes,
    * per-query distance tables, the j-ordered ADC fold over ONLY the
    * probed cells' vectors, and the (adc asc, nid asc) rank. Exact
    * IEEE folds end to end; rank-only output. */
  def e19IvfPqCompose(s: SparkSession, dir: String): DataFrame = {
    val emb0 = t(s, dir, "embeddings")
    val dim = emb0.agg(max(size(col("embedding"))).as("d")).head(1)
      .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getInt(0)))
      .getOrElse(64)
    val emb = emb0.where(size(col("embedding")) === dim)
    val centroids = (0 until E19Cells).map(cell =>
      Array.tabulate(dim)(d => e19Cell(cell, d)))
    val dsub = math.max(1, dim / E19M)
    val codebooks: Seq[Seq[Array[Double]]] = (0 until E19M).map(j =>
      (0 until E19Ksub).map(c =>
        Array.tabulate(dsub)(d => e19Cent(j, c, d))): Seq[Array[Double]])
    Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 3),
        centroids, codebooks, k = 5, nprobe = E19Nprobe)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  /** e19 oracle: the annReplaySql assignment/probe composed with the
    * e15b codes/ADC replay, both models as in-SQL LCG expressions
    * (dim-agnostic, no stash). */
  val e19Sql: String = {
    import PlantedSql.cos
    def fCell(cell: String): String = PlantedSql.centroid(29, cell)
    val distCols = PlantedSql.distCols(29, E19Cells, "cv")
    val dls = PlantedSql.leastList(E19Cells)
    val argmin = PlantedSql.argminCase(E19Cells)
    // planted codebook centroid (j, c) at sub-dim d — the combined
    // LCG cell index j·ksub + c, matching e19Cent
    def fCent(jc: String): String = PlantedSql.centroid(311, jc)
    s"""WITH dim AS (
       |  SELECT max(len(embedding)) AS d FROM embeddings
       |), dsub AS (
       |  SELECT greatest(1, (SELECT d FROM dim) // $E19M) AS s
       |), corpus AS (
       |  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE len(embedding) = (SELECT d FROM dim)
       |), q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings
       |  WHERE vec_id < 3 AND len(embedding) = (SELECT d FROM dim)
       |), cells AS (
       |  SELECT cell, list_transform(
       |    generate_series(1, (SELECT d FROM dim)),
       |    i -> CAST(${fCell("cell")} AS DOUBLE)) AS ctr
       |  FROM (SELECT unnest(generate_series(0, ${E19Cells - 1})) AS cell)
       |), cdists AS (
       |  SELECT nid, cv,
       |    $distCols
       |  FROM corpus
       |), assigned AS (
       |  SELECT nid, cv, CASE $argmin END AS cell
       |  FROM (SELECT *, LEAST($dls) AS m FROM cdists)
       |), probes AS (
       |  SELECT qid, qv, cell FROM (
       |    SELECT q.qid, q.qv, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY ${cos("q.qv", "c.ctr")} DESC, c.cell ASC) AS cr
       |    FROM q CROSS JOIN cells c
       |  ) WHERE cr <= $E19Nprobe
       |), cents AS (
       |  SELECT j, c, list_transform(generate_series(1, (SELECT s FROM dsub)),
       |    i -> CAST(${fCent(s"(j * $E19Ksub + c)")} AS DOUBLE)) AS v
       |  FROM (SELECT unnest(generate_series(0, ${E19M - 1})) AS j)
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${E19Ksub - 1})) AS c)
       |), pqdist AS (
       |  SELECT a.nid, a.cell, t.j, t.c,
       |    list_reduce(list_transform(generate_series(1, len(t.v)),
       |      i -> (a.cv[t.j * len(t.v) + i] - t.v[i])
       |         * (a.cv[t.j * len(t.v) + i] - t.v[i])),
       |      (acc, x) -> acc + x) AS d2
       |  FROM assigned a CROSS JOIN cents t
       |), codes AS (
       |  SELECT nid, cell, j, (list(c ORDER BY d2 ASC, c ASC))[1] AS code
       |  FROM pqdist GROUP BY nid, cell, j
       |), qdist AS (
       |  SELECT qid, j, c,
       |    list_reduce(list_transform(generate_series(1, len(v)),
       |      i -> (qv[j * len(v) + i] - v[i])
       |         * (qv[j * len(v) + i] - v[i])),
       |      (acc, x) -> acc + x) AS d2
       |  FROM q CROSS JOIN cents
       |), adc AS (
       |  SELECT p.qid, k.nid,
       |    list_reduce(list(qd.d2 ORDER BY qd.j), (acc, x) -> acc + x)
       |      AS dist
       |  FROM probes p
       |  JOIN codes k ON k.cell = p.cell AND k.nid <> p.qid
       |  JOIN qdist qd ON qd.qid = p.qid AND qd.j = k.j AND qd.c = k.code
       |  GROUP BY p.qid, k.nid
       |)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY dist ASC, nid ASC) AS rank FROM adc
       |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // ----------- e18 indexed BM25 over a cached postings index (oracle)

  /** Memoized per-sfDir postings index: ONE corpus pass into
    * `(doc_id, term, dl, tf, tbucket)` plus the exact-long corpus
    * stats, cached — the bench analog of a `build_text_index` table
    * (the d41/e17 pattern: built in the warmup pass; on a real cluster
    * this is the term-bucket-partitioned table i38 drives through
    * SQL). 64 buckets so the probed read is a thin slice. */
  private val e18Index = new scala.collection.concurrent.TrieMap[
    String, (DataFrame, Long, Long)]
  private val E18Buckets = 64
  private def e18IndexFor(s: SparkSession,
      dir: String): (DataFrame, Long, Long) =
    e18Index.getOrElseUpdate(dir, {
      val docs = t(s, dir, "documents")
      val post = Retrieval.postings(docs)
        .withColumn("tbucket", graft.functions.IcebergFunctions
          .icebergBucket(col("term"), E18Buckets))
        .cache()
      val (nDocs, totalDl) = Retrieval.corpusStats(docs)
      (post, nDocs, totalDl)
    })

  /** [[Retrieval.bm25FromIndex]] against the cached postings index —
    * e13's probes and k, so the result (and oracle) is bit-identical
    * to the unindexed path; the timed work is the query-term bucket
    * load + df + score + top-k, never a corpus tokenization pass. */
  def e18Bm25Indexed(s: SparkSession, dir: String): DataFrame = {
    val (post, nDocs, totalDl) = e18IndexFor(s, dir)
    val docs = t(s, dir, "documents")
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val probes = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(norm, " "), 1, 4)).as("query"))
    Retrieval.bm25FromIndex(
      terms => {
        val buckets = terms.map(term => graft.functions.BucketUtil
          .bucketUTF8(org.apache.spark.unsafe.types.UTF8String
            .fromString(term), E18Buckets)).distinct
        post.where(col("tbucket").isin(buckets: _*))
      },
      probes, nDocs, totalDl, k = 10)
      .orderBy("query_id", "rank")
  }

  val e18Sql: String = bm25ReplaySql(5, 10)

  // -------- e22 indexed hybrid RRF over BOTH cached indexes (oracle)
  /** [[Retrieval.rrfFuse]] of the INDEXED retrievers — e18's
    * bucket-pruned BM25 top-20 + e17's probed-cell IVF exact-cosine
    * top-20, fused to the top-10: the production hybrid-search shape
    * at 100 TB, where NEITHER retriever may touch a corpus at query
    * time (contrast e20: same fusion, deliberately unindexed
    * retrievers). Both indexes are built in the memoized warmup pass
    * (the d41/e17/e18 pattern — on a real cluster these are the
    * `build_text_index` / `build_ann_index` tables i56 drives through
    * `CALL hybrid_search`), so the timed path is: query-term bucket
    * load + score, nprobe probe + probed-cells load + re-rank, and a
    * top-k-list-sized fusion. Fused scores are exact longs, so the
    * gate hashes scores, membership AND ranks. */
  def e22HybridIndexed(s: SparkSession, dir: String): DataFrame = {
    val (post, nDocs, totalDl) = e18IndexFor(s, dir)
    val docs = t(s, dir, "documents")
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val probes = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(norm, " "), 1, 4)).as("query"))
    val lex = Retrieval.bm25FromIndex(
      terms => {
        val buckets = terms.map(term => graft.functions.BucketUtil
          .bucketUTF8(org.apache.spark.unsafe.types.UTF8String
            .fromString(term), E18Buckets)).distinct
        post.where(col("tbucket").isin(buckets: _*))
      },
      probes, nDocs, totalDl, k = 20)
      .select("query_id", "doc_id", "rank")
    val (centroids, assigned) = e17IndexFor(s, dir)
    val dim = centroids.head.length
    val qs = t(s, dir, "embeddings")
      .where(col("vec_id") < 5 && size(col("embedding")) === dim)
    val vec = Similarity.ivfTopKFromIndex(
        cells => assigned.where(col("cell").isin(cells: _*)),
        qs, centroids, k = 20, nprobe = E17Nprobe)
      .select(col("qid").as("query_id"), col("nid").as("doc_id"),
        col("rank").cast("long").as("rank"))
    Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("query_id", "rank")
  }

  /** e22 oracle: the e18 BM25 replay (top-20) + the e17 planted-IVF
    * replay (stride 53, top-20, probes < 5) composed with the e20
    * fusion CTE — all three ingredient definitions shared with their
    * own gates. */
  val e22Sql: String = {
    val R = Retrieval.RrfScale
    raw"""WITH lex AS (
      |  SELECT query_id, doc_id, rank FROM (
      |${bm25ReplaySql(5, 20)}) AS l
      |), vec AS (
      |  SELECT qid AS query_id, nid AS doc_id,
      |    CAST(rank AS BIGINT) AS rank
      |  FROM (
      |${plantedIvfSearchSql(53, E17Cells, E17Nprobe,
           probeMaxId = 5, k = 20)}) AS a
      |), uni AS (
      |  SELECT query_id, doc_id,
      |    CAST($R AS BIGINT) // (60 + rank) AS c FROM lex
      |  UNION ALL
      |  SELECT query_id, doc_id,
      |    CAST($R AS BIGINT) // (60 + rank) AS c FROM vec
      |), fused AS (
      |  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_scaled,
      |    COUNT(*) AS n_lists
      |  FROM uni GROUP BY 1, 2
      |)
      |SELECT query_id, rank, doc_id, rrf_scaled, n_lists FROM (
      |  SELECT query_id, doc_id, rrf_scaled, n_lists,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY rrf_scaled DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM fused) r
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // -------------------------------- d25 leakage-safe split (oracle)
  /** Leakage-safe split gate ([[Splits.leakageSafeSplit]]): the ccb
    * planted graph (chains, cliques, singletons) through the real
    * components + md5-bucket split. Labels and splits are exact
    * integers/strings — full hash gate; the no-edge-crosses-splits
    * invariant is additionally unit-asserted in SplitsSpec. */
  def d25LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Splits.leakageSafeSplit(docs, ccbEdges(docs))
      .orderBy("id")
  }

  val d25Sql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id < 200 AND a.doc_id % 10 <> 9
      |  UNION ALL
      |  SELECT a.doc_id, b.doc_id
      |  FROM documents a JOIN documents b
      |    ON a.doc_id // 5 = b.doc_id // 5 AND a.doc_id < b.doc_id
      |  WHERE a.doc_id >= 200 AND a.doc_id < 300
      |), sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION ALL
      |  SELECT id_b AS src, id_a AS dst FROM edges
      |), walk AS (
      |  SELECT src AS id, dst AS reach FROM sym
      |  UNION
      |  SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach
      |), comp AS (
      |  SELECT id, LEAST(id, MIN(reach)) AS component
      |  FROM walk GROUP BY id
      |), labeled AS (
      |  SELECT d.doc_id AS id,
      |    COALESCE(c.component, d.doc_id) AS component
      |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
      |)
      |SELECT id, component,
      |  CASE WHEN substr(md5('graft-split:' || component), 1, 2) < 'e6'
      |         THEN 'train'
      |       WHEN substr(md5('graft-split:' || component), 1, 2) < 'f3'
      |         THEN 'val'
      |       ELSE 'test' END AS split
      |FROM labeled ORDER BY id""".stripMargin

  // ------------------------------------- d26 filter funnel (oracle)
  /** Acceptance-funnel gate ([[FilterPipeline.funnel]]): the standard
    * corpus-build report — language ID → quality → repetition → exact
    * dedup, cumulative counts in ONE scan + ONE single-row aggregate
    * (plus the fingerprint window for the dedup-survivor flag). Every
    * stage reuses an already-hash-gated primitive (d4/d5/d12/d1), so
    * the funnel gate proves the COMPOSITION: bit-exact booleans
    * conjoined in the same order in both engines. */
  def d26FilterFunnel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the corpus carries no natural exact duplicates — plant copies of
    // the first docs (d6b convention) so the dedup stage FIRES
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val planted = docs.unionByName(docs.where(col("doc_id") < 40).select(
      (col("doc_id") + 1000000L).as("doc_id"), col("text")))
    // tokenize ONCE into a bound attribute (the d12 HOF discipline)
    val toksed = planted.select(col("doc_id"), col("text"),
      split(TextAnalysis.normalized(col("text")), " ").as("__toks"),
      TextAnalysis.tokenCount(col("text")).as("__n"))
    val base = toksed.select(col("doc_id"),
      (TextAnalysis.langId(col("text")) === "en").as("lang_ok"),
      (TextAnalysis.qualityScore(col("text")) >= 0.55).as("q_ok"),
      (round(when(col("__n") === 0, lit(1.0)).otherwise(
        TextAnalysis.distinctTokenRatioOfTokens(col("__toks"))), 6)
        >= 0.35).as("rep_ok"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val prior = col("lang_ok") && col("q_ok") && col("rep_ok")
    val flagged = base.withColumn("dedup_ok", col("doc_id") ===
      min(when(prior, col("doc_id"))).over(Window.partitionBy("fp")))
    FilterPipeline.funnel(flagged, Seq(
        "lang_en" -> col("lang_ok"),
        "quality" -> col("q_ok"),
        "repetition" -> col("rep_ok"),
        "dedup" -> col("dedup_ok")))
      .orderBy("stage_idx")
  }

  val d26Sql: String = {
    val scoreCols = langScoreColsSql
    val gmax = langGmaxSql
    val argmax = langArgmaxSql
    s"""WITH planted AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
       |  WHERE doc_id < 40
       |), padded AS (
       |  SELECT doc_id, text,
       |    ' ' || lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) || ' '
       |      AS p
       |  FROM planted
       |), scored AS (
       |  SELECT doc_id, text,
       |    $scoreCols
       |  FROM padded
       |), best AS (
       |  SELECT $gmax AS m, * FROM scored
       |), metrics AS (
       |  SELECT doc_id,
       |    (CASE WHEN m = 0 THEN 'unknown'
       |        $argmax
       |     END = 'en') AS lang_ok,
       |    (ROUND(LEAST(LENGTH(text) / 500.0, 1.0) * 0.4
       |      + LEAST((CASE WHEN LENGTH(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 THEN 0.0
       |          ELSE LEN(list_filter(
       |                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
       |                 t -> t IN ('the','a','an','and','or','of','to','in',
       |                            'is','it','that','for','on','with','as',
       |                            'at','by')))
       |               * 1.0 / LEN(string_split(lower(trim(regexp_replace(text,
       |                  '\\s+', ' ', 'g'))), ' ')) END) * 5.0, 1.0) * 0.3
       |      + GREATEST(0.0, 1.0 - (CASE WHEN LENGTH(text) = 0 THEN 0.0
       |          ELSE (LENGTH(text) - LENGTH(regexp_replace(text,
       |                 '[!-/:-@\\[-`{-~]', '', 'g'))) * 1.0 / LENGTH(text)
       |          END) * 4.0) * 0.3, 6) >= 0.55) AS q_ok,
       |    (CASE WHEN (CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 THEN 0
       |          ELSE len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) END) = 0
       |        THEN 1.0
       |        ELSE round(len(list_distinct(string_split(
       |               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
       |               ' '))) * 1.0
       |             / len(string_split(
       |               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
       |               ' ')), 6)
       |     END >= 0.35) AS rep_ok,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |  FROM best
       |), flags AS (
       |  SELECT doc_id, fp, lang_ok,
       |    lang_ok AND q_ok AS cum2,
       |    lang_ok AND q_ok AND rep_ok AS cum3
       |  FROM metrics
       |), keep AS (
       |  SELECT *, doc_id = MIN(CASE WHEN cum3 THEN doc_id END)
       |    OVER (PARTITION BY fp) AS dedup_ok
       |  FROM flags
       |)
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'total' AS stage,
       |    COUNT(*) AS n_docs FROM keep
       |  UNION ALL SELECT CAST(1 AS BIGINT), 'lang_en',
       |    COUNT(*) FILTER (WHERE lang_ok) FROM keep
       |  UNION ALL SELECT CAST(2 AS BIGINT), 'quality',
       |    COUNT(*) FILTER (WHERE cum2) FROM keep
       |  UNION ALL SELECT CAST(3 AS BIGINT), 'repetition',
       |    COUNT(*) FILTER (WHERE cum3) FROM keep
       |  UNION ALL SELECT CAST(4 AS BIGINT), 'dedup',
       |    COUNT(*) FILTER (WHERE cum3 AND dedup_ok) FROM keep
       |) ORDER BY stage_idx""".stripMargin
  }

  // --------------------------- d27 exact-substring dedup (oracle)
  /** Duplicate-passage gate ([[ExactSubstr.dupPassages]] — ExactSubstr
    * dedup at window granularity). A 24-token passage is planted at
    * the tail of every doc_id % 3 == 0 document (twice for % 21 == 0,
    * exercising WITHIN-document repeats); window = 20, so exactly the
    * windows fully inside a passage occurrence collide corpus-wide.
    * keepFirst exempts the canonical lowest-(id, pos) occurrence — the
    * spans are what a dedup pass would cut. Integer offsets + md5
    * windows: full hash gate against DuckDB's window-function replay
    * of the same count → mark → interval-merge pipeline. */
  def d27DupPassages(s: SparkSession, dir: String): DataFrame = {
    val passage = (0 until 24).map(i => s"zq$i").mkString(" ")
    val docs = t(s, dir, "documents").where(col("doc_id") < 300)
    val planted = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(21)) === 0,
          concat(col("text"), lit(s" $passage $passage")))
        .when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(s" $passage")))
        .otherwise(col("text")).as("text"))
    ExactSubstr.dupPassages(planted, window = 20)
      .orderBy("doc_id", "span_start")
  }

  val d27Sql: String = {
    val passage = (0 until 24).map(i => s"zq$i").mkString(" ")
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 21 = 0 THEN text || ' $passage $passage'
       |         WHEN doc_id % 3 = 0 THEN text || ' $passage'
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id < 300
       |), toks AS (
       |  SELECT doc_id,
       |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
       |                 ' ') AS tk
       |  FROM planted
       |), win AS (
       |  SELECT doc_id, i AS pos,
       |    md5(array_to_string(tk[i + 1 : i + 20], ' ')) AS h
       |  FROM toks, UNNEST(generate_series(0, len(tk) - 20)) AS t(i)
       |  WHERE len(tk) >= 20
       |), ranked AS (
       |  SELECT doc_id, pos, h,
       |    COUNT(*) OVER (PARTITION BY h) AS cnt,
       |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM win
       |), marked AS (
       |  SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn > 1
       |), flagged AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN MAX(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |         OR pos > MAX(pos + 20) OVER (PARTITION BY doc_id
       |           ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS newspan
       |  FROM marked
       |), sp AS (
       |  SELECT doc_id, pos, SUM(newspan) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span
       |  FROM flagged
       |)
       |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 20 AS span_end,
       |  COUNT(*) AS n_windows
       |FROM sp GROUP BY doc_id, span
       |ORDER BY doc_id, span_start""".stripMargin
  }

  // ---------------------------- d28 DSIR importance weights (oracle)
  /** Importance-weighting gate ([[Importance.importanceWeights]]):
    * every 17th document is the planted "target domain" sample, the
    * whole table is the source; per-doc integral likelihood-ratio
    * scores (bucketed hashed bigrams, broadcast model) hash-match
    * DuckDB's replay exactly. */
  def d28DsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val target = docs.where(pmod(col("doc_id"), lit(17)) === 0)
    Importance.importanceWeights(docs, target)
      .orderBy("doc_id")
  }

  val d28Sql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
      |                 ' ') AS tk
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
      |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS t(i)
      |  WHERE len(tk) >= 2
      |), feats AS (
      |  SELECT doc_id, substr(md5(g), 1, 4) AS b FROM bg
      |), sc AS (
      |  SELECT b, COUNT(*) AS s FROM feats GROUP BY b
      |), tc AS (
      |  SELECT b, COUNT(*) AS t FROM feats WHERE doc_id % 17 = 0
      |  GROUP BY b
      |), model AS (
      |  SELECT sc.b,
      |    (${Importance.Scale} * (COALESCE(t, 0) + 1))
      |      // (s + ${Importance.Buckets}) AS w
      |  FROM sc LEFT JOIN tc ON tc.b = sc.b
      |), perdoc AS (
      |  SELECT f.doc_id, COUNT(*) AS n_feats,
      |    CAST(SUM(w) AS BIGINT) AS weight_scaled
      |  FROM feats f JOIN model m ON m.b = f.b GROUP BY 1
      |)
      |SELECT d.doc_id,
      |  COALESCE(p.n_feats, 0) AS n_feats,
      |  COALESCE(p.weight_scaled, 0) AS weight_scaled,
      |  CASE WHEN p.n_feats IS NULL THEN 0.0
      |       ELSE round(CAST(p.weight_scaled AS DOUBLE) / p.n_feats
      |            / ${Importance.Scale}.0, 6) END AS mean_weight
      |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ----------------------- d29 duplicate-passage removal (oracle)
  /** Rewrite gate ([[ExactSubstr.removeDupPassages]]) over the d27
    * planted corpus: every duplicated passage keeps exactly its
    * canonical occurrence corpus-wide and every other copy is cut from
    * the rebuilt (normalized) text. Exact strings + integer token
    * accounting — full hash. */
  def d29RemovePassages(s: SparkSession, dir: String): DataFrame = {
    val passage = (0 until 24).map(i => s"zq$i").mkString(" ")
    val docs = t(s, dir, "documents").where(col("doc_id") < 300)
    val planted = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(21)) === 0,
          concat(col("text"), lit(s" $passage $passage")))
        .when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(s" $passage")))
        .otherwise(col("text")).as("text"))
    ExactSubstr.removeDupPassages(planted, window = 20)
      .orderBy("doc_id")
  }

  val d29Sql: String = {
    val passage = (0 until 24).map(i => s"zq$i").mkString(" ")
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 21 = 0 THEN text || ' $passage $passage'
       |         WHEN doc_id % 3 = 0 THEN text || ' $passage'
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id < 300
       |), toks AS (
       |  SELECT doc_id,
       |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
       |                 ' ') AS tk
       |  FROM planted
       |), win AS (
       |  SELECT doc_id, i AS pos,
       |    md5(array_to_string(tk[i + 1 : i + 20], ' ')) AS h
       |  FROM toks, UNNEST(generate_series(0, len(tk) - 20)) AS t(i)
       |  WHERE len(tk) >= 20
       |), ranked AS (
       |  SELECT doc_id, pos, h,
       |    COUNT(*) OVER (PARTITION BY h) AS cnt,
       |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM win
       |), marked AS (
       |  SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn > 1
       |), flagged AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN MAX(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |         OR pos > MAX(pos + 20) OVER (PARTITION BY doc_id
       |           ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS newspan
       |  FROM marked
       |), sp AS (
       |  SELECT doc_id, pos, SUM(newspan) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span
       |  FROM flagged
       |), spans AS (
       |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 20 AS span_end
       |  FROM sp GROUP BY doc_id, span
       |), spansagg AS (
       |  SELECT doc_id,
       |    list(struct_pack(s := span_start, e := span_end)) AS sps
       |  FROM spans GROUP BY doc_id
       |), toks0 AS (
       |  SELECT doc_id,
       |    string_split(lower(trim(regexp_replace(COALESCE(text, ''),
       |      '\\s+', ' ', 'g'))), ' ') AS tk
       |  FROM planted
       |), joined AS (
       |  SELECT t.doc_id, t.tk, COALESCE(g.sps, []) AS sps
       |  FROM toks0 t LEFT JOIN spansagg g USING (doc_id)
       |)
       |SELECT doc_id,
       |  COALESCE(array_to_string(list_transform(
       |    list_filter(generate_series(0, len(tk) - 1),
       |      i -> len(list_filter(sps, sp -> i >= sp.s AND i < sp.e)) = 0),
       |    i -> tk[i + 1]), ' '), '') AS text,
       |  CASE WHEN len(tk) = 1 AND tk[1] = '' THEN 0
       |       ELSE len(tk) END AS n_tokens,
       |  len(tk) - len(list_filter(generate_series(0, len(tk) - 1),
       |    i -> len(list_filter(sps, sp -> i >= sp.s AND i < sp.e)) = 0))
       |    AS n_tokens_removed
       |FROM joined ORDER BY doc_id""".stripMargin
  }

  // ------------------- d30/e14/d31/e16 multimodal decode (oracles)
  /** Four planting colors whose solid-PNG grid-mean embeddings are
    * pairwise far from parallel (per-channel values map to ≈ ±1 / 0
    * after the [-1,1] normalization), so the e14 cosine-0.98 verify
    * keeps exactly the within-group pairs. */
  private val MediaColors: Vector[(Int, Int, Int)] = Vector(
    (255, 128, 128), (128, 255, 128), (128, 128, 255), (0, 128, 128))

  /** Planted 8-bit PCM WAV for group `g`: 13 000 samples at 8 kHz,
    * amplitude 0x40 exactly in decoder windows {3g, 3g+1, 3g+2}
    * (1 000 samples each), silence elsewhere — so the windowed-energy
    * feature vector is 0.5 in three disjoint-per-group slots and 0
    * elsewhere: identical within a group, orthogonal across groups. */
  private def gateWav(group: Int): Array[Byte] = {
    val samples = new Array[Byte](13000)
    var w = group * 3
    while (w < group * 3 + 3) {
      java.util.Arrays.fill(samples, w * 1000, (w + 1) * 1000, 0x40.toByte)
      w += 1
    }
    Multimodal.pcm8Wav(samples, 8000)
  }

  /** Driver gate for the REAL `javax.imageio` decode path: solid PNGs
    * rendered executor-side with dims a pure function of doc_id flow
    * through the production [[Multimodal.decodeImages]]; the gate
    * hashes `(width, height, channels)` — values DuckDB predicts
    * arithmetically without any image codec. */
  def d30ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").where(col("doc_id") < 120)
      .select("doc_id").as[Long].map { id =>
        val (r, g, b) = MediaColors((id % 4).toInt)
        Multimodal.MediaRow(id, "image",
          Multimodal.solidPng(8 + (id % 16).toInt, 8 + (id % 11).toInt,
            r, g, b), Map.empty)
      }
    Multimodal.decodeImages(media, embeddingDim = 12).toDF()
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"))
      .orderBy("media_id")
  }

  val d30Sql: String =
    """SELECT doc_id AS media_id,
      |  8 + doc_id % 16 AS width,
      |  8 + doc_id % 11 AS height,
      |  CAST(3 AS BIGINT) AS channels
      |FROM documents WHERE doc_id < 120 ORDER BY media_id""".stripMargin

  /** End-to-end image near-dedup gate: byte-identical solid PNGs per
    * doc_id%4 group through the REAL render → decode → grid-mean
    * embedding → LSH bucket → cosine-verify pipeline. Recall is
    * structural (identical payloads ⇒ identical embeddings ⇒ same
    * bucket, cosine 1) and precision is arithmetic (cross-group
    * cosines ≈ 0 or −1, far from the 0.98 bar), so the full pair set
    * is hash-comparable against a codec-free DuckDB replica. */
  def e14ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").where(col("doc_id") < 80)
      .select("doc_id").as[Long].map { id =>
        val (r, g, b) = MediaColors((id % 4).toInt)
        Multimodal.MediaRow(id, "image",
          Multimodal.solidPng(16, 16, r, g, b), Map.empty)
      }
    Multimodal.imageNearDupEdges(media, embeddingDim = 12,
        planes = 12, threshold = 0.98)
      .orderBy("id_a", "id_b")
  }

  private val withinGroupPairsSql: String =
    """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 80)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM ids a JOIN ids b
      |  ON b.doc_id > a.doc_id AND a.doc_id % 4 = b.doc_id % 4
      |ORDER BY id_a, id_b""".stripMargin

  val e14Sql: String = withinGroupPairsSql

  /** Driver gate for the REAL `javax.sound.sampled` decode path:
    * planted 8-bit PCM WAVs through the production
    * [[Multimodal.extractAudioFeatures]]; gates
    * `(sample_rate, duration_ms)` — 8 000 Hz and
    * 13 000 frames · 1000 / 8000 = 1625 ms, pure arithmetic. */
  def d31AudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").where(col("doc_id") < 120)
      .select("doc_id").as[Long].map(id =>
        Multimodal.MediaRow(id, "audio", gateWav((id % 4).toInt),
          Map.empty))
    Multimodal.extractAudioFeatures(media).toDF()
      .select(col("media_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("duration_ms"))
      .orderBy("media_id")
  }

  val d31Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(1625 AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id < 120 ORDER BY media_id""".stripMargin

  /** End-to-end audio near-dedup gate ([[Multimodal.audioNearDupEdges]]):
    * byte-identical WAVs per doc_id%4 group; within-group feature
    * vectors identical, cross-group orthogonal (disjoint active
    * windows) — same structural-recall regime as e14. */
  def e16AudioNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").where(col("doc_id") < 80)
      .select("doc_id").as[Long].map(id =>
        Multimodal.MediaRow(id, "audio", gateWav((id % 4).toInt),
          Map.empty))
    Multimodal.audioNearDupEdges(media, planes = 12, threshold = 0.98)
      .orderBy("id_a", "id_b")
  }

  val e16Sql: String = withinGroupPairsSql

  /** Planted MJPEG-AVI for the d32/d33 gates: per doc_id, a video of
    * `4 + id%5` identical solid-JPEG frames of `(8+id%9) × (8+id%7)`
    * at `2 + id%3` fps — every decoded property is then a pure
    * function of doc_id, predictable by an engine with no codec. */
  private def gateAvi(s: SparkSession, dir: String,
      n: Int): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").where(col("doc_id") < n)
      .select("doc_id").as[Long].map { id =>
        val fps = 2 + (id % 3).toInt
        val frames = 4 + (id % 5).toInt
        val w = 8 + (id % 9).toInt
        val h = 8 + (id % 7).toInt
        val (r, g, b) = MediaColors((id % 4).toInt)
        val frame = Multimodal.solidJpeg(w, h, r, g, b)
        Multimodal.MediaRow(id, "video",
          Multimodal.mjpegAvi(Seq.fill(frames)(frame), w, h, fps),
          Map.empty)
      }
  }

  /** Driver gate for the REAL MJPEG-AVI container parse + JPEG frame
    * decode chain: planted AVIs flow through the production
    * [[Multimodal.sampleFrames]] (RIFF walk → per-tick frame JPEGs)
    * and every sampled frame's bytes then decode through the
    * production [[Multimodal.decodeImages]] — gating sample count,
    * timestamps, and true frame dims against pure arithmetic. */
  def d32VideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = Multimodal.sampleFrames(gateAvi(s, dir, 60),
      everyMs = 500L, maxFrames = 16)
    // sampled frame bytes re-enter the image decoder; the synthetic id
    // id·100 + frame_index survives the round trip (frame_index < 16)
    val asImages = frames.map(f => Multimodal.MediaRow(
      f.media_id * 100L + f.frame_index, "image", f.frame_bytes,
      Map.empty))
    Multimodal.decodeImages(asImages, embeddingDim = 3).toDF()
      .select((col("media_id") / lit(100)).cast("long").as("media_id"),
        pmod(col("media_id"), lit(100L)).as("frame_index"),
        (pmod(col("media_id"), lit(100L)) * 500L).as("timestamp_ms"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("media_id", "frame_index")
  }

  val d32Sql: String =
    """WITH plant AS (
      |  SELECT doc_id,
      |    2 + doc_id % 3 AS fps, 4 + doc_id % 5 AS n,
      |    8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      |  FROM documents WHERE doc_id < 60
      |)
      |SELECT doc_id AS media_id, k AS frame_index,
      |  CAST(500 * k AS BIGINT) AS timestamp_ms,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
      |FROM plant, UNNEST(generate_series(0, 15)) AS t(k)
      |WHERE 500 * k < (n * (1000000 // fps)) // 1000
      |ORDER BY media_id, frame_index""".stripMargin

  /** [[Multimodal.videoMeta]] gate: true dims, recovered fps, frame
    * count, and integer-truncated duration vs arithmetic. */
  def d33VideoMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoMeta(gateAvi(s, dir, 60)).toDF()
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("fps_milli").cast("long").as("fps_milli"),
        col("n_frames").cast("long").as("n_frames"),
        col("duration_ms"))
      .orderBy("media_id")

  val d33Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(8 + doc_id % 9 AS BIGINT) AS width,
      |  CAST(8 + doc_id % 7 AS BIGINT) AS height,
      |  CAST(1000000000 // (1000000 // (2 + doc_id % 3)) AS BIGINT)
      |    AS fps_milli,
      |  CAST(4 + doc_id % 5 AS BIGINT) AS n_frames,
      |  CAST(((4 + doc_id % 5) * (1000000 // (2 + doc_id % 3))) // 1000
      |    AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id < 60 ORDER BY media_id""".stripMargin

  // --------------- d34 hashed linear quality classifier (oracle)
  /** Fit + score end-to-end through [[Classifier]]: the model is
    * learned from the data itself (en vs non-en documents), so DuckDB
    * replays the whole thing — bucket counts, integral rational
    * weights, broadcast-join scoring, margins — with no planted
    * randomness at all (the d28 pattern at classifier granularity). */
  def d34QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = Classifier.fit(docs.where(col("lang") === "en"),
      docs.where(col("lang") =!= "en"))
    Classifier.linearScore(docs, model).orderBy("doc_id")
  }

  val d34Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang,
       |    unnest(string_split(lower(trim(
       |      regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS t
       |  FROM documents
       |), tok2 AS (
       |  SELECT doc_id, lang, substring(md5(t), 1, 4) AS bucket
       |  FROM tok WHERE t <> ''
       |), p AS (
       |  SELECT bucket, COUNT(*) AS pc FROM tok2
       |  WHERE lang = 'en' GROUP BY bucket
       |), n AS (
       |  SELECT bucket, COUNT(*) AS nc FROM tok2
       |  WHERE lang <> 'en' GROUP BY bucket
       |), model AS (
       |  SELECT COALESCE(p.bucket, n.bucket) AS bucket,
       |    1000000000 * (COALESCE(pc, 0) + 1)
       |      // (COALESCE(pc, 0) + COALESCE(nc, 0) + 2) - 500000000 AS w
       |  FROM p FULL JOIN n ON p.bucket = n.bucket
       |), scored AS (
       |  SELECT t.doc_id, COUNT(*) AS n_feats,
       |    CAST(SUM(COALESCE(m.w, 0)) AS BIGINT) AS margin_scaled
       |  FROM tok2 t LEFT JOIN model m USING (bucket)
       |  GROUP BY t.doc_id
       |)
       |SELECT d.doc_id,
       |  COALESCE(n_feats, 0) AS n_feats,
       |  COALESCE(margin_scaled, 0) AS margin_scaled,
       |  CASE WHEN COALESCE(n_feats, 0) = 0 THEN 0.0
       |       ELSE round(margin_scaled::DOUBLE / n_feats / 1000000000.0,
       |                  6) END AS mean_margin,
       |  COALESCE(margin_scaled, 0) > 0 AS accept
       |FROM documents d LEFT JOIN scored USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ------------------------- d35 URL domain profile (oracle)
  /** [[TextAnalysis.domainCounts]] gate over URL-planted text (the
    * corpus has no guaranteed URLs of its own; the planted ones are a
    * pure function of doc_id, and any natural URL replicates because
    * both engines run the same RE2-safe pattern on the same text). */
  def d35DomainCounts(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val planted = docs.select(col("doc_id"), concat(col("text"),
      lit(" see https://site"), pmod(col("doc_id"), lit(7L)).cast("string"),
      lit(".example.com/page/"), col("doc_id").cast("string"),
      when(pmod(col("doc_id"), lit(3L)) === 0L,
        concat(lit(" http://mirror"),
          pmod(col("doc_id"), lit(7L)).cast("string"),
          lit(".example.org:8080/x")))
        .otherwise(lit(""))).as("text"))
    TextAnalysis.domainCounts(planted).orderBy("domain")
  }

  val d35Sql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' see https://site' || (doc_id % 7)
      |      || '.example.com/page/' || doc_id
      |      || CASE WHEN doc_id % 3 = 0
      |           THEN ' http://mirror' || (doc_id % 7)
      |             || '.example.org:8080/x'
      |           ELSE '' END AS text
      |  FROM documents
      |), urls AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(COALESCE(text, ''),
      |      'https?://[^\s]+')) AS u
      |  FROM planted
      |), doms AS (
      |  SELECT doc_id,
      |    regexp_extract(u, 'https?://([^/\s:?#]+)', 1) AS domain
      |  FROM urls
      |)
      |SELECT domain, COUNT(*) AS n_urls,
      |  COUNT(DISTINCT doc_id) AS n_docs
      |FROM doms WHERE domain <> ''
      |GROUP BY domain ORDER BY domain""".stripMargin

  // ----------------- d36 keep-best near-dup dedup (oracle)
  /** [[Dedup.minhashDedupBest]] end-to-end: every doc under 200 plus
    * an exact copy at id + 1 000 000, with a deterministic quality
    * `(id · 37) mod 101` — so every cluster (planted pairs AND the
    * corpus's own natural near-dups, all of which sit at jaccard
    * ≥ 0.91 where the (64,16) banding misses with p ≈ 10⁻⁸) keeps
    * exactly its max-quality / min-id member. DuckDB replays the
    * exact-jaccard graph, recursive-CTE components, and the quality
    * window. */
  def d36DedupBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 200)
      .select("doc_id", "text")
    val planted = docs.unionByName(docs.select(
        (col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .withColumn("quality", pmod(col("doc_id") * 37L, lit(101L)))
    Dedup.minhashDedupBest(planted, "quality",
        numHashes = 64, bands = 16, threshold = 0.8)
      .select("doc_id").orderBy("doc_id")
  }

  val d36Sql: String =
    """WITH RECURSIVE planted AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 200
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 200
      |), q AS (
      |  SELECT doc_id, (doc_id * 37) % 101 AS quality FROM planted
      |), toks AS (
      |  SELECT doc_id, string_split(lower(trim(
      |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS tk
      |  FROM planted
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |    ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
      |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END AS s
      |  FROM toks
      |), edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |      / len(list_distinct(a.s || b.s)) >= 0.8
      |), sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges
      |  UNION ALL
      |  SELECT id_b AS src, id_a AS dst FROM edges
      |), walk AS (
      |  SELECT src AS id, dst AS reach FROM sym
      |  UNION
      |  SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach
      |), comp AS (
      |  SELECT id, LEAST(id, MIN(reach)) AS component
      |  FROM walk GROUP BY id
      |), lab AS (
      |  SELECT q.doc_id, q.quality,
      |    COALESCE(c.component, q.doc_id) AS component
      |  FROM q LEFT JOIN comp c ON c.id = q.doc_id
      |)
      |SELECT doc_id FROM (
      |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY component
      |    ORDER BY quality DESC, doc_id ASC) AS rk
      |  FROM lab
      |) WHERE rk = 1 ORDER BY doc_id""".stripMargin

  // ----------------- d37/d38/d39 BPE tokenizer training + application
  /** [[Bpe.train]]'s first four merges over the sub-80 documents' word
    * dictionary. The oracle replays each iteration: overlapping
    * adjacent-pair counts over the evolving symbolized dictionary,
    * argmax with (count DESC, pair ASC) ties, then a leftmost-replace-
    * until-fixpoint recursion — which equals [[Bpe.mergePair]]'s greedy
    * left-to-right fold (the merged symbol is strictly longer than its
    * left side, so it can never immediately re-match the same pair). */
  def d37BpeTrain(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 80)
      .select(coalesce(col("text"), lit("")).as("text"))
    val merges = Bpe.train(docs, "text", numMerges = 4)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => ((i + 1).toLong, s"$a $b") }
      .toDF("merge_rank", "pair").orderBy("merge_rank")
  }

  /** One oracle level of the d37 replay: pair counts p_i from the
    * previous dictionary, argmax m_i, rewrite recursion r_i, fixpoint
    * s_i. Patterns are space-padded (' a b ') so a match can only be
    * an adjacent SYMBOL pair, never a character run inside a longer
    * symbol. */
  private def bpeTrainLevel(i: Int): String = {
    val pat = s"' ' || (SELECT pr FROM m$i) || ' '"
    s""",
       | p$i AS (
       |  SELECT pr, SUM(cnt) AS c FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(sl) - 1),
       |      j -> sl[j] || ' ' || sl[j+1])) AS pr, cnt
       |    FROM (SELECT string_split(trim(sym), ' ') AS sl, cnt
       |          FROM s${i - 1}))
       |  GROUP BY pr
       | ), m$i AS (SELECT pr FROM p$i ORDER BY c DESC, pr ASC LIMIT 1),
       | r$i AS (
       |  SELECT sym, cnt FROM s${i - 1}
       |  UNION ALL
       |  SELECT substr(sym, 1, strpos(sym, $pat) - 1)
       |    || ' ' || replace((SELECT pr FROM m$i), ' ', '') || ' '
       |    || substr(sym, strpos(sym, $pat) + length($pat)), cnt
       |  FROM r$i WHERE strpos(sym, $pat) > 0
       | ), s$i AS (
       |  SELECT sym, cnt FROM r$i WHERE strpos(sym, $pat) = 0
       | )""".stripMargin
  }

  val d37Sql: String =
    """WITH RECURSIVE words AS (
      |  SELECT w AS word, COUNT(*)::BIGINT AS cnt FROM (
      |    SELECT unnest(regexp_extract_all(
      |      lower(COALESCE(text, '')), '[a-z0-9]+')) AS w
      |    FROM documents WHERE doc_id < 80)
      |  GROUP BY w
      |), s0 AS (
      |  SELECT ' ' || array_to_string(
      |    regexp_extract_all(word, '.'), ' ') || ' ' AS sym, cnt
      |  FROM words
      |)""".stripMargin +
      (1 to 4).map(bpeTrainLevel).mkString + "\n" +
      (1 to 4).map(i =>
        s"SELECT $i::BIGINT AS merge_rank, (SELECT pr FROM m$i) AS pair")
        .mkString("", "\nUNION ALL\n", "\nORDER BY merge_rank")

  /** Fixed merge list for the APPLY gates (d38/d39) — literal in both
    * engines so the apply path is gated independently of training. */
  private val BpeFixedMerges =
    Seq(("t", "h"), ("th", "e"), ("e", "r"), ("a", "n"))

  /** [[Bpe.applyMerges]] — the per-row expression path — over every
    * document: token count + digest of the exact tokenization. */
  def d38BpeApply(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        Bpe.applyMerges(coalesce(col("text"), lit("")), BpeFixedMerges)
          .as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("toks"))).as("toks_md5"))
      .orderBy("doc_id")

  /** [[Bpe.tokenizeByDict]] — the dictionary-join path real (32k-rule)
    * vocabularies take — must produce byte-identical tokenizations to
    * the expression path; same oracle as d38. */
  def d39BpeTokenizeDict(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      coalesce(col("text"), lit("")).as("text"))
    Bpe.tokenizeByDict(docs, "text", "doc_id", BpeFixedMerges)
      .select(col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("tokens"))).as("toks_md5"))
      .orderBy("doc_id")
  }

  /** One d38 oracle level: fixed pattern, recursion over DISTINCT
    * WORDS (bounded), not documents — the replay mirrors
    * [[Bpe.tokenizeByDict]]'s shape. */
  private def bpeApplyLevel(i: Int, a: String, b: String): String = {
    val pat = s" $a $b "
    s""",
       | r$i AS (
       |  SELECT word, sym FROM s${i - 1}
       |  UNION ALL
       |  SELECT word, substr(sym, 1, strpos(sym, '$pat') - 1) || ' $a$b '
       |    || substr(sym, strpos(sym, '$pat') + ${pat.length})
       |  FROM r$i WHERE strpos(sym, '$pat') > 0
       | ), s$i AS (
       |  SELECT word, sym FROM r$i WHERE strpos(sym, '$pat') = 0
       | )""".stripMargin
  }

  val d38Sql: String =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id, regexp_extract_all(
      |    lower(COALESCE(text, '')), '[a-z0-9]+') AS ws
      |  FROM documents
      |), wpos AS (
      |  SELECT doc_id, u.i AS pos, u.w AS word FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(ws)), i -> {'i': i, 'w': ws[i]})) AS u
      |    FROM docs)
      |), s0 AS (
      |  SELECT word, ' ' || array_to_string(
      |    regexp_extract_all(word, '.'), ' ') || ' ' AS sym
      |  FROM (SELECT DISTINCT word FROM wpos)
      |)""".stripMargin +
      BpeFixedMerges.zipWithIndex.map { case ((a, b), i) =>
        bpeApplyLevel(i + 1, a, b)
      }.mkString +
      s""",
         | agg AS (
         |  SELECT w.doc_id,
         |    string_agg(trim(t.sym), ' ' ORDER BY w.pos) AS toks
         |  FROM wpos w JOIN s${BpeFixedMerges.size} t USING (word)
         |  GROUP BY w.doc_id
         | )
         |SELECT d.doc_id,
         |  CASE WHEN a.toks IS NULL THEN 0
         |       ELSE len(string_split(a.toks, ' ')) END::BIGINT
         |    AS n_tokens,
         |  md5(COALESCE(a.toks, '')) AS toks_md5
         |FROM docs d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin

  val d39Sql: String = d38Sql

  // ----------------- d40 content-defined chunking (oracle)
  /** [[Packing.cdcChunks]] over every document: chunk boundaries where
    * the 5-token window's md5 starts with '0' (expected chunk ≈ 16
    * tokens), forced final cut at the document end. The oracle replays
    * windows, cut positions, and per-chunk digests verbatim. */
  def d40CdcChunks(s: SparkSession, dir: String): DataFrame =
    Packing.cdcChunks(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id", "chunk_idx")

  val d40Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')),
      |      ' ') AS tk
      |  FROM documents
      |  WHERE text IS NOT NULL
      |    AND length(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0
      |), cand AS (
      |  SELECT doc_id, tk, len(tk) AS n,
      |    CASE WHEN len(tk) < 5 THEN CAST([] AS BIGINT[])
      |    ELSE list_filter(list_transform(generate_series(1, len(tk) - 4),
      |      i -> CASE WHEN substr(md5(
      |             array_to_string(tk[i:i+4], ' ')), 1, 1) = '0'
      |           THEN i + 4 END), x -> x IS NOT NULL) END AS c
      |  FROM docs
      |), cuts AS (
      |  SELECT doc_id, tk,
      |    CASE WHEN len(c) > 0 AND c[-1] = n THEN c
      |         ELSE list_append(c, n) END AS cuts
      |  FROM cand
      |), chunks AS (
      |  SELECT doc_id, u.k - 1 AS chunk_idx,
      |    CASE WHEN u.k = 1 THEN 0 ELSE cuts[u.k - 1] END AS prev,
      |    cuts[u.k] AS e, tk
      |  FROM (SELECT doc_id, tk, cuts,
      |          unnest(list_transform(generate_series(1, len(cuts)),
      |            k -> {'k': k})) AS u
      |        FROM cuts)
      |)
      |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
      |  (e - prev)::BIGINT AS n_tokens,
      |  md5(array_to_string(tk[prev+1:e], ' ')) AS chunk_md5
      |FROM chunks
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ----------------- d41 index-backed daily-batch dedup (oracle)

  /** Memoized per-sfDir [[Dedup.signatureFrame]] over the FULL
    * documents table: built once (the bench's warmup pass), so the
    * timed path is exactly the operational shape at 100 TB — a daily
    * batch dedups against an EXISTING index with zero corpus passes.
    * Cached: the batch's band/verify/fp joins probe it repeatedly. */
  private val d41Index =
    new scala.collection.concurrent.TrieMap[String, DataFrame]
  private def indexFor(s: SparkSession, dir: String): DataFrame =
    d41Index.getOrElseUpdate(dir,
      Dedup.signatureFrame(t(s, dir, "documents")).cache())

  /** A synthetic "daily batch" over the corpus: exact copies of every
    * 7th document (batch-vs-base dups), a suffixed variant of every
    * 11th (fresh), and a second identical suffixed copy (the
    * batch-internal dup). Shared by d41/d41b so the exact and minhash
    * paths time the same input. */
  private def d41Batch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text")))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text")))
  }

  /** [[Dedup.indexedExactRemovals]] of the planted batch against the
    * persisted index — full-corpus base, exact-mode policy, fully
    * DuckDB-replayable (fingerprint membership + batch window). */
  def d41IndexedBatchDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.indexedExactRemovals(d41Batch(s, dir), indexFor(s, dir))
      .orderBy("doc_id")

  val d41Sql: String =
    raw"""WITH batch AS (
      |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 20000000 AS doc_id, text || ' v2' FROM documents
      |  WHERE doc_id % 11 = 0
      |  UNION ALL
      |  SELECT doc_id + 30000000 AS doc_id, text || ' v2' FROM documents
      |  WHERE doc_id % 11 = 0
      |), bfp AS (
      |  SELECT DISTINCT
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM documents WHERE text IS NOT NULL
      |), nfp AS (
      |  SELECT doc_id,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM batch WHERE text IS NOT NULL
      |)
      |SELECT doc_id FROM (
      |  SELECT doc_id FROM nfp WHERE fp IN (SELECT fp FROM bfp)
      |  UNION
      |  SELECT doc_id FROM (
      |    SELECT doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |    FROM nfp) WHERE rn > 1
      |) ORDER BY doc_id""".stripMargin

  /** [[Dedup.indexedMinhashRemovals]] of the same batch against the
    * same index — the NEAR-dup bench headline (banding probes stored
    * signatures, verify reads stored hashed sets; no corpus pass).
    * Seed-dependent like the d6/e2 family, so rows-only at the
    * driver; the production code path is hash-gated by i34, and the
    * suffixed plantings are verified in the result here. */
  def d41bIndexedMinhashBatch(s: SparkSession, dir: String): DataFrame =
    Dedup.indexedMinhashRemovals(d41Batch(s, dir), indexFor(s, dir))
      .orderBy("doc_id")

  // --------------------- d42 trigram stupid-backoff LM (oracle)
  /** [[LangModel.trigramBackoff]] trained on the even-doc_id half and
    * scored on every document — held-out odd docs genuinely exercise
    * the bigram/unigram backoff and OOV levels. Every count and
    * quotient is integer (rational α = 2/5, 4/25), so the whole score
    * hash-gates against a verbatim DuckDB replay. */
  def d42TrigramBackoff(s: SparkSession, dir: String): DataFrame =
    LangModel.trigramBackoff(t(s, dir, "documents"),
        col("doc_id") % 2 === 0)
      .orderBy("doc_id")

  val d42Sql: String = {
    val P = LangModel.ProbScale
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
      |                 ' ') AS tk
      |  FROM documents
      |), occ AS (
      |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3
      |  FROM toks, UNNEST(generate_series(1, len(tk) - 2)) AS t(i)
      |  WHERE len(tk) >= 3
      |), trocc AS (
      |  SELECT * FROM occ WHERE doc_id % 2 = 0
      |), trbg AS (
      |  SELECT tk[i] AS w1, tk[i+1] AS w2
      |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS t(i)
      |  WHERE len(tk) >= 2 AND doc_id % 2 = 0
      |), trug AS (
      |  SELECT unnest(tk) AS w FROM toks WHERE doc_id % 2 = 0
      |), tric AS (
      |  SELECT w1, w2, w3, COUNT(*) AS n3 FROM trocc GROUP BY 1, 2, 3
      |), bgc AS (
      |  SELECT w1, w2, COUNT(*) AS n2 FROM trbg GROUP BY 1, 2
      |), ugc AS (
      |  SELECT w, COUNT(*) AS n1 FROM trug GROUP BY 1
      |), tot AS (
      |  SELECT COUNT(*) AS t FROM trug
      |), tridict AS (
      |  SELECT c.w1, c.w2, c.w3,
      |    (CAST($P AS BIGINT) * c.n3) // b.n2 AS p1
      |  FROM tric c JOIN bgc b USING (w1, w2)
      |), bgdict AS (
      |  SELECT b.w1 AS w2, b.w2 AS w3,
      |    (CAST(${2 * P} AS BIGINT) * b.n2) // (5 * u.n1) AS p2
      |  FROM bgc b JOIN ugc u ON u.w = b.w1
      |), ugdict AS (
      |  SELECT u.w AS w3,
      |    (CAST(${4 * P} AS BIGINT) * u.n1) // (25 * t.t) AS p3
      |  FROM ugc u CROSS JOIN tot t
      |), scored AS (
      |  SELECT o.doc_id,
      |    CASE WHEN td.p1 IS NOT NULL THEN 3
      |         WHEN bd.p2 IS NOT NULL THEN 2
      |         WHEN ud.p3 IS NOT NULL THEN 1 ELSE 0 END AS lvl,
      |    COALESCE(td.p1, bd.p2, ud.p3, 0) AS p
      |  FROM occ o
      |  LEFT JOIN tridict td USING (w1, w2, w3)
      |  LEFT JOIN bgdict bd USING (w2, w3)
      |  LEFT JOIN ugdict ud USING (w3)
      |), perdoc AS (
      |  SELECT doc_id, COUNT(*) AS n_trigrams,
      |    SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS n_tri_hit,
      |    SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS n_bg_backoff,
      |    SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS n_ug_backoff,
      |    SUM(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS n_oov,
      |    SUM(p) AS prob_scaled
      |  FROM scored GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  COALESCE(p.n_trigrams, 0) AS n_trigrams,
      |  CAST(COALESCE(p.n_tri_hit, 0) AS BIGINT) AS n_tri_hit,
      |  CAST(COALESCE(p.n_bg_backoff, 0) AS BIGINT) AS n_bg_backoff,
      |  CAST(COALESCE(p.n_ug_backoff, 0) AS BIGINT) AS n_ug_backoff,
      |  CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
      |  CAST(COALESCE(p.prob_scaled, 0) AS BIGINT) AS prob_scaled,
      |  CASE WHEN p.n_trigrams IS NULL THEN 0.0
      |       ELSE round(CAST(p.prob_scaled AS DOUBLE) / p.n_trigrams
      |            / $P.0, 6) END AS mean_prob
      |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------- d43 fixed-threshold LM filter (oracle)
  /** [[LangModel.lmFilter]] at mean-prob ≥ 1/20, rolled up per lang —
    * the CCNet funnel readout: how much of each language bucket the
    * perplexity-proxy filter keeps (1/20 sits between the train-half
    * and held-out-half score means, so both verdicts occur). The
    * per-row verdict is an exact integer cross-multiplication, so the
    * rollup hash-gates. */
  def d43LmFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val verdicts = LangModel.lmFilter(docs, col("doc_id") % 2 === 0,
      thrNum = 1L, thrDen = 20L)
    docs.select("doc_id", "lang").join(verdicts, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("lang")
  }

  val d43Sql: String = {
    val P = LangModel.ProbScale
    // share d42's replay up to perdoc, then apply the integer cutoff
    val base = d42Sql
      .substring(0, d42Sql.indexOf("\nSELECT d.doc_id"))
    raw"""$base
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN COALESCE(p.n_trigrams, 0) > 0
      |       AND COALESCE(p.prob_scaled, 0) * 20 >=
      |           COALESCE(p.n_trigrams, 0) * CAST($P AS BIGINT)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  // --------------------- e20 hybrid retrieval via RRF (oracle)
  /** [[Retrieval.rrfFuse]] of a BM25 top-20 (probe queries = first
    * four tokens of docs 0–4, the e13 probes) and a brute-force
    * cosine top-20 over the embeddings of the same ids — the hybrid
    * lexical+vector search shape. Fused scores are exact longs
    * (`10⁹ div (60 + rank)` summed), so the gate hashes scores, list
    * membership AND final ranks against a DuckDB replay of both
    * retrievers plus the fusion. */
  def e20HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val probes = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(norm, " "), 1, 4)).as("query"))
    val lex = Retrieval.bm25TopK(docs, probes, k = 20)
      .select("query_id", "doc_id", "rank")
    val vec = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 5), k = 20)
      .select(col("qid").as("query_id"), col("nid").as("doc_id"),
        col("rank"))
    Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("query_id", "rank")
  }

  val e20Sql: String = {
    val R = Retrieval.RrfScale
    raw"""WITH lex AS (
      |  SELECT query_id, doc_id, rank FROM (
      |${bm25ReplaySql(5, 20)}) AS l
      |), vec AS (
      |  -- e1's guarded cosine: NULL/dim-mismatched candidates are
      |  -- excluded (engine drops NULL vecDot scores; DuckDB's
      |  -- list_cosine_similarity would THROW), zero-norm scores 0.0
      |  SELECT qid AS query_id, nid AS doc_id,
      |    CAST(rank AS BIGINT) AS rank
      |  FROM (
      |    SELECT qid, nid,
      |      ROW_NUMBER() OVER (PARTITION BY qid
      |        ORDER BY score DESC, nid ASC) AS rank
      |    FROM (
      |      SELECT q.vec_id AS qid, e.vec_id AS nid,
      |        CASE WHEN list_inner_product(CAST(q.embedding AS DOUBLE[]),
      |                    CAST(q.embedding AS DOUBLE[])) = 0
      |               OR list_inner_product(CAST(e.embedding AS DOUBLE[]),
      |                    CAST(e.embedding AS DOUBLE[])) = 0 THEN 0.0
      |          ELSE list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(e.embedding AS DOUBLE[]))
      |          END AS score
      |      FROM embeddings q, embeddings e
      |      WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
      |        AND q.embedding IS NOT NULL AND e.embedding IS NOT NULL
      |        AND len(e.embedding) = len(q.embedding)) s0) sub
      |  WHERE rank <= 20
      |), uni AS (
      |  SELECT query_id, doc_id,
      |    CAST($R AS BIGINT) // (60 + rank) AS c FROM lex
      |  UNION ALL
      |  SELECT query_id, doc_id,
      |    CAST($R AS BIGINT) // (60 + rank) AS c FROM vec
      |), fused AS (
      |  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_scaled,
      |    COUNT(*) AS n_lists
      |  FROM uni GROUP BY 1, 2
      |)
      |SELECT query_id, rank, doc_id, rrf_scaled, n_lists FROM (
      |  SELECT query_id, doc_id, rrf_scaled, n_lists,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY rrf_scaled DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM fused) r
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // ------------------- e21 MMR diversified retrieval (oracle)
  private val E21Cands = 12
  private val E21K = 5
  private val E21LamNum = 7L
  private val E21LamDen = 10L

  /** [[Similarity.mmrDiversify]] over int8-code dot products
    * (queries = vec_id < 3, top-12 candidates by integer relevance,
    * λ = 7/10, k = 5). Code dots are ≤ 255²·dim ≈ 4.2·10⁶ — exact in
    * any engine's integer OR double arithmetic — so relevance,
    * pairwise sims, and every greedy margin hash-gate against a
    * DuckDB replay that unrolls the k selection steps as chained
    * CTEs. */
  def e21MmrDiversify(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val codes = Similarity.quantizeInt8(emb).select("vec_id", "codes")
    val q = codes.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("codes").as("qc"))
    // NOTE: multi-query (qid-keyed) grids, so the single-query
    // Similarity.zeroFilledCodeSims does not apply here — only the
    // dot definition is shared
    val dotc = Similarity.codeDot _
    // corpus scan × broadcast queries — the corpus never shuffles
    val rel = codes.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        dotc(col("qc"), col("codes")).as("rel"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("rel").desc, col("nid").asc)
    val cand = rel.withColumn("rn", row_number().over(w))
      .where(col("rn") <= E21Cands).drop("rn")
    // pairwise sims within each query's candidate set (≤ N² per
    // query, N = 12 — bounded by construction)
    val candC = cand
      .join(codes.withColumnRenamed("vec_id", "nid"), "nid")
    val sims = candC.select(col("qid"), col("nid").as("a"),
        col("codes").as("ca"))
      .join(candC.select(col("qid"), col("nid").as("b"),
        col("codes").as("cb")), "qid")
      .where(col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        dotc(col("ca"), col("cb")).as("sim"))
    Similarity.mmrDiversify(cand, sims, k = E21K,
        lamNum = E21LamNum, lamDen = E21LamDen)
      .orderBy("qid", "step")
  }

  /** The int8 scalar-quantization code expression over `(lo, scale,
    * x)` — the DuckDB mirror of [[Similarity.quantizeInt8]]'s
    * `floor((x - lo)/scale + 0.5)` clamp. Shared by e21 and i58. */
  private[queries] val int8CodeSql: String =
    "CAST(LEAST(GREATEST(floor((x - lo) / scale + 0.5), " +
      "0.0), 255.0) AS BIGINT)"

  /** Exact integer dot product of two code lists. */
  private[queries] def idotSql(a: String, b: String): String =
    s"CAST(list_dot_product(CAST($a AS DOUBLE[]), " +
      s"CAST($b AS DOUBLE[])) AS BIGINT)"

  /** The MMR greedy selection unrolled as chained CTEs — `(ctes,
    * unions)` to splice after `cand(qid, nid, rel)` and
    * `sims(qid, a, b, sim)` CTEs defined upstream. Shared by e21
    * (brute-force int8 candidates) and i58 (`CALL mmr_search` over
    * the persisted IVF index) so both gates replay ONE greedy
    * definition. */
  private[queries] def mmrUnrollSql(k: Int, lamNum: Long,
      lamDen: Long): (String, String) = {
    val ln = lamNum; val lc = lamDen - lamNum
    val steps = (2 to k).map { i =>
      val prev = (1 until i).map(j => s"SELECT qid, nid FROM sel$j")
        .mkString(" UNION ALL ")
      s"""prevu$i AS (
         |  $prev
         |), m$i AS (
         |  SELECT si.qid, si.a AS nid, MAX(si.sim) AS mx
         |  FROM sims si JOIN prevu$i p
         |    ON p.qid = si.qid AND p.nid = si.b
         |  GROUP BY 1, 2
         |), sel$i AS (
         |  SELECT qid, nid, CAST($i AS BIGINT) AS step, mmr FROM (
         |    SELECT c.qid, c.nid, $ln * c.rel - $lc * m.mx AS mmr,
         |      ROW_NUMBER() OVER (PARTITION BY c.qid
         |        ORDER BY $ln * c.rel - $lc * m.mx DESC, c.nid ASC
         |      ) AS rn
         |    FROM cand c
         |    JOIN m$i m ON m.qid = c.qid AND m.nid = c.nid
         |    WHERE NOT EXISTS (SELECT 1 FROM prevu$i p
         |      WHERE p.qid = c.qid AND p.nid = c.nid)
         |  ) z WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    val ctes =
      s"""sel1 AS (
         |  SELECT qid, nid, CAST(1 AS BIGINT) AS step, $ln * rel AS mmr
         |  FROM (
         |    SELECT qid, nid, rel, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY rel DESC, nid ASC) AS rn FROM cand) z
         |  WHERE rn = 1
         |), $steps""".stripMargin
    val unions = (1 to k).map(i => s"SELECT * FROM sel$i")
      .mkString(" UNION ALL ")
    (ctes, unions)
  }

  val e21Sql: String = {
    val code = int8CodeSql
    def idot(a: String, b: String) = idotSql(a, b)
    val (mmrCtes, unions) = mmrUnrollSql(E21K, E21LamNum, E21LamDen)
    s"""WITH base AS (
       |  SELECT vec_id,
       |    COALESCE(list_min(CAST(embedding AS DOUBLE[])), 0.0) AS lo,
       |    COALESCE((list_max(CAST(embedding AS DOUBLE[]))
       |      - list_min(CAST(embedding AS DOUBLE[]))) / 255.0, 0.0)
       |      AS scale,
       |    CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), codes AS (
       |  SELECT vec_id,
       |    CASE WHEN scale = 0
       |      THEN list_transform(v, x -> CAST(0 AS BIGINT))
       |      ELSE list_transform(v, x -> $code) END AS codes
       |  FROM base
       |), q AS (
       |  SELECT vec_id AS qid, codes AS qc FROM codes WHERE vec_id < 3
       |), rel AS (
       |  -- NULL/dim-mismatched candidates excluded: the engine's
       |  -- codeDot NULLs them (they sort below every real score and
       |  -- can never enter the top-$E21Cands); DuckDB's
       |  -- list_inner_product THROWS on a length mismatch instead
       |  SELECT q.qid, b.vec_id AS nid, ${idot("q.qc", "b.codes")} AS rel
       |  FROM codes b, q WHERE b.vec_id <> q.qid
       |    AND b.codes IS NOT NULL AND len(b.codes) = len(q.qc)
       |), cand AS (
       |  SELECT qid, nid, rel FROM (
       |    SELECT qid, nid, rel, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY rel DESC, nid ASC) AS rn FROM rel) z
       |  WHERE rn <= $E21Cands
       |), sims AS (
       |  SELECT c1.qid, c1.nid AS a, c2.nid AS b,
       |    ${idot("k1.codes", "k2.codes")} AS sim
       |  FROM cand c1
       |  JOIN cand c2 ON c2.qid = c1.qid AND c2.nid <> c1.nid
       |  JOIN codes k1 ON k1.vec_id = c1.nid
       |  JOIN codes k2 ON k2.vec_id = c2.nid
       |), $mmrCtes
       |SELECT qid, step, nid, mmr AS mmr_scaled FROM ($unions) u
       |ORDER BY qid, step""".stripMargin
  }

  // ------------------- d44 mixture composition (oracle)
  /** [[Packing.mixtureSample]] with weights 5:3:1:1 over four sources
    * and totalN = 40 — the Hamilton apportionment (computed
    * independently by the oracle from the same weights), the hash-
    * ordered per-stratum take, and the absent-stratum exclusion all
    * hash-gate. At sf0.001 the 5-weight stratum is smaller than its
    * quota, so the shortfall path is exercised there too. */
  def d44MixtureSample(s: SparkSession, dir: String): DataFrame =
    Packing.mixtureSample(t(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 5L, "src1" -> 3L, "src2" -> 1L, "src3" -> 1L),
        totalN = 40L)
      .orderBy("source", "doc_id")

  val d44Sql: String =
    """WITH wts(source, w) AS (
      |  VALUES ('src0', 5), ('src1', 3), ('src2', 1), ('src3', 1)
      |), tot AS (
      |  SELECT SUM(w) AS bw FROM wts
      |), base AS (
      |  SELECT source, (40 * w) // bw AS q, (40 * w) % bw AS r
      |  FROM wts, tot
      |), lo AS (
      |  SELECT 40 - SUM(q) AS l FROM base
      |), app AS (
      |  SELECT source,
      |    CAST(q + CASE WHEN ROW_NUMBER() OVER (ORDER BY r DESC, source ASC)
      |          <= (SELECT l FROM lo) THEN 1 ELSE 0 END AS BIGINT) AS quota
      |  FROM base
      |), ranked AS (
      |  SELECT d.source, d.doc_id, a.quota,
      |    ROW_NUMBER() OVER (PARTITION BY d.source
      |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
      |  FROM documents d JOIN app a ON a.source = d.source
      |)
      |SELECT source, doc_id, quota FROM ranked WHERE rk <= quota
      |ORDER BY source, doc_id""".stripMargin

  // ------------------- d45 per-stratum budget sampling (oracle)
  /** [[Packing.budgetSample]]: 4000 chars of budget per source, docs
    * taken in the deterministic hash order while the inclusive
    * running cost fits — integer running sums, full hash gate. */
  def d45BudgetSample(s: SparkSession, dir: String): DataFrame =
    Packing.budgetSample(t(s, dir, "documents"), "source", "doc_id",
        "n_chars", budget = 4000L)
      .orderBy("source", "doc_id")

  val d45Sql: String =
    """SELECT source, doc_id, cost, cum_cost FROM (
      |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS cost,
      |    CAST(SUM(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_cost
      |  FROM documents) z
      |WHERE cum_cost <= 4000 ORDER BY source, doc_id""".stripMargin

  // ----------------- d46/d47/d48 unigram tokenizer (oracles)
  private[queries] val D46Vocab = 24
  private[queries] val D46MaxLen = 4

  /** Shared DuckDB replay prefix for the unigram-tokenizer family:
    * word counts, candidate-piece counts, the exact-integer qlog
    * weights, the top-V vocabulary, and — for the segmentation gates
    * — a BRUTE-FORCE enumeration of every segmentation per word via a
    * recursive CTE (an INDEPENDENT method from the engine's DP: the
    * oracle globally argmaxes over all enumerated paths, ties by
    * DuckDB's native lexicographic list compare, so it would catch a
    * DP bug the DP itself cannot). Bounded because segmentations of a
    * length-n word number Tetranacci(n) and corpus words are short;
    * `finalSelect` consumes the `vocab` / `best` CTEs. */
  private def unigramReplaySql(finalSelect: String,
      needPaths: Boolean): String = {
    val qlogC = "(length(bin(cnt)) - 1) * 16 + " +
      "(cnt * 16 >> (length(bin(cnt)) - 1)) - 16"
    val pathsPart = if (!needPaths) "" else raw""", words AS (
      |  SELECT word FROM wc
      |), cand0 AS (
      |  SELECT w.word, i - 1 AS pos, substr(w.word, i, l) AS piece
      |  FROM words w,
      |    UNNEST(generate_series(1, length(w.word))) AS a(i),
      |    UNNEST(generate_series(1,
      |      least($D46MaxLen, length(w.word) - i + 1))) AS b(l)
      |), cand AS (
      |  SELECT c.word, c.pos, c.piece,
      |    COALESCE(v.weight, -(SELECT q FROM qt)) AS wgt
      |  FROM cand0 c LEFT JOIN vocab v ON v.piece = c.piece
      |  WHERE length(c.piece) = 1 OR v.piece IS NOT NULL
      |), paths(word, pos, score, path) AS (
      |  SELECT word, 0, CAST(0 AS BIGINT), []::VARCHAR[] FROM words
      |  UNION ALL
      |  SELECT p.word, p.pos + length(c.piece), p.score + c.wgt,
      |    list_append(p.path, c.piece)
      |  FROM paths p JOIN cand c ON c.word = p.word AND c.pos = p.pos
      |), fin AS (
      |  SELECT word, score, path FROM paths WHERE pos = length(word)
      |), best AS (
      |  SELECT word, array_to_string(path, ' ') AS seg, score,
      |    CAST(len(path) AS BIGINT) AS n_pieces
      |  FROM (
      |    SELECT word, score, path, ROW_NUMBER() OVER (
      |      PARTITION BY word ORDER BY score DESC, path ASC) AS rn
      |    FROM fin) z
      |  WHERE rn = 1
      |)""".stripMargin
    raw"""WITH RECURSIVE wc AS (
      |  SELECT w AS word, COUNT(*) AS cnt FROM (
      |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
      |      AS w
      |    FROM documents) z GROUP BY 1
      |), pc AS (
      |  SELECT substr(word, i, l) AS piece,
      |    CAST(SUM(cnt) AS BIGINT) AS cnt
      |  FROM wc,
      |    UNNEST(generate_series(1, length(word))) AS a(i),
      |    UNNEST(generate_series(1,
      |      least($D46MaxLen, length(word) - i + 1))) AS b(l)
      |  GROUP BY 1
      |), qt AS (
      |  SELECT $qlogC AS q FROM
      |    (SELECT CAST(SUM(cnt) AS BIGINT) AS cnt FROM pc) s
      |), vocab AS (
      |  SELECT piece, cnt,
      |    CAST($qlogC - (SELECT q FROM qt) AS BIGINT) AS weight
      |  FROM pc WHERE length(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt,
      |    CAST($qlogC - (SELECT q FROM qt) AS BIGINT) AS weight
      |  FROM (
      |    SELECT piece, cnt, ROW_NUMBER() OVER (
      |      ORDER BY cnt DESC, piece ASC) AS rn
      |    FROM pc WHERE length(piece) > 1) z
      |  WHERE rn <= $D46Vocab
      |)$pathsPart
      |$finalSelect""".stripMargin
  }

  /** [[Unigram.trainVocab]] — the trained MODEL itself hash-gates:
    * candidate substring counts, the exact-integer qlog weights, the
    * top-V cut with its (cnt, piece) tie rule, and the single-char
    * coverage rows. */
  def d46UnigramVocab(s: SparkSession, dir: String): DataFrame =
    Unigram.trainVocab(t(s, dir, "documents"),
        vocabSize = D46Vocab, maxPieceLen = D46MaxLen)._1
      .orderBy("piece")

  val d46Sql: String = unigramReplaySql(
    "SELECT piece, cnt, weight FROM vocab ORDER BY piece",
    needPaths = false)

  /** [[Unigram.segmentWords]] on every distinct corpus word — the
    * engine's suffix DP vs the oracle's exhaustive enumeration. */
  def d47UnigramSegment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // reuse the trainer's pinned dictionary: the standalone
    // Bpe.wordCounts(docs) here re-ran the corpus word extract (r22)
    val (vocab, qlogT, words) = Unigram.trainVocabWithWords(docs,
      vocabSize = D46Vocab, maxPieceLen = D46MaxLen)
    Unigram.segmentWords(words.select("word"), vocab,
        qlogT, maxPieceLen = D46MaxLen)
      .select(col("word"), concat_ws(" ", col("pieces")).as("seg"),
        col("score"), col("n_pieces"))
      .orderBy("word")
  }

  val d47Sql: String = unigramReplaySql(
    "SELECT word, seg, score, n_pieces FROM best ORDER BY word",
    needPaths = true)

  /** [[Unigram.tokenize]] — the corpus deployment path: distinct
    * words segment once, documents reassemble via one join; per-doc
    * token string, total score, and piece count hash-gate. */
  def d48UnigramTokenize(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // train-then-tokenize on the SAME corpus: thread the trainer's
    // pinned dictionary through so the segmentation's distinct-word
    // set skips a full corpus word extract (r22, guide §1.2)
    val (vocab, qlogT, words) = Unigram.trainVocabWithWords(docs,
      vocabSize = D46Vocab, maxPieceLen = D46MaxLen)
    Unigram.tokenize(docs, vocab, qlogT, maxPieceLen = D46MaxLen,
        words = Some(words))
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("toks"),
        col("score"), col("n_pieces"))
      .orderBy("doc_id")
  }

  val d48Sql: String = unigramReplaySql(
    raw""", wordsof AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word,
      |    generate_subscripts(
      |      regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
      |  FROM documents
      |), perdoc AS (
      |  SELECT w.doc_id,
      |    string_agg(b.seg, ' ' ORDER BY w.pos) AS toks,
      |    CAST(SUM(b.score) AS BIGINT) AS score,
      |    CAST(SUM(b.n_pieces) AS BIGINT) AS n_pieces
      |  FROM wordsof w JOIN best b ON b.word = w.word
      |  GROUP BY w.doc_id
      |)
      |SELECT d.doc_id, COALESCE(p.toks, '') AS toks,
      |  COALESCE(p.score, 0) AS score,
      |  COALESCE(p.n_pieces, 0) AS n_pieces
      |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin,
    needPaths = true)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d42_trigram_backoff" -> (d42TrigramBackoff _),
    "e20_hybrid_rrf" -> (e20HybridRrf _),
    "e22_hybrid_indexed" -> (e22HybridIndexed _),
    "e21_mmr_diversify" -> (e21MmrDiversify _),
    "d44_mixture_sample" -> (d44MixtureSample _),
    "d45_budget_sample" -> (d45BudgetSample _),
    "d46_unigram_vocab" -> (d46UnigramVocab _),
    "d47_unigram_segment" -> (d47UnigramSegment _),
    "d48_unigram_tokenize" -> (d48UnigramTokenize _),
    "d43_lm_filter" -> (d43LmFilter _),
    "d41_indexed_batch_dedup" -> (d41IndexedBatchDedup _),
    "d41b_indexed_minhash_batch" -> (d41bIndexedMinhashBatch _),
    "d40_cdc_chunks" -> (d40CdcChunks _),
    "d37_bpe_train" -> (d37BpeTrain _),
    "d38_bpe_apply" -> (d38BpeApply _),
    "d39_bpe_tokenize_dict" -> (d39BpeTokenizeDict _),
    "d1_dedup_exact" -> (d1DedupExact _),
    "d2_text_stats" -> (d2TextStats _),
    "d3_fingerprint" -> (d3Fingerprint _),
    "d4_lang_id" -> (d4LangId _),
    "d5_quality" -> (d5Quality _),
    "d6_minhash_dedup" -> (d6MinhashDedup _),
    "d7_simhash_pairs" -> (d7SimhashPairs _),
    "e1_ann_bruteforce" -> (e1AnnBruteforce _),
    "e2_ann_lsh" -> (e2AnnLsh _),
    "e3_ann_ivf" -> (e3AnnIvf _),
    "e4_embedding_dedup" -> (e4EmbeddingDedup _),
    "d8_token_freq" -> (d8TokenFreq _),
    "e5_asof_join" -> (e5AsOfJoin _),
    "d6b_jaccard_verify" -> (d6bJaccardVerify _),
    "d6c_jaccard_arith" -> (d6cJaccardArith _),
    "d6d_nearcopy_pipeline" -> (d6dNearCopyPipeline _),
    "e2b_bucket_determinism" -> (e2bBucketDeterminism _),
    "d7b_simhash_verify" -> (d7bSimhashVerify _),
    "e4b_embedding_dedup_verify" -> (e4bEmbeddingDedupVerify _),
    "e3b_ivf_planted_verify" -> (e3bIvfPlantedVerify _),
    "e17_ivf_indexed_search" -> (e17IvfIndexedSearch _),
    "e15_pq_adc_verify" -> (e15PqAdcVerify _),
    "e15b_pq_adc_trained" -> (e15bPqAdcTrained _),
    "ccb_components_verify" -> (ccbComponentsVerify _),
    "d9_seq_pack" -> (d9SeqPack _),
    "d10_stratified_sample" -> (d10StratifiedSample _),
    "d11_pii_redact" -> (d11PiiRedact _),
    "e6_sessionize" -> (e6Sessionize _),
    "e7_range_join" -> (e7RangeJoin _),
    "d16_chunking" -> (d16Chunking _),
    "d17_global_order" -> (d17GlobalOrder _),
    "d12_repetition" -> (d12Repetition _),
    "d13_contamination" -> (d13Contamination _),
    "d14_temperature_sample" -> (d14TemperatureSample _),
    "d15_length_percentiles" -> (d15LengthPercentiles _),
    "e8_semantic_dedup" -> (e8SemanticDedup _),
    "e9_quantize_int8" -> (e9QuantizeInt8 _),
    "d18_dup_ngrams" -> (d18DupNgrams _),
    "d19_bpe_tokens" -> (d19BpeTokens _),
    "e10_quantized_ann" -> (e10QuantizedAnn _),
    "d20_salted_join" -> (d20SaltedJoin _),
    "d21_packed_text" -> (d21PackedText _),
    "d22_bpe_pairs" -> (d22BpePairs _),
    "e11_funnel" -> (e11Funnel _),
    "e12_retention" -> (e12Retention _),
    "d23_line_dedup" -> (d23LineDedup _),
    "d24_bigram_surprise" -> (d24BigramSurprise _),
    "e13_bm25" -> (e13Bm25 _),
    "e18_bm25_indexed" -> (e18Bm25Indexed _),
    "e19_ivfpq_compose" -> (e19IvfPqCompose _),
    "d25_leakage_split" -> (d25LeakageSplit _),
    "d26_filter_funnel" -> (d26FilterFunnel _),
    "d27_dup_passages" -> (d27DupPassages _),
    "d28_dsir_weights" -> (d28DsirWeights _),
    "d29_remove_passages" -> (d29RemovePassages _),
    "d30_image_decode" -> (d30ImageDecode _),
    "e14_image_neardup" -> (e14ImageNearDup _),
    "d31_audio_decode" -> (d31AudioDecode _),
    "e16_audio_neardup" -> (e16AudioNearDup _),
    "d32_video_frames" -> (d32VideoFrames _),
    "d33_video_meta" -> (d33VideoMeta _),
    "d34_quality_classifier" -> (d34QualityClassifier _),
    "d35_domain_counts" -> (d35DomainCounts _),
    "d36_dedup_best" -> (d36DedupBest _),
  )

  // a def, not a val: e15b's oracle embeds codebooks trained when the
  // query RAN — Verify dumps oracle_sql.json after the query loop, so
  // rebuilding the map at dump time picks the stash up
  def oracles: Map[String, String] = Map(
    "d42_trigram_backoff" -> d42Sql,
    "d43_lm_filter" -> d43Sql,
    "e20_hybrid_rrf" -> e20Sql,
    "e22_hybrid_indexed" -> e22Sql,
    "e21_mmr_diversify" -> e21Sql,
    "d44_mixture_sample" -> d44Sql,
    "d45_budget_sample" -> d45Sql,
    "d46_unigram_vocab" -> d46Sql,
    "d47_unigram_segment" -> d47Sql,
    "d48_unigram_tokenize" -> d48Sql,
    "d41_indexed_batch_dedup" -> d41Sql,
    "d1_dedup_exact" -> d1Sql,
    "d4_lang_id" -> d4Sql,
    "d2_text_stats" -> d2Sql,
    "d3_fingerprint" -> d3Sql,
    "d5_quality" -> d5Sql,
    "e1_ann_bruteforce" -> e1Sql,
    "d8_token_freq" -> d8Sql,
    "e5_asof_join" -> e5Sql,
    "d6b_jaccard_verify" -> d6bSql,
    "d6c_jaccard_arith" -> d6cSql,
    "d6d_nearcopy_pipeline" -> d6dSql,
    "e2b_bucket_determinism" -> e2bSql,
    "d7b_simhash_verify" -> d7bSql,
    "e4b_embedding_dedup_verify" -> e4bSql,
    "e3b_ivf_planted_verify" -> e3bSql,
    "e17_ivf_indexed_search" -> e17Sql,
    "e15_pq_adc_verify" -> e15Sql,
    "e15b_pq_adc_trained" -> e15bSql,
    "ccb_components_verify" -> ccbSql,
    "d9_seq_pack" -> d9Sql,
    "d10_stratified_sample" -> d10Sql,
    "d11_pii_redact" -> d11Sql,
    "e6_sessionize" -> e6Sql,
    "e7_range_join" -> e7Sql,
    "d16_chunking" -> d16Sql,
    "d17_global_order" -> d17Sql,
    "d12_repetition" -> d12Sql,
    "d13_contamination" -> d13Sql,
    "d14_temperature_sample" -> d14Sql,
    "d15_length_percentiles" -> d15Sql,
    "e8_semantic_dedup" -> e8Sql,
    "e9_quantize_int8" -> e9Sql,
    "d18_dup_ngrams" -> d18Sql,
    "d19_bpe_tokens" -> d19Sql,
    "e10_quantized_ann" -> e10Sql,
    "d20_salted_join" -> d20Sql,
    "d21_packed_text" -> d21Sql,
    "d22_bpe_pairs" -> d22Sql,
    "e11_funnel" -> e11Sql,
    "e12_retention" -> e12Sql,
    "d23_line_dedup" -> d23Sql,
    "d24_bigram_surprise" -> d24Sql,
    "e13_bm25" -> e13Sql,
    "e18_bm25_indexed" -> e18Sql,
    "e19_ivfpq_compose" -> e19Sql,
    "d25_leakage_split" -> d25Sql,
    "d26_filter_funnel" -> d26Sql,
    "d27_dup_passages" -> d27Sql,
    "d28_dsir_weights" -> d28Sql,
    "d29_remove_passages" -> d29Sql,
    "d30_image_decode" -> d30Sql,
    "e14_image_neardup" -> e14Sql,
    "d31_audio_decode" -> d31Sql,
    "e16_audio_neardup" -> e16Sql,
    "d32_video_frames" -> d32Sql,
    "d33_video_meta" -> d33Sql,
    "d34_quality_classifier" -> d34Sql,
    "d35_domain_counts" -> d35Sql,
    "d36_dedup_best" -> d36Sql,
    "d37_bpe_train" -> d37Sql,
    "d38_bpe_apply" -> d38Sql,
    "d39_bpe_tokenize_dict" -> d39Sql,
    "d40_cdc_chunks" -> d40Sql,
  )
}
