package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Planted-corpus edge units for the testdata blind spots: the
  * generated `documents` tables carry NO empty/whitespace/NULL texts
  * and dense non-null ids at every SF, so a semantics regression that
  * only touches empty-bodied or missing-bodied rows can never move the
  * correctness gates (the r19 BM25 empty-token and sampler NULL-id
  * bugs were exactly this class — both caught by review, not gates).
  * One suite, one planted corpus, one case per §8 operator family
  * that lacked an explicit empty-text/NULL-id unit.
  */
class PlantedEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The planted corpus: a normal doc, its exact duplicate, an empty
    * doc, a whitespace-only doc, two NULL-text docs, and a URL doc. */
  private lazy val docs: DataFrame = Seq(
    (1L, Option("The quick brown fox jumps over the lazy dog and " +
      "mails a@b.com or dials 555-123-4567 today")),
    (2L, Option("")),
    (3L, Option(" \t\n  ")),
    (4L, Option.empty[String]),
    (5L, Option.empty[String]),
    (6L, Option("The quick brown fox jumps over the lazy dog and " +
      "mails a@b.com or dials 555-123-4567 today")),
    (7L, Option("see https://ex.ample.org/x and http://ex.ample.org/y")))
    .toDF("doc_id", "text")

  test("profile: empty/whitespace docs score zero-ish, NULL docs " +
      "propagate NULL (never a constant non-null quality)") {
    val p = TextAnalysis.profile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def f(id: Long, name: String) = p(id).getAs[Any](name)
    // empty + whitespace-only: zero tokens, defined zero-ish metrics
    for (id <- Seq(2L, 3L)) {
      assert(f(id, "n_tokens") == 0L, s"doc $id n_tokens")
      assert(f(id, "mean_token_len") == 0.0)
      assert(f(id, "stopword_ratio") == 0.0)
      assert(f(id, "lang_pred") == "unknown")
      val q = f(id, "quality")
      assert(q != null && q.asInstanceOf[Double] >= 0.0 &&
        q.asInstanceOf[Double] <= 1.0, s"doc $id quality $q")
    }
    // whitespace normalizes to the empty string: same fingerprint
    assert(f(2L, "fingerprint") == f(3L, "fingerprint"))
    // NULL text: NULL-in-NULL-out on every per-row metric. Before the
    // r20 guard, least/greatest NULL-skipping gave every NULL doc the
    // constant quality ~0.7 — which would sail through quality filters
    for (id <- Seq(4L, 5L)) {
      assert(f(id, "n_tokens") == null, s"doc $id n_tokens")
      assert(f(id, "quality") == null,
        s"NULL text must not score: ${f(id, "quality")}")
      assert(f(id, "fingerprint") == null)
      assert(f(id, "lang_pred") == "unknown")
    }
  }

  test("redactPii: planted PII rewritten; empty stays empty, NULL " +
      "stays NULL") {
    val out = docs.select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).contains("<EMAIL>") && out(1L).contains("<PHONE>"))
    assert(!out(1L).contains("a@b.com") && !out(1L).contains("555-123"))
    assert(out(2L) == "")
    assert(out(4L) == null && out(5L) == null)
  }

  test("exact dedup: empty and whitespace-only collapse (same " +
      "normalized body); NULL-text rows never collapse") {
    val kept = Dedup.exact(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // 6 is an exact dup of 1; 3 normalizes to 2's empty body; both
    // NULL docs survive — a missing body is not "the same document"
    assert(kept == Set(1L, 2L, 4L, 5L, 7L), s"kept $kept")
  }

  test("simhash: column and aggregation forms agree on NULL text — " +
      "missing bodies never share fingerprint 0") {
    val colFp = docs.select(col("doc_id"),
      Dedup.simhash(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(colFp(4L).isEmpty && colFp(5L).isEmpty,
      s"NULL text must fingerprint NULL: $colFp")
    assert(colFp(1L) == colFp(6L) && colFp(1L).nonEmpty)
    // aggregation form drops NULL docs entirely
    val aggIds = Dedup.simhashFingerprints(docs, "text", "doc_id")
      .select("__id").collect().map(_.getLong(0)).toSet
    assert(aggIds == Set(1L, 2L, 3L, 6L, 7L), s"agg ids $aggIds")
    // agreement on the docs both forms emit
    val aggFp = Dedup.simhashFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    aggIds.foreach(id => assert(colFp(id).contains(aggFp(id)),
      s"forms disagree on doc $id"))
    // edges: the exact pair and the empty/whitespace pair — never a
    // NULL-NULL edge
    val edges = Dedup.simhashEdges(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 6L), (2L, 3L)), s"edges $edges")
  }

  test("BM25: empty, whitespace-only, and NULL queries return no " +
      "hits over a corpus that itself has empty/NULL docs") {
    val queries = Seq(
      (1L, Option("quick fox")),
      (2L, Option("")),
      (3L, Option("   ")),
      (4L, Option.empty[String])).toDF("query_id", "query")
    val hits = Retrieval.bm25TopK(docs, queries, k = 5).collect()
    val byQuery = hits.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(1L),
      s"only the real query may match: ${byQuery.keySet}")
    val matched = hits.map(_.getLong(2)).toSet
    assert(matched == Set(1L, 6L), s"matched $matched")
  }

  test("BPE: word counts and merge training ignore empty/NULL docs; " +
      "tokenization of NULL stays NULL") {
    val wc = Bpe.wordCounts(docs).collect()
    assert(wc.forall(r => r.getString(0) != null && r.getString(0) != ""),
      "no null/empty words may enter the ledger")
    val merges = Bpe.train(docs, numMerges = 3)
    assert(merges.size == 3)
    val toks = docs.select(col("doc_id"),
      Bpe.applyMerges(col("text"), merges).as("t")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else r.getSeq[String](1))).toMap
    assert(toks(4L) == null, "NULL text tokenizes NULL")
    assert(toks(2L) != null && toks(2L).isEmpty,
      s"empty text tokenizes to zero pieces: ${toks(2L)}")
    assert(toks(1L).nonEmpty)
  }

  test("unigram piece ledger from a planted corpus has no null/empty " +
      "pieces") {
    val pieces = Unigram.pieceCounts(Bpe.wordCounts(docs), 4).collect()
    assert(pieces.nonEmpty)
    assert(pieces.forall(r => r.getString(0) != null &&
      r.getString(0).nonEmpty && r.getLong(1) > 0L))
  }

  test("bigramSurprise keeps every planted row with defined counters") {
    val out = LangModel.bigramSurprise(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    for ((id, r) <- out) {
      assert(!r.isNullAt(r.fieldIndex("n_bigrams")), s"doc $id")
      if (Seq(2L, 3L, 4L, 5L).contains(id))
        assert(r.getLong(r.fieldIndex("n_bigrams")) == 0L, s"doc $id")
    }
  }

  test("classifier: empty/NULL docs contribute no ledger tokens and " +
      "score zero margin, but stay in the scored output") {
    val ledger = Classifier.labelCounts(docs,
      length(col("text")) > lit(50), "text")
    assert(ledger.collect().forall(r => r.getString(0).nonEmpty))
    val model = Classifier.weightsFromCounts(ledger)
    val scored = Classifier.linearScore(docs, model).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(scored.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      "scoring must keep token-less documents")
    for (id <- Seq(2L, 3L, 4L, 5L)) {
      val r = scored(id)
      assert(r.getLong(r.fieldIndex("margin_scaled")) == 0L, s"doc $id")
      assert(!r.isNullAt(r.fieldIndex("accept")), s"doc $id")
    }
  }

  test("packing: chunking and CDC chunking emit nothing for " +
      "empty/NULL docs; the greedy packer fails loud on NULL inputs") {
    val chunks = Packing.chunkByTokens(docs, "doc_id", "text",
      chunkSize = 4, overlap = 1)
    val chunkIds = chunks.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(chunkIds == Set(1L, 6L, 7L), s"chunk ids $chunkIds")
    val cdcIds = Packing.cdcChunks(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cdcIds == Set(1L, 6L, 7L), s"cdc ids $cdcIds")
    val nullTokens = Seq((Option(1L), Option(5L)),
      (Option(2L), Option.empty[Long]))
      .toDF("doc_id", "n_tokens").withColumn("shard", lit(0L))
    intercept[Exception] {
      Packing.packGreedy(nullTokens, "doc_id", "n_tokens", "shard",
        capacity = 8L).collect()
    }
  }

  test("DSIR importance keeps empty/NULL docs at zero weight") {
    val target = Seq((100L, "quick brown fox runs fast"))
      .toDF("doc_id", "text")
    val w = Importance.importanceWeights(docs, target).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    for (id <- Seq(2L, 3L, 4L, 5L)) {
      assert(w(id).getLong(1) == 0L, s"doc $id n_feats")
      assert(w(id).getDouble(3) == 0.0, s"doc $id mean_weight")
    }
    assert(w(1L).getLong(1) > 0L)
  }

  test("domain profile: docs without URLs (incl. empty/NULL) " +
      "contribute nothing; the URL doc counts per domain") {
    val d = TextAnalysis.domainCounts(docs).collect()
    assert(d.length == 1)
    assert(d.head.getString(0) == "ex.ample.org")
    assert(d.head.getLong(1) == 2L && d.head.getLong(2) == 1L)
  }

  test("property: tokenCount/meanTokenLength match a reference over " +
      "arbitrary whitespace-riddled text") {
    import org.scalacheck.Gen
    // whitespace-heavy BMP alphabet: every Java-\s char, a non-\s
    // unicode space (U+00A0 — both engines must treat it as a
    // character), CJK, letters, punctuation. No surrogates: Spark's
    // length() counts codepoints while String.length counts UTF-16
    // units, and this property pins tokenization, not width-counting.
    val alphabet = Gen.frequency(
      5 -> Gen.oneOf(' ', '\t', '\n', '\r', '\u000B', '\f'),
      1 -> Gen.const('\u00A0'),
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('的', 'ß', 'é', '.', ',', '!', '-'))
    val genText = Gen.chooseNum(0, 60)
      .flatMap(n => Gen.listOfN(n, alphabet).map(_.mkString))
    val samples = {
      val buf = Seq.newBuilder[String]
      var seed = org.scalacheck.rng.Seed(7L)
      var i = 0
      while (i < 80) {
        genText.apply(Gen.Parameters.default, seed)
          .foreach { s => buf += s; i += 1 }
        seed = seed.next
      }
      buf.result()
    }
    def refTokens(s: String): Seq[String] =
      s.split("\\s+").toSeq.filter(_.nonEmpty)
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.meanTokenLength(col("text")).as("mean"))
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(1), r.getDouble(2))).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      val toks = refTokens(s)
      val (n, mean) = got(i)
      assert(n == toks.size.toLong,
        s"tokenCount mismatch on ${s.map(_.toInt).mkString("[", ",", "]")}: " +
          s"got $n, ref ${toks.size}")
      val refMean =
        if (toks.isEmpty) 0.0
        else toks.map(_.length).sum.toDouble / toks.size
      assert(math.abs(mean - refMean) < 1e-9,
        s"meanTokenLength mismatch on ${s.map(_.toInt).mkString("[", ",", "]")}: " +
          s"got $mean, ref $refMean")
    }
  }
}
