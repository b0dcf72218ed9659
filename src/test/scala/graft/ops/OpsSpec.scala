package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("token counting handles blanks and whitespace runs") {
    val df = Seq((1L, "one two  three"), (2L, ""), (3L, "   "),
      (4L, "single")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("bpe-ish tokens split punctuation") {
    val df = Seq((1L, "hello, world! it's x2")).toDF("doc_id", "text")
    // hello , world ! it ' s x2  -> 8
    assert(df.select(TextAnalysis.bpeishTokenCount(col("text")))
      .head.getLong(0) == 8L)
  }

  test("langId picks obvious languages, unknown on gibberish") {
    val df = Seq(
      (1L, "the cat is on the mat and that is fine"),
      (2L, "le chat est sur le tapis et les chiens"),
      (3L, "der hund ist nicht der beste und die katze"),
      (4L, "el perro que corre y la casa de los gatos"),
      (5L, "qqq zzz xxx")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "fr")
    assert(got(3L) == "de"); assert(got(4L) == "es")
    assert(got(5L) == "unknown")
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world"),
      (3L, "different")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }
}

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fit + linearScore separate planted vocabularies; blank docs " +
      "score zero") {
    val pos = Seq((1L, "great clean useful text"),
      (2L, "clean useful prose here")).toDF("doc_id", "text")
    val neg = Seq((3L, "spam junk garbage noise"),
      (4L, "junk noise spam words")).toDF("doc_id", "text")
    val model = Classifier.fit(pos, neg)
    val probe = Seq((10L, "clean useful"), (11L, "spam junk"),
      (12L, "")).toDF("doc_id", "text")
    val got = Classifier.linearScore(probe, model).orderBy("doc_id")
      .collect()
    assert(got(0).getBoolean(4), "positive-vocab doc must be accepted")
    assert(!got(1).getBoolean(4), "negative-vocab doc must be rejected")
    assert(got(2).getLong(1) == 0L && got(2).getLong(2) == 0L &&
      !got(2).getBoolean(4), "blank doc: no features, margin 0, rejected")
    // margins are exact integers: re-running is bit-identical
    val again = Classifier.linearScore(probe, model).orderBy("doc_id")
      .collect()
    assert(got.map(_.getLong(2)).toSeq == again.map(_.getLong(2)).toSeq)
  }

  test("unseen tokens contribute zero weight, not a smoothed prior") {
    val model = Classifier.fit(
      Seq((1L, "alpha")).toDF("doc_id", "text"),
      Seq((2L, "beta")).toDF("doc_id", "text"))
    val got = Classifier.linearScore(
      Seq((10L, "gamma delta")).toDF("doc_id", "text"), model)
      .head()
    assert(got.getLong(1) == 2L, "unseen tokens still count as features")
    assert(got.getLong(2) == 0L, "but carry zero weight")
  }
}

class UrlAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("extractUrls + urlDomain: multiple urls, ports, paths, no-url") {
    val df = Seq(
      (1L, "see https://a.example.com/x and http://b.org:8080/y?z=1"),
      (2L, "no links here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.extractUrls(col("text"))
        .as("u")).orderBy("doc_id").collect()
    assert(got(0).getSeq[String](1) ==
      Seq("https://a.example.com/x", "http://b.org:8080/y?z=1"))
    assert(got(1).getSeq[String](1).isEmpty)
    assert(got(2).getSeq[String](1).isEmpty, "null text reads as empty")
    val doms = df.select(explode(TextAnalysis.extractUrls(col("text")))
        .as("u"))
      .select(TextAnalysis.urlDomain(col("u"))).collect()
      .map(_.getString(0)).toSet
    assert(doms == Set("a.example.com", "b.org"))
  }

  test("domainCounts: url mentions vs distinct docs") {
    val df = Seq(
      (1L, "https://d.com/a https://d.com/b"),
      (2L, "https://d.com/c"),
      (3L, "https://e.com/")).toDF("doc_id", "text")
    val got = TextAnalysis.domainCounts(df).orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("d.com", 3L, 2L), ("e.com", 1L, 1L)))
  }
}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again today"),
    (2L, "the quick brown fox jumps over the lazy dog again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again today"), // near dup of 1
    (4L, "completely different content about spark query engines"),
    (5L, "  The Quick  Brown fox jumps over the lazy dog again today")) // ws/case dup of 1
    .toDF("doc_id", "text")

  test("PII redaction replaces emails, phones, IPs with placeholders") {
    val df = Seq(
      ("mail me at bob.smith+x@corp.example.org today",
        "mail me at <EMAIL> today"),
      ("call 555-867-5309 or 555.123.4567 now",
        "call <PHONE> or <PHONE> now"),
      ("host 192.168.0.1 and 10.0.42.7 up",
        "host <IP> and <IP> up"),
      ("clean text, no pii at all", "clean text, no pii at all"),
      // short digit groups must not trip the 3-3-4 phone pattern
      ("reach a@b.co via 1-2-3", "reach <EMAIL> via 1-2-3"))
      .toDF("text", "expected")
    val got = df.select(TextAnalysis.redactPii(col("text")).as("r"),
      col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got '${r.getString(0)}' want '${r.getString(1)}'"))
    val counts = df.select(
      TextAnalysis.piiCount(col("text"), TextAnalysis.EmailRe),
      TextAnalysis.piiCount(col("text"), TextAnalysis.PhoneRe),
      TextAnalysis.piiCount(col("text"), TextAnalysis.Ipv4Re))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(counts.toSeq == Seq((1L, 0L, 0L), (0L, 2L, 0L), (0L, 0L, 2L),
      (0L, 0L, 0L), (1L, 0L, 0L)), s"counts: ${counts.toSeq}")
  }

  test("exact dedup keeps min id per normalized text") {
    val kept = Dedup.exact(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("minhash edges find near-dups, not unrelated docs") {
    val edges = Dedup.minhashEdges(docs, "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((1L, 2L)))
    assert(edges.contains((1L, 3L)) || edges.contains((3L, 5L)) ||
      edges.contains((2L, 3L)))
    assert(!edges.exists(e => e._1 == 4L || e._2 == 4L),
      s"doc 4 is unrelated: $edges")
  }

  test("minhashDedup collapses the near-dup cluster to min id") {
    val kept = Dedup.minhashDedup(docs, numHashes = 32, bands = 16,
      threshold = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"cluster {1,2,3,5} -> 1, plus 4: $kept")
  }

  test("incrementalExactRemovals: base wins regardless of ids, " +
      "new-only groups keep min id, NULL text kept") {
    val base = Seq((10L, "alpha bravo"), (11L, "charlie delta"),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "alpha bravo"), // dup of base 10 — base wins despite 1 < 10
      (2L, "echo foxtrot"), // new-only group, min id -> kept
      (3L, "echo foxtrot"), // -> removed
      (4L, null.asInstanceOf[String]), // NULL text -> kept
      (5L, "charlie delta")) // dup of base 11 -> removed
      .toDF("doc_id", "text")
    val removed = Dedup.incrementalExactRemovals(fresh, base)
      .collect().map(_.getLong(0)).toSet
    assert(removed == Set(1L, 3L, 5L), s"removals: $removed")
  }

  test("incrementalMinhashRemovals: base component wins, new-only " +
      "keeps min id (or best quality), NULL kept") {
    val base = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      // near-dup of base 10 — removed despite 1 < 10
      (1L, "the quick brown fox jumps over the lazy cat again today"),
      // new-only near-dup pair {2, 3} (jaccard 5/7 at the last token)
      (2L, "completely different content about spark query engines today"),
      (3L, "completely different content about spark query engines tonight"),
      // unrelated singleton + NULL text — both kept
      (4L, "unrelated musings on distributed snapshot isolation"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val removed = Dedup.incrementalMinhashRemovals(fresh, base,
      numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(removed == Set(1L, 3L), s"removals: $removed")
    // with a quality column, the new-only pair keeps the BEST member
    val freshQ = fresh.withColumn("q",
      when(col("doc_id") === 3L, 9L).otherwise(lit(1L)))
    val removedQ = Dedup.incrementalMinhashRemovals(freshQ, base,
      numHashes = 32, bands = 16, threshold = 0.5,
      qualityCol = Some("q"))
      .collect().map(_.getLong(0)).toSet
    assert(removedQ == Set(1L, 2L), s"removals: $removedQ")
  }

  test("incremental removal policy plans ONE Window node — rank and " +
      "has-old flag share the partition key AND ordering (r22)") {
    val base = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy cat again today"),
      (2L, "completely different content about spark query engines today"),
      (3L, "completely different content about spark query engines tonight"))
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Seq(None, Some("doc_id")).foreach { q =>
      val out = Dedup.incrementalMinhashRemovals(fresh, base,
        numHashes = 32, bands = 16, threshold = 0.5, qualityCol = q)
      val wins = out.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.size == 1,
        s"policy tail (qualityCol=$q) must fuse into one WindowExec, " +
          s"got ${wins.size}:\n${out.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("signatureFrame stores the exact pipeline signatures and " +
      "fingerprints; NULL text excluded") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short doc"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val idx = Dedup.signatureFrame(df, numHashes = 16)
    val rows = idx.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
    // sig parity with the aggregation form the pipeline bands on
    val aggSig = Dedup.minhashSignatures(df, "text", "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { r =>
      assert(r.getSeq[Long](3) == aggSig(r.getLong(0)),
        s"sig mismatch for ${r.getLong(0)}")
    }
    // fp parity with the exact-mode fingerprint
    val fps = df.where(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(r.getString(1) == fps(r.getLong(0))))
  }

  test("indexed removals match the from-scratch incremental removals " +
      "(exact and minhash, with and without quality)") {
    val base = Seq((10L, "alpha bravo"), (11L, "charlie delta"),
      (12L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "alpha bravo"),
      (2L, "echo foxtrot"), (3L, "echo foxtrot"),
      (4L, null.asInstanceOf[String]),
      (5L, "the quick brown fox jumps over the lazy cat again today"),
      (6L, "completely different content about spark query engines today"),
      (7L, "completely different content about spark query engines tonight"))
      .toDF("doc_id", "text")
    val index = Dedup.signatureFrame(base, numHashes = 32)
    val exScratch = Dedup.incrementalExactRemovals(fresh, base)
      .collect().map(_.getLong(0)).toSet
    val exIndexed = Dedup.indexedExactRemovals(fresh, index)
      .collect().map(_.getLong(0)).toSet
    assert(exIndexed == exScratch && exScratch == Set(1L, 3L))
    val mhScratch = Dedup.incrementalMinhashRemovals(fresh, base,
      numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    val mhIndexed = Dedup.indexedMinhashRemovals(fresh, index,
      numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(mhIndexed == mhScratch && mhScratch == Set(1L, 3L, 5L, 7L),
      s"scratch $mhScratch indexed $mhIndexed")
    val freshQ = fresh.withColumn("q",
      when(col("doc_id") === 7L, 9L).otherwise(lit(1L)))
    val mhQ = Dedup.indexedMinhashRemovals(freshQ, index,
      numHashes = 32, bands = 16, threshold = 0.5,
      qualityCol = Some("q"))
      .collect().map(_.getLong(0)).toSet
    assert(mhQ == Set(1L, 3L, 5L, 6L), s"quality removals $mhQ")
  }

  test("connected components labels transitive clusters") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L).toDF("id")
    val comps = Dedup.connectedComponents(edges, ids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(4L) == 4L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("connected components: 1000-node chain converges, bounded caches") {
    // a pure path is the worst case for plain min-propagation (O(n)
    // rounds); pointer doubling must collapse it within maxIter=20
    val n = 1000
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val ids = (1 to n).map(_.toLong).toDF("id")
    val before = spark.sparkContext.getPersistentRDDs.size
    // driverMaxEdges=0 forces the distributed loop (the chain is the
    // loop's worst case; the driver fast path is covered by the
    // transitive-clusters test above)
    val comps = Dedup.connectedComponents(edges, ids, driverMaxEdges = 0)
    val labels = comps.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 1L),
      s"chain must collapse to component 1: ${labels.filter(_._2 != 1L).take(5).toSeq}")
    // steady state: edge-node set, the final round's cache, and the
    // last lineage checkpoint stay alive (the result reads them);
    // everything superseded must be gone — the bound is CONSTANT in
    // iteration count, which is the point
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 5,
      s"superseded label caches must be unpersisted: before=$before after=$after")
  }

  test("aggregate signature forms match the column forms exactly") {
    // minhash
    val viaAgg = Dedup.minhashSignatures(docs, "text", "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg == viaCol)
    // simhash
    val fpAgg = Dedup.simhashFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fpCol = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fpAgg == fpCol)
  }

  test("simhash: identical docs hamming 0, near dups small, far apart big") {
    val fp = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) <= 12)
    assert(ham(fp(1L), fp(4L)) > 12)
  }

  test("jaccard built-in") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    assert(df.select(Dedup.jaccard(col("a"), col("b"))).head.getDouble(0)
      == 0.5)
  }
}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine matches manual computation") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 1f, 0f), Seq(1f, 1f, 0f)),
      (Seq(1f, 0f, 0f), Seq(-1f, 0f, 0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2) == -1.0)
  }

  /** Deterministic clustered vectors: 4 clusters of 25, dim 16 —
    * returned WITH their true centers so tests that plant centroids
    * never re-derive the RNG draw sequence. */
  private def clusteredWithCenters: (DataFrame, Array[Array[Float]]) = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val df = (0 until 100).map { i =>
      val c = centers(i % 4)
      val v = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    (df, centers)
  }

  private def clustered: DataFrame = clusteredWithCenters._1

  test("pqEncode assigns per-subspace argmin codes, ties to lowest id") {
    // 2 subspaces of dim 2; centroids at the axis corners
    val cbs: Seq[Seq[Array[Double]]] = Seq(
      Seq(Array(0.0, 0.0), Array(1.0, 1.0)),
      Seq(Array(0.0, 1.0), Array(1.0, 0.0)))
    val df = Seq(
      (1L, Seq(0.1f, 0.1f, 0.1f, 0.9f)), // -> (0, 0)
      (2L, Seq(0.9f, 0.8f, 0.9f, 0.2f)), // -> (1, 1)
      (3L, Seq(0.5f, 0.5f, 0.5f, 0.5f))  // equidistant -> lowest ids
    ).toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(df, cbs).orderBy("vec_id")
      .collect().map(r => r.getSeq[Int](1).toSeq)
    assert(got(0) == Seq(0, 0) && got(1) == Seq(1, 1) &&
      got(2) == Seq(0, 0), s"codes ${got.toSeq}")
  }

  test("PQ ADC top-k ranks the code-matching cluster first") {
    val (df, centers) = clusteredWithCenters
    // codebooks: 4 subspaces of dim 4, centroids = the true cluster
    // centers' sub-vectors — ADC distance to a same-cluster vector is
    // then (near) the quantization floor, so cluster 0 fills the top-k
    val cbs: Seq[Seq[Array[Double]]] = (0 until 4).map(j =>
      centers.toSeq.map(c =>
        c.slice(j * 4, j * 4 + 4).map(_.toDouble)))
    val top = Similarity.pqTopKWithCodebooks(df,
      df.filter(col("vec_id") === 0), cbs, k = 10)
    val rows = top.orderBy("rank").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(1) % 4 == 0),
      s"cluster 0 members only: ${rows.map(_.getLong(1)).toSeq}")
    // deterministic re-run
    val again = Similarity.pqTopKWithCodebooks(df,
      df.filter(col("vec_id") === 0), cbs, k = 10).orderBy("rank").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("brute force top-k finds same-cluster neighbors") {
    val df = clustered
    val top = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 0),
      k = 10)
    val nids = top.select("nid").collect().map(_.getLong(0))
    assert(nids.length == 10)
    assert(nids.forall(_ % 4 == 0), s"cluster 0 members only: ${nids.toSeq}")
  }

  test("LSH top-k recall >= 0.6 vs brute force on clustered data") {
    val df = clustered
    val qs = df.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(df, qs, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(df, qs, k = 5, planes = 8,
      multiProbe = 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall")
  }

  test("IVF top-k recall >= 0.8 with nprobe=2 on clustered data") {
    val df = clustered
    val qs = df.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(df, qs, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(df, qs, k = 5, nCentroids = 4,
      nprobe = 2)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }

  test("IVF with planted centroids at cluster centers matches brute force") {
    // centroids = the true cluster directions, nprobe=1: every query's
    // candidates are exactly its own cluster, where all its true
    // neighbors live — so the shared assignment/probe/re-rank path
    // (ivfTopKWithCentroids, the stage ivfTopK delegates to and e3b
    // hash-gates) must reproduce brute force exactly
    val (df, centers) = clusteredWithCenters
    val qs = df.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(df, qs, k = 5)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = Similarity.ivfTopKWithCentroids(df, qs,
        centers.toSeq.map(_.map(_.toDouble)), k = 5, nprobe = 1)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == exact, s"ivf=$ivf exact=$exact")
  }

  test("IVF row-count hint skips the counting pre-pass, same results") {
    val df = clustered
    val qs = df.filter(col("vec_id") < 4)
    val sc = spark.sparkContext
    def run(group: String, hint: Option[Long]) = {
      sc.setJobGroup(group, group)
      val got = Similarity.ivfTopK(df, qs, k = 5, nCentroids = 4,
        nprobe = 2, rowCountHint = hint)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      sc.clearJobGroup()
      (got, sc.statusTracker.getJobIdsForGroup(group).length)
    }
    val n = df.count()
    val (noHint, jobsNoHint) = run("ivf_nohint", None)
    val (hinted, jobsHinted) = run("ivf_hint", Some(n))
    assert(hinted == noHint, "hint must not change results")
    assert(jobsHinted < jobsNoHint,
      s"hinted run must skip the count job ($jobsHinted vs $jobsNoHint)")
  }

  test("ivfPqTopK composes: candidates from probed cells only, " +
      "ranked by ADC — planted models recover the true cluster") {
    val (df, centers) = clusteredWithCenters
    val centroids = centers.toSeq.map(_.map(_.toDouble))
    // codebooks = the true cluster centers' sub-vectors (4 subspaces
    // of dim 4): ADC to a same-cluster vector is near the quantization
    // floor, so with nprobe=1 the own-cluster members fill the top-k
    val cbs: Seq[Seq[Array[Double]]] = (0 until 4).map(j =>
      centers.toSeq.map(c => c.slice(j * 4, j * 4 + 4).map(_.toDouble)))
    val qs = df.filter(col("vec_id") === 0)
    val top = Similarity.ivfPqTopK(df, qs, centroids, cbs,
      k = 10, nprobe = 1).orderBy("rank").collect()
    assert(top.length == 10)
    assert(top.forall(_.getLong(1) % 4 == 0),
      s"cluster-0 members only: ${top.map(_.getLong(1)).toSeq}")
    // ranking equals plain PQ-ADC restricted to the probed cell's
    // members (the compose contract: IVF picks WHO, PQ ranks)
    val cell0 = df.where(
      Similarity.nearestCell(col("embedding"), centroids) === 0)
    val pqOnly = Similarity.pqTopKWithCodebooks(cell0, qs, cbs, k = 10)
      .select("nid", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = top.map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(got == pqOnly, s"ivfpq=$got pq-on-cell=$pqOnly")
  }

  test("pq codebooks round-trip through flat JSON; pqTopKFromCodes " +
      "over persisted codes equals the encode-at-query path") {
    val (df, centers) = clusteredWithCenters
    val cbs: Seq[Seq[Array[Double]]] = (0 until 4).map(j =>
      centers.toSeq.map(c => c.slice(j * 4, j * 4 + 4).map(_.toDouble)))
    val back = Similarity.pqCodebooksFromJson(
      Similarity.pqCodebooksToJson(cbs), ksub = 4)
    assert(back.size == cbs.size &&
      cbs.zip(back).forall { case (a, b) =>
        a.zip(b).forall(p => java.util.Arrays.equals(p._1, p._2)) })
    val qs = df.filter(col("vec_id") === 0)
    val codes = Similarity.pqEncode(df, cbs) // the persisted shape
    val fromCodes = Similarity.pqTopKFromCodes(codes, qs, cbs, k = 10)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = Similarity.pqTopKWithCodebooks(df, qs, cbs, k = 10)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fromCodes == direct, s"codes=$fromCodes direct=$direct")
  }

  test("centroid JSON round-trips bit-exactly, handles edge shapes") {
    val rnd = new scala.util.Random(13)
    val cbs: Seq[Array[Double]] = Seq(
      Array.fill(8)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)),
      Array(0.0, -0.0, 1e-300, -1e300, 0.1 + 0.2),
      Array(42.0))
    val back = Similarity.centroidsFromJson(Similarity.centroidsToJson(cbs))
    assert(back.size == cbs.size)
    cbs.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b),
        s"${a.toSeq} != ${b.toSeq}") }
    assert(Similarity.centroidsFromJson("[]").isEmpty)
  }

  test("ivfTopKFromIndex loads ONLY probed cells, matches unindexed IVF") {
    val (df, centers) = clusteredWithCenters
    val centroids = centers.toSeq.map(_.map(_.toDouble))
    val qs = df.filter(col("vec_id") === 0)
    // the persisted-index shape build_ann_index writes
    val index = df.select(col("vec_id"),
      Similarity.nearestCell(col("embedding"), centroids).as("cell"),
      Similarity.l2norm(col("embedding")).as("norm"), col("embedding"))
    var asked: Seq[Int] = Nil
    val got = Similarity.ivfTopKFromIndex(
      cells => { asked = cells; index.where(col("cell").isin(cells: _*)) },
      qs, centroids, k = 5, nprobe = 2)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    // one query, nprobe=2 of 4 cells: the index read is partial
    assert(asked.size == 2 && asked == asked.sorted, s"probed $asked")
    val full = Similarity.ivfTopKWithCentroids(df, qs, centroids,
        k = 5, nprobe = 2)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(got == full, s"indexed=$got unindexed=$full")
  }
}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("image decode plumbing: schema, determinism, modality filter") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.decodeImages(media, embeddingDim = 8)
    val rows = feats.collect()
    assert(rows.length == 10, "every 3rd synthetic row is an image")
    assert(rows.forall(_.embedding.length == 8))
    assert(rows.forall(r => r.width >= 64 && r.height >= 64))
    // deterministic across runs
    val again = Multimodal.decodeImages(
      Multimodal.syntheticMedia(spark, 30), embeddingDim = 8).collect()
    assert(rows.sortBy(_.media_id).map(_.embedding.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.embedding.toSeq).toSeq)
  }


  test("image near-dup edges: byte-identical payloads pair, distinct don't") {
    import spark.implicits._
    val base = Multimodal.syntheticMedia(spark, 12).collect()
      .filter(_.modality == "image")
    // plant an exact byte copy of each image under id + 1000
    val planted = (base ++ base.map(m =>
      m.copy(media_id = m.media_id + 1000L))).toSeq.toDS()
    val edges = Multimodal.imageNearDupEdges(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.foreach { m =>
      assert(edges.contains((m.media_id, m.media_id + 1000L)),
        s"copy pair for ${m.media_id} missing: $edges")
    }
    // no cross-image pairs: distinct random payloads are not near-dups
    assert(edges.size == base.length, s"unexpected extra edges: $edges")
  }

  test("real PNG decode: true dimensions, channels, deterministic embedding") {
    import spark.implicits._
    // render two real PNGs in-process (javax.imageio is in the JDK)
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, rnd.nextInt(0xFFFFFF))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", png(120, 48, 7), Map.empty),
      Multimodal.MediaRow(2L, "image", png(33, 77, 8), Map.empty),
      // non-image payload in the image modality → stub fallback
      Multimodal.MediaRow(3L, "image", Array.fill[Byte](64)(1), Map.empty)))
    val feats = Multimodal.decodeImages(media, embeddingDim = 12)
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 120 && feats(0).height == 48)
    assert(feats(1).width == 33 && feats(1).height == 77)
    assert(feats(0).channels == 3)
    assert(feats.forall(_.embedding.length == 12))
    assert(feats.forall(_.embedding.forall(v => v >= -1f && v <= 1f)))
    // decode is deterministic
    val again = Multimodal.decodeImages(media, embeddingDim = 12)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.embedding.toSeq).toSeq ==
      again.map(_.embedding.toSeq).toSeq)
  }

  test("video frame sampling fans out rows") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L,
      maxFrames = 4)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId.nonEmpty)
    assert(byId.values.forall(f => f.length >= 1 && f.length <= 4))
    assert(byId.values.forall(_.map(_.frame_index).toSeq.sorted ==
      (0 until byId(byId.keySet.head).length).toSeq ||
      byId.values.forall(_.nonEmpty)))
  }

  test("audio features extracted with fixed mfcc width") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val audio = Multimodal.extractAudioFeatures(media).collect()
    assert(audio.length == 10)
    assert(audio.forall(_.mfcc.length == 13))
  }

  test("real WAV decode: true sample rate, duration, energy features") {
    import spark.implicits._
    // synthesize a 16-bit mono PCM sine in-process (javax.sound is JDK)
    def wav(rateHz: Int, ms: Int, freqHz: Double): Array[Byte] = {
      val n = rateHz * ms / 1000
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (math.sin(2 * math.Pi * freqHz * i / rateHz) * 12000).toInt
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1,
        true, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio", wav(16000, 500, 440.0), Map.empty),
      Multimodal.MediaRow(2L, "audio", wav(8000, 250, 220.0), Map.empty),
      // non-audio payload → stub fallback keeps the pipeline shape
      Multimodal.MediaRow(3L, "audio", Array.fill[Byte](64)(1), Map.empty)))
    val feats = Multimodal.extractAudioFeatures(media)
      .collect().sortBy(_.media_id)
    assert(feats(0).sample_rate == 16000 && feats(0).duration_ms == 500)
    assert(feats(1).sample_rate == 8000 && feats(1).duration_ms == 250)
    assert(feats.forall(_.mfcc.length == 13))
    // a real sine has real energy in every window
    assert(feats(0).mfcc.forall(_ > 0f))
    // decode is deterministic
    val again = Multimodal.extractAudioFeatures(media)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.mfcc.toSeq).toSeq == again.map(_.mfcc.toSeq).toSeq)
  }

  test("MJPEG-AVI round-trip: writer -> parser recovers dims, rate " +
      "and frame bytes") {
    val f1 = Multimodal.solidJpeg(12, 8, 200, 10, 10)
    val f2 = Multimodal.solidJpeg(12, 8, 10, 200, 10)
    val avi = Multimodal.mjpegAvi(Seq(f1, f2, f1), 12, 8, 5)
    val p = Multimodal.parseMjpegAvi(avi).get
    assert(p.width == 12 && p.height == 8 && p.usPerFrame == 200000)
    assert(p.frames.size == 3)
    assert(p.frames(0).toSeq == f1.toSeq && p.frames(1).toSeq == f2.toSeq)
  }

  test("parseMjpegAvi survives hostile payloads: u32 size overflow " +
      "and unbounded LIST nesting") {
    def build(f: (java.io.ByteArrayOutputStream,
        Int => Unit, String => Unit) => Unit): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = { bos.write(v & 0xFF)
        bos.write((v >> 8) & 0xFF); bos.write((v >> 16) & 0xFF)
        bos.write((v >> 24) & 0xFF) }
      def cc(s: String): Unit = bos.write(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      f(bos, w32, cc)
      bos.toByteArray
    }
    // chunk size near 2^31: signed Int arithmetic would wrap past the
    // truncation guard and crash copyOfRange — must parse to None
    val overflow = build { (bos, w32, cc) =>
      cc("RIFF"); w32(100); cc("AVI ")
      cc("00dc"); w32(0x7FFFFFF0)
      bos.write(new Array[Byte](16))
    }
    assert(Multimodal.parseMjpegAvi(overflow).isEmpty)
    // 100k nested 12-byte LIST headers: unbounded recursion would
    // overflow the stack (StackOverflowError, uncatchable downstream)
    val n = 100000
    val nested = build { (bos, w32, cc) =>
      cc("RIFF"); w32(4 + 12 * n); cc("AVI ")
      (0 until n).foreach { i =>
        cc("LIST"); w32(4 + 12 * (n - 1 - i)); cc("hdrl")
      }
    }
    assert(Multimodal.parseMjpegAvi(nested).isEmpty)
  }

  test("parseMjpegAvi rejects garbage, truncation, and non-JPEG frames") {
    assert(Multimodal.parseMjpegAvi(Array.fill[Byte](64)(7)).isEmpty)
    val good = Multimodal.mjpegAvi(
      Seq(Multimodal.solidJpeg(8, 8, 1, 2, 3)), 8, 8, 4)
    assert(Multimodal.parseMjpegAvi(good).isDefined)
    assert(Multimodal.parseMjpegAvi(
      java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    assert(Multimodal.parseMjpegAvi(Array.empty[Byte]).isEmpty)
  }

  test("sampleFrames: real JPEG frames for MJPEG AVI, stub fan-out " +
      "for other payloads") {
    import spark.implicits._
    val frame = Multimodal.solidJpeg(10, 10, 5, 5, 5)
    // 4 frames at 2 fps -> 2000 ms; everyMs 1000 -> ticks 0 and 1000
    val avi = Multimodal.mjpegAvi(Seq.fill(4)(frame), 10, 10, 2)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", avi, Map.empty),
      Multimodal.MediaRow(2L, "video", Array.fill[Byte](512)(9), Map.empty)))
    val got = Multimodal.sampleFrames(media, everyMs = 1000L)
      .collect().groupBy(_.media_id)
    val real = got(1L).sortBy(_.frame_index)
    assert(real.map(f => (f.frame_index, f.timestamp_ms)).toSeq ==
      Seq((0, 0L), (1, 1000L)))
    assert(real.forall(f => (f.frame_bytes(0) & 0xFF) == 0xFF &&
      (f.frame_bytes(1) & 0xFF) == 0xD8), "real frames are JPEGs")
    assert(got(2L).nonEmpty, "non-AVI payloads keep the stub fan-out")
  }

  test("videoMeta recovers true properties for AVI, stub elsewhere") {
    import spark.implicits._
    val avi = Multimodal.mjpegAvi(
      Seq.fill(6)(Multimodal.solidJpeg(16, 12, 3, 3, 3)), 16, 12, 3)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", avi, Map.empty),
      Multimodal.MediaRow(2L, "video", Array.fill[Byte](64)(1), Map.empty)))
    val m = Multimodal.videoMeta(media).collect().sortBy(_.media_id)
    assert(m(0).width == 16 && m(0).height == 12 && m(0).fps_milli == 3000)
    assert(m(0).n_frames == 6 && m(0).duration_ms == 6L * 333333L / 1000L)
    assert(m(1).width == 0 && m(1).n_frames == 0, "stub fallback")
  }

  test("audio near-dup edges: byte-identical WAVs pair, disjoint " +
      "envelopes don't") {
    import spark.implicits._
    def wavOf(group: Int): Array[Byte] = {
      val samples = new Array[Byte](13000)
      (group * 3 until group * 3 + 3).foreach(w =>
        java.util.Arrays.fill(samples, w * 1000, (w + 1) * 1000,
          0x40.toByte))
      Multimodal.pcm8Wav(samples)
    }
    val media = spark.createDataset((0L until 8L).map(id =>
      Multimodal.MediaRow(id, "audio", wavOf((id % 4).toInt), Map.empty)))
    val edges = Multimodal.audioNearDupEdges(media, threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the id%4 pairs: (0,4) (1,5) (2,6) (3,7)
    assert(edges == (0L until 4L).map(g => (g, g + 4L)).toSet)
  }

  test("solidPng round-trips exact dims and per-channel color") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image",
        Multimodal.solidPng(21, 9, 255, 128, 0), Map.empty)))
    val f = Multimodal.decodeImages(media, embeddingDim = 6)
      .collect().head
    assert(f.width == 21 && f.height == 9 && f.channels == 3)
    // grid-mean embedding of a solid color: i%3 selects B, G, R
    val expect = Seq(-1f, 128 / 127.5f - 1f, 1f)
    assert(f.embedding.toSeq.zipWithIndex.forall { case (v, i) =>
      math.abs(v - expect(i % 3)) < 1e-6
    })
  }

  test("size-aware repartition scales with payload bytes") {
    val media = Multimodal.syntheticMedia(spark, 64,
      payloadBytes = 1024 * 1024).toDF()
    val parts = Multimodal.repartitionBySize(media,
      targetBytesPerPartition = 8L * 1024 * 1024)
    assert(parts.rdd.getNumPartitions == 8)
  }
}

class SkewSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import org.apache.spark.sql.functions._

  test("salted join preserves exact join semantics") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i % 50).toLong, i)).toDF("k", "v")
    val small = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = skewed.join(small, Seq("k"), "inner")
      .select("k", "v", "name").collect().toSet
    val salted = Skew.saltedJoin(skewed, small, "k", saltFactor = 4)
      .select("k", "v", "name").collect().toSet
    assert(salted == plain, "salting must not change the join result")
  }

  test("skew profile surfaces the hot key") {
    import spark.implicits._
    val skewed = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i % 50).toLong, i)).toDF("k", "v")
    val top = Skew.keySkewProfile(skewed, "k", topN = 1).collect().head
    assert(top.getLong(0) == 1L)
    assert(top.getDouble(2) >= 0.9)
  }
}

class AsOfSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("backward as-of join picks latest right row per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 150L, "t3"),
      (3L, 50L, "t4")) // key 3 has no quotes before ts 50
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 90L, 10.0), (1L, 200L, 11.0), (1L, 300L, 12.0),
      (2L, 150L, 20.0), (3L, 60L, 30.0))
      .toDF("k", "ts", "px")
    val got = graft.ops.AsOf.asOfJoin(trades, quotes, Seq("k"), "ts")
      .select("k", "trade", "right_px")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set(
      (1L, "t1", Some(10.0)),  // 90 <= 100 < 200
      (1L, "t2", Some(11.0)),  // 200 <= 205 < 300
      (2L, "t3", Some(20.0)),  // equal ts matches
      (3L, "t4", None)))       // no quote at or before 50
  }
}

class PackingSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("greedy packing fills bins in id order, resets on overflow") {
    // shard 0: 300+200 fit (500<=512), +100 overflows -> bin 1;
    // then an OVERSIZED doc (600>512) takes its own bin; next restarts
    val df = Seq(
      (0L, 1L, 300L), (0L, 2L, 200L), (0L, 3L, 100L),
      (0L, 4L, 600L), (0L, 5L, 10L),
      (1L, 6L, 512L), (1L, 7L, 1L)).toDF("shard", "doc_id", "tokens")
    val got = Packing.packGreedy(df, "doc_id", "tokens", "shard", 512)
      .orderBy("shard", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L), (0L, 2L, 0L), (0L, 3L, 1L),
      (0L, 4L, 2L), (0L, 5L, 3L),
      (1L, 6L, 0L), (1L, 7L, 1L)), s"got ${got.toSeq}")
    // in-bin offsets: doc 2 starts after doc 1's 300 tokens; every
    // bin-opening doc starts at 0
    val offs = Packing.packGreedy(df, "doc_id", "tokens", "shard", 512)
      .orderBy("shard", "id")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(offs == Map(1L -> 0L, 2L -> 300L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L), s"offsets $offs")
  }

  test("packing is shard-parallel: shards never share a bin sequence") {
    val df = (0L until 400L).map(i => (i % 8, i, 100L))
      .toDF("shard", "doc_id", "tokens")
    val out = Packing.packGreedy(df, "doc_id", "tokens", "shard", 512)
    // 50 docs x 100 tokens per shard, 5 per 512-bin -> bins 0..9
    val perShard = out.groupBy("shard")
      .agg(max("bin").as("mx"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(perShard.length == 8)
    assert(perShard.forall { case (_, mx, n) => mx == 9L && n == 50L },
      s"got ${perShard.toSeq}")
    // bin capacity is respected everywhere
    val over = out.groupBy("shard", "bin")
      .agg(sum("tokens").as("s")).where(col("s") > 512).count()
    assert(over == 0)
  }

  test("stratified sample: exact quota, deterministic, portable order") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    def run() = Packing.stratifiedSample(df, "lang", "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s1 = run(); val s2 = run()
    assert(s1 == s2, "sample must be deterministic")
    assert(s1.count(_._2 == "a") == 10 && s1.count(_._2 == "b") == 10)
    // small strata are returned whole
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "lang")
    assert(Packing.stratifiedSample(tiny, "lang", "doc_id", 10)
      .count() == 2)
  }

  test("global order index: contiguous, gapless, equals the single-" +
      "window order, never a one-partition global sort") {
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("doc_id", "payload")
    val out = Packing.globalOrderIndex(df, "doc_id")
    val got = out.collect()
      .map(r => r.getLong(r.fieldIndex("order_idx")) ->
        r.getLong(r.fieldIndex("doc_id")))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 500L),
      "indices must be contiguous and gapless")
    // equals the naive single-window order
    import org.apache.spark.sql.expressions.Window
    val naive = df.withColumn("i",
        row_number().over(Window.orderBy(md5(col("doc_id").cast("string")),
          col("doc_id"))) - 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> (r.getAs[Int]("i")))
      .toMap
    got.foreach { case (idx, id) => assert(naive(id) == idx.toInt) }
    // payload survives
    assert(out.columns.toSet == Set("doc_id", "payload", "order_idx"))
  }

  test("chunking: stride math, overlap carry, short/empty docs") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "a b c"),                                  // <= chunkSize
      (3L, "")                                        // no chunks
    ).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(df, "doc_id", "text",
        chunkSize = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    // doc 1: stride 2 -> ceil((10-4)/2)+1 = 4 chunks
    assert(out.keys.count(_._1 == 1L) == 4)
    assert(out((1L, 0L)) == ((4L, "t1 t2 t3 t4")))
    assert(out((1L, 1L)) == ((4L, "t3 t4 t5 t6")), "overlap of 2 carried")
    assert(out((1L, 3L)) == ((4L, "t7 t8 t9 t10")))
    assert(out((2L, 0L)) == ((3L, "a b c")), "short doc = one chunk")
    assert(!out.keys.exists(_._1 == 3L), "empty doc yields no chunks")
    // every token index is covered by some chunk
    val covered = out.collect { case ((1L, _), (_, txt)) =>
      txt.split(" ").toSet }.flatten.toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("CDC chunking: boundaries are content-defined — chunks re-align " +
      "after an insertion; partition + edge cases hold") {
    val body = (1 to 400).map(i => s"w${i * 7 % 131}x$i").mkString(" ")
    val df = Seq(
      (1L, body),
      (2L, "PREFIX INSERTED TOKENS " + body), // early edit, same body
      (3L, "a b"),                            // shorter than the window
      (4L, "")                                // no chunks
    ).toDF("doc_id", "text")
    val out = Packing.cdcChunks(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3)))
    val byDoc = out.groupBy(_._1._1)
    // every token is in exactly one chunk: sizes sum to the doc length
    assert(byDoc(1L).map(_._2._1).sum == 400L)
    assert(byDoc(3L).toSeq == Seq((3L, 0L) -> ((2L, md5Hex("a b")))),
      "short doc = one whole-doc chunk")
    assert(!byDoc.contains(4L), "empty doc yields no chunks")
    // the CDC property: after the first shared boundary, doc 2's chunk
    // digests re-align with doc 1's — a prefix edit does not cascade
    val d1 = byDoc(1L).toSeq.sortBy(_._1._2).map(_._2._2)
    val d2 = byDoc(2L).toSeq.sortBy(_._1._2).map(_._2._2)
    val shared = d1.toSet.intersect(d2.toSet)
    assert(shared.size >= d1.size - 2,
      s"expected all but the first chunk(s) to re-align, " +
        s"shared ${shared.size} of ${d1.size}")
    // and the realigned suffix is in the same order
    val tail1 = d1.dropWhile(!shared.contains(_))
    val tail2 = d2.dropWhile(!shared.contains(_))
    assert(tail1 == tail2, "re-aligned chunk sequence must match")
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("temperature sample: ceil(sqrt(n)) per stratum, deterministic") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 109L).map(i => (i, "small"))).toDF("doc_id", "source")
    def run() = Packing.temperatureSample(df, "source", "doc_id")
      .collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("source")))).toSet
    val s1 = run(); val s2 = run()
    assert(s1 == s2, "sample must be deterministic")
    assert(s1.count(_._2 == "big") == 10)   // ceil(sqrt(100))
    assert(s1.count(_._2 == "small") == 3)  // ceil(sqrt(9))
    // never clobbers user columns named like the working ones
    val clash = df.withColumn("__graft_rk0", lit("keep"))
    val out = Packing.temperatureSample(clash, "source", "doc_id")
    assert(out.columns.contains("__graft_rk0"))
    assert(out.select("__graft_rk0").head.getString(0) == "keep")
  }
}

class SessionizeSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def ev = Seq(
    // user 1: two sessions (gap of 2h between event 3 and 4)
    (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1L),
    (1L, java.sql.Timestamp.valueOf("2026-01-01 10:10:00"), 2L),
    (1L, java.sql.Timestamp.valueOf("2026-01-01 10:20:00"), 3L),
    (1L, java.sql.Timestamp.valueOf("2026-01-01 12:20:00"), 4L),
    // user 2: one session, equal timestamps broken by event id
    (2L, java.sql.Timestamp.valueOf("2026-01-01 09:00:00"), 5L),
    (2L, java.sql.Timestamp.valueOf("2026-01-01 09:00:00"), 6L)
  ).toDF("user_id", "ts", "event_id")

  test("gap splits sessions; exact-gap boundary stays in-session") {
    val out = Sessionize.withSessionIdx(ev, "user_id", "ts", "event_id",
        gap = lit(30L * 60L * 1000000L))
      .select("user_id", "event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out((1L, 1L)) == 0L && out((1L, 2L)) == 0L &&
      out((1L, 3L)) == 0L)
    assert(out((1L, 4L)) == 1L, "2h gap starts a new session")
    assert(out((2L, 5L)) == 0L && out((2L, 6L)) == 0L)
    // a gap of EXACTLY 30 min does not split (strict >)
    val edge = Seq(
      (9L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L),
      (9L, java.sql.Timestamp.valueOf("2026-01-01 00:30:00"), 2L)
    ).toDF("user_id", "ts", "event_id")
    val e = Sessionize.withSessionIdx(edge, "user_id", "ts", "event_id",
      gap = lit(30L * 60L * 1000000L))
    assert(e.select("session_idx").collect().map(_.getLong(0)).toSet ==
      Set(0L))
  }

  test("session rollup counts and spans") {
    val out = Sessionize.sessions(ev, "user_id", "ts", "event_id",
        gap = lit(30L * 60L * 1000000L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(r.fieldIndex("span_us")))).toMap
    assert(out((1L, 0L)) == ((3L, 20L * 60L * 1000000L)))
    assert(out((1L, 1L)) == ((1L, 0L)))
    assert(out((2L, 0L)) == ((2L, 0L)))
  }

  test("one shuffle: both window passes share a single Exchange") {
    val plan = Sessionize.sessions(ev, "user_id", "ts", "event_id",
        gap = lit(1800000000L))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
  }
}

class RangeJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("containment semantics: inclusive bounds, key isolation, " +
      "multi-bin intervals, degenerate intervals dropped") {
    val points = Seq(
      (1L, 10L, 100L), (1L, 11L, 150L), (1L, 12L, 250L),
      (2L, 20L, 100L)
    ).toDF("k", "pid", "pt")
    val intervals = Seq(
      (1L, 900L, 100L, 150L),  // catches 10 (>= start) and 11 (<= end)
      (1L, 901L, 140L, 260L),  // spans 3 bins at width 50: 11, 12
      (2L, 902L, 200L, 300L),  // other key: catches nothing
      (1L, 903L, 500L, 400L)   // start > end: dropped
    ).toDF("k", "iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pt", "s", "e", binWidth = 50L, rightPrefix = "r_")
      .select("pid", "r_iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 900L), (11L, 900L), (11L, 901L), (12L, 901L)))
  }

  test("pairs meet exactly once (no dup from multi-bin explode)") {
    val points = Seq((1L, 1L, 125L)).toDF("k", "pid", "pt")
    val intervals = Seq((1L, 9L, 0L, 1000L)).toDF("k", "iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "pt", "s", "e", binWidth = 10L)
    assert(out.count() == 1L, "21-bin interval must match the point once")
  }

  test("plans as an equi-join, not a nested loop") {
    val points = Seq((1L, 1L, 125L)).toDF("k", "pid", "pt")
    val intervals = Seq((1L, 9L, 0L, 1000L)).toDF("k", "iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "pt", "s", "e", binWidth = 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"),
      s"range join must bin into an equi-join:\n$plan")
  }
}

/** Fixed-seed randomized parity: the binned composition must equal the
  * naive theta-join on arbitrary data — the property the bin math
  * (floor division, inclusive bounds, multi-bin explode) must uphold
  * for EVERY binWidth, not just the widths the example tests pick. */
class RangeJoinPropertySpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("binned join equals naive theta-join across bin widths") {
    val rnd = new scala.util.Random(42)
    val points = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "pid", "pt")
    val intervals = (1 to 80).map { i =>
      val s = rnd.nextInt(1000) - 20
      (rnd.nextInt(5).toLong, (1000 + i).toLong, s.toLong,
        (s + rnd.nextInt(120)).toLong)
    }.toDF("k", "iid", "s", "e")
    val naive = points.join(intervals, Seq("k"))
      .where(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bw <- Seq(1L, 7L, 64L, 500L, 5000L)) {
      val binned = RangeJoin.pointInInterval(points, intervals, Seq("k"),
          "pt", "s", "e", binWidth = bw, rightPrefix = "r_")
        .select("pid", "r_iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"parity broken at binWidth=$bw")
    }
  }

  test("negative-domain points bin correctly (floor, not truncate)") {
    val points = Seq((1L, 1L, -5L), (1L, 2L, -95L)).toDF("k", "pid", "pt")
    val intervals = Seq((1L, 9L, -100L, -1L)).toDF("k", "iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "pt", "s", "e", binWidth = 10L)
    assert(out.count() == 2,
      "both negative points fall inside [-100, -1]")
  }
}

/** Fixed-seed randomized invariants for chunking: full coverage, exact
  * overlap between neighbors, correct chunk count — for arbitrary
  * (docLen, chunkSize, overlap) combinations. */
class ChunkingPropertySpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("coverage, overlap, and count invariants hold on random shapes") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 12).map { i =>
      val cs = 2 + rnd.nextInt(40)
      val ov = rnd.nextInt(cs)
      val len = 1 + rnd.nextInt(200)
      (i.toLong, cs, ov, len)
    }
    for ((id, cs, ov, len) <- cases) {
      val txt = (1 to len).map(j => s"w$j").mkString(" ")
      val df = Seq((id, txt)).toDF("doc_id", "text")
      val chunks = Packing.chunkByTokens(df, "doc_id", "text", cs, ov)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getLong(1), r.getString(3)))
      val stride = cs - ov
      val expected =
        if (len <= cs) 1 else ((len - cs + stride - 1) / stride) + 1
      assert(chunks.length == expected,
        s"len=$len cs=$cs ov=$ov: ${chunks.length} chunks != $expected")
      // every token appears in some chunk, in order
      val all = chunks.flatMap(_._2.split(" "))
      assert(all.toSet == (1 to len).map(j => s"w$j").toSet,
        s"len=$len cs=$cs ov=$ov: coverage broken")
      // consecutive chunks share exactly `overlap` tokens (except a
      // shorter last chunk, which may truncate the window)
      chunks.sliding(2).foreach {
        case Array((_, a), (_, b)) =>
          val at = a.split(" "); val bt = b.split(" ")
          if (bt.length == cs)
            assert(at.takeRight(ov).sameElements(bt.take(ov)),
              s"len=$len cs=$cs ov=$ov: overlap carry broken")
        case _ =>
      }
    }
  }
}

class ContaminationSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("overlap fractions: full, partial, zero; zero-hit docs kept") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),        // = bench doc
      (2L, "alpha beta gamma zeta eta theta"),       // partial overlap
      (3L, "totally unrelated words live here now")  // zero overlap
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val out = Contamination.overlap(corpus, bench)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(1L) == ((3L, 3L, 1L)), "identical doc fully contaminated")
    // doc 2 shares only the 'alpha beta gamma' shingle
    assert(out(2L)._1 == 1L && out(2L)._3 == 0L)
    assert(out(3L) == ((0L, 4L, 0L)), "zero-hit doc still reported")
  }

  test("short docs (< n tokens) fall back to whole-text gram") {
    val corpus = Seq((1L, "hi there"), (2L, "bye")).toDF("doc_id", "text")
    val bench = Seq((9L, "hi there")).toDF("doc_id", "text")
    val out = Contamination.overlap(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 0L)
  }
}

class RepetitionSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("repetition signals on plain, looped, and empty text") {
    val df = Seq(
      (1L, "all words here are unique tokens"),
      (2L, "spam spam spam spam"),
      (3L, "buy now buy now buy now"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.distinctTokenRatio(col("text")).as("dr"),
        TextAnalysis.topTokenFraction(col("text")).as("tf"),
        TextAnalysis.dupNgramFraction(col("text"), 2).as("d2"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((1.0, 1.0 / 6.0, 0.0)))
    // the engine (and the d12 oracle) compute 1 - distinct/total, which
    // differs from 2.0/3.0 in the final ulp
    assert(out(2L) == ((0.25, 1.0, 1.0 - 1.0 / 3.0)))
    // 'buy now' x3: 2/6 distinct tokens, top token 3/6,
    // 2-grams: [buy now, now buy, buy now, now buy, buy now] -> 2/5 uniq
    assert(out(3L)._1 == 2.0 / 6.0 && out(3L)._2 == 0.5 &&
      out(3L)._3 == 1.0 - 2.0 / 5.0)
    // round-6 presentation (what d12 emits) is stable across engines
    val rounded = df.where(col("doc_id") === 2L)
      .select(round(TextAnalysis.dupNgramFraction(col("text"), 2), 6))
      .head.getDouble(0)
    assert(rounded == 0.666667)
    assert(out(4L) == ((1.0, 0.0, 0.0)))
  }
}

class SemanticDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // two well-separated cells on the unit circle
  private val centroids = Seq(Array(1.0, 0.0), Array(-1.0, 0.0))

  test("keep rule: lowest id survives, near-dups in its cell drop, " +
      "far vectors and other-cell vectors stay") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),     // cell 0, kept (lowest)
      (2L, Seq(0.999f, 0.04f)),  // cell 0, cos(1,2) ~ 1 -> dropped
      (3L, Seq(0.2f, 0.98f)),    // cell 0 (closer to +x), far from 1 -> kept
      (4L, Seq(-1.0f, 0.0f)),    // cell 1: same direction as nothing there
      (5L, Seq(-0.999f, -0.04f)) // cell 1, near-dup of 4 -> dropped
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, centroids, threshold = 0.98)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept.keySet == Set(1L, 3L, 4L))
    assert(kept(1L) == 0 && kept(3L) == 0 && kept(4L) == 1)
  }

  test("non-transitive: b drops via a, c survives if only near b") {
    // a--b similar, b--c similar, a--c not: c is NOT dropped (its only
    // lower-id near-dup is b, but the rule tests existence of ANY
    // lower-id cell-mate over threshold, and cos(a,c) < t, cos(b,c) >= t
    // -> c drops because b is lower-id and still in the same CELL
    // (dropping is by id order, not by survivorship) — assert exactly
    // that documented semantics
    val a = Seq(1.0f, 0.0f)
    val b = Seq(math.cos(0.2).toFloat, math.sin(0.2).toFloat)
    val c = Seq(math.cos(0.4).toFloat, math.sin(0.4).toFloat)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    // cos(a,b)=cos(0.2)~0.980, cos(b,c)~0.980, cos(a,c)=cos(0.4)~0.921
    val kept = Dedup.semanticDedup(df, centroids, threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"got $kept")
  }

  test("fitted-codebook path drops planted exact copies") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val withCopies = base ++ base.map { case (id, v) => (id + 1000L, v) }
    val df = withCopies.toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedupFit(df, k = 4, threshold = 0.9999)
      .collect().map(_.getLong(0)).toSet
    // every copy has its original (lower id, identical vector -> same
    // cell whatever the fit produced) at cosine 1
    assert((0 until 40).forall(i => kept(i.toLong)))
    assert((0 until 40).forall(i => !kept(i + 1000L)), s"copies kept: " +
      kept.filter(_ >= 1000L).toSeq.sorted.take(5).toString)
  }
}

class QuantizeSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("codes in [0,255], endpoints exact, mse within scale^2/4") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 20).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 4 - 2))).toDF(
      "vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df).collect()
    rows.foreach { r =>
      val codes = r.getSeq[Long](1)
      val scale = r.getDouble(3)
      val mse = r.getDouble(4)
      assert(codes.forall(c => c >= 0L && c <= 255L))
      assert(codes.contains(0L), "min element must code to 0")
      assert(codes.contains(255L), "max element must code to 255")
      assert(mse <= scale * scale / 4.0 * 1.0001,
        s"mse $mse vs bound ${scale * scale / 4.0}")
    }
  }

  test("constant and empty vectors: zero scale, zero error") {
    val df = Seq(
      (1L, Seq(0.5f, 0.5f, 0.5f)),
      (2L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L)._1 == Seq(0L, 0L, 0L))
    assert(got(1L)._2 == 0.0 && got(1L)._3 == 0.0)
    assert(got(2L)._1.isEmpty && got(2L)._3 == 0.0)
  }

  test("dequantized values reconstruct within half a step") {
    val df = Seq((1L, Seq(-1.0f, -0.25f, 0.1f, 0.9f))).toDF(
      "vec_id", "embedding")
    val r = Similarity.quantizeInt8(df).head
    val codes = r.getSeq[Long](1)
    val lo = r.getDouble(2); val scale = r.getDouble(3)
    val orig = Seq(-1.0, -0.25, 0.1, 0.9)
    codes.zip(orig).foreach { case (c, x) =>
      assert(math.abs(lo + c * scale - x) <= scale / 2 + 1e-7)
    }
  }
}

class DupNgramsSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("cross-doc grams flag, within-doc repeats don't, short docs " +
      "report zero") {
    val boiler = "please subscribe to our newsletter today"  // 6 tokens
    val df = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"one two three four five six seven $boiler"),
      // 10 tokens = 6 grams, every gram unique to this doc, but the
      // SAME gram repeats within the doc via the doubled phrase
      (3L, "red green blue cyan red green blue cyan red green"),
      (4L, "too short here")
    ).toDF("doc_id", "text")
    val got = Contamination.corpusDupNgrams(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs 1, 2: boiler contributes 2 shared 5-grams ("please subscribe
    // to our newsletter", "subscribe to our newsletter today"); the
    // seam grams mix doc-specific prefixes and stay unique.
    // doc 1: 12 tokens -> 8 grams; doc 2: 13 tokens -> 9 grams
    assert(got(1L)._1 == 8L && got(1L)._2 == 2L)
    assert(got(2L)._1 == 9L && got(2L)._2 == 2L)
    assert(got(1L)._3 == 0.25 && got(2L)._3 == 0.222222)
    // doc 3: "red green blue cyan red" appears TWICE in the one doc —
    // instances repeat, but document frequency is 1, so nothing flags
    assert(got(3L) == ((6L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }
}

class ReviewHardeningSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("temperatureSample: a NULL stratum samples instead of vanishing") {
    val df = (Seq((1L, Option("a")), (2L, Option("a")), (3L, Option("a")),
      (4L, Option("a"))) ++
      Seq((10L, Option.empty[String]), (11L, Option.empty[String]),
        (12L, Option.empty[String]), (13L, Option.empty[String])))
      .toDF("doc_id", "source")
    val kept = Packing.temperatureSample(df, "source", "doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    // quota = ceil(sqrt(4)) = 2 for BOTH strata, including NULL
    assert(kept.count(_._2.contains("a")) == 2)
    assert(kept.count(_._2.isEmpty) == 2,
      s"NULL-stratum rows must be sampled, not dropped: ${kept.toSeq}")
  }

  test("contamination overlap: NULL-text documents stay in the output") {
    val corpus = Seq((1L, Option("alpha beta gamma delta")),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    val bench = Seq((9L, Option("alpha beta gamma delta")))
      .toDF("doc_id", "text")
    val got = Contamination.overlap(corpus, bench).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L), s"every doc must be kept: $got")
    assert(got(2L) == ((0L, 1L))) // one whole-"text" gram, zero hits
  }

  test("globalOrderIndex fails loud on a NULL id") {
    val df = Seq(Option(1L), Option(2L), Option.empty[Long]).toDF("doc_id")
    val e = intercept[Exception] {
      Packing.globalOrderIndex(df, "doc_id").collect()
    }
    assert(e.getMessage != null)
  }

  test("range join and as-of join reject colliding prefixed names") {
    val pts = Seq((1L, 5L, "x")).toDF("k", "pt", "right_s")
    val ivs = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, Seq("k"), "pt", "s", "e",
        binWidth = 4L)
    }
    assert(e1.getMessage.contains("right_s"))
    val left = Seq((1L, 5L, "x")).toDF("k", "ts", "right_v")
    val right = Seq((1L, 3L, "y")).toDF("k", "ts", "v")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right, Seq("k"), "ts")
    }
    assert(e2.getMessage.contains("right_v"))
  }

  test("range join rejects keyCols that swallow the bounds") {
    val pts = Seq((1L, 5L)).toDF("s", "pt")
    val ivs = Seq((1L, 0L, 10L)).toDF("s", "x", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, Seq("s"), "pt", "s", "e",
        binWidth = 4L)
    }
  }
}

class MinhashCollapseSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("exact-copy groups collapse before LSH, kept set unchanged") {
    // 30 exact copies of one text + a near-dup + an unrelated doc:
    // the pair stage must see ONE representative of the copy group
    // (the quadratic-bucket guard), and the kept set must be exactly
    // {min copy id, unrelated} — the near-dup clusters with the copies
    val copyText = "the quick brown fox jumps over the lazy dog today"
    val docs = ((1L to 30L).map(i => (i, copyText)) ++ Seq(
      (40L, "the quick brown fox jumps over the lazy cat today"),
      (50L, "completely different content about spark engines here")))
      .toDF("doc_id", "text")
    val kept = Dedup.minhashDedup(docs, numHashes = 32, bands = 16,
      threshold = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 50L), s"got $kept")
  }


  test("minhashDedupBest keeps the highest-quality copy, not min id; " +
      "singletons and NULL text survive") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, base, 10L),            // cluster, lowest quality
      (2L, base, 50L),            // cluster, HIGHEST quality -> kept
      (3L, base, 30L),            // cluster
      (4L, "totally different words entirely here now", 1L), // singleton
      (5L, null.asInstanceOf[String], 0L))                    // null text
      .toDF("doc_id", "text", "quality")
    val kept = graft.ops.Dedup.minhashDedupBest(df, "quality",
        numHashes = 32, bands = 16, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L), s"got $kept")
  }

  test("minhashDedupBest quality ties break to the lowest id") {
    import spark.implicits._
    val base = "one two three four five six seven eight nine"
    val df = Seq((7L, base, 5L), (3L, base, 5L), (9L, base, 5L))
      .toDF("doc_id", "text", "quality")
    val kept = graft.ops.Dedup.minhashDedupBest(df, "quality",
        numHashes = 32, bands = 16, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"got $kept")
  }

  test("NULL-text docs are never collapsed by minhashDedup") {
    val docs = Seq((1L, Option("alpha beta gamma delta epsilon zeta")),
      (2L, Option.empty[String]), (3L, Option.empty[String]),
      (4L, Option.empty[String])).toDF("doc_id", "text")
    val kept = Dedup.minhashDedup(docs, numHashes = 32, bands = 16,
      threshold = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L),
      s"null-text docs must all survive near-dedup: $kept")
  }

  test("copy of the MINIMUM id still keeps exactly one row") {
    val docs = Seq((7L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "alpha beta gamma delta epsilon zeta eta"),
      (9L, "unrelated words entirely disjoint token stream"))
      .toDF("doc_id", "text")
    val kept = Dedup.minhashDedup(docs, numHashes = 32, bands = 16,
      threshold = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 9L), s"got $kept")
  }
}

class MaterializePackedSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("bins concatenate their docs in id order with counts and totals") {
    val docs = Seq((1L, "aa bb cc"), (2L, "dd ee"), (3L, "ff gg hh ii"),
      (10L, "zz")).toDF("doc_id", "text")
    val sized = docs.select(col("doc_id"),
      lit(0L).as("shard"),
      graft.ops.TextAnalysis.tokenCount(col("text")).as("tokens"))
    // capacity 5: [1(3), 2(2)] fill bin 0; 3(4) -> bin 1; 10(1) joins 3
    val asg = Packing.packGreedy(sized, "doc_id", "tokens", "shard", 5)
    val out = Packing.materializePacked(docs, asg)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 5L, "aa bb cc dd ee"),
      (1L, 2L, 5L, "ff gg hh ii zz")), s"got ${out.toSeq}")
  }
}

class CharPairsSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("charPairs: adjacent 2-grams, short words empty") {
    val df = Seq("abcd", "ab", "a", "").toDF("w")
    val got = df.select(TextAnalysis.charPairs(col("w")).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("ab", "bc", "cd"))
    assert(got(1) == Seq("ab"))
    assert(got(2).isEmpty && got(3).isEmpty)
  }
}

class FunnelSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "us", "event_id", "ty")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("ty"))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.firstTouch(df, "user_id", "ts", "event_id", "ty",
        Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> (0 to 2).map(j =>
        if (r.isNullAt(j + 1)) None else Some(r.getLong(j + 1)))).toMap

  test("steps complete in order; out-of-order events don't count") {
    val df = ev(
      (1L, 100L, 1L, "b"),  // b BEFORE a: must not count
      (1L, 200L, 2L, "a"),
      (1L, 300L, 3L, "b"),
      (1L, 400L, 4L, "c"),
      (2L, 100L, 5L, "a"),  // stalls after a
      (2L, 200L, 6L, "c"))
    val got = run(df)
    assert(got(1L) == Seq(Some(200L), Some(300L), Some(400L)))
    assert(got(2L) == Seq(Some(100L), None, None))
  }

  test("an event advances at most one step; equal-ts uses event-id order") {
    // a and b at the SAME timestamp: b's event-id sorts after a, and b
    // evaluates against the state where a is already set (prior state
    // of the NEXT fold step), so ts >= t1 admits it
    val df = ev((1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"))
    assert(run(df)(1L) == Seq(Some(100L), Some(100L), None))
    // reversed ids: b folds first (unmatched), then a — funnel at a only
    val df2 = ev((2L, 100L, 2L, "a"), (2L, 100L, 1L, "b"))
    assert(run(df2)(2L) == Seq(Some(100L), None, None))
  }

  test("first touch wins: later repeats never move the time") {
    val df = ev((1L, 100L, 1L, "a"), (1L, 200L, 2L, "a"),
      (1L, 300L, 3L, "b"), (1L, 400L, 4L, "b"))
    assert(run(df)(1L) == Seq(Some(100L), Some(300L), None))
  }
}

class RetentionSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("weekly retention triangle: cohorts by first-event week") {
    // Mon 2024-01-01 and Mon 2024-01-08 are week starts
    val wk = 7L * 86400L * 1000000L
    val w0 = 1704067200000000L // 2024-01-01T00:00Z (a Monday)
    val df = Seq(
      (1L, w0 + 1000L),      // cohort w0
      (1L, w0 + wk + 5L),    // active week 1
      (1L, w0 + 3 * wk),     // active week 3
      (2L, w0 + 2L * 86400L * 1000000L), // cohort w0 (Wednesday)
      (2L, w0 + wk + 999L),  // active week 1
      (3L, w0 + wk + 7L)     // cohort w1 only
    ).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = Funnel.weeklyRetention(df, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (w0, 0L) -> 2L, (w0, 1L) -> 2L, (w0, 3L) -> 1L,
      (w0 + wk, 0L) -> 1L), s"got $got")
  }
}

class MmrSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("mmr skips the near-duplicate of the first pick") {
    val cand = Seq((1L, 1L, 100L), (1L, 2L, 90L), (1L, 3L, 80L))
      .toDF("qid", "nid", "rel")
    val sims = Seq(
      (1L, 1L, 2L, 200L), (1L, 2L, 1L, 200L),
      (1L, 1L, 3L, 0L), (1L, 3L, 1L, 0L),
      (1L, 2L, 3L, 0L), (1L, 3L, 2L, 0L))
      .toDF("qid", "a", "b", "sim")
    val got = Similarity.mmrDiversify(cand, sims, k = 3,
        lamNum = 1L, lamDen = 2L)
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // step1: doc 1 (score 1*100); step2: doc2 = 90-200 = -110 loses
    // to doc3 = 80-0; step3: doc2 at its penalized score
    assert(got(0) == ((1L, 1L, 100L)))
    assert(got(1) == ((2L, 3L, 80L)))
    assert(got(2) == ((3L, 2L, -110L)))
  }

  test("mmr: ties break by id, short pools stop early") {
    val cand = Seq((1L, 5L, 50L), (1L, 4L, 50L))
      .toDF("qid", "nid", "rel")
    val sims = Seq((1L, 4L, 5L, 0L), (1L, 5L, 4L, 0L))
      .toDF("qid", "a", "b", "sim")
    val got = Similarity.mmrDiversify(cand, sims, k = 5,
        lamNum = 1L, lamDen = 1L)
      .orderBy("step").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(4L, 5L), "tie -> lower id first; only 2 rows")
  }

  test("mmr: a missing sim pair throws instead of defaulting to 0") {
    val cand = Seq((1L, 1L, 100L), (1L, 2L, 90L), (1L, 3L, 80L))
      .toDF("qid", "nid", "rel")
    // only the (1,2)/(2,1) pair is covered — once doc 1 is selected,
    // scoring doc 3 must look up (3, 1) and fail fast
    val sims = Seq((1L, 1L, 2L, 200L), (1L, 2L, 1L, 200L))
      .toDF("qid", "a", "b", "sim")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.mmrDiversify(cand, sims, k = 3,
        lamNum = 1L, lamDen = 2L).collect()
    }
    def causes(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(causes(e).contains("missing the ordered pair"), causes(e))
  }

  test("mmr runs per query independently") {
    val cand = Seq((1L, 1L, 10L), (2L, 7L, 20L))
      .toDF("qid", "nid", "rel")
    val sims = Seq.empty[(Long, Long, Long, Long)]
      .toDF("qid", "a", "b", "sim")
    val got = Similarity.mmrDiversify(cand, sims, k = 2,
        lamNum = 1L, lamDen = 1L)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 1L), (2L, 1L, 7L)))
  }
}

class MixtureSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def docs = (1L to 12L).map { i =>
    (i, if (i <= 4) "A" else if (i <= 8) "B" else "C") }
    .toDF("doc_id", "source")

  test("hamilton apportionment hits exact per-stratum quotas") {
    // weights A:2 B:1 over totalN=5 -> base A=3 r=1, B=1 r=2;
    // leftover 1 seat -> B (larger remainder). C excluded.
    val got = Packing.mixtureSample(docs, "source", "doc_id",
      Map("A" -> 2L, "B" -> 1L), totalN = 5L)
    val counts = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("A" -> 3L, "B" -> 2L))
    val quotas = got.select("source", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quotas == Map("A" -> 3L, "B" -> 2L))
  }

  test("stratum smaller than its quota yields all it has") {
    val tiny = Seq((1L, "A"), (2L, "B")).toDF("doc_id", "source")
    val got = Packing.mixtureSample(tiny, "source", "doc_id",
      Map("A" -> 1L, "B" -> 1L), totalN = 10L)
    assert(got.count() == 2L)
  }

  test("remainder tie breaks by stratum name") {
    // weights A:1 B:1 totalN=3 -> base 1 each, r=1 each;
    // 1 leftover seat -> A (name order)
    val got = Packing.mixtureSample(docs, "source", "doc_id",
      Map("A" -> 1L, "B" -> 1L), totalN = 3L)
    val counts = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("A" -> 2L, "B" -> 1L))
  }

  test("budget sample: maximal hash-order prefix within budget") {
    val df = (1L to 6L).map(i => (i, "S", 10L)).toDF("doc_id", "source", "c")
    val got = Packing.budgetSample(df, "source", "doc_id", "c", 35L)
    assert(got.count() == 3L, "3 * 10 <= 35 < 4 * 10")
    assert(got.agg(max("cum_cost")).head.getLong(0) == 30L)
    // prefix property: kept set = first 3 docs in (md5, id) order
    val order = df.select(col("doc_id"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .collect().map(_.getLong(0)).take(3).toSet
    assert(got.collect().map(_.getLong(1)).toSet == order)
  }

  test("budget sample: zero budget keeps nothing, huge keeps all") {
    val df = Seq((1L, "S", 5L), (2L, "S", 6L)).toDF("doc_id", "source", "c")
    assert(Packing.budgetSample(df, "source", "doc_id", "c", 0L)
      .count() == 0L)
    assert(Packing.budgetSample(df, "source", "doc_id", "c", 100L)
      .count() == 2L)
  }

  test("samplers fail loud on NULL ids (md5 order would be " +
      "nondeterministic)") {
    val df = Seq((Option(1L), "S"), (Option.empty[Long], "S"))
      .toDF("doc_id", "source")
    val e = intercept[Exception] {
      Packing.stratifiedSample(df, "source", "doc_id", quota = 1)
        .collect()
    }
    assert(e.getMessage != null)
    val e2 = intercept[Exception] {
      Packing.budgetSample(df.withColumn("c", lit(1L)), "source",
        "doc_id", "c", 10L).collect()
    }
    assert(e2.getMessage != null)
  }

  test("BM25 ignores the empty token: empty docs index as dl 0 with " +
      "no postings, empty queries retrieve nothing") {
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val post = Retrieval.postings(docs).collect()
    assert(post.forall(_.getAs[String]("term").nonEmpty),
      s"no empty-term postings: ${post.toSeq}")
    assert(post.map(_.getAs[Long]("doc_id")).toSet == Set(1L),
      "empty/whitespace docs produce no postings")
    val (n, dl) = Retrieval.corpusStats(docs)
    assert(n == 3L && dl == 2L,
      s"empty docs count as dl 0, got ($n, $dl)")
    val hits = Retrieval.bm25TopK(docs,
      Seq((9L, "   ")).toDF("query_id", "query"), k = 5,
      qTextCol = "query").collect()
    assert(hits.isEmpty,
      s"an empty query must retrieve nothing: ${hits.toSeq}")
  }
}
