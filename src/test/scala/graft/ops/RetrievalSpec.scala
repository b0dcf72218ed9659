package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark engine shuffles data across executors"),
    (2L, "spark spark spark spark spark"),
    (3L, "the quick brown fox jumps"),
    (4L, "data engine tuning guide"),
    (5L, "unrelated text entirely")).toDF("doc_id", "text")

  test("postings carry tf and dl per distinct term") {
    val p = Retrieval.postings(corpus).where($"doc_id" === 2L).collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getString(1) == "spark" && r.getLong(2) == 5L &&
      r.getLong(3) == 5L)
  }

  test("docs matching more query terms outrank single-term matches") {
    val q = Seq((10L, "data engine")).toDF("query_id", "query")
    val got = Retrieval.bm25TopK(corpus, q, k = 5)
      .orderBy("rank").collect().map(_.getLong(2))
    // doc 4 matches both terms; docs 1 match both too but longer dl;
    // every returned doc must contain at least one query term
    assert(got.toSet.subsetOf(Set(1L, 4L)))
    assert(got.head == 4L) // shorter doc, both terms -> top
  }

  test("tf saturation: keyword stuffing cannot dominate idf coverage") {
    val q = Seq((11L, "spark engine")).toDF("query_id", "query")
    val top = Retrieval.bm25TopK(corpus, q, k = 1).head.getLong(2)
    // doc 1 has both terms once; doc 2 has 'spark' five times.
    // BM25's tf saturation caps doc 2's advantage below two-term coverage.
    assert(top == 1L)
  }

  test("no-match queries return no rows; k bounds output") {
    val q = Seq((12L, "zzz qqq"), (13L, "spark")).toDF("query_id", "query")
    val got = Retrieval.bm25TopK(corpus, q, k = 2)
    assert(got.where($"query_id" === 12L).count() == 0L)
    assert(got.where($"query_id" === 13L).count() == 2L)
  }

  test("logIdf=true gives textbook scoring: same single-term ranking, " +
      "compressed idf spread") {
    val q = Seq((15L, "spark")).toDF("query_id", "query")
    val rational = Retrieval.bm25TopK(corpus, q, k = 5)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    val logged = Retrieval.bm25TopK(corpus, q, k = 5, logIdf = true)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    // idf is monotone in df under both forms -> single-term rankings match
    assert(rational == logged)
    // and ln(1+x) < x for all x > 0, so the log form scores lower
    val rs = Retrieval.bm25TopK(corpus, q, k = 1).head.getLong(3)
    val ls = Retrieval.bm25TopK(corpus, q, k = 1, logIdf = true)
      .head.getLong(3)
    assert(ls < rs, s"log-idf score $ls should be below rational $rs")
  }

  test("bm25FromIndex equals bm25TopK bit-for-bit, loads only query " +
      "terms' postings, filters bucket co-residents") {
    val post = Retrieval.postings(corpus)
    val (nDocs, totalDl) = Retrieval.corpusStats(corpus)
    assert(nDocs == 5L && totalDl == corpus
      .select(sum(size(split(lower($"text"), " ")))).head.getLong(0))
    val q = Seq((20L, "spark engine"), (21L, "data")).toDF(
      "query_id", "query")
    var asked: Seq[String] = Nil
    val indexed = Retrieval.bm25FromIndex(
      terms => {
        asked = terms
        // a real bucket read returns co-residents: simulate by
        // returning the requested terms PLUS an unrelated term's rows
        post.where($"term".isin(terms :+ "fox": _*))
      }, q, nDocs, totalDl, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(asked.sorted == Seq("data", "engine", "spark"))
    val full = Retrieval.bm25TopK(corpus, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(indexed == full, s"indexed=$indexed full=$full")
    // the co-resident 'fox' rows must not leak doc 3 into any result
    assert(!indexed.exists(_._3 == 3L))
  }

  test("bm25FromIndex logIdf variant equals bm25TopK logIdf") {
    val post = Retrieval.postings(corpus)
    val (nDocs, totalDl) = Retrieval.corpusStats(corpus)
    val q = Seq((30L, "spark engine data")).toDF("query_id", "query")
    val indexed = Retrieval.bm25FromIndex(
      terms => post.where($"term".isin(terms: _*)),
      q, nDocs, totalDl, k = 5, logIdf = true)
      .collect().map(_.toSeq).toSet
    val full = Retrieval.bm25TopK(corpus, q, k = 5, logIdf = true)
      .collect().map(_.toSeq).toSet
    assert(indexed == full)
  }

  test("corpus stats count NULL-text docs, additive across batches") {
    val withNull = corpus.unionByName(
      Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val (n, dl) = Retrieval.corpusStats(withNull)
    val (n0, dl0) = Retrieval.corpusStats(corpus)
    assert(n == n0 + 1 && dl == dl0, "NULL text: +1 doc, +0 tokens")
  }

  test("corpus postings are not shuffled for scoring (broadcast join)") {
    val q = Seq((14L, "spark engine")).toDF("query_id", "query")
    val plan = Retrieval.bm25TopK(corpus, q, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("rrfFuse: doc present in both lists beats single-list docs") {
    val R = Retrieval.RrfScale
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 10L, 3L), (1L, 12L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 10: 1/(60+1) + 1/(60+3); doc 12: 1/61; doc 11: 1/62
    assert(got(0) == ((10L, R / 61 + R / 63, 2L)))
    assert(got(1) == ((12L, R / 61, 1L)))
    assert(got(2) == ((11L, R / 62, 1L)))
  }

  test("rrfFuse: per-query top-k cut and id tie-break") {
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L), (2L, 200L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 101L, 1L), (1L, 100L, 2L), (2L, 201L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 1)
      .orderBy("query_id").collect()
    // q1: both docs score 1/61 + 1/62 -> tie broken by lower doc_id
    assert(got.length == 2)
    assert(got(0).getLong(2) == 100L && got(0).getLong(1) == 1L)
    assert(got(1).getLong(0) == 2L && got(1).getLong(2) == 200L)
  }

  // ------- r22 scale guards: results identical on the fallback paths

  test("combineFirst fallback (> SharedExchangeMaxTermsPerQuery terms " +
      "per query) scores exactly like the shared-exchange shape") {
    // 70 distinct terms (68 absent from the corpus) trip the two-
    // exchange fallback; absent terms never join a posting, so the
    // result must equal the 2-term query's bit-for-bit
    val extra = (0 until 68).map(i => s"zz$i").mkString(" ")
    val wide = Seq((30L, s"spark engine $extra")).toDF("query_id", "query")
    val narrow = Seq((30L, "spark engine")).toDF("query_id", "query")
    assert(Retrieval.SharedExchangeMaxTermsPerQuery < 70)
    val got = Retrieval.bm25TopK(corpus, wide, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val want = Retrieval.bm25TopK(corpus, narrow, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want, s"fallback diverged: $got vs $want")
  }

  test("semi-join term filter (> InFilterMaxTerms distinct terms) " +
      "filters exactly like the literal In") {
    val n = Retrieval.InFilterMaxTerms + 5
    val wide = spark.range(1).select(lit(31L).as("query_id"),
      expr(s"concat('spark engine ', concat_ws(' ', " +
        s"transform(sequence(0, $n), i -> concat('zz', i))))").as("query"))
    val narrow = Seq((31L, "spark engine")).toDF("query_id", "query")
    val got = Retrieval.bm25TopK(corpus, wide, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val want = Retrieval.bm25TopK(corpus, narrow, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want, s"semi-join filter diverged: $got vs $want")
  }

  test("one-regex tokenizer is token-identical to normalize-then-split " +
      "on every whitespace shape (r22 equivalence property)") {
    val rnd = new scala.util.Random(42)
    val ws = " \t\n\r\f"
    val alpha = "abXY09"
    val fuzz = (0 until 300).map { _ =>
      (0 until rnd.nextInt(30)).map { _ =>
        val pool = if (rnd.nextBoolean()) ws else alpha
        pool(rnd.nextInt(pool.length))
      }.mkString
    }
    val edge = Seq("", " ", "\t", "\n x ", " a  b\tc\nd ", "x y",
      "a \r\n b ", null)
    val df = (fuzz ++ edge).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val newToks = array_remove(split(lower($"text"), "\\s+"), "")
    val oldToks = array_remove(
      split(TextAnalysis.normalized($"text"), " "), "")
    val diff = df.where(!(newToks <=> oldToks))
    assert(diff.count() == 0,
      s"tokenizer forms diverged on: ${diff.collect().mkString(", ")}")
  }

  test("MaxQueryTermRows cap: an oversized query batch fails fast " +
      "instead of collecting to the driver") {
    // 1100 queries x 1000 distinct terms = 1.1M (query, term) pairs
    val big = spark.range(1100).select(col("id").as("query_id"),
      expr("concat_ws(' ', transform(sequence(0, 999), " +
        "i -> concat('t', id * 1000 + i)))").as("query"))
    val e = intercept[IllegalArgumentException](
      Retrieval.bm25TopK(corpus, big, k = 1).collect())
    assert(e.getMessage.contains("MaxQueryTermRows"),
      s"unexpected message: ${e.getMessage}")
  }
}
