package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bigram counts pool across documents on normalized tokens") {
    val df = Seq((1L, "the cat sat"), (2L, "THE  CAT ran"))
      .toDF("doc_id", "text")
    val got = LangModel.bigramCounts(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the cat" -> 2L, "cat sat" -> 1L, "cat ran" -> 1L))
  }

  test("surprise: hapax pairs score SCALE, repeated pairs SCALE/2") {
    val df = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    // counts: "a b" -> 2, "b c" -> 1
    val got = LangModel.bigramSurprise(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((1L, 2L, 1L, LangModel.Scale / 2 + LangModel.Scale)))
    assert(got(1) == ((2L, 1L, 0L, LangModel.Scale / 2)))
  }

  test("documents with fewer than two tokens keep a zero-score row") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val got = LangModel.bigramSurprise(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got(0) == ((1L, 0L, 0.0)))
    assert(got(1) == ((2L, 0L, 0.0)))
    assert(got(2)._2 == 1L)
  }

  test("mean surprise is 1/count-averaged: all-hapax doc scores 1.0") {
    val df = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val m = LangModel.bigramSurprise(df).head.getDouble(4)
    assert(m == 1.0)
  }

  test("trigram backoff walks tri -> bigram -> unigram -> OOV levels") {
    val P = LangModel.ProbScale
    // train = doc 2 only: tokens a b c d
    //   trigrams (a,b,c) (b,c,d); bigrams ab bc cd; unigrams a b c d
    val df = Seq((1L, "a b c c d"), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val got = LangModel.trigramBackoff(df, col("doc_id") % 2 === 0)
      .orderBy("doc_id").collect()
    // held-out doc 1 trigrams: (a,b,c) tri-hit p = P*1 div 1;
    // (b,c,c): no tri, no bigram (c,c), unigram c -> 4P div (25*4);
    // (c,c,d): no tri, bigram (c,d) n=1 ctx c n=1 -> 2P div 5
    val r1 = got(0)
    assert(r1.getLong(1) == 3L, "n_trigrams")
    assert((r1.getLong(2), r1.getLong(3), r1.getLong(4),
      r1.getLong(5)) == ((1L, 1L, 1L, 0L)), "levels tri/bg/ug/oov")
    assert(r1.getLong(6) ==
      P + (2L * P) / 5L + (4L * P) / (25L * 4L), "prob_scaled")
    // train doc 2 scores itself: both trigrams hit, p = P each
    val r2 = got(1)
    assert(r2.getLong(2) == 2L && r2.getLong(6) == 2L * P)
  }

  test("trigram backoff: OOV words and short docs") {
    val df = Seq((1L, "x y z"), (2L, "a b c d"), (3L, "hi"))
      .toDF("doc_id", "text")
    val got = LangModel.trigramBackoff(df, col("doc_id") % 2 === 0)
      .orderBy("doc_id").collect()
    assert(got(0).getLong(5) == 1L && got(0).getLong(6) == 0L,
      "all-OOV trigram scores zero")
    assert(got(2).getLong(1) == 0L && got(2).getDouble(7) == 0.0,
      "short doc keeps a zero row")
  }

  test("lmFilter keeps docs at/above the rational cutoff only") {
    // train doc 2 "a b c d"; doc 4 repeats it -> perfect score P;
    // doc 1 is all-OOV -> 0; cutoff 1/2
    val df = Seq((1L, "x y z w"), (2L, "a b c d"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val got = LangModel.lmFilter(df, col("doc_id") % 2 === 0, 1L, 2L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> false, 2L -> true, 4L -> true))
  }
}
