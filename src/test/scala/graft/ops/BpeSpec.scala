package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("train learns the most frequent pair first, deterministic ties") {
    // "aaab" x3, "ab" x2: pairs -> (a a) 6, (a b) 5, (aa b)... after m1
    val df = Seq("aaab aaab aaab ab ab").toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 3)
    // m1: (a,a) c=6; dict: [aa,a,b]x3 [a,b]x2 -> pairs (aa a) 3, (a b) 5
    // m2: (a,b) c=5; dict: [aa,ab]x3 [ab]x2 -> (aa ab) 3
    // m3: (aa,ab)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("train tie-break picks the lexicographically smallest pair") {
    val df = Seq("xy", "ab").toDF("text") // (x y) and (a b) both count 1
    assert(Bpe.train(df, "text", numMerges = 1) == Seq(("a", "b")))
  }

  test("train stops early when no pairs remain") {
    val df = Seq("ab ab").toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 10)
    assert(merges == Seq(("a", "b"))) // one merge exhausts the dict
  }

  test("mergePair is greedy left-to-right: a-run merges floor(n/2)") {
    val out = Seq("aaaaa").toDF("w")
      .select(Bpe.mergePair(
        expr("regexp_extract_all(w, '.', 0)"), "a", "a").as("s"))
      .head.getSeq[String](0)
    assert(out == Seq("aa", "aa", "a"))
  }

  test("applyMerges tokenizes per word; merges never cross words") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val out = Seq("abc ab ba", "", "zzz").toDF("text")
      .select(Bpe.applyMerges(col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("abc", "ab", "b", "a"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("z", "z", "z"))
  }

  test("tokenizeByDict equals applyMerges on every doc") {
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"))
    val docs = Seq(
      (1L, "The other therapist gathered there"),
      (2L, "weather whether wether"),
      (3L, ""), (4L, null.asInstanceOf[String]), (5L, "!!! ???"))
      .toDF("doc_id", "text")
    val viaDict = Bpe.tokenizeByDict(docs, "text", "doc_id", merges)
      .orderBy("doc_id").collect().map(r => r.getSeq[String](1))
    val viaExpr = docs.select(col("doc_id"),
        coalesce(Bpe.applyMerges(col("text"), merges),
          array().cast("array<string>")).as("t"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(viaDict.toSeq == viaExpr.toSeq)
    // "other" = [o, th, e, r] after (t,h); (th,e) then fuses -> [o, the, r]
    assert(viaDict(0).take(4) == Seq("the", "o", "the", "r"))
  }

  test("trained merges round-trip: concatenated tokens respell the words") {
    val docs = Seq((1L, "recombination recombines recombinant"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    assert(merges.size == 6)
    val toks = Bpe.tokenizeByDict(docs, "text", "doc_id", merges)
      .head.getSeq[String](1)
    assert(toks.mkString == "recombinationrecombinesrecombinant")
  }
}
