package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("qlog is the exact fixed-point log2 (scalar and expr agree)") {
    assert(Unigram.qlog(1L) == 0L)
    assert(Unigram.qlog(2L) == 16L)
    assert(Unigram.qlog(1024L) == 160L)
    assert(Unigram.qlog(3L) == 24L) // 16 + (48 >> 1) - 16
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 12345L, 1L << 40)
    val viaExpr = xs.toDF("cnt")
      .select(Unigram.qlogExpr("cnt")).collect().map(_.getLong(0))
    assert(viaExpr.toSeq == xs.map(Unigram.qlog))
    // monotone
    assert(xs.map(Unigram.qlog) == xs.map(Unigram.qlog).sorted)
  }

  test("pieceCounts weights substrings by word frequency and position") {
    val wc = Seq(("aba", 2L), ("ba", 3L)).toDF("word", "cnt")
    val got = Unigram.pieceCounts(wc, maxPieceLen = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'a': two positions in aba (2·2) + one in ba (3) = 7;
    // 'b': 2 + 3; 'ab': once in aba (2); 'ba': in aba AND ba (2+3)
    assert(got == Map("a" -> 7L, "b" -> 5L, "ab" -> 2L, "ba" -> 5L))
  }

  test("vocab keeps all singles plus top-V multis by (cnt, piece)") {
    val df = Seq((1L, "abc abc abd")).toDF("doc_id", "text")
    val (vocab, qlogT) = Unigram.trainVocab(df, vocabSize = 2,
      maxPieceLen = 3)
    val pieces = vocab.collect().map(_.getString(0)).toSet
    assert(Set("a", "b", "c", "d").subsetOf(pieces))
    assert(pieces.count(_.length > 1) == 2)
    // 'ab' appears 3x (top); 'bc' 2x beats 'abc' 2x? tie -> 'abc' asc
    assert(pieces.contains("ab"))
    assert(qlogT > 0L, "qlogT positive for a non-trivial corpus")
  }

  test("viterbi prefers the globally optimal split over greedy") {
    // vocab: 'ab' w=10, 'bc' w=100, chars w=1 -> "abc" best is a|bc
    // (1+100) though greedy-longest-from-left would take ab|c (10+1)
    val vocab = Seq(("ab", 0L, 10L), ("bc", 0L, 100L), ("a", 0L, 1L),
      ("b", 0L, 1L), ("c", 0L, 1L)).toDF("piece", "cnt", "weight")
    val got = Unigram.segmentWords(Seq("abc").toDF("word"), vocab,
      qlogT = 5L).head
    assert(got.getSeq[String](1) == Seq("a", "bc"))
    assert(got.getLong(2) == 101L)
  }

  test("score ties break to the lexicographically smallest sequence") {
    val vocab = Seq(("ab", 0L, 2L), ("a", 0L, 1L), ("b", 0L, 1L))
      .toDF("piece", "cnt", "weight")
    // "ab": ab (2) vs a|b (2) tie -> ['a','b'] < ['ab']
    val got = Unigram.segmentWords(Seq("ab").toDF("word"), vocab,
      qlogT = 5L).head
    assert(got.getSeq[String](1) == Seq("a", "b"))
  }

  test("unseen characters fall back to single pieces at -qlogT") {
    val vocab = Seq(("a", 0L, 7L)).toDF("piece", "cnt", "weight")
    val got = Unigram.segmentWords(Seq("axa").toDF("word"), vocab,
      qlogT = 3L).head
    assert(got.getSeq[String](1) == Seq("a", "x", "a"))
    assert(got.getLong(2) == 7L - 3L + 7L)
  }

  test("tokenize reassembles pieces in word order; empty docs kept") {
    val df = Seq((1L, "ab ba"), (2L, "---"), (3L, null
      .asInstanceOf[String])).toDF("doc_id", "text")
    val (vocab, qlogT) = Unigram.trainVocab(df, vocabSize = 1,
      maxPieceLen = 2)
    val got = Unigram.tokenize(df, vocab, qlogT).orderBy("doc_id")
      .collect()
    assert(got(0).getSeq[String](1).mkString(" ").nonEmpty)
    assert(got(1).getSeq[String](1).isEmpty &&
      got(1).getLong(2) == 0L)
    assert(got(2).getSeq[String](1).isEmpty)
    // token concatenation reconstructs the original words in order
    assert(got(0).getSeq[String](1).mkString == "abba")
  }
}
