package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tokens(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("cross-document repeat flagged in the copy, not the original") {
    val shared = tokens("s", 6)
    val df = Seq(
      (1L, tokens("a", 10) + " " + shared),
      (2L, tokens("b", 10) + " " + shared),
      (3L, tokens("c", 16))).toDF("doc_id", "text")
    val got = ExactSubstr.dupPassages(df, window = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 holds the canonical first occurrence; only doc 2 flagged,
    // spanning exactly the shared passage (tokens 10..16)
    assert(got.toSeq == Seq((2L, 10L, 16L)))
  }

  test("audit mode (keepFirst = false) flags every occurrence") {
    val shared = tokens("s", 5)
    val df = Seq(
      (1L, shared + " " + tokens("a", 5)),
      (2L, shared + " " + tokens("b", 5))).toDF("doc_id", "text")
    val got = ExactSubstr.dupPassages(df, window = 5, keepFirst = false)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("within-document repeat merges into one maximal span") {
    val p = tokens("p", 5)
    // p0..p4 twice back-to-back: second occurrence + straddle windows
    // merge into ONE span covering tokens 5..15
    val df = Seq((1L, tokens("x", 5) + " " + p + " " + p),
      (2L, p)).toDF("doc_id", "text")
    val spans = ExactSubstr.dupPassages(df, window = 5)
      .where($"doc_id" === 1L).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.length == 1)
    val (s, e) = spans.head
    assert(s >= 5L && e == 15L, s"span [$s, $e)")
  }

  test("short documents and clean documents emit nothing") {
    val df = Seq((1L, "too short"), (2L, tokens("u", 30)))
      .toDF("doc_id", "text")
    assert(ExactSubstr.dupPassages(df, window = 5).count() == 0L)
  }

  test("removal keeps the canonical copy, cuts the rest, rebuilds in " +
      "order; null text reads as empty") {
    val shared = tokens("s", 6)
    val df = Seq(
      (1L, tokens("a", 6) + " " + shared),
      (2L, tokens("b", 3) + " " + shared + " " + tokens("c", 3)),
      (3L, null)).toDF("doc_id", "text")
    val got = ExactSubstr.removeDupPassages(df, window = 6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((1L, tokens("a", 6) + " " + shared, 12L, 0L)))
    assert(got(1) == ((2L, tokens("b", 3) + " " + tokens("c", 3), 12L, 6L)))
    // blank doc: n_tokens 0 by the TextAnalysis.tokenCount contract
    // (was 1 — the raw [""] split arity — before the round-15 fix)
    assert(got(2) == ((3L, "", 0L, 0L)))
  }

  test("dupStats accounts duplicated tokens per doc, keeps clean docs") {
    val shared = tokens("s", 6)
    val df = Seq(
      (1L, shared + " " + tokens("a", 6)),
      (2L, shared + " " + tokens("b", 6)),
      (3L, tokens("c", 12))).toDF("doc_id", "text")
    val got = ExactSubstr.dupStats(df, window = 6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((1L, 12L, 0L, 0.0))) // canonical owner stays clean
    assert(got(1) == ((2L, 12L, 6L, 0.5)))
    assert(got(2) == ((3L, 12L, 0L, 0.0)))
  }
}
