package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("corpus-duplicated lines stripped everywhere, unique lines kept") {
    val df = Seq(
      (1L, "unique alpha\nSHARED BANNER\nbody one"),
      (2L, "unique beta\nshared   banner\nbody two"),
      (3L, "unique gamma\nshared banner")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // banner matches across case/whitespace via the normalized fp
    assert(out(0) == ((1L, "unique alpha\nbody one", 2L, 1L)))
    assert(out(1) == ((2L, "unique beta\nbody two", 2L, 1L)))
    assert(out(2) == ((3L, "unique gamma", 1L, 1L)))
  }

  test("maxOccurrences threshold: duplicates at or below it survive") {
    val df = Seq(
      (1L, "twice\nthrice"), (2L, "twice\nthrice"), (3L, "thrice"))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, maxOccurrences = 2L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "twice", 2L -> "twice", 3L -> ""))
  }

  test("short lines exempt; null text treated as one empty kept line") {
    val df = Seq(
      (1L, "a\n\nkeep one"), (2L, "a\n\nkeep two"), (3L, null))
      .toDF("doc_id", "text")
    // "" (empty) repeats but is under minLineChars=1 -> kept;
    // "a" repeats at length 1 -> banned at the default threshold
    val out = LineDedup.dedupLines(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((1L, "\nkeep one", 2L)))
    assert(out(1) == ((2L, "\nkeep two", 2L)))
    assert(out(2) == ((3L, "", 1L)))
  }

  test("user columns named like working columns don't collide") {
    val df = Seq((1L, "x\ndup", "v"), (2L, "y\ndup", "w"))
      .toDF("doc_id", "text", "__graft_fp0")
    val out = LineDedup.dedupLines(df).orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("x", "y"))
  }

  test("line order preserved on rebuild across many lines") {
    val text = (0 until 50).map(i => s"line $i").mkString("\n")
    val df = Seq((1L, text + "\ndup"), (2L, "dup")).toDF("doc_id", "text")
    val got = LineDedup.dedupLines(df).where($"doc_id" === 1L)
      .head.getString(1)
    assert(got == text)
  }
}
