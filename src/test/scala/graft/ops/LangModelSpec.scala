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
}
