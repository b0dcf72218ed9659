package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("docs resembling the target outweigh unrelated docs") {
    val source = Seq(
      (1L, "neural nets learn representations from data"),
      (2L, "neural nets learn features from examples"),
      (3L, "recipe for sourdough bread with yeast")).toDF("doc_id", "text")
    val target = Seq((100L, "neural nets learn representations"))
      .toDF("doc_id", "text")
    val got = Importance.importanceWeights(source, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) > got(3L) && got(2L) > got(3L),
      s"target-like docs must score higher: $got")
    assert(got(1L) > got(2L),
      "more shared bigrams -> higher weight")
  }

  test("docs with no bigrams keep a zero-score row") {
    val source = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val got = Importance.importanceWeights(source, target)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == ((1L, 0L, 0L)))
    assert(got(1)._2 == 1L && got(1)._3 > 0L)
  }

  test("the weight model broadcasts (corpus never feature-shuffled " +
      "for scoring)") {
    val source = Seq((1L, "x y z")).toDF("doc_id", "text")
    val target = Seq((9L, "x y")).toDF("doc_id", "text")
    val plan = Importance.importanceWeights(source, target)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"model must broadcast:\n$plan")
  }
}
