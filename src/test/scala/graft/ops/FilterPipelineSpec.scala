package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class FilterPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("funnel counts are cumulative in stage order") {
    val df = Seq((1L, true, true), (2L, true, false), (3L, false, true))
      .toDF("id", "a", "b")
    val got = FilterPipeline.funnel(df,
        Seq("a" -> $"a", "b" -> $"b"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, "total", 3L), (1L, "a", 2L),
      (2L, "b", 1L))) // row 3 passes b but already fell at a
  }

  test("null predicate values reject like a WHERE") {
    val df = Seq((1L, Some(true)), (2L, None), (3L, Some(false)))
      .toDF("id", "a")
    val got = FilterPipeline.funnel(df, Seq("a" -> $"a"))
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(3L, 1L))
  }

  test("empty corpus reports 0 at every stage, never null") {
    val df = Seq.empty[(Long, Boolean)].toDF("id", "a")
    val got = FilterPipeline.funnel(df, Seq("a" -> $"a"))
      .orderBy("stage_idx").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("total", 0L), ("a", 0L)))
  }

  test("awkward stage names are fine; duplicates are rejected") {
    val df = Seq((1L, true)).toDF("id", "a")
    val got = FilterPipeline.funnel(df,
        Seq("total" -> $"a", "pass.1" -> $"a"))
      .orderBy("stage_idx").collect().map(_.getString(1))
    assert(got.toSeq == Seq("total", "total", "pass.1"))
    intercept[IllegalArgumentException] {
      FilterPipeline.funnel(df, Seq("x" -> $"a", "x" -> $"a"))
    }
  }

  test("single scan: the funnel plans one aggregate, no joins/unions") {
    val df = Seq((1L, true)).toDF("id", "a")
    val plan = FilterPipeline.funnel(df,
      Seq("a" -> $"a", "b" -> $"a", "c" -> $"a"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"),
      s"funnel must stay a single-pass aggregate:\n$plan")
  }
}
