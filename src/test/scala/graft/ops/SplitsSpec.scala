package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class SplitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("no similarity edge ever crosses a split boundary") {
    // 200 docs: pairs (2k, 2k+1) are near-dups, plus a 5-clique
    val docs = spark.range(0, 200).select($"id".as("doc_id"))
    val pairEdges = spark.range(0, 100)
      .select(($"id" * 2).as("id_a"), ($"id" * 2 + 1).as("id_b"))
    val clique = spark.range(100, 105).toDF("a")
      .crossJoin(spark.range(100, 105).toDF("b"))
      .where($"a" < $"b").select($"a".as("id_a"), $"b".as("id_b"))
    val edges = pairEdges.unionByName(clique)
    val out = Splits.leakageSafeSplit(docs, edges)
    val crossing = out.as("x").join(edges,
        $"x.id" === $"id_a")
      .join(out.as("y"), $"y.id" === $"id_b")
      .where($"x.split" =!= $"y.split")
    assert(crossing.count() == 0L)
    assert(out.count() == 200L)
  }

  test("split proportions land near 90/5/5 over many components") {
    val docs = spark.range(0, 4000).select($"id".as("doc_id"))
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val byplit = Splits.leakageSafeSplit(docs, edges)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 4000.0
    assert(byplit("train") / n > 0.85 && byplit("train") / n < 0.94)
    assert(byplit("val") / n > 0.02 && byplit("val") / n < 0.09)
    assert(byplit("test") / n > 0.02 && byplit("test") / n < 0.09)
  }

  test("assignment is a pure function of the component label") {
    val a = Splits.splitOf(lit(42L))
    val df = spark.range(1).select(a.as("s1"), Splits.splitOf(lit(42L)).as("s2"))
    val r = df.head
    assert(r.getString(0) == r.getString(1))
  }
}
