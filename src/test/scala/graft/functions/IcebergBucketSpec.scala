package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.spec.{LongType => ILong, StringType => IString}
import graft.table.Transforms

class IcebergBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("expression agrees with the scalar kernel used by the pruner") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
      .withColumn("b", IcebergFunctions.icebergBucket(col("id"), 8))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (1L to 200L).foreach { v =>
      val expected = Transforms.applyToValue(
        graft.spec.Transform.Bucket(8), v, ILong).get
      assert(got(v) == expected, s"id $v")
    }
  }

  test("string and timestamp bucketing agree with scalar evaluation") {
    import spark.implicits._
    val strs = Seq("alpha", "beta", "γamma-unicode", "")
    val df = strs.toDF("s")
      .withColumn("b", IcebergFunctions.icebergBucket(col("s"), 16))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    strs.foreach { s =>
      val expected = Transforms.applyToValue(
        graft.spec.Transform.Bucket(16), s, IString).get
      assert(got(s) == expected, s"string '$s'")
    }
  }

  test("nulls propagate, not crash") {
    import spark.implicits._
    val df = Seq(Some(1L), None).toDF("id")
      .withColumn("b", IcebergFunctions.icebergBucket(col("id"), 4))
    val rows = df.collect()
    assert(rows.exists(r => !r.isNullAt(1)))
    assert(rows.exists(r => r.isNullAt(1)))
  }

  test("SQL registration: iceberg_bucket(col, n)") {
    IcebergFunctions.register(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("bkt_test")
    val viaSql = spark.sql(
      "SELECT id, iceberg_bucket(id, 8) AS b FROM bkt_test ORDER BY id")
      .collect().map(_.getInt(1)).toSeq
    val viaCol = Seq(1L, 2L, 3L).toDF("id")
      .withColumn("b", IcebergFunctions.icebergBucket(col("id"), 8))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(viaSql == viaCol)
  }

  test("stays inside WholeStageCodegen (no UDF fallback)") {
    // spark.range produces a real physical plan (a local Seq would be
    // constant-folded into LocalTableScan before codegen)
    val df = spark.range(1000)
      .withColumn("b", IcebergFunctions.icebergBucket(col("id"), 8))
      .where(col("b") === 1)
    val plan = df.queryExecution.executedPlan.toString
    // '*' prefixes mark operators fused into a WholeStageCodegen stage;
    // both the Filter and Project carrying iceberg_bucket must have it
    assert(plan.linesIterator.filter(_.contains("iceberg_bucket"))
      .forall(_.contains("*(")), s"bucket not codegen-fused:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"),
      s"bucket must not fall back to UDF evaluation:\n$plan")
  }
}
