package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{
  AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Storage-partitioned joins: two graft tables with the same partition
  * layout join with ZERO shuffle exchanges — the scan reports
  * `KeyGroupedPartitioning`, per-file splits carry `HasPartitionKey`,
  * and (for transform layouts) the catalog's V2 functions let Spark
  * prove both sides cluster identically. At 100 TB this is the
  * difference between a fact-fact join that moves nothing and one that
  * re-shuffles both tables. */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withCatalog(tag: String)(f: (String, String) => Unit): Unit = {
    val dir = Files.createTempDirectory(s"graft-spj-$tag-").toString
    val name = s"gspj$tag"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    f(name, dir)
  }

  private def withConfs(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan)
    case s: ShuffleExchangeLike =>
      s +: s.children.flatMap(shuffles)
    case other => other.children.flatMap(shuffles) ++
      other.subqueries.flatMap(shuffles)
  }

  private def assertNoShuffle(df: DataFrame, rows: Long): Unit = {
    assert(df.count() == rows) // materialize so AQE finalizes the plan
    val found = shuffles(df.queryExecution.executedPlan)
    assert(found.isEmpty,
      s"expected a shuffle-free storage-partitioned join, got " +
        s"${found.size} exchange(s):\n${df.queryExecution.executedPlan}")
  }

  private val SpjConfs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    // no broadcast: force the join to actually use the reported layout
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("identity-partitioned tables join with zero shuffles") {
    withCatalog("id") { (c, _) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.l (k STRING, v BIGINT) " +
        "PARTITIONED BY (k)")
      spark.sql(s"CREATE TABLE $c.db.r (k STRING, w BIGINT) " +
        "PARTITIONED BY (k)")
      spark.sql(s"INSERT INTO $c.db.l SELECT " +
        "chr(97 + CAST(id % 5 AS INT)), id FROM range(1000)")
      spark.sql(s"INSERT INTO $c.db.r SELECT " +
        "chr(97 + CAST(id % 5 AS INT)), id * 10 FROM range(500)")

      val q = s"SELECT l.k, l.v, r.w FROM $c.db.l l " +
        s"JOIN $c.db.r r ON l.k = r.k"
      val expected = 1000L / 5 * (500L / 5) * 5 // 200*100 per key * 5
      withConfs(SpjConfs: _*) { assertNoShuffle(spark.sql(q), expected) }
      // parity: same result through the ordinary shuffle join
      withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        assert(spark.sql(q).count() == expected)
      }
    }
  }

  test("bucket-partitioned tables join with zero shuffles via V2 functions") {
    withCatalog("bkt") { (c, _) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.a (id BIGINT, v DOUBLE) " +
        "PARTITIONED BY (bucket(4, id))")
      spark.sql(s"CREATE TABLE $c.db.b (id BIGINT, w DOUBLE) " +
        "PARTITIONED BY (bucket(4, id))")
      spark.sql(s"INSERT INTO $c.db.a SELECT id, id * 1.5 FROM range(2000)")
      spark.sql(s"INSERT INTO $c.db.b SELECT id, id * 2.5 " +
        "FROM range(0, 2000, 2)") // even ids only
      val q = s"SELECT a.id, a.v, b.w FROM $c.db.a a " +
        s"JOIN $c.db.b b ON a.id = b.id"
      withConfs(SpjConfs: _*) { assertNoShuffle(spark.sql(q), 1000L) }
      withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        assert(spark.sql(q).count() == 1000L)
      }
    }
  }

  test("grouped aggregation over the partition key needs no shuffle") {
    withCatalog("agg") { (c, _) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (k STRING, v BIGINT) " +
        "PARTITIONED BY (k)")
      spark.sql(s"INSERT INTO $c.db.t SELECT " +
        "chr(97 + CAST(id % 4 AS INT)), id FROM range(400)")
      val q = s"SELECT k, sum(v) FROM $c.db.t GROUP BY k"
      withConfs(SpjConfs: _*) { assertNoShuffle(spark.sql(q), 4L) }
    }
  }

  test("V2 transform functions callable from SQL match the write path") {
    withCatalog("fn") { (c, _) =>
      import graft.spec.{IntType, StringType => GStringType, DateType => GDateType}
      import graft.spec.Transform
      import graft.table.Transforms

      val b = spark.sql(s"SELECT $c.system.bucket(4, 42)")
        .collect()(0).getInt(0)
      assert(Transforms.applyToValue(Transform.Bucket(4), 42, IntType)
        .contains(b))

      val bs = spark.sql(s"SELECT $c.system.bucket(16, 'hello')")
        .collect()(0).getInt(0)
      assert(Transforms.applyToValue(Transform.Bucket(16), "hello",
        GStringType).contains(bs))

      val m = spark.sql(
        s"SELECT $c.system.months(DATE'2024-03-15')").collect()(0).getInt(0)
      assert(m == (2024 - 1970) * 12 + 2)

      val tr = spark.sql(s"SELECT $c.system.truncate(10, 1234)")
        .collect()(0).getInt(0)
      assert(tr == 1230)

      val ts = spark.sql(s"SELECT $c.system.truncate(3, 'iceberg')")
        .collect()(0).getString(0)
      assert(ts == "ice")

      // null in → null out
      assert(spark.sql(s"SELECT $c.system.bucket(4, CAST(NULL AS INT))")
        .collect()(0).isNullAt(0))
    }
  }

  test("spec-evolved table falls back to the shuffle join correctly") {
    withCatalog("evo") { (c, _) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      // unpartitioned history → partition later: mixed-spec files must
      // NOT be grouped under the new layout
      spark.sql(s"CREATE TABLE $c.db.t (k STRING, v BIGINT)")
      spark.sql(s"INSERT INTO $c.db.t VALUES ('a', 1), ('b', 2)")
      spark.sql(s"CREATE TABLE $c.db.d (k STRING, w BIGINT) " +
        "PARTITIONED BY (k)")
      spark.sql(s"INSERT INTO $c.db.d VALUES ('a', 10), ('b', 20)")
      val q = s"SELECT t.k, t.v, d.w FROM $c.db.t t " +
        s"JOIN $c.db.d d ON t.k = d.k"
      withConfs(SpjConfs: _*) {
        // unpartitioned side reports Unknown → ordinary join; correct rows
        assert(spark.sql(q).count() == 2)
      }
    }
  }
}
