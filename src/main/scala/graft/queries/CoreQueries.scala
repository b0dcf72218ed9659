package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Core relational query battery over the driver testdata.
  *
  * Determinism discipline (required for the DuckDB hash-compare oracle):
  *   - Monetary doubles in the testdata are 2-decimal values; per-row
  *     arithmetic over them is exact at <= 6 decimals. We cast per-row
  *     results to DecimalType BEFORE aggregating so sums are exact and
  *     order-independent, then cast the final aggregate back to DOUBLE.
  *     The oracle SQL does the identical cast dance, so both engines
  *     produce bit-identical doubles.
  *   - Every query ends in a total ORDER BY so row order is deterministic.
  *   - Every computed column is aliased identically in Spark and SQL.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` physical type varies by generator version:
    * TIMESTAMP(NANOS) (rejected by Spark's vectorized reader — read
    * ns-as-long and floor to the engine's native µs, SURVEY §1.2) or
    * TIMESTAMP(MICROS), which reads natively. Handle both so the same
    * query code runs against either vintage of the testdata. */
  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => // nanos surfaced as long by the legacy flag
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // normalize NTZ → session-tz timestamp so downstream schemas
        // (and the driver's oracle parquet dump) match the ns-vintage
        // path exactly; sessions run UTC, so this is metadata-only
        df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale))

  /** Exact decimal sum of a per-row expression, emitted as DOUBLE. */
  private def dsum(c: Column, scale: Int): Column =
    sum(dec(c, scale)).cast(DoubleType)

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1 pricing summary. Flagship aggregation: hash-agg with
    * partial (map-side) aggregation, 6k->4 groups; scales to 100 TB
    * because the pre-shuffle combine reduces each partition to ~4 rows. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Filter + projection + limit: the reference's whole read surface
    * (scan -> filter -> project -> limit, SURVEY S1/P1-P3). Predicate and
    * the 5-column projection both push into the parquet scan. */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 30 &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")
      .limit(1000)

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_quantity > 30 AND l_shipdate < TIMESTAMP '1997-01-01'
      |ORDER BY l_orderkey, l_linenumber
      |LIMIT 1000""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Top-k: orderBy+limit compiles to TakeOrderedAndProject — per
    * partition top-10 then a single driver merge; no full sort at scale. */
  def q3TopkOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val q3Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  /** 3-way join + agg. customer/orders scale with SF, so the broadcast
    * decision is left to Catalyst+AQE (auto-broadcasts under the
    * threshold, sort-merge above it) — a forced hint would OOM at
    * 100 TB. lineitem-orders co-shuffle on the order key. */
  def q4SegmentRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")
  }

  val q4Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q5
  /** TPC-H Q5-style 6-way star join. Only the BOUNDED dims (nation: 25
    * rows, region: 5) get explicit broadcast hints — supplier/customer/
    * orders grow with SF, so their strategy is Catalyst+AQE's call
    * (auto-broadcast under threshold, shuffle join at 100 TB). */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q6
  /** TPC-H Q6 forecast revenue: pure scan+filter+global agg; every
    * predicate pushes to parquet row-group stats. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
        count(lit(1)).as("n"))

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Calendar bucketing via date_trunc (maps the reference's year/month/
    * day/hour partition transforms, spec/partition.go:91-99, onto data). */
  def q7MonthlyOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("total_revenue"))
      .orderBy("order_month")

  val q7Sql: String =
    """SELECT date_trunc('month', o_orderdate) AS order_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q8
  def q8DistinctFlags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  val q8Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q9
  /** Window ranking: per-customer top-3 orders. One shuffle on the
    * partition key; rank ties broken by key for determinism. */
  def q9WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val q9Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) sub
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q10
  /** IN-list predicate (reference op In, table/expression.go:20). */
  def q10InBrands(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#7", "Brand#21") &&
        col("p_size").between(5, 25))
      .select("p_partkey", "p_name", "p_brand", "p_size")
      .orderBy("p_partkey")

  val q10Sql: String =
    """SELECT p_partkey, p_name, p_brand, p_size FROM part
      |WHERE p_brand IN ('Brand#1','Brand#7','Brand#21') AND p_size BETWEEN 5 AND 25
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** NULL handling (reference ops IsNull/NotNull; testdata has no nulls,
    * so nulls are synthesized with NULLIF — same expression both sides). */
  def q11NullHandling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("seg",
        when(col("c_mktsegment") === "BUILDING", lit(null).cast(StringType))
          .otherwise(col("c_mktsegment")))
      .groupBy(col("seg").isNull.as("seg_is_null"))
      .agg(count(lit(1)).as("n"),
        count(col("seg")).as("n_nonnull"),
        dsum(col("c_acctbal"), 2).as("bal"))
      .orderBy("seg_is_null")

  val q11Sql: String =
    """SELECT (seg IS NULL) AS seg_is_null, COUNT(*) AS n,
      |  COUNT(seg) AS n_nonnull,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM (SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
      |      FROM customer) sub
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Set ops: UNION (dedup) of key spaces. */
  def q12UnionKeys(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey").as("key"))
    val su = t(s, dir, "supplier").select(col("s_suppkey").as("key"))
    c.union(su).distinct().orderBy("key")
  }

  val q12Sql: String =
    """SELECT c_custkey AS key FROM customer
      |UNION SELECT s_suppkey AS key FROM supplier ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Event-time bucketing on the ns-timestamp events table (the batch
    * analog of a streaming tumbling-window aggregation). */
  def q13EventsHourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value"), 2).as("total_value"))
      .orderBy("event_type", "hour")

  val q13Sql: String =
    """SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q14
  /** StartsWith — the reference's only string function (F1,
    * table/expression.go:207-223). */
  def q14StartsWith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").startsWith("large"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"))
      .orderBy("p_brand")

  val q14Sql: String =
    """SELECT p_brand, COUNT(*) AS n FROM part
      |WHERE p_name LIKE 'large%' GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Between desugaring (reference P6: Gte AND Lte). */
  def q15Between(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_acctbal").between(1000.0, 2000.0))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  val q15Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_acctbal BETWEEN 1000.0 AND 2000.0 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Anti-join (NOT EXISTS): customers with no large orders. */
  def q16CustomersNoOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q16Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Semi-join (EXISTS): parts that appear in any lineitem. */
  def q17PartsOrdered(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val li = t(s, dir, "lineitem").select(col("l_partkey"))
    p.join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  val q17Sql: String =
    """SELECT p_brand, COUNT(*) AS n FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q18
  /** ROLLUP grouping sets (engine surplus over the reference's
    * aggregation-free surface — SURVEY §2.4). */
  def q18Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q18Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
      .stripMargin

  // ---------------------------------------------------------------- q19
  /** Scalar-function battery (engine surplus; the reference's only
    * string function is StartsWith — F1): case, substring, concat,
    * length, trim, abs, coalesce-driven null fill. */
  def q19ScalarFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
        length(col("c_name")).as("name_len"),
        abs(col("c_acctbal") - lit(5000.0)).as("bal_dist"),
        coalesce(
          when(col("c_acctbal") < 0, col("c_acctbal")),
          lit(0.0)).as("neg_bal"))
      .orderBy("c_custkey")

  val q19Sql: String =
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_upper,
      |  lower(c_name) AS name_lower,
      |  substring(c_name, 1, 8) AS name_prefix,
      |  concat_ws('|', c_mktsegment, c_name) AS tagged,
      |  CAST(length(c_name) AS INT) AS name_len,
      |  abs(c_acctbal - 5000.0) AS bal_dist,
      |  coalesce(CASE WHEN c_acctbal < 0 THEN c_acctbal END, 0.0) AS neg_bal
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Date/time function battery over order dates: extract fields,
    * date arithmetic, month boundaries. */
  def q20DateFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(lit("1998-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_98"))
      .orderBy("o_orderkey").limit(2000)

  val q20Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
      |    AS days_to_98
      |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_topk_orders" -> (q3TopkOrders _),
    "q4_segment_revenue" -> (q4SegmentRevenue _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_monthly_orders" -> (q7MonthlyOrders _),
    "q8_distinct_flags" -> (q8DistinctFlags _),
    "q9_window_rank" -> (q9WindowRank _),
    "q10_in_brands" -> (q10InBrands _),
    "q11_null_handling" -> (q11NullHandling _),
    "q12_union_keys" -> (q12UnionKeys _),
    "q13_events_hourly" -> (q13EventsHourly _),
    "q14_startswith" -> (q14StartsWith _),
    "q15_between" -> (q15Between _),
    "q16_customers_no_orders" -> (q16CustomersNoOrders _),
    "q17_parts_ordered" -> (q17PartsOrdered _),
    "q18_rollup" -> (q18Rollup _),
    "q19_scalar_functions" -> (q19ScalarFunctions _),
    "q20_date_functions" -> (q20DateFunctions _),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_topk_orders" -> q3Sql,
    "q4_segment_revenue" -> q4Sql,
    "q5_nation_revenue" -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q7_monthly_orders" -> q7Sql,
    "q8_distinct_flags" -> q8Sql,
    "q9_window_rank" -> q9Sql,
    "q10_in_brands" -> q10Sql,
    "q11_null_handling" -> q11Sql,
    "q12_union_keys" -> q12Sql,
    "q13_events_hourly" -> q13Sql,
    "q14_startswith" -> q14Sql,
    "q15_between" -> q15Sql,
    "q16_customers_no_orders" -> q16Sql,
    "q17_parts_ordered" -> q17Sql,
    "q18_rollup" -> q18Sql,
    "q19_scalar_functions" -> q19Sql,
    "q20_date_functions" -> q20Sql,
  )
}
