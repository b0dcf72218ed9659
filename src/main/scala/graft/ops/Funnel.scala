package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-touch funnel analysis over an event stream — the product
  * question "how many users did A, then B, then C" that every event
  * pipeline answers (and the dataset-curation twin: which interaction
  * traces complete a full task trajectory).
  *
  * Scale design: ONE shuffle on the user key. Each user's events are
  * gathered and sorted once, then a single in-order fold advances the
  * step state — k self-joins (the naive formulation) would shuffle the
  * full event stream k times. Memory is bounded by events-per-user
  * (the same per-key-bounded assumption as sessionization); a
  * pathological single user with billions of events would need a
  * pre-filter to the step types, which the caller can apply.
  *
  * Determinism: events fold in (timestamp, event-id) order — a total
  * order — and each event is evaluated against the PRIOR state, so an
  * event advances at most one step. Integer microseconds end to end;
  * the e11 gate replays the identical recurrence in a DuckDB recursive
  * CTE and hash-matches every user's per-step completion times.
  */
object Funnel {

  /** Per-user first-completion time (µs) of each step, where step k
    * counts only at-or-after the first completion of step k-1. Output:
    * (user, s0_us .. s{k-1}_us), null where the funnel stalled. */
  def firstTouch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val k = steps.size
    def nullState = struct(
      steps.indices.map(j => lit(null).cast("long").as(s"t$j")): _*)
    val evs = sort_array(collect_list(struct(
      unix_micros(col(tsCol)).as("us"),
      col(idCol).as("eid"),
      col(typeCol).as("ty"))))
    val fold = (st: Column, e: Column) => struct(
      steps.indices.map { j =>
        val tj = st.getField(s"t$j")
        val gate =
          if (j == 0) lit(true)
          else st.getField(s"t${j - 1}").isNotNull &&
            e.getField("us") >= st.getField(s"t${j - 1}")
        when(tj.isNull && e.getField("ty") === steps(j) && gate,
          e.getField("us")).otherwise(tj).as(s"t$j")
      }: _*)
    events.groupBy(col(userCol))
      .agg(evs.as("__evs"))
      // fold ONCE into a state struct, then project the fields out —
      // extracting straight off the aggregate would re-run the whole
      // fold per output column (and the k references block project
      // collapse, so the state stays a bound attribute)
      .select(col(userCol),
        aggregate(col("__evs"), nullState, fold).as("__st"))
      .select(col(userCol) +:
        steps.indices.map(j =>
          col("__st").getField(s"t$j").as(s"s${j}_us")): _*)
  }

  private val WeekUs = 7L * 86400L * 1000000L

  /** Weekly retention cohorts: users grouped by the week of their
    * FIRST event; one output row per (cohort week, weeks since) with
    * the distinct-user count still active that week — the classic
    * retention triangle.
    *
    * Scale design: two aggregations on the user key share one shuffle
    * shape (first-event rollup; distinct user-weeks), then a user-key
    * join and a small (cohort, offset) rollup. Weeks are
    * `date_trunc('week', …)` (Monday-start in both Spark and DuckDB),
    * so the offset arithmetic is exact integer microseconds — e12
    * hash-gates the whole triangle. */
  def weeklyRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("__cw"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__w"))
      .distinct()
    active.join(first, userCol)
      .select(col(userCol), unix_micros(col("__cw")).as("cohort_us"),
        ((unix_micros(col("__w")) - unix_micros(col("__cw")))
          / lit(WeekUs)).cast("long").as("weeks_since"))
      .groupBy("cohort_us", "weeks_since")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
