package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the standard clickstream rollup
  * (assign every event to a session that ends after `gap` of user
  * inactivity), complementing the streaming state-machine flavor in
  * [[graft.streaming.Streams.sessionize]].
  *
  * Scale design: ONE shuffle, by the user key — both window passes
  * (the lag that detects gaps and the running sum that numbers the
  * sessions) share the identical `partitionBy(userCol)` ordering, so
  * Catalyst plans a single Exchange and two adjacent Window nodes over
  * it. No driver-side state, no joins; per-user event streams can be
  * arbitrarily many, but each user's history must fit a task's window
  * buffer — the same bound every window-function sessionization has,
  * and far below task memory for any real clickstream (a 10M-event
  * user is 100 MB). Skewed mega-users would salt by day first.
  *
  * Determinism: events are ordered by (ts, tiebreaker), so equal
  * timestamps cannot reorder across runs — what lets e6 hash-gate this
  * against DuckDB running the identical window recurrence.
  */
object Sessionize {

  /** Adds a 0-based `session_idx` per `userCol`: a new session starts
    * at the first event and whenever the time since the previous event
    * exceeds `gap`. `tieCol` breaks equal-timestamp ordering (pass the
    * event id); `gap` compares microsecond differences exactly —
    * integer arithmetic, engine-portable. */
  def withSessionIdx(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gap: Column): DataFrame = {
    // A NULL-timestamp event cannot be placed on a timeline, and the
    // two engines would place it DIFFERENTLY (Spark windows order
    // NULLS FIRST, DuckDB NULLS LAST — one fabricates a NaN session,
    // the other silently merges the event into whichever session
    // happens to be last): excluded by contract, pinned by the
    // planted-parity harness. NULL users are a valid group (all
    // anonymous events sessionize together on both engines).
    val timed = events.where(col(tsCol).isNotNull)
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(unix_micros(col(tsCol)), 1).over(order)
    val isBreak = when(prevTs.isNull, 1L)
      .when(unix_micros(col(tsCol)) - prevTs > gap, 1L)
      .otherwise(0L)
    timed.withColumn("session_idx", sum(isBreak).over(run) - 1L)
  }

  /** Per-session rollup: event count, first/last event micros, span.
    * The downstream shape a funnel / engagement pipeline consumes. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gap: Column): DataFrame =
    withSessionIdx(events, userCol, tsCol, tieCol, gap)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"))
      .withColumn("span_us", col("end_us") - col("start_us"))
}
