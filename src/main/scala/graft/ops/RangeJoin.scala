package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second canonical operator Spark lacks
  * natively (alongside [[AsOf]]): match point rows to interval rows
  * with `point BETWEEN start AND end` on a shared key.
  *
  * Built by COMPOSITION (the brief's preference order (a)) as a BINNED
  * range join: both sides are bucketed into fixed-width bins of the
  * point domain — a point lands in exactly one bin, an interval is
  * exploded to every bin it covers — and the inequality becomes an
  * EQUI-join on (key, bin) plus a cheap residual filter. Spark plans
  * that as an ordinary shuffled hash/sort-merge join, so 100 TB
  * behaves like any other equi-join; the naive `p.ts BETWEEN s AND e`
  * theta-join would plan as BroadcastNestedLoop and die at scale.
  *
  * Each (point, interval) pair meets exactly once (the point's bin is
  * unique), so no dedup pass is needed.
  *
  * `binWidth` tunes the fanout/selectivity trade: intervals explode to
  * `len/binWidth + 1` rows, and a bin's residual filter discards
  * non-matching pairs. Pick it near the TYPICAL interval length —
  * then fanout is ~2× and most joined pairs pass the filter. A stray
  * giant interval only inflates its own fanout (rows, not skew: the
  * exploded rows land in DIFFERENT bins/partitions).
  */
object RangeJoin {

  /** Join `points` (at `ptCol`, a LONG — e.g. `unix_micros`) to
    * `intervals` (`[startCol, endCol]`, inclusive both ends) on
    * `keyCols` equality plus containment. Interval-side non-key
    * columns come back `rightPrefix`ed; points matching nothing are
    * dropped (inner semantics — wrap with a left join on the output
    * keys if gaps matter). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], ptCol: String, startCol: String,
      endCol: String, binWidth: Long,
      rightPrefix: String = "right_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ivPayload = intervals.columns.filterNot(keyCols.contains).toSeq
    // the bounds must survive as prefixed payload (the residual filter
    // reads them), and prefixed names must not shadow point columns —
    // both would otherwise surface as a confusing missing-column or
    // AMBIGUOUS_REFERENCE failure deep in the join
    require(ivPayload.contains(startCol) && ivPayload.contains(endCol),
      s"keyCols must not include $startCol/$endCol")
    val clash = ivPayload.map(c => s"$rightPrefix$c")
      .filter(points.columns.contains)
    require(clash.isEmpty,
      s"prefixed interval column(s) ${clash.mkString(", ")} collide " +
        s"with point columns; pick a different rightPrefix")
    // collision-free bin column — never clobber a user column
    val bin = graft.util.Names.fresh(
      points.columns ++ ivPayload.map(c => s"$rightPrefix$c"))(
      i => s"__graft_bin$i")
    val p = points.withColumn(bin, floor(col(ptCol) / binWidth))
    val iv = intervals.select(
        keyCols.map(col) ++ ivPayload.map(c =>
          col(c).as(s"$rightPrefix$c")): _*)
      // degenerate start > end intervals match nothing; drop them
      // BEFORE the explode (sequence would walk them descending)
      .where(col(s"$rightPrefix$startCol") <= col(s"$rightPrefix$endCol"))
      .withColumn(bin, explode(sequence(
        floor(col(s"$rightPrefix$startCol") / binWidth),
        floor(col(s"$rightPrefix$endCol") / binWidth))))
    p.join(iv, keyCols :+ bin)
      .where(col(ptCol) >= col(s"$rightPrefix$startCol") &&
        col(ptCol) <= col(s"$rightPrefix$endCol"))
      .drop(bin)
  }
}
