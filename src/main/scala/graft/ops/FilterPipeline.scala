package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel reporting over a filtering pipeline — the acceptance
  * accounting every production corpus build publishes next to its
  * output (how many documents survived language ID, then quality, then
  * repetition, then dedup). Cheap by construction: the stages are
  * evaluated as per-row booleans in ONE corpus scan and reduced in ONE
  * single-row aggregate — adding a stage adds a conditional sum, never
  * a pass, and there is no per-stage join or self-union anywhere.
  */
object FilterPipeline {

  /** Cumulative funnel counts. `stages` are (name, predicate) pairs
    * evaluated IN ORDER; stage i counts rows passing predicates 1..i
    * (a row rejected at stage j is invisible to every later stage,
    * like the real pipeline it models). Emits a leading "total" row;
    * result is `(stage_idx, stage, n_docs)` with one row per stage.
    *
    * Predicates are arbitrary [[Column]]s over `df` — including
    * precomputed window/join results (e.g. a dedup-survivor flag) the
    * caller attaches beforehand. A NULL predicate value counts as a
    * rejection (SQL three-valued logic, same as a WHERE). */
  def funnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel: no stages")
    require(stages.map(_._1).distinct.size == stages.size,
      s"funnel: duplicate stage names in ${stages.map(_._1)}")
    val cumulative = stages.tail.scanLeft(stages.head._2) {
      (acc, s) => acc && s._2
    }
    // aggregates live under INTERNAL aliases — user-chosen stage names
    // (dots, "total", anything) appear only as output literals, never
    // as resolvable column references
    val counts = count(lit(1)).cast("long") +: cumulative.map(cum =>
      // coalesce: sum() over ZERO rows is NULL; an empty corpus must
      // report 0 at every stage, not a null that breaks consumers
      coalesce(sum(when(cum, 1L).otherwise(0L)), lit(0L)))
    val names = "total" +: stages.map(_._1)
    val agged = df.agg(counts.head.as("__graft_c0"),
      counts.tail.zipWithIndex.map { case (c, i) =>
        c.as(s"__graft_c${i + 1}")
      }: _*)
    val rows = names.zipWithIndex.map { case (name, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
        col(s"__graft_c$i").as("n_docs"))
    }
    agged.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_docs"))
  }
}
