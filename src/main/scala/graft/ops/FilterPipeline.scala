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
    val cumulative = stages.tail.scanLeft(stages.head._2) {
      (acc, s) => acc && s._2
    }
    val counts = ("total", count(lit(1)).cast("long")) +:
      stages.map(_._1).zip(cumulative).map { case (name, cum) =>
        name -> sum(when(cum, 1L).otherwise(0L)).as(name)
      }
    val agged = df.agg(counts.head._2.as(counts.head._1),
      counts.tail.map { case (n, c) => c.as(n) }: _*)
    val rows = counts.map(_._1).zipWithIndex.map { case (name, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
        col(name).as("n_docs"))
    }
    agged.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_docs"))
  }
}
