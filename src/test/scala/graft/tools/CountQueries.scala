package graft.tools

/** Dev-only: print the driver-contract surface counts. */
object CountQueries {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} rows_only=${(q -- o).toSeq.sorted.mkString(",")}")
    val orphans = o -- q
    println(s"oracles_without_query=${orphans.toSeq.sorted.mkString(",")}")
  }
}
