package graft.util

/** Working-column name generation shared by every operator that adds a
  * temporary column to a user frame. */
object Names {

  /** First generated name that does not collide with `taken`,
    * comparing case-INSENSITIVELY: Spark resolves column names
    * case-insensitively by default (`spark.sql.caseSensitive=false`),
    * so a name differing only in case is a real collision. */
  def fresh(taken: Iterable[String])(mk: Int => String): String = {
    val t = taken.map(_.toLowerCase).toSet
    Iterator.from(0).map(mk).find(n => !t.contains(n.toLowerCase)).get
  }
}
