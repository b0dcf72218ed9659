package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Names

/** Corpus-level line (paragraph) deduplication — the CCNet-style pass
  * that strips boilerplate repeated across a web crawl (nav bars,
  * cookie banners, footers) while leaving each document's unique prose
  * intact. Unlike document-level dedup ([[Dedup.exact]]), the unit of
  * deduplication is the LINE: a line whose normalized form occurs more
  * than `maxOccurrences` times corpus-wide is dropped from EVERY
  * document that carries it.
  *
  * Scale shape (the 100 TB story):
  *   1. explode documents into (id, pos, line) — narrow, no shuffle;
  *   2. build the banned set with a `groupBy(fingerprint).count` —
  *      partial (map-side) aggregation collapses each partition's
  *      repeats before the exchange, so the shuffle carries distinct
  *      fingerprints per partition, not raw line volume;
  *   3. mark lines against the banned set with a left join on the
  *      fingerprint. The banned set is the DISTINCT duplicated lines —
  *      orders of magnitude smaller than the corpus — so AQE turns
  *      this into a broadcast join at runtime whenever it fits, which
  *      leaves the exploded corpus un-shuffled; when it does not fit,
  *      the sort-merge fallback's hot fingerprints (a banner repeated
  *      10⁹ times hashes to one partition) are exactly what AQE's
  *      skew-join splitting handles;
  *   4. rebuild documents with one corpus shuffle on the id.
  *
  * Null text is treated as empty (one empty line, always kept — empty
  * lines are structure, not content, and fall under `minLineChars`).
  */
object LineDedup {

  /** Normalized-line fingerprint — same canonicalization as document
    * fingerprints ([[TextAnalysis.normalized]]) so the two dedup
    * levels can never disagree about what "the same text" means. */
  def lineFingerprint(line: Column): Column =
    md5(TextAnalysis.normalized(line))

  /** Remove every occurrence of lines repeated more than
    * `maxOccurrences` times corpus-wide. Lines whose NORMALIZED length
    * is below `minLineChars` are exempt (blank separator lines would
    * otherwise always be "duplicated" and every document would lose
    * its structure). Returns one row per input document:
    * `(idCol, textCol, n_lines_kept, n_lines_removed)` with `textCol`
    * rebuilt from the surviving lines in original order.
    */
  def dedupLines(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxOccurrences: Long = 1L,
      minLineChars: Int = 1): DataFrame = {
    val Seq(cPos, cLine, cFp, cBan) =
      Seq("pos", "line", "fp", "banned").map(s =>
        Names.fresh(df.columns)(i => s"__graft_${s}$i"))

    val lines = df.select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq(cPos, cLine)))
      .withColumn(cFp, lineFingerprint(col(cLine)))

    // Banned set: distinct fingerprints of long-enough lines seen more
    // than maxOccurrences times. length(normalized) is a function of
    // the fingerprint's pre-image, so a short line can never collide
    // with a banned fingerprint — no exemption check needed after the
    // join.
    val banned = lines
      .where(length(TextAnalysis.normalized(col(cLine))) >= minLineChars)
      .groupBy(cFp).agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxOccurrences)
      .select(col(cFp), lit(true).as(cBan))

    lines.join(banned, Seq(cFp), "left")
      .groupBy(col(idCol))
      .agg(
        // surviving lines, original order — array_sort on (pos, line)
        // structs sorts by pos (unique within a doc), then re-joined
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col(cBan).isNull,
              struct(col(cPos), col(cLine))))),
            s => s.getField(cLine))).as(textCol),
        count(when(col(cBan).isNull, 1)).as("n_lines_kept"),
        count(when(col(cBan).isNotNull, 1)).as("n_lines_removed"))
  }
}
