package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer TRAINING and
  * application — the step that turns a cleaned corpus into the merge
  * table a trained tokenizer ships with (the Sennrich et al., ACL 2016
  * algorithm), plus the two tokenization paths that apply it.
  *
  * Scale design (why this is Spark-shaped and not a driver script):
  * the corpus is touched exactly ONCE — a word-frequency aggregation
  * with map-side combine — and every one of the k merge iterations
  * then runs over the materialized WORD DICTIONARY, whose row count is
  * bounded by the number of distinct words (~10⁷ even at 100 TB),
  * independent of corpus size. Each iteration ships ONE row (the
  * argmax pair) to the driver, so k merges cost k small dictionary
  * aggregations, never k corpus passes. Tokenization at scale goes the
  * same way: merges are applied once per DISTINCT word and the corpus
  * is mapped through the resulting (word → tokens) table with one join
  * ([[tokenizeByDict]]).
  *
  * Determinism/portability contract (what the d37/d38/d39 oracles
  * hash-gate): words are lowercase `[a-z0-9]+` runs — the alphabet
  * restriction keeps every symbol free of whitespace and regex
  * metacharacters, so the DuckDB replay can use plain string ops that
  * match Java semantics bit-for-bit. Pair counts are the textbook
  * overlapping adjacent pairs ([a,a,a] contributes (a a) twice); ties
  * on count break on the lexicographically smallest "a b" string; a
  * merge applies greedily left-to-right within each word. No
  * end-of-word marker symbol is emitted (merges simply never cross
  * word boundaries — the word-local representation enforces it
  * structurally, where the reference BPE uses a `</w>` sentinel).
  */
object Bpe {

  /** Word-frequency dictionary: one row per distinct lowercase
    * `[a-z0-9]+` word with its corpus count. The one corpus-wide
    * shuffle in the whole trainer; count partials combine map-side. */
  def wordCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** One character per symbol: "hello" → [h, e, l, l, o]. */
  private def chars(word: Column): Column =
    regexp_extract_all(word, lit("."), lit(0))

  /** ONE greedy left-to-right application of merge (a, b) over a
    * symbol array: fold the elements, merging when the accumulator's
    * last symbol is `a` and the incoming one is `b`. The merged symbol
    * `a+b` is strictly longer than `a`, so it can never immediately
    * re-match as the left side of the SAME pair — the single fold IS
    * full greedy application, equal to the leftmost-replace-until-
    * fixpoint recursion the DuckDB oracles replay. */
  def mergePair(s: Column, a: String, b: String): Column =
    aggregate(s, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs as "a b" strings — overlapping, the
    * textbook count. Callers must pre-filter `size(s) >= 2` (Spark's
    * `sequence(1, 0)` would count DOWN, not return empty). */
  private def adjacentPairs(s: Column): Column =
    transform(sequence(lit(1), size(s) - 1),
      i => concat(element_at(s, i), lit(" "), element_at(s, i + 1)))

  /** Train `numMerges` merge rules over the corpus; returns them in
    * merge order. Stops early if the dictionary runs out of pairs.
    * Driver memory holds only the merge list (k rows); the per-
    * iteration lineage (one [[mergePair]] per merge) is truncated by
    * an eager localCheckpoint every 8 merges so iteration cost stays
    * O(dict), not O(merges x dict). */
  def train(df: DataFrame, textCol: String = "text",
      numMerges: Int = 16): Seq[(String, String)] = {
    var dict = wordCounts(df, textCol)
      .select(chars(col("word")).as("s"), col("cnt"))
      .localCheckpoint(true) // the ONE corpus pass, materialized
    val merges = Seq.newBuilder[(String, String)]
    var got = 0
    var sinceCp = 0
    var exhausted = false
    while (got < numMerges && !exhausted) {
      val top = dict.where(size(col("s")) >= 2)
        .select(explode(adjacentPairs(col("s"))).as("pr"), col("cnt"))
        .groupBy("pr").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pr").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pr = top(0).getString(0)
        val Array(a, b) = pr.split(" ") // symbols never contain spaces
        merges += ((a, b))
        got += 1
        dict = dict.withColumn("s", mergePair(col("s"), a, b))
        sinceCp += 1
        if (sinceCp >= 8) {
          dict = dict.localCheckpoint(true); sinceCp = 0
        }
      }
    }
    merges.result()
  }

  /** Tokenize with a given ordered merge list as a PER-ROW column
    * expression — zero shuffle. Each merge nests one [[mergePair]]
    * fold per word, so this suits BOUNDED merge lists (interactive
    * exploration, the gates' 4). A production 32k-rule vocabulary goes
    * through [[tokenizeByDict]] instead. NULL text stays NULL. */
  def applyMerges(text: Column, merges: Seq[(String, String)]): Column = {
    val words = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    flatten(transform(words, w =>
      merges.foldLeft(chars(w)) { case (s, (a, b)) => mergePair(s, a, b) }))
  }

  /** Corpus tokenization through the word dictionary — the 100 TB
    * shape for real vocabularies: apply the merges once per DISTINCT
    * word (k bounded jobs over the dictionary, lineage-truncated as in
    * [[train]]), then map corpus words through the (word → tokens)
    * result with one equi-join and reassemble per document in word
    * order (in-struct sort — no extra shuffle beyond the join and the
    * per-doc aggregation). Returns (idCol, tokens: array<string>);
    * documents with no `[a-z0-9]` words get an empty token array. */
  def tokenizeByDict(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    var dict = df.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("word"))
      .distinct()
      .select(col("word"), chars(col("word")).as("s"))
      .localCheckpoint(true)
    var sinceCp = 0
    for ((a, b) <- merges) {
      dict = dict.withColumn("s", mergePair(col("s"), a, b))
      sinceCp += 1
      if (sinceCp >= 8) {
        dict = dict.localCheckpoint(true); sinceCp = 0
      }
    }
    val words = df.select(col(idCol), posexplode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
      .as(Seq("__pos", "word")))
    val toks = words.join(dict, "word")
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos").as("p"),
          col("s").as("t")))),
        x => x.getField("t"))).as("tokens"))
    df.select(col(idCol)).join(toks, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), array().cast("array<string>"))
          .as("tokens"))
  }
}
