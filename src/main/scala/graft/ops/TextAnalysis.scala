package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All column expressions are built from `functions._` (codegen'd, no
  * UDFs in the hot path) so they stay inside WholeStageCodegen and
  * scale linearly with executors — no shuffle for any per-row metric.
  */
object TextAnalysis {

  // ---------------------------------------------------- PII scrubbing
  //
  // Patterns are deliberately in the regex subset where Java's engine
  // and RE2 (DuckDB) agree — character classes, bounded repetition,
  // ASCII word boundaries; no backreferences or lookaround — so the
  // redaction is engine-portable and d11's oracle can hash-gate it.
  /** Email addresses (conservative: local@domain.tld). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NANP-style phone numbers: 3-3-4 digit groups with -/. separators. */
  val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  /** Dotted-quad IPv4 literals. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact PII with typed placeholders — the standard scrub pass a
    * training corpus takes before tokenization. Emails first (their
    * digit runs could otherwise be chewed up by the phone/IP passes),
    * then phones, then IPs; per-row codegen, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Count of non-overlapping matches of `re` in the ORIGINAL text. */
  def piiCount(text: Column, re: String): Column =
    regexp_count(text, lit(re)).cast("long")

  /** Case-preserving whitespace-collapsed, trimmed text — the shared
    * tokenization base. The collapse runs BEFORE the trim because
    * Spark's `trim` strips only 0x20: text edged with tabs/newlines
    * ("doc body\n") would otherwise keep the edge whitespace, and
    * splitting it grows phantom '' tokens that inflate every token
    * count by up to 2 (the pitfall [[Packing.chunkByTokens]] already
    * documents and this base now fixes for the token stats too —
    * found by the planted-corpus edge suite, invisible to the gates
    * because the generated testdata contains no tabs/newlines). */
  private def wsCollapsed(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Whitespace token count, robust to empty/blank/tab-edged text.
    * Single evaluation of the collapse regex: splitting collapsed text
    * can only yield an empty token when the text was empty (split of
    * "" is [""]), so removing "" replaces the length-guard branch —
    * which would otherwise evaluate the regexp_replace a second time
    * wherever conditional subexpression elimination doesn't apply
    * (interpreted eval inside higher-order functions, the measured
    * pitfall documented at Dedup.scala). */
  def tokenCount(text: Column): Column =
    size(array_remove(split(wsCollapsed(text), " "), "")).cast("long")

  /** BPE-ish token count: word pieces + standalone punctuation
    * (`\w+` or single non-space-non-word chars). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))
      .cast("long")

  /** Adjacent character pairs within a word — the statistic one BPE
    * merge-training iteration counts corpus-wide (the most frequent
    * pair becomes the next merge rule). Words shorter than 2 chars
    * contribute nothing. Pure built-ins; the caller explodes. */
  def charPairs(word: Column): Column =
    when(length(word) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), length(word) - 2),
        i => word.substr(i + 1, lit(2))))

  /** Mean token length in characters (0 for empty docs). One regex
    * pass: in collapsed text the non-whitespace character count is
    * exactly `length(base) - (n - 1)` (n tokens are joined by single
    * spaces), so no second strip-regex is needed. */
  def meanTokenLength(text: Column): Column = {
    val base = wsCollapsed(text)
    val n = size(array_remove(split(base, " "), "")).cast("long")
    when(n === 0, lit(0.0))
      .otherwise((length(base) - n + 1).cast("double") / n)
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text,
          "[!-/:-@\\[-`{-~]", ""))).cast("double") / length(text))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "at", "by")

  /** Fraction of tokens that are (English) stopwords — a standard
    * quality signal for web-scraped corpora. */
  def stopwordRatio(text: Column): Column = {
    // no zero-guard needed: split of normalized text yields at least
    // [""] (one element, never a stopword), so an empty/blank doc is
    // 0/1 = 0.0 — and skipping the guard skips a second tokenCount
    // collapse pass
    val toks = split(normalized(text), " ")
    val stops = filter(toks, t => t.isInCollection(stopwords))
    size(stops).cast("double") / size(toks)
  }

  /** Composite quality score in [0, 1]: length sweet-spot, some
    * stopwords, not all punctuation. Heuristic, deterministic.
    * NULL text scores NULL — `least`/`greatest` SKIP null operands, so
    * without the explicit guard a NULL document would score the
    * constant ~0.7 (lenScore and stopScore silently collapse to their
    * 1.0 caps, punctPenalty to its 0.0 floor) and sail through every
    * quality filter; NULL-in-NULL-out drops it from `quality > x`
    * filters like every other per-row metric here. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    when(text.isNull, lit(null).cast("double"))
      .otherwise(
        round((lenScore * 0.4 + stopScore * 0.3 + punctPenalty * 0.3), 6))
  }

  // ------------------------------------------- repetition signals
  //
  // Within-document repetition metrics in the Gopher/C4 filtering
  // family: heavily repetitive documents (boilerplate, scraper loops,
  // keyword stuffing) are the single biggest class of low-quality text
  // a web corpus carries. All three are pure array expressions over
  // the token list — per-row codegen, no shuffle, no UDF; cost is
  // O(tokens) for the ratios and O(distinct·tokens) for the top-token
  // scan (bounded: web documents are a few KB; a pipeline feeding
  // book-length texts would pre-chunk, as tokenizers do anyway).

  private def toks(text: Column): Column =
    split(normalized(text), " ")

  /** Word n-grams of a TOKEN-ARRAY column (empty when the array is
    * shorter than `n`) — the single gram-construction primitive shared
    * with [[Dedup.shinglesOfTokens]] so the d6/d12/d13 definitions can
    * never drift. */
  def ngrams(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))

  // The *OfTokens forms take an already-projected token-array COLUMN.
  // Spark's higher-order functions are CodegenFallback and re-evaluate
  // non-attribute subtrees once per lambda element (the measured
  // pitfall documented at Dedup.scala:35-39) — so a caller computing
  // several metrics must tokenize ONCE into a bound attribute (see
  // d12Repetition) rather than passing `split(...)` expressions here.
  // The text-based wrappers below stay for one-off use, where the
  // tokenize-per-reference cost is paid a bounded number of times.

  /** Fraction of tokens that are distinct over a token-array column
    * (1.0 = no repetition; empty arrays report 1.0). */
  def distinctTokenRatioOfTokens(ts: Column): Column =
    when(size(ts) === 0, lit(1.0))
      .otherwise(size(array_distinct(ts)).cast("double") / size(ts))

  /** Fraction of tokens that are distinct (1.0 = no repetition; empty
    * docs report 1.0 — nothing repeats). */
  def distinctTokenRatio(text: Column): Column =
    when(tokenCount(text) === 0, lit(1.0))
      .otherwise(distinctTokenRatioOfTokens(toks(text)))

  /** Top-token fraction over a token-array column (0.0 for empty). */
  def topTokenFractionOfTokens(ts: Column): Column = {
    val counts = transform(array_distinct(ts),
      t => size(filter(ts, x => x === t)))
    when(size(ts) === 0, lit(0.0))
      .otherwise(array_max(counts).cast("double") / size(ts))
  }

  /** Fraction of the document occupied by its single most frequent
    * token (Gopher's "top word" signal; 0.0 for empty docs). */
  def topTokenFraction(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(topTokenFractionOfTokens(toks(text)))

  /** Duplicate-n-gram fraction over a token-array column (0.0 when
    * fewer than `n` tokens — nothing to repeat). */
  def dupNgramFractionOfTokens(ts: Column, n: Int): Column = {
    val grams = ngrams(ts, n)
    when(size(ts) < n, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(grams)).cast("double") /
        size(grams))
  }

  /** Fraction of n-gram occurrences that are repeats of an earlier
    * n-gram (`1 - distinct/total`). Duplicate 2-grams catch looped
    * phrases that token-level ratios miss. */
  def dupNgramFraction(text: Column, n: Int = 2): Column =
    when(tokenCount(text) < n, lit(0.0))
      .otherwise(dupNgramFractionOfTokens(toks(text), n))

  /** Canonical whitespace-normalized lowercase form. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** URL extraction — RE2-safe (no backtracking constructs), shared
    * verbatim with the d35 DuckDB oracle so the two can never drift. */
  val UrlPattern = "https?://[^\\s]+"

  def extractUrls(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(UrlPattern), lit(0))

  /** Host part of a URL: scheme stripped, cut at the first `/ : ? #`.
    * Empty string when the input isn't a URL. */
  def urlDomain(url: Column): Column =
    regexp_extract(url, "https?://([^/\\s:?#]+)", 1)

  /** Corpus domain profile — the URL-level view a crawl pipeline
    * dedups and blocklists by: one row per domain with total URL
    * mentions and distinct documents mentioning it. One explode +
    * one domain-key aggregation with map-side partials; the corpus
    * scans once. */
  def domainCounts(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(extractUrls(col(textCol))).as("__u"))
      .select(col(idCol), urlDomain(col("__u")).as("domain"))
      .where(col("domain") =!= "")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(idCol)).as("n_docs"))

  /** Deterministic document fingerprint: md5 of the normalized text —
    * reproducible by any engine (used as the dedup key). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** 64-bit rolling-hash fingerprint (xxhash64 of normalized text) for
    * cheap joins; not portable to other engines (rows-only checks). */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  /** Marker profiles for [[langId]] — shared with the d4 DuckDB oracle
    * so the engine expression and the SQL replica can never drift. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " die ", " und ", " ist ", " nicht ", " das "),
    "en" -> Seq(" the ", " and ", " of ", " is ", " not ", " that "),
    "es" -> Seq(" el ", " la ", " que ", " de ", " y ", " los "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des ", " est "),
    "zh" -> Seq("的", "是", "了", "在", "和", "不"))

  /** Character n-gram language ID over stopword/char profiles.
    * Deterministic heuristic: scores each candidate language by hits of
    * its most-frequent function words; ties break lexicographically. */
  def langId(text: Column): Column = {
    val profiles = langProfiles
    val padded = concat(lit(" "), normalized(text), lit(" "))
    val scored = profiles.map { case (lang, markers) =>
      val score = markers.map(m =>
        when(padded.contains(m), 1).otherwise(0))
        .reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // max score, ties -> lexicographically first language
    val best = array(scored: _*)
    val maxScore = array_max(transform(best, s => s.getField("score")))
    val winners = filter(best, s => s.getField("score") === maxScore)
    when(maxScore === 0, lit("unknown"))
      .otherwise(array_min(transform(winners, s => s.getField("lang"))))
  }

  /** One-call document profile. */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpeish", bpeishTokenCount(t))
      .withColumn("mean_token_len", meanTokenLength(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("lang_pred", langId(t))
  }
}
