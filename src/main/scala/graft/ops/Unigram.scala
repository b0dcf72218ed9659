package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed UNIGRAM tokenizer — the SentencePiece-style counterpart
  * to [[Bpe]]: a substring-piece vocabulary trained from corpus
  * counts, and exact Viterbi segmentation of every word against it
  * (the Kudo, ACL 2018 shape). Where BPE grows a vocabulary by greedy
  * merging, the unigram model SELECTS pieces and segments each word
  * globally optimally against piece log-likelihoods.
  *
  * Determinism contract (the family rule of the BPE/BM25/backoff
  * gates): the per-piece score is the INTEGER log-likelihood proxy
  * `qlog(cnt) − qlog(T)` where [[qlog]] is an exact piecewise-linear
  * fixed-point log2 (4 fractional bits, built from bit-length and a
  * shift — no floating point, no `ln`), `cnt` the piece's weighted
  * substring count and `T` the total candidate-piece count. That is
  * the true `log p(piece)` objective quantized to 1/16 bit: per-piece
  * negative scores penalize over-segmentation exactly like the real
  * model, while every comparison stays bit-portable across engines.
  * Score ties break to the lexicographically smallest piece SEQUENCE,
  * which the suffix DP resolves locally (candidates at a position
  * differ in their first piece; equal first pieces share their tail).
  * Words are [[Bpe.wordCounts]]' lowercase `[a-z0-9]+` runs.
  *
  * Scale shape: training is ONE corpus pass (the word-frequency
  * aggregation) + a piece-count aggregation over the DISTINCT-word
  * dictionary (corpus-size-independent, like the BPE trainer); the
  * top-V cut is a single window over candidate pieces (model-sized
  * input — bounded by Σ_words len·maxPieceLen over DISTINCT words).
  * Segmentation runs the DP once per DISTINCT word with the bounded
  * vocabulary broadcast; the corpus is only touched by the final
  * word→tokens join (the [[Bpe.tokenizeByDict]] deployment shape).
  */
object Unigram {

  /** Exact fixed-point log2 with 4 fractional bits:
    * `(bitlen(x)−1)·16 + ((x·16) >> (bitlen(x)−1)) − 16` — a
    * monotone piecewise-linear approximation of `16·log2(x)` built
    * entirely from integer ops (`qlog(1) = 0`, `qlog(2^k) = 16k`).
    * Requires `x ≥ 1`; exact headroom to `x < 2^59`. */
  def qlog(x: Long): Long = {
    require(x >= 1, "qlog needs x >= 1")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    b * 16 + ((x * 16) >> b) - 16
  }

  /** [[qlog]] as a Catalyst expression over a long column named `c` —
    * the same bit-length-and-shift construction via
    * `bin()`/`shiftright`, so the DuckDB replay (`length(bin(x))`,
    * `>>`) matches it exactly. */
  def qlogExpr(c: String): Column =
    expr(s"(CAST(length(bin($c)) AS BIGINT) - 1) * 16" +
      s" + shiftright($c * 16, CAST(length(bin($c)) AS INT) - 1) - 16")

  /** Piece-candidate counts over the word dictionary: every substring
    * of length 1..maxPieceLen of every distinct word, weighted by the
    * word's corpus count and its occurrence positions in the word.
    * Input must be the `(word, cnt)` [[Bpe.wordCounts]] shape. */
  def pieceCounts(wordCounts: DataFrame, maxPieceLen: Int): DataFrame = {
    val p = flatten(transform(
      sequence(lit(1), length(col("word"))),
      i => transform(
        sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - i + 1)),
        l => col("word").substr(i, l))))
    wordCounts.select(explode(p).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
  }

  /** Train the vocabulary: ALL single characters seen in training
    * (coverage guarantee — every word stays segmentable) plus the top
    * `vocabSize` multi-character pieces by `(cnt DESC, piece ASC)`.
    * Returns `(vocab, qlogT)`: the vocab rows are
    * `(piece, cnt, weight)` with `weight = qlog(cnt) − qlog(T)` and
    * `T` the total candidate-piece count; `qlogT` is what unseen
    * single characters cost at segmentation time
    * (`qlog(1) − qlog(T) = −qlogT`). */
  def trainVocab(df: DataFrame, textCol: String = "text",
      vocabSize: Int = 64, maxPieceLen: Int = 4): (DataFrame, Long) = {
    val (vocab, qlogT, _) =
      trainModel(df, textCol, vocabSize, maxPieceLen, pinWords = false)
    (vocab, qlogT)
  }

  /** [[trainVocab]] that ALSO returns the pinned `(word, cnt)`
    * word-count frame the training pass already paid for (r22, guide
    * §1.2): the trainer's first step is the corpus word extract, and
    * a deployment caller that trains-then-tokenizes the SAME corpus
    * ([[tokenize]]'s `words` parameter, the d48/i48 shape) can reuse
    * the dictionary instead of re-extracting 100 TB of text for the
    * segmentation's distinct-word set. The pin is dictionary-sized
    * (distinct words), never corpus-sized — but it IS held until GC,
    * so train-only callers should stay on [[trainVocab]], which skips
    * it. */
  def trainVocabWithWords(df: DataFrame, textCol: String = "text",
      vocabSize: Int = 64, maxPieceLen: Int = 4):
      (DataFrame, Long, DataFrame) = {
    val (vocab, qlogT, words) =
      trainModel(df, textCol, vocabSize, maxPieceLen, pinWords = true)
    (vocab, qlogT, words.get)
  }

  private def trainModel(df: DataFrame, textCol: String,
      vocabSize: Int, maxPieceLen: Int, pinWords: Boolean):
      (DataFrame, Long, Option[DataFrame]) = {
    require(vocabSize >= 0 && maxPieceLen >= 1)
    // when a caller wants the dictionary back, it is pinned LAZILY
    // (no extra job — the piece-count aggregation below is the first
    // action over it and materializes it in passing; checkpoint blocks
    // free themselves on GC); train-only callers skip the pin entirely
    val wc0 = Bpe.wordCounts(df, textCol)
    val wc = if (pinWords) wc0.localCheckpoint(false) else wc0
    // cached: the scalar total AND the vocab cut read the piece-count
    // aggregate — uncached, the piece-explode chain ran TWICE (r21,
    // guide §1.2 "don't compute things twice"); the frame is
    // dictionary-sized (distinct pieces), not corpus-sized
    val pc = pieceCounts(wc, maxPieceLen).cache()
    // total candidate-piece occurrences: one scalar aggregate
    val t = Option(pc.agg(sum(col("cnt"))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val (vocab, qlogT) = vocabFromCounts(pc, vocabSize, t)
    // pin the (vocab-sized) model and release the piece-count cache:
    // every caller either collects the vocab (segmentation) or orders
    // it (the d46 gate), so the eager checkpoint is never wasted work
    val pinned = vocab.localCheckpoint(true)
    pc.unpersist(false)
    (pinned, qlogT, if (pinWords) Some(wc) else None)
  }

  /** Derive the `(vocab, qlogT)` model from a PIECE-COUNT LEDGER — a
    * `(piece, cnt)` frame that may contain several rows per piece
    * (counts are additive over disjoint document sets, so an
    * incremental `train_tokenizer` chain appends deltas instead of
    * rebuilding; this sum-merge makes the derived vocabulary EXACTLY
    * the full-rebuild one). `totalCnt` is the stamped ledger total.
    * The vocabulary size is a READ-time parameter: the ledger is
    * vocab-size-agnostic, so one trained model serves any V. */
  def vocabFromCounts(ledger: DataFrame, vocabSize: Int,
      totalCnt: Long): (DataFrame, Long) = {
    val qlogT = qlog(math.max(1L, totalCnt))
    val merged = ledger.groupBy("piece").agg(sum(col("cnt")).as("cnt"))
    val singles = merged.where(length(col("piece")) === 1)
    val multi = merged.where(length(col("piece")) > 1)
    // top-V cut as orderBy+limit → TakeOrderedAndProject (per-partition
    // heaps + a driver merge of V rows), never the single-partition
    // WindowExec a global row_number() would force
    val topMulti = multi
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabSize)
    val vocab = singles.unionByName(topMulti)
      .select(col("piece"), col("cnt"),
        (qlogExpr("cnt") - qlogT).as("weight"))
    (vocab, qlogT)
  }

  /** Exact Viterbi segmentation of each distinct word against the
    * vocabulary: maximize Σ weight(piece); score ties break to the
    * lexicographically smallest piece sequence. Characters absent
    * from the vocabulary segment as single-char pieces of weight
    * `-qlogT` (count-1 likelihood — never part of a longer piece).
    * Returns `(word, pieces, score, n_pieces)`.
    *
    * The vocabulary is collected and broadcast (bounded by
    * construction); the DP is a typed per-row map over the word
    * dictionary — no shuffle at all. */
  def segmentWords(words: DataFrame, vocab: DataFrame, qlogT: Long,
      maxPieceLen: Int = 4, wordCol: String = "word"): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val vmap = vocab.select(col("piece"), col("weight").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bv = spark.sparkContext.broadcast(vmap)
    val maxL = maxPieceLen
    val unk = -qlogT
    words.select(col(wordCol).cast("string")).distinct()
      .as[String]
      .map { word =>
        val vm = bv.value
        val n = word.length
        // suffix DP: best(i) = (score, first-piece length) of word[i..)
        val score = new Array[Long](n + 1)
        val pick = new Array[Int](n + 1)
        var i = n - 1
        while (i >= 0) {
          var bestScore = Long.MinValue
          var bestPiece: String = null
          var bestLen = 0
          var l = 1
          val lim = math.min(maxL, n - i)
          while (l <= lim) {
            val piece = word.substring(i, i + l)
            val wOpt: Option[Long] =
              if (vm.contains(piece)) Some(vm(piece))
              else if (l == 1) Some(unk) // coverage fallback
              else None
            wOpt.foreach { pw =>
              val s = pw + score(i + l)
              if (s > bestScore ||
                  (s == bestScore && piece < bestPiece)) {
                bestScore = s; bestPiece = piece; bestLen = l
              }
            }
            l += 1
          }
          score(i) = bestScore
          pick(i) = bestLen
          i -= 1
        }
        val pieces = Seq.newBuilder[String]
        var p = 0
        while (p < n) {
          pieces += word.substring(p, p + pick(p)); p += pick(p)
        }
        val out = pieces.result()
        (word, out, if (n == 0) 0L else score(0), out.size.toLong)
      }
      .toDF(wordCol, "pieces", "score", "n_pieces")
  }

  /** Tokenize a corpus: segment the DISTINCT words once, then map
    * every document through the word→pieces table with one equi-join,
    * reassembling pieces in word order (the [[Bpe.tokenizeByDict]]
    * shape — corpus cost is one extract + one join, never a per-row
    * DP). Returns `(idCol, tokens, score, n_pieces)` with the
    * document's total segmentation score and piece count; documents
    * with no `[a-z0-9]` words get an empty token array.
    *
    * `words` (r22, guide §1.2): an optional pre-extracted word frame
    * (a `word` column COVERING every `[a-z0-9]+` word of `df` — e.g.
    * [[trainVocabWithWords]]' dictionary when training corpus ==
    * tokenize corpus; a superset is fine, extra words simply don't
    * join). Without it the segmentation's distinct-word set re-runs
    * the corpus word extract — a second full regex pass over 100 TB
    * of text that the caller often already paid for in training. */
  def tokenize(df: DataFrame, vocab: DataFrame, qlogT: Long,
      textCol: String = "text", idCol: String = "doc_id",
      maxPieceLen: Int = 4, words: Option[DataFrame] = None): DataFrame = {
    val wordsOf = df.select(col(idCol),
      posexplode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as(Seq("__pos", "word")))
    val segs = segmentWords(words.getOrElse(wordsOf).select("word"),
      vocab, qlogT, maxPieceLen)
    val joined = wordsOf.join(segs, "word")
      .groupBy(col(idCol))
      .agg(
        flatten(array_sort(collect_list(struct(col("__pos").as("p"),
          col("pieces").as("t")))).getField("t")).as("tokens"),
        sum(col("score")).as("score"),
        sum(col("n_pieces")).as("n_pieces"))
    df.select(col(idCol)).join(joined, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), array().cast("array<string>"))
          .as("tokens"),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }
}
