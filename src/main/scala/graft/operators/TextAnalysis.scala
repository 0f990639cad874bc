package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Reusable text-analysis column functions — the library surface
  * behind the fixed demo queries (`t2_token_stats`, `t3_lang_id`,
  * `t4_quality_score`, `t5_fingerprint`, `t17_repetition_score`): a
  * pipeline user composes these over any text column, exactly like
  * `org.apache.spark.sql.functions._`.
  *
  * Everything here is a pure Catalyst expression (whole-stage
  * codegen'd, no UDFs), so filters built from these functions push into
  * scans and fuse into surrounding stages. Ratio outputs round half-up
  * to 4 decimals in raw double arithmetic (`floor(x·10⁴+0.5)/10⁴`),
  * the formulation that is bit-identical across engines where ROUND's
  * shortest-repr-vs-binary half handling diverges.
  *
  * Tokenization convention: single-space word splitting, matching the
  * corpus format of the demo queries. Swap the split pattern at the
  * call site if your corpus tokenizes differently — every function
  * that needs tokens takes the raw text column and splits internally
  * so call sites stay one-liners.
  */
object TextAnalysis {

  private def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0
  private def ws(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(ws(text))

  /** Distinct whitespace token count. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(ws(text)))

  /** Mean token length in characters (4-decimal half-up). */
  def avgTokenLength(text: Column): Column =
    r4(length(regexp_replace(text, " ", "")).cast(DoubleType) / size(ws(text)))

  /** Occurrences of a space-delimited marker word, counted by
    * length difference — one regexp pass, no explode. The text is
    * space-padded so boundary words count.
    *
    * Matches are NON-OVERLAPPING: each replaced occurrence consumes
    * both delimiter spaces, so immediately adjacent repeats share a
    * delimiter and only every other one counts (" the the the " → 2).
    * This is the semantics the langId/stopwordRatio heuristics — and
    * their DuckDB oracles — are calibrated against; for an exact
    * per-token count use
    * `size(filter(split(text, " "), w -> w = marker))` instead. */
  def markerOccurrences(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val m = s" $marker "
    (length(padded) - length(regexp_replace(padded, m, ""))) / m.length
  }

  /** Marker-word language heuristic over en/es/de/fr (the n-gram
    * language-ID shape: per-language marker scores, deterministic
    * argmax order). Returns a language code column. */
  def langId(text: Column): Column = {
    val sEn = markerOccurrences(text, "the")
    val sEs = markerOccurrences(text, "el") + markerOccurrences(text, "la")
    val sDe = markerOccurrences(text, "der") + markerOccurrences(text, "und")
    val sFr = markerOccurrences(text, "le") + markerOccurrences(text, "et")
    when(sEs > sEn && sEs >= sDe && sEs >= sFr, "es")
      .when(sDe > sEn && sDe > sEs && sDe >= sFr, "de")
      .when(sFr > sEn && sFr > sEs && sFr > sDe, "fr")
      .otherwise("en")
  }

  /** Distinct-token / total-token ratio (lexical diversity, 4-decimal). */
  def diversity(text: Column): Column =
    r4(distinctTokenCount(text).cast(DoubleType) / tokenCount(text))

  /** Fraction of characters outside [a-z ] (noise, 4-decimal). */
  def noiseRatio(text: Column): Column =
    r4((length(text) - length(regexp_replace(text, "[^a-z ]", "")))
      .cast(DoubleType) / length(text))

  /** 'the'-marker stopword fraction of tokens (4-decimal). */
  def stopwordRatio(text: Column): Column =
    r4(markerOccurrences(text, "the").cast(DoubleType) / tokenCount(text))

  /** Composite quality score: 0.5·diversity + 0.3·(1−noise) +
    * 0.2·min(tokens/100, 1) — the length/punctuation/diversity blend
    * quality filters threshold on (4-decimal). */
  def qualityScore(text: Column): Column = {
    val nTokens = tokenCount(text).cast(DoubleType)
    val nDistinct = distinctTokenCount(text).cast(DoubleType)
    val nChars = length(text).cast(DoubleType)
    val nNoise = (length(text) - length(regexp_replace(text, "[^a-z ]", "")))
      .cast(DoubleType)
    r4(lit(0.5) * (nDistinct / nTokens) +
      lit(0.3) * (lit(1.0) - nNoise / nChars) +
      lit(0.2) * least(nTokens / 100.0, lit(1.0)))
  }

  /** Canonical-form md5 fingerprint: trimmed, lowercased,
    * whitespace-collapsed content — re-ingest-stable identity for
    * exact dedup and contamination checks. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), " +", " ")))

  /** Sliding-window chunking for RAG / context packing: each document
    * explodes into overlapping `size`-token chunks every `stride`
    * tokens (overlap = size − stride). Returns (idCol, chunk_id,
    * start_tok, chunk_len, chunk_text); the final chunk is short when
    * the tail is, and a document shorter than `size` yields exactly one
    * chunk. Pure one-to-many explosion — no shuffle at any scale. */
  def slidingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int = 16,
      stride: Int = 12): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = df.select(col(idCol), split(col(textCol), " ").as("__ws"))
      .withColumn("__n_tok", size_(col("__ws")))
    val nChunks = when(col("__n_tok") <= size, 1)
      .otherwise(ceil((col("__n_tok") - size).cast(DoubleType) / stride)
        .cast("int") + 1)
    toks.withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk_len", least(lit(size), col("__n_tok") - col("start_tok")))
      .withColumn("chunk_text",
        array_join(slice(col("__ws"), col("start_tok") + 1, col("chunk_len")), " "))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        col("chunk_len"), col("chunk_text"))
  }
  // size() the function vs size/stride params — alias the import
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Per-document repetition profile — the Gopher-style repetition
    * filter signal. DataFrame-level because the top-token count needs
    * a per-(doc, token) aggregation, not a scalar expression. Returns
    * (idCol, n_tokens, n_distinct, top_n, top_ratio, distinct_ratio,
    * repetitive) where `repetitive` flags top_ratio ≥ `topRatioMax`.
    * One explode + two aggregations, both partial-aggregated. */
  def repetitionProfile(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topRatioMax: Double = 0.15): DataFrame = {
    val c = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tk"))
      .filter(length(col("__tk")) > 0)
      .groupBy(idCol, "__tk").agg(count(lit(1)).as("__n"))
    val topRatio = r4(col("top_n").cast(DoubleType) / col("n_tokens"))
    c.groupBy(idCol)
      .agg(sum(col("__n")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("__n")).as("top_n"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"), col("top_n"),
        topRatio.as("top_ratio"),
        r4(col("n_distinct").cast(DoubleType) / col("n_tokens")).as("distinct_ratio"),
        when(topRatio >= topRatioMax, 1).otherwise(0).as("repetitive"))
  }
}
