package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: token counting,
  * quality scoring, n-gram language ID, fingerprinting. All built from
  * codegen'd built-ins (no UDFs) so they pipeline inside WholeStageCodegen
  * over the parquet scan.
  */
object TextOps {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, single
    * punctuation marks — the GPT-2-style split shape restricted to
    * constructs with identical semantics in Java regex and RE2, so the
    * DuckDB oracle counts the exact same matches. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Whitespace token count + BPE-ish regex token count + char count.
    * Documented SQL-mirror quirk: split on empty/whitespace-only text
    * yields [""], so n_ws_tokens is 1 for an empty document — DuckDB's
    * regexp_split_to_array does the same, and the oracle defines the
    * operator's semantics. */
  def tokenCount(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_m"))

  /** English stopword markers for the quality stopword ratio (whole-word
    * occurrences via space padding — SQL-replicable, codegen'd).
    * Documented SQL-mirror quirk: replace-based counting undercounts
    * ADJACENT occurrences (" the the the " counts 2 — consecutive
    * matches share the separating space); the oracle counts the same
    * way, so both engines agree on the heuristic's exact value. */
  val Stopwords: Seq[String] = Seq(" the ", " and ", " of ", " to ", " a ",
    " in ", " is ", " it ")

  /** Quality heuristics: length, word count, punctuation density,
    * chars-per-word (the mean-word-length proxy), stopword ratio. */
  def quality(df: DataFrame): DataFrame = {
    val words = size(split(trim(col("text")), "\\s+"))
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val stopHits = Stopwords.map(k => occurrences(padded, k)).reduce(_ + _)
    df.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      words.cast("long").as("n_words"),
      graft.functions.duckRound(length(regexp_replace(col("text"), "[^.!?,;:]", ""))
        .cast("double") / length(col("text")), 6).as("punct_ratio"),
      graft.functions.duckRound(length(col("text")).cast("double") / words, 6).as("chars_per_word"),
      graft.functions.duckRound(stopHits.cast("double") / words, 6).as("stopword_ratio"))
  }

  /** Stopword-frequency language ID: score per language = occurrences of
    * its marker words; argmax with fixed precedence on ties. Deterministic
    * and SQL-expressible (the DuckDB oracle replicates it verbatim).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and "),
    "de" -> Seq(" der ", " und "),
    "fr" -> Seq(" le ", " et "),
    "es" -> Seq(" el ", " y "))

  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")

  def langId(df: DataFrame): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scores = LangMarkers.map { case (lang, kws) =>
      lang -> kws.map(k => occurrences(padded, k)).reduce(_ + _)
    }
    val scored = scores.foldLeft(df.select(col("doc_id"), col("text"))) {
      case (d, (lang, c)) => d.withColumn(s"score_$lang", c)
    }
    // argmax with precedence = declaration order (strict > comparisons).
    // A zero-marker document labels 'en' (first language wins all-zero
    // ties) — the SAME semantics as the oracle's >=-chain; the 'und'
    // seed is unreachable for non-null text and exists only to start
    // the fold.
    val best = scores.map(_._1).foldLeft((lit("und"), lit(-1L))) {
      case ((bl, bs), lang) =>
        val s = col(s"score_$lang")
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    scored.select(col("doc_id"), best._1.as("pred_lang"), best._2.cast("long").as("score"))
  }

  /** Polynomial rolling-hash fingerprint over whitespace tokens (mod a
    * 31-bit prime — overflow-free in both int64 engines, word hash =
    * FNV-1a + mix so the DuckDB oracle replicates it; single-pass
    * kernel, functions.FingerprintExpr). */
  def fingerprint(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.FingerprintExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("text"))))
        .as("fingerprint"))
}
