package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * token counting, language ID, quality scoring, fingerprinting.
  * All pure `Column` expressions (codegen'd; no UDFs), so they scan
  * 100 TB of documents at parquet-read speed.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: runs of letters, runs of digits, or single
    * non-alphanumeric chars — a cheap proxy for tokenizer load. */
  def subTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Count of punctuation / non-alphanumeric, non-space chars. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** Deterministic 63-bit polynomial rolling hash of the full text:
    * h = fold(h*31 + ascii(char)) mod 1e9+7. Engine-independent (pure
    * integer arithmetic), unlike xxhash/murmur which differ per engine. */
  def fingerprint(text: Column, mod: Long = 1000000007L): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % mod)

  /** Language marker words used by the n-gram-free heuristic language ID.
    * Tiny on purpose: the point is the operator shape (scored argmax over
    * per-language token matches), not linguistic accuracy. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "de", "que", "es"))

  private def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(markers)))

  /** Heuristic language ID: argmax of marker-token hits with
    * deterministic alphabetical tiebreak; "und" (undetermined) when no
    * marker hits at all. */
  def langId(text: Column): Column = {
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      (lang, markerHits(text, ms))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // first (alphabetical) language reaching the max score
    val pick = scored.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    pick
  }

  /** Stopword ratio numerator: tokens that are English stopwords. */
  def stopwordCount(text: Column): Column =
    markerHits(text, LangMarkers("en"))

  /** Document quality heuristics as a struct of exact-integer metrics
    * (ratios are left to the caller so results stay hash-stable):
    * n_chars, n_tokens, n_subtokens, n_punct, n_stopwords, mean token
    * length ×100 (integer). */
  def qualityMetrics(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    struct(
      length(text).cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      subTokenCount(text).cast("long").as("n_subtokens"),
      punctCount(text).cast("long").as("n_punct"),
      stopwordCount(text).cast("long").as("n_stopwords"),
      when(nTok > 0, (sumLen * 100 / nTok).cast("long")).otherwise(0L).as("mean_tok_len_x100"))
  }

  /** Character n-gram shingles (distinct), the input to MinHash/Jaccard
    * dedup. */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = lower(text)
    when(length(t) < n, array(t))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n)))))
  }

  /** 63-bit polynomial hash of one string (for shingle/token hashing). */
  def polyHash(s: Column, mod: Long = 1000000007L): Column =
    aggregate(split(s, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % mod)
}
