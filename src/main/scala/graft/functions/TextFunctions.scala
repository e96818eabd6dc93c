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
  def shingles(text: Column, n: Int = 3): Column =
    // the single-element transform binds lower(text) to a lambda
    // variable so it is evaluated ONCE per row — inlining it would
    // re-lowercase the whole text for every shingle position (measured
    // ~4x slower over the documents table)
    element_at(transform(array(lower(text)), t =>
      when(length(t) < n, array(t))
        .otherwise(array_distinct(transform(
          sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n)))))), 1)

  /** Per-row frequency stats over a STRING array's equal elements,
    * without a (row, element) shuffle and without the quadratic
    * count-each-distinct-element scan: `array_sort` + one linear
    * run-length pass, O(n log n) per row. Returns
    * `struct(top_c, n_singleton)` — the occurrence count of the most
    * frequent element and the number of elements whose value occurs
    * exactly once (so duplicate mass = `size(arr) - n_singleton`).
    * Empty array → (0, 0). Null elements unsupported (the null `prev`
    * sentinel marks run starts). Feeds the Gopher-style repetition
    * filters (q94) and the cleaning funnel (q100). */
  def elementCountStats(arr: Column): Column = {
    def step(acc: Column, x: Column): Column = {
      val isNew = not(x <=> acc.getField("prev"))
      val cur = when(isNew, lit(1L)).otherwise(acc.getField("cur") + 1L)
      struct(x.as("prev"), cur.as("cur"),
        greatest(acc.getField("best"), cur).as("best"),
        (acc.getField("single") +
          when(isNew && acc.getField("cur") === 1L, 1L).otherwise(0L))
          .as("single"))
    }
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("cur"),
        lit(0L).as("best"), lit(0L).as("single")),
      step,
      acc => struct(acc.getField("best").as("top_c"),
        (acc.getField("single") +
          when(acc.getField("cur") === 1L, 1L).otherwise(0L))
          .as("n_singleton")))
  }

  /** 63-bit polynomial hash of one string (for shingle/token hashing). */
  def polyHash(s: Column, mod: Long = 1000000007L): Column =
    aggregate(split(s, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % mod)

  // ---- MinHash + LSH dedup primitives ---------------------------------
  // Pipeline (shingle -> minhash -> band -> bucket-join) per the classic
  // Broder construction. All integer arithmetic stays < 2^63 and is
  // reproduced verbatim in the DuckDB oracle SQL, so signatures are
  // engine-independent.

  val HashMod = 1000000007L
  val MinhashPrime = 2147483647L

  /** Direct hash of a 3-char shingle:
    * ((a*31 + b)*31 + c) % HashMod over the ascii codes. */
  def shingleHash3(s: Column): Column =
    ((ascii(substring(s, 1, 1)) * 31L + ascii(substring(s, 2, 1))) * 31L
      + ascii(substring(s, 3, 1))) % HashMod

  /** Fused `transform(shingles(text, 3), shingleHash3)` as the native
    * one-pass expression [[ShingleHashes]] (`shingle_hashes`,
    * registered by `GraftExtensions`) — no per-shingle string
    * materialization; element-for-element identical output
    * (spec-checked). The first full-corpus map stage of the dedup
    * family, so the allocation win is proportional to corpus bytes. */
  def shingleHashes(text: Column): Column =
    call_function("shingle_hashes", lower(text))

  /** Per-function minhash seeds: a_i = 2i+1, b_i = 7919i+123. */
  def minhashA(i: Int): Long = 2L * i + 1
  def minhashB(i: Int): Long = 7919L * i + 123

  /** MinHash signature (array of k longs) over an array of shingle
    * hashes: sig[i] = min over h of (a_i*h + b_i) % MinhashPrime. */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleHashes,
        h => (lit(minhashA(i)) * h + lit(minhashB(i))) % MinhashPrime))
    }: _*)

  /** [[minhashSignature]] as the native fused-loop codegen expression
    * `minhash_sig` ([[MinhashSignature]], registered by
    * `GraftExtensions`) — one pass over the hash array instead of k
    * interpreted higher-order-function passes; bit-identical output
    * (spec-checked against the SQL form). */
  def minhashSignatureNative(shingleHashes: Column, k: Int): Column =
    call_function("minhash_sig", shingleHashes, lit(k))

  /** LSH band key: polynomial combine of `rowsPerBand` consecutive
    * signature entries of band `bandIdx` (0-based). Max value
    * ~ 2^31 * 31^3 < 2^63, no mod needed. */
  def bandKey(sig: Column, bandIdx: Int, rowsPerBand: Int): Column =
    (0 until rowsPerBand).map { r =>
      element_at(sig, bandIdx * rowsPerBand + r + 1)
    }.reduce((acc, m) => acc * 31L + m)

  /** 16-bit SimHash over an array of (token) hashes: bit b is set iff
    * sum over tokens of (2*((h>>b)&1) - 1) >= 0. */
  def simhash16(tokenHashes: Column): Column =
    (0 until 16).map { b =>
      val bitSum = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b) % 2) * 2 - 1)
      when(bitSum >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two 16-bit values. */
  def hamming16(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")
}
