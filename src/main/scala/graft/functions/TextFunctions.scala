package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-training-data pipeline
  * surface: tokenization, shingling, quality metrics, language ID,
  * fingerprinting. All pure built-in compositions (codegen'd, no UDFs), so
  * they hold up in 100 TB scans; every one of them has a textually-parallel
  * DuckDB formulation used by the correctness oracles.
  */
object TextFunctions {

  /** Whitespace tokens (single-space split — the corpus is single-space
    * separated; `split` drops nothing so counts match `string_split` in
    * DuckDB). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (order not guaranteed — use for set ops only). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles as strings ("w1 w2 w3"), distinct.
    * A document shorter than n words has zero shingles.
    * Native single-pass expression — see [[Shingles]] for why not the
    * declarative transform/sequence formulation. */
  def shingles(text: Column, n: Int): Column =
    TextExpressions.shingles(text, n)

  /** Every shingle occurrence in document order (NOT distinct) — the
    * multiset view frequency consumers (heavy hitters, n-gram LMs)
    * need; same native kernel. */
  def shinglesAll(text: Column, n: Int): Column =
    TextExpressions.shinglesAll(text, n)

  /** The pure-built-in shingle formulation (interpreted HOF lambdas —
    * ~25× slower than [[shingles]]; kept as a cross-check for tests). */
  def shinglesDeclarative(text: Column, n: Int): Column = {
    val ws = tokens(text)
    // NB: Spark's sequence(0, -1) DESCENDS ([0, -1]) rather than returning
    // empty — guard short docs explicitly.
    val idx = when(size(ws) >= n, sequence(lit(0), size(ws) - n))
      .otherwise(array().cast("array<int>"))
    array_distinct(
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*)))
  }

  /** Stopword-hit count against a small inline lexicon. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(array_intersect(tokens(text), array(stopwords.map(lit): _*)))

  /** Per-language stopword lexica for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast as literals into codegen. */
  val langLexica: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
  )

  /** Language-ID: argmax stopword-hit count over the lexica; ties broken by
    * lexicon order ("en" first); zero hits everywhere → "und" (undetermined).
    * Heuristic n-gram/stopword language ID in the spirit of fastText-style
    * baselines, but fully declarative. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langLexica.map { case (lang, words) =>
      (lang, size(array_intersect(toks, array(words.map(lit): _*))))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((lang, score), els) =>
      when(score === best && score > 0, lit(lang)).otherwise(els)
    }
  }

  /** BPE-ish subword-boundary tokenizer: letter runs, digit runs, and
    * single non-alphanumeric marks — the pre-tokenization split GPT-style
    * BPE vocabularies train over. Same regex semantics in Java and RE2,
    * so the DuckDB oracle (`regexp_extract_all`) matches exactly. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Blocklist token masking: every token that appears in `blocklist` is
    * replaced by `mask`, preserving single-space joining — the scrubbing
    * primitive for banned terms / PII-tagged vocabulary in a curation
    * pipeline. Native single-pass expression ([[RedactTokens]]); the
    * declarative HOF twin below is kept as a cross-check. DuckDB twin:
    * `array_to_string(list_transform(string_split(text,' '),
    * w -> CASE WHEN w IN (...) THEN mask ELSE w END), ' ')`. */
  def redact(text: Column, blocklist: Seq[String],
      mask: String = "<MASK>"): Column =
    TextExpressions.redact(text, blocklist, mask)

  /** The pure-built-in masking formulation (interpreted HOF lambdas) —
    * kept as a cross-check for tests, like [[shinglesDeclarative]]. */
  def redactDeclarative(text: Column, blocklist: Seq[String],
      mask: String = "<MASK>"): Column = {
    val bl = array(blocklist.map(lit): _*)
    array_join(transform(tokens(text), w =>
      when(array_contains(bl, w), lit(mask)).otherwise(w)), " ")
  }

  /** Sliding-window chunk indices for context-window chunking: chunk i
    * covers tokens [i·stride, i·stride + window). A doc of n ≤ window
    * tokens is one chunk; otherwise ⌊(n − window + stride − 1)/stride⌋ + 1
    * chunks (the last window may run short). Explode this and slice the
    * token array per index — all built-ins, so the DuckDB twin
    * (`range` + list slicing) matches exactly. */
  def chunkIndices(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val n = size(tokens(text))
    val nChunks = when(n <= window, lit(1L)).otherwise(
      floor((n - window + stride - 1).cast("double") / stride).cast("long")
        + 1L)
    sequence(lit(0L), nChunks - 1L)
  }

  /** Number of tokens [[redact]] would mask (occurrences, not distinct).
    * Native single-pass expression ([[RedactCount]]). */
  def redactCount(text: Column, blocklist: Seq[String]): Column =
    TextExpressions.redactCount(text, blocklist)

  /** Declarative twin of [[redactCount]] — cross-check only. */
  def redactCountDeclarative(text: Column, blocklist: Seq[String]): Column = {
    val bl = array(blocklist.map(lit): _*)
    size(filter(tokens(text), w => array_contains(bl, w)))
  }

  /** Pattern-PII lexicon for [[piiCount]]/[[piiRedact]] — the regex
    * scrubbing pass of C4/Dolma-style curation (emails, NANP-ish phone
    * fragments, dotted-quad IPs). Every pattern is deterministic
    * leftmost-first in BOTH Java regex and RE2 (no lookaround, no
    * backreferences), so DuckDB's `regexp_extract_all`/`regexp_replace
    * (…,'g')` reproduce the engine's matches byte-for-byte. Order
    * matters for redaction: emails first (their local parts may contain
    * digit runs a later pattern could nibble), then IPs, then phones. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "ipv4" -> """([0-9]{1,3}\.){3}[0-9]{1,3}""",
    "phone" -> """[0-9]{3}-[0-9]{4}""",
  )

  /** Occurrences of one PII pattern (codegen'd `regexp_extract_all`;
    * count on the RAW text, before any redaction). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Masks every [[PiiPatterns]] hit with `<KIND>` tags, in lexicon
    * order — one fused chain of global `regexp_replace`s (still a
    * single codegen'd projection; the text is scanned, never shuffled).
    * DuckDB twin: nested `regexp_replace(…, 'g')` in the same order. */
  def piiRedact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (kind, p)) =>
      regexp_replace(acc, lit(p), lit(s"<${kind.toUpperCase}>"))
    }

  /** Exact-dup fingerprint: md5 of the raw text (DuckDB `md5(text)` is
    * bit-identical). */
  def fingerprintMd5(text: Column): Column = md5(text.cast("binary"))

  /** 64-bit content fingerprint via xxhash64 — the engine-internal rolling
    * fingerprint (no cross-engine oracle; covered by property tests). */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Cross-engine-checkable 60-bit hash: the first 15 hex chars of md5,
    * read big-endian (fits a signed int64). DuckDB twin:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. Slower than xxhash64
    * (md5 + string slicing) — use only where an SQL oracle must reproduce
    * the hash; the engine default stays xxhash64. */
  def portableHash60(text: Column): Column =
    conv(substring(md5(text.cast("binary")), 1, 15), 16, 10).cast("long")

  /** 48-bit variant of [[portableHash60]] (first 12 hex chars): every
    * value is exactly representable as a Double (< 2^53), so a
    * double-scored bounded heap ([[TopKByScore]]) selects the identical
    * rows as a SQL `ORDER BY` on the exact integer hash. DuckDB twin:
    * `CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)`. */
  def portableHash48(text: Column): Column =
    conv(substring(md5(text.cast("binary")), 1, 12), 16, 10).cast("long")
}
