package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data
  * pipelines: tokenization, token counting, quality scoring, language
  * identification, and document fingerprinting.
  *
  * Everything here is a pure Catalyst expression tree (no UDFs), so the
  * whole pipeline stays inside whole-stage codegen and scales linearly
  * with input splits — at 100 TB these are embarrassingly parallel
  * narrow transforms with zero shuffles.
  *
  * Determinism contract: every function is reproducible in ANSI SQL
  * (the DuckDB oracles in [[graft.PipelineQueries]] mirror the exact
  * formulas), which is what makes the correctness gate possible. The
  * shared hash is a 31-polynomial over codepoints mod `P` — chosen over
  * murmur3 because it is engine-portable and keeps every intermediate
  * in 63 bits (no overflow, DuckDB BIGINT errors on wrap).
  */
object TextFunctions {

  /** Modulus for the portable polynomial hash (large prime < 2^30). */
  val P = 1000000007L

  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable polynomial rolling hash of a string:
    * `h = (h*31 + codepoint) mod P`, left to right.
    * Dispatches to the fused codegen'd [[PolyHashExpr]]; the
    * declarative formulation below is the SQL-portable reference
    * semantics (bit-identical — the oracle gate checks it).
    */
  def polyHash(s: Column): Column = NativeExpressions.polyHash(s)

  /** Declarative (pure built-in) polyHash — same values as
    * [[polyHash]], kept as the portable specification and for engines
    * without the extension.
    */
  def polyHashDeclarative(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => (h * lit(31L) + c) % lit(P))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: words, digits and punctuation marks counted
    * as separate tokens via a regex lexer (the usual pre-tokenizer
    * approximation when no real BPE vocab is shipped).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))

  /** English stopword list used by quality scoring / language ID. */
  val StopEn = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val StopDe = Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu")
  val StopFr = Seq("le", "la", "et", "les", "des", "un", "que", "je")
  val StopEs = Seq("el", "los", "de", "que", "y", "en", "un", "no")

  private def stopArr(words: Seq[String]): Column = array(words.map(lit): _*)

  /** Fraction of tokens that are stopwords of the given list. */
  def stopwordRatio(text: Column, words: Seq[String] = StopEn): Column = {
    val tk = tokens(text)
    size(filter(tk, t => array_contains(stopArr(words), t))).cast("double") /
      greatest(size(tk), lit(1)).cast("double")
  }

  /** Fraction of characters that are not lowercase alnum or space. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val tk = tokens(text)
    aggregate(tk, lit(0L), (a, t) => a + length(t)).cast("double") /
      greatest(size(tk), lit(1)).cast("double")
  }

  /** Text normalization for dedup/analysis canonicalization: lowercase
    * + collapse whitespace runs to single spaces + trim. Narrow,
    * engine-portable (ASCII-safe regex; Unicode case mapping agrees
    * across JVM and DuckDB for the corpus scripts).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Markup extraction (the WARC→WET step of a web-crawl pipeline):
    * strip HTML/XML down to its text content — drop `<script>`,
    * `<style>` and comment blocks wholesale, strip remaining tags,
    * unescape the common entities, collapse whitespace. A regex
    * extractor, not a conforming HTML5 parser (no entity table beyond
    * the core six, no CDATA) — the trafilatura/jusText preprocessing
    * shape, chosen because every step is an engine-portable codegen'd
    * expression: zero shuffle, linear in bytes, and the DuckDB oracle
    * replays the identical pattern chain (RE2 and java.util.regex
    * agree on this restricted syntax).
    *
    * `&amp;` is unescaped LAST so double-escaped entities surface as
    * their single-escaped literal (standard single-pass unescape).
    */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (f, r)) => replace(c, lit(f), lit(r)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Repetition ratio (Gopher-style quality signal): fraction of word
    * n-gram occurrences that are repeats of an earlier gram —
    * `1 - distinct/total`. Templated/spammy text scores high. Built on
    * the fused shingle-hash kernel; total grams = tokens - n + 1.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = tokenCount(text) - lit(n - 1)
    val distinctGrams = size(NativeExpressions.shingleHashes(text, n))
    when(total > 0,
      lit(1.0) - distinctGrams.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Heuristic document quality score in [0,1]: length saturation,
    * cleanliness (low punctuation), stopword plausibility, word-length
    * plausibility. Weights mirror common pretraining-corpus filters
    * (length/punct/stopword ratios).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    lit(0.4) * least(nTok / lit(100.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.2) * stopwordRatio(text) +
      lit(0.1) * least(meanTokenLength(text) / lit(8.0), lit(1.0))
  }

  /** Fraction of characters in the CJK unified ideograph block. */
  def cjkRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[一-鿿]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** N-gram/stopword-heuristic language ID over {en,de,fr,es,zh}:
    * CJK-dominant text → zh, otherwise argmax of per-language stopword
    * hit ratios with a fixed tie-break order (en,de,fr,es); all-zero →
    * "und". Deterministic and SQL-portable.
    */
  def langId(text: Column): Column = {
    val en = stopwordRatio(text, StopEn)
    val de = stopwordRatio(text, StopDe)
    val fr = stopwordRatio(text, StopFr)
    val es = stopwordRatio(text, StopEs)
    when(cjkRatio(text) > lit(0.3), lit("zh"))
      .when(en === lit(0.0) && de === lit(0.0) && fr === lit(0.0) && es === lit(0.0), lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Email address pattern — deliberately simple so both regex engines
    * (Java on the Spark side, RE2 in the DuckDB oracle) parse it
    * identically: no backtracking constructs, no lookaround. Explicit
    * a-zA-Z classes (not `(?i)`) keep the case-insensitivity visible
    * and engine-agnostic — a lowercase-only pattern would let
    * `Jane.Doe@Example.COM` survive redaction.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Phone-number pattern: leading digit or +, 6+ inner phone chars
    * (digits, space, dash, parens), trailing digit.
    */
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Count of email-shaped spans (PII detection signal). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))

  /** Count of phone-shaped spans, measured AFTER email redaction so an
    * address's digits can't double-count as a phone number.
    */
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(
      regexp_replace(text, EmailRe, "[EMAIL]"), lit(PhoneRe), lit(0)))

  /** PII-redacted text: emails then phones replaced with typed mask
    * tokens — the order is load-bearing (the email regex consumes its
    * digits first, so the phone pass can't split an address). Both
    * passes are leftmost-first global replaces, which Java regex and
    * RE2 agree on — the redacted text is engine-portable.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    * hash every `k`-char gram, take the minimum of each sliding window
    * of `w` hashes, return the sorted distinct selections. Robust to
    * local edits; the standard near-dup sketch for plagiarism-style
    * matching. Empty result for texts shorter than `k + w - 1` chars.
    */
  def fingerprint(text: Column, k: Int = 8, w: Int = 4): Column =
    NativeExpressions.winnowFp(text, k, w)

  /** Declarative fingerprint — the SQL-portable specification,
    * bit-equal to [[fingerprint]] (spec-checked). Materializes the
    * k-gram hash array per row; use only for small verification runs.
    */
  def fingerprintDeclarative(text: Column, k: Int = 8, w: Int = 4): Column = {
    val m = length(text) - lit(k - 1) // number of k-grams
    val kh = transform(sequence(lit(1), m), i => polyHash(text.substr(i, lit(k))))
    val mins = transform(sequence(lit(1), m - lit(w - 1)), j => array_min(slice(kh, j, lit(w))))
    when(length(text) >= lit(k + w - 1), array_sort(array_distinct(mins)))
      .otherwise(array().cast("array<bigint>"))
  }
}
