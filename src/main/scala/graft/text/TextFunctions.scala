package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization and text-analysis expressions.
  *
  * The normalization chain re-expresses the reference's Markdown cleanup
  * (/root/reference/src/managers/markdown_manager.py:52-69 — SURVEY.md
  * §2.8 F1–F8) as pure built-in `Column` transforms, so the whole chain
  * stays inside whole-stage codegen: no UDFs, no per-row JVM↔interpreter
  * hops, and Catalyst can pipeline it with the parquet scan.
  *
  * The analysis block (language-ID, quality scoring, token counting,
  * fingerprinting) is the training-data-pipeline surface: every score is
  * a deterministic closed-form expression so a DuckDB oracle can verify
  * it bit-for-bit.
  */
object TextFunctions {

  // --- normalization chain (reference markdown_manager.py:52-69) ---

  /** F1: drop lines that contain a bracketed ellipsis `[...]`
    * (markdown_manager.py:55). */
  def dropEllipsisLines(c: Column): Column =
    regexp_replace(c, "(?m)^.*\\[\\.+\\].*$\\n?", "")

  /** F3: CRLF → LF (markdown_manager.py:59). */
  def normalizeNewlines(c: Column): Column = regexp_replace(c, "\r\n", "\n")

  /** F4: collapse runs of spaces/tabs (markdown_manager.py:61). */
  def collapseSpaces(c: Column): Column = regexp_replace(c, "[ \\t]+", " ")

  /** F5: cap consecutive blank lines at two (markdown_manager.py:63-64). */
  def capBlankLines(c: Column): Column = regexp_replace(c, "\n{3,}", "\n\n")

  /** F6: strip soft hyphens U+00AD (markdown_manager.py:66). */
  def stripSoftHyphen(c: Column): Column = translate(c, "­", "")

  /** F7: de-hyphenate words split across line breaks
    * (markdown_manager.py:67-68). */
  def dehyphenate(c: Column): Column =
    regexp_replace(c, "(\\w)[-‐‑−]\n(\\w)", "$1$2")

  /** F8: trim (markdown_manager.py:69). */
  def trimText(c: Column): Column = trim(c)

  /** The full normalization pipeline in reference order (F1,F3–F8).
    * NFKC (F2) is applied separately via [[graft.functions.Nfkc]] since
    * it needs a custom expression. */
  def normalize(c: Column): Column =
    trimText(dehyphenate(stripSoftHyphen(capBlankLines(collapseSpaces(
      normalizeNewlines(dropEllipsisLines(c)))))))

  /** F9: alt-text sanitize (image_manager.py:22-33): collapse whitespace,
    * strip markdown link chars, default to "image". */
  def sanitizeAltText(c: Column): Column = {
    val cleaned = trim(regexp_replace(regexp_replace(c, "\\s+", " "), "[\\[\\]()]", ""))
    coalesce(nullif(cleaned, lit("")), lit("image"))
  }

  // --- tokenization ---

  /** Whitespace tokens of already-normalized text. */
  def tokens(c: Column): Column = split(trimText(c), "\\s+")

  /** Token count (whitespace tokenization), BIGINT for oracle parity. */
  def tokenCount(c: Column): Column =
    when(length(trimText(c)) === 0, lit(0L))
      .otherwise(size(tokens(c)).cast("long"))

  /** BPE-ish subword proxy: counts alternating letter/digit/punct runs,
    * the usual pre-tokenization regex shape. */
  def bpeishTokenCount(c: Column): Column =
    when(length(trimText(c)) === 0, lit(0L))
      .otherwise(size(split(trimText(c), "\\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])")).cast("long"))

  // --- language identification (n-gram/stopword heuristic) ---

  /** Stopword lists per language. Scoring counts TOKENS in the set —
    * deliberately not regex-\b-based: Java and RE2 disagree about word
    * boundaries adjacent to non-ASCII letters (e.g. Java does not match
    * `\ble\b` inside "ﬁle", RE2 does), so token-set membership is the
    * portable formulation. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "for", "with", "that"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "zu", "ein", "eine", "mit"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "dans", "que", "une", "pour"),
  )

  /** Per-language stopword hit count: tokens of `c` in the word set. */
  def langScore(c: Column, words: Seq[String]): Column =
    langScoreOnTokens(tokens(c), words)

  /** Hit count over an already-materialized token array — the form to
    * use when several languages are scored on the same text, so the
    * regex tokenization runs ONCE (behind a Generate barrier; see
    * SparkEntry.textLangId) instead of once per score column. `isin`
    * compiles to an InSet hash probe, not a 10-literal array scan. */
  def langScoreOnTokens(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Predicted language: argmax of stopword hit counts with a stable
    * tie-break on language code; "und" (undetermined) when no stopword
    * matches at all. */
  def langId(c: Column): Column = {
    val scored = langStopwords.map { case (code, words) =>
      struct((-langScore(c, words)).as("negScore"), lit(code).as("code"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("negScore") === 0, lit("und"))
      .otherwise(best.getField("code"))
  }

  // --- quality scoring ---

  /** Ratio of non-alphanumeric-non-space chars to total chars. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(regexp_count(c, lit("[^a-zA-Z0-9\\s]")).cast("double") / length(c))

  /** Ratio of English stopword tokens to all tokens. */
  def stopwordRatio(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(langScore(c, langStopwords.head._2).cast("double") / tokenCount(c))

  /** Mean token length: exact integer ratio → deterministic double. */
  def avgTokenLen(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(regexp_count(c, lit("\\S")).cast("double") / tokenCount(c))

  // --- PII scrubbing ---
  //
  // Regex redaction of the machine-recognizable identifier shapes a
  // training-data pipeline scrubs before tokenization. Patterns are
  // restricted to the Java-regex ∩ RE2 common subset (no backrefs, no
  // lookaround; \b is the ASCII word boundary in both) so the DuckDB
  // oracle evaluates them identically. Purely map-side: at 100 TB this
  // is a projection inside whole-stage codegen, no shuffle.

  /** Email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literals. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Standalone digit runs of 9+ (account/SSN/phone-shaped). */
  val LongNumRe = "\\b\\d{9,}\\b"

  /** Redact emails, then IPv4s, then long digit runs (email first so
    * its digits never partially match the later patterns). */
  def piiScrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  // --- encoding-artifact (mojibake) detection ---
  //
  // Extraction pipelines feeding a training corpus routinely mis-decode
  // bytes (UTF-8 read as cp1252, lossy transcodes leaving U+FFFD, C1
  // controls from latin-1 round trips). These are the ftfy-class signals
  // a quality gate filters on, as counting expressions in the Java ∩ RE2
  // regex subset (literal characters and one \x{..} class — identical
  // semantics in both engines). Purely map-side: a projection inside
  // whole-stage codegen at any scale, no shuffle.

  /** U+FFFD replacement characters — lossy-decode droppings. */
  val ReplacementRe = "�"

  /** C1 control block U+0080–U+009F: bytes a cp1252→latin-1 confusion
    * maps to controls instead of punctuation (the ’ “ ” – — family). */
  val C1ControlRe = "[\\x{0080}-\\x{009F}]"

  /** Classic UTF-8-read-as-cp1252 digraphs: accented latin letters
    * become "Ã" + a continuation char, smart punctuation becomes
    * "â€¦"-style triples, and NBSP-padded symbols gain "Â". The
    * alternatives are distinct literals, so leftmost non-overlapping
    * counting is engine-independent. */
  val MojibakeRe =
    "Ã©|Ã¨|Ã¡|Ã¤|Ã¶|Ã¼|Ã±|Ã§|â€™|â€œ|â€|â€“|â€”|â€¦|Â°|Â·|Â»|Â«"

  // --- fingerprinting ---

  /** Canonical document fingerprint: lowercase, strip non-alphanumerics,
    * collapse whitespace, md5. Exact-dedup key (SURVEY.md §7.3 step 5). */
  def fingerprint(c: Column): Column =
    md5(to_binary(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")), lit("utf-8")))

  /** First 15 hex digits of md5 as a positive int64 — the portable hash
    * used by minhash/simhash so the DuckDB oracle (CAST('0x…' AS BIGINT))
    * agrees bit-for-bit with Spark's `conv`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling hash of the whole text (Rabin-Karp base-31 mod
    * 2^31-1): a left fold over code points — identical sequential
    * evaluation in the oracle's list_reduce. */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(sequence(lit(1), greatest(length(c), lit(1))),
        i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 2147483647L)

  /** k-gram rolling fingerprints (the document-fingerprinting
    * primitive): hash of every k-char window; summarized by the window
    * minimum — the winnowing-style representative fingerprint. */
  def kgramMinFingerprint(c: Column, k: Int = 8): Column = {
    val n = length(c)
    val hashes = transform(
      sequence(lit(1), greatest(n - (k - 1), lit(1))),
      i => aggregate(
        transform(sequence(lit(0), lit(k - 1)),
          j => ascii(c.substr((i + j).cast("int"), lit(1))).cast("long")),
        lit(0L),
        (acc, x) => (acc * 31 + x) % 2147483647L))
    array_min(hashes)
  }
}
