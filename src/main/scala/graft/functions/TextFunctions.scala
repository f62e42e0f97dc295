package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text operators mirroring the reference's normalization layer.
  *
  * All of these are pure Spark built-ins (whole-stage-codegen'd); no UDFs.
  * Semantics replicate `/root/reference/index_documents.py` exactly:
  *   - `cleanText`  ≡ `clean_text`        (index_documents.py:58-63)
  *   - `strip`      ≡ Python `str.strip()` (whitespace, not just spaces)
  */
object TextFunctions {

  /** Leading/trailing whitespace strip over ASCII `\s` (space/tab/newline/
    * CR/FF/VT) — deliberately ASCII, because Java-default and RE2/DuckDB
    * `\s` agree on exactly this set, keeping the whole cleanText chain
    * oracle-portable. Python's str.strip() additionally strips NBSP/U+0085/
    * Unicode Zs — that EXACT semantics lives in the typed chunkers
    * (Chunkers.pyStrip, golden-tested); here the only NBSP in play is
    * already normalized to a plain space by cleanText step 1.
    */
  def strip(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** The reference's `clean_text` (index_documents.py:58-63):
    *   1. NBSP (U+00A0) -> space
    *   2. runs of spaces/tabs -> single space (newlines untouched)
    *   3. 3+ consecutive newlines -> exactly two
    *   4. strip
    * All three regexes are portable across Java regex and RE2 (no
    * lookaround/backrefs), so the same chain is DuckDB-oracle-checkable.
    */
  def cleanText(c: Column): Column =
    strip(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, " ", " "),
          "[ \\t]+", " "),
        "\\n{3,}", "\n\n"))

  /** Lowercased word tokens (letters/digits runs). */
  def wordTokens(c: Column): Column =
    filter(split(lower(c), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** BPE-ish token stream: letter runs, digit runs, or single punctuation.
    * RE2-portable, used by the token-count analysis operator.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeishPattern), lit(0)))

  /** Whitespace-delimited word count. */
  def wordCount(c: Column): Column =
    when(length(strip(c)) === 0, lit(0))
      .otherwise(size(split(strip(c), "\\s+")))

  /** PII redaction for training-data pipelines (EXT): emails, then IPv4
    * addresses, then phone numbers, replaced by typed placeholder tags —
    * IN THAT ORDER, and the order is load-bearing: email first so its
    * digit/dot runs can't be half-eaten by the later patterns, and IPv4
    * BEFORE phone because the phone pattern (digits with dot/dash/space
    * separators) would otherwise consume dotted quads as phone numbers.
    * The q60 DuckDB oracle replays exactly this chain — reordering here
    * diverges from it. All three patterns are RE2-portable (no lookaround,
    * no backrefs). Deliberately conservative: phone requires 7+ chars of
    * digits-with-separators between digit endpoints, IPv4 the full dotted
    * quad; date-like strings are accepted casualties, as in most scrubbers.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\-\\. ]{5,}[0-9]"
  val Ipv4Pattern  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** HTML → text for crawl corpora: drop script/style/head blocks wholesale
    * (their content is never prose), strip comments and all remaining tags,
    * decode the common entities, collapse runs of whitespace, trim. All
    * RE2-portable ((?is) inline flags, no lookarounds) so extraction
    * replays exactly in the oracle. Not a DOM parser by design: crawl
    * pipelines favor a deterministic regex chain over tag-soup recovery,
    * and malformed fragments degrade to leaving text in place rather than
    * failing.
    */
  /** The strip chain, shared verbatim by the Column form, the plain-String
    * form (file-ingestion extractor), and — pattern for pattern — the
    * DuckDB oracle. Entity names are regex-safe literals; replacements
    * contain no $ or \, so Column regexp_replace and String.replaceAll
    * behave identically.
    */
  private val HtmlStripSteps: Seq[(String, String)] = Seq(
    "(?is)<(script|style|head)\\b[^>]*>.*?</(script|style|head)>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?s)<[^>]*>" -> " ",
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'",
    "\\s+" -> " ", "^ | $" -> "")

  def stripHtml(c: Column): Column =
    HtmlStripSteps.foldLeft(c) { case (col0, (p, r)) => regexp_replace(col0, p, r) }

  /** Unicode normalization (codegen'd native expression — see
    * [[org.apache.spark.sql.graft.UnicodeNormalizeExpr]]): NFKC for
    * tokenizer prep (ligatures split, full-width folded), NFC for
    * exact-dedup canonicalization (combining sequences composed).
    */
  def normalizeUnicode(c: Column, form: String = "NFKC"): Column =
    org.apache.spark.sql.graft.TextColumns.normalizeUnicode(c, form)

  /** Repair MOJIBAKE — UTF-8 text that was mis-decoded as Latin-1 and
    * re-encoded ("cafÃ©" for "café"), endemic in web crawls. The repair is
    * the inverse trip: re-encode as Latin-1, STRICTLY re-decode as UTF-8 —
    * applied only when the round trip succeeds and strictly shrinks the
    * string (real double-encoding always does; legitimate Latin-1-range
    * text fails the strict decode and healthy multibyte text fails the
    * Latin-1 re-encode, so both pass through unchanged). Idempotent. A
    * native codegen'd expression — Spark 4's `decode` throws on malformed
    * bytes, so the built-ins cannot express the try-and-fall-back
    * ([[org.apache.spark.sql.graft.MojibakeFixExpr]]).
    */
  def fixMojibake(c: Column): Column =
    org.apache.spark.sql.graft.TextColumns.fixMojibake(c)

  /** Plain-Scala twin of [[stripHtml]] for per-file extraction contexts
    * (equivalence-tested against the Column form).
    */
  def stripHtmlString(s: String): String =
    HtmlStripSteps.foldLeft(s) { case (s0, (p, r)) => s0.replaceAll(p, r) }

  /** Registered host of a URL, lower-cased, leading "www." stripped —
    * the key for crawl-data domain filtering/mixing. RE2-portable (no
    * lookarounds); non-URLs yield the empty string.
    */
  def urlDomain(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)),
      "^www\\.", "")

  /** Canonical URL normalization — the crawl-side counterpart of content
    * dedup: the same page is fetched as `HTTPS://WWW.Site.example:443/a/`
    * and `https://site.example/a?utm_source=x`, and URL-level dedup only
    * works after both collapse to one key. Rules (each a narrow
    * RE2-portable expression; one pass, no UDF):
    *
    *   1. fragment dropped (`#…` is client-side);
    *   2. scheme and host lower-cased; leading `www.` and default ports
    *      `:80`/`:443` stripped from the host;
    *   3. tracking parameters removed (`utm_*`, `gclid`, `fbclid`);
    *   4. surviving query parameters SORTED (order is almost never
    *      semantic; sorting makes the key order-insensitive);
    *   5. trailing path slashes stripped.
    *
    * Non-URLs (no `scheme://`) canonicalize to the empty string — the
    * [[urlDomain]] contract.
    */
  def canonicalUrl(url: Column): Column = {
    val u1 = regexp_replace(url, "#.*$", "") // 1. fragment
    val scheme = lower(regexp_extract(u1, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(u1, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        ":(80|443)$", ""),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(u1, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val params = filter(split(regexp_extract(u1, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid)(=|$)"))
    val qstr = array_join(array_sort(params), "&")
    when(scheme === "", lit(""))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(qstr === "", lit("")).otherwise(concat(lit("?"), qstr))))
  }

  /** True when `domain` is a blocklisted domain OR a subdomain of one
    * (suffix match on ".<blocked>") — standard crawl blocklist semantics.
    * The blocklist is a broadcast literal: per-row work is a bounded scan
    * of a small array, no join.
    */
  def domainBlocked(domain: Column, blocklist: Seq[String]): Column =
    exists(lit(blocklist.map(_.toLowerCase).toArray),
      b => domain === b || domain.endsWith(concat(lit("."), b)))

  /** Word n-gram shingles (distinct) over a precomputed token-array column,
    * for MinHash / Jaccard dedup. Callers must materialize the token array
    * once (`withColumn("toks", wordTokens(c))`) — passing `wordTokens(c)`
    * directly here would re-evaluate the tokenization per shingle position
    * (O(len^2) expression work per row; a scale-killer on long documents).
    * Documents with fewer than `n` tokens yield an empty array (no partial
    * shingles — an empty doc must not Jaccard-match every other empty doc).
    */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(0), size(tokens) - n),
            i => concat_ws(" ", slice(tokens, i + 1, lit(n))))))
}
