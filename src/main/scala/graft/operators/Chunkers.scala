package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** The chunking operators — the reference's signature row→many-rows layer
  * (SURVEY.md §2.3; `/root/reference/index_documents.py:66-134`).
  *
  * Every chunker exists in two equivalent forms:
  *
  *   - '''typed''': pure Scala `String => Seq[String]` mirroring the reference
  *     loop exactly (incl. cursor-advance on empty windows, short last chunk,
  *     greedy sentence grouping). Used via `Dataset.flatMap` and as the
  *     semantic reference in property tests.
  *   - '''relational''': a Catalyst `Column` expression chain
  *     (`posexplode(sequence(...))` + `substring` + regex trim) — fully
  *     whole-stage-codegen'd, zero per-row lambdas, the 100 TB path, and
  *     DuckDB-oracle-checkable.
  *
  * Equivalence of the two forms is proven by scalacheck property G1.
  */
object Chunkers {

  // ---------------------------------------------------------------- typed ---

  /** Python str.strip() semantics, exactly: Python's str.isspace() is true
    * for Unicode Zs/Zl/Zp plus \t\n\v\f\r\x1c-\x1f\x85 — a SUPERSET of
    * Java's Character.isWhitespace, which excludes the non-breaking spaces
    * (U+00A0, U+2007, U+202F) and U+0085. Golden-tested against the
    * executed reference (GoldenChunkersSpec).
    */
  private[operators] def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) || (Character.getType(c) match {
      case Character.SPACE_SEPARATOR | Character.LINE_SEPARATOR |
           Character.PARAGRAPH_SEPARATOR => true
      case _ => c == '\u0085'
    })

  private[operators] def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && pyIsSpace(s.charAt(i))) i += 1
    while (j > i && pyIsSpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Fixed-size char windows with overlap (index_documents.py:79-103).
    * Exact semantics: window `[start, start+chunkSize)`, stripped; empty
    * windows are dropped but the cursor still advances (:93-95); the loop
    * breaks on the first window whose end reaches the text length (:97-98),
    * so the last chunk may be short; stride = chunkSize - overlap (:100).
    *
    * "char" means UNICODE CODE POINT, not UTF-16 unit: Python `len`/slicing
    * (the reference), Spark `length`/`substring` ([[fixedRelational]]) and
    * DuckDB (the oracle) all count code points, so astral-plane text (emoji)
    * must window identically here. Cursor arithmetic walks char offsets
    * incrementally via `offsetByCodePoints` — O(text), no per-window rescan.
    */
  def fixedTyped(text: String, chunkSize: Int, overlap: Int): Seq[String] = {
    require(chunkSize > 0, "chunk_size must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be >= 0 and smaller than chunk_size")
    val nCp = text.codePointCount(0, text.length)
    val stride = chunkSize - overlap
    val out = Seq.newBuilder[String]
    var startCp = 0
    var startChar = 0
    var done = nCp == 0
    while (!done) {
      val endCp = math.min(startCp + chunkSize, nCp)
      val endChar = text.offsetByCodePoints(startChar, endCp - startCp)
      val piece = pyStrip(text.substring(startChar, endChar))
      if (piece.nonEmpty) out += piece
      if (endCp >= nCp) done = true
      else {
        startChar = text.offsetByCodePoints(startChar, stride)
        startCp += stride
      }
    }
    out.result()
  }

  /** Paragraph split (index_documents.py:69-70): split on `\n\s*\n` (note:
    * `\s` includes `\n`, so a line of only spaces separates paragraphs),
    * strip each, drop empty.
    */
  def paragraphsTyped(text: String): Seq[String] =
    // (?U): Python's re \s is Unicode-aware (NBSP etc.); Java default is ASCII
    text.split("(?U)\\n\\s*\\n", -1).iterator.map(pyStrip).filter(_.nonEmpty).toSeq

  /** Naive sentence split (index_documents.py:72-77): split after `.` `!` `?`
    * followed by whitespace (lookbehind keeps the punctuation); strip; drop
    * empty. Abbreviations split ("Dr. Smith" → ["Dr.", "Smith ..."]).
    */
  def sentencesTyped(text: String): Seq[String] =
    pyStrip(text).split("(?U)(?<=[.!?])\\s+", -1).iterator.map(pyStrip).filter(_.nonEmpty).toSeq

  /** Greedy sentence grouping (index_documents.py:110-129): pack sentences
    * into chunks of ≈ `target = max(200, chunkSize)` chars; a sentence starts
    * a new group iff the buffer is non-empty AND `bufLen + len(s) + 1 >
    * target`; groups joined with a single space (original whitespace NOT
    * preserved); a single over-long sentence becomes its own chunk.
    *
    * `bufLen` replicates the reference's counter EXACTLY, which is NOT the
    * joined length: it adds `len(s)+1` on every append — including the first
    * sentence of the document, so the initial buffer carries a phantom +1 —
    * but resets to exactly `len(s)` after an overflow flush (:121-124). The
    * two differ by one at the `bufLen + len(s) + 1 == target` boundary.
    */
  def sentenceGroupsTyped(text: String, chunkSize: Int): Seq[String] = {
    val target = math.max(200, chunkSize)
    val out = Seq.newBuilder[String]
    val buf = new StringBuilder
    var bufLen = 0
    for (s <- sentencesTyped(text)) {
      // Python len = code points (astral chars count once, as in fixedTyped)
      val sLen = s.codePointCount(0, s.length)
      if (buf.nonEmpty && bufLen + sLen + 1 > target) {
        out += buf.toString
        buf.clear()
        buf.append(s)
        bufLen = sLen
      } else {
        if (buf.nonEmpty) buf.append(' ')
        buf.append(s)
        bufLen += sLen + 1
      }
    }
    if (buf.nonEmpty) out += buf.toString
    out.result()
  }

  /** Strategy dispatcher (index_documents.py:106-134). `overlap` ignored for
    * sentence/paragraph; `chunkSize` ignored for paragraph.
    */
  def splitTyped(text: String, strategy: SplitStrategy): Seq[String] = strategy match {
    case SplitStrategy.Fixed(size, overlap) => fixedTyped(text, size, overlap)
    case SplitStrategy.Sentence(size)       => sentenceGroupsTyped(text, size)
    case SplitStrategy.Paragraph            => paragraphsTyped(text)
  }

  /** Typed Dataset form: one document row → N chunk rows, chunkIndex = the
    * 0-based emit order (deterministic id, SURVEY.md §7.4).
    * Narrow dependency only — no shuffle; parallelism unit = documents.
    */
  def chunkDataset(docs: Dataset[RawDocument], strategy: SplitStrategy)(
      implicit spark: SparkSession): Dataset[Chunk] = {
    import spark.implicits._
    docs.flatMap { d =>
      splitTyped(d.text, strategy).zipWithIndex.map { case (c, i) =>
        Chunk(d.docId, d.filename, i, strategy.name, c)
      }
    }
  }

  // ----------------------------------------------------------- relational ---

  /** ASCII-whitespace strip, portable between Java regex and RE2/DuckDB. */
  private def rstrip(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  /** Relational fixed-overlap chunker: explodes `df` into one row per kept
    * chunk. Adds `win_pos` (0-based window position — the cursor index, which
    * advances even over dropped-empty windows, matching the reference) and
    * `chunk_text` (stripped, non-empty).
    *
    * Window count = floor(max(len - overlap - 1, 0) / stride) + 1 — verified
    * equivalent to the reference loop (property G1).
    * Fully codegen'd: sequence → posexplode → substring → trim → filter.
    */
  def fixedRelational(df: DataFrame, textCol: Column, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize)
    val stride = chunkSize - overlap
    val nWin = floor(greatest(length(textCol) - overlap - 1, lit(0)) / stride) + 1
    df.select(col("*"), posexplode(sequence(lit(0), (nWin - 1).cast("int"))).as(Seq("win_pos", "_w")))
      .withColumn("chunk_text", rstrip(substring(textCol, col("win_pos") * stride + 1, lit(chunkSize))))
      .where(length(col("chunk_text")) > 0 && length(textCol) > 0)
      .drop("_w")
  }

  /** Relational paragraph split: one row per non-empty stripped paragraph. */
  def paragraphsRelational(df: DataFrame, textCol: Column): DataFrame =
    df.select(col("*"), posexplode(split(textCol, "\\n\\s*\\n")).as(Seq("para_pos", "para_raw")))
      .withColumn("para_text", rstrip(col("para_raw")))
      .where(length(col("para_text")) > 0)
      .drop("para_raw")

  /** Relational sentence split. Java-regex lookbehind — NOT RE2/DuckDB
    * portable (SURVEY.md §5.3); covered by golden tests, excluded from t2.
    */
  def sentencesRelational(df: DataFrame, textCol: Column): DataFrame =
    df.select(col("*"),
        posexplode(split(rstrip(textCol), "(?<=[.!?])\\s+")).as(Seq("sent_pos", "sent_raw")))
      .withColumn("sent_text", rstrip(col("sent_raw")))
      .where(length(col("sent_text")) > 0)
      .drop("sent_raw")

  /** RE2-portable sentence segment pattern — the lookbehind split
    * `(?<=[.!?])\s+` re-expressed without lookaround: a segment is a maximal
    * run whose internal whitespace never directly follows `[.!?]` (a
    * punctuation run inside a segment must be followed by a non-space
    * char; a trailing punctuation run ends the segment). Whitespace the
    * split would consume lands at the next segment's head and is stripped,
    * so stripped outputs are identical.
    */
  val SentenceSegmentPattern = "[^.!?]*(?:[.!?]+[^.!?\\s][^.!?]*)*[.!?]*"

  /** DuckDB-oracle-portable relational sentence split via
    * [[SentenceSegmentPattern]] (regexp_extract_all — no lookaround, runs
    * identically under Java regex and RE2). One deliberate divergence from
    * the typed/reference path: `\s` here is ASCII, so Unicode whitespace
    * (NBSP, thin space) after punctuation does NOT split — the same
    * documented portability stance as TextFunctions.strip. Equivalence with
    * [[sentencesTyped]] on ASCII-whitespace text is spec-tested.
    */
  def sentencesRelationalPortable(df: DataFrame, textCol: Column): DataFrame =
    df.select(col("*"),
        posexplode(
          filter(
            transform(
              regexp_extract_all(rstrip(textCol), lit(SentenceSegmentPattern), lit(0)),
              s => rstrip(s)),
            s => length(s) > 0))
          .as(Seq("sent_pos", "sent_text")))
}
