package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import TextFunctions._

/** Text-analysis operators for training-data pipelines (EXT mandate,
  * SURVEY.md §2.9 V5): language-ID, quality scoring, token counting,
  * fingerprinting. All pure Column expressions (codegen'd, no UDFs) and
  * RE2-portable so every one of them is DuckDB-oracle-checkable.
  */
object TextAnalysis {

  /** Tiny stopword inventories for the n-gram/stopword language heuristic.
    * Deliberately small and hardcoded: the point is the OPERATOR SHAPE
    * (tokenize once → set-intersect → argmax), which at 100 TB is a narrow
    * per-row expression over a broadcast-literal word list.
    */
  val StopwordsEn: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is",
    "that", "it", "for", "on", "with", "as", "are", "was", "be", "this")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht",
    "ein", "eine", "zu", "mit", "auf", "für", "von", "im", "den")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une",
    "de", "des", "du", "pas", "pour", "dans", "que", "qui")

  private def hitRatio(tokens: Column, words: Seq[String]): Column =
    when(size(tokens) === 0, lit(0.0)).otherwise(
      size(array_intersect(tokens, lit(words.toArray))).cast("double") / size(tokens))

  /** Heuristic language id over a materialized token-array column: the
    * language whose stopword hit-ratio is highest; 'und' (undetermined) when
    * all ratios are zero. Argmax via array_max over (ratio, lang) structs —
    * ties break to the lexicographically LARGEST lang tag, deterministic.
    */
  def langId(tokens: Column): Column = {
    val scored = array(
      struct(hitRatio(tokens, StopwordsEn).as("r"), lit("en").as("l")),
      struct(hitRatio(tokens, StopwordsDe).as("r"), lit("de").as("l")),
      struct(hitRatio(tokens, StopwordsFr).as("r"), lit("fr").as("l")))
    val best = array_max(scored)
    when(best.getField("r") === 0.0, lit("und")).otherwise(best.getField("l"))
  }

  /** Ratio of punctuation chars to total chars (0 for empty text). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      (length(c) - length(regexp_replace(c, "[\\p{P}]", ""))).cast("double") / length(c))

  /** Mean word length over a token array (0 for no tokens). */
  def meanWordLen(tokens: Column): Column =
    when(size(tokens) === 0, lit(0.0)).otherwise(
      aggregate(tokens, lit(0L), (a, t) => a + length(t)).cast("double") / size(tokens))

  /** Composite quality score in [0,1]: rewards reasonable length, a healthy
    * stopword ratio, moderate punctuation, and plausible mean word length.
    * The exact weights are ours (the reference has no quality scoring); the
    * formula is deterministic and portable for oracle checking.
    */
  def qualityScore(text: Column, tokens: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(hitRatio(tokens, StopwordsEn) * 4.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val mwl = meanWordLen(tokens)
    val wordScore = when(mwl >= 3.0 && mwl <= 10.0, 1.0).otherwise(0.5)
    lenScore * 0.3 + stopScore * 0.3 + punctScore * 0.2 + wordScore * 0.2
  }

  // ---------------- repetition & rule filters (Gopher/C4-style, EXT) -----

  /** Non-empty stripped lines of a document (ASCII-\s strip — portable). */
  def docLines(c: Column): Column =
    filter(transform(split(c, "\n"), l => TextFunctions.strip(l)), l => length(l) > 0)

  /** Fraction of duplicated elements: 1 − distinct/total (0 when empty) —
    * the C4/Gopher repetition signal over lines or paragraphs.
    */
  def dupRatio(arr: Column): Column =
    when(size(arr) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr))

  /** Fraction of lines matching an RE2-portable pattern (e.g. bullet heads
    * `^[-*•]`, ellipsis tails `\.\.\.$` — the Gopher layout heuristics).
    */
  def lineRatio(linesCol: Column, pattern: String): Column =
    when(size(linesCol) === 0, lit(0.0)).otherwise(
      size(filter(linesCol, l => l.rlike(pattern))).cast("double") / size(linesCol))

  /** Gopher-style keep/drop rule conjunction (arXiv:2112.11446 table A1
    * shape, thresholds simplified): word count bounds, mean-word-length
    * window, bounded line repetition, not mostly bullets, not mostly
    * ellipsis lines, and ≥2 distinct common stopwords. Pure Column
    * expression — a narrow filter at any scale, DuckDB-replayable (q66).
    */
  def gopherRulesPass(text: Column, tokens: Column): Column = {
    val ls = docLines(text)
    (size(tokens) >= 50) && (size(tokens) <= 100000) &&
      meanWordLen(tokens).between(3.0, 10.0) &&
      (dupRatio(ls) < 0.3) &&
      (lineRatio(ls, "^[-*•]") < 0.9) &&
      (lineRatio(ls, "\\.\\.\\.$") < 0.3) &&
      (size(array_intersect(tokens, lit(StopwordsEn.toArray))) >= 2)
  }

  /** Content fingerprint: first 16 hex chars of md5 of the
    * whitespace-normalized, lowercased text — a stable doc identity for
    * exact-dedup across formatting variants. Portable (md5 in both engines).
    */
  def fingerprint(c: Column): Column =
    substring(md5(lower(regexp_replace(c, "\\s+", " "))), 1, 16)

  /** Polynomial rolling hash over the token stream (base 131, mod 1e9+7 —
    * every intermediate fits a Long: acc < 2^30, acc*131 + 2^28 < 2^38): an
    * order-sensitive document fingerprint, the building block for
    * winnowing-style near-dup detection. Portable arithmetic (same fold is
    * expressible in DuckDB via list_reduce); oracle probes use the cheaper
    * [[fingerprint]].
    */
  def rollingTokenHash(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, t) => (acc * 131L + org.apache.spark.sql.graft.HashColumns.md5PrefixLong(t, 7)) % 1000000007L)

  /** Winnowing fingerprints (the MOSS local-minimum scheme): hash every
    * k-char gram of the text, slide a window of `w` consecutive gram hashes,
    * keep each window's minimum, return the distinct selected hashes sorted.
    * Guarantees every match of length ≥ k+w-1 shares a fingerprint, with at
    * most ~2/(w+1) of grams selected — the standard sub-linear document
    * signature for near-dup/plagiarism detection.
    *
    * Fully relational (sequence/transform/slice/array_min — codegen'd) and
    * portable: md5-60-bit gram hashes reproduce in DuckDB. Texts shorter
    * than k+w-1 chars yield an empty fingerprint array.
    */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0)
    val nGrams = length(text) - (k - 1) // gram count (may be <= 0)
    val grams = transform(
      sequence(lit(1), greatest(nGrams, lit(1))), // 1-based gram start positions
      p => org.apache.spark.sql.graft.HashColumns.md5PrefixLong(substr(text, p, lit(k))))
    val nWins = nGrams - (w - 1)
    val mins = transform(
      sequence(lit(1), greatest(nWins, lit(1))),
      p => array_min(slice(grams, p, lit(w))))
    when(nWins < 1, array().cast("array<bigint>"))
      .otherwise(array_sort(array_distinct(mins)))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 Table A1 family) for
    * one n-gram order, exact and integer-portable. Per document:
    *
    *   - `top{n}_ppm`: characters covered by the MOST FREQUENT n-gram
    *     (count × non-separator gram chars) as parts-per-million of total
    *     token characters;
    *   - `dup{n}_ppm`: characters covered by ALL n-grams occurring more
    *     than once, same scale.
    *
    * Occurrences are counted overlapping and coverage multiplies count ×
    * gram length (the common public-pipeline simplification — overlap can
    * double-count, so ppm is capped at 10⁶). Ties for most-frequent
    * resolve to the larger coverage — value-deterministic, since the
    * metric needs the coverage, not the winning gram's identity. The ppm
    * is an exact integer quotient (scaled-minus-pmod, no double rounding),
    * so it replays bit-identically in DuckDB's `//`.
    *
    * Scale shape: explode to (doc, gram) → count `groupBy` keyed (doc id,
    * gram) — gram width bounded by n tokens — → per-doc agg joined back
    * to pre-explode totals. No self-join, no collect.
    */
  def ngramRepetition(df: org.apache.spark.sql.DataFrame, idCol: String,
      tokensCol: Column, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val base = df.select(col(idCol), tokensCol.as("_toks"))
      .withColumn("_tchars",
        aggregate(transform(col("_toks"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x))
    val starts = when(size(col("_toks")) >= n,
        sequence(lit(1), size(col("_toks")) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    val grams = base.select(col(idCol),
      explode(transform(starts, i => array_join(slice(col("_toks"), i, lit(n)), " ")))
        .as("_gram"))
    val gchars = (length(col("_gram")) - lit(n - 1)).cast("long")
    val perDoc = grams
      .groupBy(col(idCol), col("_gram")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_cov", col("_cnt") * gchars)
      .groupBy(col(idCol))
      .agg(
        max(struct(col("_cnt"), col("_cov"))).as("_top"),
        sum(when(col("_cnt") > 1, col("_cov")).otherwise(0L)).as("_dupcov"))
    def ppm(cov: Column, total: Column): Column = {
      // exact integral division (`div`, = DuckDB `//`) — unlike the double
      // quotient it never rounds, even past 2⁵³ scaled counts
      val q = call_function("div", cov * lit(1000000L), total)
      when(total > 0, least(q, lit(1000000L))).otherwise(lit(0L))
    }
    base.select(col(idCol), col("_tchars"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        ppm(coalesce(col("_top._cov"), lit(0L)), col("_tchars")).as(s"top${n}_ppm"),
        ppm(coalesce(col("_dupcov"), lit(0L)), col("_tchars")).as(s"dup${n}_ppm"))
  }

  /** Per-document character-distribution Shannon entropy in nats (EXT
    * quality signal — low entropy flags repeated-character spam /
    * boilerplate, high entropy flags binary-ish noise; the cheap
    * statistical sibling of the zlib ratio below). Relational: one char
    * explode, one (id, ch) count, one per-doc sum — both shuffle keys are
    * bounded (id + single chars). The per-char terms
    * −p·ln(p) go through DECIMAL(24,12) (the repo's double-sum
    * discipline), so the over-chars summation is combine-order
    * independent and oracle-checkable (q103).
    *
    * @param df frame carrying `idCol` and `textCol`; empty texts are
    *           absent from the result (no chars → no rows, same contract
    *           as scoreDocs)
    * @return (idCol, n_chars, entropy)
    */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: Column): org.apache.spark.sql.DataFrame = {
    val p = col("cnt").cast("double") / col("n_chars").cast("double")
    df.where(length(textCol) > 0)
      .select(col(idCol), length(textCol).cast("long").as("n_chars"),
        explode(split(textCol, "")).as("ch"))
      .groupBy(col(idCol), col("n_chars"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol), col("n_chars"))
      .agg(sum((-p * log(p)).cast("decimal(24,12)")).cast("double").as("entropy"))
  }

  /** Per-document zlib compression ratio (deflate level 6):
    * `deflate_len / raw_len` over UTF-8 bytes — the CCNet/RedPajama-family
    * "too compressible = boilerplate, incompressible = noise" signal. A
    * per-partition batch transform (one Deflater per partition, reset per
    * row — no per-row allocation); deterministic for a fixed zlib level,
    * but zlib is not replayable in SQL, so this is spec-covered rather
    * than oracle-checked (documented rows-only reason).
    *
    * @return (idCol, raw_len, deflate_len, ratio)
    */
  def deflateRatio(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("raw_len", IntegerType, nullable = false),
      StructField("deflate_len", IntegerType, nullable = false),
      StructField("ratio", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val out = df.select(col(idCol).cast("long"), textCol.cast("string"))
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        // Deflater holds NATIVE zlib buffers — without end() they linger
        // until GC finalization and accumulate native memory across the
        // many tasks of a large scan. Release at task completion.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { row =>
          val bytes = row.getString(1).getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0
          while (!deflater.finished()) n += deflater.deflate(buf)
          val raw = math.max(bytes.length, 1)
          org.apache.spark.sql.Row(row.getLong(0), bytes.length, n,
            n.toDouble / raw)
        }
      }(enc)
    out.withColumnRenamed("id", idCol)
  }
}
