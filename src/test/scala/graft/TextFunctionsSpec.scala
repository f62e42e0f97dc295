package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextAnalysis, TextFunctions}

/** clean_text chain (P1, bit-for-bit vs the reference semantics), tokenizers,
  * and the text-analysis operator family (V5).
  */
class TextFunctionsSpec extends SparkSpec {

  private def clean(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextFunctions.cleanText(col("t"))).head().getString(0)
  }

  test("cleanText: NBSP → space, space/tab runs → one space, newlines untouched by step 2") {
    assert(clean("a b") == "a b")
    assert(clean("a  \t  b") == "a b")
    assert(clean("a \n b") == "a \n b")
  }

  test("cleanText: 3+ newlines → exactly two; exactly-two preserved") {
    assert(clean("a\n\n\n\n\nb") == "a\n\nb")
    assert(clean("a\n\nb") == "a\n\nb")
  }

  test("cleanText: leading/trailing whitespace stripped (incl newlines/tabs)") {
    assert(clean(" \t\n hello \n\t ") == "hello")
    assert(clean("   ") == "")
  }

  test("wordTokens: lowercased letter/digit runs, unicode letters kept") {
    import spark.implicits._
    val toks = Seq("Héllo, Wörld—42 times!").toDF("t")
      .select(TextFunctions.wordTokens(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("héllo", "wörld", "42", "times"))
  }

  test("wordCount: empty and whitespace-only → 0") {
    import spark.implicits._
    val counts = Seq("", "   ", "one two  three").toDF("t")
      .select(TextFunctions.wordCount(col("t"))).as[Int].collect().toSeq
    assert(counts == Seq(0, 0, 3))
  }

  test("bpeishTokenCount: letter runs + digit runs + single punctuation") {
    import spark.implicits._
    val n = Seq("ab12,cd!").toDF("t")
      .select(TextFunctions.bpeishTokenCount(col("t"))).as[Int].head()
    assert(n == 5) // ab | 12 | , | cd | !
  }

  test("langId: stopword argmax with deterministic tie-break; 'und' when no hits") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog in the house",   // en
      "der hund und die katze ist da",      // de
      "le chat et la maison est grande",    // fr
      "xyzzy qwerty asdf")                  // und
      .toDF("t").withColumn("toks", TextFunctions.wordTokens(col("t")))
    val out = df.select(TextAnalysis.langId(col("toks"))).as[String].collect().toSeq
    assert(out == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint: stable across whitespace variants, 16 hex chars") {
    import spark.implicits._
    val fps = Seq("hello   world", "hello world", "hello world!").toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[String].collect().toSeq
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps.forall(_.matches("[0-9a-f]{16}")))
  }

  test("rollingTokenHash: order-sensitive, stable, within modulus") {
    import spark.implicits._
    val hs = Seq("a b c", "c b a", "a b c").toDF("t")
      .withColumn("toks", TextFunctions.wordTokens(col("t")))
      .select(TextAnalysis.rollingTokenHash(col("toks"))).as[Long].collect().toSeq
    assert(hs(0) == hs(2))
    assert(hs(0) != hs(1))
    assert(hs.forall(h => h >= 0 && h < 1000000007L))
  }

  test("winnowing: shared substrings share fingerprints; short text empty") {
    import spark.implicits._
    val common = "the common shared span of text here"
    val df = Seq(
      ("AAAA " + common + " TAIL1 TAIL1", "a"),
      ("BBBBBB " + common + " OTHER TAIL", "b"),
      ("completely unrelated wording !!", "c"),
      ("tiny", "d"))
      .toDF("t", "id")
      .withColumn("fp", graft.functions.TextAnalysis.winnowingFingerprints(col("t"), 8, 4))
    val m = df.select("id", "fp").as[(String, Seq[Long])].collect().toMap
    assert(m("d").isEmpty) // shorter than k+w-1
    val ab = m("a").toSet.intersect(m("b").toSet)
    val ac = m("a").toSet.intersect(m("c").toSet)
    assert(ab.nonEmpty, "docs sharing a long span must share fingerprints")
    assert(ac.size < ab.size)
    // sorted distinct
    assert(m("a") == m("a").distinct.sorted)
  }

  test("gopherRulesPass: prose passes; bullets, repetition, and tiny docs fail") {
    import spark.implicits._
    val prose = ("the data pipeline reads documents and it is written to the store " +
      "with a stable schema for every run in this test corpus ") * 3
    val bullets = (1 to 60).map(i => s"- item $i with the words of a list").mkString("\n")
    val repeated = ("the same line with enough words to count here\n" * 60)
    val tiny = "too short"
    val df = Seq(prose, bullets, repeated, tiny).toDF("t")
      .withColumn("toks", TextFunctions.wordTokens(col("t")))
    val out = df.select(TextAnalysis.gopherRulesPass(col("t"), col("toks")))
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, false, false, false))
  }

  test("dupRatio / lineRatio: exact fractions") {
    import spark.implicits._
    val df = Seq("a\nb\na\n\n- x\nend...").toDF("t")
      .withColumn("ls", TextAnalysis.docLines(col("t")))
    val row = df.select(
      TextAnalysis.dupRatio(col("ls")),
      TextAnalysis.lineRatio(col("ls"), "^[-*•]"),
      TextAnalysis.lineRatio(col("ls"), "\\.\\.\\.$")).head()
    assert(row.getDouble(0) == 1.0 - 4.0 / 5.0) // "a" duplicated: 5 lines, 4 distinct
    assert(row.getDouble(1) == 1.0 / 5.0)
    assert(row.getDouble(2) == 1.0 / 5.0)
  }

  test("ngramRepetition: hand-computed top/dup coverage ppm, caps and empty doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), // 2-grams "a b"×2, "b a"×2; tchars=5
      (2L, "x y z"),     // no repetition; no 5-gram (3 < 5)
      (3L, "")           // tchars=0 ⇒ all zero
    ).toDF("doc_id", "text")
    val toks = graft.functions.TextFunctions.wordTokens(col("text"))
    val two = TextAnalysis.ngramRepetition(docs, "doc_id", toks, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(two(1L) == ((800000L, 1000000L))) // top 2×2/5; dup 8/5 capped at 1e6
    assert(two(2L) == ((666666L, 0L)))       // exact integer quotient 2e6/3
    assert(two(3L) == ((0L, 0L)))
    val five = TextAnalysis.ngramRepetition(docs, "doc_id", toks, 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(five(1L) == ((1000000L, 0L)))     // the single 5-gram covers all chars
    assert(five(2L) == ((0L, 0L)))
  }

  test("normalizeUnicode: NFC composes, NFKC folds compatibility forms; codegen path") {
    import spark.implicits._
    val cases = Seq(
      "café",      // e + combining acute
      "ﬁle",        // ﬁ ligature + "le"
      "Ｈｉ",    // full-width "Ｈｉ"
      "plain ascii")
    val df = cases.toDF("t").select(
      TextFunctions.normalizeUnicode(col("t"), "NFC").as("nfc"),
      TextFunctions.normalizeUnicode(col("t"), "NFKC").as("nfkc"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == (("café", "café")))          // composed under both
    assert(rows(1)._1 == "ﬁle" && rows(1)._2 == "file") // ligature: NFKC only
    assert(rows(2)._1 == "Ｈｉ" && rows(2)._2 == "Hi") // full-width: NFKC only
    assert(rows(3) == (("plain ascii", "plain ascii")))
    // invalid form fails at construction, not per row
    intercept[IllegalArgumentException] {
      TextFunctions.normalizeUnicode(col("t"), "NFX")
    }
    // the expression participates in whole-stage codegen (no fence);
    // non-foldable input so the plan can't collapse to a LocalTableScan
    val gen = spark.range(3)
      .select(TextFunctions.normalizeUnicode(
        concat(lit("ﬁle"), col("id").cast("string")), "NFKC").as("t"))
    assert(gen.collect().map(_.getString(0)).toSeq == Seq("file0", "file1", "file2"))
    val plan = gen.queryExecution.executedPlan.toString
    // the "*(n)" star prefix marks whole-stage-codegen'd operators
    assert(plan.contains("*(1) Project [unicode_normalize"), plan.take(400))
  }

  test("fixMojibake: double-encoded UTF-8 repaired; legitimate text untouched; idempotent") {
    import spark.implicits._
    val cases = Seq(
      "cafÃ©",                 // mojibake for café
      "JoÃ£o foi lÃ¡",         // mojibake for João foi lá
      "café",                  // already correct — must NOT change
      "João",                  // legit Latin-1-range text
      "日本語",                 // healthy multibyte
      "plain")
    val out = cases.toDF("t")
      .select(TextFunctions.fixMojibake(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("café", "João foi lá", "café", "João", "日本語", "plain"))
    // idempotent: a second pass is the identity
    val twice = out.toSeq.toDF("t")
      .select(TextFunctions.fixMojibake(col("t"))).collect().map(_.getString(0))
    assert(twice.toSeq == out.toSeq)
  }

  test("qualityScore: clean prose beats punctuation soup") {
    import spark.implicits._
    val df = Seq(
      "The quick brown fox jumps over the lazy dog and it is a fine day in the park with many people walking.",
      "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")
      .toDF("t").withColumn("toks", TextFunctions.wordTokens(col("t")))
    val Seq(good, bad) = df.select(TextAnalysis.qualityScore(col("t"), col("toks")))
      .as[Double].collect().toSeq
    assert(good > bad)
    assert(good > 0.6 && bad < 0.5)
  }

  test("stripHtml: blocks dropped wholesale, tags stripped, entities decoded, ws collapsed") {
    import spark.implicits._
    val html =
      """<html><head><title>skip me</title><style>p{x:1}</style></head>
        |<body><!-- comment --><script type="text/js">if (1 < 2) alert('hi');</script>
        |<h1>Title</h1>
        |<p class="a">Hello &amp; welcome to &quot;the&quot; &lt;best&gt;&nbsp;page.</p>
        |<P>UPPER tags too</P></body></html>""".stripMargin
    val out = Seq(Tuple1(html)).toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).head().getString(0)
    assert(out == """Title Hello & welcome to "the" <best> page. UPPER tags too""")
    // prose with a stray '<' that never closes degrades gracefully
    val stray = Seq(Tuple1("a < b and done")).toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).head().getString(0)
    assert(stray == "a < b and done")
  }

  test("urlDomain + domainBlocked: scheme/port/path handling, www strip, subdomain block") {
    import spark.implicits._
    val urls = Seq(
      "https://WWW.Example.COM/path?q=1",   // case + www strip
      "http://sub.ads.example:8080/x",      // port excluded, subdomain of blocked
      "ftp://files.example/readme",         // any scheme
      "not a url at all",                   // → empty domain
      "https://ads.example",                // exact blocked, no path
      "https://notads.example/x")           // NOT a subdomain (no dot boundary)
    val out = urls.toDF("url")
      .select(TextFunctions.urlDomain(col("url")).as("d"))
      .withColumn("b", TextFunctions.domainBlocked(col("d"), Seq("ads.example")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(out == Seq(
      "example.com" -> false,
      "sub.ads.example" -> true,
      "files.example" -> false,
      "" -> false,
      "ads.example" -> true,
      "notads.example" -> false))
  }

  test("canonicalUrl: every rule fires; idempotent; non-URLs empty") {
    import spark.implicits._
    val cases = Seq(
      "HTTPS://WWW.Site.Example:443/a/b/?utm_source=x&b=2&a=1#frag"
        -> "https://site.example/a/b?a=1&b=2",
      "http://host.example:80/p" -> "http://host.example/p",
      "https://host.example/p/" -> "https://host.example/p",
      "https://host.example/?gclid=z&fbclid=q&utm_medium=m" -> "https://host.example",
      "https://host.example:8080/p?z=1&a=2" -> "https://host.example:8080/p?a=2&z=1",
      "not a url" -> "",
      "" -> "")
    val got = cases.map(_._1).toDF("url")
      .select(TextFunctions.canonicalUrl(col("url"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
    // idempotence: canonical form is a fixed point
    val twice = cases.map(_._2).filter(_.nonEmpty).toDF("url")
      .select(TextFunctions.canonicalUrl(col("url"))).as[String].collect().toSeq
    assert(twice === cases.map(_._2).filter(_.nonEmpty))
  }

  test("charEntropy: closed-form values, uniform max, empty text absent") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaa"),            // single symbol → 0 nats
      (2L, "abab"),            // uniform over 2 → ln 2
      (3L, "abcd"),            // uniform over 4 → ln 4
      (4L, "")
    ).toDF("id", "text")
    val out = TextAnalysis.charEntropy(df, "id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(4L))
    assert(out(1L) === ((4L, 0.0)))
    assert(math.abs(out(2L)._2 - math.log(2)) < 1e-9)
    assert(math.abs(out(3L)._2 - math.log(4)) < 1e-9)
    // skewed beats uniform downward: "aaab" < ln 2
    val skew = TextAnalysis.charEntropy(Seq((9L, "aaab")).toDF("id", "text"),
      "id", col("text")).head().getDouble(2)
    assert(skew > 0.0 && skew < math.log(2))
  }

  test("deflateRatio: boilerplate compresses far below high-variety text; deterministic") {
    import spark.implicits._
    val rep = "the same nav line over and over " * 40
    val varied = Iterator.iterate(88172645463325252L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
      .map(x => (math.floorMod(x >>> 33, 94) + 33).toChar).take(400).mkString
    val df = Seq((1L, rep), (2L, varied)).toDF("id", "text")
    val out = TextAnalysis.deflateRatio(df, "id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L)._3 < 0.1, s"repetitive ratio ${out(1L)._3}")
    assert(out(2L)._3 > 0.5, s"varied ratio ${out(2L)._3}")
    assert(out(1L)._1 === rep.length)
    // run-to-run determinism (fixed zlib level)
    val again = TextAnalysis.deflateRatio(df, "id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(again(1L) === out(1L)._2 && again(2L) === out(2L)._2)
  }
}
