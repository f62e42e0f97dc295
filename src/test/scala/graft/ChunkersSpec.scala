package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.model._
import graft.operators.Chunkers

/** Chunker semantics — replicates the reference behaviors verified in
  * SURVEY.md §2.3 (index_documents.py:66-134), plus the typed≡relational
  * equivalence property (G1).
  */
class ChunkersSpec extends SparkSpec {

  // --- fixed chunker (C1), verified edge cases from SURVEY §2.3

  test("fixed: basic overlap windows") {
    assert(Chunkers.fixedTyped("abcdefghij", 4, 1) == Seq("abcd", "defg", "ghij"))
  }

  test("fixed: whitespace-only windows dropped but cursor advances") {
    assert(Chunkers.fixedTyped("ab        cd", 4, 1) == Seq("ab", "cd"))
  }

  test("fixed: text shorter than window → one stripped chunk") {
    assert(Chunkers.fixedTyped("ab", 10, 2) == Seq("ab"))
    assert(Chunkers.fixedTyped("", 10, 2) == Seq.empty)
    assert(Chunkers.fixedTyped("   ", 10, 2) == Seq.empty)
  }

  test("fixed: last chunk may be short; stride truncates") {
    assert(Chunkers.fixedTyped("abcde", 4, 1) == Seq("abcd", "de"))
  }

  test("fixed: argument guards mirror the reference (index_documents.py:83-86)") {
    intercept[IllegalArgumentException](Chunkers.fixedTyped("x", 0, 0))
    intercept[IllegalArgumentException](Chunkers.fixedTyped("x", 4, 4))
    intercept[IllegalArgumentException](Chunkers.fixedTyped("x", 4, -1))
  }

  // --- paragraph split (C2)

  test("paragraph: \\n\\s*\\n splits, space-only line separates (verified)") {
    assert(Chunkers.paragraphsTyped("a\n\nb\n \n\nc\nd") == Seq("a", "b", "c\nd"))
  }

  test("paragraph: empties dropped, strips applied") {
    assert(Chunkers.paragraphsTyped("  x  \n\n\n\n  y  ") == Seq("x", "y"))
  }

  // --- sentence split (C3)

  test("sentence: naive split after .!? + whitespace; abbreviations split") {
    assert(Chunkers.sentencesTyped("Dr. Smith went.") == Seq("Dr.", "Smith went."))
    assert(Chunkers.sentencesTyped("A! B? C. tail no punct") == Seq("A!", "B?", "C.", "tail no punct"))
  }

  // --- sentence grouping (C4)

  test("grouping: target = max(200, chunkSize); greedy fill, single-space join") {
    val sents = Seq.fill(5)("x" * 90).mkString(". ") + "."
    // each sentence is 91 chars ("xxx...x."): groups of 2 fit in 200 (91+1+91=183)
    val groups = Chunkers.sentenceGroupsTyped(sents, 100)
    assert(groups.forall(_.length <= 200))
    assert(groups == Seq(
      "x" * 90 + ". " + "x" * 90 + ".",
      "x" * 90 + ". " + "x" * 90 + ".",
      "x" * 90 + "."))
  }

  test("grouping: a single over-long sentence becomes its own chunk") {
    val long = "y" * 500 + "."
    assert(Chunkers.sentenceGroupsTyped(long, 100) == Seq(long))
  }

  test("dispatcher: unknown strategy rejected") {
    intercept[IllegalArgumentException](SplitStrategy.fromName("bogus", 100, 10))
  }

  // --- typed ≡ relational equivalence (G1) + invariants

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 300)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\t', '\n')))
  } yield cs.mkString

  test("property: typed ≡ relational on arbitrary text (chunk multiset + order)") {
    import spark.implicits._
    val params = Seq((40, 10), (13, 0), (7, 3))
    checkProp(Prop.forAll(textGen) { text =>
      params.forall { case (size, ov) =>
        val typed = Chunkers.fixedTyped(text, size, ov)
        val rel = Chunkers.fixedRelational(
            Seq((0L, text)).toDF("doc_id", "text"), col("text"), size, ov)
          .orderBy("win_pos").select("chunk_text").as[String].collect().toSeq
        typed == rel
      }
    })
  }

  test("property: chunk lengths ≤ chunkSize; concat(overlap=0, no-ws) reconstructs") {
    val noWs = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    checkProp(Prop.forAll(noWs) { text =>
      val chunks = Chunkers.fixedTyped(text, 8, 0)
      chunks.forall(_.length <= 8) && chunks.mkString == text
    })
  }

  test("property: consecutive raw windows share exactly overlap chars") {
    val noWs = Gen.listOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.length > 12)
    checkProp(Prop.forAll(noWs) { text =>
      val chunks = Chunkers.fixedTyped(text, 10, 4)
      chunks.sliding(2).forall {
        case Seq(a, b) => a.length < 10 || a.takeRight(4) == b.take(4)
        case _ => true
      }
    })
  }

  test("sentencesRelationalPortable ≡ sentencesTyped on ASCII-whitespace text") {
    import spark.implicits._
    // adversarial ASCII cases incl. the golden corpus shapes; Unicode
    // whitespace (NBSP etc.) is the documented divergence and excluded
    val cases = Seq(
      "Dr. Smith went. Then Mr. Jones came! Did he? yes",
      "one. two. three.", "A!? B?! C.", "!!!. ???. ...",
      "no terminal punctuation at all just words",
      "a .b", "a. .b", "x" * 500 + ". " + "y" * 90 + ". short.",
      "trailing space. ", "  leading. ws", "", "   ", "a\nb. c\nd",
      "multi  spaces.   after.  punct")
    val typed = cases.map(Chunkers.sentencesTyped)
    val rel = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = Chunkers.sentencesRelationalPortable(rel, col("text"))
      .orderBy("id", "sent_pos").select("id", "sent_text").as[(Long, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    cases.indices.foreach { i =>
      assert(got.getOrElse(i.toLong, Seq.empty) == typed(i), s"case $i: '${cases(i).take(60)}'")
    }

    val asciiGen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\n', '\t'),
        2 -> Gen.oneOf('.', '!', '?')))
    } yield cs.mkString
    checkProp(Prop.forAll(asciiGen) { text =>
      val t = Chunkers.sentencesTyped(text)
      val r = Chunkers.sentencesRelationalPortable(
          Seq((0L, text)).toDF("id", "text"), col("text"))
        .orderBy("sent_pos").select("sent_text").as[String].collect().toSeq
      t == r
    })
  }

  test("chunkDataset assigns per-doc chunk indices in emit order") {
    import spark.implicits._
    val docs = Seq(RawDocument(1, "a.txt", "abcdefghij"), RawDocument(2, "b.txt", "xy")).toDS()
    val out = Chunkers.chunkDataset(docs, SplitStrategy.Fixed(4, 1)).collect()
      .groupBy(_.docId).view.mapValues(_.sortBy(_.chunkIndex).map(_.chunkText).toSeq).toMap
    assert(out(1L) == Seq("abcd", "defg", "ghij"))
    assert(out(2L) == Seq("xy"))
  }
}
