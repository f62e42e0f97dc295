package graft

import graft.operators.Chunkers
import graft.functions.TextFunctions
import org.apache.spark.sql.functions.col

/** Golden tests G1–G3 (SURVEY.md §5.2.3): expected outputs were produced by
  * EXECUTING the reference's own functions (clean_text,
  * chunk_fixed_with_overlap, split_paragraphs, split_sentences,
  * split_to_chunks — /root/reference/index_documents.py) over an adversarial
  * corpus plus 30 fixture documents; see tools/gen_goldens.py. Our typed
  * implementations must match them exactly.
  */
class GoldenChunkersSpec extends SparkSpec {

  private case class GoldenCase(name: String, func: String, text: String,
      size: Int, overlap: Int, expected: Seq[String])

  private lazy val cases: Seq[GoldenCase] = {
    val path = getClass.getResource("/golden/chunkers.jsonl")
    assert(path != null, "golden resource missing — run tools/gen_goldens.py")
    val src = scala.io.Source.fromFile(path.getPath, "UTF-8")
    try {
      import spark.implicits._
      val lines = src.getLines().toSeq
      val df = spark.read.json(lines.toDS())
      df.select(
          col("case"), col("func"), col("text"),
          org.apache.spark.sql.functions.coalesce(col("size"),
            org.apache.spark.sql.functions.lit(0L)).as("size"),
          org.apache.spark.sql.functions.coalesce(col("overlap"),
            org.apache.spark.sql.functions.lit(0L)).as("overlap"),
          col("expected"))
        .collect().toSeq.map { r =>
          GoldenCase(r.getString(0), r.getString(1),
            Option(r.getString(2)).getOrElse(""),
            r.getLong(3).toInt, r.getLong(4).toInt, r.getSeq[String](5))
        }
    } finally src.close()
  }

  private def run(c: GoldenCase): Seq[String] = c.func match {
    case "clean_text" => Seq(cleanTyped(c.text))
    case "fixed" => Chunkers.fixedTyped(c.text, c.size, c.overlap)
    case "paragraphs" => Chunkers.paragraphsTyped(c.text)
    case "sentences" => Chunkers.sentencesTyped(c.text)
    case "sentence_groups" => Chunkers.sentenceGroupsTyped(c.text, c.size)
  }

  /** clean_text has no standalone typed form — evaluate the Column chain. */
  private def cleanTyped(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(TextFunctions.cleanText(col("t"))).head().getString(0)
  }

  test("all golden cases from the executed reference functions match") {
    assert(cases.size > 350, s"suspiciously few cases: ${cases.size}")
    val failures = cases.flatMap { c =>
      val got = run(c)
      if (got == c.expected) None
      else Some(s"${c.name}: got=${got.take(3)} want=${c.expected.take(3)}")
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }
}
