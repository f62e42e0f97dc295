package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.SplitStrategy
import graft.sources.Sinks

/** Config (S4) and sink (S5) behavior. */
class ConfigSinksSpec extends SparkSpec {

  test("GraftConfig: session-conf override + argparse-default parity + guards") {
    assert(GraftConfig().chunkSize == 1200 && GraftConfig().overlap == 200
      && GraftConfig().batchSize == 32)
    spark.conf.set("spark.graft.chunkSize", "300")
    spark.conf.set("spark.graft.strategy", "sentence")
    try {
      val c = GraftConfig.fromSession(spark)
      assert(c.chunkSize == 300 && c.strategy == "sentence")
      assert(c.splitStrategy == SplitStrategy.Sentence(300))
    } finally {
      spark.conf.unset("spark.graft.chunkSize")
      spark.conf.unset("spark.graft.strategy")
    }
    intercept[IllegalArgumentException](GraftConfig(overlap = 1300))
    intercept[IllegalArgumentException](GraftConfig(chunkSize = 0))
  }

  test("parquet index sink: partitioned layout, embedding column prunable, idempotent overwrite") {
    val dir = Files.createTempDirectory("idx").toString
    val rows = operators.Index.buildIndex(
      Tables.documents(spark, sf001).limit(20),
      operators.Index.IndexConfig(embeddingDim = 8))
    operators.Index.writeIndex(rows, dir)
    operators.Index.writeIndex(rows, dir) // overwrite must be clean (job commit)
    val back = spark.read.parquet(dir)
    assert(back.count() == rows.count())
    // partition directory per strategy
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("split_strategy=fixed")))
    // text-only scan prunes the embedding column
    val scan = back.select("doc_id", "chunk_text").queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,chunk_text:string>"), scan.take(900))
  }

  test("jdbc sink serializes embeddings to pgvector text literals") {
    import spark.implicits._
    // no database offline — check the serialization expression itself
    val df = Seq((1L, Seq(1.5f, -2f, 3f))).toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val lit = df.select(Sinks.vectorLiteralCol(col("embedding"))).head().getString(0)
    assert(lit == "[1.5,-2.0,3.0]")
  }

  test("pgvector DDL matches the reference schema (index_documents.py:202-224)") {
    val ddl = Sinks.ensureSchemaDdl(768)
    // the reference creates the extension first, then the table
    assert(ddl.head == "CREATE EXTENSION IF NOT EXISTS vector;")
    val table = ddl(1)
    assert(table.startsWith("CREATE TABLE IF NOT EXISTS document_chunks"))
    // SQLAlchemy type mapping, column by column (README.md:83-91)
    assert(table.contains("id SERIAL PRIMARY KEY"))              // Integer, autoincrement, pk
    assert(table.contains("chunk_text TEXT NOT NULL"))           // Text, nullable=False
    assert(table.contains("embedding VECTOR(768) NOT NULL"))     // Vector(vector_dim)
    assert(table.contains("filename TEXT NOT NULL"))
    assert(table.contains("split_strategy TEXT NOT NULL"))
    assert(table.contains("created_at TIMESTAMPTZ NOT NULL"))    // DateTime(timezone=True)
    // dim is parameterized (--embedding-dim, index_documents.py:263)
    assert(Sinks.ensureSchemaDdl(1536)(1).contains("VECTOR(1536)"))
  }

  test("vector literal: Scala helper and Spark column expression agree exactly") {
    import spark.implicits._
    val vecs = Seq(
      Array(1.5f, -2f, 3f),
      Array(0.1f, 1e-7f, -1.25e8f),
      Array(Float.MinPositiveValue, 42f))
    val fromCol = vecs.map(Tuple1(_)).toDF("embedding")
      .select(Sinks.vectorLiteralCol(col("embedding"))).collect().map(_.getString(0))
    val fromScala = vecs.map(Sinks.vectorLiteral)
    assert(fromCol.toSeq == fromScala,
      s"Spark cast and Scala Float.toString must render identically")
    // pgvector input shape: bracketed, comma-separated, no spaces
    fromScala.foreach { s =>
      assert(s.head == '[' && s.last == ']' && !s.contains(" "))
    }
  }

  test("writeBucketed: co-bucketed tables join exchange-free (plan-asserted)") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("bka").toFile.getAbsolutePath
    val dirB = Files.createTempDirectory("bkb").toFile.getAbsolutePath
    val a = (1 to 1000).map(i => (i.toLong, s"text$i")).toDF("id", "t")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    Sinks.writeBucketed(a, "bk_a", dirA, "id", 4, Seq("id"))
    Sinks.writeBucketed(b, "bk_b", dirB, "id", 4, Seq("id"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bk_a").join(spark.table("bk_b"), "id")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      // the whole point of the layout: matching bucket partitioning on
      // both sides, so the join plans with ZERO shuffles
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }
}
