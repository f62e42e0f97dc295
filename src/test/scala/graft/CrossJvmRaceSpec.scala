package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The quiescence tripwires vs a REAL second JVM (VERDICT r18 item 3).
  *
  * Every policy's refusal arc had only ever been tripped by an in-JVM fold
  * injected through a test seam — same process, same SparkSession, same
  * Hadoop FileSystem cache. The production hazard is a SECOND DRIVER
  * process folding into the store mid-tick (two schedulers, or an ingest
  * job racing the maintenance cron). This spec drives that for real: a
  * child JVM with its own SparkSession folds a batch into the live
  * generation inside the parent tick's rewrite→re-list window (made
  * deterministic by a file handshake through the `afterRewrite` seam —
  * the seam only PAUSES the parent; the writer is a genuinely foreign
  * process), and the tick must refuse TYPED, lose nothing, and recover
  * with vacuum + a quiet re-tick.
  */
class CrossJvmRaceSpec extends SparkSpec {

  test("a second JVM folding mid-tick: typed refusal, zero lost folds, vacuum + quiet re-tick publishes (VERDICT r18 item 3)") {
    import graft.operators.{Dedup, QuiescenceRefusalException}
    import graft.sources.Generations
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val rnd = new scala.util.Random(246)
    def rows(seqs: Seq[(Long, Seq[Long])]): org.apache.spark.sql.DataFrame =
      seqs.flatMap { case (id, hs) =>
        hs.zipWithIndex.map { case (h, f) => (id, f, h) } }.toDF("id", "f", "h")
    def fold(b: Seq[(Long, Seq[Long])], store: String, epoch: Long) =
      Dedup.incrementalSequenceNearDups(rows(b), "id", "f", "h", store,
          minVoteFrac = 0.7, maxShift = 3,
          onPairs = out => {
            out.write.mode(SaveMode.Overwrite)
              .parquet(s"$store/pairs/batch_id=$epoch")
            ()
          })
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // seed: gen-0 with a base batch, then an epoch-1 fold into the live
    // generation — two sigs file-sets, fragmented past the budget below
    val root = java.nio.file.Files.createTempDirectory("xjvmrace").toString
    val baseSeqs = (0L until 6L).map(i => (i, Seq.fill(8)(rnd.nextLong())))
    val g0 = Generations.stage(root, conf)
    assert(fold(baseSeqs, g0, 0L) === Set.empty)
    Generations.publish(root, g0, conf)
    val live0 = Generations.resolve(root, conf)
    assert(fold(Seq((200L, baseSeqs(1)._2.drop(2))), live0, 1L) ===
      Set((1L, 200L, -2)))
    val sigsBefore = spark.read.parquet(s"$live0/sigs").count()

    // the foreign writer: starts now, boots its own session, and BLOCKS
    // on the handshake dir until the parent's rewrite has completed
    val hs = java.nio.file.Files.createTempDirectory("xjvmhs")
    val child = ChildJvm.start("graft.RaceWriterMain",
      Seq(root, hs.toString), Map.empty, heap = "2g")
    try {
      val refusal = intercept[QuiescenceRefusalException] {
        Dedup.maintainSequenceStore(spark, root, committedBatchId = 1L,
          maxSigFiles = 1, targetFiles = 1,
          afterRewrite = () => {
            // rewrite done — release the writer, then wait for its fold
            // to COMMIT before the tick re-lists (the deterministic form
            // of "a fold landed in the window")
            java.nio.file.Files.writeString(hs.resolve("rewrite_done"), "")
            val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
            while (!java.nio.file.Files.exists(hs.resolve("folded"))) {
              require(System.nanoTime() < deadline,
                "foreign writer never folded — check its log")
              Thread.sleep(100)
            }
          })
      }
      assert(refusal.getMessage.contains("mid-compaction"))
      val (exited, exit, log) = ChildJvm.await(child, "graft.RaceWriterMain", 60)
      assert(exited && exit == 0,
        s"foreign writer failed (exit $exit):\n${log.takeRight(2000)}")
    } finally {
      // belt: never leave the writer running on an assertion failure
      ChildJvm.killTree(child._1)
    }

    // pointer unmoved; the foreign fold is INTACT in the live generation
    // (14 sigs: the 8-frame clip + its 6-frame trimmed dup) and its pair
    // landed durably — the refusal lost nothing
    assert(Generations.resolve(root, conf) == live0)
    assert(spark.read.parquet(s"$live0/sigs").count() == sigsBefore + 14)
    val foreignPairs = spark.read.parquet(s"$live0/pairs/batch_id=2")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(foreignPairs === Set((900L, 901L)))

    // recovery: vacuum reclaims exactly the abandoned staged generation,
    // a QUIET re-tick publishes, and the foreign fold survives the swap
    val reclaimed = Generations.vacuum(root, keep = 0, conf)
    assert(reclaimed.size == 1 && reclaimed.head != "gen-0", reclaimed.toString)
    assert(Dedup.maintainSequenceStore(spark, root, committedBatchId = 1L,
      maxSigFiles = 1, targetFiles = 1).nonEmpty)
    val live1 = Generations.resolve(root, conf)
    assert(live1 != live0)
    assert(spark.read.parquet(s"$live1/sigs").count() == sigsBefore + 14)
    // batch_id=2 is the in-flight epoch (> committedBatchId) — carried
    // untouched through the compaction, pair content identical
    assert(spark.read.parquet(s"$live1/pairs/batch_id=2")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === foreignPairs)
    // the foreign batch's replay no-ops content-keyed against the new
    // generation — the two-JVM detour changed no answer
    assert(Dedup.incrementalSequenceNearDups(
      rows(RaceWriterMain.foreignBatch), "id", "f", "h", live1,
      minVoteFrac = 0.7, maxShift = 3).isEmpty)
  }
}

/** The foreign writer the race spec forks: its OWN SparkSession in its own
  * JVM, folding [[foreignBatch]] into the live generation of the store it
  * is pointed at, releasing only after the fold's writes are on disk.
  */
object RaceWriterMain {

  /** Deterministic so the parent can assert content: one fresh 8-frame
    * clip and its 2-frame-trimmed duplicate (pairs exactly (900,901)).
    */
  def foreignBatch: Seq[(Long, Seq[Long])] = {
    val rnd = new scala.util.Random(4242)
    val clip = Seq.fill(8)(rnd.nextLong())
    Seq((900L, clip), (901L, clip.drop(2)))
  }

  def main(args: Array[String]): Unit = {
    val Array(root, hsDir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ready = java.nio.file.Paths.get(hsDir, "rewrite_done")
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(ready)) {
      require(System.nanoTime() < deadline,
        "race writer: rewrite_done never appeared — parent tick missing?")
      Thread.sleep(50)
    }
    val live = graft.sources.Generations.resolve(root,
      spark.sparkContext.hadoopConfiguration)
    val rows = foreignBatch.flatMap { case (id, hs) =>
      hs.zipWithIndex.map { case (h, f) => (id, f, h) } }.toDF("id", "f", "h")
    val pairs = graft.operators.Dedup.incrementalSequenceNearDups(
      rows, "id", "f", "h", live, minVoteFrac = 0.7, maxShift = 3,
      onPairs = out => {
        out.write.mode(SaveMode.Overwrite).parquet(s"$live/pairs/batch_id=2")
        ()
      })
    val n = pairs.count()
    spark.stop()
    // the marker is written only AFTER the fold is fully durable — the
    // parent's re-listing must be able to see every file
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(hsDir, "folded"), n.toString)
  }
}
