package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered probe on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Failures are recorded as -1 with
  * the exception class printed to stderr (a silent -1 cost round 1 its
  * entire signal).
  *
  * Protocol (round-4 hardening, per VERDICT r3 item 4): each query runs
  * `SPARK_GRAFT_BENCH_REPS` times (default 3) and the reported per-query
  * number — and the total — is the MEDIAN, so one GC spike or machine-load
  * blip can't distort a committed number. Per-query minima are emitted
  * alongside (`queries_min`) as the low-noise floor. A query that fails on
  * any rep reports -1.
  *
  * Round-7 hardening (VERDICT r6 items 1–2): between probes the JVM is
  * returned to a consistent state — Spark's block-manager caches cleared
  * and an explicit (untimed) GC — because two rounds in a row the judge's
  * `weak` flags turned out to be SUITE-CONTEXT pressure (heap/page-cache
  * debris from whichever probes happened to run earlier), not plan
  * changes: r6's q67/q68/q69 ran 2–3× their r5 records in-suite yet
  * cleared isolated, and excluding the seven newest probes restored them
  * with zero code change. The hygiene makes per-probe medians comparable
  * across rounds regardless of suite composition. The full per-query
  * medians are also written to `SPARK_GRAFT_BENCH_OUT` (when set) so new
  * probes past the driver's stdout-tail truncation stay visible.
  *
  * Round-14 hardening (VERDICT r13 item 5): the five streaming /
  * store-lifecycle probes (q50/q147/q150/q156/q157) spend wall-clock in
  * stream drains and store folds, so their full-suite medians integrated
  * ~20 minutes of ambient host load and flapped 2–3× round over round,
  * burning an A/B worktree cycle every time. They now run as their own
  * PHASE: after the batch suite completes, the batch SparkSession is torn
  * down, a FRESH session starts (clean heap, clean block manager, no
  * suite debris), and each streaming probe runs
  * `SPARK_GRAFT_BENCH_STREAM_REPS` reps (default 5 — more samples for the
  * noisier class; the committed number stays the median, the floor rides
  * along in `queries_min`). Cross-round comparisons for these five should
  * read medians-vs-floors first and reach for the interleaved worktree
  * A/B only when the isolated-phase median itself moved (BASELINE r14
  * addendum).
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** The streaming-phase probe set (own session, more reps — see above). */
  val streamingPhase: Set[String] = Set(
    "q50_streaming", "q147_watermark_drops", "q150_session_drain",
    "q156_incremental_soft_dedup_weights",
    "q157_streaming_soft_dedup_weights")

  private def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + shuffle machinery, so the first timed
    // query doesn't absorb JVM/session startup noise
    spark.range(2000000).selectExpr("sum(id * 2)", "count(distinct id % 97)").collect()
    spark
  }

  private def timeProbes(spark: SparkSession, sfDir: String,
      probes: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
      reps: Int): Seq[(String, Seq[Double])] =
    probes.map { case (name, fn) =>
      // untimed inter-probe hygiene: drop any cached blocks a previous
      // probe's operators left behind and let the heap settle, so this
      // probe's median reflects ITS plan, not the suite's history
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -1.0
      }
      name -> runs
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val streamReps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM_REPS", "5").toInt)
    // optional comma-separated probe filter for local iteration (the
    // driver never sets it — full suite by default)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val (streamProbes, batchProbes) =
      all.partition { case (name, _) => streamingPhase.contains(name) }
    // phase 1: the batch suite
    val spark1 = buildSession(cpus)
    val timedBatch = timeProbes(spark1, sfDir, batchProbes, reps)
    // phase 2: the streaming probes in a FRESH session (r14 protocol)
    val timedStream =
      if (streamProbes.isEmpty) Seq.empty
      else {
        spark1.stop()
        val spark2 = buildSession(cpus)
        timeProbes(spark2, sfDir, streamProbes, streamReps)
      }
    val timed = (timedBatch ++ timedStream).sortBy(_._1)
    // `queries` (the medians the driver gates on) keeps the original
    // any-failed-rep → -1 sentinel so round-over-round totals stay
    // comparable; min/max are DIAGNOSTIC fields and compute over the
    // successful reps only (ADVICE r11 — a probe that succeeded on some
    // reps shouldn't lose its real spread), with the failure count
    // reported separately in `queries_failed_reps` (nonzero entries only).
    def fmt(sel: Seq[Double] => Double, allOrNothing: Boolean) =
      timed.map { case (k, rs) =>
        val ok = rs.filter(_ >= 0)
        val v =
          if (allOrNothing) { if (rs.exists(_ < 0)) -1.0 else sel(rs) }
          else { if (ok.isEmpty) -1.0 else sel(ok) }
        "\"" + k + "\":" + v
      }.mkString("{", ",", "}")
    val failed = timed.collect { case (k, rs) if rs.exists(_ < 0) =>
      "\"" + k + "\":" + rs.count(_ < 0)
    }.mkString("{", ",", "}")
    val medians = timed.map { case (_, rs) => if (rs.exists(_ < 0)) -1.0 else median(rs) }
    val total = medians.filter(_ >= 0).sum
    // min/median/max per probe (VERDICT r10 item 6): the reps exist
    // anyway, and the spread lets a judge separate ambient drift from a
    // plan regression without a worktree A/B — a probe whose min matches
    // the old record but whose max is 2× is load noise, not code.
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"stream_reps":$streamReps,"queries":${fmt(median, allOrNothing = true)},"queries_min":${fmt(_.min, allOrNothing = false)},"queries_max":${fmt(_.max, allOrNothing = false)},"queries_failed_reps":$failed,"sf":"$sfDir"}"""
    println(line)
    // the driver truncates its stdout capture; a file keeps EVERY probe's
    // median visible (VERDICT r6 item 2 — q100+ were invisible in r6)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(_.stop())
  }
}
