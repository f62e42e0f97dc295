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
  * `SPARK_GRAFT_BENCH_STREAM_REPS` reps (default 7 since round 18 —
  * VERDICT r17 item 5: this phase dominated every cross-round noise
  * scare three rounds running, and two extra samples materially narrow
  * the median's spread for wall-clock-integrating probes; the committed
  * number stays the median, the floor rides along in `queries_min`).
  * Cross-round comparisons for these five should read medians-vs-floors
  * first and reach for the interleaved worktree A/B only when the
  * isolated-phase median itself moved (BASELINE r14 addendum).
  *
  * Round-18 (VERDICT r17 item 3): the artifact is self-comparable — the
  * JSON carries the FROZEN round-2 gate subset sum (`gate_subset_sum`,
  * median-based), its min-of-reps floor (`gate_subset_sum_min` — the
  * noise-damped comparator: a median move with a flat min is ambient
  * drift by definition), the frozen 46.6 s denominator, and their ratio.
  * If a cross-round common-probe sum moves >1.25× and a worktree A/B is
  * run, record its verdict as an `ab_verdict` string field appended to
  * the committed bench artifact at record time.
  */
object Bench {
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** The streaming-phase probe set (own session, more reps — see above). */
  val streamingPhase: Set[String] = Set(
    "q50_streaming", "q147_watermark_drops", "q150_session_drain",
    "q156_incremental_soft_dedup_weights",
    "q157_streaming_soft_dedup_weights")

  /** The FROZEN round-2 gate subset (VERDICT r17 item 3 — the bench
    * artifact must carry its own cross-round comparator): the 57 probes
    * BENCH_r02 recorded, and the 46.6 s final round-2 suite figure
    * BASELINE.md froze as the ≤2× performance bar. Every later round's
    * raw suite sum grows with the suite (169 probes now), so raw totals
    * are NOT comparable across rounds — this subset is. The JSON line
    * carries `gate_subset_sum` (median-based), `gate_subset_sum_min`
    * (min-of-reps — the load-noise-damped floor; prefer it when the
    * median moved but the min did not, which is ambient drift by
    * definition), and `gate_ratio` = gate_subset_sum / 46.6. These names
    * and the denominator are frozen forever — do not regenerate them
    * from a newer run.
    */
  val frozenGateProbes: Seq[String] =
    ("q01_pricing_summary,q02_mktsegment_revenue,q03_region_customers," +
      "q04_customer_orders_outer,q05_big_spenders_semi,q06_no_events_anti," +
      "q07_events_range_join,q08_asof_purchase_view,q09_setops," +
      "q10_rollup_region_nation,q11_top_orders_per_customer,q12_clean_text," +
      "q13_fixed_chunker,q14_paragraph_chunks,q15_cosine_topk," +
      "q16_inner_product_label,q17_running_sum,q18_hourly_tumbling," +
      "q19_json_extract,q20_exact_dup_triples,q21_minhash_neardup," +
      "q22_simhash,q23_jaccard_pairs,q24_embedding_neardup,q25_langid," +
      "q26_event_type_sets,q27_token_counts,q28_fingerprint,q29_centroids," +
      "q30_ivf_ann,q31_math_funcs,q32_quality_score,q33_strings," +
      "q34_sessions,q35_exact_dedup_keepmin,q36_lag_lead,q37_cube," +
      "q38_ntile,q39_dates,q40_index_pipeline,q41_search_text," +
      "q42_sentence_chunks,q43_lsh_ann,q44_centroid_typed,q45_multimodal," +
      "q46_salted_join,q47_tfidf,q48_neardup_clusters,q49_winnowing," +
      "q50_streaming,q51_file_ingest,q52_pivot,q53_grouping_sets," +
      "q54_unpivot,q55_full_outer,q56_predicates,q57_date_arith")
      .split(",").toSeq

  /** BASELINE.md "Final round-2 suite: 57 probes in 46.6 s" — frozen. */
  val frozenGateBaselineSec: Double = 46.6

  /** The per-probe watch set (VERDICT r18 item 2): probes whose history
    * shows real cross-round drift sensitivity (q87's min moved 1.54× in
    * r18 on untouched code) get their min-of-reps floor surfaced as a
    * FIRST-CLASS artifact field, `watch_mins`, so the min-gating rule can
    * adjudicate them individually: a watch-probe MIN moving >1.3× across
    * rounds triggers the worktree A/B ([[AbBench]] automates it) and the
    * verdict is recorded as `ab_verdict` in the committed artifact. The
    * members are the heavy dedup/ANN flagships the judge tracks; adding a
    * probe here is cheap (the reps exist anyway) — remove only with a
    * BASELINE note.
    */
  val watchProbes: Seq[String] = Seq(
    "q21_minhash_neardup", "q43_lsh_ann", "q87_semantic_dedup",
    "q112_seeded_lsh", "q116_jaccard_join")

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
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM_REPS", "7").toInt)
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
    // The frozen round-2 gate subset rides in the artifact itself
    // (VERDICT r17 item 3): gate_subset_sum is the only number comparable
    // across rounds. Bases (review r18): the median-based sum follows the
    // SAME any-failed-rep → -1 rule as `queries` (a judge recomputing it
    // from the queries map must land on the identical number, and a flaky
    // rep poisons the comparator loudly instead of shifting it); the min
    // floor computes over successful reps only (it is a diagnostic, and a
    // probe's real floor survives a flaked sibling rep). Either is -1
    // when a gate probe is absent (probe-filtered local runs) or wholly
    // failed.
    val byName = timed.toMap
    def gateSum(perProbe: Seq[Double] => Double): Double = {
      val vals = frozenGateProbes.map(p => byName.get(p) match {
        case Some(rs) => perProbe(rs)
        case None => -1.0
      })
      if (vals.exists(_ < 0)) -1.0 else vals.sum
    }
    val gateSubsetSum =
      gateSum(rs => if (rs.exists(_ < 0)) -1.0 else median(rs))
    val gateSubsetSumMin = gateSum { rs =>
      val ok = rs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    val gateRatio =
      if (gateSubsetSum < 0) -1.0 else gateSubsetSum / frozenGateBaselineSec
    // the watch set's floors as their own field (VERDICT r18 item 2):
    // min over successful reps, -1 when the probe is absent (filtered
    // local run) or every rep failed — same basis as queries_min, pulled
    // out so a judge reads the five adjudicable floors without diffing
    // the full map
    val watchMins = Bench.watchProbes.map { p =>
      val v = byName.get(p).map(_.filter(_ >= 0)) match {
        case Some(ok) if ok.nonEmpty => ok.min
        case _ => -1.0
      }
      "\"" + p + "\":" + v
    }.mkString("{", ",", "}")
    // min/median/max per probe (VERDICT r10 item 6): the reps exist
    // anyway, and the spread lets a judge separate ambient drift from a
    // plan regression without a worktree A/B — a probe whose min matches
    // the old record but whose max is 2× is load noise, not code.
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"stream_reps":$streamReps,"gate_subset_sum":$gateSubsetSum,"gate_subset_sum_min":$gateSubsetSumMin,"gate_baseline_sec":$frozenGateBaselineSec,"gate_ratio":$gateRatio,"watch_mins":$watchMins,"queries":${fmt(median, allOrNothing = true)},"queries_min":${fmt(_.min, allOrNothing = false)},"queries_max":${fmt(_.max, allOrNothing = false)},"queries_failed_reps":$failed,"sf":"$sfDir"}"""
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
