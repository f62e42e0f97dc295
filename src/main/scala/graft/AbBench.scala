package graft

/** Interleaved two-tree A/B bench (VERDICT r18 item 8): the worktree A/B
  * protocol — the only way to separate ambient host load from a real
  * regression when a probe's floor moves across rounds — was manual prose
  * in BASELINE.md. This main makes it one command:
  *
  * {{{
  * sbt "runMain graft.AbBench <treeA> <treeB> <probesCsv> [interleaves]"
  * }}}
  *
  * Each tree is an sbt-COMPILED checkout (a git worktree of the commit
  * under comparison; `target/scala-2.13/classes` must exist — the main
  * fails fast otherwise). Per interleave round it runs `graft.Bench` in a
  * fresh child JVM from tree A, then tree B, alternating — A,B,A,B,… — so
  * ambient load hits both trees equally instead of whichever ran second;
  * each child times the probe list once (`SPARK_GRAFT_BENCH_REPS=1`,
  * `SPARK_GRAFT_BENCH_ONLY=probes`) in its own session with Bench's
  * standard warmup and inter-probe hygiene. The verdict per probe reads
  * the MIN across rounds on each side (the same noise-damped floor the
  * min-gating rule uses): a B/A min ratio beyond the threshold (default
  * 1.3 — the watch-probe trigger) is a REAL difference attributable to
  * the tree, anything inside it is ambient.
  *
  * Child classpath = `<tree>/target/scala-2.13/classes` + the Spark jars
  * directory — valid under the same assumption ClusterGate documents (the
  * engine has no compile-scope managed deps; everything else is under
  * SPARK_HOME/jars). JVM options come from Spark's own JavaModuleOptions
  * via [[ClusterGate.executorJvmOptions]], identical on both sides.
  *
  * Output: one JSON line,
  * `{"metric":"ab_bench","tree_a":…,"tree_b":…,"sf":…,"interleaves":N,
  *   "probes":{"q87_…":{"a_min":…,"b_min":…,"ratio":…,"verdict":…}},
  *   "verdict":"…"}`
  * where the overall verdict is the worst per-probe one (`b_slower` /
  * `a_slower` beat `ambient`). Recorded as the `ab_verdict` field when a
  * bench artifact is committed with an open floor dispute.
  */
object AbBench {

  /** Extract a probe's seconds from the `queries` (median) object of a
    * child's Bench JSON line. Anchored INSIDE that object (review r19):
    * the artifact emits `watch_mins` before `queries`, and the A/B's
    * usual subjects ARE the watch set, so a first-match scan over the
    * whole line would read the min field — coincidentally equal at the
    * REPS=1 the children run today, silently wrong for any other reps.
    */
  private[graft] def probeSeconds(json: String, probe: String): Double = {
    val qm = java.util.regex.Pattern
      .compile("\"queries\":\\{([^}]*)\\}").matcher(json)
    require(qm.find(), s"AbBench: no queries object in child output: " +
      json.take(400))
    val queries = qm.group(1)
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(probe) + "\":(-?[0-9.Ee+-]+)")
      .matcher(queries)
    require(m.find(), s"AbBench: probe $probe missing from child output: " +
      json.take(400))
    m.group(1).toDouble
  }

  private def runTree(tree: String, probes: String, sfDir: String,
      cpus: String, label: String, round: Int): String = {
    val classes = new java.io.File(tree, "target/scala-2.13/classes")
    require(classes.isDirectory,
      s"AbBench: $tree is not an sbt-compiled checkout (missing $classes " +
        "— run `sbt compile` in that worktree first)")
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    val outFile = java.nio.file.Files
      .createTempFile(s"ab-$label-$round", ".json").toFile
    // generous bound: a bench child that hangs must fail the A/B loudly,
    // not silently stall an adjudication — and ChildJvm's tree kill must
    // leave no orphan Spark daemon inflating the LATER interleave rounds'
    // floors (review r19: that contamination is exactly what the
    // interleave protocol exists to remove)
    val timeoutMin = sys.env.getOrElse("SPARK_GRAFT_AB_TIMEOUT_MIN", "30").toLong
    val (exited, exit, log) = ChildJvm.run("graft.Bench", Seq.empty,
      env = Map(
        "SPARK_GRAFT_SF_DIR" -> sfDir,
        "SPARK_GRAFT_CPUS" -> cpus,
        "SPARK_GRAFT_BENCH_REPS" -> "1",
        "SPARK_GRAFT_BENCH_STREAM_REPS" -> "1",
        "SPARK_GRAFT_BENCH_ONLY" -> probes,
        "SPARK_GRAFT_BENCH_OUT" -> outFile.getAbsolutePath),
      timeoutSec = timeoutMin * 60,
      heap = sys.env.getOrElse("SPARK_GRAFT_AB_HEAP", "8g"),
      classpath = s"${classes.getAbsolutePath}:$sparkHome/jars/*")
    require(exited && exit == 0,
      s"AbBench: child ($label round $round, tree $tree) " +
        (if (exited) s"exited $exit" else "timed out") +
        s" — log tail:\n${log.takeRight(2000)}")
    new String(java.nio.file.Files.readAllBytes(outFile.toPath), "UTF-8")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: AbBench <treeA> <treeB> <probesCsv> [interleaves] [sfDir]")
    val (treeA, treeB, probesCsv) = (args(0), args(1), args(2))
    val interleaves = if (args.length > 3) args(3).toInt else 3
    val probes = probesCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 4) args(4)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_AB_THRESHOLD", "1.3").toDouble
    val runs: Seq[(String, String)] = (1 to interleaves).flatMap { r =>
      Seq("a" -> runTree(treeA, probesCsv, sfDir, cpus, "a", r),
        "b" -> runTree(treeB, probesCsv, sfDir, cpus, "b", r))
    }
    def minsFor(side: String, probe: String): Double = {
      val vals = runs.collect { case (`side`, json) => probeSeconds(json, probe) }
        .filter(_ >= 0)
      require(vals.nonEmpty, s"AbBench: probe $probe failed on every " +
        s"round of tree ${if (side == "a") treeA else treeB}")
      vals.min
    }
    val perProbe = probes.map { p =>
      val (aMin, bMin) = (minsFor("a", p), minsFor("b", p))
      val ratio = bMin / aMin
      val verdict =
        if (ratio > threshold) "b_slower"
        else if (ratio < 1.0 / threshold) "a_slower"
        else "ambient"
      (p, aMin, bMin, ratio, verdict)
    }
    val overall =
      if (perProbe.exists(_._5 == "b_slower")) "b_slower"
      else if (perProbe.exists(_._5 == "a_slower")) "a_slower"
      else "ambient"
    val probesJson = perProbe.map { case (p, a, b, r, v) =>
      f""""$p":{"a_min":$a,"b_min":$b,"ratio":$r%.4f,"verdict":"$v"}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"ab_bench","tree_a":"$treeA","tree_b":"$treeB",""" +
      s""""sf":"$sfDir","interleaves":$interleaves,"threshold":$threshold,""" +
      s""""probes":$probesJson,"verdict":"$overall"}""")
  }
}
