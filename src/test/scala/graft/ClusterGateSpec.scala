package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multi-JVM gate's standing smoke (VERDICT r17 item 1): Verify under
  * `local-cluster` — executors as REAL forked processes — must stay green,
  * or the executor-side wiring (classpath, JDK17 opens, scala-version
  * probe) has rotted. The full 169-probe local-cluster run is the round
  * recipe (see .claude/skills/verify/SKILL.md); this smoke keeps the
  * configuration itself from regressing between full runs.
  *
  * Runs in a SUBPROCESS: the suite's shared SparkContext is JVM-wide and
  * a second context cannot coexist, so the gate gets its own JVM — which
  * is also exactly the shape of the real recipe.
  */
class ClusterGateSpec extends AnyFunSuite {

  private val pinnedEnv = Map("SPARK_SCALA_VERSION" -> "2.13")

  test("ClusterGate.executorConfigs wires executor classpath, heap, and JDK17 opens") {
    // The options come from Spark's own JavaModuleOptions (no hand copy
    // to rot): they must include the add-opens the engine is known to
    // need plus the entries the r18 review found missing from the old
    // hand-maintained list.
    assert(ClusterGate.executorJvmOptions.nonEmpty)
    assert(ClusterGate.executorJvmOptions.exists(_.contains("java.base/sun.nio.ch")))
    assert(ClusterGate.executorJvmOptions.exists(_.contains("jdk.internal.ref")))
    // the executor classpath entry resolves cwd-independently and exists
    assert(new java.io.File(ClusterGate.graftClasspathEntry()).exists)
    // the configured VALUES land (ADVICE r18: the old `configure(b) != null`
    // assertion was vacuous — the builder chain always returns itself)
    val cfgs = ClusterGate.executorConfigs(pinnedEnv)
    assert(cfgs("spark.executor.memory") == "3g")
    assert(cfgs("spark.executor.extraClassPath") == ClusterGate.graftClasspathEntry())
    val opts = cfgs("spark.executor.extraJavaOptions")
    assert(ClusterGate.executorJvmOptions.forall(opts.contains))
    // heap override honored
    assert(ClusterGate.executorConfigs(pinnedEnv +
      ("SPARK_GRAFT_EXEC_MEM" -> "1g"))("spark.executor.memory") == "1g")
    // no census dir → no plugin, no canary -D (the channel is opt-in)
    assert(!cfgs.contains("spark.plugins"))
    assert(!opts.contains("graft.census.canary"))
  }

  test("ClusterGate.executorConfigs fails fast when SPARK_SCALA_VERSION is not exported (VERDICT r18 item 6)") {
    // Without the pin, Spark's launcher probes $SPARK_HOME/launcher/target
    // (a dev-build layout absent from /opt/spark) and aborts EXECUTOR
    // launch at first task with "Cannot find any build directories" —
    // long after the session built fine. The gate must refuse up front
    // with the recipe in the message.
    val e = intercept[IllegalArgumentException] {
      ClusterGate.executorConfigs(Map.empty)
    }
    assert(e.getMessage.contains("SPARK_SCALA_VERSION"))
    assert(e.getMessage.contains("local-cluster"))
  }

  test("ClusterGate.executorConfigs wires the census channel when SPARK_GRAFT_CENSUS_DIR is set") {
    val cfgs = ClusterGate.executorConfigs(pinnedEnv ++ Map(
      "SPARK_GRAFT_CENSUS_DIR" -> "/tmp/census-x",
      "SPARK_GRAFT_CENSUS_CANARY" -> "throw"))
    assert(cfgs("spark.plugins") == classOf[CensusPlugin].getName)
    assert(cfgs(CensusChannel.DirConf) == "/tmp/census-x")
    // the canary -D rides the EXECUTOR JVM options only — the driver JVM
    // of any session built from these configs is never armed
    assert(cfgs("spark.executor.extraJavaOptions")
      .contains("-Dgraft.census.canary=throw"))
    // without the canary env the -D must be absent (an armed production
    // run would fall back on every ordering containing the canary expr)
    assert(!ClusterGate.executorConfigs(pinnedEnv +
      ("SPARK_GRAFT_CENSUS_DIR" -> "/tmp/census-x"))(
      "spark.executor.extraJavaOptions").contains("graft.census.canary"))
  }

  /** [[ChildJvm.run]] with the timeout turned into a spec failure. */
  private def runChild(main: String, args: Seq[String],
      env: Map[String, String], timeoutSec: Long): (Int, String) = {
    val (exited, exit, log) = ChildJvm.run(main, args, env, timeoutSec)
    assert(exited, s"$main under local-cluster timed out:\n${log.takeRight(2000)}")
    (exit, log)
  }

  test("Verify under local-cluster[2,2,1536]: real executor processes run a shuffle probe and a custom-kernel probe oracle-dump green") {
    val out = java.nio.file.Files.createTempDirectory("clusgate").toString
    // q01: shuffle agg (closure + codegen through real executors);
    // q15: cosine top-k (graft custom Expression classes must load in the
    // executor JVMs via spark.executor.extraClassPath)
    val (exit, log) = runChild("graft.Verify",
      Seq("/root/testdata/sf0.001", out, "q01_pricing_summary,q15_cosine_topk"),
      Map(
        "SPARK_GRAFT_MASTER" -> "local-cluster[2,2,1536]",
        "SPARK_GRAFT_EXEC_MEM" -> "1g",
        "SPARK_SCALA_VERSION" -> "2.13",
        "SPARK_GRAFT_CPUS" -> "4"),
      timeoutSec = 300)
    assert(exit == 0, s"local-cluster Verify smoke failed:\n${log.takeRight(4000)}")
    assert(!log.contains("] q01_pricing_summary failed") &&
      !log.contains("] q15_cosine_topk failed"),
      s"probe failed under local-cluster:\n${log.takeRight(4000)}")
    for (probe <- Seq("q01_pricing_summary", "q15_cosine_topk")) {
      val dir = new java.io.File(out, probe)
      assert(dir.isDirectory && dir.listFiles().exists(_.getName.endsWith(".parquet")),
        s"$probe produced no parquet under local-cluster")
    }
  }

  test("census channel canary under local-cluster[2,2,1536]: an executor-only induced codegen fallback is captured through the files (VERDICT r18 item 1)") {
    val censusDir = java.nio.file.Files.createTempDirectory("census").toString
    val (exit, log) = runChild("graft.CensusChannel", Seq(censusDir),
      Map(
        "SPARK_GRAFT_MASTER" -> "local-cluster[2,2,1536]",
        "SPARK_GRAFT_EXEC_MEM" -> "1g",
        "SPARK_SCALA_VERSION" -> "2.13",
        "SPARK_GRAFT_CPUS" -> "4",
        "SPARK_GRAFT_CENSUS_DIR" -> censusDir,
        "SPARK_GRAFT_CENSUS_CANARY" -> "throw"),
      timeoutSec = 300)
    assert(exit == 0, s"census canary smoke failed:\n${log.takeRight(4000)}")
    // re-assert from the parent on the raw files: the signal must exist,
    // classified, and attributed to a NON-driver JVM label
    val sigs = CensusChannel.readSignals(censusDir)
    assert(sigs.exists { case (label, kind) =>
      label != "driver" && kind == "expr-interpreted-fallback" },
      s"no executor-attributed fallback signal in $censusDir: $sigs")
    assert(!sigs.exists { case (label, kind) =>
      label == "driver" && kind == "expr-interpreted-fallback" },
      s"the canary fired in the DRIVER JVM — it no longer proves " +
        s"cross-process capture: $sigs")
  }
}
