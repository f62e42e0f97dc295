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

  test("ClusterGate.configure wires executor classpath, heap, and JDK17 opens") {
    val b = org.apache.spark.sql.SparkSession.builder()
    // The options come from Spark's own JavaModuleOptions (no hand copy
    // to rot): they must include the add-opens the engine is known to
    // need plus the entries the r18 review found missing from the old
    // hand-maintained list.
    assert(ClusterGate.executorJvmOptions.nonEmpty)
    assert(ClusterGate.executorJvmOptions.exists(_.contains("java.base/sun.nio.ch")))
    assert(ClusterGate.executorJvmOptions.exists(_.contains("jdk.internal.ref")))
    // the executor classpath entry resolves cwd-independently and exists
    assert(new java.io.File(ClusterGate.graftClasspathEntry()).exists)
    // configure() must not throw and must return the same builder chain
    assert(ClusterGate.configure(b) != null)
  }

  test("Verify under local-cluster[2,2,1536]: real executor processes run a shuffle probe and a custom-kernel probe oracle-dump green") {
    val out = java.nio.file.Files.createTempDirectory("clusgate").toString
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val cp = System.getProperty("java.class.path")
    // q01: shuffle agg (closure + codegen through real executors);
    // q15: cosine top-k (graft custom Expression classes must load in the
    // executor JVMs via spark.executor.extraClassPath)
    val cmd: Seq[String] = Seq(javaBin) ++ ClusterGate.executorJvmOptions ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.Verify", "/root/testdata/sf0.001", out,
      "q01_pricing_summary,q15_cosine_topk")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_MASTER", "local-cluster[2,2,1536]")
    pb.environment().put("SPARK_GRAFT_EXEC_MEM", "1g")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.redirectErrorStream(true)
    // redirect to a file so the wait below actually bounds a hung child
    // (reading the pipe inline would block past any waitFor timeout)
    val logFile = java.nio.file.Files.createTempFile("clusgate", ".log").toFile
    pb.redirectOutput(logFile)
    val proc = pb.start()
    val exited = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!exited) proc.destroyForcibly()
    val log = new String(
      java.nio.file.Files.readAllBytes(logFile.toPath), "UTF-8")
    assert(exited, s"local-cluster Verify smoke timed out:\n${log.takeRight(2000)}")
    assert(proc.exitValue() == 0,
      s"local-cluster Verify smoke failed:\n${log.takeRight(4000)}")
    assert(!log.contains("] q01_pricing_summary failed") &&
      !log.contains("] q15_cosine_topk failed"),
      s"probe failed under local-cluster:\n${log.takeRight(4000)}")
    for (probe <- Seq("q01_pricing_summary", "q15_cosine_topk")) {
      val dir = new java.io.File(out, probe)
      assert(dir.isDirectory && dir.listFiles().exists(_.getName.endsWith(".parquet")),
        s"$probe produced no parquet under local-cluster")
    }
  }
}
