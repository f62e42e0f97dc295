package graft

/** Test-scope subprocess harness: spawn a main in a fresh JVM with this
  * suite's classpath and Spark's own JDK17 module options, capture merged
  * output to a file, bound the wait, and on timeout kill the WHOLE process
  * tree — a child that spawned Worker/executor JVMs (local-cluster) or its
  * own SparkSession must not leave orphans to pollute later runs
  * (ADVICE r18).
  */
object ChildJvm {

  /** @return (exitedWithinTimeout, exitValue (-1 if killed), mergedOutput) */
  def run(main: String, args: Seq[String], env: Map[String, String],
      timeoutSec: Long, heap: String = "3g"): (Boolean, Int, String) = {
    val proc = start(main, args, env, heap)
    await(proc, main, timeoutSec)
  }

  /** Start without waiting — for children that must run CONCURRENTLY with
    * parent-side work (the cross-JVM race specs).
    */
  def start(main: String, args: Seq[String], env: Map[String, String],
      heap: String = "3g"): (Process, java.io.File) = {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val cp = System.getProperty("java.class.path")
    val cmd: Seq[String] = Seq(javaBin) ++ ClusterGate.executorJvmOptions ++
      Seq(s"-Xmx$heap", "-Dspark.ui.enabled=false", "-cp", cp, main) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(true)
    // redirect to a file so a bounded wait actually bounds a hung child
    // (reading the pipe inline would block past any waitFor timeout)
    val logFile = java.nio.file.Files.createTempFile("childjvm", ".log").toFile
    pb.redirectOutput(logFile)
    (pb.start(), logFile)
  }

  def await(started: (Process, java.io.File), main: String,
      timeoutSec: Long): (Boolean, Int, String) = {
    val (proc, logFile) = started
    val exited = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!exited) {
      proc.descendants().forEach(_.destroyForcibly())
      proc.destroyForcibly()
      proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
      proc.descendants().forEach(_.destroyForcibly())
    }
    val log = new String(
      java.nio.file.Files.readAllBytes(logFile.toPath), "UTF-8")
    (exited, if (exited) proc.exitValue() else -1, log)
  }
}
