package graft

/** Subprocess harness shared by the bench mains and the cross-JVM specs:
  * spawn a main in a fresh JVM with Spark's own JDK17 module options,
  * capture merged output to a file, bound the wait, and on timeout kill
  * the WHOLE process tree — a child that spawned Worker/executor JVMs
  * (local-cluster) or its own SparkSession must not leave orphans burning
  * CPU under later runs (ADVICE r18; review r19 made this the ONE
  * implementation — AbBench had grown a weaker copy).
  */
object ChildJvm {

  /** @param classpath the child's -cp; defaults to THIS JVM's classpath
    *   (right for forking mains/specs of this build). AbBench overrides
    *   it per compiled tree.
    * @return (exitedWithinTimeout, exitValue (-1 if killed), mergedOutput)
    */
  def run(main: String, args: Seq[String], env: Map[String, String],
      timeoutSec: Long, heap: String = "3g",
      classpath: String = System.getProperty("java.class.path")):
      (Boolean, Int, String) =
    await(start(main, args, env, heap, classpath), main, timeoutSec)

  /** Start without waiting — for children that must run CONCURRENTLY with
    * parent-side work (the cross-JVM race specs).
    */
  def start(main: String, args: Seq[String], env: Map[String, String],
      heap: String = "3g",
      classpath: String = System.getProperty("java.class.path")):
      (Process, java.io.File) = {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val cmd: Seq[String] = Seq(javaBin) ++ ClusterGate.executorJvmOptions ++
      Seq(s"-Xmx$heap", "-Dspark.ui.enabled=false", "-cp", classpath, main) ++
      args
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
    if (!exited) killTree(proc)
    val log = new String(
      java.nio.file.Files.readAllBytes(logFile.toPath), "UTF-8")
    (exited, if (exited) proc.exitValue() else -1, log)
  }

  /** Kill the child AND its descendants: sweep, kill the root, wait for
    * it to die (descendants spawned during the first sweep would survive
    * it), then sweep again.
    */
  def killTree(proc: Process): Unit = {
    proc.descendants().forEach(_.destroyForcibly())
    proc.destroyForcibly()
    proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
    proc.descendants().forEach(_.destroyForcibly())
    ()
  }
}
