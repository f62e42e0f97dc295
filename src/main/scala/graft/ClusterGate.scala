package graft

import org.apache.spark.sql.SparkSession

/** Executor-process configuration for the multi-JVM gate (VERDICT r17
  * item 1): `local-cluster[n,cores,memMB]` spawns REAL executor JVMs
  * from the standalone Worker, which — unlike `local[*]`'s driver
  * threads — exercise closure serialization, executor-side classloading,
  * and the absence of driver statics. Seventeen rounds of gates ran with
  * executors as threads in one JVM; this is the configuration that
  * catches what that structurally cannot.
  *
  * The Worker launches executors from `SPARK_HOME` (`/opt/spark`, set in
  * the image), so the Spark jars are on their classpath for free; our
  * own classes are NOT — they live in sbt's `target/scala-2.13/classes`
  * and must ride `spark.executor.extraClassPath`. JDK 17 module opens,
  * which `build.sbt` injects into the forked driver, likewise must be
  * repeated for the executor JVMs via `spark.executor.extraJavaOptions`
  * (Spark's own launcher injects them only under `spark-submit`).
  */
object ClusterGate {

  /** The JVM options Spark 4.x needs on JDK 17+ — taken from Spark's OWN
    * `org.apache.spark.launcher.JavaModuleOptions` (on the runtime
    * classpath), not a hand-maintained copy that would rot on Spark
    * upgrades and diverge from what spark-submit injects (review r18:
    * the hand copy missed jdk.internal.ref and the krb5/native-access
    * entries).
    */
  val executorJvmOptions: Seq[String] =
    org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptionArray().toSeq

  /** Where THIS JVM loaded the graft classes from — cwd-independent (the
    * code-source location), so executors get the same classes no matter
    * the launch directory. Fails fast if it can't be resolved to a real
    * path (a cryptic task-side ClassNotFoundException otherwise).
    */
  def graftClasspathEntry(): String = {
    val src = getClass.getProtectionDomain.getCodeSource
    require(src != null && src.getLocation != null,
      "ClusterGate: cannot resolve the graft code source for the " +
        "executor classpath — launch with a file-based classpath entry")
    val f = new java.io.File(src.getLocation.toURI)
    require(f.exists,
      s"ClusterGate: graft code source ${f.getAbsolutePath} does not exist")
    f.getAbsolutePath
  }

  /** Apply the executor-process config a `local-cluster` master needs.
    * `SPARK_GRAFT_EXEC_MEM` sizes each executor heap (default 3g — under
    * the 4096 MB per-worker offer the recommended master string grants).
    */
  def configure(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
      .config("spark.executor.extraClassPath", graftClasspathEntry())
      .config("spark.executor.extraJavaOptions",
        executorJvmOptions.mkString(" "))
}
