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

  /** The `--add-opens` list Spark 4.x needs on JDK 17+, matching
    * `org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()`
    * and the build.sbt driver list.
    */
  val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED")

  /** Apply the executor-process config a `local-cluster` master needs.
    * `SPARK_GRAFT_EXEC_MEM` sizes each executor heap (default 3g — under
    * the 4096 MB per-worker offer the recommended master string grants).
    */
  def configure(builder: SparkSession.Builder): SparkSession.Builder = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    builder
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.executor.extraJavaOptions", jdk17AddOpens.mkString(" "))
  }
}
