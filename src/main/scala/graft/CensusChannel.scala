package graft

import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}
import org.apache.spark.sql.SparkSession

/** Executor-side codegen-fallback census channel (VERDICT r18 item 1).
  *
  * The codegen census (CodegenCensusSpec) is the engine's only
  * silent-degradation instrument: Spark keeps answers CORRECT when
  * generated code fails to compile — it just walks the hot path out of
  * Tungsten, a multi-× slowdown at 100 TB that no oracle sees. The census
  * captures the three fallback log signals through a driver-JVM log4j
  * appender — which is BLIND to executor JVMs under the `local-cluster`
  * topology the multi-JVM gate (R197) made canonical: task-side
  * compilation logs into the executor's own log4j context and never
  * reaches the driver's appenders.
  *
  * This channel closes that gap with a Spark plugin: when
  * `spark.plugins=graft.CensusPlugin` and `spark.graft.census.dir` are set
  * (wired by [[ClusterGate.executorConfigs]] when `SPARK_GRAFT_CENSUS_DIR`
  * is exported), EVERY JVM in the application — driver and each executor —
  * installs a root-logger appender at startup that classifies fallback
  * events with the same pinned message texts as the in-process census and
  * appends them to `census-<executorId>.log` under the shared directory
  * (local-cluster workers share the driver's filesystem; on a real cluster
  * the directory would be a shared mount or the signals would ride an
  * accumulator instead — the plugin seam is the same). The census spec
  * merges the per-probe file DELTA with its driver-side capture, so the
  * opt-in all-probe census is no longer driver-blind under real executors,
  * and [[CensusChannel.main]] is the standing smoke proving the channel
  * live: a canary whose codegen throws ONLY in executor JVMs (see
  * [[org.apache.spark.sql.graft.CensusCanary]]) must be observed through
  * the files, attributed to a non-driver JVM.
  */
object CensusChannel {

  /** Directory the per-JVM census files land in (Spark conf, so it reaches
    * executor plugins through the launch conf, not the environment).
    */
  val DirConf = "spark.graft.census.dir"

  /** Fallback signals, keyed by the log line Spark emits at the moment of
    * degradation (message texts pinned against the Spark 4.1.2 jars —
    * shared with CodegenCensusSpec so the two capture paths can never
    * classify differently):
    *   - wholestage-compile-fallback: WholeStageCodegenExec caught a
    *     CompileException and re-executed interpreted;
    *   - wholestage-huge-method: compiled fine but a method exceeded
    *     hugeMethodLimit bytecode, so codegen was abandoned for the plan;
    *   - expr-interpreted-fallback: an expression-level codegen object
    *     (projection/predicate/ordering) dropped to interpreter mode.
    */
  def signalKind(msg: String): Option[String] =
    if (msg.contains("Whole-stage codegen disabled for plan"))
      Some("wholestage-compile-fallback")
    else if (msg.contains("Found too long generated codes"))
      Some("wholestage-huge-method")
    else if (msg.contains("Expr codegen error and falling back to interpreter mode"))
      Some("expr-interpreted-fallback")
    else None

  /** The Spark confs that activate the channel on every JVM of the app. */
  def configs(dir: String): Map[String, String] = Map(
    "spark.plugins" -> classOf[CensusPlugin].getName,
    DirConf -> dir)

  /** Extra executor JVM options: arming the canary makes executor-side
    * codegen of [[org.apache.spark.sql.graft.CensusCanaryExpr]] throw (the
    * channel's end-to-end liveness probe); never set on the driver.
    */
  def executorOptions(canary: Boolean): Seq[String] =
    if (canary) Seq(s"-D${org.apache.spark.sql.graft.CensusCanary.Prop}=throw")
    else Seq.empty

  /** Install the capturing appender in THIS JVM, writing classified
    * signals to `dir/census-<label>.log` (one `kind\tlabel` line per
    * event, flushed per event — the events are rare by contract). The two
    * emitting loggers are raised exactly like the in-process census
    * (WholeStageCodegenExec → INFO for both whole-stage signals; the
    * catalyst.expressions package → WARN for the interpreted-fallback
    * warning, which subclasses log under their own object names), because
    * log4j filters at the LOGGER before any appender sees the event.
    */
  def install(dir: String, label: String): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.Configurator
    val d = new java.io.File(dir)
    d.mkdirs()
    val out = new java.io.File(d, s"census-$label.log")
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    Configurator.setLevel(
      "org.apache.spark.sql.execution.WholeStageCodegenExec", Level.INFO)
    Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions", Level.WARN)
    val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
        s"graft-census-channel-$label", null,
        org.apache.logging.log4j.core.layout.PatternLayout.createDefaultLayout(),
        true, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        signalKind(e.getMessage.getFormattedMessage).foreach { kind =>
          // synchronized + per-event flush: events are rare (a fallback is
          // an exceptional degradation), files are per-JVM, and a signal
          // must be durable before the job that caused it returns
          out.synchronized {
            val w = new java.io.FileWriter(out, true)
            try w.write(s"$kind\t$label\n") finally w.close()
          }
        }
        ()
      }
    }
    app.start()
    cfg.getRootLogger.addAppender(app, Level.INFO, null)
    ctx.updateLoggers()
  }

  /** All signals recorded under `dir`, as (jvmLabel, kind) pairs —
    * `driver` is the driver JVM's label, executor ids everything else.
    */
  def readSignals(dir: String): Seq[(String, String)] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("census-") && f.getName.endsWith(".log"))
    files.toSeq.sortBy(_.getName).flatMap { f =>
      val label = f.getName.stripPrefix("census-").stripSuffix(".log")
      scala.io.Source.fromFile(f).getLines().toList.flatMap { line =>
        line.split('\t').headOption.filter(_.nonEmpty).map(k => (label, k))
      }
    }
  }

  /** Per-kind signal counts from NON-driver JVMs — the executor-side view
    * the census spec diffs around each probe (driver events are already
    * seen by its in-process appender; counting them twice would double-
    * report).
    */
  def executorSignalCounts(dir: String): Map[String, Int] =
    readSignals(dir).collect { case (label, kind) if label != "driver" => kind }
      .groupBy(identity).map { case (k, v) => k -> v.size }

  /** Channel smoke (run by ClusterGateSpec in a subprocess): under a
    * `local-cluster` master with `SPARK_GRAFT_CENSUS_DIR` set and
    * `SPARK_GRAFT_CENSUS_CANARY=throw`, the canary sort must (a) return
    * the CORRECT result (the fallback is interpreted, not wrong), (b) land
    * the expr-interpreted-fallback signal in a census file from a REAL
    * executor JVM, and (c) land NO signal from the driver JVM — proving
    * the observed degradation happened, and was observed, cross-process.
    */
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    val spark = (if (master.startsWith("local-cluster"))
      ClusterGate.configure(builder) else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val n = 4000L
    val sorted = spark.range(0, n, 1, 8).toDF("id")
      .sortWithinPartitions(
        org.apache.spark.sql.graft.CensusCanary.column(col("id")).desc)
    // correctness THROUGH the degradation: the per-partition sort ran
    // interpreted on the executors; both the global sum and each
    // partition's internal descending order must hold
    val rows = sorted.select(col("id"), spark_partition_id().as("pid"))
      .collect()
    require(rows.map(_.getLong(0)).sum == n * (n - 1) / 2,
      "census smoke: canary sort lost rows")
    val byPart = rows.groupBy(_.getInt(1)).values
    require(byPart.forall(part => part.map(_.getLong(0)).toSeq ==
      part.map(_.getLong(0)).toSeq.sorted.reverse),
      "census smoke: a partition is not descending — the interpreted " +
        "ordering fallback produced a WRONG order")
    spark.stop()
    val execCount = executorSignalCounts(dir)
      .getOrElse("expr-interpreted-fallback", 0)
    val driverCount = readSignals(dir)
      .count { case (l, k) => l == "driver" && k == "expr-interpreted-fallback" }
    println(s"""{"metric":"census_channel_smoke","executor_signals":$execCount,"driver_signals":$driverCount}""")
    if (execCount < 1) {
      System.err.println("[census-smoke] FAIL: the armed executor canary " +
        "was NOT observed through the channel — the executor census is blind")
      sys.exit(1)
    }
    if (driverCount > 0) {
      System.err.println("[census-smoke] FAIL: the driver JVM reported the " +
        "canary signal — the canary leaked out of the executor processes " +
        "and the smoke no longer proves cross-process capture")
      sys.exit(1)
    }
  }
}

/** The plugin both JVM kinds load at startup (registered via
  * `spark.plugins` by [[ClusterGate.executorConfigs]]): installs the
  * census appender before any task can compile generated code.
  */
class CensusPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = new DriverPlugin {
    override def init(sc: SparkContext,
        ctx: PluginContext): java.util.Map[String, String] = {
      CensusChannel.install(ctx.conf.get(CensusChannel.DirConf), "driver")
      java.util.Collections.emptyMap()
    }
  }
  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def init(ctx: PluginContext,
        extraConf: java.util.Map[String, String]): Unit =
      CensusChannel.install(ctx.conf.get(CensusChannel.DirConf),
        ctx.executorID())
  }
}
