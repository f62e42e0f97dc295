package graft.operators

import org.apache.spark.sql.SparkSession

/** The operational entry point over the engine's five persisted-store
  * maintenance policies (VERDICT r16 item 2 — the last runbook made an
  * operator): a scheduler registers every catalog root once, calls
  * [[Maintenance.maintainAll]] hourly, and gets back a structured
  * per-store report — which stores were observed healthy, which were
  * ticked and what generation was published, and which refused their
  * publish (quiescence tripwire) or failed outright.
  *
  * Design points, all inherited from the per-store policies this sweeps
  * ([[Search.maintainVectorIndex]], [[Search.maintainTextIndex]],
  * [[Dedup.maintainSoftDedupWeights]], [[Sketches.maintainSketchStore]],
  * [[Dedup.maintainSequenceStore]]):
  *
  *   - A HEALTHY store costs one driver-side listing (the vector axis:
  *     one sidecar read) and runs no Spark job — a sweep over hundreds
  *     of registered stores is metadata-cheap, which is what makes an
  *     hourly cadence viable at 100 TB.
  *   - Stores tick SEQUENTIALLY: each policy assumes the single-writer
  *     discipline per catalog root, and running the (rare) compaction
  *     rewrites one-at-a-time keeps the cluster's concurrent shuffle
  *     footprint bounded by one store's rewrite, not the fleet's.
  *   - One store's failure never aborts the sweep: a quiescence REFUSAL
  *     (a fold/append landed mid-rewrite — re-tick with the writer
  *     paused) and any other per-store error are both caught, reported,
  *     and the sweep moves on. Forty healthy stores must not miss their
  *     maintenance because one store's stream wasn't paused.
  *
  * The reference (`index_documents.py`) has no maintenance story at all —
  * it rebuilds its Postgres table per run (lines 198-249); this is the
  * scale-out replacement for that rebuild-the-world posture.
  */
object Maintenance {

  /** A registered store: which policy maintains `root` and its budget. */
  sealed trait StorePolicy {
    /** Catalog root ([[graft.sources.Generations]] layout). */
    def root: String
    /** Policy-family tag carried into the report. */
    def kind: String
  }

  /** [[Search.maintainVectorIndex]] — drift-triggered retrain.
    * `observe` is the drift metric (e.g. [[Search.minClusterSimilarity]],
    * O(stats) via the driftstats sidecar when healthy); `refresh` the
    * family's retrain partially applied over the caller's corpus.
    */
  final case class VectorPolicy(root: String, threshold: Double,
      observe: String => Double,
      refresh: (String, String) => Long) extends StorePolicy {
    def kind: String = "vector"
  }

  /** [[Search.maintainTextIndex]] — postings-fragmentation compaction. */
  final case class TextPolicy(root: String, maxPostingsFiles: Int,
      targetFiles: Int = 16) extends StorePolicy {
    def kind: String = "text"
  }

  /** [[Dedup.maintainSoftDedupWeights]] — weights-batch-count fold. */
  final case class WeightsPolicy(root: String, maxBatches: Int,
      committedBatchId: Long, idCol: String = "id",
      targetFiles: Int = 4) extends StorePolicy {
    def kind: String = "weights"
  }

  /** [[Sketches.maintainSketchStore]] — sketch-blob file-count fold. */
  final case class SketchPolicy(root: String, family: String,
      closedBatchIds: Seq[String], compactedBatchId: String,
      maxDataFiles: Int, targetFiles: Int = 16, k: Int = 200,
      maxMapSize: Int = 1024) extends StorePolicy {
    def kind: String = "sketch"
  }

  /** [[Dedup.maintainSequenceStore]] — sigs-fragmentation compaction. */
  final case class SequencePolicy(root: String, committedBatchId: Long,
      maxSigFiles: Int, targetFiles: Int = 16) extends StorePolicy {
    def kind: String = "sequence"
  }

  /** One store's sweep outcome.
    *
    * @param observed  the value the policy's trigger compared — the drift
    *                  metric for the vector axis, the file/batch count for
    *                  the layout axes; NaN when the tick failed before
    *                  observing
    * @param verdict   `healthy` (no work, nothing staged) | `published`
    *                  (rewrite + atomic pointer swing) | `refused` (the
    *                  quiescence tripwire — a write landed mid-rewrite;
    *                  the staged generation is abandoned for vacuum,
    *                  re-tick with the writer paused) | `error` (anything
    *                  else; see `detail`)
    * @param published the published generation name when verdict is
    *                  `published`
    * @param detail    the refusal/error message, empty otherwise
    */
  final case class StoreReport(root: String, kind: String, observed: Double,
      verdict: String, published: Option[String], detail: String)

  /** Sweep every registered store: observe each, tick only the unhealthy
    * ones, never let one store's failure starve the rest. Reports come
    * back in registration order.
    */
  def maintainAll(spark: SparkSession,
      policies: Seq[StorePolicy]): Seq[StoreReport] =
    policies.map(p => sweepOne(spark, p))

  /** The five policies' tripwires throw the typed
    * [[QuiescenceRefusalException]] (via [[QuiescenceRefusal.refuseUnless]])
    * — that TYPE is what separates a REFUSED publish (operationally
    * expected: pause the writer and re-tick) from a genuine error.
    * Classification no longer depends on message text; the
    * "mid-compaction"/"mid-refresh" vocabulary stays pinned by spec only
    * as a belt for the human-readable report detail.
    */
  private def isQuiescenceRefusal(e: Throwable): Boolean =
    e.isInstanceOf[QuiescenceRefusalException]

  private def sweepOne(spark: SparkSession, p: StorePolicy): StoreReport = {
    var observed = Double.NaN
    def run(): Option[String] = p match {
      case v: VectorPolicy =>
        // capture the value as the policy itself observes it — the sweep
        // adds zero extra work on the vector axis
        Search.maintainVectorIndex(spark, v.root, v.threshold,
          path => { observed = v.observe(path); observed }, v.refresh)
      case t: TextPolicy =>
        observed = liveCount(spark, t.root, "/postings")
        Search.maintainTextIndex(spark, t.root, t.maxPostingsFiles,
          t.targetFiles)
      case w: WeightsPolicy =>
        observed = {
          val live = resolve(spark, w.root)
          Dedup.committedWeightsBatches(spark, live).size.toDouble
        }
        Dedup.maintainSoftDedupWeights(spark, w.root, w.maxBatches,
          w.committedBatchId, w.idCol, w.targetFiles)
      case s: SketchPolicy =>
        observed = liveCount(spark, s.root, "")
        Sketches.maintainSketchStore(spark, s.root, s.family,
          s.closedBatchIds, s.compactedBatchId, s.maxDataFiles,
          s.targetFiles, s.k, s.maxMapSize)
      case q: SequencePolicy =>
        observed = liveCount(spark, q.root, "/sigs")
        Dedup.maintainSequenceStore(spark, q.root, q.committedBatchId,
          q.maxSigFiles, q.targetFiles)
    }
    try run() match {
      case Some(gen) =>
        StoreReport(p.root, p.kind, observed, "published", Some(gen), "")
      case None =>
        StoreReport(p.root, p.kind, observed, "healthy", None, "")
    } catch {
      case e if isQuiescenceRefusal(e) =>
        StoreReport(p.root, p.kind, observed, "refused", None, e.getMessage)
      case scala.util.control.NonFatal(e) =>
        StoreReport(p.root, p.kind, observed, "error", None,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    }
  }

  private def resolve(spark: SparkSession, root: String): String =
    graft.sources.Generations.resolve(root,
      spark.sparkContext.hadoopConfiguration)

  /** The layout observables are all "visible data files under the live
    * generation's subdir" — one driver listing, the same count the policy
    * re-derives for its own trigger (the duplication costs a second
    * metadata listing, never a job).
    */
  private def liveCount(spark: SparkSession, root: String,
      sub: String): Double =
    Search.dataFileCount(spark, resolve(spark, root) + sub).toDouble
}
