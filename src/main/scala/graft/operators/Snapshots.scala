package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing for incremental corpus processing (EXT scale
  * mandate; the reference re-indexes whole directories on every run —
  * `index_documents.py:232-249` — which a 100 TB pipeline cannot).
  *
  * The recurring production shape: a new crawl/export snapshot arrives and
  * only the added-or-changed documents should flow through the expensive
  * stages (clean → chunk → embed → index). Change detection is by content
  * fingerprint, NOT by timestamps (mirrors the repo-wide content-addressed
  * discipline: retry-safe, clock-skew-immune).
  *
  * Scale shape: fingerprints are fixed-width digests computed BEFORE the
  * join, so the one full-outer shuffle moves (id, 64-byte fp) pairs, never
  * document text; downstream payloads rejoin by id against only the
  * changed slice (a semi-join that is tiny when snapshots mostly agree —
  * the common case).
  */
object Snapshots {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"
  val Unchanged = "unchanged"

  /** Content fingerprint for delta detection — sha2-256 of the column's
    * string form (collision-free for all practical purposes, and the same
    * digest the exact-dedup family keys on).
    */
  def fingerprint(c: Column): Column = sha2(c.cast("string"), 256)

  /** Classify every id across two snapshots: one full-outer join on the id
    * over (id, fingerprint) pairs.
    *
    * CONTRACT: `idCol` must be unique within each snapshot (it is the
    * document identity) — duplicate ids would fan the full-outer join out
    * row-multiplicatively. A NULL fingerprint (null payload column) on a
    * present row is indistinguishable from absence; fingerprint non-null
    * columns or coalesce upstream.
    *
    * @return (idCol, status ∈ {added,removed,changed,unchanged}, old_fp,
    *         new_fp) — fps NULL on the absent side
    */
  def snapshotDelta(old: DataFrame, cur: DataFrame, idCol: String,
      fpCol: Column): DataFrame = {
    val o = old.select(col(idCol).as("_id"), fpCol.as("old_fp"))
    val c = cur.select(col(idCol).as("_id"), fpCol.as("new_fp"))
    o.join(c, Seq("_id"), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit(Added))
          .when(col("new_fp").isNull, lit(Removed))
          .when(col("old_fp") === col("new_fp"), lit(Unchanged))
          .otherwise(lit(Changed)))
      .select(col("_id").as(idCol), col("status"), col("old_fp"), col("new_fp"))
  }

  /** The rows downstream stages must (re)process: `cur` restricted to
    * added ∪ changed ids (left-semi — payload columns never widen the
    * delta computation).
    */
  def changedRows(old: DataFrame, cur: DataFrame, idCol: String,
      fpCol: Column): DataFrame = {
    val ids = snapshotDelta(old, cur, idCol, fpCol)
      .where(col("status").isin(Added, Changed))
      .select(col(idCol))
    cur.join(ids, Seq(idCol), "left_semi")
  }

  /** The ids to retire from downstream stores (e.g. delete from the vector
    * index): present before, absent now.
    */
  def removedIds(old: DataFrame, cur: DataFrame, idCol: String,
      fpCol: Column): DataFrame =
    snapshotDelta(old, cur, idCol, fpCol)
      .where(col("status") === Removed)
      .select(col(idCol))
}
