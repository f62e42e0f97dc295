package graft.operators

/** A maintenance policy's quiescence tripwire fired: a fold/append landed
  * in the live generation while the rewrite was staging, so the policy
  * refuses to publish a generation that would miss it. Operationally
  * EXPECTED (pause the writer, vacuum, re-tick) — [[Maintenance]]
  * classifies it as `refused`, never `error`.
  *
  * Extends [[IllegalArgumentException]] so the pre-existing
  * `require`-shaped call sites and every spec that intercepts the
  * refusal by that supertype keep working; the type (not the message
  * text) is now the classification contract. The "mid-compaction" /
  * "mid-refresh" message vocabulary remains pinned by MaintenanceSpec as
  * a belt for the TEXT operators read in reports, but rewording a
  * message can no longer silently reclassify a refusal.
  */
final class QuiescenceRefusalException(message: String)
    extends IllegalArgumentException(message)

object QuiescenceRefusal {

  /** `require`, but typed: the five policies' tripwires call this instead
    * of `require` so the refusal is distinguishable from any other
    * argument error by type alone.
    */
  def refuseUnless(condition: Boolean, message: => String): Unit =
    if (!condition) throw new QuiescenceRefusalException(message)
}
