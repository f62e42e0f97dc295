package graft.sources

import org.apache.hadoop.fs.Path

/** Shared explicit filesystem classification for append-style sinks
  * (Index.appendIndex, Dedup.incrementalNearDupPairs). Never classifies by
  * exception-message matching — that shifts across Spark versions/locales.
  *
  * States:
  *   - `Empty`   — path absent, or present with no VISIBLE files (only
  *     `_SUCCESS`/`_temporary`/dot-files from a failed or completed commit):
  *     safe to treat as "nothing written yet";
  *   - `Data`    — visible parquet data files present: read them (corrupt
  *     footers then fail the read loudly, as they should);
  *   - `Foreign` — visible NON-parquet files present: refuse to append into
  *     a directory that isn't this sink's own layout.
  *
  * Visibility is judged on path components RELATIVE to the target (so an
  * index stored under a dot-directory ancestor like `~/.cache/idx` is not
  * misclassified as hidden — only components BELOW the target count).
  */
object PathState extends Enumeration {
  val Empty, Data, Foreign = Value

  def classify(path: String, hadoopConf: org.apache.hadoop.conf.Configuration): Value = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(hadoopConf)
    if (!fs.exists(hPath)) return Empty
    val rootUri = fs.makeQualified(hPath).toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(hPath, true)
    var sawParquet = false
    var sawOther = false
    while (it.hasNext && !sawParquet) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val hidden = rel.split('/').exists(p => p.startsWith("_") || p.startsWith("."))
      if (!hidden) {
        if (f.getPath.getName.endsWith(".parquet")) sawParquet = true
        else sawOther = true
      }
    }
    if (sawParquet) Data
    else if (sawOther) Foreign
    else Empty
  }
}
