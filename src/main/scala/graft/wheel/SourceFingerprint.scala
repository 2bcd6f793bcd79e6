package graft.wheel

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Source-data fingerprint shared by every index-staleness check:
  * sorted `relativePath:length:mtime` of each DATA file under a path,
  * '|'-joined.
  *
  * Tokens carry the path RELATIVE to the fingerprinted root (not just
  * the basename), so two files in different subdirectories of a
  * partitioned layout with equal name/length/mtime never collapse to
  * one token — a collapse would let [[graft.streaming.WheelIngest]]'s
  * restart diff silently drop one of them from both the covered set
  * and the tail. Job-commit markers (any path segment starting with
  * `_` or `.`: `_SUCCESS`, `_temporary/…`, hidden files) are excluded:
  * Spark never reads them as data, the parquet committer rewrites
  * `_SUCCESS` on every append, and any real data change always touches
  * data tokens — so excluding markers makes the fingerprint stable
  * across marker churn without weakening the staleness check.
  *
  * One format, three consumers — in-memory registrations
  * ([[graft.plans.WheelAcceleration]]) compare it wholesale before
  * serving plan-time constants; [[PersistentWheel]] stamps it into the
  * sidecar at save time; [[graft.streaming.WheelIngest]] diffs it
  * token-by-token on restart to aggregate only uncovered tail files.
  * It lives in the wheel package (the base layer) so all three can
  * share it without a dependency cycle. */
object SourceFingerprint {

  /** True when every segment of the relative path names a data
    * file/dir (no `_`/`.` prefix) — the same files Spark's readers
    * consider data. */
  def isDataToken(relPath: String): Boolean =
    relPath.nonEmpty &&
      !relPath.split('/').exists(s => s.startsWith("_") || s.startsWith("."))

  /** The path of `f` relative to the qualified root (basename when `f`
    * IS the root — fingerprinting a single file). */
  def relPath(rootQualified: String, f: org.apache.hadoop.fs.FileStatus): String = {
    val s = f.getPath.toString
    if (s.startsWith(rootQualified + "/")) s.substring(rootQualified.length + 1)
    else f.getPath.getName
  }

  /** The `relativePath:length:mtime` token for a listed file, or None
    * for a commit marker; shared with
    * [[graft.streaming.WheelIngest]]'s own listing so its coverage
    * diff speaks the same dialect. */
  def dataToken(rootQualified: String,
      f: org.apache.hadoop.fs.FileStatus): Option[String] = {
    val rel = relPath(rootQualified, f)
    if (isDataToken(rel)) Some(s"$rel:${f.getLen}:${f.getModificationTime}")
    else None
  }

  /** The (token, full file path) listing behind [[of]] — consumers
    * that DIFF coverage (ingest restarts, persisted tail refresh) need
    * the real path next to each token so uncovered files can be
    * aggregated directly. Empty when the path does not exist. */
  def listTokens(path: String, conf: Configuration): Seq[(String, String)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else {
      val root = fs.makeQualified(p).toString
      val it = fs.listFiles(p, true)
      val parts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) {
        val f = it.next()
        dataToken(root, f).foreach(t => parts += ((t, f.getPath.toString)))
      }
      parts.toSeq
    }
  }

  /** A token's relative-path half (strips the trailing `:len:mtime`). */
  def tokenRel(tok: String): String = {
    val j = tok.lastIndexOf(':')
    val i = if (j < 0) -1 else tok.lastIndexOf(':', j - 1)
    if (i > 0) tok.substring(0, i) else tok
  }

  /** "absent" when the path does not exist — never equal to any real
    * listing, so staleness checks fail closed. */
  def of(path: String, conf: Configuration): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) "absent"
    else listTokens(path, conf).map(_._1).sorted.mkString("|")
  }
}
