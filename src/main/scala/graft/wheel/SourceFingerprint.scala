package graft.wheel

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Source-data fingerprint shared by every index-staleness check:
  * sorted `name:length:mtime` of each file under a path, '|'-joined.
  *
  * One format, three consumers — in-memory registrations
  * ([[graft.plans.WheelAcceleration]]) compare it wholesale before
  * serving plan-time constants; [[PersistentWheel]] stamps it into the
  * sidecar at save time; [[graft.streaming.WheelIngest]] diffs it
  * token-by-token on restart to aggregate only uncovered tail files.
  * It lives in the wheel package (the base layer) so all three can
  * share it without a dependency cycle. */
object SourceFingerprint {

  /** "absent" when the path does not exist — never equal to any real
    * listing, so staleness checks fail closed. */
  def of(path: String, conf: Configuration): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) "absent"
    else {
      val it = fs.listFiles(p, true)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        parts += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
      }
      parts.sorted.mkString("|")
    }
  }
}
