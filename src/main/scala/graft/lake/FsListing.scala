package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** One shared definition of "the data files under a directory" —
  * recursive, `_`/`.`-prefixed entries skipped, sorted. Both the
  * store's commit listing and COPY INTO's source listing use it, so
  * the hidden-file convention can never diverge between them. */
private[lake] object FsListing {
  def dataFiles(dir: Path, conf: Configuration): Seq[String] =
    dataFilesWithTimes(dir, conf).map(_._1)

  /** (path, modification time ms) — the mtimes drive COPY INTO's
    * listing watermark. */
  def dataFilesWithTimes(dir: Path, conf: Configuration): Seq[(String, Long)] =
    dataFilesWithMeta(dir, conf).map(t => (t._1, t._3))

  /** (path, length, modification time ms) — the identity triple the
    * schema cache keys on. */
  def dataFilesWithMeta(dir: Path, conf: Configuration): Seq[(String, Long, Long)] = {
    val f = dir.getFileSystem(conf)
    if (!f.exists(dir)) Seq.empty
    else {
      val it = f.listFiles(dir, true)
      val buf = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
          buf += ((st.getPath.toString, st.getLen, st.getModificationTime))
      }
      buf.result().sortBy(_._1)
    }
  }
}
