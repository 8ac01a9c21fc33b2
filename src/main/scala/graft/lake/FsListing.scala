package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}

import java.nio.file.{FileVisitResult, Files, NoSuchFileException, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes

/** One shared definition of "the data files under a directory" —
  * recursive, `_`/`.`-prefixed entries skipped, sorted. Both the
  * store's commit listing and COPY INTO's source listing use it, so
  * the hidden-file convention can never diverge between them.
  *
  * Local fast path (round-14 optimization): Hadoop's
  * RawLocalFileSystem loads each listed file's PERMISSIONS by
  * fork/exec'ing `ls -ld` when the native library is absent — a
  * recursive `listFiles` costs one process fork PER FILE, and driver
  * stack sampling showed those forks as a visible share of the
  * lifecycle queries' wall time. On a local filesystem the walk runs
  * through java.nio instead (no permission loading, no forks),
  * producing the SAME qualified `file:/...` path strings Hadoop
  * renders, so manifest lines and cache keys are byte-identical
  * across both paths. */
private[lake] object FsListing {

  /** True when `fs` is the local filesystem (possibly checksummed). */
  private[lake] def isLocal(fs: FileSystem): Boolean = fs match {
    case _: LocalFileSystem | _: RawLocalFileSystem => true
    case _ => false
  }

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
    if (isLocal(f)) return localDataFilesWithMeta(dir)
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

  /** The java.nio walk: same recursion (hidden-prefix filter applies
    * to FILE names only, directories always descend — matching
    * `FileSystem.listFiles(recursive = true)`), same output format
    * (`new Path(uri).toString` renders the qualified `file:/...` form
    * Hadoop's listing produced). Files that vanish mid-walk are
    * skipped, mirroring a listing race's best case. */
  private def localDataFilesWithMeta(dir: Path): Seq[(String, Long, Long)] = {
    val root = java.nio.file.Paths.get(dir.toUri.getPath)
    // Hadoop's listFiles(path, recursive) returns the file itself when
    // given a regular file; walkFileTree does the same (visitFile fires
    // on a regular-file start node), so only a missing root short-circuits.
    if (!Files.exists(root)) return Seq.empty
    val buf = Seq.newBuilder[(String, Long, Long)]
    Files.walkFileTree(root, new SimpleFileVisitor[java.nio.file.Path] {
      override def visitFile(file: java.nio.file.Path,
                             attrs: BasicFileAttributes): FileVisitResult = {
        val name = file.getFileName.toString
        if (attrs.isRegularFile && !name.startsWith("_") && !name.startsWith("."))
          buf += ((new Path(file.toUri).toString, attrs.size,
            attrs.lastModifiedTime.toMillis))
        FileVisitResult.CONTINUE
      }
      override def visitFileFailed(file: java.nio.file.Path,
                                   e: java.io.IOException): FileVisitResult =
        e match {
          case _: NoSuchFileException => FileVisitResult.CONTINUE
          case other => throw other
        }
    })
    buf.result().sortBy(_._1)
  }

  /** (length, modification time ms) of one file — the same local
    * fast path as the listing (no Hadoop permission loading), used by
    * the read path to build schema-cache keys for the exact manifest
    * file set without a Spark job. None when the file is missing. */
  private[lake] def fileMeta(p: Path, conf: Configuration): Option[(Long, Long)] = {
    val f = p.getFileSystem(conf)
    if (isLocal(f)) {
      try {
        val attrs = Files.readAttributes(
          java.nio.file.Paths.get(p.toUri.getPath),
          classOf[BasicFileAttributes])
        Some((attrs.size, attrs.lastModifiedTime.toMillis))
      } catch { case _: Exception => None }
    } else {
      try { val st = f.getFileStatus(p); Some((st.getLen, st.getModificationTime)) }
      catch { case _: Exception => None }
    }
  }

  /** Driver-side small-file output stream with the same local fast
    * path: Hadoop's local `create` mkdirs + chmods via shell forks;
    * java.nio does neither. Used by the commit protocol's sidecar /
    * hint / manifest writes — content lands identically either way. */
  private[lake] def createOverwrite(p: Path, conf: Configuration): java.io.OutputStream = {
    val f = p.getFileSystem(conf)
    if (isLocal(f)) {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      val parent = nio.getParent
      if (parent != null) Files.createDirectories(parent)
      Files.newOutputStream(nio)
    } else f.create(p, true)
  }
}
