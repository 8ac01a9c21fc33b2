package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, FileSystem, Options, Path}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, FileAlreadyExistsException => NioExistsException}
import java.util.UUID

/** The two storage operations the optimistic-concurrency commit
  * protocol needs, isolated so the store can run on any backend that
  * offers SOME atomic create-if-absent:
  *
  *   - file:// / HDFS — O_EXCL file create + atomic rename
  *     ([[HadoopCommitPrimitive]], the default);
  *   - S3-class object stores — conditional PUT (`If-None-Match: *`)
  *     for the claim and a plain atomic PUT for the manifest (no
  *     rename exists there; see FakeS3Primitive in
  *     CommitPrimitiveSpec proving the swap-in point).
  *
  * Protocol contract (TableStore.commit): `tryClaim(v)` must succeed
  * for EXACTLY ONE writer per (table, v) — the loser re-reads the
  * current version and retries; the winner then calls `publish`,
  * which must be all-or-nothing (readers never see a torn manifest).
  * `listClaims`/`deleteClaim` support TTL takeover of claims whose
  * writer crashed before publishing (recoverStaleClaims).
  */
trait CommitPrimitive {

  /** Atomically claim exclusive right to publish version `v` of the
    * table at `tableDir`. True iff this caller won. */
  def tryClaim(tableDir: Path, v: Long): Boolean

  /** All-or-nothing publish of the manifest at `manifest`. */
  def publish(manifest: Path, content: String): Unit

  /** Outstanding claims under `tableDir` as (version, claimedAtMs). */
  def listClaims(tableDir: Path): Seq[(Long, Long)]

  /** Remove the claim marker for version `v` (TTL takeover / vacuum
    * of dropped versions). */
  def deleteClaim(tableDir: Path, v: Long): Unit

  /** Move a STAGED manifest to its final path, making the final path
    * visible all-or-nothing — the transaction commit's per-table
    * pointer swing. Default: read the staged content via the CALLER'S
    * Hadoop conf (a bare `new Configuration()` would drop the store's
    * filesystem settings/credentials), `publish` it at the final path
    * (the backend's own atomic publication), then discard the staged
    * copy — correct on any backend, including S3-class stores where
    * no rename exists. Backends with a native atomic rename override
    * it with one. */
  def promote(staged: Path, dst: Path, conf: Configuration): Unit = {
    val f = staged.getFileSystem(conf)
    val in = f.open(staged)
    val content =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    publish(dst, content)
    discard(staged, conf)
  }

  /** Delete a staged manifest that will never be promoted (rollback /
    * stale-transaction recovery). */
  def discard(staged: Path, conf: Configuration): Unit =
    staged.getFileSystem(conf).delete(staged, false)
}

object CommitPrimitive {
  private[lake] val ClaimPrefix = ".claim-"

  private[lake] def claimPath(tableDir: Path, v: Long): Path =
    new Path(tableDir, s"$ClaimPrefix$v")
}

/** Default primitive: O_EXCL create for the claim (java.nio on local
  * file://, where Hadoop's no-overwrite create is check-then-act;
  * HDFS-atomic `create(overwrite=false)` elsewhere) and temp-file +
  * atomic rename-overwrite for the publish. */
final class HadoopCommitPrimitive(hadoopConf: Configuration) extends CommitPrimitive {
  import CommitPrimitive._

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  override def tryClaim(tableDir: Path, v: Long): Boolean = {
    val claim = claimPath(tableDir, v)
    if ("file" == claim.toUri.getScheme) {
      try { Files.createFile(Paths.get(claim.toUri)); true }
      catch { case _: NioExistsException => false }
    } else {
      try { fs(claim).create(claim, false).close(); true }
      catch {
        case _: FileAlreadyExistsException |
             _: org.apache.hadoop.fs.PathExistsException => false
      }
    }
  }

  override def publish(manifest: Path, content: String): Unit = {
    if (FsListing.isLocal(fs(manifest))) {
      // same temp + atomic-rename protocol through java.nio: Hadoop's
      // local create/rename shell out for chmod (one fork per publish
      // without the native library); ATOMIC_MOVE on a POSIX fs is the
      // same rename(2) FileContext issues (round-14)
      val target = Paths.get(manifest.toUri.getPath)
      val parent = target.getParent
      if (parent != null) Files.createDirectories(parent)
      val tmp = target.resolveSibling(s".manifest.${UUID.randomUUID()}.tmp")
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new Path(manifest.getParent, s".manifest.${UUID.randomUUID()}.tmp")
      val out = fs(tmp).create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      FileContext.getFileContext(manifest.toUri, hadoopConf)
        .rename(tmp, manifest, Options.Rename.OVERWRITE)
    }
  }

  override def listClaims(tableDir: Path): Seq[(Long, Long)] = {
    val f = fs(tableDir)
    if (!f.exists(tableDir)) Seq.empty
    else f.listStatus(tableDir).toSeq
      .filter(_.getPath.getName.startsWith(ClaimPrefix))
      .map(st => (st.getPath.getName.stripPrefix(ClaimPrefix).toLong,
        st.getModificationTime))
  }

  override def deleteClaim(tableDir: Path, v: Long): Unit = {
    val claim = claimPath(tableDir, v)
    fs(claim).delete(claim, false)
  }

  /** Native atomic rename-overwrite — one metadata operation instead
    * of the generic read+publish+discard. */
  override def promote(staged: Path, dst: Path, conf: Configuration): Unit =
    FileContext.getFileContext(dst.toUri, hadoopConf)
      .rename(staged, dst, Options.Rename.OVERWRITE)

  override def discard(staged: Path, conf: Configuration): Unit =
    fs(staged).delete(staged, false)
}
