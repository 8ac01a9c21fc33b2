package graft.lake

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets
import java.util.UUID

/** Versioned-directory Parquet table store: ACID-ish table semantics
  * (create / append / overwrite / exists / read / time travel / vacuum)
  * over plain Parquet, replacing the reference's Iceberg v2 / Delta
  * destinations (icberg/iceberg_tables.py:112 `.writeTo(...).create()`,
  * delta/delta_tables.py:131,:166) — no connector jars are available.
  *
  * Protocol (Delta paper, VLDB 2020, simplified to a single pointer +
  * per-version manifests):
  *
  * {{{
  *   <root>/<table>/v=<n>/part-*.parquet   data files written by commit n
  *   <root>/<table>/manifest-<n>           file list composing version n
  *   <root>/<table>/_VERSION               current version pointer
  *   <root>/<table>/_PARTITIONING          optional partition columns
  * }}}
  *
  * A commit writes its data files fully, writes `manifest-<n>`, then
  * swings `_VERSION` via temp-file + atomic rename
  * (`FileContext.rename(OVERWRITE)` — atomic on HDFS and local FS).
  * Readers resolve the pointer once, then only ever see a
  * fully-written, immutable file set. Unlike the reference's
  * delete-commit-then-append-commit sequence (SURVEY §3.2), a merge
  * here is ONE pointer swing.
  *
  * Scale design: `append` is O(batch), not O(table) — it writes only
  * the new files and its manifest carries the previous version's files
  * forward by reference (this is what makes 100 TB tables appendable).
  * `overwrite` (and therefore CDC merge) rewrites by nature.
  * On S3 (no atomic rename) the pointer swing should go through a
  * conditional PUT / DynamoDB-style lock, as Delta's LogStore does.
  */
final class TableStore(spark: SparkSession, root: String) {

  private val hadoopConf = spark.sessionState.newHadoopConf()
  private def tablePath(table: String): Path = new Path(root, table)
  private def versionPtr(table: String): Path = new Path(tablePath(table), "_VERSION")
  private def versionDir(table: String, v: Long): Path = new Path(tablePath(table), s"v=$v")
  private def manifestPath(table: String, v: Long): Path =
    new Path(tablePath(table), s"manifest-$v")
  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)
  private def fc(p: Path): FileContext = FileContext.getFileContext(p.toUri, hadoopConf)

  /** S5: table-exists probe (icberg/iceberg_tables.py:73-78). */
  def exists(table: String): Boolean = currentVersion(table).isDefined

  def currentVersion(table: String): Option[Long] = {
    val ptr = versionPtr(table)
    val f = fs(ptr)
    if (!f.exists(ptr)) None
    else Some(readSmallFile(ptr).trim.toLong)
  }

  /** S3/S4: destination table scan of the current committed version —
    * the manifest's file list, grouped by writing version so hive
    * partition columns resolve against the right base path. */
  def read(table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalStateException(s"table $table does not exist"))
    readVersion(table, v)
  }

  /** Time-travel read of a specific committed version. */
  def readVersion(table: String, v: Long): DataFrame = {
    val files = manifest(table, v)
    val prefix = tablePath(table).toString
    val byBase = files.groupBy { f =>
      // base = .../<table>/v=<k>
      val rel = f.stripPrefix(prefix).stripPrefix("/")
      s"$prefix/${rel.takeWhile(_ != '/')}"
    }
    byBase.toSeq.sortBy(_._1).map { case (base, fsList) =>
      spark.read.option("mergeSchema", "true").option("basePath", base)
        .parquet(fsList: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** S6: CTAS — fails if the table already exists. `partitionBy`
    * selects a hive-style directory layout; subsequent reads get
    * partition pruning (and Catalyst dynamic partition pruning) on
    * those columns — the scan-avoidance lever at 100 TB. */
  def create(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    require(!exists(table), s"table $table already exists")
    if (partitionBy.nonEmpty)
      writeSmallFile(new Path(tablePath(table), "_PARTITIONING"),
        partitionBy.mkString(","))
    commit(table, 0L, df, carryFrom = None)
  }

  /** S7: atomic overwrite (vs. non-atomic raw `mode("overwrite")`). */
  def overwrite(table: String, df: DataFrame): Unit = {
    val next = currentVersion(table).map(_ + 1).getOrElse(0L)
    commit(table, next, df, carryFrom = None)
  }

  /** S8: append — O(batch): writes only the new files; the manifest
    * carries the previous version's files forward by reference.
    * Schema evolution is union-by-name at read time (mergeSchema). */
  def append(table: String, df: DataFrame): Unit =
    currentVersion(table) match {
      case None    => create(table, df)
      case Some(v) => commit(table, v + 1, df, carryFrom = Some(v))
    }

  /** Partition columns recorded at create time (empty = unpartitioned). */
  def partitioning(table: String): Seq[String] = {
    val meta = new Path(tablePath(table), "_PARTITIONING")
    if (!fs(meta).exists(meta)) Seq.empty
    else readSmallFile(meta).trim.split(",").toSeq.filter(_.nonEmpty)
  }

  /** File list composing version v. */
  def manifest(table: String, v: Long): Seq[String] = {
    val m = manifestPath(table, v)
    if (fs(m).exists(m))
      readSmallFile(m).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    else // pre-manifest layout fallback: the version dir's own files
      listDataFiles(versionDir(table, v))
  }

  /** Write data files + manifest fully, then atomically swing the
    * pointer. `carryFrom` = previous version whose files the new
    * manifest inherits (append path). */
  private def commit(table: String, v: Long, df: DataFrame,
                     carryFrom: Option[Long]): Unit = {
    val dir = versionDir(table, v)
    val parts = partitioning(table)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .parquet(dir.toString)
    val newFiles = listDataFiles(dir)
    val carried = carryFrom.map(manifest(table, _)).getOrElse(Seq.empty)
    writeSmallFile(manifestPath(table, v), (carried ++ newFiles).mkString("\n"))
    val ptr = versionPtr(table)
    val tmp = new Path(tablePath(table), s"._VERSION.${UUID.randomUUID()}.tmp")
    writeSmallFile(tmp, v.toString)
    fc(ptr).rename(tmp, ptr, Options.Rename.OVERWRITE)
  }

  /** Version history (for time-travel reads / vacuum). */
  def versions(table: String): Seq[Long] = {
    val dir = tablePath(table)
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong).sorted
  }

  /** Drop data files not referenced by any of the `keep` most recent
    * versions (never the current one). Manifest-aware: an old v=K dir
    * may still hold files referenced by newer manifests — only
    * unreferenced files are deleted. Safe order: the pointer never
    * references deleted files. */
  def vacuum(table: String, keep: Int = 1): Unit = {
    val cur = currentVersion(table).getOrElse(return)
    val all = versions(table)
    val keptVersions = (all.filter(_ < cur).takeRight(math.max(keep - 1, 0)) :+ cur)
    val referenced = keptVersions.flatMap(manifest(table, _)).toSet
    val f = fs(tablePath(table))
    all.filterNot(keptVersions.contains).foreach { v =>
      listDataFiles(versionDir(table, v))
        .filterNot(referenced.contains)
        .foreach(p => f.delete(new Path(p), false))
      // remove the dir if nothing referenced survives inside it
      if (listDataFiles(versionDir(table, v)).isEmpty)
        f.delete(versionDir(table, v), true)
      f.delete(manifestPath(table, v), false)
    }
  }

  private def listDataFiles(dir: Path): Seq[String] = {
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty
    else {
      val it = f.listFiles(dir, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
          buf += st.getPath.toUri.getPath
      }
      buf.result().sorted
    }
  }

  private def readSmallFile(p: Path): String = {
    val in = fs(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeSmallFile(p: Path, content: String): Unit = {
    val out = fs(p).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
