package graft.lake

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets
import java.util.UUID

/** Versioned-directory Parquet table store: ACID-ish table semantics
  * (create / append / overwrite / exists / read) over plain Parquet,
  * replacing the reference's Iceberg v2 / Delta destinations
  * (icberg/iceberg_tables.py:112 `.writeTo(...).create()`,
  * delta/delta_tables.py:131,:166) — no connector jars are available.
  *
  * Protocol (Delta paper, VLDB 2020, simplified to a single pointer):
  *
  * {{{
  *   <root>/<table>/v=<n>/part-*.parquet     immutable version snapshots
  *   <root>/<table>/_VERSION                 current version pointer
  * }}}
  *
  * Commits write the new snapshot directory fully, then swing `_VERSION`
  * via temp-file + atomic rename (`FileContext.rename(OVERWRITE)` —
  * atomic on HDFS and local FS). Readers resolve the pointer once, then
  * only ever see a fully-written snapshot. Unlike the reference's
  * delete-commit-then-append-commit sequence (SURVEY §3.2), a merge here
  * is ONE pointer swing.
  *
  * 100 TB scale note: `append` rewrites the full snapshot, which is
  * correct but O(table). The scale path — kept to the same interface —
  * is manifest-based appends: write only the new files under
  * `v=<n+1>/` and record carried-over files from `v=<n>` in a manifest;
  * `read` unions the manifest's file list. Pointer protocol unchanged.
  * On S3 (no atomic rename) the pointer swing should go through a
  * conditional PUT / DynamoDB-style lock, as Delta's LogStore does.
  */
final class TableStore(spark: SparkSession, root: String) {

  private val hadoopConf = spark.sessionState.newHadoopConf()
  private def tablePath(table: String): Path = new Path(root, table)
  private def versionPtr(table: String): Path = new Path(tablePath(table), "_VERSION")
  private def versionDir(table: String, v: Long): Path = new Path(tablePath(table), s"v=$v")
  private def fc(p: Path): FileContext = FileContext.getFileContext(p.toUri, hadoopConf)

  /** S5: table-exists probe (icberg/iceberg_tables.py:73-78). */
  def exists(table: String): Boolean = currentVersion(table).isDefined

  def currentVersion(table: String): Option[Long] = {
    val ptr = versionPtr(table)
    val fs = ptr.getFileSystem(hadoopConf)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val bytes = new Array[Byte](32)
        val n = in.read(bytes)
        Some(new String(bytes, 0, n, StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** S3/S4: destination table scan of the current committed snapshot. */
  def read(table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalStateException(s"table $table does not exist"))
    spark.read.parquet(versionDir(table, v).toString)
  }

  /** S6: CTAS — fails if the table already exists. `partitionBy`
    * selects a hive-style directory layout; subsequent reads get
    * partition pruning (and Catalyst dynamic partition pruning) on
    * those columns — the scan-avoidance lever at 100 TB. */
  def create(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    require(!exists(table), s"table $table already exists")
    if (partitionBy.nonEmpty) writeMeta(table, partitionBy)
    commit(table, 0L, df)
  }

  /** S7: atomic overwrite (vs. non-atomic raw `mode("overwrite")`). */
  def overwrite(table: String, df: DataFrame): Unit = {
    val next = currentVersion(table).map(_ + 1).getOrElse(0L)
    commit(table, next, df)
  }

  /** S8: append with union-by-name schema evolution (mergeSchema
    * semantics: missing columns null-filled on either side). Snapshot
    * rewrite — see the manifest-append scale note above. */
  def append(table: String, df: DataFrame): Unit =
    currentVersion(table) match {
      case None    => create(table, df)
      case Some(v) =>
        val current = spark.read.parquet(versionDir(table, v).toString)
        commit(table, v + 1, current.unionByName(df, allowMissingColumns = true))
    }

  /** Partition columns recorded at create time (empty = unpartitioned). */
  def partitioning(table: String): Seq[String] = {
    val meta = new Path(tablePath(table), "_PARTITIONING")
    val fs = meta.getFileSystem(hadoopConf)
    if (!fs.exists(meta)) Seq.empty
    else {
      val in = fs.open(meta)
      try {
        val bytes = new Array[Byte](4096)
        val n = in.read(bytes)
        if (n <= 0) Seq.empty
        else new String(bytes, 0, n, StandardCharsets.UTF_8).trim
          .split(",").toSeq.filter(_.nonEmpty)
      } finally in.close()
    }
  }

  private def writeMeta(table: String, partitionBy: Seq[String]): Unit = {
    val meta = new Path(tablePath(table), "_PARTITIONING")
    val fs = meta.getFileSystem(hadoopConf)
    val out = fs.create(meta, true)
    try out.write(partitionBy.mkString(",").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write snapshot dir fully, then atomically swing the pointer. */
  private def commit(table: String, v: Long, df: DataFrame): Unit = {
    val dir = versionDir(table, v)
    val parts = partitioning(table)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .parquet(dir.toString)
    val ptr = versionPtr(table)
    val tmp = new Path(tablePath(table), s"._VERSION.${UUID.randomUUID()}.tmp")
    val fs = ptr.getFileSystem(hadoopConf)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fc(ptr).rename(tmp, ptr, Options.Rename.OVERWRITE)
  }

  /** Version history (for time-travel reads / vacuum). */
  def versions(table: String): Seq[Long] = {
    val dir = tablePath(table)
    val fs = dir.getFileSystem(hadoopConf)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong).sorted
  }

  /** Time-travel read of a specific committed version. */
  def readVersion(table: String, v: Long): DataFrame =
    spark.read.parquet(versionDir(table, v).toString)

  /** Drop all snapshots older than the `keep` most recent (never the
    * current one). Safe order: the pointer never references a dropped
    * version, so readers racing a vacuum still resolve. */
  def vacuum(table: String, keep: Int = 1): Unit = {
    val cur = currentVersion(table).getOrElse(return)
    val drop = versions(table).filter(_ < cur).dropRight(math.max(keep - 1, 0))
    val fs = tablePath(table).getFileSystem(hadoopConf)
    drop.foreach(v => fs.delete(versionDir(table, v), true))
  }
}
