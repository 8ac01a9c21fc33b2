package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** A [[PartitioningAwareFileIndex]] fed from an EXTERNALLY KNOWN file
  * list instead of a filesystem listing — the hive-partitioned
  * counterpart of graft's flat manifest index.
  *
  * Why: `InMemoryFileIndex` re-lists its roots through the Hadoop
  * FileSystem and wraps every file in a `LocatedFileStatus`, which
  * materializes PERMISSIONS — one `ls -ld` fork per file on a local
  * filesystem without the native Hadoop library (~3–4 ms each,
  * measured); against an object store it is one LIST round-trip per
  * root. The table store's manifest already names the exact live
  * files with their sizes and mtimes, so the listing is pure waste.
  *
  * Everything else — hive partition-value INFERENCE (types, escaping,
  * null partitions, basePath anchoring), partition PRUNING in
  * `listFiles`, `allFiles`, `sizeInBytes` — is inherited verbatim
  * from [[PartitioningAwareFileIndex]], i.e. byte-identical behavior
  * to `InMemoryFileIndex` minus the listing. Lives in this package
  * because the base class and its collaborators are
  * package-restricted.
  */
final class GraftManifestIndex(
    spark: SparkSession,
    parameters: Map[String, String],
    statuses: Seq[FileStatus])
  extends PartitioningAwareFileIndex(spark, parameters, None, NoopCache) {

  private val leaves = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }

  private val byDir: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent)
      .map { case (d, fs) => d -> fs.toArray }

  @volatile private var cachedSpec: PartitionSpec = _

  override def partitionSpec(): PartitionSpec = {
    if (cachedSpec == null) cachedSpec = inferPartitioning()
    cachedSpec
  }

  override def leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] =
    leaves

  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] = byDir

  override def rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def refresh(): Unit = ()
}
