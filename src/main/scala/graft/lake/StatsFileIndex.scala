package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] that makes the store's manifest-level data
  * skipping AUTOMATIC on the default read path. It wraps the plain
  * [[InMemoryFileIndex]] a `spark.read.parquet` would have built
  * (same listing, same hive-partition inference and pruning) and
  * additionally drops files whose stats-sidecar entries PROVE the
  * pushed-down data filters can't match — so
  * `store.read(t).where(pred)` and every SQL SELECT through the
  * front door skip non-intersecting files the moment Catalyst pushes
  * the predicate to the scan, without the caller opting in via
  * `readPruned`/`readPointLookup`.
  *
  * At 100 TB this is the difference between the engine's own skipping
  * working everywhere and working only in the three queries that call
  * the opt-in API: pruning happens driver-side from KB-sized sidecar
  * metadata, before any footer is opened, and shows up directly in the
  * scan's `numFiles` metric. Pruning is conservative by construction
  * (unknown columns/types/expressions keep the file; equality deletes
  * ride separate manifest lines and are untouched), so the result
  * always equals the unpruned scan filtered — the 172-query oracle
  * surface re-proves that equivalence on every run.
  *
  * Reference behavior context: the reference's engines (Delta/Iceberg,
  * e.g. icberg/iceberg_tables.py:34-51 reads) get this from their
  * table formats' stats; this is the from-scratch analog over the
  * store's own `stats-<v>` sidecar.
  */
final class StatsFileIndex(
    inner: InMemoryFileIndex,
    stats: Map[(String, String), FileStats.Stat]) extends FileIndex {

  override def rootPaths: Seq[Path] = inner.rootPaths
  override def partitionSchema: StructType = inner.partitionSchema
  override def inputFiles: Array[String] = inner.inputFiles
  override def refresh(): Unit = inner.refresh()
  override def sizeInBytes: Long = inner.sizeInBytes
  override def metadataOpsTimeNs: Option[Long] = inner.metadataOpsTimeNs

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = inner.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty || stats.isEmpty) dirs
    else dirs.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        val key = FileStats.fileKey(f.getPath.toString)
        dataFilters.forall(e =>
          FileStats.exprMayMatch(e, c => stats.get((key, c))))
      })
    }
  }
}
