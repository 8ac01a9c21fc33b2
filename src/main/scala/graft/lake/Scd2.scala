package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Cdc

/** Incremental maintenance of a stored SCD Type-2 dimension — the
  * lakehouse half of [[graft.ops.Cdc.scd2Build]]: apply a batch of
  * changes in ONE atomic commit, closing the open version of every
  * changed key and appending the batch's own (chained) versions.
  *
  * The trick that keeps the semantics exactly equal to a single-shot
  * rebuild: each touched key's OPEN row re-enters the build as a
  * pseudo-change at its own `valid_from`, unioned with the batch —
  * `scd2Build`'s lag-drop then handles no-op re-emits against the
  * stored current version, and its lead-close stamps the open row's
  * `valid_to` from the first real change, all in the one window pass.
  * Closed history and untouched keys' open rows carry through
  * verbatim. `scd2_incremental_apply` pins build(all) ==
  * apply(build(first half), second half) against the single-shot
  * oracle.
  *
  * Precondition (the standard SCD2 contract): a batch's changes for a
  * key arrive at or after that key's open `valid_from` — late data
  * older than the open version would need history splicing, which is
  * a restatement (rebuild), not an increment.
  *
  * Cost: one left-semi + one left-anti on the key (broadcast when the
  * batch's touched-key set is small), one window pass over
  * |touched opens| + |batch| rows, one commit. The rewrite is
  * copy-on-write over the dimension — dimensions are the small side
  * of a warehouse by construction; a 100 TB FACT table never goes
  * through this path. */
object Scd2 {

  def apply(store: TableStore, table: String, changes: DataFrame,
            keyCols: Seq[String], tsCol: String,
            attrCols: Seq[String]): Unit = {
    val outCols = (keyCols ++ attrCols ++
      Seq("valid_from", "valid_to", "is_current")).map(col)
    val rebuiltAll = Cdc.scd2Build(changes, keyCols, tsCol, attrCols)
      .select(outCols: _*)
    if (!store.exists(table)) { store.create(table, rebuiltAll); return }
    // pin the snapshot the rewrite is computed from: a concurrent
    // commit to the dimension aborts this apply (SnapshotConflict)
    // instead of being silently overwritten
    val rs = store.currentVersion(table).get
    val dim = store.readVersion(table, rs)
    val touched = changes.select(keyCols.map(c => col(c)): _*).distinct()
    val open = dim.where(col("is_current"))
    // the open version re-enters as a pseudo-change at its valid_from
    val openTouched = open.join(touched, keyCols, "left_semi")
      .select((keyCols ++ attrCols).map(col) :+
        col("valid_from").as(tsCol): _*)
    val rebuilt = Cdc.scd2Build(
        openTouched.unionByName(
          changes.select((keyCols ++ attrCols :+ tsCol).map(col): _*)),
        keyCols, tsCol, attrCols)
      .select(outCols: _*)
    val carried = dim.where(!col("is_current"))
      .unionByName(open.join(touched, keyCols, "left_anti"))
      .select(outCols: _*)
    store.overwrite(table, carried.unionByName(rebuilt),
      readSnapshot = Some(rs), op = "SCD2 APPLY")
  }
}
