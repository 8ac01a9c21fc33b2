package graft.lake

import org.apache.spark.sql.DataFrame

/** Delta-style column mapping (name-mapping mode, simplified):
  * logical (user-visible) names resolve onto the PHYSICAL names
  * written in parquet files, so RENAME COLUMN and DROP COLUMN are
  * pure metadata commits — never a 100 TB rewrite. The mapping
  * records only exceptions: `renames` maps logical → physical for
  * renamed columns; `dropped` lists physical names hidden from
  * reads. Data files never change — readers rename physical→logical
  * and hide dropped columns, writers rename logical→physical so new
  * files agree with old ones byte-for-byte on column names.
  *
  * Serialized into the manifest HEADER (`#colmap=`), so the mapping
  * versions with the manifest itself: a time-travel read sees its own
  * version's names, RESTORE rolls the schema back with the data, and
  * shallow clones inherit the source's mapping — no second metadata
  * file to keep transactional with the manifest.
  *
  * Wire format: comma-separated entries; `logical:physical` for a
  * rename, `-physical` for a drop. Names containing the delimiters
  * (or leading '-') are rejected at mutation time, never mangled.
  */
final case class ColumnMapping(renames: Map[String, String],
                               dropped: Set[String]) {

  def isEmpty: Boolean = renames.isEmpty && dropped.isEmpty

  /** Storage name for a logical column (identity when unrenamed). */
  def physicalOf(logical: String): String = renames.collectFirst {
    case (l, p) if l.equalsIgnoreCase(logical) => p
  }.getOrElse(logical)

  /** User-visible name for a storage column (identity when
    * unrenamed) — the inverse of [[physicalOf]]. */
  def logicalOf(physical: String): String = renames.collectFirst {
    case (l, p) if p.equalsIgnoreCase(physical) => l
  }.getOrElse(physical)

  def isDropped(physical: String): Boolean =
    dropped.exists(_.equalsIgnoreCase(physical))

  /** Physical names currently claimed by renamed logicals. */
  def physicalNames: Set[String] = renames.values.toSet

  /** Physical frame (as files store it) → logical frame (as the user
    * sees it): hide dropped columns, rename physical→logical. */
  def applyRead(df: DataFrame): DataFrame =
    if (isEmpty) df
    else {
      val hidden = df.columns.filter(isDropped)
      val kept = if (hidden.isEmpty) df else df.drop(hidden.toIndexedSeq: _*)
      renames.foldLeft(kept) { case (acc, (log, phys)) =>
        if (acc.columns.exists(_.equalsIgnoreCase(phys)))
          acc.withColumnRenamed(phys, log)
        else acc
      }
    }

  /** Logical frame → physical frame for a write. Loud on frames that
    * use a storage name directly: a column literally named like some
    * other column's physical name would silently merge with THAT
    * column's data in old files, and a dropped name would resurrect
    * hidden bytes. */
  def applyWrite(df: DataFrame, table: String): DataFrame =
    if (isEmpty) df
    else {
      df.columns.foreach { c =>
        renames.find(_._2.equalsIgnoreCase(c)).foreach { case (log, phys) =>
          throw new IllegalArgumentException(
            s"column $c of the incoming batch is the physical storage " +
              s"name of $table's column $log — write it as $log")
        }
        require(!isDropped(c),
          s"column $c was dropped from $table; re-adding it would " +
            "resurrect old files' hidden data — use a new name")
      }
      renames.foldLeft(df) { case (acc, (log, phys)) =>
        if (acc.columns.exists(_.equalsIgnoreCase(log)))
          acc.withColumnRenamed(log, phys)
        else acc
      }
    }

  /** Header value, or None when the mapping carries no information
    * (identity entries are elided on construction by [[TableStore]]). */
  def serialize: Option[String] =
    if (isEmpty) None
    else Some((renames.toSeq.sortBy(_._1).map { case (l, p) => s"$l:$p" } ++
      dropped.toSeq.sorted.map("-" + _)).mkString(","))
}

object ColumnMapping {
  val empty: ColumnMapping = ColumnMapping(Map.empty, Set.empty)

  def parse(s: String): ColumnMapping = {
    val entries = s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val (drops, rens) = entries.partition(_.startsWith("-"))
    ColumnMapping(
      rens.map { e =>
        e.split(":", 2) match {
          case Array(l, p) if l.nonEmpty && p.nonEmpty => l -> p
          case _ => throw new IllegalArgumentException(s"bad colmap entry $e")
        }
      }.toMap,
      drops.map(_.stripPrefix("-")).toSet)
  }

  /** Names must round-trip the wire format and the parquet writer. */
  def requireMappable(name: String): Unit =
    require(name.nonEmpty && !name.startsWith("-") &&
      !name.exists(c => c == ':' || c == ',' || c == '\n' || c == '\t'),
      s"column name '$name' cannot participate in column mapping")
}
