package graft.lake

import org.apache.spark.sql.types.StructType

/** Process-wide cache of merge-inferred parquet schemas, keyed on the
  * exact (immutable) file set.
  *
  * Why: `mergeSchema` inference (`ParquetFileFormat.inferSchema` /
  * `spark.read.option("mergeSchema", ...)`) launches a DISTRIBUTED
  * footer-merge job every call — ~20–50 ms of job latency on top of
  * the footer reads, regardless of file count. The engine's read path
  * builds one scan per commit group ([[TableStore]] `statsScan`) and a
  * lifecycle query re-reads its tables several times, so a single
  * bench query was paying 10–20 schema-inference jobs for file sets
  * that are IMMUTABLE (commit dirs are written once and never
  * modified; vacuum removes whole groups — their keys simply age out).
  * The fixture loads (`Tables.load`) repeat the same inference per
  * query per rep over a read-only file.
  *
  * Caching the resulting StructType is safe because the key derives
  * from the full sorted path list plus each file's (length, mtime)
  * when the caller supplies them: same files ⇒ same footers ⇒ same
  * merged schema. This caches SCHEMA METADATA only — never rows; every
  * action still reads the parquet data from disk.
  *
  * Bounded: entries are (digest → schema); a full bench run creates a
  * few thousand. Cleared wholesale past a generous cap. */
object SchemaCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Digest of an immutable file identity list. A zero byte separates
    * parts so distinct lists can never collide by concatenation
    * (["a","bc"] vs ["ab","c"]); part strings are paths/identities and
    * never contain NUL. */
  def keyOf(parts: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.sorted.foreach { p =>
      md.update(p.getBytes("UTF-8"))
      md.update(0: Byte)
    }
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  /** Peek without inferring — lets the read path decide whether a
    * group's schema is already known (commit-seeded or from a prior
    * read) at zero job cost. */
  def get(key: String): Option[StructType] = Option(cache.get(key))

  def getOrInfer(key: String)(infer: => StructType): StructType = {
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val s = infer
      if (cache.size > 8192) cache.clear()
      cache.put(key, s)
      s
    }
  }

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}
