package graft.lake

import java.util.concurrent.atomic.AtomicLong

/** Driver-side metadata-operation counters, for specs that pin the
  * SHAPE of the metadata path rather than its result — e.g. "a table
  * read performs zero full manifest-directory listings once the
  * `_LATEST` checkpoint hint exists, no matter how many commits the
  * table has accrued" (the O(1)-metadata-read contract of
  * [[TableStore.currentVersion]]). Test-observability only: never
  * read by production logic. */
private[graft] object MetaMetrics {
  /** Full `manifest-<n>` directory listings (the O(#commits) path). */
  val manifestListings = new AtomicLong()

  def reset(): Unit = manifestListings.set(0)
}
