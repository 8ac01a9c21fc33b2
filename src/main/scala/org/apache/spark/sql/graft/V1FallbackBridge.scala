package org.apache.spark.sql.graft

/** Re-export of the `private[sql]` streaming-fallback hook — the
  * analyzer resolves `spark.readStream.table("cat.t")` for a DSv2
  * table WITHOUT native streaming capabilities through
  * `V2TableWithV1Fallback.v1Table` (a CatalogTable whose provider
  * routes back to a V1 `StreamSourceProvider`). Delta takes exactly
  * this route; like [[ColumnBridge]], this one-trait shim is compiled
  * into the `org.apache.spark.sql` namespace purely for access — no
  * Spark internals are modified. */
trait V1FallbackBridge
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
