package graft.queries

/** Shared DuckDB oracle SQL fragments. Exactly ONE definition of
  * anything the Spark side also defines once (Sketches.hash48 /
  * Dedup.shingleHash) — a decode tweak must not be hand-replicated
  * across oracles. */
object OracleSql {

  /** Decode the first 12 hex chars of `hex` (a column or expression
    * yielding an md5 string) to a BIGINT — the oracle twin of the
    * engine's 48-bit md5-derived hash. 12 digits keep the digit sum
    * double-exact (< 2^53) even if the engine sums the comprehension
    * in floating point. */
  def hex12ToBigint(hex: String): String =
    s"""CAST(list_sum(
       |    [(strpos('0123456789abcdef', $hex[d:d]) - 1)
       |       * ([17592186044416,1099511627776,68719476736,4294967296,
       |           268435456,16777216,1048576,65536,4096,256,16,1])[d]
       |     FOR d IN range(1, 13)]) AS BIGINT)""".stripMargin
}
