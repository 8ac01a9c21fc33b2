package graft

/** Pins the driver contract on SparkEntry: the flagship `entry` query
  * returns rows on the smoke-check fixture, every registered query has
  * a unique name, and every oracle key references a registered query —
  * the three invariants the external harness assumes without checking. */
class EntryContractSpec extends SparkSpec {

  test("entry returns rows on the sf0.001 smoke fixture") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("query names are unique across all registries") {
    val names = graft.queries.Queries.entries.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }
}
