package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceJobSpec extends SparkSpec {
  import spark.implicits._

  test("one pass recovers claims, sweeps orphans, compacts, vacuums") {
    val root = tmpDir("maint")
    val store = new TableStore(spark, root)
    store.create("t", Seq(("k1", 1), ("k2", 2)).toDF("k", "v"))
    // merge-on-read debt
    store.appendWithDeletes("t", Seq(("k2", 20)).toDF("k", "v"),
      Seq("k2").toDF("k"))
    // a crashed writer: stale claim + orphaned commit dir
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(root, "t", ".claim-9"))
    val orphan = java.nio.file.Paths.get(root, "t", "d-dead")
    java.nio.file.Files.createDirectory(orphan)
    java.nio.file.Files.writeString(orphan.resolve("part-0.parquet"), "x")

    val s = MaintenanceJob.run(spark, MaintenanceJob.Args(root, "t",
      claimTtlMs = 0L, compactDebt = 1, vacuumKeep = 1))
    assert(s.recoveredClaims == Seq(9L))
    assert(s.sweptOrphanDirs == Seq("d-dead"))
    assert(s.compacted)
    assert(store.deleteDebt("t") == 0)
    // vacuum kept only the compacted current version
    assert(s.retainedVersions.size == 1)
    assert(store.read("t").orderBy("k").as[(String, Int)].collect()
      .toSeq == Seq(("k1", 1), ("k2", 20)))
  }

  test("arg parsing with defaults") {
    val a = MaintenanceJob.parseArgs(Array(
      "--store_root", "/lake", "--table", "t", "--compact_debt", "2"))
    assert(a == MaintenanceJob.Args("/lake", "t", 60 * 60 * 1000L, 2, 3))
    intercept[IllegalArgumentException] {
      MaintenanceJob.parseArgs(Array("--store_root", "/lake"))
    }
    // a typo'd flag must fail loudly, not silently run with defaults
    val e = intercept[IllegalArgumentException] {
      MaintenanceJob.parseArgs(Array("--store_root", "/lake",
        "--table", "t", "--claim_ttl", "60000"))
    }
    assert(e.getMessage.contains("--claim_ttl"))
  }
}
