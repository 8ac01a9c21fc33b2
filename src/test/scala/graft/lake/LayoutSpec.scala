package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (known small cases)") {
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L), (2L, 1L))
      .toDF("x", "y")
      .select(Layout.zvalue(Seq(col("x"), col("y")), bits = 2).as("z"))
    // x bit b -> position 2b, y bit b -> position 2b+1
    // (3,0)=0b0101=5; (0,3)=0b1010=10; (1,1)=0b11=3; (2,1)=0b0110=6
    assert(df.as[Long].collect().toSeq == Seq(5L, 10L, 3L, 6L))
  }

  test("z-ordered files cover compact rectangles; a 2-d predicate touches few") {
    // 64x64 grid, 16 files: a z-ordered layout puts each file in a
    // ~16x16 tile, so a 10x10 query rectangle intersects a handful of
    // files; a row-ordered layout would slice every file.
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"))
    val dir = tmpDir("zorder")
    Layout.cluster(grid, Seq("x", "y"), numFiles = 16, bits = 6)
      .write.mode("overwrite").parquet(dir)
    val files = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("x"), col("y"))
    val total = files.select("f").distinct().count()
    assert(total >= 8, s"expected >=8 files, got $total")
    val touched = files
      .where(col("x").between(20, 29) && col("y").between(20, 29))
      .select("f").distinct().count()
    assert(touched <= total / 2,
      s"z-order locality missing: $touched of $total files touched")
    // and each file's bounding box is far smaller than the full grid
    val avgArea = files.groupBy("f")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
        .as("area"))
      .agg(avg("area")).first().getDouble(0)
    assert(avgArea < 64 * 64 / 4.0, s"avg file bounding area $avgArea")
  }

  test("preserveLayout keeps z-order clustering on a PARTITIONED table (no rebalance scramble)") {
    // regression: the partitioned-commit rebalance must not reshuffle a
    // pre-shaped z-ordered rewrite (the OPTIMIZE ZORDER path passes
    // preserveLayout = true) — each file must still cover a compact z
    // tile, or min/max skipping silently dies. A scrambled layout
    // would put every file's bounding box at the full 64x64 grid.
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"),
        (col("id") % 2).cast("int").as("p"))
    val store = new TableStore(spark, tmpDir("zpart"))
    store.create("zp", grid, partitionBy = Seq("p"))
    store.overwrite("zp",
      Layout.cluster(store.read("zp"), Seq("x", "y"), numFiles = 16, bits = 6),
      preserveLayout = true)
    val files = store.read("zp")
      .select(input_file_name().as("f"), col("x"), col("y"))
    val total = files.select("f").distinct().count()
    assert(total >= 8, s"expected >=8 files after clustering, got $total")
    val avgArea = files.groupBy("f")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
        .as("area"))
      .agg(avg("area")).first().getDouble(0)
    assert(avgArea < 64 * 64 / 4.0,
      s"z-order clustering lost on partitioned rewrite: avg area $avgArea")
  }
}
