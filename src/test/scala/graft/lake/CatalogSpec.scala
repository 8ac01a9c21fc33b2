package graft.lake

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("register/pathOf/read resolve a path-registered table") {
    val cat = new Catalog(spark)
    val p = tmpDir("cat")
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.mode("overwrite").parquet(p)
    cat.register("db", "t", p)
    assert(cat.pathOf("db", "t").contains(p))
    assert(cat.read("db", "t").count() == 2)
    intercept[IllegalArgumentException](cat.read("db", "nope"))
  }

  test("registerExternal (S9) makes the path queryable by name") {
    val cat = new Catalog(spark)
    val p = tmpDir("cat-ext")
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(p)
    spark.sql("DROP TABLE IF EXISTS ext_spec_t")
    cat.registerExternal("ext_spec_t", p)
    assert(spark.table("ext_spec_t").select("id").as[Int]
      .collect().sorted.toSeq == Seq(1, 2, 3))
    // IF NOT EXISTS: re-registering the same name is a no-op, not an error
    cat.registerExternal("ext_spec_t", p)
    // drop + re-register re-points the location
    val p2 = tmpDir("cat-ext2")
    Seq((9, "z")).toDF("id", "v").write.mode("overwrite").parquet(p2)
    spark.sql("DROP TABLE IF EXISTS ext_spec_t")
    cat.registerExternal("ext_spec_t", p2)
    assert(spark.table("ext_spec_t").select("id").as[Int]
      .collect().toSeq == Seq(9))
    spark.sql("DROP TABLE IF EXISTS ext_spec_t")
  }
}
