package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-table transaction contract: BEGIN stages commits invisibly,
  * COMMIT swings every staged manifest (pointers last), a failure
  * anywhere unwinds ALL staged commits — the all-or-nothing the
  * reference's delete-then-append pair lacks (SURVEY §3.2). */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("txn"))

  test("commit publishes all staged tables; both visible after, neither before") {
    val store = freshStore()
    store.create("a", Seq((1, "x")).toDF("id", "v"))
    store.create("b", Seq((10, "y")).toDF("id", "v"))
    // an independent reader over the same root sees only published state
    val outside = new TableStore(spark, store.rootPath)
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    store.append("b", Seq((11, "y2")).toDF("id", "v"))
    // staged: the txn sees its own writes, the outside reader does not
    assert(store.read("a").count() == 2 && store.read("b").count() == 2)
    assert(outside.read("a").count() == 1 && outside.read("b").count() == 1)
    store.commitTransaction()
    assert(outside.read("a").count() == 2 && outside.read("b").count() == 2)
  }

  test("rollback unwinds every staged commit and releases the versions") {
    val store = freshStore()
    store.create("a", Seq((1, "x")).toDF("id", "v"))
    store.create("b", Seq((10, "y")).toDF("id", "v"))
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    store.append("b", Seq((11, "y2")).toDF("id", "v"))
    store.rollbackTransaction()
    assert(store.read("a").count() == 1 && store.read("b").count() == 1)
    assert(store.currentVersion("a").contains(0L))
    // the claimed versions are free again: a later commit reuses them
    store.append("a", Seq((3, "x3")).toDF("id", "v"))
    assert(store.currentVersion("a").contains(1L))
    assert(store.read("a").count() == 2)
  }

  test("a bare single-statement BEGIN/COMMIT/ROLLBACK is rejected loudly") {
    val store = freshStore()
    // only executeScript/executeTransaction may open a transaction —
    // they enforce BEGIN/COMMIT balance; a dangling single-statement
    // BEGIN would silently stage every later commit on this instance
    for (stmt <- Seq("BEGIN", "begin transaction;", "COMMIT", "ROLLBACK")) {
      val e = intercept[IllegalArgumentException] {
        GraftSql.execute(spark, store, stmt)
      }
      assert(e.getMessage.contains("executeScript"))
    }
    assert(!store.inTransaction)
  }

  test("script failure after BEGIN leaves NEITHER table changed") {
    val store = freshStore()
    store.create("acct", Seq((1, 100L), (2, 50L)).toDF("id", "bal"))
    store.create("audit", Seq(("init", 0L)).toDF("op", "amt"))
    val script =
      """BEGIN;
        |UPDATE acct SET bal = bal - 10 WHERE id = 1;
        |INSERT INTO audit VALUES ('transfer', 10);
        |UPDATE nonexistent_table SET bal = 0;
        |COMMIT""".stripMargin
    intercept[Exception] {
      GraftSql.executeScript(spark, store, script)
    }
    assert(!store.inTransaction)
    // the first two statements staged and unwound — nothing applied
    assert(store.read("acct").where(col("id") === 1)
      .select("bal").as[Long].head() == 100L)
    assert(store.read("audit").count() == 1)
    assert(store.currentVersion("acct").contains(0L))
    assert(store.currentVersion("audit").contains(0L))
  }

  test("executeTransaction: happy path commits atomically, returns last result") {
    val store = freshStore()
    store.create("acct", Seq((1, 100L), (2, 50L)).toDF("id", "bal"))
    store.create("audit", Seq(("init", 0L)).toDF("op", "amt"))
    val out = GraftSql.executeTransaction(spark, store,
      """UPDATE acct SET bal = bal - 10 WHERE id = 1;
        |UPDATE acct SET bal = bal + 10 WHERE id = 2;
        |INSERT INTO audit VALUES ('transfer', 10);
        |SELECT sum(bal) AS total FROM acct""".stripMargin)
    assert(out.as[Long].head() == 150L) // transfer conserved the total
    assert(store.read("acct").orderBy("id").select("bal").as[Long]
      .collect().toSeq == Seq(90L, 60L))
    assert(store.read("audit").count() == 2)
  }

  test("executeTransaction rolls back on failure") {
    val store = freshStore()
    store.create("acct", Seq((1, 100L)).toDF("id", "bal"))
    intercept[Exception] {
      GraftSql.executeTransaction(spark, store,
        """UPDATE acct SET bal = 0;
          |SELECT broken syntax from""".stripMargin)
    }
    assert(!store.inTransaction)
    assert(store.read("acct").select("bal").as[Long].head() == 100L)
  }

  test("time travel and history see staged versions only inside the txn") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.beginTransaction()
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    assert(store.versions("t") == Seq(0L, 1L))
    assert(store.readVersion("t", 1L).count() == 2)
    store.commitTransaction()
    assert(store.versions("t") == Seq(0L, 1L))
    assert(store.readVersion("t", 1L).count() == 2)
  }

  test("CTAS inside a transaction is invisible until commit") {
    val store = freshStore()
    val outside = new TableStore(spark, store.rootPath)
    store.create("seed", Seq((1, "a")).toDF("id", "v"))
    store.beginTransaction()
    store.create("derived", Seq((2, "b")).toDF("id", "v"))
    assert(store.exists("derived"))
    assert(!outside.exists("derived"))
    store.commitTransaction()
    assert(outside.exists("derived"))
  }
}
