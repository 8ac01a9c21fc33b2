package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TableStore.changes — the change data feed. The governing invariant:
  * applying the feed to the fromV view as plain bag algebra
  * (+ inserts, − deletes) yields the toV view exactly, whatever mix of
  * appends, merge-on-read deletes, and rewrites the range holds. */
class ChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("cdf"))

  /** bag-apply the feed to `from` and check it equals `to`. */
  private def telescopes(store: TableStore, table: String,
                         fromV: Long, toV: Long): Unit = {
    FeedLaws.telescopes(store, table, fromV, toV)
  }

  test("append-only feed reads only the new files, attributed per version") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    store.append("t", Seq((3, "c")).toDF("id", "v"))
    val feed = store.changes("t", 0L, 2L)
      .select($"id", $"_change_type", $"_commit_version").as[(Int, String, Long)]
      .collect().sortBy(_._1)
    assert(feed.toSeq == Seq((2, "insert", 1L), (3, "insert", 2L)))
    // a narrower range sees only its own commits
    assert(store.changes("t", 1L, 2L).select("id").as[Int].collect()
      .toSeq == Seq(3))
    // empty range -> empty feed with the feed schema
    assert(store.changes("t", 2L, 2L).isEmpty)
    telescopes(store, "t", 0L, 2L)
  }

  test("merge-on-read commit emits its delete and its insert") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // CDC batch: delete id=1, insert its replacement + a new row
    store.appendWithDeletes("t", Seq((1, "a2"), (3, "c")).toDF("id", "v"),
      Seq(1).toDF("id"))
    val feed = store.changes("t", 0L, 1L)
      .select($"id", $"v", $"_change_type").as[(Int, String, String)]
      .collect().sortBy(r => (r._1, r._3))
    assert(feed.toSeq == Seq((1, "a", "delete"), (1, "a2", "insert"),
      (3, "c", "insert")))
    telescopes(store, "t", 0L, 1L)
  }

  test("re-deleting an already-deleted key emits no phantom delete") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    store.appendWithDeletes("t", spark.emptyDataset[(Int, String)]
      .toDF("id", "v"), Seq(1).toDF("id"))
    // second commit deletes id=1 again (a no-op) and id=2 (real)
    store.appendWithDeletes("t", spark.emptyDataset[(Int, String)]
      .toDF("id", "v"), Seq(1, 2).toDF("id"))
    val dels = store.changes("t", 0L, 2L)
      .where($"_change_type" === "delete")
      .select($"id", $"_commit_version").as[(Int, Long)].collect().sortBy(_._1)
    // exactly one delete per physical row, at the commit that removed it
    assert(dels.toSeq == Seq((1, 1L), (2, 2L)))
    telescopes(store, "t", 0L, 2L)
  }

  test("a rewrite in the range falls back to an exact bag diff") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    // overwrite: 2 changes value, 3 is dropped, 4 appears
    store.overwrite("t", Seq((1, "a"), (2, "B"), (4, "d")).toDF("id", "v"))
    val feed = store.changes("t", 0L, 1L)
      .select($"id", $"v", $"_change_type").as[(Int, String, String)]
      .collect().sortBy(r => (r._1, r._3))
    assert(feed.toSeq == Seq((2, "b", "delete"), (2, "B", "insert"),
      (3, "c", "delete"), (4, "d", "insert")))
    telescopes(store, "t", 0L, 1L)
  }

  test("a content-neutral rewrite range short-circuits to an empty feed") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    store.appendWithDeletes("t", Seq((2, "B")).toDF("id", "v"),
      Seq(Tuple1(2)).toDF("id"))
    val pre = store.currentVersion("t").get
    store.compact("t")
    val cur = store.currentVersion("t").get
    assert(cur == pre + 1)
    // COMPACT preserves the row bag by contract: the feed is empty
    // WITHOUT the O(table) endpoint bag diff a rewrite normally forces
    assert(store.changes("t", pre, cur).isEmpty)
    telescopes(store, "t", pre, cur)
    // the short-circuit never opens the range's LOWER endpoint, so it
    // still answers after that manifest is vacuumed — the case where
    // an incremental consumer's cursor sits just below a maintenance
    // rewrite the vacuum has since aged out
    store.vacuum("t", keep = 1)
    assert(store.changes("t", pre, cur).isEmpty)
  }

  test("changesSince drives a cursor-based sync loop") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    var cursor = 0L
    var seen = Vector.empty[(Int, String)]
    def pull(): Unit = store.changesSince("t", cursor).foreach {
      case (feed, c) =>
        seen ++= feed.select($"id", $"_change_type").as[(Int, String)]
          .collect().sortBy(_._1)
        cursor = c
    }
    pull() // nothing new
    assert(cursor == 0L && seen.isEmpty)
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    pull()
    assert(cursor == 1L && seen == Vector((2, "insert")))
    store.append("t", Seq((3, "c")).toDF("id", "v"))
    store.appendWithDeletes("t", Seq((4, "d")).toDF("id", "v"),
      Seq(1).toDF("id"))
    pull() // catches up over BOTH missed versions at once
    assert(cursor == 3L)
    assert(seen == Vector((2, "insert"), (1, "delete"), (3, "insert"),
      (4, "insert")))
    pull() // idempotent at head
    assert(cursor == 3L && seen.size == 4)
  }

  test("a feed spanning a RENAME surfaces one column, under the latest name") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, "b")).toDF("id", "v"))   // pre-rename commit
    store.renameColumn("t", "v", "val")                // metadata-only
    store.append("t", Seq((3, "c")).toDF("id", "val")) // post-rename commit
    val feed = store.changes("t", 0L, 3L)
    // latest-schema semantics (Delta CDF): ONE value column named per
    // the toV mapping — not an old-name/new-name pair, each half-null
    assert(feed.columns.toSet ==
      Set("id", "val", "_change_type", "_commit_version"))
    val rows = feed.select($"id", $"val", $"_commit_version")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((2, "b", 1L), (3, "c", 3L)))
    assert(feed.where($"val".isNull).isEmpty)
    telescopes(store, "t", 0L, 3L)
    // and across a rename + rewrite (fallback diff path) too
    store.compact("t")
    telescopes(store, "t", 0L, 4L)
  }

  test("a rewrite that narrows the schema diffs under the toV schema") {
    val store = freshStore()
    store.create("t", Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "v", "w"))
    // overwrite drops column w entirely: latest-schema semantics mean
    // the feed carries only toV's columns — w is gone, and the diff
    // runs on (id, v) so the row unchanged there does not churn
    store.overwrite("t", Seq((1, "a"), (3, "c")).toDF("id", "v"))
    val feed = store.changes("t", 0L, 1L)
    assert(feed.columns.toSet ==
      Set("id", "v", "_change_type", "_commit_version"))
    val dels = feed.where($"_change_type" === "delete")
      .select($"id", $"v").as[(Int, String)].collect().sortBy(_._1)
    assert(dels.toSeq == Seq((2, "b")))
    val ins = feed.where($"_change_type" === "insert")
      .select($"id", $"v").as[(Int, String)].collect().sortBy(_._1)
    assert(ins.toSeq == Seq((3, "c")))
    telescopes(store, "t", 0L, 1L)
  }

  test("mixed history telescopes end-to-end and per step") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    store.append("t", Seq((3, "c"), (3, "c")).toDF("id", "v")) // dup rows
    store.appendWithDeletes("t", Seq((2, "b2")).toDF("id", "v"),
      Seq(2, 3).toDF("id")) // kills both copies of 3
    store.compact("t") // rewrite: folds MoR debt
    store.append("t", Seq((5, "e")).toDF("id", "v"))
    for (v <- 0L to 4L; w <- v to 4L) telescopes(store, "t", v, w)
    // the delete of the duplicated key carries both copies
    val d3 = store.changes("t", 0L, 2L)
      .where($"_change_type" === "delete" && $"id" === 3).count()
    assert(d3 == 2, s"expected both copies of id=3 deleted, got $d3")
  }
}
