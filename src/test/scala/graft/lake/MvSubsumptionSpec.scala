package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Star-view SUBSUMPTION (Goldstein–Larson §4.2): a query over a
  * SUBSET of a star view's tables serves from the view iff every
  * omitted dim join is provably key-preserving from RELY
  * constraints — PRIMARY KEY / UNIQUE on the dim's join columns (no
  * duplication) plus a declared FOREIGN KEY from the fact (non-NULL
  * children, so the inner join drops nothing). Without the proof the
  * rewrite must abstain: abstention is always correct, a wrong serve
  * never is. */
class MvSubsumptionSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("mvsub"))

  /** fact(okey, skey, qty) ⋈ dimo(okey, status) ⋈ dims(skey, sname). */
  private def setup(store: TableStore): Unit = {
    store.create("fact", (1 to 60).map(i =>
      (i.toLong % 10, i.toLong % 5, i * 1.0)).toDF("okey", "skey", "qty"))
    store.create("dimo", (0 to 9).map(o =>
      (o.toLong, "s" + (o % 3))).toDF("okey", "status"))
    store.create("dims", (0 to 4).map(s =>
      (s.toLong, "n" + s)).toDF("skey", "sname"))
    MaterializedView.createStar(store, "star_mv", "fact",
      Seq("dimo" -> Seq("okey"), "dims" -> Seq("skey")),
      Seq("status", "sname"), Seq("qty"))
  }

  private def run(store: TableStore, sql: String): (Seq[Row], Boolean) = {
    val before = MvRewrite.hits.get()
    val got = GraftSql.execute(spark, store, sql)
    val sorted = got.orderBy(got.columns.map(col): _*).collect().toSeq
    (sorted, MvRewrite.hits.get() > before)
  }

  private def direct(store: TableStore, sql: String): Seq[Row] = {
    spark.conf.set(MvRewrite.EnabledKey, "false")
    try run(store, sql)._1
    finally spark.conf.set(MvRewrite.EnabledKey, "true")
  }

  private val subsetQ =
    """SELECT sname, count(*) AS n, sum(qty) AS s
      |FROM fact JOIN dims USING (skey) GROUP BY sname""".stripMargin
  private val factOnlyQ =
    "SELECT count(*) AS n, sum(qty) AS s FROM fact"

  test("subset query abstains without RELY proof, serves with it, answer exact") {
    val store = freshStore()
    setup(store)
    // no constraints: dropping dimo is unprovable -> abstain
    val (noProof, servedNo) = run(store, subsetQ)
    assert(!servedNo, "must abstain without the key-preservation proof")
    assert(noProof == direct(store, subsetQ))
    // PK alone is not enough (a fact row could reference no dim row)
    GraftSql.execute(spark, store,
      "ALTER TABLE dimo ADD CONSTRAINT dimo_pk PRIMARY KEY (okey) RELY")
    assert(!run(store, subsetQ)._2, "PK without FK must still abstain")
    // PK + FK: the omitted dimo join is provably 1:1 per fact row
    GraftSql.execute(spark, store,
      "ALTER TABLE fact ADD CONSTRAINT fact_fk FOREIGN KEY (okey) " +
        "REFERENCES dimo (okey) RELY")
    val (served, hit) = run(store, subsetQ)
    assert(hit, "PK+FK must enable the subset serve")
    assert(served == direct(store, subsetQ), "served answer must be exact")
  }

  test("fact-only aggregate serves only when EVERY omitted dim is proven") {
    val store = freshStore()
    setup(store)
    GraftSql.execute(spark, store,
      "ALTER TABLE dimo ADD CONSTRAINT dimo_pk PRIMARY KEY (okey) RELY")
    GraftSql.execute(spark, store,
      "ALTER TABLE fact ADD CONSTRAINT fact_fko FOREIGN KEY (okey) " +
        "REFERENCES dimo (okey) RELY")
    // dims is still unproven -> abstain
    assert(!run(store, factOnlyQ)._2,
      "one unproven omitted dim must block the serve")
    GraftSql.execute(spark, store,
      "ALTER TABLE dims ADD CONSTRAINT dims_uq UNIQUE (skey) RELY")
    GraftSql.execute(spark, store,
      "ALTER TABLE fact ADD CONSTRAINT fact_fks FOREIGN KEY (skey) " +
        "REFERENCES dims (skey) RELY")
    val (served, hit) = run(store, factOnlyQ)
    assert(hit, "all dims proven -> global aggregate serves from the star")
    assert(served == direct(store, factOnlyQ))
  }

  test("DROP CONSTRAINT revokes the subsumption; full-star queries unaffected throughout") {
    val store = freshStore()
    setup(store)
    val fullQ =
      """SELECT status, sname, count(*) AS n, sum(qty) AS s
        |FROM fact JOIN dimo USING (okey) JOIN dims USING (skey)
        |GROUP BY status, sname""".stripMargin
    assert(run(store, fullQ)._2, "exact-match star serve must still work")
    GraftSql.execute(spark, store,
      "ALTER TABLE dimo ADD CONSTRAINT dimo_pk PRIMARY KEY (okey) RELY")
    GraftSql.execute(spark, store,
      "ALTER TABLE fact ADD CONSTRAINT fact_fk FOREIGN KEY (okey) " +
        "REFERENCES dimo (okey) RELY")
    assert(run(store, subsetQ)._2)
    GraftSql.execute(spark, store, "ALTER TABLE fact DROP CONSTRAINT fact_fk")
    assert(!run(store, subsetQ)._2, "dropped FK must revoke the serve")
    assert(run(store, fullQ)._2, "full-star serve survives the drop")
  }

  test("declare-time validation rejects duplicates, orphans and NULL keys") {
    val store = freshStore()
    store.create("d", Seq((1L, "a"), (1L, "b")).toDF("k", "v"))
    intercept[Exception] {
      GraftSql.execute(spark, store,
        "ALTER TABLE d ADD CONSTRAINT d_pk PRIMARY KEY (k) RELY")
    }
    store.create("f", Seq((Some(1L), 1.0), (None, 2.0)).toDF("k", "x"))
    store.create("dd", Seq((1L, "a")).toDF("k", "v"))
    intercept[Exception] { // NULL child key
      GraftSql.execute(spark, store,
        "ALTER TABLE f ADD CONSTRAINT f_fk FOREIGN KEY (k) " +
          "REFERENCES dd (k) RELY")
    }
    store.create("f2", Seq((1L, 1.0), (9L, 2.0)).toDF("k", "x"))
    intercept[Exception] { // orphan reference
      GraftSql.execute(spark, store,
        "ALTER TABLE f2 ADD CONSTRAINT f2_fk FOREIGN KEY (k) " +
          "REFERENCES dd (k) RELY")
    }
    // a valid declaration lands and is listed/droppable
    store.create("f3", Seq((1L, 1.0)).toDF("k", "x"))
    GraftSql.execute(spark, store,
      "ALTER TABLE f3 ADD CONSTRAINT f3_fk FOREIGN KEY (k) " +
        "REFERENCES dd (k) RELY")
    assert(store.foreignKeys("f3").map(_._1) == Seq("f3_fk"))
    // visible to the operator in DESCRIBE DETAIL
    assert(store.detail("f3").head()
      .getAs[scala.collection.Seq[String]]("rely_constraints")
      .toSeq == Seq("f3_fk(k)->dd(k)"))
    GraftSql.execute(spark, store, "ALTER TABLE f3 DROP CONSTRAINT f3_fk")
    assert(store.foreignKeys("f3").isEmpty)
    // one namespace across CHECK and RELY: DROP drops by bare name, so
    // a shared name is refused in BOTH declaration orders
    GraftSql.execute(spark, store,
      "ALTER TABLE dd ADD CONSTRAINT cx CHECK (k > 0)")
    intercept[Exception] {
      GraftSql.execute(spark, store,
        "ALTER TABLE dd ADD CONSTRAINT cx PRIMARY KEY (k)")
    }
    GraftSql.execute(spark, store,
      "ALTER TABLE dd ADD CONSTRAINT pkx PRIMARY KEY (k)")
    intercept[Exception] {
      GraftSql.execute(spark, store,
        "ALTER TABLE dd ADD CONSTRAINT pkx CHECK (k > 0)")
    }
  }
}
