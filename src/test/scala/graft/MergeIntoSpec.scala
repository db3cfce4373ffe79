package graft

import org.apache.spark.sql.functions._

/** S12: native SQL `MERGE INTO` through the row-level-operation
  * connector contract (`graft.sources.MemMergeCatalog`). Spark ships no
  * builtin MERGE-capable table — the capability is the
  * `SupportsRowLevelOperations` API (what Iceberg/Delta implement), and
  * this suite proves the engine drives Catalyst's group-based
  * `RewriteMergeIntoTable` → `ReplaceData` path end-to-end: all three
  * clause families (WHEN MATCHED UPDATE/DELETE, WHEN NOT MATCHED
  * INSERT, WHEN NOT MATCHED BY SOURCE), carry-over of untouched rows,
  * and the replaced-group commit. The reference result is the same
  * merge computed relationally (the q70 full-outer-join shape) — two
  * independent code paths, one contract. */
class MergeIntoSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[graft.sources.MemMergeCatalog].getName)
    val t = s"graftmem.cdc.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, seg STRING, bal BIGINT)")
    t
  }

  test("MERGE INTO executes all three clause families via ReplaceData") {
    val t = freshTable("accounts")
    spark.sql(s"""INSERT INTO $t VALUES
      (1, 'A', 100), (2, 'A', 200), (3, 'B', 300), (4, 'B', 400)""")
    // source: update 1, delete 2, insert 5; 9 carries a delete op that
    // must NOT insert; target 3 is untouched by source (matched-by-
    // source clause bumps it), 4 is deleted by the by-source clause
    import spark.implicits._
    Seq((1L, "A", 150L, "U"), (2L, "A", 0L, "D"),
      (5L, "C", 500L, "U"), (9L, "C", 900L, "D"))
      .toDF("id", "seg", "bal", "op").createOrReplaceTempView("src")
    spark.sql(s"""MERGE INTO $t AS tgt USING src
      ON tgt.id = src.id
      WHEN MATCHED AND src.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET bal = src.bal
      WHEN NOT MATCHED AND src.op <> 'D' THEN
        INSERT (id, seg, bal) VALUES (src.id, src.seg, src.bal)
      WHEN NOT MATCHED BY SOURCE AND tgt.seg = 'B' AND tgt.id = 4 THEN
        DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = tgt.bal + 1""")
    val got = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1L, "A", 150L), (3L, "B", 301L), (5L, "C", 500L)),
      s"merge produced $got")
  }

  test("the MERGE plan is the group-based ReplaceData rewrite") {
    val t = freshTable("explained")
    spark.sql(s"INSERT INTO $t VALUES (1, 'A', 1)")
    import spark.implicits._
    Seq((1L, "A", 2L)).toDF("id", "seg", "bal")
      .createOrReplaceTempView("src2")
    val plan = spark.sql(s"""EXPLAIN EXTENDED MERGE INTO $t AS tgt
      USING src2 ON tgt.id = src2.id
      WHEN MATCHED THEN UPDATE SET bal = src2.bal""")
      .collect()(0).getString(0)
    assert(plan.contains("ReplaceData"),
      s"expected the group-based row-level rewrite, got:\n$plan")
  }

  test("q405: every clause family actually fired on the fixture " +
      "(the NonDegeneracy vacuity pin)") {
    SparkEntry.queries("q405_merge_into_native")(spark, sf0001).collect()
    val rows = spark.table("graftmem.cdc.accounts_q405").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val base = Tables.customer(spark, sf0001)
      .select(col("c_custkey"),
        expr("cast(round(c_acctbal * 100) as bigint)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // matched DELETE: in target (¬÷3), op='D' (÷10) → gone
    assert(!rows.contains(10L), "id 10 must be deleted (matched DELETE)")
    // matched UPDATE: in both (2: ¬÷3, ÷2) → src bal = base + 777
    assert(rows(2L) === base(2L) + 777L, "id 2 must take the update")
    // NOT MATCHED INSERT: ÷3 and ÷2, not ÷10 (6) → inserted at src bal
    assert(rows(6L) === base(6L) + 777L, "id 6 must be inserted")
    // NOT MATCHED BY SOURCE: ¬÷3, ¬÷2 (1) → audit bump +1
    assert(rows(1L) === base(1L) + 1L, "id 1 must take the audit bump")
    // guarded non-insert: ÷10 and ÷3 (30) was never in target, op='D'
    assert(!rows.contains(30L), "id 30 must not be inserted (op='D')")
  }

  test("runtime group filtering: groups the scan does not read are " +
      "not rewritten (the Iceberg-shape contract, r19)") {
    val t = freshTable("grouped")
    // two separate INSERT commits = two storage groups (data files)
    spark.sql(s"INSERT INTO $t VALUES (1, 'A', 10), (2, 'A', 20)")
    spark.sql(s"INSERT INTO $t VALUES (100, 'B', 1000), (200, 'B', 2000)")
    val before = graft.sources.MemMergeCatalog
      .groupSnapshot("graftmem", Array("cdc"), "grouped")
    assert(before.map(_._1).toSet.size === 2, s"expected 2 groups: $before")
    val bGroup = before.find(_._2.exists(_.head == 100L)).get
    // source matches ONLY keys in the first group
    import spark.implicits._
    Seq((1L, "A", 11L), (300L, "C", 3000L)).toDF("id", "seg", "bal")
      .createOrReplaceTempView("srcg")
    spark.sql(s"""MERGE INTO $t AS tgt USING srcg ON tgt.id = srcg.id
      WHEN MATCHED THEN UPDATE SET bal = srcg.bal
      WHEN NOT MATCHED THEN INSERT *""")
    val after = graft.sources.MemMergeCatalog
      .groupSnapshot("graftmem", Array("cdc"), "grouped")
    // the untouched group survives with the SAME id and the SAME rows
    val bAfter = after.find(_._1 == bGroup._1)
    assert(bAfter.isDefined, s"group ${bGroup._1} must survive: $after")
    assert(bAfter.get._2 === bGroup._2, "untouched group must be identical")
    // the commit replaced EXACTLY the matched group, not the table
    val replaced = graft.sources.MemMergeCatalog
      .lastReplacedGroups("graftmem", Array("cdc"), "grouped")
    assert(replaced === before.map(_._1).toSet - bGroup._1,
      s"replaced $replaced; groups before ${before.map(_._1)}")
    // relational end state is still the full merge result
    val got = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === Set((1L, 11L), (2L, 20L), (100L, 1000L),
      (200L, 2000L), (300L, 3000L)), s"merge produced $got")
  }

  test("the MERGE plan carries the dynamic-pruning group filter " +
      "(runtime group filtering is planned, not incidental)") {
    val t = freshTable("pruned")
    spark.sql(s"INSERT INTO $t VALUES (1, 'A', 1)")
    import spark.implicits._
    Seq((1L, "A", 2L)).toDF("id", "seg", "bal")
      .createOrReplaceTempView("srcp")
    val plan = spark.sql(s"""EXPLAIN EXTENDED MERGE INTO $t AS tgt
      USING srcp ON tgt.id = srcp.id
      WHEN MATCHED THEN UPDATE SET bal = srcp.bal""")
      .collect()(0).getString(0)
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic-pruning group filter over the op scan:\n$plan")
  }

  test("MERGE is idempotent re-run: rebuild + merge reproduces the " +
      "same state (the q405 oracle-query contract)") {
    (1 to 2).foreach { _ =>
      val t = freshTable("idem")
      spark.sql(s"INSERT INTO $t VALUES (1, 'A', 10), (2, 'B', 20)")
      import spark.implicits._
      Seq((2L, "B", 25L), (3L, "C", 30L)).toDF("id", "seg", "bal")
        .createOrReplaceTempView("src3")
      spark.sql(s"""MERGE INTO $t AS tgt USING src3 ON tgt.id = src3.id
        WHEN MATCHED THEN UPDATE SET bal = src3.bal
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.table(t).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
      assert(got === Seq((1L, 10L), (2L, 25L), (3L, 30L)))
    }
  }
}
