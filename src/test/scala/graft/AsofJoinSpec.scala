package graft

import graft.plans.{AsofJoinOp, AsofJoinPlan}
import org.apache.spark.sql.functions._

/** The native merge as-of join (plans.AsofJoin*) must agree row-for-row
  * with the oracle-checked window rewrite (q56), push left filters
  * through the custom node, and plan as the custom physical operator.
  */
class AsofJoinSpec extends SparkSpec {

  private def purchases = Tables.events(spark, sf0001)
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"))

  private def views = Tables.events(spark, sf0001)
    .filter(col("event_type") === "view")
    .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
      col("ts").as("view_ts"))

  test("native as-of join == oracle-checked window rewrite (q56)") {
    val native = AsofJoinOp.asofJoin(purchases, views,
        leftKey = "user_id", rightKey = "v_user_id",
        leftTs = "purchase_ts", rightTs = "view_ts", tie = Some("view_id"))
      .select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
    val rewrite = graft.ops.EventQueries.q56AsofViewPurchase(spark, sf0001)
    assert(native.count() == rewrite.count())
    assert(native.exceptAll(rewrite).isEmpty && rewrite.exceptAll(native).isEmpty)
  }

  test("left predicates are pushed below the as-of join by the custom rule") {
    val joined = AsofJoinOp.asofJoin(purchases, views,
        "user_id", "v_user_id", "purchase_ts", "view_ts", Some("view_id"))
      .filter(col("user_id") < 100 && col("view_id").isNotNull)
    val optimized = joined.queryExecution.optimizedPlan
    val aj = optimized.collectFirst { case p: AsofJoinPlan => p }
    assert(aj.isDefined, "AsofJoinPlan should survive optimization")
    // the user_id predicate must sit on (or below) the join's left child
    val leftHasFilter = aj.get.left.toString.contains("user_id")
    assert(leftHasFilter, s"left predicate not pushed:\n$optimized")
    // the view_id predicate references the right side's output and must
    // stay above the join
    assert(optimized.toString.linesIterator.next().toLowerCase.contains("filter") ||
      optimized.collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }
        .exists(_.condition.references.exists(_.name == "view_id")))
  }

  test("physical plan is the merge operator with co-partitioned sorted children") {
    val plan = AsofJoinOp.asofJoin(purchases, views,
        "user_id", "v_user_id", "purchase_ts", "view_ts", Some("view_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoinExec") || plan.contains("AsofJoin"),
      s"expected AsofJoinExec in:\n$plan")
  }

  test("forward as-of == brute-force earliest-at-or-after oracle on fixtures") {
    import org.apache.spark.sql.expressions.Window
    val native = AsofJoinOp.asofJoin(purchases, views,
        "user_id", "v_user_id", "purchase_ts", "view_ts", Some("view_id"),
        direction = graft.plans.AsofDirection.Forward)
      .select("user_id", "purchase_id", "view_id")
    // brute force: every (purchase, later-or-equal view) pair ranked by
    // (view_ts asc, view_id asc) — the pair blow-up this operator avoids
    val w = Window.partitionBy("purchase_id")
      .orderBy(col("view_ts").asc, col("view_id").asc)
    val brute = purchases
      .join(views, col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("purchase_ts"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "purchase_id", "view_id")
    assert(native.exceptAll(brute).isEmpty && brute.exceptAll(native).isEmpty)
  }

  test("forward + tolerance on a hand-built edge set") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 12L, 100L), (1L, 12L, 101L), (1L, 40L, 102L), (2L, 4L, 103L))
      .toDF("rk", "rt", "rid")
    val out = AsofJoinOp.asofJoin(l, r, "k", "rk", "t", "rt", Some("rid"),
        direction = graft.plans.AsofDirection.Forward, tolerance = Some(5L))
      .select("k", "t", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) -1L else row.getLong(2))).toSet
    assert(out == Set(
      (1L, 10L, 100L),  // earliest rt >= 10 within 5 is 12; LEAST rid wins the tie
      (1L, 20L, -1L),   // next right is rt=40, outside tolerance 5
      (2L, 5L, -1L)))   // only an earlier right exists -> null (forward looks ahead)
  }

  test("backward + tolerance drops stale matches") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 8L, 200L)).toDF("rk", "rt", "rid")
    val out = AsofJoinOp.asofJoin(l, r, "k", "rk", "t", "rt", Some("rid"),
        tolerance = Some(5L))
      .select("k", "t", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) -1L else row.getLong(2))).toSet
    assert(out == Set(
      (1L, 10L, 200L),   // 10 - 8 = 2 <= 5
      (1L, 100L, -1L)))  // same right row is now 92 stale -> null
  }

  test("as-of semantics on a hand-built edge set: empty right, ties, no-match") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "payload")
    val r = Seq((1L, 10L, 100L), (1L, 10L, 101L), (1L, 15L, 102L), (2L, 6L, 103L))
      .toDF("rk", "rt", "rid")
    val out = AsofJoinOp.asofJoin(l, r, "k", "rk", "t", "rt", Some("rid"))
      .select("k", "t", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) -1L else row.getLong(2))).toSet
    assert(out == Set(
      (1L, 10L, 101L),  // tie at rt=10 -> greatest rid wins
      (1L, 20L, 102L),  // latest rt <= 20
      (2L, 5L, -1L),    // right exists but only later -> null
      (3L, 9L, -1L)))   // key absent on the right -> null
  }
}
