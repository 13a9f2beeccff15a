package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks the latest right row at-or-before each left row, per key") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")), // after both clicks → latest (t2)
      (101L, 1L, ts("2024-01-01 08:30:00")), // between → t1
      (102L, 1L, ts("2024-01-01 07:00:00")), // before any click → null
      (103L, 2L, ts("2024-01-01 09:00:00")), // exact tie with click ts → match
      (104L, 3L, ts("2024-01-01 12:00:00"))) // key with no right rows → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), 11L, 1.0),
      (1L, ts("2024-01-01 09:00:00"), 12L, 2.0),
      (2L, ts("2024-01-01 09:00:00"), 21L, 3.0))
      .toDF("user_id", "ts", "click_id", "click_value")

    val out = AsofJoin.asofJoin(left, right, "user_id", "ts",
        Seq("click_id", "click_value"))
      .select("event_id", "click_id", "click_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .sortBy(_._1)

    assert(out.toSeq === Seq(
      (100L, Some(12L), Some(2.0)),
      (101L, Some(11L), Some(1.0)),
      (102L, None, None),
      (103L, Some(21L), Some(3.0)),
      (104L, None, None)))
  }

  test("NULL payload values in the matched right row stay NULL (atomic struct carry)") {
    // user 1: the as-of match at 09:00 has click_value NULL; an older click
    // at 08:00 has 7.0. Per-column carry would resurrect the 7.0 and pair it
    // with the 09:00 click_id — the whole payload must come from ONE row.
    val left = Seq((100L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Some(11L), Some(7.0)),
      (1L, ts("2024-01-01 09:00:00"), Some(12L), None: Option[Double]))
      .toDF("user_id", "ts", "click_id", "click_value")

    val out = AsofJoin.asofJoin(left, right, "user_id", "ts",
        Seq("click_id", "click_value"))
      .select("event_id", "click_id", "click_value")
      .as[(Long, Option[Long], Option[Double])].collect()

    assert(out.toSeq === Seq((100L, Some(12L), None)))
  }

  test("left columns survive untouched and row count equals the left side") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val out = AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"))
    assert(out.count() === purchases.count())
    assert(out.columns.toSet === Set("event_id", "user_id", "ts", "value", "click_id"))
    // every matched click is truly at-or-before its purchase
    val violated = out.join(
        ev.select(col("event_id").as("click_id"), col("ts").as("click_ts")),
        "click_id")
      .filter(col("click_ts") > col("ts"))
    assert(violated.count() === 0)
  }

  test("plan shape: exactly one shuffle (the by-key window), no join node") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val p = AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), s"as-of should not materialize a join:\n$p")
  }
}
