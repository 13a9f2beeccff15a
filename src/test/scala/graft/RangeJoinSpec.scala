package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the naive BETWEEN join on the corpus") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("w_end"),
        $"event_id".as("purchase_id"))

    val bucketed = RangeJoin.pointInInterval(clicks, purchases,
        "user_id", "ts", "w_start", "w_end", Seq("purchase_id"))
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet

    val naive = clicks.as("c").join(purchases.as("p"),
        $"c.user_id" === $"p.user_id" &&
          $"c.ts" >= $"p.w_start" && $"c.ts" <= $"p.w_end")
      .select($"click_id", $"purchase_id")
      .as[(Long, Long)].collect().toSet

    assert(bucketed === naive)
    assert(naive.nonEmpty) // corpus actually exercises the join
  }

  test("boundary semantics are inclusive on both ends") {
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100L),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), 101L),
      (1L, Timestamp.valueOf("2024-01-01 11:00:01"), 102L))
      .toDF("user_id", "ts", "click_id")
    val right = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-01 11:00:00"), 7L))
      .toDF("user_id", "w_start", "w_end", "purchase_id")
    val out = RangeJoin.pointInInterval(left, right,
        "user_id", "ts", "w_start", "w_end", Seq("purchase_id"))
      .select("click_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(100L, 101L)) // start and end inclusive, after-end excluded
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("w_end"),
        $"event_id".as("purchase_id"))
    val p = RangeJoin.pointInInterval(clicks, purchases,
        "user_id", "ts", "w_start", "w_end", Seq("purchase_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), s"range join degenerated to nested loop:\n$p")
    assert(p.contains("_bucket"), s"bucket key missing from join:\n$p")
  }
}
