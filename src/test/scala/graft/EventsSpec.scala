package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("events table normalizes nanos to a usable timestamp") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
    val (lo, hi) = ev.agg(min("ts"), max("ts"))
      .as[(Timestamp, Timestamp)].head()
    assert(lo.getTime >= Timestamp.valueOf("2024-01-01 00:00:00").getTime)
    assert(hi.getTime < Timestamp.valueOf("2024-03-01 00:00:00").getTime)
  }

  test("sessionize splits on >30min gaps") {
    // user 1: events at t0, +100s (same session), +4000s (new session)
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (2L, Timestamp.valueOf("2024-01-01 00:01:40"), 1L),
      (3L, Timestamp.valueOf("2024-01-01 01:08:20"), 1L),
      (4L, Timestamp.valueOf("2024-01-01 05:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val secs = col("ts").cast("long")
    val gap = secs - lag(secs, 1).over(w)
    val out = rows
      .withColumn("new_session", when(gap.isNull || gap > 1800, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum("new_session").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
  }

  test("from_json typed extraction matches regexp extraction on the corpus") {
    val ev = Tables.events(spark, sfDir)
    val typed = EventQueries.propsTyped(ev).select("event_id", "k")
    val rx = ev.select($"event_id",
      regexp_extract($"props", "\"k\"\\s*:\\s*(\\d+)", 1).cast("long").as("k_rx"))
    val joined = typed.join(rx, "event_id")
    assert(joined.filter($"k" =!= $"k_rx" ||
      ($"k".isNull && $"k_rx".isNotNull)).count() === 0)
    assert(joined.count() === ev.count())
  }

  test("seasonal anomaly flags a planted spike, not the steady baseline") {
    // 10 days x one hod: type a steady 5/day except day 9 spikes to 50;
    // type b constant (sigma = 0 -> no flags possible)
    val rows = (0 until 10).flatMap { d =>
      val na = if (d == 9) 50 else 5
      (0 until na).map(i => ("a", java.sql.Timestamp.valueOf(
        f"2024-02-${d + 1}%02d 03:00:${i % 60}%02d"))) ++
      (0 until 5).map(i => ("b", java.sql.Timestamp.valueOf(
        f"2024-02-${d + 1}%02d 03:00:${i % 60}%02d")))
    }.toDF("event_type", "ts")
    val flagged = EventQueries.seasonalAnomaly(rows)
      .select($"event_type", $"n").as[(String, Long)].collect()
    assert(flagged.toSeq === Seq(("a", 50L))) // only the spike, only type a
  }
}
