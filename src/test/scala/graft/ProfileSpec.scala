package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile
import graft.operators.Profile._

/** [[graft.operators.Profile]]: per-column metrics on a hand-built table
  * (exact expected values) and the expectation suite's pass/fail verdicts
  * on planted violations.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some(10.0), Some("a")),
    (2L, Some(20.0), Some("b")),
    (3L, None, Some("b")),
    (4L, Some(30.5), None)
  ).toDF("id", "v", "s")

  test("profile: counts, completeness, distinct, typed min/max/mean") {
    val rows = Profile.profile(t, numericCols = Seq("v"), stringCols = Seq("s"))
      .orderBy("col_name").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("s", "v"))
    val s = rows(0); val v = rows(1)
    assert(v.getLong(1) === 4 && v.getLong(2) === 1) // n, n_null
    assert(v.getDouble(3) === 0.75) // completeness
    assert(v.getLong(4) === 3) // distinct non-null
    assert(v.getDouble(5) === 10.0 && v.getDouble(6) === 30.5)
    assert(v.getDouble(7) === 20.17) // mean of 10, 20, 30.5 -> 20.1666 -> 2dp ceil-half
    assert(v.isNullAt(8) && v.isNullAt(9))
    assert(s.getLong(2) === 1 && s.getLong(4) === 2)
    assert(s.isNullAt(5) && s.isNullAt(7))
    assert(s.getString(8) === "a" && s.getString(9) === "b")
  }

  test("expectations: planted violations fail, clean columns pass") {
    val parent = Seq(1L, 2L).toDF("pk")
    val rep = Profile.expectations(Seq(
        expectNotNull(t, "v"), // 1 null -> fail
        expectNotNull(t, "id"), // pass
        expectUnique(t, Seq("s")), // "b" twice -> 1 surplus -> fail
        expectUnique(t, Seq("id")), // pass
        expectInRange(t, "v", 0.0, 25.0), // 30.5 -> fail(1)
        expectInSet(t, "s", Seq("a", "b")), // pass (null ignored)
        expectReferential(t, "id", parent, "pk"))) // ids 3,4 missing -> fail(2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rep("not_null(v)") === ((1L, "fail")))
    assert(rep("not_null(id)") === ((0L, "pass")))
    assert(rep("unique(s)") === ((1L, "fail")))
    assert(rep("unique(id)") === ((0L, "pass")))
    assert(rep("in_range(v)") === ((1L, "fail")))
    assert(rep("in_set(s)") === ((0L, "pass")))
    assert(rep("referential(id->pk)") === ((2L, "fail")))
  }

  test("profileDiff: added/removed/changed/stable classification and deltas") {
    val before = Profile.profile(t, Seq("v"), Seq("s"))
    // after: v cleaned (null filled), s dropped, id newly profiled
    val cleaned = t.withColumn("v", coalesce(col("v"), lit(15.0)))
    val after = Profile.profile(cleaned, Seq("v", "id"), Seq())
    val d = Profile.profileDiff(before, after).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(d("id").getString(1) === "added")
    assert(d("s").getString(1) === "removed")
    assert(d("v").getString(1) === "changed")
    assert(d("v").getLong(3) === -1) // d_null: one null filled
    assert(d("v").getDouble(4) === 0.25) // completeness 0.75 -> 1.0
    assert(d("v").getLong(5) === 1) // distinct 3 -> 4 (15.0 new)
    val stable = Profile.profileDiff(before, before).collect()
    assert(stable.forall(_.getString(1) === "stable"))
  }

  test("log2Histogram: exact bit-length buckets, merge by summing counts") {
    import graft.operators.Stats
    // values in cents: 1, 2, 3, 4, 255, 256, 0, -5
    val rows = Seq(0.01, 0.02, 0.03, 0.04, 2.55, 2.56, 0.0, -0.05)
      .map(("g", _)).toDF("g", "v")
    val h = Stats.log2Histogram(rows, "g", "v").collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    // buckets: 1->{1}, 2->{2,3}, 3->{4}, 8->{255}, 9->{256}, 0->{0,-5}
    assert(h === Map(1 -> 1L, 2 -> 2L, 3 -> 1L, 8 -> 1L, 9 -> 1L, 0 -> 2L))
    // power-of-two boundary: 256 cents must land in bucket 9, not 8 — the
    // float-log2 failure mode this operator is designed to dodge
    val parts = Stats.log2Histogram(rows.limit(4), "g", "v")
      .unionByName(Stats.log2Histogram(rows.exceptAll(rows.limit(4)), "g", "v"))
      .groupBy("g", "bucket").agg(sum("n").as("n"))
    val whole = Stats.log2Histogram(rows, "g", "v").select("g", "bucket", "n")
    assert(parts.select("g", "bucket", "n").exceptAll(whole).isEmpty)
  }

  test("profile scans are column-pruned: each pass reads only its column") {
    // the scale contract: k single-column passes, each a pruned scan —
    // not one wide scan per metric family
    val docs = Tables.documents(spark, sfDir)
    val plan = Profile.profile(docs, Seq("n_chars"), Seq("lang"))
      .queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      val cols = s.split(",").filter(_.nonEmpty)
      assert(cols.length <= 1, s"scan reads ${cols.length} columns: $s\n$plan")
    }
  }

  test("HLL on an empty input yields no estimate rows, not a crash") {
    import graft.operators.Sketches
    val empty = t.filter(lit(false)).select(col("id"), lit("g").as("g"))
    assert(Sketches.hllDistinct(empty, "g", col("id")).count() === 0)
    assert(Sketches.hllSketch(empty, "g", col("id")).count() === 0)
  }

  test("expectations on an empty table: not_null and unique pass with 0") {
    val empty = t.filter(lit(false))
    val rep = Profile.expectations(Seq(
        expectNotNull(empty, "v"), expectUnique(empty, Seq("id"))))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getString(2))))
      .toMap
    assert(rep.values.forall(_ == ((0L, "pass"))))
  }
}
