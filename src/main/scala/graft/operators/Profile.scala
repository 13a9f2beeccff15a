package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling and expectation checking — the "is this table what the
  * pipeline assumes" layer (the deequ/Great-Expectations shape) that a
  * 100 TB ingest runs BEFORE training jobs consume a drop.
  *
  * [[profile]] emits one metrics row per requested column (row counts,
  * null counts, completeness, exact distinct cardinality, min/max, cent-grid
  * mean); [[Check]]s compose into [[expectations]], a pass/fail report with
  * observed violation counts — both plain DataFrames, so the report itself
  * can be appended to a history table and diffed across drops.
  *
  * Determinism: every metric is exact integer math except completeness and
  * mean, which are pinned double spellings of exact integers on the 1e-6 /
  * 1e-2 grids (the [[Stats]] framework) — the DuckDB twins reproduce the
  * report bit-for-bit.
  *
  * Scale: [[profile]] runs one aggregation per profiled column, each
  * scanning ONLY that column (parquet column pruning) — k bounded-output
  * single-column passes, embarrassingly parallel, no Expand-operator
  * blow-up from multi-column `count(distinct)` in one aggregate (which
  * multiplies the scan k-fold through one shuffle). Exact distinct is a
  * per-column partial-agg shuffle; swap [[Sketches.hllDistinct]] in when
  * a 6.5%-error estimate is enough. Each expectation check is one
  * aggregation (or one anti-join for referential integrity) with a
  * single-row result.
  */
object Profile {

  /** Per-column profile over `numericCols` ++ `stringCols`:
    * (col_name, n, n_null, completeness_6dp, n_distinct, min_num, max_num,
    * mean_2dp, min_str, max_str) — numeric min/max/mean on the cent grid
    * (num-typed), string min/max lexicographic (str-typed), the other
    * family's slots NULL. One single-column aggregation per profiled
    * column, unioned.
    */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty,
      "profile: no columns to profile (both column lists are empty)")
    def base(c: String) = Seq(
      count(lit(1)).as("n"),
      count(lit(1)).minus(count(col(c))).as("n_null"),
      (floor(count(col(c)).cast("double") / count(lit(1)) * 1000000.0 + 0.5)
        / 1000000.0).as("completeness_6dp"),
      countDistinct(col(c)).as("n_distinct"))
    val numeric = numericCols.map { c =>
      val vq = floor(col(c) * 100.0 + 0.5).cast("long")
      df.select(col(c), vq.as("vq"))
        .agg(base(c).head, base(c).tail ++ Seq(
          (min("vq").cast("double") / 100.0).as("min_num"),
          (max("vq").cast("double") / 100.0).as("max_num"),
          (floor(sum(col("vq").cast("decimal(38,0)")).cast("double")
            / count(col(c)) + 0.5) / 100.0).as("mean_2dp"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str")): _*)
        .select(lit(c).as("col_name"), col("*"))
    }
    val strings = stringCols.map { c =>
      df.select(col(c))
        .agg(base(c).head, base(c).tail ++ Seq(
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          lit(null).cast("double").as("mean_2dp"),
          min(col(c)).as("min_str"),
          max(col(c)).as("max_str")): _*)
        .select(lit(c).as("col_name"), col("*"))
    }
    (numeric ++ strings).reduce(_ unionByName _)
  }

  /** Drift report between two [[profile]]s of the same logical table (two
    * drops, two days, dirty vs cleaned): full-outer join on column name
    * with presence flags (the [[Curation.snapshotDiff]] idiom), per-metric
    * deltas, and a status ∈ {added, removed, changed, stable}. Deltas of
    * grid-pinned doubles are differences of identical bit patterns in both
    * engines, so the report itself hash-compares. Input-profile-sized —
    * metadata joined with metadata.
    */
  def profileDiff(before: DataFrame, after: DataFrame): DataFrame = {
    def tag(p: DataFrame, sfx: String) =
      p.select(col("col_name"), lit(true).as(s"_in$sfx"),
        col("n").as(s"n_$sfx"), col("n_null").as(s"null_$sfx"),
        col("completeness_6dp").as(s"comp_$sfx"),
        col("n_distinct").as(s"dist_$sfx"), col("mean_2dp").as(s"mean_$sfx"))
    val same = col("n_b") <=> col("n_a") && col("null_b") <=> col("null_a") &&
      col("comp_b") <=> col("comp_a") && col("dist_b") <=> col("dist_a") &&
      col("mean_b") <=> col("mean_a")
    tag(before, "b").join(tag(after, "a"), Seq("col_name"), "full_outer")
      .select(col("col_name"),
        when(col("_inb").isNull, "added")
          .when(col("_ina").isNull, "removed")
          .when(same, "stable").otherwise("changed").as("status"),
        (col("n_a") - col("n_b")).as("d_n"),
        (col("null_a") - col("null_b")).as("d_null"),
        (col("comp_a") - col("comp_b")).as("d_completeness"),
        (col("dist_a") - col("dist_b")).as("d_distinct"),
        (col("mean_a") - col("mean_b")).as("d_mean"))
  }

  /** One expectation: `violations` must evaluate to a single-row DataFrame
    * with one long column counting violating rows (0 = pass).
    */
  final case class Check(name: String, violations: DataFrame)

  /** `col` must have no NULLs. */
  def expectNotNull(df: DataFrame, c: String): Check =
    Check(s"not_null($c)",
      df.agg((count(lit(1)) - count(col(c))).as("v")))

  /** `cols` must form a unique key: violations = Σ(group size − 1) over
    * duplicated key groups (the number of surplus rows an exact dedup
    * would drop).
    */
  def expectUnique(df: DataFrame, cols: Seq[String]): Check =
    Check(s"unique(${cols.mkString(",")})",
      df.groupBy(cols.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("v")))

  /** Non-null values of `c` must lie in [lo, hi]. */
  def expectInRange(df: DataFrame, c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c)",
      df.agg(coalesce(sum(
        when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)), lit(0L)).as("v")))

  /** Non-null values of `c` must come from `allowed`. */
  def expectInSet(df: DataFrame, c: String, allowed: Seq[String]): Check =
    Check(s"in_set($c)",
      df.agg(coalesce(sum(when(col(c).isNotNull &&
        !col(c).isin(allowed.toIndexedSeq: _*), 1L).otherwise(0L)), lit(0L))
        .as("v")))

  /** Every non-null `childKey` must exist in `parent.parentKey` (foreign
    * key): violations counted via left-anti join — the only check that
    * shuffles, and it shuffles keys only.
    */
  def expectReferential(child: DataFrame, childKey: String,
                        parent: DataFrame, parentKey: String): Check =
    Check(s"referential($childKey->$parentKey)",
      child.filter(col(childKey).isNotNull).select(col(childKey))
        .join(parent.select(col(parentKey)),
          col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("v")))

  /** Fold checks into the report: (check, violations, status), ordered by
    * check name. Each check's single-row count is computed independently —
    * the report is as parallel as its checks.
    */
  def expectations(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    checks.map { ch =>
      ch.violations.select(lit(ch.name).as("check"),
        col(ch.violations.columns.head).cast("long").as("violations"))
    }.reduce(_ unionByName _)
      .withColumn("status", when(col("violations") === 0, "pass")
        .otherwise("fail"))
      .orderBy("check")
  }
}
