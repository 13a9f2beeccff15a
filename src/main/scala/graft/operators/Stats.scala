package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed statistics over cent-grid measures.
  *
  * Spark's built-in statistical aggregates (`avg`, `stddev`, `corr`)
  * accumulate doubles and are therefore partition-order-dependent: two runs
  * of the same job can differ in the last bits, and tie-adjacent decisions
  * (outlier thresholds, rankings) can flip. These operators instead compute
  * EXACT integer sufficient statistics — the measure quantized to its
  * native cent grid, Σv and Σv² as decimal-routed integer sums — and derive
  * mean/σ/z as correctly-rounded double functions of those integers:
  * order-free under any partitioning, and reproducible bit-for-bit by a SQL
  * engine (the events_outliers / stats_corr oracles).
  *
  * Scale: one partial-agg shuffle for the stats table (one row per group —
  * broadcast-small by construction); consumers join it back onto linear
  * scans.
  */
object Stats {

  /** Exact sufficient statistics per group: (groupCol, n, sv, sq) with
    * sv = Σ round(v·100) and sq = Σ round(v·100)² as exact decimals.
    */
  def centStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val vq = floor(col(valueCol) * 100.0 + 0.5).cast("long")
    df.select(col(groupCol), vq.as("vq"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col("vq").cast("decimal(38,0)")).as("sv"),
        sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("sq"))
  }

  /** z-score of `valueCol` against a joined [[centStats]] row (expects the
    * n/sv/sq columns in scope). The division/√ spelling is pinned — the SQL
    * twin mirrors it token for token.
    *
    * Zero-variance guard: a constant group has σ = 0, and under Spark's
    * ANSI mode the 0/0 division THROWS instead of producing the NaN an IEEE
    * engine yields — so the guard emits NULL there. Output-equivalent to
    * the unguarded twin: NULL (Spark) and NaN (DuckDB) both fail any
    * `> threshold` comparison, so constant groups contribute no outlier
    * rows on either engine (EdgeCasesSpec).
    */
  def zScore(valueCol: String): Column = {
    val mean = col("sv").cast("double") / 100.0 / col("n")
    val ex2 = col("sq").cast("double") / 10000.0 / col("n")
    val variance = ex2 - mean * mean
    when(variance > 0.0, (col(valueCol) - mean) / sqrt(variance))
  }

  /** Rows whose |z| exceeds `threshold`, per group: broadcast the (tiny)
    * stats table onto the linear scan. Output adds `z_4dp` (z rounded to
    * the 1e-4 grid).
    */
  def zOutliers(df: DataFrame, groupCol: String, valueCol: String,
                threshold: Double = 3.0): DataFrame =
    df.join(broadcast(centStats(df, groupCol, valueCol)), groupCol)
      .withColumn("z", zScore(valueCol))
      .filter(abs(col("z")) > threshold)
      .drop("n", "sv", "sq")
      .withColumn("z_4dp", floor(col("z") * 10000.0 + 0.5) / 10000.0)
      .drop("z")
}
