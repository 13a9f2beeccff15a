package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers joins at
  * runtime; these cover the aggregation side, where one hot key can pin a
  * whole stage on a single task.
  *
  * Salted two-phase aggregation: groupBy(key, salt) first — the hot key's
  * rows spread over `salts` tasks and combine map-side — then a second,
  * tiny aggregation over the per-salt partials merges them. Works for any
  * algebraic aggregate (sum/count/min/max and anything decomposable into
  * partial + merge).
  *
  * The salt is a hash of deterministic row content, NOT rand(): same data
  * ⇒ same salted plan ⇒ reproducible results and retriable tasks (a
  * rand() salt breaks task retry idempotence).
  */
object Skew {

  /** Deterministic salt in [0, salts) from arbitrary content columns. */
  def salt(salts: Int, content: Column*): Column =
    pmod(xxhash64(content: _*), lit(salts))

  /** Salted count+sum per key — the two-phase shape. `saltContent` must be
    * deterministic per row (e.g. the row's unique id), never rand().
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
                saltContent: Column, salts: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(salts, saltContent).as("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(value.cast("decimal(18,2)")).as("_s"))
      .groupBy(col("key"))
      .agg(sum("_n").as("n"), sum("_s").cast("double").as("total"))

  /** Key-skew report — the diagnostic run BEFORE choosing a mitigation
    * (the join/agg twin of the IVF `ann_list_sizes` health check): the
    * `topK` heaviest keys with their row share, plus the corpus-wide skew
    * factor max/mean — the multiple by which the hottest key's task
    * outweighs the average one. A skew factor near 1 means plain
    * shuffles are fine; large values tell you which keys [[saltedAgg]] /
    * [[saltedJoin]] (or AQE skew handling) must absorb.
    *
    * Scale: one keyed partial-agg count, a 1-row global aggregate that
    * arrives via broadcast cross join (no driver collect), and a
    * deterministic (count desc, key) top-k via orderBy+limit — no global
    * window anywhere.
    */
  def keySkewReport(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(count(lit(1)).as("n_keys"),
      sum("n_rows").as("n_total"), max("n_rows").as("n_max"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n_rows"),
        (floor(col("n_rows").cast("double") / col("n_total") * 10000.0 + 0.5)
          / 10000.0).as("share_4dp"),
        (floor(col("n_max").cast("double") * col("n_keys") / col("n_total")
          * 10000.0 + 0.5) / 10000.0).as("skew_factor_4dp"))
      .orderBy(desc("n_rows"), col("key"))
      .limit(topK)
  }

  /** Salted equi-join for a skewed LEFT side: each left row gets a
    * deterministic salt, the right side is replicated once per salt value
    * (explode), and the join key becomes (key, salt) — a hot key's rows
    * spread over `salts` tasks instead of pinning one. Result is exactly
    * the plain inner join (asserted in SkewTopKSpec). Cost model: right
    * shuffle volume × salts — use when the right side is modest but too
    * big to broadcast and AQE's runtime skew split isn't available (e.g.
    * a statically-planned pipeline). Both inputs must not already contain
    * `_salt`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltContent: Column, salts: Int = 16): DataFrame = {
    require(!(left.columns ++ right.columns).contains("_salt"),
      "saltedJoin reserves the internal column name _salt")
    val l = left.withColumn("_salt", salt(salts, saltContent))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
