package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for every left row, the latest right row with
  * `right.ts <= left.ts` within the same `by` key. Spark has no built-in
  * as-of; the naive range join explodes to |L|·|R| per key. This is the
  * scalable union+window formulation:
  *
  *   1. tag both inputs and union them; the right side contributes ONE
  *      struct column `_rpay` holding all payload columns (null on left
  *      rows — `allowMissingColumns` fills it);
  *   2. one shuffle: window partitioned by the key, ordered by
  *      (ts, side) with side ordering right-before-left so an equal
  *      timestamp matches (<= semantics, same as DuckDB's ASOF JOIN);
  *   3. `last(_rpay, ignoreNulls)` over rows unbounded-preceding..current
  *      carries the most recent right payload forward — as one atomic
  *      struct, so every payload column comes from the SAME matched right
  *      row and a NULL inside that row's payload stays NULL (carrying each
  *      column independently would resurrect values from older rows);
  *   4. keep the left rows and unpack the struct.
  *
  * Cost: exactly one hash shuffle of |L|+|R| rows on the by-key and a
  * streaming window — no pair explosion, skew handled by AQE like any
  * other window. Right rows must be unique per (by, ts) for deterministic
  * payloads; pre-aggregate if not (see EventQueries.asofViewClick).
  */
object AsofJoin {

  /** @param rightPayload right columns to carry; every other right column
    *                     is dropped. Left keeps all its columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               byCol: String, tsCol: String,
               rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty,
      "rightPayload must name at least one right column to carry")
    // the internal tag columns would silently collide with real input
    // columns: withColumn overwrites a left `_side`, unionByName merges a
    // left `_rpay` — corrupting results with no error
    val clash = (left.columns ++ right.columns).toSet
      .intersect(Set("_side", "_rpay"))
    require(clash.isEmpty,
      s"asofJoin reserves internal column names ${clash.mkString(", ")}; " +
        "rename them on the inputs first")
    val l = left.withColumn("_side", lit(1))
    val r = right.select(col(byCol), col(tsCol), lit(0).as("_side"),
      struct(rightPayload.map(col): _*).as("_rpay"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(byCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_rpay", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++
        rightPayload.map(c => col("_rpay").getField(c).as(c)): _*)
  }
}
