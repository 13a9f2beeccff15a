package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join: left rows (a point column)
  * matched to right rows (interval [start, end], inclusive) within the same
  * `by` key.
  *
  * Spark's planner turns a raw `l.ts BETWEEN r.start AND r.end` predicate
  * into a nested-loop / broadcast cross join — O(|L|·|R|) per key. The
  * scalable shape is time-bucketing: explode every interval into the
  * buckets it covers, bucket every point once, equi-join on
  * (by, bucket) — the shuffle is linear in |L| + Σ interval-spans — then
  * apply the exact range predicate. Semantics are identical to the naive
  * join (set-equality asserted in RangeJoinSpec); `bucketWidth` only tunes
  * the explode-factor/selectivity trade (width ≈ typical interval length
  * is a good default).
  */
object RangeJoin {

  /** @param bucketWidthSec bucket size in seconds.
    * @param rightPayload   right columns to keep alongside the interval.
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      byCol: String, pointCol: String,
                      startCol: String, endCol: String,
                      rightPayload: Seq[String],
                      bucketWidthSec: Long = 3600L): DataFrame = {
    def bucketOf(c: Column): Column = floor(c.cast("long") / bucketWidthSec)
    val l = left.withColumn("_bucket", bucketOf(col(pointCol)))
    val r = right
      .withColumn("_bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
      .select((Seq(byCol, "_bucket", startCol, endCol).map(col) ++
        rightPayload.map(col)): _*)
    l.join(r, Seq(byCol, "_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }
}
