package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as an algebraic aggregate — the
  * bounded-state path to "which tokens dominate this corpus" when even the
  * (token, count) table is too hot to shuffle comfortably: the exact
  * [[graft.operators.TextAnalysis.termFrequency]] shuffles one row per
  * DISTINCT token; this ships ≤ k counters per partition, full stop.
  *
  * Guarantees (the classic ones, asserted against exact counts in
  * ApproxSpec): with sketch size k over n items,
  *   - estimates never exceed true counts (est ≤ true);
  *   - undercount is bounded: true − est ≤ n/(k+1);
  *   - hence every item with true count > n/(k+1) is IN the sketch —
  *     no true heavy hitter is ever lost.
  * The merge uses the Agarwal et al. (2013) mergeable form: sum counters,
  * then subtract the (k+1)-th largest count and drop the non-positive —
  * the error bound composes across partitions, which is what makes this a
  * valid map-side-combining Spark Aggregator.
  *
  * NOT hash-oracle-able by design: which below-threshold items survive
  * (and their exact residuals) depends on partition order, like every MG
  * implementation — the properties above are the contract, so this lives
  * beside approx_count_distinct/approx_percentile in the tolerance-bound
  * tier, not the hash-match tier.
  */
object HeavyHitters {

  class MgAggregator(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k > 0, "sketch size k must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      if (m.contains(x)) m.updated(x, m(x) + 1)
      else if (m.size < k) m.updated(x, 1L)
      else m.flatMap { case (t, c) => // decrement-all; x's +1 cancels too
        if (c > 1) Some(t -> (c - 1)) else None
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val s = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (s.size <= k) s
      else {
        // subtract the (k+1)-th largest count; ≤ k survive strictly above it
        val thresh = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        s.flatMap { case (t, c) =>
          if (c - thresh > 0) Some(t -> (c - thresh)) else None
        }
      }
    }

    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Usage: `df.agg(HeavyHitters.sketch(64)(col("token")).as("hh"))` —
    * returns an array of (item, estimate) structs, largest first.
    */
  def sketch(k: Int): Column => Column = {
    val fn = udaf(new MgAggregator(k))
    (item: Column) => fn(item)
  }
}
