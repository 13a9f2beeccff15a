package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact top-k as an algebraic aggregate (SURVEY.md §2.8's stretch item).
  *
  * Why not a window: `row_number().over(partitionBy(q).orderBy(score))`
  * shuffles and sorts EVERY candidate row per group before discarding all
  * but k. This Aggregator keeps a k-bounded buffer per group, combines
  * map-side, and ships only ≤ k rows per partition per group through the
  * shuffle — the difference between sorting |corpus| rows and merging
  * k-lists, which is what makes exact per-query top-k viable at corpus
  * scale.
  *
  * Determinism: ordered by (score desc, id asc) at every insert/merge, so
  * ties resolve identically to the window formulation.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)

    // buf is sorted best-first and never longer than k
    protected def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
      if (buf.length >= k && better(buf.last, x)) buf
      else {
        val i = buf.indexWhere(e => better(x, e))
        val withX = if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
        withX.take(k)
      }
    }

    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** [[TopKAggregator]] with id-dedup inside the k-bounded buffer.
    *
    * Contract: within a group, `score` must be a pure function of `id`
    * (every occurrence of an id carries the same score). That is exactly
    * the LSH candidate stream's shape — the same (neighbor, cosine) pair
    * arrives once per colliding table — and deduping at insert time makes
    * this aggregate equal to `distinct()`-then-[[TopKAggregator]] while
    * replacing the full candidate-pair dedup shuffle with the same ≤ k
    * rows/partition/group the plain aggregate ships. (Sketch of the
    * equivalence: a duplicate only collapses when its id is currently
    * held; an id absent from the buffer is absent because k strictly
    * better entries evicted or blocked it, and the duplicate — equal
    * score, equal id — is blocked by the same k entries.)
    */
  class TopKDistinctAggregator(k: Int) extends TopKAggregator(k) {
    override protected def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
      buf.find(_.id == x.id) match {
        case Some(held) =>
          // fail fast on contract violations instead of silently diverging
          // from distinct-then-TopK (a cheaper-scored duplicate would be
          // dropped even where its score should rank). O(1) per duplicate:
          // the buffer is ≤ k entries. Double.compare, not ==: a NaN score
          // (zero-norm embedding → cosine 0/0) re-arriving with NaN is the
          // contract HOLDING — `==` would see NaN != NaN and abort the job.
          require(java.lang.Double.compare(held.score, x.score) == 0,
            s"topKDistinct: id ${x.id} seen with scores ${held.score} and " +
              s"${x.score} — score must be a pure function of id within a group")
          buf
        case None => super.insert(buf, x)
      }
  }

  /** top-k per group: usage
    * `df.groupBy(g).agg(TopK.topK(3)(col("id"), col("score")).as("top"))`
    * — returns an array of (id, score) structs, best first. (udaf flattens
    * the Scored input type into one parameter per field.)
    */
  def topK(k: Int): (Column, Column) => Column = {
    implicit val enc: Encoder[Scored] = ExpressionEncoder[Scored]()
    val fn = udaf(new TopKAggregator(k))
    (id: Column, score: Column) => fn(id, score)
  }

  /** [[topK]] with duplicate-id collapse — see [[TopKDistinctAggregator]]
    * for the contract and the equivalence argument.
    */
  def topKDistinct(k: Int): (Column, Column) => Column = {
    implicit val enc: Encoder[Scored] = ExpressionEncoder[Scored]()
    val fn = udaf(new TopKDistinctAggregator(k))
    (id: Column, score: Column) => fn(id, score)
  }
}
