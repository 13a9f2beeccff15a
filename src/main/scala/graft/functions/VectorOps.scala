package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions. All folds are left-associative ascending-index,
  * which makes results bit-identical to a sequential C loop (and to the
  * DuckDB oracle's generated term chains).
  *
  * Floats are widened to double before any arithmetic: float×float would
  * accumulate error engine-dependently, double ops are IEEE-exact and
  * portable.
  */
object VectorOps {

  /** array<float> → array<double>, exact widening. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product: fold of zip_with products, left-assoc from 0.0. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either norm is 0 (division yields NaN →
    * guarded to null for stable cross-engine compare).
    */
  def cosine(a: Column, b: Column): Column = {
    val c = dot(a, b) / (norm(a) * norm(b))
    when(norm(a) === 0.0 || norm(b) === 0.0, lit(null)).otherwise(c)
  }
}
