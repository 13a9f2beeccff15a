package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. The dot-product
  * kernel is the native codegen expression [[graft.plans.VecDot]]; its
  * accumulation is left-associative ascending-index in double, which makes
  * results bit-identical to a sequential C loop, to the equivalent
  * `aggregate(zip_with(...))` fold, and to the DuckDB oracle's generated
  * term chains.
  */
object VectorOps {

  /** array<float> → array<double>, exact widening. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product in double (float inputs widened exactly per element). */
  def dot(a: Column, b: Column): Column = graft.plans.NativeKernels.vecDot(a, b)

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
