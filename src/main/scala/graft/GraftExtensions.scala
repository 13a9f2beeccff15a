package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.plans.{HashedShingles, Md5Hash64, MinHashSig, SimHash64, VecDot}

/** SparkSessionExtensions hook exposing the native kernels to SQL:
  *
  *   spark.sql.extensions = graft.GraftExtensions
  *
  *   SELECT vec_dot(a, b)              -- dot product, double
  *   SELECT simhash64(hash_array)     -- 64-bit simhash of array<long>
  *   SELECT minhash_sig(hash_array, k) -- k-long minhash signature
  *
  * The Scala API (graft.plans.NativeKernels, graft.functions.VectorOps)
  * does not require the extension — it builds the expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName, "hashed_shingles"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hashed_shingles(tokens, n): n must be an integer literal, got $other")
        }
        HashedShingles(children.head, n)
      }))

    ext.injectFunction((
      new FunctionIdentifier("md5_hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "md5_hash64"),
      (children: Seq[Expression]) => Md5Hash64(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig(hashes, k): k must be an integer literal, got $other")
        }
        val (a, b) = operators.Dedup.hashParams(k)
        MinHashSig(children.head, a, b)
      }))

    ext.injectFunction((
      new FunctionIdentifier("ahash64"),
      new ExpressionInfo(classOf[graft.plans.AHash64].getName, "ahash64"),
      (children: Seq[Expression]) => graft.plans.AHash64(children.head)))
  }
}
