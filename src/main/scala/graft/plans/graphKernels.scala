package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document graph kernels.
  *
  * [[TextRankTopK]] — the TextRank keyword extractor's whole per-document
  * computation (co-occurrence graph build, damped integer-grid PageRank
  * iterations, top-k selection) as one expression. The graph is PER
  * DOCUMENT and bounded by the document's token count, so the previous
  * DataFrame formulation — a positions self-join to build edges, then
  * `iters` × (join + keyed agg) = 2 shuffles per iteration over the
  * union-doubled edge table, then a ranking window — paid ~8 exchanges
  * for work that never crosses document boundaries (optimization guide
  * §2.4: remove shuffles outright; the 100 TB shape is embarrassingly
  * parallel over documents). This kernel replays that formulation's exact
  * integer/double spelling per document in one narrow codegen pass:
  *
  *  - edges: token pairs within `window` positions, both directions, self
  *    pairs dropped; wt = co-occurrence count, deg(src) = Σ wt.
  *  - ranks: rq₀ = 10⁹; per iteration, per edge (src→dst):
  *    contrib = ⌊rq_src · wt / deg_src + 0.5⌋ (exact long), then
  *    rq_dst = round((1−d)·10⁹) + ⌊d · Σ contrib + 0.5⌋ — the same two
  *    double-rounding steps the DataFrame form ran.
  *  - result: top `k` nodes by (rq desc, token asc — binary UTF8 order,
  *    matching the window's string sort) as array<struct<token, rq>>.
  */
object GraphKernels {

  def textrankTopK(tokens: Column, k: Int, window: Int, iters: Int,
                   damping: Double): Column =
    ColumnBridge.column(TextRankTopK(ColumnBridge.expression(tokens), k,
      window, iters, damping))
}

case class TextRankTopK(child: Expression, k: Int, window: Int, iters: Int,
                        damping: Double)
    extends UnaryExpression {
  require(k >= 1 && window >= 1 && iters >= 0, "k/window/iters out of range")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("rq", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "textrank_topk"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    TextRankTopK.compute(input.asInstanceOf[ArrayData], k, window, iters,
      damping)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextRankTopK.compute(" +
        s"$c, $k, $window, $iters, $damping);")

  override protected def withNewChildInternal(newChild: Expression): TextRankTopK =
    copy(child = newChild)
}

object TextRankTopK {
  private val Scale = 1000000000.0

  def compute(toks: ArrayData, k: Int, window: Int, iters: Int,
              damping: Double): GenericArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // intern tokens to dense ids
    val ids = new java.util.HashMap[UTF8String, Integer](n * 2)
    val dict = new java.util.ArrayList[UTF8String](n)
    val tid = new Array[Int](n)
    var p = 0
    while (p < n) {
      val t = toks.getUTF8String(p)
      var id = ids.get(t)
      if (id == null) {
        id = Integer.valueOf(dict.size()); ids.put(t, id); dict.add(t)
      }
      tid(p) = id.intValue()
      p += 1
    }
    val m = dict.size()
    // undirected co-occurrence counts, stored once per ordered (a, b) pair
    val wt = new java.util.HashMap[java.lang.Long, Array[Long]]()
    def bump(a: Int, b: Int): Unit = {
      val key = java.lang.Long.valueOf((a.toLong << 32) | (b.toLong & 0xffffffffL))
      val c = wt.get(key)
      if (c == null) wt.put(key, Array(1L)) else c(0) += 1L
    }
    p = 0
    while (p < n) {
      var o = 1
      while (o <= window && p + o < n) {
        val a = tid(p); val b = tid(p + o)
        if (a != b) { bump(a, b); bump(b, a) }
        o += 1
      }
      p += 1
    }
    if (wt.isEmpty) return new GenericArrayData(Array.empty[Any])
    // edge arrays + degrees
    val ne = wt.size()
    val eSrc = new Array[Int](ne)
    val eDst = new Array[Int](ne)
    val eWt = new Array[Long](ne)
    val deg = new Array[Long](m)
    var e = 0
    val it = wt.entrySet().iterator()
    while (it.hasNext) {
      val ent = it.next()
      val key = ent.getKey.longValue()
      val a = (key >>> 32).toInt
      val b = (key & 0xffffffffL).toInt
      eSrc(e) = a; eDst(e) = b; eWt(e) = ent.getValue()(0)
      deg(a) += ent.getValue()(0)
      e += 1
    }
    val base = math.round((1 - damping) * Scale) // the DataFrame lit, verbatim
    val rq = new Array[Long](m)
    var i = 0
    while (i < m) { rq(i) = 1000000000L; i += 1 }
    val acc = new Array[Long](m)
    var round = 0
    while (round < iters) {
      java.util.Arrays.fill(acc, 0L)
      e = 0
      while (e < ne) {
        val a = eSrc(e)
        // contrib = floor(rq_src(double) · wt / deg_src + 0.5), exact long —
        // the DataFrame spelling: cast(rq as double) * wt / deg
        acc(eDst(e)) += math.floor(
          rq(a).toDouble * eWt(e).toDouble / deg(a).toDouble + 0.5).toLong
        e += 1
      }
      i = 0
      while (i < m) {
        if (deg(i) > 0L)
          rq(i) = base + math.floor(damping * acc(i).toDouble + 0.5).toLong
        i += 1
      }
      round += 1
    }
    // top-k by (rq desc, token asc) over nodes that participate in an edge
    val nodes = (0 until m).filter(deg(_) > 0L)
      .sorted(Ordering.comparatorToOrdering(new java.util.Comparator[Int] {
        override def compare(x: Int, y: Int): Int = {
          val c = java.lang.Long.compare(rq(y), rq(x)) // rq desc
          if (c != 0) c else dict.get(x).compareTo(dict.get(y)) // token asc
        }
      }))
    new GenericArrayData(nodes.take(k).map { i =>
      new GenericInternalRow(Array[Any](dict.get(i), rq(i))): Any
    }.toArray)
  }
}
