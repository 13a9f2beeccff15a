package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the engine's hot per-row kernels.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * interpreted closure-by-closure — fine for occasional use, but the MinHash
  * signature evaluates k·|shingles| hash steps per row and the interpreted
  * form measured ~40× slower than a fused loop (21 s for 500 docs at
  * k=128). These expressions generate straight-line Java inside whole-stage
  * codegen (with an equivalent interpreted eval as fallback), which is the
  * idiomatic Spark escape hatch when built-ins can't express a kernel
  * efficiently.
  *
  * Numeric contracts (bit-exactness matters — the DuckDB oracle reproduces
  * them):
  *  - [[VecDot]] accumulates products left-to-right in double, identical to
  *    a sequential C loop and to `aggregate(zip_with(...))`.
  *  - [[MinHashSig]] uses h_i(x) = (a_i·x + b_i) mod (2³¹−1) over inputs
  *    pre-reduced into [0, p); all intermediates fit in a long.
  *  - [[SimHash64]] bit b = sign of Σ(±1) over token hashes' bit b, ties → 0.
  */
object NativeKernels {
  val P31: Long = 2147483647L // 2^31 - 1

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSig(hashes: Column, a: Array[Long], b: Array[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), a, b))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  def hashedShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(tokens), n))

  def gramHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(tokens), n))

  def allSubstrings(s: Column, maxLen: Int): Column =
    ColumnBridge.column(AllSubstrings(ColumnBridge.expression(s), maxLen))

  def md5Hash64(tokens: Column): Column =
    ColumnBridge.column(Md5Hash64(ColumnBridge.expression(tokens)))

  def quantDot(v: Column, weights: Array[Long], scale: Double): Column =
    ColumnBridge.column(QuantDot(ColumnBridge.expression(v), weights, scale))

  def aHash64(codes: Column): Column =
    ColumnBridge.column(AHash64(ColumnBridge.expression(codes)))

  def quantArgmin(v: Column, ids: Array[Int], weights: Array[Array[Long]],
                  sqrtNorms: Array[Double], scale: Double): Column =
    ColumnBridge.column(QuantArgmin(ColumnBridge.expression(v), ids, weights,
      sqrtNorms, scale))

  def quantTopLists(v: Column, ids: Array[Int], weights: Array[Array[Long]],
                    sqrtNorms: Array[Double], scale: Double,
                    nprobe: Int): Column =
    ColumnBridge.column(QuantTopLists(ColumnBridge.expression(v), ids,
      weights, sqrtNorms, scale, nprobe))
}

/** Dot product of two numeric arrays (float or double elements) as double.
  * Null if either array is null; elements are assumed non-null (embedding
  * vectors). Lengths must match — extra elements on the longer side are
  * ignored (min length), mirroring zip_with.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lDouble = elemIsDouble(left)
    val rDouble = elemIsDouble(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (rDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsDouble(left)) "getDouble" else "getFloat"
    val rGet = if (elemIsDouble(right)) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature of an array<long> of element hashes: for each of k
  * seeded linear permutations h_i(x) = (a_i·x + b_i) mod p, the min over
  * elements. Empty input yields the all-p signature (no nulls).
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.length == b.length, "a/b parameter arrays must have equal length")

  private val k = a.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(k)(NativeKernels.P31)
    var s = 0
    while (s < n) {
      var h = hs.getLong(s) % NativeKernels.P31
      if (h < 0) h += NativeKernels.P31
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % NativeKernels.P31
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val p = NativeKernels.P31
      s"""
         |int $n = $c.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${p}L);
         |for (int $s = 0; $s < $n; $s++) {
         |  long $h = $c.getLong($s) % ${p}L;
         |  if ($h < 0) $h += ${p}L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${p}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Distinct hashed n-gram shingles of a token array, fused into one pass:
  * for each window of n consecutive tokens, XXH64 (seed 42 — Spark's
  * xxhash64) over the UTF8 bytes of the space-joined n-gram; first-seen
  * distinct hashes in order. Bit-identical to
  * `array_distinct(transform(ngrams, s => xxhash64(concat_ws(" ", s))))`
  * but without the interpreted HOF tax (that chain re-evaluates split and
  * allocates a string per shingle; this copies token bytes into one
  * reusable buffer). Fewer than n tokens → empty array.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashedShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  /** Kernel shared by eval and codegen (codegen emits a call, so the loop is
    * one JIT-compiled method either way).
    */
  def compute(toks: ArrayData, n: Int): GenericArrayData =
    hashWindows(toks, n, dedup = true)

  /** One xxhash64 (seed 42) per n-token window over the space-joined gram
    * bytes; `dedup` keeps first-seen distinct hashes (the shingle-set form),
    * otherwise every position reports (the positioned-gram form). Public —
    * codegen calls it through the object's STATIC forwarder, which scalac
    * only emits for public members (a package-private kernel compiles here
    * but silently fails Janino at run time, dropping the stage to
    * interpreted eval).
    */
  def hashWindows(toks: ArrayData, n: Int,
                  dedup: Boolean): GenericArrayData = {
    val ntok = toks.numElements()
    if (ntok < n) return new GenericArrayData(Array.emptyLongArray)
    val tokens = new Array[org.apache.spark.unsafe.types.UTF8String](ntok)
    var i = 0
    while (i < ntok) {
      val t = toks.getUTF8String(i)
      tokens(i) = if (t == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    var buf = new Array[Byte](64)
    val seen = if (dedup) new java.util.HashSet[java.lang.Long]() else null
    val out = new Array[Long](ntok - n + 1)
    var m = 0
    var w = 0
    while (w <= ntok - n) {
      var len = n - 1 // separators
      var j = 0
      while (j < n) { len += tokens(w + j).numBytes(); j += 1 }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(off) = ' '; off += 1 }
        val t = tokens(w + j)
        t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen == null || seen.add(h)) { out(m) = h; m += 1 }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** Every substring of the input with 1..maxLen CHARACTERS (code points),
  * ordered by start position then length — bit-identical to
  * `flatten(transform(sequence(0, length(s)-1), i =>
  * transform(sequence(1, least(maxLen, length(s)-i)), n => substr(s, i+1,
  * n))))`, the unigram-tokenizer candidate generator, but fused: that
  * nested HOF re-inlines the child ~length×maxLen times (64 KB codegen
  * blowups on derived children) and evaluates interpreted. Null → null;
  * empty string → empty array.
  */
case class AllSubstrings(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen >= 1, "maxLen must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "all_substrings"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    AllSubstrings.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AllSubstrings.compute($c, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): AllSubstrings =
    copy(child = newChild)
}

object AllSubstrings {
  def compute(s: org.apache.spark.unsafe.types.UTF8String,
              maxLen: Int): GenericArrayData = {
    val nChars = s.numChars()
    if (nChars == 0)
      return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](
      nChars * maxLen)
    var i = 0
    while (i < nChars) {
      val top = math.min(maxLen, nChars - i)
      var n = 1
      while (n <= top) {
        // substringSQL is code-point-indexed, matching substr(s, i+1, n)
        out.add(s.substringSQL(i + 1, n))
        n += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Positioned n-token gram hashes: element i = xxhash64 of the space-joined
  * tokens [i, i+n) — [[HashedShingles]] WITHOUT the distinct filter, so the
  * output index IS the gram's start position (the span-dedup families join
  * on (pos, hash)). Bit-identical to
  * `transform(sequence(0, size(toks)-n), i => xxhash64(concat_ws(" ",
  * slice(toks, i+1, n))))` for null-free token arrays, but fused: the HOF
  * spelling is interpreted AND re-inlines the token-array child per
  * reference — a derived text column (e.g. an excerpt slice) gets its
  * expression tree duplicated into every subterm, which measurably grew one
  * probe's generated stage past Janino's 64 KB method limit and dropped the
  * whole stage to interpreted eval. Fewer than n tokens → empty array.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    HashedShingles.hashWindows(input.asInstanceOf[ArrayData], n, dedup = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashedShingles.hashWindows($c, $n, false);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** Engine-portable 64-bit md5 token hashes: array<string> → array<long>,
  * element i = the first 8 bytes of md5(token_i) read big-endian as a
  * signed long — bit-identical to recombining the first 16 hex chars of
  * the digest as two 32-bit halves (`('0x'||substr(md5(t),1,8))::BIGINT`
  * arithmetic in DuckDB, `conv(substring(md5(t),1,8),16,10)` in Spark
  * SQL). The fused loop computes ONE digest per token; the HOF spelling
  * (`transform(toks, t => conv(substring(md5(t),…)))`) is interpreted and
  * evaluates md5 per extracted half — measured ~3.7× slower end-to-end on
  * the simhash query. Null tokens hash as the empty string.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_hash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Hash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Md5Hash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64 =
    copy(child = newChild)
}

object Md5Hash64 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Kernel shared by eval and codegen (one JIT-compiled method either way). */
  def compute(toks: ArrayData): GenericArrayData = {
    val md = digests.get()
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      md.reset()
      val d = md.digest(if (t == null) Array.emptyByteArray else t.getBytes)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Quantized dot product against a constant long-grid vector: for input
  * array v (float or double elements) and constant weights w,
  * Σ_d floor(v_d · w_d · scale + 0.5) as an exact long, over
  * d < min(len(v), len(w)).
  *
  * This is the determinism primitive behind IVF assignment
  * ([[graft.operators.Ivf]]): every term is quantized to an integer BEFORE
  * the sum, so the result is independent of evaluation order and
  * reproducible bit-for-bit by a SQL engine
  * (`SUM(CAST(FLOOR(v * w * scale + 0.5) AS BIGINT))` in DuckDB — both
  * sides perform the same two correctly-rounded double multiplications on
  * exactly-representable inputs). A plain double-sum dot ([[VecDot]]) is
  * associative-order-dependent and NOT portable across engines for
  * argmin/argmax decisions near ties.
  */
case class QuantDot(child: Expression, weights: Array[Long], scale: Double)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_dot"

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), weights.length)
    val isD = elemIsDouble
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
      acc += math.floor(x * weights(i) * scale + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("quantDotW", weights, "long[]")
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $wRef.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor(
         |    ((double) $c.$get($i)) * ((double) $wRef[$i]) * $scale + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantDot =
    copy(child = newChild)
}

/** Fused argmax-cosine centroid assignment: for an embedding row, returns
  * ids(i) of the centroid maximizing score_i = quantDot_i / sqrtNorms(i)
  * (double division of the exact integer dot — bit-identical to the
  * [[QuantDot]]-per-centroid formulation), ties toward the LOWER centroid
  * id and doubles ordered by `java.lang.Double.compare` — exactly the
  * `array_min(array(struct(−score, cid)…))` semantics this replaces.
  *
  * Why a fused kernel and not the struct-array expression: that form
  * inlines one QuantDot loop + struct allocation PER CENTROID into a
  * single generated method, so its size grows with nlist and past a few
  * dozen centroids it blows the JIT/Janino budget and the whole projection
  * drops to interpreted eval — measured 200 s for an nlist=98 build that
  * this kernel does in ~8 s. Here nlist scales the REFERENCE ARRAYS, not
  * the generated code: one 2-D loop, whole-stage-codegen-friendly at any
  * nlist the driver can hold.
  */
case class QuantArgmin(child: Expression, ids: Array[Int],
                       weights: Array[Array[Long]], sqrtNorms: Array[Double],
                       scale: Double)
    extends UnaryExpression {

  require(ids.length == weights.length && ids.length == sqrtNorms.length &&
    ids.length > 0, "ids/weights/sqrtNorms must be same-length and non-empty")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_argmin"

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isD = elemIsDouble
    var bestNeg = 0.0
    var bestId = 0
    var c = 0
    while (c < weights.length) {
      val w = weights(c)
      val n = math.min(a.numElements(), w.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        acc += math.floor(x * w(i) * scale + 0.5).toLong
        i += 1
      }
      val neg = 0.0 - acc.toDouble / sqrtNorms(c)
      val cmp = java.lang.Double.compare(neg, bestNeg)
      if (c == 0 || cmp < 0 || (cmp == 0 && ids(c) < bestId)) {
        bestNeg = neg; bestId = ids(c)
      }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("quantArgminW", weights, "long[][]")
    val idRef = ctx.addReferenceObj("quantArgminIds", ids, "int[]")
    val nrmRef = ctx.addReferenceObj("quantArgminNorms", sqrtNorms, "double[]")
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val neg = ctx.freshName("neg")
      val cmp = ctx.freshName("cmp")
      val bestNeg = ctx.freshName("bestNeg")
      val bestId = ctx.freshName("bestId")
      s"""
         |double $bestNeg = 0.0;
         |int $bestId = 0;
         |for (int $c = 0; $c < $wRef.length; $c++) {
         |  long[] $w = $wRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $w.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) java.lang.Math.floor(
         |      ((double) $v.$get($i)) * ((double) $w[$i]) * $scale + 0.5);
         |  }
         |  double $neg = 0.0 - ((double) $acc) / $nrmRef[$c];
         |  int $cmp = java.lang.Double.compare($neg, $bestNeg);
         |  if ($c == 0 || $cmp < 0 || ($cmp == 0 && $idRef[$c] < $bestId)) {
         |    $bestNeg = $neg; $bestId = $idRef[$c];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantArgmin =
    copy(child = newChild)
}

/** Fused top-`nprobe` probe-list selection: [[QuantArgmin]]'s sibling for
  * the query side. Scores every centroid exactly as QuantArgmin does
  * (negscore = −quantDot/sqrtNorm, `java.lang.Double.compare` ordering,
  * ties toward the lower cid) and returns the best `nprobe` as
  * `array<struct<cid:int, baseq:long>>` in rank order — `baseq` is the
  * exact integer q·c dot the composite layouts' ADC ranking needs as its
  * base term. Replaces `slice(array_sort(array(struct…)), 1, nprobe)`,
  * which inlines one loop per centroid and falls off codegen past a few
  * dozen centroids (the [[QuantArgmin]] scaladoc's cliff, on the probe
  * path). Selection is a bounded insertion (O(nlist·nprobe) compares),
  * so nlist scales only the reference arrays.
  *
  * Codegen note: the kernel body lives in [[topLists]] and the generated
  * code calls it through a reference object — one virtual call per row
  * keeps the projection inside whole-stage codegen with generated-code
  * size independent of nlist (the idiomatic escape for expressions whose
  * inline form would grow with model size).
  */
case class QuantTopLists(child: Expression, ids: Array[Int],
                         weights: Array[Array[Long]],
                         sqrtNorms: Array[Double], scale: Double, nprobe: Int)
    extends UnaryExpression {

  require(ids.length == weights.length && ids.length == sqrtNorms.length &&
    ids.length > 0, "ids/weights/sqrtNorms must be same-length and non-empty")
  require(nprobe > 0, "nprobe must be > 0")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("baseq", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_top_lists"

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double>, got ${other.sql}")
    }

  /** The whole kernel, shared verbatim by interpreted eval and codegen. */
  def topLists(a: ArrayData): ArrayData = {
    val isD = elemIsDouble
    val m = math.min(nprobe, weights.length)
    val negs = new Array[Double](m)
    val cids = new Array[Int](m)
    val bases = new Array[Long](m)
    var filled = 0
    var c = 0
    while (c < weights.length) {
      val w = weights(c)
      val n = math.min(a.numElements(), w.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        acc += math.floor(x * w(i) * scale + 0.5).toLong
        i += 1
      }
      val neg = 0.0 - acc.toDouble / sqrtNorms(c)
      val cid = ids(c)
      var pos = filled
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(neg, negs(pos - 1))
        cmp < 0 || (cmp == 0 && cid < cids(pos - 1))
      }) pos -= 1
      if (pos < m) {
        var j = math.min(filled, m - 1)
        while (j > pos) {
          negs(j) = negs(j - 1); cids(j) = cids(j - 1); bases(j) = bases(j - 1)
          j -= 1
        }
        negs(pos) = neg; cids(pos) = cid; bases(pos) = acc
        if (filled < m) filled += 1
      }
      c += 1
    }
    val rows = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      rows(r) = InternalRow(cids(r), bases(r))
      r += 1
    }
    new GenericArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any =
    topLists(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("quantTopLists", this,
      classOf[QuantTopLists].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $self.topLists($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantTopLists =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<long> of token hashes: bit b is set iff the
  * sum over tokens of ±1 (by the token hash's bit b) is positive.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var s = 0
    while (s < n) {
      val h = hs.getLong(s)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      s += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[64];
         |for (int $s = 0; $s < $n; $s++) {
         |  long $h = $c.getLong($s);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $counts[$i] += (((($h >>> $i) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 64-bit perceptual average-hash of a byte-code array (array<long>):
  * block c covers positions [⌊c·n/64⌋, ⌊(c+1)·n/64⌋); bit c is set iff
  * blockSum·n > total·blockLen (integer cross-multiplication — the mean
  * comparison without division). One fused O(n) pass; the higher-order
  * formulation (64 interpreted slice-aggregates, no subexpression
  * elimination) measured ~20× slower on the sf0.1 corpus. Block bounds
  * use integer division, which equals the SQL twin's FLOOR(c·n/64.0)
  * exactly (c·n ≪ 2⁵³). Bit parity with the HOF reference is asserted in
  * NativeKernelsSpec.
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ahash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<bigint>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sums = new Array[Long](64)
    var total = 0L
    var c = 0
    while (c < 64) {
      val from = (c.toLong * n / 64).toInt
      val to = ((c + 1).toLong * n / 64).toInt
      var s = 0L
      var i = from
      while (i < to) { s += a.getLong(i); i += 1 }
      sums(c) = s
      total += s
      c += 1
    }
    var hash = 0L
    c = 0
    while (c < 64) {
      val from = (c.toLong * n / 64).toInt
      val to = ((c + 1).toLong * n / 64).toInt
      if (sums(c) * n > total * (to - from)) hash |= (1L << c)
      c += 1
    }
    hash
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val total = ctx.freshName("total")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val from = ctx.freshName("from")
      val to = ctx.freshName("to")
      val hash = ctx.freshName("hash")
      s"""
         |int $n = $a.numElements();
         |long[] $sums = new long[64];
         |long $total = 0L;
         |for (int $c = 0; $c < 64; $c++) {
         |  int $from = (int) (((long) $c) * $n / 64);
         |  int $to = (int) (((long) ($c + 1)) * $n / 64);
         |  long $s = 0L;
         |  for (int $i = $from; $i < $to; $i++) { $s += $a.getLong($i); }
         |  $sums[$c] = $s;
         |  $total += $s;
         |}
         |long $hash = 0L;
         |for (int $c = 0; $c < 64; $c++) {
         |  int $from = (int) (((long) $c) * $n / 64);
         |  int $to = (int) (((long) ($c + 1)) * $n / 64);
         |  if ($sums[$c] * $n > $total * ($to - $from)) $hash |= (1L << $c);
         |}
         |${ev.value} = $hash;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}
