package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-word tokenizer kernels — the subword families' hot loops as
  * single whole-row expressions over a DRIVER-COLLECTED vocabulary.
  *
  * Why: [[graft.operators.Unigram]]'s Viterbi ran as `maxWordLen` chained
  * keyed argmax steps (12 checkpointed shuffle rounds per call), its
  * backtrace as 12 more frontier joins, the soft-EM lattice as 12 frontier
  * expansions, and [[graft.operators.Wordpiece]]'s greedy matcher as 12
  * join+agg rounds — each round a full job with its own exchange and eager
  * localCheckpoint. The vocabulary those rounds join against is BOUNDED BY
  * CONSTRUCTION (every single character of the corpus alphabet plus
  * `topMulti ≤ 60` multi-char pieces — the same driver-size class as the
  * IVF quantizer and the BPE merge table, both already collected), so the
  * whole DP fits a per-row kernel: one narrow codegen pass over DISTINCT
  * words replaces ~12 shuffles + ~12 driver actions per call
  * (optimization guide §1.2 step 1 / §2.4 — remove shuffles outright).
  *
  * Bit-exactness contracts (each kernel replays its DataFrame predecessor's
  * integer/double spelling exactly; the DuckDB twins and UnigramSpec /
  * WordpieceSpec parity suites gate them):
  *  - [[UnigramViterbiStats]] / [[UnigramViterbiPieces]]: state(j) = best
  *    (sq desc, split i asc) over i ∈ [j−maxPiece, j) with word[i..j) in
  *    the vocab; all scores exact longs.
  *  - [[UnigramSoftUsage]]: full path enumeration, per-path integer
  *    log-weights, r = ⌊exp((lw−max)/10⁹)·10⁹ + 0.5⌋, Z = Σr,
  *    e = (n·10⁵ + Z div 2) div Z — the emRoundSoft grid math verbatim.
  *  - [[WordpieceGreedy]]: longest-match-first over (position-kind, core)
  *    with `##` continuations — BERT's WordpieceTokenizer loop.
  *
  * Substrings are code-point-indexed (`UTF8String.substringSQL`), matching
  * the `substr` spelling the DataFrame forms used.
  */
object TokenizerKernels {

  def unigramViterbiStats(word: Column, pieces: Array[String],
                          scores: Array[Long], maxPiece: Int,
                          maxWordLen: Int): Column =
    ColumnBridge.column(UnigramViterbiStats(ColumnBridge.expression(word),
      pieces, scores, maxPiece, maxWordLen))

  def unigramViterbiPieces(word: Column, pieces: Array[String],
                           scores: Array[Long], maxPiece: Int,
                           maxWordLen: Int): Column =
    ColumnBridge.column(UnigramViterbiPieces(ColumnBridge.expression(word),
      pieces, scores, maxPiece, maxWordLen))

  def unigramSoftUsage(word: Column, pieces: Array[String],
                       scores: Array[Long], maxPiece: Int,
                       maxWordLen: Int): Column =
    ColumnBridge.column(UnigramSoftUsage(ColumnBridge.expression(word),
      pieces, scores, maxPiece, maxWordLen))

  def wordpieceGreedy(word: Column, cores: Array[String],
                      isCont: Array[Boolean], maxPiece: Int,
                      maxWordLen: Int): Column =
    ColumnBridge.column(WordpieceGreedy(ColumnBridge.expression(word),
      cores, isCont, maxPiece, maxWordLen))

  def tokenBigramFeats(text: Column): Column =
    ColumnBridge.column(TokenBigramFeats(ColumnBridge.expression(text)))

  def bigramsOnly(text: Column): Column =
    ColumnBridge.column(TokenBigramFeats(ColumnBridge.expression(text),
      bigramsOnly = true))

  def removeTokenPositions(text: Column, positions: Column): Column =
    ColumnBridge.column(RemoveTokenPositions(
      ColumnBridge.expression(text), ColumnBridge.expression(positions)))

  private[plans] def buildVocabMap(pieces: Array[String], scores: Array[Long])
      : java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(UTF8String.fromString(pieces(i)), scores(i))
      i += 1
    }
    m
  }

  private[plans] def missingCharError(c: UTF8String): RuntimeException =
    new IllegalArgumentException(
      s"words contain characters missing from the vocabulary: '$c' — was " +
        "the vocab trained on this corpus? (segmentation would silently " +
        "drop those words)")

  private[plans] def overlongError(n: Int, maxWordLen: Int): RuntimeException =
    new IllegalArgumentException(
      s"longest word has $n chars > maxWordLen=$maxWordLen — raise it or " +
        "normalize the corpus")

  /** Shared Viterbi DP: fills sq/np/bi for prefixes 1..n; throws loudly on
    * an unreachable prefix (a character missing from the vocabulary) or an
    * overlong word — the same contracts the chained-join form enforced via
    * its driver-side guards, kept here as defense in depth.
    */
  private[plans] def viterbi(w: UTF8String,
                             vocab: java.util.HashMap[UTF8String, java.lang.Long],
                             maxPiece: Int, maxWordLen: Int)
      : (Array[Long], Array[Long], Array[Int]) = {
    val n = w.numChars()
    if (n > maxWordLen) throw overlongError(n, maxWordLen)
    val sq = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    val bi = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var found = false
      var bs = 0L; var bn = 0L; var bb = -1
      var i = math.max(0, j - maxPiece)
      while (i < j) {
        val s = vocab.get(w.substringSQL(i + 1, j - i))
        if (s != null) {
          val cand = sq(i) + s.longValue()
          // strict >: ties keep the SMALLEST split point i (the max_by
          // (sq, -i) law of the chained-argmax form)
          if (!found || cand > bs) { found = true; bs = cand; bn = np(i) + 1; bb = i }
        }
        i += 1
      }
      if (!found) throw missingCharError(w.substringSQL(j, 1))
      sq(j) = bs; np(j) = bn; bi(j) = bb
      j += 1
    }
    (sq, np, bi)
  }
}

/** The unigram+bigram feature array of one document in ONE string pass:
  * `split(text, " ", -1)` tokens followed by their adjacent bigrams
  * ("tok[i] tok[i+1]") — bit-identical to
  * `concat(split(text, " "), transform(sequence(0, n−2), i =>
  * concat_ws(" ", slice(toks, i+1, 2))))`, the [[graft.operators.Embed]] /
  * dsir feature spelling, but fused: that form re-evaluates the `split`
  * child per reference inside the generator and builds each bigram through
  * interpreted transform/slice/concat_ws closures. With `bigramsOnly` it
  * emits just the bigrams ([[graft.operators.TextAnalysis.bigrams]]'
  * spelling: fewer than 2 tokens → empty array). The split mirrors Java's
  * `split(" ", -1)`: single-space separator, empties preserved everywhere,
  * empty input → one empty token.
  */
case class TokenBigramFeats(child: Expression, bigramsOnly: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (bigramsOnly) "bigram_feats" else "token_bigram_feats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenBigramFeats.compute(input.asInstanceOf[UTF8String], bigramsOnly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenBigramFeats.compute($c, $bigramsOnly);")

  override protected def withNewChildInternal(newChild: Expression): TokenBigramFeats =
    copy(child = newChild)
}

object TokenBigramFeats {
  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String, bigramsOnly: Boolean): GenericArrayData = {
    // UTF8String.split with a one-char non-regex-special pattern matches
    // Spark's StringSplit(" ", -1): empties kept, empty input → [""]
    val toks = text.split(Space, -1)
    val n = toks.length
    val nBi = math.max(0, n - 1)
    val out = new Array[Any](if (bigramsOnly) nBi else n + nBi)
    var i = 0
    if (!bigramsOnly) {
      while (i < n) { out(i) = toks(i); i += 1 }
    }
    val base = if (bigramsOnly) 0 else n
    i = 0
    while (i < nBi) {
      out(base + i) = UTF8String.concat(toks(i), Space, toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The span-cut text rebuild of one document in ONE pass: split the text
  * on single spaces (empties preserved — the positions the span tables
  * were built from), drop the token positions listed in `positions`
  * (array<int>, any order, duplicates/out-of-range ignored), re-join the
  * survivors with single spaces — bit-identical to the
  * posexplode → anti-join → per-doc `array_sort(collect_list(struct(p,
  * token)))` → `array_join` reconstruct the strip operators ran, because
  * the rebuild preserves position order and a doc whose every position is
  * cut yields "". Callers pass only TOUCHED documents (an untouched doc's
  * space-rejoined tokens equal its original text verbatim, so it passes
  * through with no work at all).
  */
case class RemoveTokenPositions(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "remove_token_positions"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (string, array<int>), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(text: Any, positions: Any): Any =
    RemoveTokenPositions.compute(text.asInstanceOf[UTF8String],
      positions.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.plans.RemoveTokenPositions.compute($t, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveTokenPositions =
    copy(left = newLeft, right = newRight)
}

object RemoveTokenPositions {
  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String,
              positions: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val toks = text.split(Space, -1)
    val drop = new java.util.HashSet[Integer](positions.numElements() * 2)
    var i = 0
    while (i < positions.numElements()) {
      drop.add(Integer.valueOf(positions.getInt(i))); i += 1
    }
    val keep = new java.util.ArrayList[UTF8String](toks.length)
    i = 0
    while (i < toks.length) {
      if (!drop.contains(Integer.valueOf(i))) keep.add(toks(i))
      i += 1
    }
    UTF8String.concatWs(Space, keep.toArray(new Array[UTF8String](keep.size())): _*)
  }
}

/** Maximum-likelihood unigram segmentation statistics of one word:
  * struct<n_pieces: long, score_q: long> — the [[graft.operators.Unigram]]
  * Viterbi DP fused into one expression (see [[TokenizerKernels]]).
  */
case class UnigramViterbiStats(child: Expression, pieces: Array[String],
                               scores: Array[Long], maxPiece: Int,
                               maxWordLen: Int)
    extends UnaryExpression {
  require(pieces.length == scores.length, "pieces/scores must be same-length")
  require(maxPiece >= 1 && maxWordLen >= 0, "maxPiece/maxWordLen out of range")

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("score_q", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_viterbi_stats"

  @transient private lazy val vocab =
    TokenizerKernels.buildVocabMap(pieces, scores)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UnigramViterbiStats.compute(input.asInstanceOf[UTF8String], vocab,
      maxPiece, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnigramViterbiStats.compute(" +
        s"$c, $vRef, $maxPiece, $maxWordLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbiStats =
    copy(child = newChild)
}

object UnigramViterbiStats {
  def compute(w: UTF8String,
              vocab: java.util.HashMap[UTF8String, java.lang.Long],
              maxPiece: Int, maxWordLen: Int): InternalRow = {
    val n = w.numChars()
    if (n == 0) return new GenericInternalRow(Array[Any](0L, 0L))
    val (sq, np, _) = TokenizerKernels.viterbi(w, vocab, maxPiece, maxWordLen)
    new GenericInternalRow(Array[Any](np(n), sq(n)))
  }
}

/** The Viterbi-best segmentation PATH of one word as array<string> with
  * multiplicity (backtrace order) — [[graft.operators.Unigram.segmentPieces]]'
  * per-word rows fused into one expression.
  */
case class UnigramViterbiPieces(child: Expression, pieces: Array[String],
                                scores: Array[Long], maxPiece: Int,
                                maxWordLen: Int)
    extends UnaryExpression {
  require(pieces.length == scores.length, "pieces/scores must be same-length")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_viterbi_pieces"

  @transient private lazy val vocab =
    TokenizerKernels.buildVocabMap(pieces, scores)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UnigramViterbiPieces.compute(input.asInstanceOf[UTF8String], vocab,
      maxPiece, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnigramViterbiPieces.compute(" +
        s"$c, $vRef, $maxPiece, $maxWordLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbiPieces =
    copy(child = newChild)
}

object UnigramViterbiPieces {
  def compute(w: UTF8String,
              vocab: java.util.HashMap[UTF8String, java.lang.Long],
              maxPiece: Int, maxWordLen: Int): GenericArrayData = {
    val n = w.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val (_, _, bi) = TokenizerKernels.viterbi(w, vocab, maxPiece, maxWordLen)
    val out = new java.util.ArrayList[UTF8String](n)
    var j = n
    while (j > 0) {
      val i = bi(j)
      out.add(w.substringSQL(i + 1, j - i))
      j = i
    }
    new GenericArrayData(out.toArray)
  }
}

/** Soft-EM expected piece usage of one word on the 1e-5 integer grid:
  * array<struct<piece: string, e: long>> over the word's DISTINCT pieces —
  * [[graft.operators.Unigram.emRoundSoft]]'s bounded-lattice path
  * enumeration fused into one expression. Entries sorted by piece bytes
  * (order is irrelevant downstream — the consumer explodes and re-keys —
  * but sorting keeps the row content run-stable).
  */
case class UnigramSoftUsage(child: Expression, pieces: Array[String],
                            scores: Array[Long], maxPiece: Int,
                            maxWordLen: Int)
    extends UnaryExpression {
  require(pieces.length == scores.length, "pieces/scores must be same-length")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("e", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_soft_usage"

  @transient private lazy val vocab =
    TokenizerKernels.buildVocabMap(pieces, scores)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UnigramSoftUsage.compute(input.asInstanceOf[UTF8String], vocab,
      maxPiece, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnigramSoftUsage.compute(" +
        s"$c, $vRef, $maxPiece, $maxWordLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSoftUsage =
    copy(child = newChild)
}

object UnigramSoftUsage {
  def compute(w: UTF8String,
              vocab: java.util.HashMap[UTF8String, java.lang.Long],
              maxPiece: Int, maxWordLen: Int): GenericArrayData = {
    val n = w.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n > maxWordLen) throw TokenizerKernels.overlongError(n, maxWordLen)
    // local piece dictionary: id per distinct piece of this word
    val ids = new java.util.HashMap[UTF8String, Integer]()
    val dict = new java.util.ArrayList[UTF8String]()
    // enumerate every complete path: per path the integer log-weight and
    // its piece-id list (with multiplicity)
    val lws = new java.util.ArrayList[java.lang.Long]()
    val paths = new java.util.ArrayList[Array[Int]]()
    val cur = new Array[Int](n) // at most n pieces per path
    def dfs(pos: Int, lw: Long, depth: Int): Unit = {
      if (pos == n) {
        lws.add(lw)
        paths.add(java.util.Arrays.copyOf(cur, depth))
        return
      }
      val top = math.min(maxPiece, n - pos)
      var l = 1
      while (l <= top) {
        val piece = w.substringSQL(pos + 1, l)
        val s = vocab.get(piece)
        if (s != null) {
          var id = ids.get(piece)
          if (id == null) {
            id = Integer.valueOf(dict.size()); ids.put(piece, id); dict.add(piece)
          }
          cur(depth) = id.intValue()
          dfs(pos + l, lw + s.longValue(), depth + 1)
        }
        l += 1
      }
    }
    dfs(0, 0L, 0)
    if (paths.isEmpty) throw TokenizerKernels.missingCharError(w.substringSQL(1, 1))
    // m = max path log-weight; r per path on the 1e-9 grid; Z = Σ r
    var m = Long.MinValue
    var p = 0
    while (p < lws.size()) { m = math.max(m, lws.get(p).longValue()); p += 1 }
    val nAcc = new Array[Long](dict.size())
    var z = 0L
    p = 0
    while (p < paths.size()) {
      val r = math.floor(
        math.exp((lws.get(p).longValue() - m).toDouble / 1000000000.0)
          * 1000000000.0 + 0.5).toLong
      z += r
      val ps = paths.get(p)
      var q = 0
      while (q < ps.length) { nAcc(ps(q)) += r; q += 1 }
      p += 1
    }
    // e = (n·10⁵ + Z div 2) div Z — exact long division, positive operands
    val order = (0 until dict.size()).sortBy(dict.get)(
      Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[UTF8String]()))
    new GenericArrayData(order.map { d =>
      new GenericInternalRow(
        Array[Any](dict.get(d), (nAcc(d) * 100000L + z / 2) / z)): Any
    }.toArray)
  }
}

/** Greedy longest-match-first WordPiece segmentation of one word:
  * struct<n_pieces: long, seg: string> (`##`-prefixed continuations,
  * space-joined) — [[graft.operators.Wordpiece.segmentWords]]' chained
  * join rounds fused into one expression. Empty word → (0, "").
  */
case class WordpieceGreedy(child: Expression, cores: Array[String],
                           isCont: Array[Boolean], maxPiece: Int,
                           maxWordLen: Int)
    extends UnaryExpression {
  require(cores.length == isCont.length, "cores/isCont must be same-length")

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("seg", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_greedy"

  @transient private lazy val sets: (java.util.HashSet[UTF8String], java.util.HashSet[UTF8String]) = {
    val init = new java.util.HashSet[UTF8String]()
    val cont = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < cores.length) {
      (if (isCont(i)) cont else init).add(UTF8String.fromString(cores(i)))
      i += 1
    }
    (init, cont)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    WordpieceGreedy.compute(input.asInstanceOf[UTF8String], sets._1, sets._2,
      maxPiece, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val iRef = ctx.addReferenceObj("wpInitial", sets._1, "java.util.HashSet")
    val cRef = ctx.addReferenceObj("wpCont", sets._2, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordpieceGreedy.compute(" +
        s"$c, $iRef, $cRef, $maxPiece, $maxWordLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceGreedy =
    copy(child = newChild)
}

object WordpieceGreedy {
  def compute(w: UTF8String, initial: java.util.HashSet[UTF8String],
              cont: java.util.HashSet[UTF8String], maxPiece: Int,
              maxWordLen: Int): InternalRow = {
    val n = w.numChars()
    if (n > maxWordLen) throw TokenizerKernels.overlongError(n, maxWordLen)
    val sb = new java.lang.StringBuilder(n + 8)
    var np = 0L
    var pos = 0 // 0-based char position
    while (pos < n) {
      val set = if (pos == 0) initial else cont
      val top = math.min(maxPiece, n - pos)
      var bl = 0
      var l = top
      while (l >= 1 && bl == 0) {
        if (set.contains(w.substringSQL(pos + 1, l))) bl = l
        l -= 1
      }
      if (bl == 0)
        throw TokenizerKernels.missingCharError(w.substringSQL(pos + 1, 1))
      if (np > 0L) sb.append(' ')
      if (pos > 0) sb.append("##")
      sb.append(w.substringSQL(pos + 1, bl).toString)
      np += 1L
      pos += bl
    }
    new GenericInternalRow(Array[Any](np, UTF8String.fromString(sb.toString)))
  }
}
