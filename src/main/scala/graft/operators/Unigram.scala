package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer — the OTHER major subword family next to [[Bpe]]
  * (SentencePiece's default; Kudo 2018). Where BPE composes greedily from
  * learned merges, unigram scores every candidate piece independently and
  * segments each word by the maximum-likelihood decomposition (Viterbi).
  *
  * Training follows Kudo's two-phase shape: [[trainVocab]] is the
  * frequency-initialization (his seed vocabulary IS substring frequency)
  * and [[emRound]] is a prune round — hard-EM (Viterbi counts) rather
  * than forward-backward expectations, the declared simplification that
  * keeps every quantity an exact integer. Seeding: candidate pieces are
  * all substrings of
  * length ≤ [[MaxPiece]] over the corpus word-frequency table, the kept
  * vocabulary is every single character (segmentability guarantee) plus
  * the top-`topMulti` multi-char pieces by (count desc, piece asc), and
  * each piece scores ln(count / total-kept-count) quantized to the 1e-9
  * integer grid — [[TextAnalysis.lmScore]]'s determinism trick, so
  * Viterbi's argmax (and therefore every segmentation) replays
  * bit-for-bit in DuckDB.
  *
  * Scale design (the [[Bpe]] discipline throughout): the piece table is
  * one explode + partial agg over DISTINCT words (vocab-bounded, never
  * per-occurrence); the vocabulary is DRIVER-BOUNDED BY CONSTRUCTION
  * (every single corpus character + topMulti ≤ 60 multis — the same size
  * class as the IVF quantizer and the BPE merge table, both collected),
  * so segmentation runs once per distinct word as ONE fused codegen
  * kernel over the collected vocab
  * ([[graft.plans.TokenizerKernels]] — replacing the previous
  * `maxWordLen` chained keyed argmax steps: 12 checkpointed shuffle
  * rounds per call, measured 4.8 s/query at sf0.1, became one narrow
  * pass); documents then pay one word-level join — segmentation cost is
  * per distinct word, token counting per occurrence.
  */
object Unigram {

  /** Longest candidate piece, in characters. */
  val MaxPiece = 4

  /** All substrings of `w` with length 1..[[MaxPiece]], one row each
    * (positions × lengths, flattened) — the candidate generator; the fused
    * [[graft.plans.AllSubstrings]] kernel (the nested-HOF spelling
    * re-inlined `w` per subterm and blew the probe corpus' generated
    * explode stage past Janino's 64 KB limit).
    */
  private def allPieces(w: Column): Column =
    graft.plans.NativeKernels.allSubstrings(w, MaxPiece)

  /** Unigram vocabulary over the corpus: (piece, cnt, score_q) — every
    * single character plus the `topMulti` heaviest multi-char substrings,
    * scored ln(cnt/total) on the 1e-9 long grid. `cnt` weights each
    * substring occurrence by its word's corpus frequency.
    */
  def trainVocab(documents: DataFrame, topMulti: Int = 60): DataFrame = {
    val wf = Bpe.wordFreqs(documents)
    val counts = wf
      .select(col("freq"), explode(allPieces(col("word"))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val singles = counts.filter(length(col("piece")) === 1)
    val multis = counts.filter(length(col("piece")) > 1)
      .orderBy(desc("cnt"), col("piece")).limit(topMulti)
    val kept = singles.unionByName(multis)
    val total = kept.agg(sum("cnt")).first().getLong(0)
    kept.withColumn("score_q",
      floor(log(col("cnt").cast("double") / total) * 1000000000.0 + 0.5)
        .cast("long"))
  }

  /** Collect the bounded vocabulary to driver arrays — the quantizer-
    * collect discipline: the table is every single corpus character +
    * ≤ topMulti multis by construction, the same driver-size class as the
    * IVF centroid and BPE merge tables. One bounded collect per call.
    */
  private def vocabArrays(vocab: DataFrame): (Array[String], Array[Long]) = {
    val rows = vocab.select(col("piece"), col("score_q")).collect()
    (rows.map(_.getString(0)), rows.map(_.getLong(1)))
  }

  /** Single characters among the collected pieces — code-point semantics,
    * matching `length(piece) === 1` on the DataFrame side.
    */
  private def singleChars(pieces: Array[String]): Array[String] =
    pieces.filter(p => p.nonEmpty && p.codePointCount(0, p.length) == 1)

  /** BOTH contract guards in ONE driver action (the [[Wordpiece]]
    * discipline): the max-word-length scan and the missing-character probe
    * — a character absent from the vocabulary would previously strand its
    * word in the DP's inner joins and silently drop it from every
    * downstream count; the fused kernels throw instead, but the guard
    * keeps the failure at the call site with the bounded example list.
    * Returns the longest word length (0 when `words` is empty).
    */
  private def guard(ws: DataFrame, pieces: Array[String],
                    maxWordLen: Int): Int = {
    val singles = singleChars(pieces).toSeq
    val guardRows = ws
      .agg(max(length(col("word"))).cast("int").as("maxlen"),
        lit(null).cast("string").as("miss"))
      .unionByName(ws
        .select(explode(
          graft.plans.NativeKernels.allSubstrings(col("word"), 1)).as("piece"))
        .distinct()
        .filter(if (singles.isEmpty) lit(true)
          else !col("piece").isin(singles: _*))
        .limit(5)
        .select(lit(null).cast("int").as("maxlen"), col("piece").as("miss")))
      .collect()
    val actualMax = guardRows.iterator
      .filterNot(_.isNullAt(0)).map(_.getInt(0)).nextOption().getOrElse(0)
    require(actualMax <= maxWordLen,
      s"longest word has $actualMax chars > maxWordLen=$maxWordLen — " +
        "raise it or normalize the corpus")
    val missing = guardRows.iterator
      .filterNot(_.isNullAt(1)).map(_.getString(1)).toSeq
    require(missing.isEmpty,
      s"words contain characters missing from the vocabulary: " +
        s"${missing.mkString("'", "', '", "'")} — was the vocab trained on " +
        "this corpus? (segmentation would silently drop those words)")
    actualMax
  }

  /** Maximum-likelihood segmentation of every distinct word — Viterbi with
    * state(j) = the best quantized score over decompositions of the word's
    * first j characters, ties broken toward the LONGER final piece
    * (smaller split point), which is a total order because the split point
    * determines the candidate. Returns (word, n_pieces, score_q). Runs as
    * ONE fused per-word kernel over the driver-collected vocabulary
    * ([[graft.plans.UnigramViterbiStats]]) — same DP, same tie law,
    * formerly `maxWordLen` chained keyed argmax rounds. Requires every
    * word ≤ `maxWordLen` chars (the corpus-normalization contract —
    * SentencePiece's max_sentencepiece_length plays the same role) and
    * every character in the vocabulary (guaranteed when `vocab` was
    * trained on the same corpus).
    */
  def segmentWords(words: DataFrame, vocab: DataFrame,
                   maxWordLen: Int = 12,
                   scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val (ps, ss) = vocabArrays(vocab)
    // persisted: feeds the guard job AND the result pass
    val ws = scope.persist(words.select("word").distinct())
    guard(ws, ps, maxWordLen)
    ws.filter(length(col("word")) > 0)
      .select(col("word"),
        graft.plans.TokenizerKernels.unigramViterbiStats(col("word"), ps, ss,
          MaxPiece, maxWordLen).as("st"))
      .select(col("word"), col("st.n_pieces").as("n_pieces"),
        col("st.score_q").as("score_q"))
  }

  /** The Viterbi-best segmentation PATH of every distinct word, one row per
    * used piece WITH multiplicity: (word, piece) — the fused-kernel form of
    * the DP + backpointer backtrace ([[graft.plans.UnigramViterbiPieces]]).
    */
  def segmentPieces(words: DataFrame, vocab: DataFrame,
                    maxWordLen: Int = 12,
                    scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val (ps, ss) = vocabArrays(vocab)
    val ws = scope.persist(words.select("word").distinct())
    guard(ws, ps, maxWordLen)
    ws.filter(length(col("word")) > 0)
      .select(col("word"),
        explode(graft.plans.TokenizerKernels.unigramViterbiPieces(col("word"),
          ps, ss, MaxPiece, maxWordLen)).as("piece"))
  }

  /** One hard-EM round of Kudo's prune loop over a seed vocabulary
    * (completing the algorithm beyond [[trainVocab]]'s frequency seed —
    * the E-step is Viterbi counts, the declared hard-EM simplification of
    * Kudo's forward-backward expectations, which keeps every quantity an
    * exact integer so the round replays bit-for-bit in the SQL twin):
    *
    *   - E-step: usage(piece) = Σ over words of freq(word) × times the
    *     piece appears in the word's Viterbi-best segmentation under the
    *     CURRENT scores (the [[graft.plans.UnigramViterbiPieces]] kernel —
    *     [[Bpe.wordFreqs]] is one row per DISTINCT word, so the kernel
    *     output weights by `freq` directly, no word-level join).
    *   - Prune: multi-char pieces the best segmentations never or rarely
    *     use are dropped — keep the top `keepMulti` by (usage desc, piece
    *     asc); zero-usage multis are gone by construction. Single chars
    *     are always kept (segmentability guarantee), usage 0 allowed.
    *   - M-step: re-score kept pieces by add-one-smoothed usage,
    *     ln((use+1) / Σ(use+1)), on the same 1e-9 integer grid (smoothing
    *     keeps unused singles finite and is SentencePiece-style ML
    *     re-estimation over the hard counts).
    *
    * Returns (piece, use_cnt, score_q) — a drop-in refined vocabulary for
    * [[segmentWords]] / [[tokenCounts]].
    */
  def emRound(documents: DataFrame, vocab: DataFrame, keepMulti: Int = 40,
              maxWordLen: Int = 12,
              scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val (ps, ss) = vocabArrays(vocab)
    val wf = scope.persist(Bpe.wordFreqs(documents))
    guard(wf.select("word"), ps, maxWordLen)
    val usage = wf.filter(length(col("word")) > 0)
      .select(col("freq"),
        explode(graft.plans.TokenizerKernels.unigramViterbiPieces(col("word"),
          ps, ss, MaxPiece, maxWordLen)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("use_cnt"))
    val spark = documents.sparkSession
    val singles = spark
      .createDataset(singleChars(ps).toSeq)(org.apache.spark.sql.Encoders.STRING)
      .toDF("piece")
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("use_cnt"), lit(0L)).as("use_cnt"))
    val multis = usage.filter(length(col("piece")) > 1)
      .orderBy(desc("use_cnt"), col("piece")).limit(keepMulti)
    val kept = scope.checkpoint(singles.unionByName(multis))
    val total = kept.agg((sum("use_cnt") + count(lit(1))).as("t"))
      .first().getLong(0)
    kept.withColumn("score_q",
      floor(log((col("use_cnt") + 1).cast("double") / total) * 1000000000.0 + 0.5)
        .cast("long"))
  }

  /** One SOFT-EM round — Kudo's actual forward-backward E-step, closing
    * the declared hard-EM simplification of [[emRound]]: expected piece
    * usage is averaged over ALL segmentations of each word weighted by
    * their likelihood, not just the Viterbi best.
    *
    * Determinism strategy (every cross-engine hazard quantized away):
    * a word of ≤ `maxWordLen` chars over ≤ [[MaxPiece]]-char pieces has a
    * BOUNDED segmentation lattice (≤ 2^11 paths at 12 chars), so the
    * E-step ENUMERATES paths instead of running scaled forward-backward —
    * float α/β recurrences would need a deterministic per-step rescale,
    * while per-path log-weights are plain integer sums of the vocabulary's
    * 1e-9-grid scores. Per word:
    * relative path weight r = ⌊exp((logwq − max logwq)/10⁹)·10⁹ + 0.5⌋
    * (one transcendental per path, grid-absorbed — the lmScore/dsir
    * discipline), Z = Σr exactly in longs, and each piece's expected
    * per-word usage lands on a 1e-5 integer grid via pure integer
    * div: e = (n·10⁵ + Z div 2) div Z with n = Σ_{paths ∋ piece} r·mult.
    * Bounds: |logwq| ≤ 12·|minScore| < 10¹², r ≤ 10⁹, Z < 10¹³,
    * n·10⁵ < 9.2·10¹⁸ — every quantity fits a long with the same floor
    * semantics in both engines.
    *
    * Prune + M-step mirror [[emRound]] on the scaled grid: singles always
    * kept, top `keepMulti` multis by expected usage (`use_q` = expected
    * count × 10⁵), add-one smoothing as +10⁵ on the scaled counts,
    * ln re-score on the 1e-9 grid.
    *
    * Scale: cost is per DISTINCT word × its path count (lattice-bounded,
    * never per occurrence); the whole enumeration runs as ONE fused
    * per-word kernel over the driver-collected vocabulary
    * ([[graft.plans.UnigramSoftUsage]] — formerly 12 checkpointed
    * frontier-join expansions per call).
    */
  def emRoundSoft(documents: DataFrame, vocab: DataFrame, keepMulti: Int = 40,
                  maxWordLen: Int = 12,
                  scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val (ps, ss) = vocabArrays(vocab)
    val wf = scope.persist(Bpe.wordFreqs(documents))
    val actualMax = guard(wf.select("word"), ps, maxWordLen)
    if (actualMax == 0)
      return vocab.select(col("piece"), lit(0L).as("use_q"),
        lit(0L).as("score_q")).limit(0)
    val usage = wf.filter(length(col("word")) > 0)
      .select(col("freq"),
        explode(graft.plans.TokenizerKernels.unigramSoftUsage(col("word"),
          ps, ss, MaxPiece, maxWordLen)).as("pe"))
      .groupBy(col("pe.piece").as("piece"))
      .agg(sum(col("freq") * col("pe.e")).as("use_q"))
    val spark = documents.sparkSession
    val singles = spark
      .createDataset(singleChars(ps).toSeq)(org.apache.spark.sql.Encoders.STRING)
      .toDF("piece")
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("use_q"), lit(0L)).as("use_q"))
    val multis = usage.filter(length(col("piece")) > 1)
      .orderBy(desc("use_q"), col("piece")).limit(keepMulti)
    val kept = scope.checkpoint(singles.unionByName(multis))
    val total = kept.agg((sum("use_q") + count(lit(1)) * 100000L).as("t"))
      .first().getLong(0)
    kept.withColumn("score_q",
      floor(log((col("use_q") + 100000L).cast("double") / total)
        * 1000000000.0 + 0.5).cast("long"))
  }

  /** Per-document unigram token statistics: each word occurrence carries
    * its distinct-word segmentation — (doc_id, n_words, n_pieces,
    * score_q), all exact longs. One explode, one word-keyed join, one
    * keyed agg.
    */
  def tokenCounts(documents: DataFrame, vocab: DataFrame,
                  maxWordLen: Int = 12,
                  scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val occ = documents.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
    val seg = segmentWords(occ.select("word"), vocab, maxWordLen, scope)
    occ.join(seg, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum("score_q").as("score_q"))
  }
}
