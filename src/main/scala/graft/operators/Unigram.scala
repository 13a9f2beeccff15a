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
  * per-occurrence); Viterbi runs once per distinct word as `maxWordLen`
  * chained keyed argmax steps over the word table joined to the
  * broadcast-small vocabulary; documents then pay one word-level join —
  * segmentation cost is per distinct word, token counting per occurrence.
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

  /** Maximum-likelihood segmentation of every distinct word — Viterbi as
    * `maxWordLen` chained argmax steps: state(j) = the best quantized
    * score over decompositions of the word's first j characters, each
    * step extending the previous ≤ [[MaxPiece]] states by one vocabulary
    * piece, ties broken toward the LONGER final piece (smaller split
    * point), which is a total order because the split point determines
    * the candidate. Returns (word, n_pieces, score_q). Requires every
    * word ≤ `maxWordLen` chars (the corpus-normalization contract —
    * SentencePiece's max_sentencepiece_length plays the same role) and
    * every character in the vocabulary (guaranteed when `vocab` was
    * trained on the same corpus).
    */
  def segmentWords(words: DataFrame, vocab: DataFrame,
                   maxWordLen: Int = 12,
                   scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val (ws, states, actualMax) = viterbiStates(words, vocab, maxWordLen, scope)
    if (actualMax == 0)
      return ws.select(col("word"), lit(0L).as("n_pieces"), lit(0L).as("score_q"))
        .limit(0)
    (1 to actualMax).map { j =>
      states(j).filter(length(col("word")) === j)
    }.reduce(_ unionByName _)
      .select(col("word"), col("np").as("n_pieces"), col("sq").as("score_q"))
  }

  /** The shared Viterbi DP: distinct words, per-prefix-length states with
    * BACKPOINTERS. Returns (distinct words, states 0..actualMax, actualMax);
    * state j holds (word, sq, np, bi) — best quantized score, piece count,
    * and chosen split point for the word's first j characters.
    */
  private def viterbiStates(words: DataFrame, vocab: DataFrame,
                            maxWordLen: Int, scope: graft.CacheScope)
      : (DataFrame, Vector[DataFrame], Int) = {
    val ws = words.select("word").distinct()
    // one pass answers both the contract check and the loop depth: steps
    // beyond the longest actual word would compute empty states (the SQL
    // twin keeps its fixed-depth chain — its surplus CTEs are empty, so
    // the outputs agree)
    val actualMax = ws.agg(max(length(col("word"))).as("m"))
      .first().getAs[Number](0) match { case null => 0; case n => n.intValue }
    require(actualMax <= maxWordLen,
      s"longest word has $actualMax chars > maxWordLen=$maxWordLen — " +
        "raise it or normalize the corpus")
    // checkpoint, not persist: state(j) reads the previous FOUR states,
    // so the uncut lineage branches 4-way per step — a 4^maxWordLen-node
    // tree the analyzer would walk per downstream job (the measured
    // pretrain stage-5/6 disease; this one hangs outright at 12 steps).
    // Each state is word-table-sized, so the eager cut is cheap.
    val v = scope.checkpoint(vocab.select(col("piece"), col("score_q")))
    // loud contract guard (was a silent inner-join drop): a word containing
    // a character absent from the vocabulary — possible when vocab was
    // trained on a DIFFERENT corpus — would lose all its states and vanish
    // from every downstream count. One cheap distinct-char anti-join pass
    // over the (already distinct) word table catches it before the DP runs.
    val missing = ws
      .select(explode(graft.plans.NativeKernels.allSubstrings(col("word"), 1)).as("piece"))
      .distinct()
      .join(v.filter(length(col("piece")) === 1), Seq("piece"), "left_anti")
      .limit(5).collect().map(_.getString(0))
    require(missing.isEmpty,
      s"words contain characters missing from the vocabulary: " +
        s"${missing.mkString("'", "', '", "'")} — was the vocab trained on " +
        "this corpus? (segmentation would silently drop those words)")
    // states(j): (word, sq, np, bi) for words with length ≥ j; state 0 is
    // the empty prefix of every word
    var states = Vector(scope.checkpoint(ws.select(col("word"),
      lit(0L).as("sq"), lit(0L).as("np"), lit(-1L).as("bi"))))
    for (j <- 1 to actualMax) {
      val cands = (math.max(0, j - MaxPiece) until j).map { i =>
        states(i)
          .filter(length(col("word")) >= j)
          .select(col("word"), lit(i.toLong).as("i"),
            col("word").substr(i + 1, j - i).as("piece"),
            col("sq"), col("np"))
      }.reduce(_ unionByName _)
      // argmax by (sq desc, i asc) as a max_by PARTIAL aggregate — the
      // (sq, −i) key is unique per candidate (one candidate per split
      // point), so the tie law is total and map-side combine replaces the
      // window's sort shuffle
      val scored = cands.join(v, "piece")
        .select(col("word"), col("i"),
          (col("sq") + col("score_q")).as("sq"), (col("np") + 1).as("np"))
      states = states :+ scope.checkpoint(scored
        .groupBy("word")
        .agg(max_by(struct(col("sq"), col("np"), col("i").as("bi")),
          struct(col("sq"), (-col("i")).as("ni"))).as("m"))
        .select(col("word"), col("m.sq").as("sq"), col("m.np").as("np"),
          col("m.bi").as("bi")))
    }
    (ws, states, actualMax)
  }

  /** The Viterbi-best segmentation PATH of every distinct word, one row per
    * used piece WITH multiplicity: (word, piece). Backtrace over the DP's
    * backpointers as ≤ maxWordLen frontier-join steps — each step j→bi
    * emits the piece word[bi+1..j] and moves the frontier to bi; the
    * frontier only shrinks, and every word terminates at state 0 because
    * the DP guarantees each kept state was reached from state 0.
    */
  def segmentPieces(words: DataFrame, vocab: DataFrame,
                    maxWordLen: Int = 12,
                    scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val (ws, states, actualMax) = viterbiStates(words, vocab, maxWordLen, scope)
    if (actualMax == 0)
      return ws.select(col("word"), col("word").as("piece")).limit(0)
    val bp = scope.checkpoint((1 to actualMax).map { j =>
      states(j).filter(length(col("word")) >= j)
        .select(col("word"), lit(j.toLong).as("j"), col("bi"))
    }.reduce(_ unionByName _))
    var frontier = ws.select(col("word"), length(col("word")).cast("long").as("j"))
    val emitted = Vector.newBuilder[DataFrame]
    for (_ <- 1 to actualMax) {
      // linear lineage (bp is checkpointed), so no per-step cut is needed
      val step = frontier.filter(col("j") > 0).join(bp, Seq("word", "j"))
      emitted += step.select(col("word"),
        col("word").substr((col("bi") + 1).cast("int"),
          (col("j") - col("bi")).cast("int")).as("piece"))
      frontier = step.select(col("word"), col("bi").as("j"))
    }
    emitted.result().reduce(_ unionByName _)
  }

  /** One hard-EM round of Kudo's prune loop over a seed vocabulary
    * (completing the algorithm beyond [[trainVocab]]'s frequency seed —
    * the E-step is Viterbi counts, the declared hard-EM simplification of
    * Kudo's forward-backward expectations, which keeps every quantity an
    * exact integer so the round replays bit-for-bit in the SQL twin):
    *
    *   - E-step: usage(piece) = Σ over words of freq(word) × times the
    *     piece appears in the word's Viterbi-best segmentation under the
    *     CURRENT scores ([[segmentPieces]]).
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
    val wf = scope.checkpoint(Bpe.wordFreqs(documents))
    val paths = segmentPieces(wf.select("word"), vocab, maxWordLen, scope)
    val usage = paths.join(wf, "word")
      .groupBy("piece").agg(sum("freq").as("use_cnt"))
    val singles = vocab.filter(length(col("piece")) === 1).select("piece")
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
    * E-step ENUMERATES paths with a frontier-join DP instead of running
    * scaled forward-backward — float α/β recurrences would need a
    * deterministic per-step rescale, while per-path log-weights are plain
    * integer sums of the vocabulary's 1e-9-grid scores. Per word:
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
    * never per occurrence); the 12-step expansion is keyed equi-joins
    * against the broadcast-small vocabulary with checkpointed frontiers —
    * the [[segmentWords]] shape with states kept instead of argmax'd.
    */
  def emRoundSoft(documents: DataFrame, vocab: DataFrame, keepMulti: Int = 40,
                  maxWordLen: Int = 12,
                  scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    val wf = scope.checkpoint(Bpe.wordFreqs(documents))
    val ws = wf.select("word").distinct()
    val actualMax = ws.agg(max(length(col("word"))).as("m"))
      .first().getAs[Number](0) match { case null => 0; case n => n.intValue }
    require(actualMax <= maxWordLen,
      s"longest word has $actualMax chars > maxWordLen=$maxWordLen — " +
        "raise it or normalize the corpus")
    val v = scope.checkpoint(vocab.select(col("piece"), col("score_q")))
    // same loud missing-char contract as viterbiStates: a word whose
    // character is absent from the vocab has NO complete path and would
    // silently vanish from the expectations
    val missing = ws
      .select(explode(graft.plans.NativeKernels.allSubstrings(col("word"), 1)).as("piece"))
      .distinct()
      .join(v.filter(length(col("piece")) === 1), Seq("piece"), "left_anti")
      .limit(5).collect().map(_.getString(0))
    require(missing.isEmpty,
      s"words contain characters missing from the vocabulary: " +
        s"${missing.mkString("'", "', '", "'")} — was the vocab trained on " +
        "this corpus?")

    // path expansion: frontier rows (word, j, lw, ps) = a partial
    // segmentation of the first j chars with integer log-weight lw and
    // piece list ps; each step extends by every vocab piece of length
    // 1..MaxPiece via an EQUI-join on the extracted substring
    var frontier = scope.checkpoint(ws.select(col("word"),
      lit(0L).as("j"), lit(0L).as("lw"),
      array().cast("array<string>").as("ps")))
    val done = Vector.newBuilder[DataFrame]
    for (_ <- 1 to actualMax) {
      val cand = frontier
        .filter(col("j") < length(col("word")))
        .select(col("word"), col("j"), col("lw"), col("ps"),
          explode(sequence(lit(1L),
            least(lit(MaxPiece.toLong), length(col("word")) - col("j"))))
            .as("pl"))
        .withColumn("piece",
          col("word").substr((col("j") + 1).cast("int"), col("pl").cast("int")))
      val step = scope.checkpoint(cand.join(v, "piece")
        .select(col("word"), (col("j") + col("pl")).as("j"),
          (col("lw") + col("score_q")).as("lw"),
          concat(col("ps"), array(col("piece"))).as("ps")))
      done += step.filter(col("j") === length(col("word")))
        .select("word", "lw", "ps")
      frontier = step
    }
    if (actualMax == 0)
      return vocab.select(col("piece"), lit(0L).as("use_q"),
        lit(0L).as("score_q")).limit(0)
    val allp = done.result().reduce(_ unionByName _)

    val mx = allp.groupBy("word").agg(max("lw").as("m"))
    val rw = scope.persist(allp.join(mx, "word")
      .withColumn("r", floor(
        exp((col("lw") - col("m")).cast("double") / 1000000000.0)
          * 1000000000.0 + 0.5).cast("long")))
    val z = rw.groupBy("word").agg(sum("r").as("z"))
    val n = rw.select(col("word"), explode(col("ps")).as("piece"), col("r"))
      .groupBy("word", "piece").agg(sum("r").as("n"))
    val eq = n.join(z, "word")
      .withColumn("e", expr("(n * 100000 + z div 2) div z"))
    val usage = eq.join(wf, "word")
      .groupBy("piece").agg(sum(col("freq") * col("e")).as("use_q"))
    val singles = vocab.filter(length(col("piece")) === 1).select("piece")
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
