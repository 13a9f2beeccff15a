package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Wu et al. 2016 — the BERT-family tokenizer), the
  * third major subword family next to [[Bpe]] (learned merge rules) and
  * [[Unigram]] (maximum-likelihood Viterbi): a POSITION-AWARE vocabulary
  * where word-initial pieces are plain and non-initial pieces carry the
  * `##` continuation prefix, segmented by GREEDY LONGEST-MATCH-FIRST — at
  * each position consume the longest matching vocabulary piece, never
  * backtracking. The segmentation algorithm is the real deployed one
  * (BERT's WordpieceTokenizer); training is the [[Unigram]] frequency
  * seed lifted to position-aware counts — published WordPiece training
  * interleaves likelihood-scored merges, and the frequency seed is the
  * declared simplification that keeps every count an exact integer so the
  * whole vocab law replays in SQL (the same contract as Unigram's seed
  * being "substring frequency IS Kudo's initialization").
  *
  * Scale design (the [[Bpe]] discipline): vocabulary counting is one
  * positions×(≤[[MaxPiece]] lengths) explode + partial agg over DISTINCT
  * words — vocab-bounded, never per-occurrence. The vocabulary is
  * driver-bounded by construction (every single character of each
  * position kind + topMulti ≤ 60 multis), so segmentation runs once per
  * distinct word as ONE fused codegen kernel over the collected sets
  * ([[graft.plans.WordpieceGreedy]] — replacing the previous ≤ maxWordLen
  * chained join+agg rounds, each a checkpointed shuffle); documents then
  * pay one word-level join.
  */
object Wordpiece {

  /** Longest candidate piece, in characters. */
  val MaxPiece = 4

  /** Position-aware vocabulary: (piece, core, is_cont, cnt). A substring
    * occurrence starting at position 1 counts toward the plain piece, at
    * any later position toward the `##` continuation; kept = every single
    * character of each kind (greedy segmentability guarantee — a word can
    * always advance one char) plus the `topMulti` heaviest multi-char
    * entries by (cnt desc, is_cont asc, core asc). `cnt` weights each
    * occurrence by its word's corpus frequency.
    */
  def trainVocab(documents: DataFrame, topMulti: Int = 60): DataFrame = {
    val wf = Bpe.wordFreqs(documents)
    val counts = wf
      .select(col("freq"), col("word"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("freq"), col("word"), col("p"),
        explode(sequence(lit(1),
          least(lit(MaxPiece), length(col("word")) - col("p") + 1))).as("l"))
      .select(col("freq"), (col("p") > 1).as("is_cont"),
        col("word").substr(col("p"), col("l")).as("core"))
      .groupBy("is_cont", "core").agg(sum("freq").as("cnt"))
    val singles = counts.filter(length(col("core")) === 1)
    val multis = counts.filter(length(col("core")) > 1)
      .orderBy(desc("cnt"), col("is_cont"), col("core")).limit(topMulti)
    singles.unionByName(multis)
      .select(
        concat(when(col("is_cont"), "##").otherwise(""), col("core"))
          .as("piece"),
        col("core"), col("is_cont"), col("cnt"))
  }

  /** Greedy longest-match segmentation of every distinct word: returns
    * (word, n_pieces, seg) where `seg` is the space-joined piece sequence
    * (`##`-prefixed continuations). Requires every word ≤ maxWordLen chars
    * and every (position-kind, character) present in the vocabulary —
    * guaranteed when `vocab` was trained on the same corpus; violated
    * vocab/corpus pairs fail loudly, not by silently dropping words.
    */
  def segmentWords(words: DataFrame, vocab: DataFrame,
                   maxWordLen: Int = 12,
                   scope: graft.CacheScope = graft.CacheScope.global): DataFrame = {
    // the vocabulary is driver-bounded by construction (every single
    // character of each position kind + topMulti ≤ 60 multis — the
    // quantizer-collect size class), so the greedy matcher runs as ONE
    // fused per-word kernel over the collected sets
    // ([[graft.plans.WordpieceGreedy]] — formerly maxWordLen chained
    // join+agg rounds, each a checkpointed shuffle)
    val rows = vocab.select(col("core"), col("is_cont")).collect()
    val cores = rows.map(_.getString(0))
    val isCont = rows.map(_.getBoolean(1))
    // persisted: feeds the guard job AND the result pass
    val ws = scope.persist(words.select("word").distinct())
    def single(c: String) = c.nonEmpty && c.codePointCount(0, c.length) == 1
    val initSingles = cores.iterator.zip(isCont.iterator)
      .collect { case (c, false) if single(c) => c }.toSeq
    val contSingles = cores.iterator.zip(isCont.iterator)
      .collect { case (c, true) if single(c) => c }.toSeq
    def inSet(c: org.apache.spark.sql.Column, s: Seq[String]) =
      if (s.isEmpty) lit(false) else c.isin(s: _*)
    // BOTH contract guards in ONE driver action (the round-10 advice): the
    // max-word-length scan and the missing-character probe (the
    // Unigram.segmentWords discipline — a character missing from the vocab
    // in its position kind would previously strand that word
    // mid-segmentation and silently drop it; the kernel throws instead,
    // and the guard keeps the failure at the call site with the bounded
    // example list) union into a single two-branch job.
    val guardRows = ws
      .agg(max(length(col("word"))).cast("int").as("maxlen"),
        lit(null).cast("string").as("miss"))
      .unionByName(ws
        .select(col("word"),
          explode(sequence(lit(1), length(col("word")))).as("p"))
        .select((col("p") > 1).as("is_cont"),
          col("word").substr(col("p"), lit(1)).as("core"))
        .distinct()
        .filter(!((col("is_cont") && inSet(col("core"), contSingles)) ||
          (!col("is_cont") && inSet(col("core"), initSingles))))
        .limit(5)
        .select(lit(null).cast("int").as("maxlen"),
          concat(when(col("is_cont"), "##").otherwise(""), col("core"))
            .as("miss")))
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
    ws.select(col("word"),
        graft.plans.TokenizerKernels.wordpieceGreedy(col("word"), cores,
          isCont, MaxPiece, maxWordLen).as("st"))
      .select(col("word"), col("st.n_pieces").as("n_pieces"),
        col("st.seg").as("seg"))
  }

  /** Per-document WordPiece token counts under the trained vocabulary —
    * segmentation cost per distinct word, counting per occurrence.
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
        sum("n_pieces").as("n_pieces"))
  }
}
