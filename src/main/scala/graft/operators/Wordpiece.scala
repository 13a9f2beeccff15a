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
  * words — vocab-bounded, never per-occurrence. Segmentation runs once
  * per distinct word as ≤ maxWordLen chained keyed equi-joins against the
  * checkpointed vocabulary (candidate = (is_cont, substring) key — a hash
  * join, no prefix scan), each step consuming ≥ 1 character; documents
  * then pay one word-level join. Greedy needs no backpointers, so the
  * state is a single evolving (word, pos, np, seg) table, eagerly
  * lineage-cut per step like the Viterbi DP (the uncut self-referential
  * chain is the measured analyzer disease).
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
    val ws = words.select("word").distinct()
    val v = scope.checkpoint(vocab.select(col("core"), col("is_cont")))
    // BOTH contract guards in ONE driver action (the round-10 advice): the
    // max-word-length scan and the missing-character probe (the
    // Unigram.segmentWords discipline — a character missing from the vocab
    // in its position kind would strand that word mid-segmentation and
    // drop it from the inner join) union into a single two-branch job
    // instead of two eager passes per call.
    val guardRows = ws
      .agg(max(length(col("word"))).cast("int").as("maxlen"),
        lit(null).cast("string").as("miss"))
      .unionByName(ws
        .select(col("word"),
          explode(sequence(lit(1), length(col("word")))).as("p"))
        .select((col("p") > 1).as("is_cont"),
          col("word").substr(col("p"), lit(1)).as("core"))
        .distinct()
        .join(v.filter(length(col("core")) === 1),
          Seq("core", "is_cont"), "left_anti")
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
    var state = scope.checkpoint(ws.select(col("word"),
      lit(1).as("pos"), lit(0L).as("np"), lit("").as("seg")))
    for (_ <- 1 to actualMax) {
      val finished = state.filter(col("pos") > length(col("word")))
      val best = state.filter(col("pos") <= length(col("word")))
        .select(col("word"), col("pos"), col("np"), col("seg"),
          explode(sequence(lit(1),
            least(lit(MaxPiece), length(col("word")) - col("pos") + 1)))
            .as("l"))
        .select(col("word"), col("pos"), col("np"), col("seg"),
          (col("pos") > 1).as("is_cont"),
          col("word").substr(col("pos"), col("l")).as("core"))
        .join(v, Seq("core", "is_cont"))
        .groupBy("word", "pos", "np", "seg")
        .agg(max(length(col("core"))).as("bl"))
      val piece = concat(when(col("pos") > 1, "##").otherwise(""),
        col("word").substr(col("pos"), col("bl")))
      val advanced = best.select(col("word"),
        (col("pos") + col("bl")).as("pos"), (col("np") + 1L).as("np"),
        when(col("seg") === "", piece)
          .otherwise(concat(col("seg"), lit(" "), piece)).as("seg"))
      state = scope.checkpoint(finished.unionByName(advanced))
    }
    state.select(col("word"), col("np").as("n_pieces"), col("seg"))
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
