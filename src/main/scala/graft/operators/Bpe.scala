package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained BPE (byte-pair-encoding) tokenizer — the real merge-rule
  * training loop, not the regex approximation in
  * [[TextAnalysis.bpeishTokens]]: each round merges the adjacent symbol
  * pair with the highest occurrence count (weighted by word frequency,
  * ties broken lexicographically), exactly the classic Sennrich et al.
  * (2016) word-frequency formulation.
  *
  * REPRESENTATION — each symbol is individually wrapped in `~` markers:
  * the word "low" starts as `~l~~o~~w~`, and merging (l, o) rewrites
  * `~l~~o~` → `~lo~`. Wrapping every symbol in its OWN marker pair (rather
  * than delimiting with a single separator) means adjacent merge sites
  * never share a boundary character, so one non-overlapping left-to-right
  * `replace` pass applies a rule greedily the way BPE specifies —
  * `~a~~b~~a~~b~` → `~ab~~ab~` in a single pass — and Spark's
  * `UTF8String.replace` and DuckDB's `replace` agree character for
  * character. `~` cannot occur inside a symbol (corpus tokens are
  * whitespace-split words; callers with hostile alphabets should map the
  * marker first).
  *
  * DETERMINISM — every training decision is an exact integer count plus a
  * total-order tie-break (cnt DESC, left ASC, right ASC), so the learned
  * merge table is partition-order-free and the DuckDB twin replays the
  * whole loop as an inlined CTE chain (TextQueries.bpeCtes), the same
  * replay strategy as the IVF Lloyd oracle.
  *
  * SCALE — training runs on the WORD-FREQUENCY table, not the corpus: one
  * corpus-wide explode + partial agg builds it, and each merge round is
  * one vocabulary-sized shuffle (pair counts) + a 1-row driver collect
  * (the argmax — the same bounded-collect contract as Lloyd training).
  * Tokenization of unbounded text is a pure per-row expression fold
  * ([[segment]]) — no joins, no state, whole-stage-codegen'd string
  * replaces.
  */
object Bpe {

  /** Symbol marker; must not occur inside corpus tokens. */
  val Sep = "~"

  /** Initial symbolization: every character individually wrapped —
    * "low" → "~l~~o~~w~".
    */
  def symInit(w: Column): Column = regexp_replace(w, "(.)", s"$Sep$$1$Sep")

  /** Symbol list of a wrapped string: strip the outer markers, split on
    * the doubled inter-symbol marker.
    */
  def symList(syms: Column): Column = split(trim(syms, Sep), Sep + Sep)

  /** Symbols per word after segmentation — the BPE token count. */
  def symCount(syms: Column): Column = size(symList(syms))

  /** (word, freq) over the corpus: one explode + partial agg. */
  def wordFreqs(documents: DataFrame): DataFrame =
    documents.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** One learned merge rule: at `rank`, (left, right) had the highest
    * pair count `cnt`.
    */
  final case class Merge(rank: Int, left: String, right: String, cnt: Long)

  /** Adjacent symbol pairs of every vocab word, weighted by freq. */
  private def pairsOf(wf: DataFrame): DataFrame = {
    val emptyPairs = array().cast("array<struct<l:string,r:string>>")
    wf.select(col("freq"), symList(col("syms")).as("lst"))
      .select(col("freq"), explode(
        when(size(col("lst")) < 2, emptyPairs)
          .otherwise(transform(sequence(lit(0), size(col("lst")) - 2),
            i => struct(element_at(col("lst"), i + 1).as("l"),
              element_at(col("lst"), i + 2).as("r"))))).as("pr"))
      .select(col("freq"), col("pr.l").as("l"), col("pr.r").as("r"))
  }

  /** The replace pattern applying merge (l, r): `~l~~r~` → `~lr~`. */
  private def applyMerge(syms: Column, left: String, right: String): Column =
    replace(syms,
      lit(Sep + left + Sep + Sep + right + Sep),
      lit(Sep + left + right + Sep))

  /** Train `nMerges` merge rules on the corpus — the classic one-merge-
    * per-round formulation: [[trainMergesBatched]] at batchSize = 1, where
    * the batched algorithm reduces exactly to Sennrich's (each round's
    * single accepted candidate IS the global argmax). Kept as the named
    * entry point because the DuckDB oracles replay precisely this m=1
    * chain. Fails loudly if the vocabulary merges to single symbols before
    * nMerges rounds (impossible on any realistic corpus).
    */
  def trainMerges(documents: DataFrame, nMerges: Int = 8,
                  scope: graft.CacheScope = graft.CacheScope.global): Seq[Merge] =
    trainMergesBatched(documents, nMerges, batchSize = 1, scope)

  /** Batched merge training — the 100 TB-realism fix for the per-merge
    * driver loop: a production tokenizer learns 30k–50k rules, and 30k
    * sequential Spark jobs is hours of job-launch overhead regardless of
    * data size. Each ROUND here is one vocab-sized pair-count shuffle + a
    * bounded collect + ONE replace pass applying up to `batchSize` rules,
    * so job count drops from nMerges to ≈ nMerges/batchSize.
    *
    * SELECTION — candidates are scanned in the exact sequential order
    * (cnt DESC, l, r) and greedily accepted only if their symbols are
    * disjoint from every symbol an earlier acceptance touched or CREATED
    * (l, r, and l+r all reserved). Disjointness means applying an earlier
    * accepted rule cannot change a later accepted rule's pair count — the
    * counts each acceptance was ranked by are exactly the counts the
    * sequential algorithm would have measured. A candidate that overlaps
    * waits for the next round's fresh counts.
    *
    * APPROXIMATION BOUNDARY — batched ≡ sequential whenever the merges
    * in a batch don't interact (asserted in BpeSpec); the one divergence
    * case is a pair CREATED mid-batch (involving a just-merged symbol)
    * whose true count would outrank a later accepted candidate —
    * sequential would pick it first, batched picks it next round. That
    * reorders ranks only within a count neighborhood of the batch (the
    * standard batched-BPE trade; created-pair counts are bounded by their
    * creator's count). batchSize = 1 has no such case: it IS sequential.
    *
    * Per-round lineage: one eager localCheckpoint + RDD-level release of
    * the superseded round (the nearDupClusters rule), regardless of batch
    * size — driver cost per ROUND stays flat, and rounds shrink 64×.
    *
    * MEASURED at production depth (`ScaleProbe bpe salt=32 …` on the
    * 32×-salted sf1 corpus, 1.76 M docs): 1 000 merges in 24.1 s
    * (0.024 s/merge), 5 000 in 77.0 s (0.015), 8 000 in 49.4 s (0.006)
    * at batch 256 — per-merge cost FALLS with depth as the replace pass
    * shrinks the symbol streams, so a 30 k-rule production table is
    * minutes of training, not the hours the sequential loop would cost.
    */
  def trainMergesBatched(documents: DataFrame, nMerges: Int,
                         batchSize: Int = 64,
                         scope: graft.CacheScope = graft.CacheScope.global): Seq[Merge] = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    var wf = wordFreqs(documents).withColumn("syms", symInit(col("word")))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    while (out.length < nMerges) {
      val want = math.min(nMerges - out.length, batchSize)
      // over-fetch 4×: greedy disjointness skips overlapping candidates;
      // the collect stays bounded (≤ 4·batchSize small rows). Accepting
      // fewer than `want` is fine — skipped pairs resurface next round.
      val cands = pairsOf(wf).groupBy("l", "r").agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r")).limit(want * 4).collect()
      if (cands.isEmpty)
        throw new IllegalStateException(
          s"BPE training exhausted all adjacent pairs after ${out.length} merges")
      val used = scala.collection.mutable.Set.empty[String]
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Merge]
      for (row <- cands if accepted.length < want) {
        val (l, r) = (row.getString(0), row.getString(1))
        if (!used(l) && !used(r)) {
          accepted += Merge(out.length + accepted.length + 1, l, r, row.getLong(2))
          used ++= Seq(l, r, l + r)
        }
      }
      // first candidate of a round is always disjoint (used starts empty)
      val next = accepted.foldLeft(wf)((df, m) =>
          df.withColumn("syms", applyMerge(col("syms"), m.left, m.right)))
        .localCheckpoint(true)
      graft.CacheScope.releaseCheckpoint(wf) // RDD-level; unpersist() can't see it
      wf = next
      out ++= accepted
    }
    out.toSeq
  }

  // Memoized training per (corpusKey, nMerges): the learned table is
  // nMerges tuples — driver-tiny, like the IVF quantizer memo — so every
  // query over the same corpus reuses one training run.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[Merge]]()

  def trainMergesCached(corpusKey: String, documents: DataFrame,
                        nMerges: Int = 8): Seq[Merge] =
    memo.computeIfAbsent((corpusKey, nMerges), _ => {
      val sc = new graft.CacheScope
      try trainMerges(documents, nMerges, sc) finally sc.release()
    })

  /** Persist a trained merge table — the tokenizer artifact a pipeline
    * trains once and ships everywhere (the BPE analog of the materialized
    * IVF index). Rank order is the application order; [[loadMerges]]
    * restores it exactly.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], path: String): Unit =
    spark.createDataFrame(merges)
      .write.mode("overwrite").parquet(path)

  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] = {
    import spark.implicits._
    spark.read.parquet(path).as[Merge]
      .collect().toSeq.sortBy(_.rank)
  }

  /** Segment a word with a trained merge table: the symInit string folded
    * through the merge replaces IN RANK ORDER — a pure expression, applied
    * to unbounded text with no join against the training vocabulary.
    * DEPTH BOUND: this nests one `replace` per merge into a single
    * expression — fine at spec-scale tables, pathological at a production
    * 30k-rule table (the analyzer walks a 30k-deep tree per column). For
    * large tables materialize the vocabulary once ([[buildVocab]], bounded
    * passes) and tokenize by join; this form remains the general fallback
    * that also handles unseen words.
    */
  def segment(w: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(symInit(w))((s, m) => applyMerge(s, m.left, m.right))

  /** Materialized tokenizer vocabulary — the SECOND artifact to ship next
    * to the merge table: (word, freq, syms) for every corpus word, built
    * by replaying the merges in rank order in bounded-depth passes
    * (`chunk` replaces per pass + the lineage-checkpoint rule), so a 30k-
    * rule table costs 30k/chunk vocab-sized passes instead of one 30k-deep
    * expression. Tokenizing a corpus then becomes one keyed JOIN of its
    * words against this table (`text_bpe_tokens_vocab` — same oracle as
    * the fold path), which is the application shape that actually scales:
    * the per-word fold work is paid once per DISTINCT word here, not once
    * per occurrence.
    */
  def buildVocab(documents: DataFrame, merges: Seq[Merge],
                 chunk: Int = 64): DataFrame = {
    require(chunk >= 1, s"chunk must be >= 1, got $chunk")
    var wf = wordFreqs(documents).withColumn("syms", symInit(col("word")))
      .localCheckpoint(true)
    merges.sortBy(_.rank).grouped(chunk).foreach { g =>
      val next = g.foldLeft(wf)((df, m) =>
          df.withColumn("syms", applyMerge(col("syms"), m.left, m.right)))
        .localCheckpoint(true)
      graft.CacheScope.releaseCheckpoint(wf)
      wf = next
    }
    wf.select("word", "freq", "syms")
  }
}
