package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Text-analysis queries over `documents`, with DuckDB oracle twins.
  * Counts are cast to BIGINT on the Spark side to match DuckDB's natural
  * integer width (its len()/COUNT return BIGINT).
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace + BPE-ish regex segmentation + vocab size.
    "text_stats" -> ((s, dir) => {
      TextAnalysis.stats(Tables.documents(s, dir))
        .select(col("doc_id"),
          col("len_chars").cast("long").as("len_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_bpeish_tokens").cast("long").as("n_bpeish_tokens"),
          col("n_distinct_tokens").cast("long").as("n_distinct_tokens"),
          col("distinct_ratio"))
        .orderBy("doc_id")
    }),

    // Language-ID heuristic (marker-token argmax). Tokens are projected in a
    // separate select so the 5 per-language scores share one split() — the
    // score filters are CodegenFallback and would otherwise each re-split.
    "text_langid" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang").as("lang_declared"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang_declared"),
          TextAnalysis.langIdFromTokens(col("toks")).as("lang_predicted"))
        .orderBy("doc_id")),

    // Quality scoring (length/diversity/marker components).
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(Tables.documents(s, dir)).orderBy("doc_id")),

    // Global term frequency, top 20.
    "text_termfreq" -> ((s, dir) =>
      TextAnalysis.termFrequency(Tables.documents(s, dir), 20)),

    // Intra-document repetition: share of 3-gram occurrences that repeat
    // an earlier 3-gram (Gopher-style boilerplate signal).
    "text_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.r4(TextAnalysis.repetitionRatio(col("text"), 3))
            .as("rep_ratio"))
        .orderBy("doc_id")),

    // Content fingerprint (md5 of normalized text) — exact-dup key.
    "text_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
        .orderBy("doc_id")),

    // Corpus-composition report per (source, lang): doc counts, token and
    // char volume, mean 4-dp quality — the mixing dashboard a data team
    // reads before reweighting sources. Integer token/char sums are exact;
    // the quality mean reuses the exact-integer-mean trick (quality is on
    // the 1e-4 grid).
    "text_source_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val q = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
      docs.join(q, "doc_id")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          sum(floor(col("quality") * 10000.0 + 0.5).cast("long")).as("q_sum"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          col("n_chars"),
          (floor(col("q_sum").cast("double") / col("n_docs") + 0.5) / 10000.0)
            .as("mean_quality"))
        .orderBy("source", "lang")
    }),

    // Corpus-self-trained bigram LM quality score (CCNet-style filter).
    "text_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(Tables.documents(s, dir))
        .orderBy("doc_id")),

    // Cross-corpus LM score (the CCNet recipe): train the bigram model on
    // the src1 documents, score EVERY document against that domain.
    "text_lm_cross" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.lmScoreCross(docs, docs.filter(col("source") === "src1"))
        .orderBy("doc_id")
    }),

    // Decontamination scan: every 100th doc plays the held-out benchmark;
    // n_hits = how many of a doc's shingles appear in that probe set.
    "text_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.contaminationHits(docs, docs.filter(col("doc_id") % 100 === 0))
        .orderBy("doc_id")
    }),

    // Per-document top-5 TF-IDF terms (corpus-relative keyword extraction).
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), 5)
        .orderBy("doc_id", "rn")),

    // Rolling-hash fingerprint — order-sensitive; md5-based token hash makes
    // the fold reproducible in DuckDB (list_reduce twin below).
    "text_fingerprint_rolling" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.fingerprintRolling(col("text")).as("fp_roll"))
        .orderBy("doc_id")),

    // C4-style cross-document boilerplate: per-doc share of token positions
    // covered by a 3-gram occurring in >= 4 distinct docs.
    "text_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateCoverage(Tables.documents(s, dir),
          store = Some(dir + "#boilercover"))
        .orderBy("doc_id")),

    // ... and the corpus with those covered tokens removed.
    "text_boilerplate_strip" -> ((s, dir) =>
      TextAnalysis.stripBoilerplate(Tables.documents(s, dir),
          store = Some(dir + "#boilercover"))
        .orderBy("doc_id")),

    // TextRank keywords: top-3 tokens per document by damped PageRank over
    // the in-document co-occurrence graph (window 2, 3 iterations on the
    // 1e-9 integer grid — the oracle replays every iteration as a CTE).
    "text_textrank" -> ((s, dir) =>
      TextAnalysis.textrankKeywords(Tables.documents(s, dir))
        .orderBy("doc_id", "rn")),

    // Gopher rule suite (Rae et al. 2021): the published heuristic battery
    // (word count, mean word length, symbol/bullet/ellipsis fractions,
    // alpha-word share, stopword presence) over the markup-line fixture
    // law (Tables.documentsAsMarkupLines). Short fixture docs fail the
    // word-count floor and single-stopword docs fail the gibberish gate,
    // so `keep` genuinely splits the corpus.
    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(Tables.documentsAsMarkupLines(s, dir))
        .orderBy("doc_id")),

    // Trained Naive Bayes language classifier (fastText-lite): fit on the
    // 80% md5-bucket split, score the held-out 20%, report the confusion
    // matrix — the trained upgrade of the text_langid marker heuristic.
    "text_nb_lang" -> ((s, dir) =>
      TextAnalysis.nbConfusion(Tables.documents(s, dir))
        .orderBy("actual", "predicted")),

    // Trained BPE tokenizer — the learned merge table (8 rounds over the
    // corpus word-frequency table; memoized per corpus dir).
    "text_bpe_merges" -> ((s, dir) => {
      val merges = operators.Bpe.trainMergesCached(dir, Tables.documents(s, dir))
      s.createDataFrame(merges)
        .select(col("rank").as("merge_rank"), col("left").as("left_sym"),
          col("right").as("right_sym"), col("cnt"))
        .orderBy("merge_rank")
    }),

    // The trained vocabulary: every corpus word's final BPE segmentation.
    "text_bpe_vocab" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = operators.Bpe.trainMergesCached(dir, docs)
      operators.Bpe.wordFreqs(docs)
        .withColumn("syms", operators.Bpe.segment(col("word"), merges))
        .orderBy("word")
    }),

    // Per-document token counts under the trained tokenizer — the number a
    // training-data pipeline actually budgets by.
    "text_bpe_tokens" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = operators.Bpe.trainMergesCached(dir, docs)
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .withColumn("nsym",
          operators.Bpe.symCount(operators.Bpe.segment(col("word"), merges)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("nsym").as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // Same contract through the VOCABULARY-JOIN application path — the
    // shape that scales to production merge tables: the fold work is paid
    // once per distinct word in the materialized vocab (bounded-depth
    // passes), tokenizing is one keyed join. Shares text_bpe_tokens'
    // oracle; chunk=3 forces multiple replay passes so the bounded-depth
    // machinery is what the gate actually exercises.
    "text_bpe_tokens_vocab" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = operators.Bpe.trainMergesCached(dir, docs)
      val vocab = operators.Bpe.buildVocab(docs, merges, chunk = 3)
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .join(vocab.select(col("word"), operators.Bpe.symCount(col("syms")).as("nsym")),
          Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("nsym").as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // Unigram-LM tokenizer vocabulary (SentencePiece's other half, next
    // to BPE): every single char + the 60 heaviest multi-char substrings,
    // scored ln(cnt/total) on the 1e-9 integer grid.
    "text_unigram_vocab" -> ((s, dir) =>
      operators.Unigram.trainVocab(Tables.documents(s, dir), topMulti = 60)
        .select("piece", "cnt", "score_q")
        .orderBy("piece")),

    // Per-document maximum-likelihood token counts: Viterbi segmentation
    // once per DISTINCT word (12 chained keyed argmax steps), then one
    // word-level join — exact-integer scores so the argmax replays
    // bit-for-bit in the twin's 12-step CTE chain.
    "text_unigram_tokens" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = operators.Unigram.trainVocab(docs, topMulti = 60)
      operators.Unigram.tokenCounts(docs, vocab, maxWordLen = 12)
        .orderBy("doc_id")
    }),

    // WordPiece (BERT) vocabulary: position-aware frequency seed — plain
    // pieces at word starts, ##-continuations elsewhere; all singles +
    // top-60 multis. The third tokenizer family next to BPE and unigram.
    "text_wordpiece_vocab" -> ((s, dir) =>
      operators.Wordpiece.trainVocab(Tables.documents(s, dir))
        .select(col("piece"), col("cnt")).orderBy("piece")),

    // Greedy longest-match-first segmentation of every distinct corpus
    // word — BERT's actual WordpieceTokenizer algorithm; the twin replays
    // all 12 greedy steps as chained CTEs.
    "text_wordpiece_segs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = operators.Wordpiece.trainVocab(docs)
      operators.Wordpiece.segmentWords(
          operators.Bpe.wordFreqs(docs).select("word"), vocab)
        .orderBy("word")
    }),

    // Per-document WordPiece token counts — the budget number a
    // BERT-family training pipeline reads per document.
    "text_wordpiece_tokens" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = operators.Wordpiece.trainVocab(docs)
      operators.Wordpiece.tokenCounts(docs, vocab).orderBy("doc_id")
    }),

    // One hard-EM prune round over the seed vocabulary (completes Kudo's
    // algorithm beyond the frequency seed): E-step = Viterbi piece-usage
    // counts via backpointer backtrace, prune to the 40 most-used
    // multi-char pieces, M-step = add-one-smoothed ln re-score on the 1e-9
    // grid. The twin replays the whole round — DP with backpointers,
    // 12-step backtrace chain, usage counts, prune, re-score.
    "text_unigram_em" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = operators.Unigram.trainVocab(docs, topMulti = 60)
      operators.Unigram.emRound(docs, vocab, keepMulti = 40, maxWordLen = 12)
        .select("piece", "use_cnt", "score_q")
        .orderBy("piece")
    }),

    // SOFT-EM round (Kudo's actual forward-backward expectations, closing
    // the hard-EM simplification): per-word path enumeration over the
    // bounded lattice, integer path log-weights, grid-quantized relative
    // weights, pure-integer expected usage on the 1e-5 grid. The twin
    // replays the full chain — 12 expansion CTEs, softmax quantization,
    // integer div, prune, smoothed re-score.
    "text_unigram_em_soft" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = operators.Unigram.trainVocab(docs, topMulti = 60)
      operators.Unigram.emRoundSoft(docs, vocab, keepMulti = 40, maxWordLen = 12)
        .select("piece", "use_q", "score_q")
        .orderBy("piece")
    }),

    // Soft-EM ITERATED — Kudo's algorithm runs prune rounds to
    // convergence; this is the mechanical 2-round composition (round 2's
    // E-step re-segments under round 1's re-scored vocabulary). The twin
    // chains two full soft replays in one WITH clause (round 2's CTEs
    // prefixed, its voc built from round 1's kept3/tot3).
    "text_unigram_em_soft2" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = operators.Unigram.trainVocab(docs, topMulti = 60)
      val r1 = operators.Unigram.emRoundSoft(docs, vocab,
        keepMulti = 40, maxWordLen = 12)
      operators.Unigram.emRoundSoft(docs, r1, keepMulti = 40, maxWordLen = 12)
        .select("piece", "use_q", "score_q")
        .orderBy("piece")
    }),

    // Native text→vector: hashing-trick document embeddings (signed
    // unigram+bigram counts in md5 buckets — the stage that makes the ANN
    // stack self-feeding instead of fixture-fed). The gate projects every
    // element of every vector via posexplode, so the hash proves the full
    // 64-dim assembly including the zero fill.
    "text_embed" -> ((s, dir) =>
      operators.Embed.hashedTf(Tables.documents(s, dir))
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"), col("v"))
        .orderBy("vec_id", "dim")),

    // IDF-weighted variant: ±idf(f) per occurrence on the 1e-3 grid —
    // stopword mass stops dominating the cosine. Same full-element gate.
    "text_embed_idf" -> ((s, dir) =>
      operators.Embed.hashedTfIdf(Tables.documents(s, dir))
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"), col("v"))
        .orderBy("vec_id", "dim")),

    // BM25 lexical retrieval (k1=1.2, b=0.75, Lucene idf on the 1e-3
    // grid, per-term contributions quantized to exact longs): doc 0's
    // distinct tokens as the query, top-10 of the rest by the integer
    // score sum. The sparse/lexical twin of ann_topk_embed — and the
    // second leg of ann_hybrid_topk's fusion.
    "text_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      operators.Bm25.topKAll(docs, Seq(0L).toDF("query_id"), 10,
          postings = Some(operators.Bm25.materializedPostings(
            dir + "#postings", docs)))
        .orderBy("query_id", "rn")
    }),

    // PSEUDO-RELEVANCE-FEEDBACK query expansion (RM3, exact integer
    // form): round-1 BM25 picks 5 feedback docs, their terms weighted by
    // Σ tf·idf_q nominate 10 expansion terms (originals excluded), and
    // round 2 re-scores with the expanded set — the classic lexical fix
    // for vocabulary mismatch, both rounds served from the postings
    // store. Twin replays both scoring rounds, the feedback cut, and the
    // expansion-term cut with identical grids and ties.
    "text_bm25_rm3" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      operators.Bm25.topKRm3(docs, 0L, 10,
          postings = Some(operators.Bm25.materializedPostings(
            dir + "#postings", docs)))
        .orderBy("rn")
    }),

    // LATE-INTERACTION MaxSim reranking (the ColBERT serving shape):
    // every token position carries the hashed-TF vector of its 3-word
    // context window, and each of BM25's top-10 candidates scores
    // Σ_qpos max_dpos cosine — local phrasing aligns position-to-position
    // where one pooled document vector would blur it. Per-position maxes
    // clamp at 0 and quantize to the 1e-6 grid; the doc score is an
    // exact long sum. Twin replays the window construction, both
    // window-embed chains, the sparse pairwise sims, the clamped maxes,
    // and the quantized sum.
    "text_maxsim_rerank" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      operators.Bm25.maxSimRerank(docs, 0L, 5,
          postings = Some(operators.Bm25.materializedPostings(
            dir + "#postings", docs)))
        .orderBy("rn")
    }),

    // SET-oriented RM3 ({0, 5}): every query's two scoring rounds,
    // feedback cut, and expansion-term cut run as query-keyed joins and
    // windows in ONE plan — the batch-serving form of text_bm25_rm3.
    // Twin replays the whole per-query machinery over the same set.
    "text_bm25_rm3_all" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      operators.Bm25.topKRm3All(docs, Seq(0L, 5L).toDF("query_id"), 10,
          postings = Some(operators.Bm25.materializedPostings(
            dir + "#postings", docs)))
        .orderBy("query_id", "rn")
    }),

    // SET-oriented MaxSim rerank ({0, 5}): the batch first stage
    // nominates per-query candidates, candidate doc windows embed once
    // per DISTINCT doc (shared across queries), query windows broadcast,
    // and the late-interaction scoring runs keyed — one plan for the
    // whole query set. Twin replays per-query candidates, both window
    // chains, and the keyed clamped-max/quantized-sum scoring.
    "text_maxsim_rerank_all" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      operators.Bm25.maxSimRerankAll(docs, Seq(0L, 5L).toDF("query_id"), 5,
          postings = Some(operators.Bm25.materializedPostings(
            dir + "#postings", docs)))
        .orderBy("query_id", "rn")
    }),

    // INCREMENTAL BM25 maintenance: the postings store is built on the
    // base corpus, the held-out slice lands via the append verb (batch
    // file, replay no-op), and the probe over the appended store must
    // score exactly as a from-scratch build over the FULL corpus — the
    // twin replays the full corpus, so hash equality IS the incremental ≡
    // full proof (no frozen model: df/dl/idf derive from the table).
    "text_bm25_incr" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val key = dir + "#postings-incr"
      operators.Bm25.materializedPostings(key,
        docs.filter(col("doc_id") % 40 =!= 7))
      operators.Bm25.appendPostings(key,
        docs.filter(col("doc_id") % 40 === 7), 0L)
      val appended = operators.Bm25.materializedPostings(key,
        docs.filter(col("doc_id") % 40 =!= 7))
      operators.Bm25.topKAll(docs, Seq(0L).toDF("query_id"), 10,
          postings = Some(appended))
        .orderBy("query_id", "rn")
    }),

    // Exact phrase retrieval over positional postings — the lexical query
    // BM25's bag-of-words cannot express. Probes = the corpus' top-3
    // trigrams (deterministic count-desc/lexicographic cut); each ranked
    // by occurrence count. Work = Σ df over phrase terms, one keyed join.
    // Since round 11 the positional table is a MATERIALIZED write-once
    // store (the frequency-postings treatment): tokenize once, probe many
    // — identical rows, so the twin is unchanged.
    "text_phrase_topk" -> ((s, dir) => {
      val pp = operators.Bm25.materializedPositionalPostings(
        dir + "#pospostings", Tables.documents(s, dir))
      val phrases = operators.Bm25.topTrigramPhrases(pp, 3)
      operators.Bm25.phraseTopKAll(pp, phrases, 10)
        .orderBy("phrase_id", "rn")
    }),

    // INCREMENTAL positional-postings maintenance: the store is built on
    // the base corpus, a held-out slice lands via the append verb (batch
    // file, replay no-op), and the phrase probe over the appended store
    // must rank exactly as a from-scratch build over the FULL corpus —
    // positions are per-document, so append ≡ rebuild holds and the twin
    // replays the full corpus (the text_bm25_incr law for phrases).
    "text_phrase_incr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val key = dir + "#pospostings-incr"
      operators.Bm25.materializedPositionalPostings(key,
        docs.filter(col("doc_id") % 40 =!= 7))
      operators.Bm25.appendPositionalPostings(key,
        docs.filter(col("doc_id") % 40 === 7), 0L)
      val pp = operators.Bm25.materializedPositionalPostings(key,
        docs.filter(col("doc_id") % 40 =!= 7))
      val phrases = operators.Bm25.topTrigramPhrases(pp, 3)
      operators.Bm25.phraseTopKAll(pp, phrases, 10)
        .orderBy("phrase_id", "rn")
    })
  )

  private val bpeRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  // DuckDB marker scores per language, mirroring TextAnalysis.langMarkers
  // (shared with CurationQueries' composite quality gate).
  private[graft] def markerSql(lang: String): String = {
    val ms = TextAnalysis.langMarkers.toMap.apply(lang)
      .map(m => s"'$m'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> t IN ($ms)))"
  }

  // Shared CTE prefix for the boilerplate twins: tokenized docs `t`,
  // positioned 3-gram occurrences `occ`, the df >= 4 boilerplate set, and
  // the covered (doc_id, p) position set `cov`.
  private[graft] val boilerplateCtes: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |occ AS (
      |  SELECT doc_id, i - 1 AS pos,
      |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
      |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM t)),
      |boiler AS (
      |  SELECT s FROM (SELECT s, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY s)
      |  WHERE df >= 4),
      |cov AS (
      |  SELECT DISTINCT doc_id, p FROM (
      |    SELECT occ.doc_id, unnest(range(occ.pos, occ.pos + 3)) AS p
      |    FROM occ SEMI JOIN boiler USING (s)))""".stripMargin

  // ---- BPE oracle machinery ----
  //
  // The whole training loop is exact integer counts + lexicographic
  // tie-breaks (see Bpe scaladoc), so the twin replays all 8 merge rounds
  // as CTEs — the IVF-Lloyd replay strategy applied to tokenizer training.
  // Round r: b_r explodes every vocab word's adjacent symbol pairs,
  // p_r picks the argmax pair (1 row), w_r applies the merge with the same
  // non-overlapping left-to-right replace as the Spark side.

  private def bpeRound(prev: String, b: String, p: String, next: String): String =
    s"""$b AS (
       |  SELECT freq, lst, unnest(range(1, len(lst))) AS i
       |  FROM (SELECT freq, string_split(trim(syms, '~'), '~~') AS lst
       |        FROM $prev)),
       |$p AS (
       |  SELECT lst[i] AS l, lst[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM $b GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
       |$next AS (
       |  SELECT word, freq,
       |    replace(syms, '~' || m.l || '~~' || m.r || '~',
       |                  '~' || m.l || m.r || '~') AS syms
       |  FROM $prev, $p m)""".stripMargin

  /** CTE chain w0 → … → w8 (+ p1 … p8, the per-round argmax rows).
    * private[graft]: the BPE-true packing twin (cur_pack_bpe) composes
    * the per-word piece counts into the bin law.
    */
  private[graft] val bpeCtes: String = {
    val w0 =
      """WITH w0 AS (
        |  SELECT word, COUNT(*) AS freq,
        |    regexp_replace(word, '(.)', '~\1~', 'g') AS syms
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word)""".stripMargin
    val rounds = (1 to 8)
      .map(r => bpeRound(s"w${r - 1}", s"b$r", s"p$r", s"w$r"))
    (w0 +: rounds).mkString(",\n")
  }

  // ---- Unigram-LM tokenizer oracle machinery ----
  //
  // Training is one substring-count pass (exact integer counts, 1e-9-grid
  // ln scores) and Viterbi is 12 chained keyed argmax steps — so the twin
  // replays the whole thing: candidate pieces per (split point, length),
  // top-60 multi-char selection, then CTEs s0..s12 where s_j extends the
  // previous ≤ 4 states by one vocab piece and keeps the per-word argmax
  // (sq DESC, split point ASC — the same total order as the Scala side).
  // Built by plain concatenation (no stripMargin) so embedding in the
  // final oracle string can't re-strip SQL lines.

  private val unigramVocabCtes: String =
    """wf AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word),
    pc AS MATERIALIZED (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT freq, unnest(flatten(list_transform(range(0, len(word)),
          i -> list_transform(range(1, least(4, len(word) - i) + 1),
            n -> word[i+1:i+n])))) AS piece
        FROM wf)
      GROUP BY piece),
    multis AS MATERIALIZED (
      SELECT piece, cnt FROM pc WHERE len(piece) > 1
      ORDER BY cnt DESC, piece LIMIT 60),
    kept AS MATERIALIZED (
      SELECT piece, cnt FROM pc WHERE len(piece) = 1
      UNION ALL SELECT piece, cnt FROM multis),
    tot AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM kept),
    voc AS MATERIALIZED (
      SELECT piece, cnt,
        CAST(FLOOR(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
          * 1000000000.0 + 0.5) AS BIGINT) AS score_q
      FROM kept, tot)"""

  private def unigramSegCtes(maxLen: Int): String = {
    val s0 =
      """s0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS sq, CAST(0 AS BIGINT) AS np,
           CAST(-1 AS BIGINT) AS bi
         FROM (SELECT word FROM wf))"""
    val steps = (1 to maxLen).map { j =>
      val cands = (math.max(0, j - 4) until j).map { i =>
        s"""SELECT s.word, $i AS i, s.sq + v.score_q AS sq, s.np + 1 AS np
           FROM s$i s JOIN voc v ON v.piece = s.word[${i + 1}:$j]
           WHERE len(s.word) >= $j"""
      }.mkString("\n      UNION ALL\n      ")
      s"""s$j AS MATERIALIZED (
        SELECT word, sq, np, CAST(i AS BIGINT) AS bi FROM (
          SELECT word, i, sq, np, ROW_NUMBER() OVER (
            PARTITION BY word ORDER BY sq DESC, i) AS rn
          FROM ($cands))
        WHERE rn = 1)"""
    }
    val segUnion = (1 to maxLen)
      .map(j => s"SELECT word, np, sq FROM s$j WHERE len(word) = $j")
      .mkString("\n      UNION ALL\n      ")
    (s0 +: steps).mkString(",\n    ") +
      s",\n    seg AS MATERIALIZED (\n      $segUnion)"
  }

  // Backtrace over the DP's backpointers, mirroring Unigram.segmentPieces:
  // bp is every (word, prefix length j, chosen split bi); the frontier
  // starts at (word, len(word)) and steps j→bi `maxLen` times, emitting
  // the piece word[bi+1..j] at each hop (multiplicity preserved — one row
  // per hop). Then the EM round: freq-weighted usage counts, keep singles
  // + top-`keepMulti` multis, add-one-smoothed ln re-score on the grid.
  private def unigramEmCtes(maxLen: Int, keepMulti: Int): String = {
    val bpUnion = (1 to maxLen)
      .map(j => s"SELECT word, CAST($j AS BIGINT) AS j, bi FROM s$j WHERE len(word) >= $j")
      .mkString("\n      UNION ALL\n      ")
    val hops = (1 to maxLen).map { t =>
      s"""e$t AS MATERIALIZED (
        SELECT f.word, f.j, b.bi FROM f${t - 1} f
        JOIN bp b ON b.word = f.word AND b.j = f.j
        WHERE f.j > 0),
    f$t AS (SELECT word, bi AS j FROM e$t)"""
    }
    val pieceUnion = (1 to maxLen)
      .map(t => s"SELECT word, word[CAST(bi + 1 AS INT):CAST(j AS INT)] AS piece FROM e$t")
      .mkString("\n      UNION ALL\n      ")
    s"""bp AS MATERIALIZED (
      $bpUnion),
    f0 AS (SELECT word, len(word) AS j FROM s0),
    ${hops.mkString(",\n    ")},
    pieces AS (
      $pieceUnion),
    usage AS MATERIALIZED (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS use_cnt
      FROM pieces JOIN wf USING (word) GROUP BY piece),
    singles2 AS (
      SELECT v.piece, COALESCE(u.use_cnt, CAST(0 AS BIGINT)) AS use_cnt
      FROM voc v LEFT JOIN usage u USING (piece) WHERE len(v.piece) = 1),
    multis2 AS (
      SELECT piece, use_cnt FROM usage WHERE len(piece) > 1
      ORDER BY use_cnt DESC, piece LIMIT $keepMulti),
    kept2 AS (SELECT * FROM singles2 UNION ALL SELECT * FROM multis2),
    tot2 AS (SELECT CAST(SUM(use_cnt) + COUNT(*) AS BIGINT) AS total FROM kept2)"""
  }

  // Soft-EM replay: q0..q{maxLen} enumerate EVERY segmentation path of
  // every distinct word (piece list + integer log-weight), then the
  // quantized softmax / integer-grid expectation chain mirrors
  // Unigram.emRoundSoft step for step (same grids, same div semantics —
  // DuckDB's // and Spark's `div` both floor on non-negative operands).
  // `p` prefixes every CTE the round defines and `vocName` picks its
  // vocabulary, so two rounds can chain inside ONE WITH clause (the
  // 2-round convergence twin): round 2 reads a voc built from round 1's
  // kept3/tot3.
  private def unigramSoftCtes(maxLen: Int, keepMulti: Int,
                              p: String = "", vocName: String = "voc"): String = {
    val steps = (1 to maxLen).map { t =>
      s"""${p}q$t AS MATERIALIZED (
        SELECT c.word, c.j + c.pl AS j, c.lw + v.score_q AS lw,
          list_append(c.ps, c.piece) AS ps
        FROM (
          SELECT word, j, lw, ps, pl,
            word[CAST(j + 1 AS INT):CAST(j + pl AS INT)] AS piece
          FROM ${p}q${t - 1}, (SELECT unnest(range(1, 5)) AS pl) ls
          WHERE j < len(word) AND pl <= len(word) - j) c
        JOIN $vocName v ON v.piece = c.piece)"""
    }
    val allUnion = (1 to maxLen)
      .map(t => s"SELECT word, lw, ps FROM ${p}q$t WHERE j = len(word)")
      .mkString("\n      UNION ALL\n      ")
    s"""${p}q0 AS MATERIALIZED (
      SELECT word, CAST(0 AS BIGINT) AS j, CAST(0 AS BIGINT) AS lw,
        CAST([] AS VARCHAR[]) AS ps
      FROM (SELECT DISTINCT word FROM wf)),
    ${steps.mkString(",\n    ")},
    ${p}allp AS MATERIALIZED (
      $allUnion),
    ${p}mxq AS (SELECT word, MAX(lw) AS m FROM ${p}allp GROUP BY word),
    ${p}rwq AS MATERIALIZED (
      SELECT a.word, a.ps,
        CAST(FLOOR(exp(CAST(a.lw - m.m AS DOUBLE) / 1000000000.0)
          * 1000000000.0 + 0.5) AS BIGINT) AS r
      FROM ${p}allp a JOIN ${p}mxq m USING (word)),
    ${p}zq AS (SELECT word, CAST(SUM(r) AS BIGINT) AS z FROM ${p}rwq GROUP BY word),
    ${p}nq AS (
      SELECT word, piece, CAST(SUM(r) AS BIGINT) AS n
      FROM (SELECT word, unnest(ps) AS piece, r FROM ${p}rwq)
      GROUP BY word, piece),
    ${p}eqq AS (
      SELECT ${p}nq.word, piece,
        CAST((n * 100000 + z // 2) // z AS BIGINT) AS e
      FROM ${p}nq JOIN ${p}zq USING (word)),
    ${p}uq AS MATERIALIZED (
      SELECT piece, CAST(SUM(wf.freq * e) AS BIGINT) AS use_q
      FROM ${p}eqq JOIN wf USING (word) GROUP BY piece),
    ${p}sing3 AS (
      SELECT v.piece, COALESCE(u.use_q, CAST(0 AS BIGINT)) AS use_q
      FROM $vocName v LEFT JOIN ${p}uq u USING (piece) WHERE len(v.piece) = 1),
    ${p}mult3 AS (
      SELECT piece, use_q FROM ${p}uq WHERE len(piece) > 1
      ORDER BY use_q DESC, piece LIMIT $keepMulti),
    ${p}kept3 AS (SELECT * FROM ${p}sing3 UNION ALL SELECT * FROM ${p}mult3),
    ${p}tot3 AS (
      SELECT CAST(SUM(use_q) + COUNT(*) * 100000 AS BIGINT) AS total
      FROM ${p}kept3)"""
  }

  /** Replay of [[Tables.asMarkupLines]] — the markup-line fixture law
    * (8-token lines; `#` first-word swap %13, `-` bullet prepend %7, `...`
    * append %11) — ending in `mlines(doc_id, line_no, ws)`. Shared by the
    * Gopher-rule and line-dedup twins.
    */
  val markupLinesCtes: String =
    """mtoks AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |mnums AS (
      |  SELECT doc_id, toks,
      |    unnest(range((len(toks)-1)//8 + 1)) AS line_no
      |  FROM mtoks),
      |mlines0 AS (
      |  SELECT doc_id, line_no,
      |    toks[line_no*8+1 : line_no*8+8] AS ws0
      |  FROM mnums),
      |mlines1 AS (
      |  SELECT doc_id, line_no,
      |    CASE WHEN (doc_id*3 + line_no) % 13 = 0
      |         THEN list_prepend('#', ws0[2:8]) ELSE ws0 END AS ws1
      |  FROM mlines0),
      |mlines2 AS (
      |  SELECT doc_id, line_no,
      |    CASE WHEN (doc_id + line_no) % 7 = 0
      |         THEN list_prepend('-', ws1) ELSE ws1 END AS ws2
      |  FROM mlines1),
      |mlines AS (
      |  SELECT doc_id, line_no,
      |    CASE WHEN (doc_id + line_no) % 11 = 0
      |         THEN list_append(ws2, '...') ELSE ws2 END AS ws
      |  FROM mlines2)""".stripMargin

  /** Replay of [[operators.Wordpiece.trainVocab]]: position-aware
    * substring counts over the word-frequency table (plain at start,
    * `##`-continuation later), singles + top-60 multis → `wpvoc(piece,
    * core, is_cont, cnt)`.
    */
  private val wpVocabCtes: String =
    """wpwf AS (
      |  SELECT word, COUNT(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY word),
      |wppos AS (
      |  SELECT freq, word, unnest(range(1, length(word) + 1)) AS p
      |  FROM wpwf),
      |wplen AS (
      |  SELECT freq, word, p,
      |    unnest(range(1, least(4, length(word) - p + 1) + 1)) AS l
      |  FROM wppos),
      |wpcnt AS (
      |  SELECT (p > 1) AS is_cont, substring(word, p, l) AS core,
      |    CAST(SUM(freq) AS BIGINT) AS cnt
      |  FROM wplen GROUP BY 1, 2),
      |wpmult AS (
      |  SELECT * FROM wpcnt WHERE length(core) > 1
      |  ORDER BY cnt DESC, is_cont ASC, core ASC LIMIT 60),
      |wpvoc AS MATERIALIZED (
      |  SELECT CASE WHEN is_cont THEN '##' || core ELSE core END AS piece,
      |    core, is_cont, cnt
      |  FROM (SELECT * FROM wpcnt WHERE length(core) = 1
      |        UNION ALL SELECT * FROM wpmult))""".stripMargin

  /** Replay of [[operators.Wordpiece.segmentWords]]: `maxLen` greedy
    * longest-match steps (each consumes ≥ 1 char; finished words pass
    * through, surplus steps are no-ops) → `wseg(word, np, seg)`.
    */
  private def wordpieceSegCtes(maxLen: Int): String = {
    val steps = (0 until maxLen).map { k =>
      s"""wbest$k AS MATERIALIZED (
         |  SELECT s.word, s.pos, s.np, s.seg, MAX(length(v.core)) AS bl
         |  FROM wst$k s JOIN wpvoc v
         |    ON v.is_cont = (s.pos > 1)
         |   AND v.core = substring(s.word, s.pos, length(v.core))
         |  WHERE s.pos <= length(s.word)
         |  GROUP BY 1, 2, 3, 4),
         |wst${k + 1} AS MATERIALIZED (
         |  SELECT word, pos, np, seg FROM wst$k WHERE pos > length(word)
         |  UNION ALL
  SELECT word, pos + bl AS pos, np + 1 AS np,
    concat(CASE WHEN seg = '' THEN '' ELSE concat(seg, ' ') END,
      CASE WHEN pos > 1 THEN '##' ELSE '' END,
      substring(word, pos, bl)) AS seg
  FROM wbest$k)"""
    }
    s"""wst0 AS MATERIALIZED (
       |  SELECT word, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np,
       |    '' AS seg
       |  FROM wpwf),
       |${steps.mkString(",\n")},
       |wseg AS (SELECT word, np, seg FROM wst$maxLen)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "text_wordpiece_vocab" ->
      s"""WITH $wpVocabCtes
         |SELECT piece, cnt FROM wpvoc ORDER BY piece""".stripMargin,

    "text_wordpiece_segs" ->
      s"""WITH $wpVocabCtes,
         |${wordpieceSegCtes(12)}
         |SELECT word, np AS n_pieces, seg FROM wseg
         |ORDER BY word""".stripMargin,

    "text_wordpiece_tokens" ->
      s"""WITH $wpVocabCtes,
         |${wordpieceSegCtes(12)},
         |wocc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |         FROM documents)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(np) AS BIGINT) AS n_pieces
         |FROM wocc JOIN wseg USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_gopher_rules" ->
      s"""WITH $markupLinesCtes,
         |glin AS (
         |  SELECT doc_id, COUNT(*) AS n_lines,
         |    CAST(SUM(CASE WHEN ws[1] = '-' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_bullet,
         |    CAST(SUM(CASE WHEN ws[len(ws)] = '...' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_ellipsis
         |  FROM mlines GROUP BY doc_id),
         |gwords AS (SELECT doc_id, unnest(ws) AS w FROM mlines),
         |gagg AS (
         |  SELECT doc_id, COUNT(*) AS n_words,
         |    CAST(SUM(length(w)) AS BIGINT) AS sum_len,
         |    CAST(SUM(CASE WHEN w IN ('#', '...') THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_sym,
         |    CAST(SUM(CASE WHEN regexp_matches(w, '[a-zA-Z]') THEN 1
         |      ELSE 0 END) AS BIGINT) AS n_alpha,
         |    COUNT(DISTINCT CASE WHEN w IN ('the', 'a', 'of', 'and', 'to')
         |      THEN w END) AS n_stop
         |  FROM gwords GROUP BY doc_id),
         |grat AS (
         |  SELECT g.doc_id, g.n_words, l.n_lines,
         |    FLOOR(CAST(sum_len AS DOUBLE) / n_words * 10000.0 + 0.5)
         |      / 10000.0 AS mean_word_len,
         |    FLOOR(CAST(n_sym AS DOUBLE) / n_words * 10000.0 + 0.5)
         |      / 10000.0 AS sym_ratio,
         |    FLOOR(CAST(n_bullet AS DOUBLE) / n_lines * 10000.0 + 0.5)
         |      / 10000.0 AS bullet_frac,
         |    FLOOR(CAST(n_ellipsis AS DOUBLE) / n_lines * 10000.0 + 0.5)
         |      / 10000.0 AS ellipsis_frac,
         |    FLOOR(CAST(n_alpha AS DOUBLE) / n_words * 10000.0 + 0.5)
         |      / 10000.0 AS alpha_frac,
         |    g.n_stop
         |  FROM gagg g JOIN glin l USING (doc_id)),
         |gflag AS (
         |  SELECT *,
         |    CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1
         |      ELSE 0 END AS BIGINT) AS r_wordcount,
         |    CAST(CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |      THEN 1 ELSE 0 END AS BIGINT) AS r_meanlen,
         |    CAST(CASE WHEN sym_ratio <= 0.1 THEN 1 ELSE 0 END AS BIGINT)
         |      AS r_symbols,
         |    CAST(CASE WHEN bullet_frac <= 0.9 THEN 1 ELSE 0 END AS BIGINT)
         |      AS r_bullets,
         |    CAST(CASE WHEN ellipsis_frac <= 0.3 THEN 1 ELSE 0 END
         |      AS BIGINT) AS r_ellipsis,
         |    CAST(CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS BIGINT)
         |      AS r_alpha,
         |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT)
         |      AS r_stopwords
         |  FROM grat)
         |SELECT *,
         |  CAST(CASE WHEN r_wordcount + r_meanlen + r_symbols + r_bullets
         |    + r_ellipsis + r_alpha + r_stopwords = 7 THEN 1 ELSE 0 END
         |    AS BIGINT) AS keep
         |FROM gflag ORDER BY doc_id""".stripMargin,

    "text_unigram_vocab" ->
      s"""WITH $unigramVocabCtes
         SELECT piece, cnt, score_q FROM voc ORDER BY piece""",

    "text_unigram_em" ->
      s"""WITH $unigramVocabCtes,
         ${unigramSegCtes(12)},
         ${unigramEmCtes(12, 40)}
         SELECT piece, use_cnt,
           CAST(FLOOR(ln(CAST(use_cnt + 1 AS DOUBLE) / CAST(total AS DOUBLE))
             * 1000000000.0 + 0.5) AS BIGINT) AS score_q
         FROM kept2, tot2 ORDER BY piece""",

    "text_unigram_em_soft" ->
      s"""WITH $unigramVocabCtes,
         ${unigramSoftCtes(12, 40)}
         SELECT piece, use_q,
           CAST(FLOOR(ln(CAST(use_q + 100000 AS DOUBLE)
               / CAST(total AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
             AS score_q
         FROM kept3, tot3 ORDER BY piece""",

    "text_unigram_em_soft2" ->
      s"""WITH $unigramVocabCtes,
         ${unigramSoftCtes(12, 40)},
         voc2 AS MATERIALIZED (
           SELECT piece,
             CAST(FLOOR(ln(CAST(use_q + 100000 AS DOUBLE)
                 / CAST(total AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
               AS score_q
           FROM kept3, tot3),
         ${unigramSoftCtes(12, 40, "r2", "voc2")}
         SELECT piece, use_q,
           CAST(FLOOR(ln(CAST(use_q + 100000 AS DOUBLE)
               / CAST(total AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
             AS score_q
         FROM r2kept3, r2tot3 ORDER BY piece""",

    "text_unigram_tokens" ->
      s"""WITH $unigramVocabCtes,
         ${unigramSegCtes(12)},
         occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents)
         SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces,
           CAST(SUM(sq) AS BIGINT) AS score_q
         FROM occ JOIN seg USING (word)
         GROUP BY doc_id ORDER BY doc_id""",

    "text_bpe_merges" ->
      s"""$bpeCtes
         |SELECT * FROM (
         |${(1 to 8).map(r =>
             s"  SELECT $r AS merge_rank, l AS left_sym, r AS right_sym, cnt FROM p$r")
            .mkString("\n  UNION ALL\n")}
         |) ORDER BY merge_rank""".stripMargin,

    "text_bpe_vocab" ->
      s"""$bpeCtes
         |SELECT word, freq, syms FROM w8 ORDER BY word""".stripMargin,

    "text_bpe_tokens" ->
      s"""$bpeCtes,
         |f AS (
         |  SELECT word, len(string_split(trim(syms, '~'), '~~')) AS nsym
         |  FROM w8),
         |d AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(nsym) AS BIGINT) AS n_bpe_tokens
         |FROM d JOIN f USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // vocab-join application path: identical semantics, identical twin
    "text_bpe_tokens_vocab" ->
      s"""$bpeCtes,
         |f AS (
         |  SELECT word, len(string_split(trim(syms, '~'), '~~')) AS nsym
         |  FROM w8),
         |d AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(nsym) AS BIGINT) AS n_bpe_tokens
         |FROM d JOIN f USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      s"""SELECT doc_id,
         |  length(text) AS len_chars,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  len(regexp_extract_all(text, '$bpeRegex')) AS n_bpeish_tokens,
         |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS distinct_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang AS lang_declared,
         |    ${markerSql("en")} AS s_en, ${markerSql("es")} AS s_es,
         |    ${markerSql("de")} AS s_de, ${markerSql("fr")} AS s_fr,
         |    ${markerSql("zh")} AS s_zh
         |  FROM documents)
         |SELECT doc_id, lang_declared,
         |  CASE WHEN s_zh > GREATEST(s_en, s_es, s_de, s_fr) THEN 'zh'
         |       WHEN s_fr > GREATEST(s_en, s_es, s_de) THEN 'fr'
         |       WHEN s_de > GREATEST(s_en, s_es) THEN 'de'
         |       WHEN s_es > s_en THEN 'es'
         |       ELSE 'en' END AS lang_predicted
         |FROM scored ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score_raw,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS diversity_raw,
         |    LEAST(CAST(${markerSql("en")} AS DOUBLE)
         |      / len(string_split(text, ' ')) * 5.0, 1.0) AS stop_score_raw
         |  FROM documents)
         |SELECT doc_id,
         |  FLOOR(len_score_raw * 10000.0 + 0.5) / 10000.0 AS len_score,
         |  FLOOR(diversity_raw * 10000.0 + 0.5) / 10000.0 AS diversity,
         |  FLOOR(stop_score_raw * 10000.0 + 0.5) / 10000.0 AS stop_score,
         |  FLOOR((len_score_raw * 0.4 + diversity_raw * 0.3 + stop_score_raw * 0.3)
         |    * 10000.0 + 0.5) / 10000.0 AS quality
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_source_mix" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    FLOOR((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
         |      + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |        / len(string_split(text, ' ')) * 0.3
         |      + LEAST(CAST(len(list_filter(string_split(text, ' '),
         |          t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
         |        / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3)
         |      * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM documents)
         |SELECT source, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |  FLOOR(CAST(CAST(SUM(CAST(FLOOR(quality * 10000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS DOUBLE) / COUNT(*) + 0.5) / 10000.0 AS mean_quality
         |FROM documents JOIN q USING (doc_id)
         |GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    // Bigram LM twin: same add-one smoothing, same 1e-9 ln quantization,
    // CAST the integer SUM back to BIGINT (DuckDB SUM → HUGEINT).
    // TextRank twin: the same co-occurrence graph and three damped-PageRank
    // iterations replayed as chained CTEs on the 1e-9 long grid (same
    // framework as the BPE merge rounds).
    "text_textrank" -> {
      def iter(prev: String, out: String): String =
        s"""$out AS (
          |  SELECT ed.doc_id, ed.dst AS node,
          |    CAST(150000000 + FLOOR(0.85 * CAST(SUM(CAST(FLOOR(
          |      CAST(r.rq AS DOUBLE) * ed.wt / ed.deg + 0.5) AS BIGINT))
          |      AS DOUBLE) + 0.5) AS BIGINT) AS rq
          |  FROM ed JOIN $prev r ON r.doc_id = ed.doc_id AND r.node = ed.src
          |  GROUP BY ed.doc_id, ed.dst)""".stripMargin
      s"""WITH sp AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |pos AS (SELECT doc_id, unnest(l) AS t,
        |  unnest(range(0, len(l))) AS p FROM sp),
        |pr AS (
        |  SELECT a.doc_id, a.t AS src, b.t AS dst
        |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        |    AND (b.p = a.p + 1 OR b.p = a.p + 2) AND a.t <> b.t),
        |und AS (SELECT doc_id, src, dst FROM pr
        |  UNION ALL SELECT doc_id, dst AS src, src AS dst FROM pr),
        |e AS (SELECT doc_id, src, dst, COUNT(*) AS wt
        |  FROM und GROUP BY doc_id, src, dst),
        |dg AS (SELECT doc_id, src, CAST(SUM(wt) AS BIGINT) AS deg
        |  FROM e GROUP BY doc_id, src),
        |ed AS (SELECT e.doc_id, e.src, e.dst, e.wt, dg.deg
        |  FROM e JOIN dg USING (doc_id, src)),
        |r0 AS (SELECT doc_id, src AS node, CAST(1000000000 AS BIGINT) AS rq
        |  FROM dg),
        |${iter("r0", "r1")},
        |${iter("r1", "r2")},
        |${iter("r2", "r3")},
        |rr AS (SELECT doc_id, node, rq, ROW_NUMBER() OVER (
        |  PARTITION BY doc_id ORDER BY rq DESC, node) AS rn FROM r3)
        |SELECT doc_id, node AS token,
        |  FLOOR(CAST(rq AS DOUBLE) / 100000.0 + 0.5) / 10000.0 AS rank_4dp, rn
        |FROM rr WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin
    },

    // NB classifier twin: the same count tables, 1e-9-quantized lns and
    // (score DESC, label) argmax over the same md5-bucket train/test split.
    "text_nb_lang" ->
      """WITH tr AS (
        |  SELECT * FROM documents
        |  WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100) < 80),
        |te AS (
        |  SELECT * FROM documents
        |  WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100) >= 80),
        |occ AS (
        |  SELECT lang AS label, unnest(string_split(text, ' ')) AS token FROM tr),
        |cnt AS (SELECT label, token, COUNT(*) AS c FROM occ GROUP BY label, token),
        |tot AS (SELECT label, COUNT(*) AS ct FROM occ GROUP BY label),
        |voc AS (SELECT COUNT(DISTINCT token) AS v FROM occ),
        |pri AS (
        |  SELECT lang AS label,
        |    CAST(FLOOR(ln(CAST(COUNT(*) AS DOUBLE)
        |      / (SELECT COUNT(*) FROM tr)) * 1000000000.0 + 0.5) AS BIGINT) AS prior_q
        |  FROM tr GROUP BY lang),
        |tocc AS (
        |  SELECT doc_id, lang AS actual,
        |    unnest(string_split(text, ' ')) AS token FROM te),
        |sc AS (
        |  SELECT t.doc_id, t.actual, l.label,
        |    SUM(CAST(FLOOR(ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0)
        |        / (CAST(tt.ct AS DOUBLE) + voc.v)) * 1000000000.0 + 0.5)
        |      AS BIGINT)) AS sq
        |  FROM tocc t
        |  CROSS JOIN (SELECT label FROM tot) l
        |  LEFT JOIN cnt c ON c.label = l.label AND c.token = t.token
        |  JOIN tot tt ON tt.label = l.label, voc
        |  GROUP BY t.doc_id, t.actual, l.label),
        |fin AS (
        |  SELECT doc_id, actual, label,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(sq AS BIGINT) + prior_q DESC, label) AS rn
        |  FROM sc JOIN pri USING (label))
        |SELECT actual, label AS predicted, COUNT(*) AS n_docs
        |FROM fin WHERE rn = 1
        |GROUP BY actual, label
        |ORDER BY actual, predicted""".stripMargin,

    "text_lm_score" ->
      """WITH occ AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i+1])) AS b
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |o2 AS (SELECT doc_id, b, string_split(b, ' ')[1] AS w1 FROM occ),
        |c2 AS (SELECT b, COUNT(*) AS c2 FROM o2 GROUP BY b),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM o2 GROUP BY w1),
        |v AS (
        |  SELECT COUNT(DISTINCT t) AS v
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
        |s AS (
        |  SELECT o2.doc_id,
        |    CAST(FLOOR(ln((CAST(c2.c2 AS DOUBLE) + 1.0)
        |        / (CAST(c1.c1 AS DOUBLE) + v.v)) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS lnpq
        |  FROM o2 JOIN c2 USING (b) JOIN c1 USING (w1), v)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  FLOOR(CAST(CAST(SUM(lnpq) AS BIGINT) AS DOUBLE) / 1000000000.0
        |    / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS lm_score
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Cross-corpus twin: counts and vocab from the src1 train slice, LEFT
    // joins with COALESCE 0 for unseen bigrams/prefixes, same 1e-9 grid.
    "text_lm_cross" ->
      """WITH tocc AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i+1])) AS b
        |  FROM documents
        |  WHERE source = 'src1' AND len(string_split(text, ' ')) >= 2),
        |t2 AS (SELECT doc_id, b, string_split(b, ' ')[1] AS w1 FROM tocc),
        |c2 AS (SELECT b, COUNT(*) AS c2 FROM t2 GROUP BY b),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM t2 GROUP BY w1),
        |v AS (
        |  SELECT COUNT(DISTINCT t) AS v
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t
        |        FROM documents WHERE source = 'src1')),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i+1])) AS b
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |o2 AS (SELECT doc_id, b, string_split(b, ' ')[1] AS w1 FROM occ),
        |s AS (
        |  SELECT o2.doc_id,
        |    CAST(FLOOR(ln((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 1.0)
        |        / (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + v.v)) * 1000000000.0
        |        + 0.5) AS BIGINT) AS lnpq
        |  FROM o2
        |  LEFT JOIN c2 USING (b)
        |  LEFT JOIN c1 USING (w1)
        |  CROSS JOIN v)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  FLOOR(CAST(CAST(SUM(lnpq) AS BIGINT) AS DOUBLE) / 1000000000.0
        |    / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS lm_score
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // String-shingle twin of the hashed-shingle join (same sets modulo
    // 64-bit hash collisions — the jaccardPairs argument).
    "text_contamination" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i+1] || ' ' ||
        |           string_split(text, ' ')[i+2])) AS shs
        |  FROM documents),
        |probe AS (SELECT DISTINCT unnest(shs) AS s FROM w WHERE doc_id % 100 = 0),
        |d AS (SELECT doc_id, unnest(shs) AS s FROM w)
        |SELECT doc_id, COUNT(*) AS n_hits
        |FROM d JOIN probe USING (s)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ln() is IEEE-double in both engines for these vocab-limited arguments;
    // the 4-dp floor happens BEFORE ranking so ties break identically.
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
        |df AS (
        |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.token, tf.tf,
        |    FLOOR(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000.0 + 0.5)
        |      / 10000.0 AS tfidf
        |  FROM tf JOIN df USING (token), n),
        |r AS (
        |  SELECT doc_id, token, tf, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, token) AS rn
        |  FROM s)
        |SELECT doc_id, token, tf, tfidf, rn FROM r
        |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin,

    "text_termfreq" ->
      """SELECT token, COUNT(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY freq DESC, token
        |LIMIT 20""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Exact twin of TextAnalysis.fingerprintRolling: same left fold, same
    // md5-derived token hash, pure BIGINT arithmetic in both engines.
    "text_fingerprint_rolling" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(string_split(text, ' '),
        |        t -> ('0x' || substring(md5(t), 1, 8))::BIGINT % 2147483647)),
        |    (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp_roll
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Boilerplate twins: positioned string shingles (Spark joins the
    // xxhash64 of the same strings — the text_contamination collision
    // argument); DuckDB range(a, b) is [a, b), so range(pos, pos+3) is the
    // same 3 positions as Spark's inclusive sequence(pos, pos+2).
    "text_boilerplate" ->
      s"""$boilerplateCtes,
         |c AS (SELECT doc_id, COUNT(*) AS covered FROM cov GROUP BY doc_id)
         |SELECT t.doc_id, len(ts) AS n_tokens,
         |  COALESCE(c.covered, 0) AS covered,
         |  FLOOR(CAST(COALESCE(c.covered, 0) AS DOUBLE) / len(ts)
         |    * 10000.0 + 0.5) / 10000.0 AS boiler_ratio
         |FROM t LEFT JOIN c USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_boilerplate_strip" ->
      s"""$boilerplateCtes,
         |tok AS (
         |  SELECT doc_id, i - 1 AS p, ts[i] AS token
         |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM t)),
         |kept AS (
         |  SELECT tok.doc_id, tok.p, tok.token
         |  FROM tok ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p),
         |agg AS (
         |  SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(agg.clean_text, '') AS clean_text
         |FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    GREATEST(len(toks) - 2, 0) AS total,
        |    len(list_distinct(list_transform(
        |      range(1, GREATEST(len(toks) - 2, 0) + 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS dn
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN total = 0 THEN 0.0
        |       ELSE FLOOR(CAST(total - dn AS DOUBLE) / total * 10000.0 + 0.5)
        |            / 10000.0 END AS rep_ratio
        |FROM c ORDER BY doc_id""".stripMargin,

    // Hashing-trick embedding replay: unigrams + bigrams (the cur_dsir
    // feature spelling), bucket = first 8 md5 hex digits mod 64, sign =
    // digit 9's parity, value = per-bucket signed count; the 64-dim grid
    // LEFT JOIN fills the zeros Spark's sequence-transform assembly emits.
    "text_embed" ->
      s"""WITH $embedCntCte,
         |grid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM documents))
         |SELECT g.doc_id AS vec_id, g.dim,
         |  CAST(COALESCE(cnt.c, 0) AS REAL) AS v
         |FROM grid g LEFT JOIN cnt ON g.doc_id = cnt.doc_id AND g.dim = cnt.b
         |ORDER BY vec_id, dim""".stripMargin,

    // The idf-weighted twin: df = docs containing the feature, idf on the
    // 1e-3 integer grid, bucket value = Σ ±idf_q — exact longs end to end.
    "text_embed_idf" ->
      s"""WITH ${embedIdfCntCteFrom("documents", "icnt")},
        |igrid AS (
        |  SELECT doc_id, unnest(range(0, 64)) AS dim
        |  FROM (SELECT DISTINCT doc_id FROM documents))
        |SELECT g.doc_id AS vec_id, g.dim,
        |  CAST(COALESCE(icnt.c, 0) AS REAL) AS v
        |FROM igrid g LEFT JOIN icnt ON g.doc_id = icnt.doc_id
        |  AND g.dim = icnt.b
        |ORDER BY vec_id, dim""".stripMargin,

    // BM25 twin: the full scoring-chain replay (bm25Ctes) + the rank cut.
    "text_bm25_topk" ->
      s"""WITH ${bm25Ctes()}
        |SELECT CAST(0 AS BIGINT) AS query_id, doc_id, score_q, rn FROM (
        |  SELECT doc_id, score_q,
        |    ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rn
        |  FROM bsc)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,

    // maxsim twin: bm25 first stage → candidate cut → per-position
    // 3-word windows for query + candidates (1-based slice bounds) →
    // window hashed-TF counts → sparse shared-bucket pairwise cosines →
    // clamped per-(doc, qpos) max → 1e-6-grid quantized sum → rank,
    // anchored on the candidate set (zero-overlap candidates score 0)
    "text_maxsim_rerank" ->
      s"""WITH ${bm25Ctes()},
        |mcand AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |      ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rn
        |    FROM bsc)
        |  WHERE rn <= 10),
        |qtk AS (SELECT string_split(text, ' ') AS ts FROM documents
        |  WHERE doc_id = 0),
        |qwin AS (
        |  SELECT CAST(i - 1 AS BIGINT) AS doc_id,
        |    array_to_string(ts[greatest(i - 1, 1) : least(i + 1, len(ts))],
        |      ' ') AS text
        |  FROM (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM qtk)),
        |${embedCntCteFrom("qwin", "wq")},
        |dtk AS (
        |  SELECT d.doc_id, string_split(d.text, ' ') AS ts
        |  FROM documents d SEMI JOIN mcand ON d.doc_id = mcand.doc_id),
        |dwin AS (
        |  SELECT doc_id * 1048576 + i - 1 AS doc_id,
        |    array_to_string(ts[greatest(i - 1, 1) : least(i + 1, len(ts))],
        |      ' ') AS text
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM dtk)),
        |${embedCntCteFrom("dwin", "wd")},
        |wqn AS (SELECT doc_id AS q_id, SUM(CAST(c AS DOUBLE) * c) AS n2
        |  FROM wqcnt GROUP BY 1),
        |wdn AS (SELECT doc_id AS d_key, SUM(CAST(c AS DOUBLE) * c) AS n2
        |  FROM wdcnt GROUP BY 1),
        |wdot AS (
        |  SELECT q.doc_id AS q_id, d.doc_id AS d_key,
        |    SUM(CAST(q.c AS DOUBLE) * d.c) AS dot
        |  FROM wqcnt q JOIN wdcnt d ON q.b = d.b
        |  GROUP BY 1, 2),
        |wsim AS (
        |  SELECT w.q_id, w.d_key // 1048576 AS doc_id,
        |    w.dot / NULLIF(sqrt(qn.n2) * sqrt(dn.n2), 0) AS cos
        |  FROM wdot w
        |  JOIN wqn qn ON qn.q_id = w.q_id
        |  JOIN wdn dn ON dn.d_key = w.d_key),
        |wmax AS (
        |  SELECT doc_id, q_id, GREATEST(COALESCE(MAX(cos), 0), 0) AS ms
        |  FROM wsim GROUP BY doc_id, q_id),
        |wscore AS (
        |  SELECT doc_id,
        |    CAST(SUM(CAST(FLOOR(ms * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS score_ms
        |  FROM wmax GROUP BY doc_id),
        |wanch AS (
        |  SELECT m.doc_id, COALESCE(w.score_ms, 0) AS score_ms
        |  FROM mcand m LEFT JOIN wscore w ON m.doc_id = w.doc_id)
        |SELECT doc_id, score_ms, rn FROM (
        |  SELECT doc_id, score_ms,
        |    ROW_NUMBER() OVER (ORDER BY score_ms DESC, doc_id) AS rn
        |  FROM wanch)
        |WHERE rn <= 5 ORDER BY rn""".stripMargin,

    // RM3 twin: round-1 chain (bm25Ctes), the 5-doc feedback cut, the
    // Σ tf·idf_q expansion-term cut (originals anti-joined away), the
    // expanded term set, and the round-2 scoring replay
    "text_bm25_rm3" ->
      s"""WITH ${bm25Ctes()},
        |fb AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |      ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rn
        |    FROM bsc)
        |  WHERE rn <= 5),
        |expt AS (
        |  SELECT t FROM (
        |    SELECT f.t, CAST(SUM(f.tf * i.idf_q) AS BIGINT) AS w
        |    FROM btf f
        |    SEMI JOIN fb ON f.doc_id = fb.doc_id
        |    JOIN bidf i USING (t)
        |    ANTI JOIN bq ON f.t = bq.t
        |    GROUP BY f.t
        |    ORDER BY w DESC, t LIMIT 10)),
        |bq2 AS (SELECT t FROM bq UNION SELECT t FROM expt),
        |bsc2 AS (
        |  SELECT f.doc_id,
        |    CAST(SUM(CAST(FLOOR(CAST(i.idf_q * f.tf AS DOUBLE) * 2.2
        |      / (CAST(f.tf AS DOUBLE) + 0.3
        |         + 0.9 * (CAST(d.dl AS DOUBLE) / (SELECT avgdl FROM bavg)))
        |      + 0.5) AS BIGINT)) AS BIGINT) AS score_q
        |  FROM btf f
        |  JOIN bq2 ON f.t = bq2.t
        |  JOIN bidf i ON f.t = i.t
        |  JOIN bdl d ON d.doc_id = f.doc_id
        |  WHERE f.doc_id <> 0
        |  GROUP BY f.doc_id)
        |SELECT doc_id, score_q, rn FROM (
        |  SELECT doc_id, score_q,
        |    ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rn
        |  FROM bsc2)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,

    // set RM3 twin: the shared base tables, the SET round-1 chain
    // (bm25AllCtes), per-query feedback and expansion cuts (query-keyed
    // windows), per-query expanded term sets, and the keyed round-2
    // scoring replay
    "text_bm25_rm3_all" ->
      s"""WITH qset AS (SELECT CAST(unnest([0, 5]) AS BIGINT) AS query_id),
        |${bm25BaseCtes()},
        |${bm25AllCtes()},
        |fball AS (
        |  SELECT query_id, doc_id FROM (
        |    SELECT query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY score_q DESC, doc_id) AS rn
        |    FROM bscall)
        |  WHERE rn <= 5),
        |expw AS (
        |  SELECT fb.query_id, f.t, CAST(SUM(f.tf * i.idf_q) AS BIGINT) AS w
        |  FROM btf f
        |  JOIN fball fb ON f.doc_id = fb.doc_id
        |  JOIN bidf i ON f.t = i.t
        |  ANTI JOIN bqall q ON q.query_id = fb.query_id AND q.t = f.t
        |  GROUP BY 1, 2),
        |expall AS (
        |  SELECT query_id, t FROM (
        |    SELECT query_id, t,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY w DESC, t) AS rn
        |    FROM expw)
        |  WHERE rn <= 10),
        |bq2all AS (SELECT query_id, t FROM bqall
        |  UNION SELECT query_id, t FROM expall),
        |bsc2all AS (
        |  SELECT bq.query_id, f.doc_id,
        |    CAST(SUM(CAST(FLOOR(CAST(i.idf_q * f.tf AS DOUBLE) * 2.2
        |      / (CAST(f.tf AS DOUBLE) + 0.3
        |         + 0.9 * (CAST(d.dl AS DOUBLE) / (SELECT avgdl FROM bavg)))
        |      + 0.5) AS BIGINT)) AS BIGINT) AS score_q
        |  FROM btf f
        |  JOIN bq2all bq ON f.t = bq.t
        |  JOIN bidf i ON f.t = i.t
        |  JOIN bdl d ON d.doc_id = f.doc_id
        |  WHERE f.doc_id <> bq.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, doc_id, score_q, rn FROM (
        |  SELECT query_id, doc_id, score_q,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score_q DESC, doc_id) AS rn
        |  FROM bsc2all)
        |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin,

    // set MaxSim twin: per-query first-stage candidates from the SET
    // round-1 chain, packed (query, pos) window keys on BOTH sides, the
    // sparse shared-bucket pairwise sims, per-(query, doc, q pos)
    // clamped maxes, the quantized per-(query, doc) sum, and the
    // candidate-anchored per-query re-rank
    "text_maxsim_rerank_all" ->
      s"""WITH qset AS (SELECT CAST(unnest([0, 5]) AS BIGINT) AS query_id),
        |${bm25BaseCtes()},
        |${bm25AllCtes()},
        |mcand AS (
        |  SELECT query_id, doc_id FROM (
        |    SELECT query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY score_q DESC, doc_id) AS rn
        |    FROM bscall)
        |  WHERE rn <= 10),
        |qtk AS (
        |  SELECT d.doc_id, string_split(d.text, ' ') AS ts
        |  FROM documents d SEMI JOIN qset ON d.doc_id = qset.query_id),
        |qwin AS (
        |  SELECT doc_id * 1048576 + i - 1 AS doc_id,
        |    array_to_string(ts[greatest(i - 1, 1) : least(i + 1, len(ts))],
        |      ' ') AS text
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM qtk)),
        |${embedCntCteFrom("qwin", "wq")},
        |dtk AS (
        |  SELECT d.doc_id, string_split(d.text, ' ') AS ts
        |  FROM documents d
        |  SEMI JOIN (SELECT DISTINCT doc_id FROM mcand) c
        |    ON d.doc_id = c.doc_id),
        |dwin AS (
        |  SELECT doc_id * 1048576 + i - 1 AS doc_id,
        |    array_to_string(ts[greatest(i - 1, 1) : least(i + 1, len(ts))],
        |      ' ') AS text
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM dtk)),
        |${embedCntCteFrom("dwin", "wd")},
        |wqn AS (SELECT doc_id AS q_id, SUM(CAST(c AS DOUBLE) * c) AS n2
        |  FROM wqcnt GROUP BY 1),
        |wdn AS (SELECT doc_id AS d_key, SUM(CAST(c AS DOUBLE) * c) AS n2
        |  FROM wdcnt GROUP BY 1),
        |wdot AS (
        |  SELECT q.doc_id AS q_id, d.doc_id AS d_key,
        |    SUM(CAST(q.c AS DOUBLE) * d.c) AS dot
        |  FROM wqcnt q JOIN wdcnt d ON q.b = d.b
        |  GROUP BY 1, 2),
        |wsim AS (
        |  SELECT w.q_id, w.d_key // 1048576 AS doc_id,
        |    w.dot / NULLIF(sqrt(qn.n2) * sqrt(dn.n2), 0) AS cos
        |  FROM wdot w
        |  JOIN wqn qn ON qn.q_id = w.q_id
        |  JOIN wdn dn ON dn.d_key = w.d_key),
        |wmax AS (
        |  SELECT doc_id, q_id, GREATEST(COALESCE(MAX(cos), 0), 0) AS ms
        |  FROM wsim GROUP BY doc_id, q_id),
        |wscore AS (
        |  SELECT q_id // 1048576 AS query_id, doc_id,
        |    CAST(SUM(CAST(FLOOR(ms * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS score_ms
        |  FROM wmax GROUP BY 1, 2),
        |wanch AS (
        |  SELECT m.query_id, m.doc_id, COALESCE(w.score_ms, 0) AS score_ms
        |  FROM mcand m LEFT JOIN wscore w
        |    ON m.query_id = w.query_id AND m.doc_id = w.doc_id)
        |SELECT query_id, doc_id, score_ms, rn FROM (
        |  SELECT query_id, doc_id, score_ms,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score_ms DESC, doc_id) AS rn
        |  FROM wanch)
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,

    // the incremental twin IS the full-corpus chain: append ≡ rebuild
    "text_bm25_incr" ->
      s"""WITH ${bm25Ctes()}
        |SELECT CAST(0 AS BIGINT) AS query_id, doc_id, score_q, rn FROM (
        |  SELECT doc_id, score_q,
        |    ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rn
        |  FROM bsc)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,

    "text_phrase_topk" -> phraseSql,
    // the incremental twin IS the full-corpus chain: positions are
    // per-document, so append ≡ rebuild (the text_bm25_incr law)
    "text_phrase_incr" -> phraseSql
  )

  // full-corpus phrase-retrieval replay, shared by the materialized-store
  // probe and its incremental sibling
  private def phraseSql: String =
      """WITH ppq AS MATERIALIZED (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t,
        |    unnest(range(0, len(string_split(text, ' ')))) AS pos
        |  FROM documents),
        |ptri AS (
        |  SELECT a.t AS t0, b.t AS t1, c.t AS t2, COUNT(*) AS cnt
        |  FROM ppq a
        |  JOIN ppq b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  JOIN ppq c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |  GROUP BY 1, 2, 3
        |  ORDER BY cnt DESC, t0, t1, t2 LIMIT 3),
        |pph AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, t0, t1, t2)
        |    AS BIGINT) AS phrase_id, t0, t1, t2
        |  FROM ptri),
        |pterms AS (
        |  SELECT phrase_id, unnest([t0, t1, t2]) AS term,
        |    unnest(range(0, 3)) AS ppos, CAST(3 AS BIGINT) AS plen
        |  FROM pph),
        |phits AS (
        |  SELECT p.phrase_id, p.plen, q.doc_id, q.pos - p.ppos AS start
        |  FROM ppq q JOIN pterms p ON q.t = p.term),
        |pocc AS (
        |  SELECT phrase_id, doc_id, COUNT(*) AS n_occurrences
        |  FROM (
        |    SELECT phrase_id, plen, doc_id, start, COUNT(*) AS nt
        |    FROM phits GROUP BY 1, 2, 3, 4)
        |  WHERE nt = plen
        |  GROUP BY 1, 2)
        |SELECT phrase_id, doc_id,
        |  CAST(n_occurrences AS BIGINT) AS n_occurrences, rn
        |FROM (
        |  SELECT phrase_id, doc_id, n_occurrences,
        |    ROW_NUMBER() OVER (PARTITION BY phrase_id
        |      ORDER BY n_occurrences DESC, doc_id) AS rn
        |  FROM pocc)
        |WHERE rn <= 10 ORDER BY phrase_id, rn""".stripMargin

  /** Shared replay of [[graft.operators.Embed.hashedTf]]'s (doc, bucket)
    * signed-count table — `cnt(doc_id, b, c)` — for text_embed and the
    * embedded-retrieval twins in [[SimilarityQueries]]. A `def`, not a
    * `val`: it is referenced from the `oracle` map declared ABOVE it, and
    * object vals initialize in source order (a val here would interpolate
    * as "null").
    */
  private[graft] def embedCntCte: String = embedCntCteFrom("documents")

  /** Shared replay of [[graft.operators.Bm25.topKAll]]'s scoring chain
    * ending in `bsc(doc_id, score_q)` — postings, doc lengths, the
    * (N, Σdl) stats row, 1e-3-grid Lucene idf, the query doc's distinct
    * terms, and the exact-integer per-document score sum (every FLOOR
    * input is a fixed IEEE tree over exact integers; the 2.2/0.3/0.9
    * constants are literals on both sides — see the Bm25 scaladoc).
    * Used by text_bm25_topk and the hybrid-fusion twin.
    */
  /** `queryTextSql` (a SQL string literal, e.g. `'fast vector scan'`)
    * switches the query side to RAW TEXT: Q = the literal's distinct
    * whitespace tokens and NO self-exclusion (the query is not a corpus
    * member) — the [[graft.operators.Bm25.topKText]] twin. Empty = the
    * corpus-doc query form (`queryDocId`).
    */
  /** The query-independent half of the BM25 replay — postings, doc
    * lengths, corpus stats, 1e-3-grid Lucene idf — shared by the
    * single-query, raw-text, and SET-oriented twins.
    */
  private[graft] def bm25BaseCtes(src: String = "documents"): String =
    s"""btf AS MATERIALIZED (
      |  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM $src)
      |  GROUP BY doc_id, t),
      |bdl AS MATERIALIZED (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM btf GROUP BY doc_id),
      |bstats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl
      |  FROM bdl),
      |bavg AS (SELECT CAST(sdl AS DOUBLE) / n AS avgdl FROM bstats),
      |bidf AS MATERIALIZED (
      |  SELECT t,
      |    CAST(FLOOR(ln(1.0 + (CAST((SELECT n FROM bstats) AS DOUBLE)
      |        - CAST(COUNT(*) AS DOUBLE) + 0.5)
      |        / (CAST(COUNT(*) AS DOUBLE) + 0.5))
      |      * 1000.0 + 0.5) AS BIGINT) AS idf_q
      |  FROM btf GROUP BY t)""".stripMargin

  /** SET-oriented BM25 scoring replay — `bscall(query_id, doc_id,
    * score_q)` for EVERY query in a caller-defined `qset(query_id)` CTE:
    * per-query distinct term sets, one keyed scoring join, self excluded
    * per query. Requires [[bm25BaseCtes]] in scope.
    */
  private[graft] def bm25AllCtes(src: String = "documents"): String =
    s"""bqall AS (
      |  SELECT DISTINCT query_id, t FROM (
      |    SELECT d.doc_id AS query_id,
      |      unnest(string_split(d.text, ' ')) AS t
      |    FROM $src d SEMI JOIN qset ON d.doc_id = qset.query_id)),
      |bscall AS MATERIALIZED (
      |  SELECT bq.query_id, f.doc_id,
      |    CAST(SUM(CAST(FLOOR(CAST(i.idf_q * f.tf AS DOUBLE) * 2.2
      |      / (CAST(f.tf AS DOUBLE) + 0.3
      |         + 0.9 * (CAST(d.dl AS DOUBLE) / (SELECT avgdl FROM bavg)))
      |      + 0.5) AS BIGINT)) AS BIGINT) AS score_q
      |  FROM btf f
      |  JOIN bqall bq USING (t)
      |  JOIN bidf i USING (t)
      |  JOIN bdl d ON d.doc_id = f.doc_id
      |  WHERE f.doc_id <> bq.query_id
      |  GROUP BY 1, 2)""".stripMargin

  private[graft] def bm25Ctes(src: String = "documents",
                              queryDocId: Long = 0L,
                              queryTextSql: String = ""): String = {
    val bq =
      if (queryTextSql.isEmpty)
        s"""bq AS (SELECT DISTINCT t FROM (
           |  SELECT unnest(string_split(text, ' ')) AS t FROM $src
           |  WHERE doc_id = $queryDocId)),""".stripMargin
      else
        s"""bq AS (SELECT DISTINCT unnest(string_split($queryTextSql, ' '))
           |  AS t),""".stripMargin
    val excl =
      if (queryTextSql.isEmpty) s"\n  WHERE f.doc_id <> $queryDocId" else ""
    s"""${bm25BaseCtes(src)},
      |$bq
      |bsc AS MATERIALIZED (
      |  SELECT f.doc_id,
      |    CAST(SUM(CAST(FLOOR(CAST(i.idf_q * f.tf AS DOUBLE) * 2.2
      |      / (CAST(f.tf AS DOUBLE) + 0.3
      |         + 0.9 * (CAST(d.dl AS DOUBLE) / (SELECT avgdl FROM bavg)))
      |      + 0.5) AS BIGINT)) AS BIGINT) AS score_q
      |  FROM btf f
      |  JOIN bq USING (t)
      |  JOIN bidf i USING (t)
      |  JOIN bdl d ON d.doc_id = f.doc_id$excl
      |  GROUP BY f.doc_id)""".stripMargin
  }

  /** [[embedCntCteFrom]]'s idf-weighted sibling — the shared replay of
    * [[graft.operators.Embed.hashedTfIdf]]'s (doc, bucket) table over any
    * (doc_id, text) relation: tf per (doc, feature), df = that table's own
    * rows per feature, idf on the 1e-3 integer grid with N = |src|, bucket
    * value = Σ ±idf_q·tf — exact longs end to end. The final CTE is named
    * `cntName` so the idf flagship twin can drop it in where the plain
    * `cnt` table went.
    */
  private[graft] def embedIdfCntCteFrom(src: String,
                                        cntName: String = "cnt"): String =
    s"""itoks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM $src),
      |iocc AS (
      |  SELECT doc_id,
      |    unnest(list_concat(ts,
      |      list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])))
      |      AS f
      |  FROM itoks),
      |itf AS MATERIALIZED (
      |  SELECT doc_id, f, COUNT(*) AS tf FROM iocc GROUP BY doc_id, f),
      |idf AS MATERIALIZED (
      |  SELECT f,
      |    CAST(FLOOR(ln(CAST((SELECT COUNT(*) FROM $src) AS DOUBLE)
      |        / COUNT(*)) * 1000.0 + 0.5) AS BIGINT)
      |      AS idf_q
      |  FROM itf GROUP BY f),
      |$cntName AS MATERIALIZED (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(f), 1, 8))::BIGINT % 64 AS b,
      |    CAST(SUM(CASE WHEN ('0x' || substring(md5(f), 9, 1))::BIGINT % 2 = 0
      |             THEN idf_q * tf ELSE -idf_q * tf END) AS BIGINT) AS c
      |  FROM itf JOIN idf USING (f) GROUP BY doc_id, b)""".stripMargin

  /** [[embedIdfCntCteFrom]] with a FROZEN vocabulary: tf from `src`, idf
    * from the GIVEN relation `idfRel(f, idf_q)` — the serving form the
    * incremental refresh twin needs (cur documents weighted by the PREV
    * corpus's idf; unseen features drop via the inner join, the
    * frozen-model treatment). Defines itoks/iocc/itf + `cntName`; no idf
    * CTE of its own.
    */
  private[graft] def embedIdfCntFrozenCteFrom(src: String, idfRel: String,
                                              cntName: String = "cnt"): String =
    s"""itoks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM $src),
      |iocc AS (
      |  SELECT doc_id,
      |    unnest(list_concat(ts,
      |      list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])))
      |      AS f
      |  FROM itoks),
      |itf AS MATERIALIZED (
      |  SELECT doc_id, f, COUNT(*) AS tf FROM iocc GROUP BY doc_id, f),
      |$cntName AS MATERIALIZED (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(f), 1, 8))::BIGINT % 64 AS b,
      |    CAST(SUM(CASE WHEN ('0x' || substring(md5(f), 9, 1))::BIGINT % 2 = 0
      |             THEN idf_q * tf ELSE -idf_q * tf END) AS BIGINT) AS c
      |  FROM itf JOIN $idfRel USING (f) GROUP BY doc_id, b)""".stripMargin

  /** [[embedCntCte]] over any (doc_id, text) relation — the corpus→index
    * flagship embeds the pretrain gate's survivors, not raw `documents`.
    */
  private[graft] def embedCntCteFrom(src: String, p: String = ""): String =
    s"""${p}etoks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM $src),
      |${p}eocc AS (
      |  SELECT doc_id,
      |    unnest(list_concat(ts,
      |      list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])))
      |      AS f
      |  FROM ${p}etoks),
      |${p}cnt AS MATERIALIZED (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(f), 1, 8))::BIGINT % 64 AS b,
      |    CAST(SUM(CASE WHEN ('0x' || substring(md5(f), 9, 1))::BIGINT % 2 = 0
      |             THEN 1 ELSE -1 END) AS BIGINT) AS c
      |  FROM ${p}eocc GROUP BY doc_id, b)""".stripMargin
}
