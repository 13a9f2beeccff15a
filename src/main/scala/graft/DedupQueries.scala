package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dedup queries over `documents` / `embeddings` with DuckDB oracles.
  *
  * The MinHash-LSH query shares the exact-Jaccard oracle: with 32 bands × 4
  * rows the miss probability for a true pair at jaccard ≥ 0.5 is
  * (1 − 0.5⁴)³² ≈ 0.13 in the worst case but the planted near-dups in this
  * corpus sit at ≥ 0.9 where it is (1 − 0.9⁴)³² ≈ 1.5e-15 — so LSH output
  * equals ground truth and the hash-compare is safe.
  */
object DedupQueries {

  /** Left-assoc dot-product term chain for the DuckDB oracle — must mirror
    * VectorOps.dot's fold order exactly (see that scaladoc).
    */
  private[graft] def dotSql(a: String, b: String): String =
    (1 to operators.Similarity.dim)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  /** SQL twin of [[Tables.documentsWithClones]] — the planted-duplicate
    * corpus that keeps the exact-dedup checks non-vacuous.
    */
  val clonedDocsCte: String =
    """WITH documents2 AS (
      |  SELECT * FROM documents
      |  UNION ALL
      |  SELECT doc_id + 150000 AS doc_id, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 50 = 0)""".stripMargin

  /** Boilerplate lines planted into the markup-line fixture for the
    * line-level dedup: a "newsletter" footer on every 10th doc and a
    * "copyright" notice on every 25th (line_no −1/−2 so they sort ahead of
    * content and never collide with real line numbers). The natural corpus
    * has no repeated 8-token lines, so keep-first would pass vacuously
    * without them. SQL twin: the `bl` CTE inside the `dedup_lines` oracle.
    */
  private val boiler1 =
    Seq("subscribe", "to", "our", "newsletter", "now", "click", "here", "today")
  private val boiler2 =
    Seq("all", "rights", "reserved", "copyright", "notice", "applies", "to", "page")

  private[graft] def linesWithBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val lines = Tables.documentsAsMarkupLines(s, dir)
    val bl1 = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), lit(-1).as("line_no"),
        array(boiler1.map(lit): _*).as("ws"))
    val bl2 = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), lit(-2).as("line_no"),
        array(boiler2.map(lit): _*).as("ws"))
    lines.unionByName(bl1).unionByName(bl2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Line-level exact dedup (CCNet): every repeated line keeps only its
    // first (doc_id, line_no) occurrence corpus-wide; documents come back
    // reassembled from surviving lines. Planted newsletter/copyright
    // boilerplate is what gets cut — the dedup granularity that document-
    // level fingerprints can't reach.
    "dedup_lines" -> ((s, dir) =>
      Dedup.dedupLines(linesWithBoilerplate(s, dir)).orderBy("doc_id")),

    // Exact dedup on normalized-content fingerprint; deterministic survivor.
    // Runs on the planted-clone corpus so the collapse path has positive
    // cases (n_copies > 1) — the raw fixture has no exact duplicates.
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactByKey(Tables.documentsWithClones(s, dir),
          TextAnalysis.fingerprintMd5(col("text")), "doc_id")
        .orderBy("doc_id")),

    // Ground-truth near-dup pairs: exact 3-shingle Jaccard ≥ 0.5.
    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), 0.5)
        .orderBy("doc_a", "doc_b")),

    // Containment (subset) duplication: the corpus has no natural excerpts,
    // so plant them — a 40-token prefix excerpt of every 25th document,
    // re-keyed +500000 — and require C(A,B) ≥ 0.9. Each excerpt pairs with
    // its parent at containment 1.0 while their jaccard is far below any
    // near-dup threshold (the case jaccardPairs structurally misses).
    "dedup_containment" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val excerpts = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 40)).as("text"))
      Dedup.containmentPairs(docs.unionByName(excerpts), 0.9)
        .select(col("doc_a"), col("doc_b"),
          (floor(col("containment") * 10000.0 + 0.5) / 10000.0)
            .as("containment_4dp"))
        .orderBy("doc_a", "doc_b")
    }),

    // Bottom-k sketch containment: same contract as dedup_containment on
    // the same planted-excerpt corpus, linear-cost plan — shares the exact
    // oracle because exact subsets are always candidates and the 0.9+
    // pairs here survive the sketch gate with overwhelming probability
    // (see containmentPairsSketch scaladoc).
    "dedup_containment_lsh" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val excerpts = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 40)).as("text"))
      Dedup.containmentPairsSketch(docs.unionByName(excerpts), 0.9)
        .select(col("doc_a"), col("doc_b"),
          (floor(col("containment") * 10000.0 + 0.5) / 10000.0)
            .as("containment_4dp"))
        .orderBy("doc_a", "doc_b")
    }),

    // MinHash-LSH near-dup: same contract, linear-cost plan (see scaladoc
    // for why it shares the exact oracle).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.documents(s, dir), 0.5)
        .orderBy("doc_a", "doc_b")),

    // Incremental dedup: the planted-clone batch (every 50th doc re-keyed)
    // arrives as "new" and is checked against the corpus only — each clone
    // must rediscover its original (j = 1.0) plus the original's near-dup
    // partners; recall shares the dedup_minhash_lsh argument (pairs here
    // sit at j ≥ 0.9, where every band collides w.h.p.), so the oracle is
    // the exact cross-set Jaccard.
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val newBatch = docs.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + 150000L)
      Dedup.minhashPairsAgainst(newBatch, docs, 0.5)
        .orderBy("new_id", "corpus_id")
    }),

    // SimHash near-dup (hamming ≤ 3 over 64-bit signatures) over the
    // md5-derived portable token hash, so DuckDB reproduces the signatures
    // bit-for-bit (xor + bit_count verify the hamming distances).
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), 3, portable = true)
        .orderBy("doc_a", "doc_b")),

    // Near-dup clusters: transitive closure of the near-dup pair graph
    // (min-doc_id label per component) — the "keep one per duplicate
    // cluster" primitive. Pairs come from the LINEAR minhash path (the
    // layout clusters would use at scale); the oracle's recursive CTE
    // closes over the exact-Jaccard pairs, which equal the minhash pairs
    // on this corpus for the same reason dedup_minhash_lsh shares the
    // jaccard oracle (planted near-dups sit at j ≥ 0.9).
    "dedup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(Dedup.materializedMinhashPairs(dir + "#pairs",
          Tables.documents(s, dir), 0.5))
        .orderBy("doc_id")),

    // The same clustering through large-star/small-star contraction
    // (Kiveris et al. 2014) — O(log² n) rounds regardless of component
    // diameter, where min-label propagation pays one shuffle per hop of
    // the longest duplication chain. Shares dedup_clusters' recursive-
    // closure oracle: both must produce the identical component table.
    "dedup_clusters_star" -> ((s, dir) =>
      Dedup.ccStars(Dedup.materializedMinhashPairs(dir + "#pairs",
          Tables.documents(s, dir), 0.5))
        .orderBy("doc_id")),

    // End-to-end corpus dedup: minhash pairs → clusters → keep the longest
    // doc per cluster (ties → min doc_id), unclustered docs untouched.
    "dedup_collapse" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.collapseNearDups(docs,
        Dedup.materializedMinhashPairs(dir + "#pairs", docs, 0.5), col("n_chars"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // Embedding-cosine near-dup pairs (exact, ≥ 0.4).
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingPairs(Tables.embeddings(s, dir), 0.4)
        .orderBy("vec_a", "vec_b")),

    // SemDeDup: same threshold, but pairs only WITHIN IVF clusters — the
    // Σ|cluster|² scale path. indexKey = dir shares the memoized index
    // build with the ann_topk_ivf family.
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semanticDupPairs(Tables.embeddings(s, dir), 0.4, dir)
        .orderBy("vec_a", "vec_b")),

    // Bloom-prefiltered incremental exact dedup: a new batch (every 40th
    // doc re-keyed = planted dups; every (40k+1)th doc with altered text =
    // genuinely novel) checked against the corpus. Output = the novel rows
    // only; semantics are the exact anti-join (the Bloom filter is the
    // shuffle-skipping prefilter, verified by DedupSpec to change nothing).
    "dedup_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val newBatch = docs.filter(col("doc_id") % 40 === 0)
        .withColumn("doc_id", col("doc_id") + 300000L)
        .unionByName(docs.filter(col("doc_id") % 40 === 1)
          .withColumn("doc_id", col("doc_id") + 400000L)
          .withColumn("text", concat(col("text"), lit(" zzznovel"))))
      Dedup.bloomNovel(newBatch, docs, "text", s"bloom-$dir", 100000L)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Exact-substring dedup (Lee et al. 2021): maximal shared token spans
    // ≥ 10 between document pairs, on the planted-clone corpus (clones give
    // full-document spans; natural near-dups give long partial spans).
    // Position-level output so removal could cut exactly the shared text.
    "dedup_substr_spans" -> ((s, dir) =>
      Dedup.exactSubstrSpans(Tables.documentsWithClones(s, dir))
        .orderBy("doc_a", "doc_b", "a_start", "b_start")),

    // Per-pair substring-sharing report: which pairs share the most
    // verbatim text (span counts, longest span, summed span tokens).
    "dedup_substr_report" -> ((s, dir) =>
      Dedup.exactSubstrReport(Tables.documentsWithClones(s, dir))
        .orderBy("doc_a", "doc_b")),

    // The REMOVAL step (Lee et al.'s actual dedup): cut every discovered
    // span from the higher-id document of its pair and reassemble — full
    // clones collapse to '', partial shares lose exactly the shared run.
    // The oracle replays spans + per-position cut/keep + reassembly.
    "dedup_substr_strip" -> ((s, dir) =>
      Dedup.cutSubstrSpans(Tables.documentsWithClones(s, dir))
        .orderBy("doc_id")),

    // End-to-end SemDeDup collapse with measurable effect: semantic pairs →
    // clusters → keep the min-id representative per cluster → per-label
    // diversity BEFORE vs AFTER. Removing semantic near-dups must raise
    // (or hold) mean pairwise distance — the dashboard that proves the
    // curation step did something.
    "dedup_semantic_collapse" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val clusters = Dedup
        .nearDupClusters(Dedup.semanticDupPairs(emb, 0.4, dir), "vec_a", "vec_b")
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
      val survivors = emb.join(clusters, Seq("vec_id"), "left")
        .filter(col("cluster_id").isNull || col("cluster_id") === col("vec_id"))
        .select("vec_id", "embedding", "label")
      val before = graft.operators.Similarity.labelDiversity(emb)
        .select(col("label"), col("n_vecs").as("n_before"),
          col("diversity").as("div_before"))
      val after = graft.operators.Similarity.labelDiversity(survivors)
        .select(col("label"), col("n_vecs").as("n_after"),
          col("diversity").as("div_after"))
      before.join(after, "label")
        .select("label", "n_before", "div_before", "n_after", "div_after")
        .orderBy("label")
    }),

    // Banding-parameter planner: the S-curve P(candidate | jaccard) for
    // the default (32 bands x 4 rows) MinHash config — pure closed-form
    // math, still hash-checked (repeated-multiplication power spelling).
    "dedup_lsh_plan" -> ((s, _) =>
      Dedup.lshPlan(s, bands = 32, rowsPerBand = 4)),

    // Corpus duplication-rate KPI: docs vs distinct fingerprints, 4-dp —
    // on the planted-clone corpus so the rate is provably > 0.
    "dedup_rate" -> ((s, dir) =>
      Tables.documentsWithClones(s, dir)
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(TextAnalysis.fingerprintMd5(col("text"))).as("n_distinct"))
        .select(col("n_docs"), col("n_distinct"),
          (floor((col("n_docs") - col("n_distinct")).cast("double")
            / col("n_docs") * 10000.0 + 0.5) / 10000.0).as("dup_rate")))
  )

  // Shared CTE chain ending in jac(doc_a, doc_b, jaccard) — the exact
  // 3-shingle Jaccard pair table; reused by the pair queries, the cluster
  // oracle's recursive closure, and (over the clone corpus) the
  // leakage-safe split oracle in CurationQueries.
  private[graft] def jaccardBaseFrom(table: String): String =
    s"""w AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i+1] || ' ' ||
      |           string_split(text, ' ')[i+2])) AS shs
      |  FROM $table),
      |sh AS (SELECT doc_id, unnest(shs) AS s FROM w),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT doc_a, doc_b,
      |    CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common) AS jaccard
      |  FROM pairs
      |  JOIN n na ON na.doc_id = doc_a
      |  JOIN n nb ON nb.doc_id = doc_b)""".stripMargin

  private val jaccardBase: String = jaccardBaseFrom("documents")

  private val jaccardSql: String =
    s"""WITH $jaccardBase
      |SELECT doc_a, doc_b, jaccard FROM jac
      |WHERE jaccard >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  // Cross-set twin for the incremental check: the clone batch's shingle
  // sets against the corpus's (reuses jaccardBase's w/sh/n CTEs for the
  // corpus side; same division spelling).
  private val incrementalSql: String =
    s"""WITH $jaccardBase,
      |nw AS (
      |  SELECT doc_id + 150000 AS doc_id, shs FROM w WHERE doc_id % 50 = 0),
      |nsh AS (SELECT doc_id, unnest(shs) AS s FROM nw),
      |nn AS (SELECT doc_id, COUNT(*) AS n_sh FROM nsh GROUP BY doc_id),
      |xp AS (
      |  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS common
      |  FROM nsh a JOIN sh b ON a.s = b.s
      |  GROUP BY 1, 2),
      |xj AS (
      |  SELECT new_id, corpus_id,
      |    CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common) AS jaccard
      |  FROM xp
      |  JOIN nn na ON na.doc_id = new_id
      |  JOIN n nb ON nb.doc_id = corpus_id)
      |SELECT new_id, corpus_id, jaccard FROM xj
      |WHERE jaccard >= 0.5
      |ORDER BY new_id, corpus_id""".stripMargin

  // DuckDB twin of Dedup.md5Hash64: two 32-bit md5 halves recombined into a
  // signed 64-bit value (same no-overflow construction as the Scala side).
  private def md5Hash64Sql(t: String): String =
    s"""((('0x'||substring(md5($t),1,8))::BIGINT
       |   - CASE WHEN ('0x'||substring(md5($t),1,8))::BIGINT >= 2147483648
       |          THEN 4294967296 ELSE 0 END) * 4294967296
       | + ('0x'||substring(md5($t),9,8))::BIGINT)""".stripMargin

  // Twin of the containment queries (exact and sketch path share it): the
  // jaccardBase shingle machinery over documents + planted excerpts, with
  // the containment (not jaccard) verification formula.
  private lazy val containmentSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 500000 AS doc_id,
      |    array_to_string(list_slice(string_split(text, ' '), 1, 40), ' ') AS text
      |  FROM documents WHERE doc_id % 25 = 0),
      |w AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i+1] || ' ' ||
      |           string_split(text, ' ')[i+2])) AS shs
      |  FROM all_docs),
      |sh AS (SELECT doc_id, unnest(shs) AS s FROM w),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |cont AS (
      |  SELECT doc_a, doc_b,
      |    CAST(common AS DOUBLE) / LEAST(na.n_sh, nb.n_sh) AS containment
      |  FROM pairs
      |  JOIN n na ON na.doc_id = doc_a
      |  JOIN n nb ON nb.doc_id = doc_b)
      |SELECT doc_a, doc_b,
      |  FLOOR(containment * 10000.0 + 0.5) / 10000.0 AS containment_4dp
      |FROM cont WHERE containment >= 0.9
      |ORDER BY doc_a, doc_b""".stripMargin

  // Twin of exactSubstrSpans over any (doc_id, text) table: positioned
  // 10-gram strings (the Scala side joins on xxhash64 of the same strings —
  // the standard collision argument), hot-gram cap at df > maxDf, then the
  // same gaps-and-islands run recovery. Ends in spans(doc_a, doc_b,
  // a_start, b_start, span_len); internal names sp/g/occ/hot/cold/m/r.
  // Shared by the span/report/strip queries and the cur_pretrain flagship.
  private[graft] def substrChainFrom(table: String, minLen: Int,
                                     maxDf: Int): String =
    s"""sp AS (SELECT doc_id, string_split(text, ' ') AS l FROM $table),
      |g AS (SELECT doc_id,
      |  list_transform(range(0, greatest(len(l) - ${minLen - 1}, 0)),
      |    i -> array_to_string(l[i+1:i+$minLen], ' ')) AS gs FROM sp),
      |occ AS (SELECT doc_id, unnest(gs) AS gr,
      |  unnest(range(0, len(gs))) AS pos FROM g),
      |hot AS (SELECT gr FROM (
      |  SELECT gr, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gr)
      |  WHERE df > $maxDf),
      |cold AS (SELECT * FROM occ
      |  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.gr = occ.gr)),
      |m AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS d
      |  FROM cold a JOIN cold b ON a.gr = b.gr AND a.doc_id < b.doc_id),
      |r AS (
      |  SELECT *, pos_a - ROW_NUMBER() OVER (
      |    PARTITION BY doc_a, doc_b, d ORDER BY pos_a) AS isl FROM m),
      |spans AS (
      |  SELECT doc_a, doc_b, MIN(pos_a) AS a_start, MIN(pos_b) AS b_start,
      |    COUNT(*) + ${minLen - 1} AS span_len
      |  FROM r GROUP BY doc_a, doc_b, d, isl)""".stripMargin

  private def substrBase(minLen: Int, maxDf: Int): String =
    s"$clonedDocsCte,\n${substrChainFrom("documents2", minLen, maxDf)}"

  /** Recursive-closure component twin shared by `dedup_clusters` (min-label
    * propagation) and `dedup_clusters_star` (star contraction).
    */
  private lazy val clustersSql: String =
    s"""WITH RECURSIVE $jaccardBase,
      |jp AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
      |edges AS (
      |  SELECT doc_a AS s, doc_b AS d FROM jp
      |  UNION ALL
      |  SELECT doc_b AS s, doc_a AS d FROM jp),
      |walk(id, label) AS (
      |  SELECT s, s FROM edges
      |  UNION
      |  SELECT e.s, w2.label FROM edges e JOIN walk w2 ON w2.id = e.d)
      |SELECT id AS doc_id, MIN(label) AS cluster_id
      |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_lines" ->
      s"""WITH ${TextQueries.markupLinesCtes},
         |bl AS (
         |  SELECT doc_id, -1 AS line_no,
         |    ['subscribe', 'to', 'our', 'newsletter', 'now', 'click',
         |     'here', 'today'] AS ws
         |  FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id, -2 AS line_no,
         |    ['all', 'rights', 'reserved', 'copyright', 'notice',
         |     'applies', 'to', 'page'] AS ws
         |  FROM documents WHERE doc_id % 25 = 0),
         |lall AS (
         |  SELECT doc_id, line_no, ws FROM mlines
         |  UNION ALL SELECT doc_id, line_no, ws FROM bl),
         |lk AS (
         |  SELECT doc_id, line_no, ws,
         |    md5(array_to_string(ws, ' ')) AS h,
         |    doc_id * 1048576 + line_no + 2 AS pos
         |  FROM lall),
         |lf AS (SELECT h, MIN(pos) AS first_pos FROM lk GROUP BY h),
         |lm AS (
         |  SELECT lk.doc_id, lk.line_no, lk.ws,
         |    (lk.pos = lf.first_pos) AS kept
         |  FROM lk JOIN lf USING (h))
         |SELECT doc_id, COUNT(*) AS n_lines,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_dropped,
         |  COALESCE(string_agg(CASE WHEN kept
         |      THEN array_to_string(ws, ' ') END, ' ' ORDER BY line_no),
         |    '') AS kept_text
         |FROM lm GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_lsh_plan" -> {
      val sr = "1.0" + " * s" * 4
      val qb = "1.0" + " * (1.0 - sr)" * 32
      s"""WITH g AS (SELECT unnest(range(1, 20)) AS i),
         |sv AS (SELECT i, CAST(i AS DOUBLE) / 20.0 AS s FROM g),
         |p AS (SELECT i, s, $sr AS sr FROM sv),
         |q AS (SELECT i, s, $qb AS qb FROM p)
         |SELECT i, s AS jaccard_s,
         |  FLOOR((1.0 - qb) * 1000000.0 + 0.5) / 1000000.0 AS p_detect_6dp
         |FROM q ORDER BY i""".stripMargin
    },

    "dedup_substr_spans" ->
      s"""${substrBase(10, 20)}
        |SELECT doc_a, doc_b, a_start, b_start, span_len FROM spans
        |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin,

    "dedup_substr_report" ->
      s"""${substrBase(10, 20)}
        |SELECT doc_a, doc_b, COUNT(*) AS n_spans, MAX(span_len) AS max_span,
        |  CAST(SUM(span_len) AS BIGINT) AS span_tokens
        |FROM spans GROUP BY doc_a, doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Spans replay + per-position cut/keep twin: cut positions are the
    // union of [b_start, b_start+span_len) per doc_b (DuckDB range is
    // [a, b)), reassembly is the text_boilerplate_strip idiom.
    "dedup_substr_strip" ->
      s"""${substrBase(10, 20)},
        |cutpos AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT doc_b AS doc_id,
        |      unnest(range(b_start, b_start + span_len)) AS p FROM spans)),
        |tok AS (
        |  SELECT doc_id, i - 1 AS p, l[i] AS token
        |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM sp)),
        |kept AS (
        |  SELECT tok.doc_id, tok.p, tok.token
        |  FROM tok ANTI JOIN cutpos
        |    ON tok.doc_id = cutpos.doc_id AND tok.p = cutpos.p),
        |agg AS (
        |  SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(agg.clean_text, '') AS clean_text
        |FROM documents2 d LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      s"""$clonedDocsCte
        |SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key,
        |  MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents2
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "dedup_jaccard_pairs" -> jaccardSql,
    "dedup_minhash_lsh" -> jaccardSql,
    "dedup_incremental" -> incrementalSql,

    // Same shingle machinery as jaccardBase over documents + planted
    // excerpts, with the containment (not jaccard) verification formula.
    // Shared by the exact op and the bottom-k sketch path (which outputs
    // identical rows — see containmentPairsSketch scaladoc).
    "dedup_containment" -> containmentSql,
    "dedup_containment_lsh" -> containmentSql,

    // Min-reachable-id per component via recursive label walk over the
    // thresholded jaccard pairs (both edge directions + self seed).
    "dedup_clusters" -> clustersSql,

    // star contraction must land on the identical component table — the
    // shared recursive-closure twin IS the cross-algorithm parity proof
    "dedup_clusters_star" -> clustersSql,

    // SimHash: rebuild every 64-bit signature from the portable md5 token
    // hash (bit b = sign of Σ±1 over token-hash bits, ties → 0 — matching
    // graft.plans.SimHash64), then verify hamming via xor + bit_count.
    "dedup_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |h AS (
         |  SELECT doc_id, ${md5Hash64Sql("t")} AS h FROM toks),
         |bits AS (
         |  SELECT doc_id, j,
         |    SUM(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) AS s
         |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS j) js
         |  GROUP BY doc_id, j),
         |sig AS (
         |  SELECT doc_id, CAST(SUM(
         |    CASE WHEN s > 0 THEN
         |      CASE WHEN j = 63 THEN -9223372036854775807 - 1
         |           ELSE (1::BIGINT << CAST(j AS INT)) END
         |    ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Clusters via the recursive closure, then keep-longest per cluster;
    // singleton clusters come from the left join's COALESCE.
    "dedup_collapse" ->
      s"""WITH RECURSIVE $jaccardBase,
        |jp AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS d FROM jp
        |  UNION ALL
        |  SELECT doc_b AS s, doc_a AS d FROM jp),
        |walk(id, label) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT e.s, w2.label FROM edges e JOIN walk w2 ON w2.id = e.d),
        |cl AS (SELECT id, MIN(label) AS cluster_id FROM walk GROUP BY id),
        |d AS (
        |  SELECT doc_id, lang, n_chars,
        |    COALESCE(cl.cluster_id, doc_id) AS clid
        |  FROM documents LEFT JOIN cl ON cl.id = documents.doc_id),
        |r AS (
        |  SELECT doc_id, lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY clid
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM d)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "dedup_rate" ->
      s"""$clonedDocsCte
        |SELECT COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_distinct,
        |  FLOOR(CAST(COUNT(*) - COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS DOUBLE)
        |    / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS dup_rate
        |FROM documents2""".stripMargin,

    // Exact anti-join twin of the Bloom-prefiltered path: the filter is a
    // pure prefilter, so NOT EXISTS on the key reproduces the output.
    "dedup_bloom" ->
      """WITH nb AS (
        |  SELECT doc_id + 300000 AS doc_id, text
        |  FROM documents WHERE doc_id % 40 = 0
        |  UNION ALL
        |  SELECT doc_id + 400000 AS doc_id, text || ' zzznovel' AS text
        |  FROM documents WHERE doc_id % 40 = 1)
        |SELECT nb.doc_id FROM nb
        |WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = nb.text)
        |ORDER BY doc_id""".stripMargin,

    "dedup_embedding" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  (${dotSql("a.embedding", "b.embedding")})
         |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
         |       * sqrt(${dotSql("b.embedding", "b.embedding")})) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE (${dotSql("a.embedding", "b.embedding")})
         |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
         |       * sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    // Collapse-with-effect twin: the dedup_semantic pair chain, the
    // recursive min-label closure, the min-id-representative filter, and
    // the ann_diversity sufficient-statistics chain run twice (b*/s*
    // prefixes: full corpus vs survivors).
    "dedup_semantic_collapse" -> {
      def divChain(p: String, src: String): String =
        s"""${p}idx AS (
           |  SELECT label, embedding,
           |    unnest(range(1, len(embedding) + 1)) AS i
           |  FROM $src),
           |${p}q AS (
           |  SELECT label, i - 1 AS dim,
           |    CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
           |      * 1000000.0 + 0.5) AS BIGINT) AS vq
           |  FROM ${p}idx),
           |${p}pd AS (
           |  SELECT label, dim, CAST(SUM(vq) AS BIGINT) AS sd,
           |    SUM(CAST(vq AS HUGEINT) * vq) AS sd2, COUNT(*) AS n
           |  FROM ${p}q GROUP BY label, dim),
           |${p}ag AS (
           |  SELECT label, MAX(n) AS n, SUM(sd2) AS s2,
           |    SUM(CAST(sd AS HUGEINT) * sd) AS ss
           |  FROM ${p}pd GROUP BY label)""".stripMargin
      def divExpr(t: String): String =
        s"""FLOOR((2.0 * (CAST($t.s2 AS DOUBLE) / $t.n
           |    - CAST($t.ss AS DOUBLE) / $t.n / $t.n)
           |    / 1000000000000.0) * 10000.0 + 0.5) / 10000.0""".stripMargin
      s"""WITH RECURSIVE ${SimilarityQueries.ivfCoreCtes(16)},
         |sem AS (
         |  SELECT aa.vec_id AS va, bb.vec_id AS vb
         |  FROM a2 aa
         |  JOIN a2 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
         |  JOIN embeddings a ON a.vec_id = aa.vec_id
         |  JOIN embeddings b ON b.vec_id = bb.vec_id
         |  WHERE (${dotSql("a.embedding", "b.embedding")})
         |      / (sqrt(${dotSql("a.embedding", "a.embedding")})
         |         * sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4),
         |edges AS (
         |  SELECT va AS s, vb AS d FROM sem
         |  UNION ALL
         |  SELECT vb AS s, va AS d FROM sem),
         |walk(id, lbl) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT e.s, w2.lbl FROM edges e JOIN walk w2 ON w2.id = e.d),
         |cl AS (SELECT id, MIN(lbl) AS cluster_id FROM walk GROUP BY id),
         |surv AS (
         |  SELECT e.label, e.embedding
         |  FROM embeddings e LEFT JOIN cl ON cl.id = e.vec_id
         |  WHERE cl.id IS NULL OR cl.cluster_id = e.vec_id),
         |${divChain("b", "embeddings")},
         |${divChain("s", "surv")}
         |SELECT b.label, b.n AS n_before, ${divExpr("b")} AS div_before,
         |  s.n AS n_after, ${divExpr("s")} AS div_after
         |FROM bag b JOIN sag s ON s.label = b.label
         |ORDER BY b.label""".stripMargin
    },

    // SemDeDup twin: the dedup_embedding pair query restricted to pairs
    // co-assigned by the replayed IVF coarse quantizer (a2 = the same
    // Lloyd-trained assignment CTE chain as the ann_topk_ivf twin).
    "dedup_semantic" ->
      s"""WITH ${SimilarityQueries.ivfCoreCtes(16)}
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  (${dotSql("a.embedding", "b.embedding")})
         |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
         |       * sqrt(${dotSql("b.embedding", "b.embedding")})) AS cosine
         |FROM a2 aa
         |JOIN a2 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
         |JOIN embeddings a ON a.vec_id = aa.vec_id
         |JOIN embeddings b ON b.vec_id = bb.vec_id
         |WHERE (${dotSql("a.embedding", "b.embedding")})
         |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
         |       * sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin
  )
}
