package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** Dataset-curation queries over `documents` with DuckDB oracles. The
  * md5-bucket determinism rule (Curation.hashBucket) is what makes every
  * one of these reproducible cross-engine — no rand() anywhere.
  */
object CurationQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Key-stable train/val/test split: per-split × lang counts.
    "cur_split" -> ((s, dir) =>
      Curation.trainValTest(Tables.documents(s, dir), col("doc_id"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")),

    // Leakage-safe split on the planted-clone corpus: near-dup clusters are
    // the split unit, so clones and their originals always land in the same
    // split (the naive per-doc split provably separates some of them —
    // asserted in CurationSpec).
    "cur_split_safe" -> ((s, dir) => {
      val docs = Tables.documentsWithClones(s, dir)
      Curation.leakageSafeSplit(docs,
        Dedup.materializedMinhashPairs(dir + "#pairsclones", docs, 0.5))
        .orderBy("doc_id")
    }),

    // Deterministic 10% hash sample — the reproducible TABLESAMPLE.
    "cur_sample" -> ((s, dir) =>
      Curation.hashSample(Tables.documents(s, dir), col("doc_id"), 10)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Importance sampling: acceptance probability proportional to document
    // length (capped at 1) — sample long documents more. Same md5-variate
    // determinism as cur_sample; the weight is any [0,1] expression.
    "cur_weighted" -> ((s, dir) =>
      Curation.weightedSample(Tables.documents(s, dir), col("doc_id"),
          least(lit(1.0), col("n_chars").cast("double") / 800.0))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    // Stratified mixing: downsample en to 20%, keep 80% of es/de, drop
    // the rest — the domain-reweighting primitive, key-stable like cur_split.
    "cur_stratified" -> ((s, dir) =>
      Curation.stratifiedSample(Tables.documents(s, dir), col("doc_id"),
          col("lang"), Map("en" -> 20, "es" -> 80, "de" -> 80))
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // PII redaction parity: inject synthetic PII (the corpus has none),
    // redact, fingerprint the result. Proves Java-regex vs RE2 agreement
    // on the exact patterns shipped.
    "cur_redact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("dirty", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1 555-01"),
          col("doc_id"), lit(" card 4111 1111 1111 1111 end")))
        .select(col("doc_id"),
          md5(Curation.redactPii(col("dirty"))).as("fp_redacted"))
        .orderBy("doc_id")),

    // Best-docs-under-budget: highest-quality documents until 10k tokens.
    "cur_budget" -> ((s, dir) => {
      val scored = graft.operators.TextAnalysis
        .qualityScore(Tables.documents(s, dir))
        .join(Tables.documents(s, dir), "doc_id")
        .select(col("doc_id"), col("quality"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Curation.selectUnderBudget(scored, col("quality"), col("doc_id"),
          col("n_tokens"), 10000L)
        .orderBy("doc_id")
    }),

    // Data-mixture construction: four sources filled to their own token
    // budgets by hash-ordered uniform prefix (src3's budget exceeds its
    // volume — the whole-source pass-through path).
    "cur_mixture" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Curation.mixtureSample(docs, "source", col("doc_id"), col("n_tokens"),
          Map("src0" -> 800L, "src1" -> 1000L, "src2" -> 600L, "src3" -> 2000L))
        .orderBy("doc_id")
    }),

    // Quota sampling: EXACTLY 10 docs per lang by smallest md5 variate —
    // WindowGroupLimit keeps ≤ 10 rows/group/partition through the shuffle.
    "cur_sample_k" -> ((s, dir) =>
      Curation.sampleKPerGroup(
          Tables.documents(s, dir).select("doc_id", "lang"),
          col("doc_id"), "lang", 10)
        .orderBy("doc_id")),

    // Temperature-scaled mixture (α = 0.5): per-LANG token budgets ∝
    // √tokens over a 8000-token total — the low-resource-upsampling recipe
    // (en holds 47% of corpus tokens but gets only ~26% of the budget).
    // Budgets are computed by temperedBudgets (quantized-power weights +
    // exact integer split), then filled by the same hash-ordered prefix as
    // cur_mixture.
    "cur_mixture_temp" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val budgets = Curation.temperedBudgets(
        docs, "lang", col("n_tokens"), totalBudget = 8000L)
      Curation.mixtureSample(docs, "lang", col("doc_id"), col("n_tokens"),
          budgets)
        .orderBy("doc_id")
    }),

    // Decontamination REMOVAL (the act to text_contamination's report):
    // drop every document sharing >= 5 shingles with the benchmark probe
    // set, emit the kept corpus. Anti-join on the bounded hit table.
    "cur_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val hits = operators.TextAnalysis.contaminationHits(
          docs, docs.filter(col("doc_id") % 100 === 0))
        .filter(col("n_hits") >= 5)
      docs.join(hits, Seq("doc_id"), "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // Decontamination, SPAN level (the surgical alternative to
    // cur_decontaminate's whole-doc drop): the benchmark is every 100th
    // doc's 20-token middle excerpt (tokens 10..29) — the "leaked
    // benchmark question" — and exactly the token runs ≥ 10 a document
    // shares verbatim with any excerpt are cut; everything else survives.
    // Source docs lose precisely their excerpted middles; untouched docs
    // pass through verbatim. No hot-gram cap here by contract (recall is
    // mandatory for decontamination — see cutContaminatedSpans scaladoc).
    "cur_decontaminate_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("bench_id"),
          array_join(slice(split(col("text"), " "), 11, 20), " ").as("text"))
      Dedup.cutContaminatedSpans(docs, bench).orderBy("doc_id")
    }),

    // THE end-to-end corpus build, composed from this library's own
    // operators: strip cross-document boilerplate → re-score quality on
    // the CLEANED text and gate at 0.5 → exact-dedup the survivors
    // (min-id per normalized fingerprint) → fill per-source token budgets
    // by hash order. One query, one fully composed DuckDB twin — the
    // "turn a crawl into a training set" flagship. Every stage is a
    // linear/keyed shape (see the stages' own queries); the gate bites
    // (~¼ of docs pass), dedup bites on stripped near-dups, budgets bite
    // per source.
    "cur_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scope = graft.CacheScope.global
      // persist: the stripped+gated table feeds the dedup groupBy, the
      // survivor join-back AND the mixture — 3 consumers
      val stripped = operators.TextAnalysis.stripBoilerplate(docs, scope = scope,
          store = Some(dir + "#boilercover"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .filter(col("clean_text") =!= "")
      val q = operators.TextAnalysis.qualityScore(
          stripped.select(col("doc_id"), col("clean_text").as("text")))
        .select("doc_id", "quality")
      val kept = scope.persist(
        stripped.join(q, "doc_id").filter(col("quality") >= 0.5))
      val survivors = kept
        .groupBy(operators.TextAnalysis.fingerprintMd5(col("clean_text")).as("fp"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val base = kept.join(survivors, "doc_id")
        .select(col("doc_id"), col("source"),
          size(split(col("clean_text"), " ")).cast("long").as("n_tokens"))
      Curation.mixtureSample(base, "source", col("doc_id"), col("n_tokens"),
          Map("src0" -> 800L, "src1" -> 1000L, "src2" -> 600L, "src3" -> 2000L),
          scope = scope)
        .orderBy("doc_id")
    }),

    // THE flagship crawl→training-set build: all six stages of a modern
    // pretraining data pipeline composed from this library's own oracled
    // operators, over the planted-clone corpus — near-dup COLLAPSE
    // (minhash pairs → label-propagation clusters → keep the longest
    // member) → exact-substring span REMOVAL (Lee et al., the strip step)
    // → benchmark DECONTAMINATION on the cleaned text → QUALITY gate →
    // TEMPERATURE-scaled per-lang mixture (α = 0.5, 8000-token budget over
    // what survived) → sequence PACKING into 256-token bins × 8 shards.
    // One query, one fully composed DuckDB twin; every stage's fragment is
    // its own query's proven twin, chained. Every stage is a linear/keyed
    // shape — the whole chain holds the 100 TB contract of its parts.
    "cur_pretrain" -> ((s, dir) =>
      operators.Pretrain.full(Tables.documentsWithClones(s, dir),
          Tables.documents(s, dir).filter(col("doc_id") % 100 === 0),
          graft.CacheScope.global)
        .orderBy("doc_id", "chunk_no")),

    // The INCREMENTAL flagship — the production corpus-refresh shape: the
    // previous run's artifacts (pair table, survivor set, gated stage-4
    // output) absorb a deterministic diff (1/70 dropped, 1/30 edited,
    // 1/40 re-keyed copies added), and only the dirty docs plus their
    // provably-affected neighbors (shared-gram frontier — see Pretrain's
    // soundness argument) go through the expensive per-document stages.
    // The DuckDB twin recomputes the ENTIRE six-stage pipeline from
    // scratch on the edited corpus: hash equality across engines is the
    // incremental ≡ full proof. PretrainSpec measures the frontier and
    // asserts it stays diff-sized.
    "cur_pretrain_incr" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val prev = Tables.documentsWithClones(s, dir)
      val cur = prev.filter(col("doc_id") % 70 =!= 3)
        .withColumn("text", when(col("doc_id") % 30 === 0,
          concat(col("text"), lit(" qqedit"))).otherwise(col("text")))
        .unionByName(prev.filter(col("doc_id") % 40 === 0)
          .withColumn("doc_id", col("doc_id") + 900000L))
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      // the previous run's artifacts come from the materialized state
      // (memoized parquet tables — the nightly-run output the refresh
      // starts from), so this query's cost IS the increment
      operators.Pretrain.incremental(prev, cur, probe,
          operators.Pretrain.buildState(dir + "#pretrain", prev, probe, scope),
          scope)
        .orderBy("doc_id", "chunk_no")
    }),

    // CORPUS→INDEX FLAGSHIP — the crawl→train→retrieve loop closed with
    // native stages only: pretrain gate survivors (stages 1–4, shared
    // materialized state with cur_pretrain_incr) → hashing-trick embedding
    // (no fixture vectors) → one IVF build shared by SemDeDup (pairs form
    // inside the index's own lists — Σ|list|² bounded) and by serving →
    // tombstone-delete the collapsed near-dups → EXHAUSTIVE probe of the
    // min-id survivor. nprobe = all lists makes the probe ≡ brute force
    // over survivors (the ann_rebalance shared-oracle trick), so the twin
    // replays gates + embedding + list assignment + closure + exact
    // cosine — any row lost or resurrected by ANY stage breaks the hash.
    // Threshold 0.8 is calibrated to the hashed-TF space: shared stopword
    // mass puts generic same-language pairs at 0.5–0.7 (measured at
    // sf0.01), so SemDeDup's usual 0.4 would collapse the corpus; ≥0.8
    // isolates genuine near-dups (197 gated docs → a handful of pairs).
    "cur_pretrain_index" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      val b = operators.CorpusIndex.build(Tables.documentsWithClones(s, dir),
        probe, dir + "#pretrain", dir + "#flagidx", scope = scope)
      val qid = b.emb.join(b.doomed, Seq("vec_id"), "left_anti")
        .agg(min("vec_id")).head().getLong(0)
      operators.Ivf.probe(b.model, b.emb, qid, 10,
        nprobe = b.model.centroids.length)
    }),

    // The idf flagship — same gate → embed → build → SemDeDup → probe
    // composition, but the embedder is the idf-weighted hashed TF
    // (2⁻¹⁰-downscaled so the quantizer's integer score terms stay in
    // range) and the SemDeDup threshold is recalibrated to the idf cosine
    // histogram: measured at sf0.01 against the exact-Jaccard ground
    // truth, non-dup pair mass tops out at 0.57 and true near-dups start
    // at 0.77, so 0.65 cuts with margin on BOTH sides (pair precision AND
    // recall 1.0, vs precision 0.26 for plain TF at its 0.8 threshold) —
    // numbers in BASELINE.md. Shares the pretrain state with
    // cur_pretrain_index; its own index key.
    "cur_pretrain_index_idf" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      val b = operators.CorpusIndex.build(Tables.documentsWithClones(s, dir),
        probe, dir + "#pretrain", dir + "#flagidxi", threshold = 0.65,
        scope = scope,
        embed = d => operators.Embed.hashedTfIdf(d, scope = scope,
          downscaleBits = 10),
        embedTag = "tfidf10")
      val qid = b.emb.join(b.doomed, Seq("vec_id"), "left_anti")
        .agg(min("vec_id")).head().getLong(0)
      operators.Ivf.probe(b.model, b.emb, qid, 10,
        nprobe = b.model.centroids.length)
    }),

    // The refresh sibling — the production nightly shape: the previous
    // round's SERVED index (build → SemDeDup tombstones, its own private
    // key) absorbs the cur_pretrain_incr corpus diff through the existing
    // verbs — tombstone leavers/changed, compact (physical drop), frozen-
    // quantizer append of entering/changed/RESURRECTED docs, re-tombstone
    // the recomputed semantic losers. Pairs are MAINTAINED, not rebuilt:
    // untouched pairs carry over (frozen quantizer ⇒ unchanged vector ⇒
    // unchanged list), fresh vectors pair only against co-assigned live
    // rows (diff × list-width). The DuckDB twin recomputes the WHOLE
    // target state from scratch — gates on cur, embedding, a quantizer
    // trained on the PREV corpus's vectors (offset-id two-corpus CTE,
    // trainWhere on the prev rows), full-closure SemDeDup, exhaustive
    // probe — so hash equality is the incremental ≡ full proof.
    "cur_pretrain_index_incr" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val prev = Tables.documentsWithClones(s, dir)
      val cur = prev.filter(col("doc_id") % 70 =!= 3)
        .withColumn("text", when(col("doc_id") % 30 === 0,
          concat(col("text"), lit(" qqedit"))).otherwise(col("text")))
        .unionByName(prev.filter(col("doc_id") % 40 === 0)
          .withColumn("doc_id", col("doc_id") + 900000L))
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      val (model, embCur) = operators.CorpusIndex.refresh(prev, cur, probe,
        dir + "#pretrain", dir + "#flagidxr", scope = scope)
      operators.Ivf.probe(model, embCur,
        operators.CorpusIndex.minLiveVecId(model), 10,
        nprobe = model.centroids.length)
    }),

    // The refresh flagship on the IDF embedder — with the key discipline
    // the idf upgrade forces: idf is CORPUS-GLOBAL MODEL STATE, so the
    // refresh freezes the prev corpus's idf table exactly like it freezes
    // the coarse quantizer (recomputing idf on the grown corpus would
    // change every unchanged document's vector and corrupt the pair
    // carry-over). Unseen features in new/edited text carry no weight
    // (inner join — the frozen-model serving law). The twin recomputes
    // the whole target state from scratch UNDER THE SAME FROZEN idf (cur
    // tf ⋈ prev idf), so the hash match proves incremental ≡ full with
    // frozen embedding state.
    "cur_pretrain_index_incr_idf" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val prev = Tables.documentsWithClones(s, dir)
      val cur = prev.filter(col("doc_id") % 70 =!= 3)
        .withColumn("text", when(col("doc_id") % 30 === 0,
          concat(col("text"), lit(" qqedit"))).otherwise(col("text")))
        .unionByName(prev.filter(col("doc_id") % 40 === 0)
          .withColumn("doc_id", col("doc_id") + 900000L))
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      val st = operators.Pretrain.buildState(dir + "#pretrain", prev, probe,
        scope)
      val frozenIdf = scope.persist(operators.Embed.idfTable(st.gated))
      // embedTag: frozen-against-own-idf ≡ the direct idf embedder on the
      // prev corpus (EmbedSpec identity), so the internal prev-build shares
      // cur_pretrain_index_idf's content artifacts
      val (model, embCur) = operators.CorpusIndex.refresh(prev, cur, probe,
        dir + "#pretrain", dir + "#flagidxri", threshold = 0.65,
        scope = scope,
        embed = d => operators.Embed.hashedTfIdfFrozen(d, frozenIdf,
          downscaleBits = 10),
        embedTag = "tfidf10")
      operators.Ivf.probe(model, embCur,
        operators.CorpusIndex.minLiveVecId(model), 10,
        nprobe = model.centroids.length)
    }),

    // END-TO-END RAG SERVING flagship — the serving twin of
    // cur_pretrain_index, composed as ONE oracled chain: pretrain gates
    // (shared #pretrain state) → SemDeDup-tombstoned doc index (shared
    // #flagidx build — stage 1 probes the SERVED index, tombstones
    // masking the collapsed near-dups) → chunk index over the LIVE
    // survivors only (gated ∖ doomed — a deployment never chunks what
    // curation dropped) → indexed two-stage retrieval (pruned probes both
    // stages: 4 of 16 doc lists, 4 of 16 chunk lists ∩ coarse parents) →
    // rank-ordered packing under the 600-token budget. Query = the min-id
    // live survivor (deterministic from state alone). The twin replays
    // gates, both embed chains, both Lloyd chains, the SemDeDup closure,
    // both probe selections and the packing law — any row lost by ANY of
    // the seven stages breaks the hash.
    "cur_rag_serve" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      val docs0 = Tables.documentsWithClones(s, dir)
      // own index key: build() MUTATES its index (semantic tombstones), so
      // sharing #flagidx with cur_pretrain_index would race under the
      // concurrent Verify (MutationGuard enforces the one-writer rule)
      val b = operators.CorpusIndex.build(docs0, probe, dir + "#pretrain",
        dir + "#ragidx", scope = scope)
      val qid = b.emb.join(b.doomed, Seq("vec_id"), "left_anti")
        .agg(min("vec_id")).head().getLong(0)
      val st = operators.Pretrain.buildState(dir + "#pretrain", docs0, probe,
        scope)
      val liveDocs = scope.persist(st.gated.join(
        b.doomed.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"),
        "left_anti"))
      // ONE chunking pass: the write-once chunk store feeds both the index
      // build and the packing text join (round-11 demerit #2 — the flagship
      // used to chunk the live corpus twice)
      val chunks = operators.CorpusIndex.materializedChunks(
        dir + "#ragchunkstore", liveDocs)
      val (chunkModel, _) = operators.CorpusIndex.buildChunkIndexFrom(
        dir + "#ragchunks", chunks)
      operators.Similarity.ragContextIvf(b.model, b.emb, chunkModel, chunks,
        qid, coarseK = 20, poolK = 20, tokenBudget = 600L,
        nprobeDoc = 4, nprobeChunk = 4)
    }),

    // MMR-PACKED RAG SERVING flagship — cur_rag_serve with the packing
    // stage DIVERSIFIED: the same gates → served doc index → live-chunk
    // store + index → indexed two-stage pool, but the context packs by
    // maximal marginal relevance (0.7·rel − 0.3·max-sim-to-selected over
    // the pool's own chunk vectors) instead of pure rank order — the
    // production serving shape when retrieval pools carry near-dup
    // chunks. Own DOC index key (build() mutates); the chunk store +
    // index are SHARED read-only with the other serving flagships (the
    // cur_rag_serve_hybrid contract). Twin = the flagship chain through
    // the pool, then the pairwise-sim + unrolled-argmax MMR replay and
    // the selection-order packing law.
    "cur_rag_serve_mmr" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      val docs0 = Tables.documentsWithClones(s, dir)
      // own index key: build() mutates (semantic tombstones)
      val b = operators.CorpusIndex.build(docs0, probe, dir + "#pretrain",
        dir + "#ragmidx", scope = scope)
      val qid = b.emb.join(b.doomed, Seq("vec_id"), "left_anti")
        .agg(min("vec_id")).head().getLong(0)
      val st = operators.Pretrain.buildState(dir + "#pretrain", docs0, probe,
        scope)
      val liveDocs = scope.persist(st.gated.join(
        b.doomed.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"),
        "left_anti"))
      val chunks = operators.CorpusIndex.materializedChunks(
        dir + "#ragchunkstore", liveDocs)
      val (chunkModel, _) = operators.CorpusIndex.buildChunkIndexFrom(
        dir + "#ragchunks", chunks)
      operators.Similarity.ragContextMmr(b.model, b.emb, chunkModel, chunks,
        qid, coarseK = 20, poolK = 20, selectK = 8, tokenBudget = 600L)
    }),

    // HYBRID RAG SERVING flagship — cur_rag_serve with the doc stage
    // FUSED: the coarse parents come from reciprocal-rank fusion of the
    // BM25 postings leg (over the live corpus) and the doc-IVF probe
    // (tombstones masking the collapsed near-dups), then the chunk index
    // refines within them and the pool packs under the 600-token budget.
    // The twin composes the bm25 chain over livedocs, the pruned doc
    // probe's dense re-rank, the RRF law, the chunk probe ∩ fused
    // parents, and the packing law — the full production hybrid-RAG
    // serving stack under ONE hash.
    "cur_rag_serve_hybrid" -> ((s, dir) => {
      import s.implicits._
      val scope = graft.CacheScope.global
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      val docs0 = Tables.documentsWithClones(s, dir)
      // own index key: build() mutates (semantic tombstones)
      val b = operators.CorpusIndex.build(docs0, probe, dir + "#pretrain",
        dir + "#raghidx", scope = scope)
      val qid = b.emb.join(b.doomed, Seq("vec_id"), "left_anti")
        .agg(min("vec_id")).head().getLong(0)
      val st = operators.Pretrain.buildState(dir + "#pretrain", docs0, probe,
        scope)
      val liveDocs = scope.persist(st.gated.join(
        b.doomed.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"),
        "left_anti"))
      // the chunk store + chunk index are SHARED with cur_rag_serve: the
      // live set is identical (both doomed sets derive from the same
      // corpus/threshold under deterministic quantizers) and neither
      // query MUTATES the chunk index, so the one-writer rule doesn't
      // apply — only the doc index (batch-0 semantic tombstones) needs
      // its own key
      val chunks = operators.CorpusIndex.materializedChunks(
        dir + "#ragchunkstore", liveDocs)
      val (chunkModel, _) = operators.CorpusIndex.buildChunkIndexFrom(
        dir + "#ragchunks", chunks)
      operators.Bm25.ragContextHybrid(liveDocs, b.model, b.emb, chunkModel,
        chunks, qid, coarseK = 20, poolK = 20, tokenBudget = 600L,
        nprobeDoc = 4, nprobeChunk = 4, scope = scope)
    }),

    // INCREMENTAL RAG SERVING — the nightly refresh of the whole serving
    // stack as ONE oracled chain (the round-11 verdict's top ask): the doc
    // index refreshes under the frozen doc quantizer (cur_pretrain_index_
    // incr's machinery), and the CHUNK index — the expensive artifact —
    // is brought to the current corpus by chunk-granular verbs sized by
    // the LIVE-SET diff: leavers/changed docs tombstone their chunk keys,
    // entering docs chunk + embed + append under the frozen chunk
    // quantizer, the text store maintained by the same diff. The query
    // then serves indexed two-stage + packing from the refreshed stack.
    // The twin recomputes the ENTIRE target state from scratch — gates on
    // cur, doc quantizer trained on prev, cur SemDeDup closure, PREV
    // closure → prev live (the chunk quantizer's training set), chunks of
    // cur live assigned under that frozen quantizer, both probe
    // selections, packing — so hash equality proves incremental ≡ full
    // for the full serving stack.
    "cur_rag_serve_incr" -> ((s, dir) => {
      val scope = graft.CacheScope.global
      val prev = Tables.documentsWithClones(s, dir)
      val cur = prev.filter(col("doc_id") % 70 =!= 3)
        .withColumn("text", when(col("doc_id") % 30 === 0,
          concat(col("text"), lit(" qqedit"))).otherwise(col("text")))
        .unionByName(prev.filter(col("doc_id") % 40 === 0)
          .withColumn("doc_id", col("doc_id") + 900000L))
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
      // own doc index key: refreshServing MUTATES it (MutationGuard's
      // one-writer rule); shares #pretrain state + the memoized gate-diff
      val sr = operators.CorpusIndex.refreshServing(prev, cur, probe,
        dir + "#pretrain", dir + "#rsvidx", dir + "#rsvchunks",
        scope = scope)
      operators.Similarity.ragContextIvf(sr.docModel, sr.embCur,
        sr.chunkModel, sr.chunkTexts,
        operators.CorpusIndex.minLiveVecId(sr.docModel),
        coarseK = 20, poolK = 20, tokenBudget = 600L,
        nprobeDoc = 4, nprobeChunk = 4)
    }),

    // Quality-ranked mixture: same per-source budgets, but each source's
    // budget is filled BEST DOCUMENTS FIRST (4-dp quality, doc_id ties)
    // instead of the uniform hash order — the quality-filtered mixing
    // recipe. Per-source two-phase budget op, composed like mixtureSample.
    "cur_mixture_quality" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = graft.operators.TextAnalysis.qualityScore(docs)
        .select("doc_id", "quality")
        .join(docs.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
      val budgets = Map("src0" -> 800L, "src1" -> 1000L, "src2" -> 600L,
        "src3" -> 2000L)
      Curation.selectUnderBudgetAll(scored, "source", col("quality"),
          col("doc_id"), col("n_tokens"), budgets)
        .select("doc_id", "source", "quality", "n_tokens")
        .orderBy("doc_id")
    }),

    // Sequence packing: chunks → 256-token training bins across 8 shards.
    "cur_pack" -> ((s, dir) =>
      Curation.packSequences(
          Curation.chunk(Tables.documents(s, dir), 64, 8), 256, 8)
        .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
          col("shard"), col("bin"), col("bin_tokens_before"))
        .orderBy("doc_id", "chunk_no")),

    // TOKENIZER-TRUE sequence packing: the bins a real pretraining run
    // fills are counted in TRAINED-TOKENIZER pieces, not whitespace words
    // — a code-heavy chunk tokenizes to far more BPE pieces than its word
    // count suggests. Per-chunk piece counts come from the corpus-trained
    // BPE vocabulary (the text_bpe_tokens_vocab path: fold once per
    // distinct word, tokenize by keyed join), then the same
    // shard-partitioned 256-token bin law as cur_pack. Twin composes the
    // full 8-round BPE merge replay into the packing chain.
    "cur_pack_bpe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = operators.Bpe.trainMergesCached(dir, docs)
      val vocab = operators.Bpe.buildVocab(docs, merges, chunk = 3)
      val chunks = Curation.chunk(docs, 64, 8)
      val nbpe = chunks.select(col("doc_id"), col("chunk_no"),
          explode(split(col("chunk_text"), " ")).as("word"))
        .join(vocab.select(col("word"),
          operators.Bpe.symCount(col("syms")).as("nsym")), "word")
        .groupBy("doc_id", "chunk_no")
        .agg(sum("nsym").as("n_bpe_tokens"))
      Curation.packSequences(
          chunks.select("doc_id", "chunk_no")
            .join(nbpe, Seq("doc_id", "chunk_no")), 256, 8,
          tokenCol = "n_bpe_tokens")
        .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
          col("n_bpe_tokens"), col("shard"), col("bin"),
          col("bin_tokens_before"))
        .orderBy("doc_id", "chunk_no")
    }),

    // End-to-end quality gate: the "does this document enter the training
    // set" decision, composing five independently-oracled signals — length/
    // diversity quality, n-gram repetition, lang-ID agreement, benchmark
    // contamination, and the bigram LM score. Emits per-doc keep/drop with
    // a deterministic comma-joined reason list.
    "cur_quality_gate" -> ((s, dir) => {
      import graft.operators.TextAnalysis
      val docs = Tables.documents(s, dir)
      val q = operators.TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
      val rep = docs.select(col("doc_id"),
        TextAnalysis.r4(TextAnalysis.repetitionRatio(col("text"), 3)).as("rep"))
      val lid = docs
        .select(col("doc_id"), col("lang"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langIdFromTokens(col("toks")).as("lang_pred"))
      val cont = TextAnalysis.contaminationHits(docs,
        docs.filter(col("doc_id") % 100 === 0))
      val lm = TextAnalysis.lmScore(docs).select(col("doc_id"), col("lm_score"))
      q.join(rep, "doc_id").join(lid, "doc_id")
        .join(cont, Seq("doc_id"), "left").join(lm, Seq("doc_id"), "left")
        .withColumn("r_quality", col("quality") < 0.5)
        .withColumn("r_repeat", col("rep") > 0.2)
        .withColumn("r_lang", col("lang_pred") =!= col("lang"))
        .withColumn("r_contam", coalesce(col("n_hits"), lit(0L)) > 0L)
        .withColumn("r_lm", coalesce(col("lm_score"), lit(0.0)) < -7.5)
        .withColumn("keep",
          !(col("r_quality") || col("r_repeat") || col("r_lang") ||
            col("r_contam") || col("r_lm")))
        .withColumn("reasons", concat_ws(",",
          when(col("r_quality"), "quality"), when(col("r_repeat"), "repeat"),
          when(col("r_lang"), "lang"), when(col("r_contam"), "contam"),
          when(col("r_lm"), "lm")))
        .select("doc_id", "keep", "reasons")
        .orderBy("doc_id")
    }),

    // Context-window chunking: 64-token windows, 8-token overlap.
    "cur_chunks" -> ((s, dir) =>
      Curation.chunk(Tables.documents(s, dir), 64, 8)
        .select(col("doc_id"), col("chunk_no"),
          col("n_chunk_tokens").cast("long").as("n_chunk_tokens"),
          md5(col("chunk_text")).as("fp_chunk"))
        .orderBy("doc_id", "chunk_no")),

    // Snapshot diff between two corpus versions: cur drops every 50th doc,
    // edits every 30th, adds re-keyed copies of every 40th. Emits the
    // non-unchanged keys with their classification.
    "cur_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cur = docs.filter(col("doc_id") % 50 =!= 0)
        .withColumn("text", when(col("doc_id") % 30 === 0,
          concat(col("text"), lit(" qqedit"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 40 === 0)
          .withColumn("doc_id", col("doc_id") + 900000L))
      Curation.snapshotDiff(docs, cur, "doc_id", md5(col("text")))
        .filter(col("status") =!= "unchanged")
        .orderBy("doc_id")
    }),

    // Adaptive per-source quality gate: top 25% by quality within each
    // source (threshold adapts to the source's own distribution).
    "cur_quality_top" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = graft.operators.TextAnalysis.qualityScore(docs)
        .select("doc_id", "quality")
        .join(docs.select("doc_id", "source"), "doc_id")
      Curation.topFractionPerGroup(scored, "source", col("quality"),
          "doc_id", 0.25)
        .select("doc_id", "source", "quality")
        .orderBy("doc_id")
    }),

    // DSIR importance weights: how target-like (target = src1 docs) each
    // document's hashed unigram+bigram profile is.
    "cur_dsir" -> ((s, dir) =>
      Curation.dsirWeights(Tables.documents(s, dir),
          col("source") === "src1", buckets = 1024)
        .orderBy("doc_id")),

    // DSIR selection: Gumbel-top-100 sample ∝ exp(importance weight).
    "cur_dsir_sample" -> ((s, dir) =>
      Curation.dsirSample(Tables.documents(s, dir),
          col("source") === "src1", k = 100, buckets = 1024)
        .orderBy("doc_id"))
  )

  // DuckDB twin of Curation.hashBucket(doc_id, 100) / (doc_id, 8).
  private val bucket =
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
  private val bucket8 =
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8)"
  // DuckDB twin of Curation.hashUnit(doc_id).
  private val unit =
    "(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) / 4294967296.0)"

  // Shared DSIR CTE chain ending in ob(doc_id, tgt, b) + bw(b, lnwq):
  // hashed-feature occurrences and the per-bucket log importance weights
  // (target = src1 documents, 1024 buckets — the cur_dsir* parameters).
  // Declared BEFORE `oracle`: object vals initialize in source order.
  private val dsirCore: String =
    """toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
      |occ AS (
      |  SELECT doc_id, (source = 'src1') AS tgt,
      |    unnest(list_concat(ts,
      |      list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])))
      |      AS f
      |  FROM toks),
      |ob AS (
      |  SELECT doc_id, tgt,
      |    ('0x' || substring(md5(f), 1, 8))::BIGINT % 1024 AS b
      |  FROM occ),
      |bt AS (
      |  SELECT b, COUNT(*) AS raw,
      |    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_n
      |  FROM ob GROUP BY b),
      |tot AS (
      |  SELECT CAST(SUM(raw) AS BIGINT) AS raw_tot,
      |    CAST(SUM(tgt_n) AS BIGINT) AS tgt_tot FROM bt),
      |bw AS (
      |  SELECT b,
      |    CAST(FLOOR(ln((CAST(tgt_n AS DOUBLE) + 1.0)
      |        / (CAST(tgt_tot AS DOUBLE) + 1024)) * 1000000000.0 + 0.5)
      |      AS BIGINT)
      |    - CAST(FLOOR(ln((CAST(raw AS DOUBLE) + 1.0)
      |        / (CAST(raw_tot AS DOUBLE) + 1024)) * 1000000000.0 + 0.5)
      |      AS BIGINT) AS lnwq
      |  FROM bt, tot)""".stripMargin

  /** The six-stage flagship chain over `corpus` (a CTE name): exact-
    * jaccard collapse (recursive closure, keep longest) -> substring-span
    * strip -> probe-set decontamination -> quality gate -> tempered
    * per-lang budgets (HUGEINT split) -> shard-partitioned packing.
    * `extraCtes` lets the incremental twin splice the edited-corpus
    * derivation between the clone CTE and the chain. Each fragment is the
    * proven twin of its stage's own query, chained through docs3..docs6.
    */
  /** The cur_pretrain_incr refresh recipe as a corpus CTE (1/70 dropped,
    * 1/30 edited, 1/40 re-keyed copies added) — shared by the incremental
    * pretrain twin and the incremental corpus→index twin. A `def`: it is
    * referenced from `oracle`, and object vals initialize in source order.
    */
  private def curCorpusCte: String =
    """documents2c AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 30 = 0 THEN text || ' qqedit' ELSE text END
      |      AS text,
      |    lang, source, n_chars
      |  FROM documents2 WHERE doc_id % 70 <> 3
      |  UNION ALL
      |  SELECT doc_id + 900000 AS doc_id, text, lang, source, n_chars
      |  FROM documents2 WHERE doc_id % 40 = 0),
      |""".stripMargin

  /** The shared core of the corpus→index flagship twins (CTEs only,
    * caller prepends WITH RECURSIVE): pretrain gates → hashed-TF counts →
    * the shadowed `embeddings` CTE → the doc IVF chain → SemDeDup pairs
    * restricted to co-assigned lists → recursive closure → `surv` (live
    * doc ids) and `fqid` (the min-id live survivor). Chains:
    * cur_pretrain_index's exhaustive probe, cur_rag_serve's indexed
    * serving stages, cur_rag_serve_hybrid's fused doc stage.
    */
  private def flagshipIndexCoreCtes: String =
    s"""${pretrainGatedCtes("documents2")},
       |${TextQueries.embedCntCteFrom("docs6")},
       |egrid AS (
       |  SELECT doc_id, unnest(range(0, 64)) AS dim
       |  FROM (SELECT DISTINCT doc_id FROM docs6)),
       |embeddings AS MATERIALIZED (
       |  SELECT g.doc_id AS vec_id,
       |    list(CAST(COALESCE(cnt.c, 0) AS REAL) ORDER BY g.dim)
       |      AS embedding
       |  FROM egrid g LEFT JOIN cnt ON g.doc_id = cnt.doc_id
       |    AND g.dim = cnt.b
       |  GROUP BY g.doc_id),
       |${SimilarityQueries.ivfCoreCtes(16)},
       |edot AS (
       |  SELECT x.doc_id AS va, y.doc_id AS vb,
       |    SUM(CAST(x.c AS DOUBLE) * y.c) AS dot
       |  FROM cnt x JOIN cnt y ON x.b = y.b AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |en AS (
       |  SELECT doc_id, SUM(CAST(c AS DOUBLE) * c) AS n2
       |  FROM cnt GROUP BY doc_id),
       |sem AS (
       |  SELECT aa.vec_id AS va, bb.vec_id AS vb
       |  FROM a2 aa
       |  JOIN a2 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
       |  JOIN edot d ON d.va = aa.vec_id AND d.vb = bb.vec_id
       |  JOIN en na ON na.doc_id = aa.vec_id
       |  JOIN en nb ON nb.doc_id = bb.vec_id
       |  WHERE d.dot / NULLIF(sqrt(na.n2) * sqrt(nb.n2), 0) >= 0.8),
       |sedges AS (
       |  SELECT va AS s, vb AS d FROM sem
       |  UNION ALL
       |  SELECT vb AS s, va AS d FROM sem),
       |swalk(id, lbl) AS (
       |  SELECT s, s FROM sedges
       |  UNION
       |  SELECT e.s, w2.lbl FROM sedges e JOIN swalk w2 ON w2.id = e.d),
       |scl AS (SELECT id, MIN(lbl) AS cluster_id FROM swalk GROUP BY id),
       |surv AS MATERIALIZED (
       |  SELECT e.vec_id FROM embeddings e
       |  LEFT JOIN scl ON scl.id = e.vec_id
       |  WHERE scl.id IS NULL OR scl.cluster_id = e.vec_id),
       |fqid AS (SELECT MIN(vec_id) AS q FROM surv)""".stripMargin

  /** The shared core of every incremental-refresh twin (CTEs only, caller
    * prepends WITH RECURSIVE): gates on the EDITED corpus (docs6) and on
    * the PREVIOUS corpus (pv-prefixed → pvdocs6), both hashed-TF count
    * tables, ONE embeddings CTE holding prev vectors at their original
    * ids (the quantizer TRAINS on these — trainWhere) and cur vectors
    * offset by 5·10⁷ (assignment only), the cur assignments remapped
    * (`a2c`), the full SemDeDup closure over the CUR corpus → `surv`
    * (live cur doc ids) and `fqid` (the min-id live survivor — the
    * deterministic serving query). Chains: cur_pretrain_index_incr's
    * exhaustive probe, cur_rag_serve_incr's serving stages.
    */
  private def incrIndexCoreCtes: String =
    s"""${pretrainGatedCtes("documents2c", curCorpusCte)},
       |${prefixCtes(pretrainGatedCtes("documents2"), "pv", gatedChainNames)},
       |${TextQueries.embedCntCteFrom("docs6")},
       |${prefixCtes(TextQueries.embedCntCteFrom("pvdocs6"), "pv",
           Seq("etoks", "eocc", "cnt"))},
       |egrid AS (
       |  SELECT doc_id, unnest(range(0, 64)) AS dim
       |  FROM (SELECT DISTINCT doc_id FROM docs6)),
       |pgrid AS (
       |  SELECT doc_id, unnest(range(0, 64)) AS dim
       |  FROM (SELECT DISTINCT doc_id FROM pvdocs6)),
       |embeddings AS MATERIALIZED (
       |  SELECT g.doc_id AS vec_id,
       |    list(CAST(COALESCE(p.c, 0) AS REAL) ORDER BY g.dim)
       |      AS embedding
       |  FROM pgrid g LEFT JOIN pvcnt p ON g.doc_id = p.doc_id
       |    AND g.dim = p.b
       |  GROUP BY g.doc_id
       |  UNION ALL
       |  SELECT g.doc_id + 50000000 AS vec_id,
       |    list(CAST(COALESCE(cnt.c, 0) AS REAL) ORDER BY g.dim)
       |      AS embedding
       |  FROM egrid g LEFT JOIN cnt ON g.doc_id = cnt.doc_id
       |    AND g.dim = cnt.b
       |  GROUP BY g.doc_id),
       |${SimilarityQueries.ivfCoreCtes(16, "vec_id < 50000000")},
       |a2c AS MATERIALIZED (
       |  SELECT vec_id - 50000000 AS vid, cid FROM a2
       |  WHERE vec_id >= 50000000),
       |edot AS (
       |  SELECT x.doc_id AS va, y.doc_id AS vb,
       |    SUM(CAST(x.c AS DOUBLE) * y.c) AS dot
       |  FROM cnt x JOIN cnt y ON x.b = y.b AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |en AS (
       |  SELECT doc_id, SUM(CAST(c AS DOUBLE) * c) AS n2
       |  FROM cnt GROUP BY doc_id),
       |sem AS (
       |  SELECT aa.vid AS va, bb.vid AS vb
       |  FROM a2c aa
       |  JOIN a2c bb ON aa.cid = bb.cid AND aa.vid < bb.vid
       |  JOIN edot d ON d.va = aa.vid AND d.vb = bb.vid
       |  JOIN en na ON na.doc_id = aa.vid
       |  JOIN en nb ON nb.doc_id = bb.vid
       |  WHERE d.dot / NULLIF(sqrt(na.n2) * sqrt(nb.n2), 0) >= 0.8),
       |sedges AS (
       |  SELECT va AS s, vb AS d FROM sem
       |  UNION ALL
       |  SELECT vb AS s, va AS d FROM sem),
       |swalk(id, lbl) AS (
       |  SELECT s, s FROM sedges
       |  UNION
       |  SELECT e.s, w2.lbl FROM sedges e JOIN swalk w2 ON w2.id = e.d),
       |scl AS (SELECT id, MIN(lbl) AS cluster_id FROM swalk GROUP BY id),
       |surv AS MATERIALIZED (
       |  SELECT e.vid AS vec_id FROM a2c e
       |  LEFT JOIN scl ON scl.id = e.vid
       |  WHERE scl.id IS NULL OR scl.cluster_id = e.vid),
       |fqid AS (SELECT MIN(vec_id) AS q FROM surv)""".stripMargin

  /** Every CTE name [[pretrainGatedCtes]] introduces, in the order they
    * appear — the rename list for [[prefixCtes]] when two gated chains
    * must coexist in ONE WITH clause (DuckDB rejects duplicate CTE names
    * even across nesting levels, so shadowed sub-WITHs are not an option).
    */
  private val gatedChainNames: Seq[String] = Seq(
    "documents2", "w", "sh", "n", "pairs", "jac", "jp", "edges", "walk",
    "cl", "cda", "crk", "docs3", "sp", "g", "occ", "hot", "cold", "m", "r",
    "spans", "cutpos", "tok", "keptk", "stext", "docs4", "pw", "probe",
    "dw", "dsh", "hits", "docs5", "qx", "docs6")

  /** Token-boundary rename of the given CTE names to `prefix+name`.
    * Sound here because in these generated fragments every listed name
    * occurs only as a relation (definition, FROM/JOIN, or qualifier) —
    * column names that embed one (n_sh, n_tokens, gs) have no word
    * boundary at the overlap, and quoted literals in the chains share no
    * token with the list.
    *
    * TOTALITY GUARD: the rename silently corrupts the composed twin if a
    * future edit adds a CTE the hand-maintained list misses (the unlisted
    * definition would collide with the other chain's). So every CTE the
    * fragment DEFINES (`name AS (` / `name AS MATERIALIZED (` /
    * `name(cols) AS (`) must be in `names` — asserted here, loudly, at
    * oracle-construction time rather than as a DuckDB binder error or a
    * silent wrong-relation bind.
    */
  private val cteDefRe =
    "(?m)([A-Za-z_][A-Za-z0-9_]*)(\\([^)]*\\))?\\s+AS\\s+(MATERIALIZED\\s+)?\\(".r

  private def prefixCtes(sql: String, prefix: String,
                         names: Seq[String]): String = {
    val defined = cteDefRe.findAllMatchIn(sql).map(_.group(1)).toSet
    val unlisted = defined -- names
    require(unlisted.isEmpty,
      s"prefixCtes: fragment defines CTEs not in the rename list — " +
        s"${unlisted.toSeq.sorted.mkString(", ")}; add them to the caller's " +
        "names (a partial rename would corrupt the composed twin)")
    names.foldLeft(sql)((s, n) =>
      s.replaceAll("\\b" + n + "\\b", prefix + n))
  }

  /** Stages 1–4 of the pretrain replay as a CTE chain ending in `docs6`
    * (the gated survivors: doc_id, lang, text, n_tokens) — the shared
    * prefix of [[pretrainSql]] and the corpus→index flagship twin. Caller
    * supplies the `WITH RECURSIVE` keyword (the dedup closure needs it).
    */
  private def pretrainGatedCtes(corpus: String, extraCtes: String = ""): String =
    s"""${DedupQueries.clonedDocsCte.stripPrefix("WITH ")},
         |$extraCtes${DedupQueries.jaccardBaseFrom(corpus)},
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
         |cda AS (
         |  SELECT d2.doc_id, d2.text, d2.lang, d2.n_chars,
         |    COALESCE(cl.cluster_id, d2.doc_id) AS clid
         |  FROM $corpus d2 LEFT JOIN cl ON cl.id = d2.doc_id),
         |crk AS (
         |  SELECT doc_id, text, lang,
         |    ROW_NUMBER() OVER (PARTITION BY clid
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM cda),
         |docs3 AS (SELECT doc_id, text, lang FROM crk WHERE rn = 1),
         |${DedupQueries.substrChainFrom("docs3", 10, 20)},
         |cutpos AS (
         |  SELECT DISTINCT doc_id, p FROM (
         |    SELECT doc_b AS doc_id,
         |      unnest(range(b_start, b_start + span_len)) AS p FROM spans)),
         |tok AS (
         |  SELECT doc_id, i - 1 AS p, l[i] AS token
         |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM sp)),
         |keptk AS (
         |  SELECT tok.doc_id, tok.p, tok.token
         |  FROM tok ANTI JOIN cutpos
         |    ON tok.doc_id = cutpos.doc_id AND tok.p = cutpos.p),
         |stext AS (
         |  SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS text
         |  FROM keptk GROUP BY doc_id),
         |docs4 AS (
         |  SELECT d3.doc_id, st.text, d3.lang
         |  FROM docs3 d3 JOIN stext st USING (doc_id)
         |  WHERE st.text <> ''),
         |pw AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
         |      i -> string_split(text, ' ')[i] || ' ' ||
         |           string_split(text, ' ')[i+1] || ' ' ||
         |           string_split(text, ' ')[i+2])) AS shs
         |  FROM documents WHERE doc_id % 100 = 0),
         |probe AS (SELECT DISTINCT unnest(shs) AS s1 FROM pw),
         |dw AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
         |      i -> string_split(text, ' ')[i] || ' ' ||
         |           string_split(text, ' ')[i+1] || ' ' ||
         |           string_split(text, ' ')[i+2])) AS shs
         |  FROM docs4),
         |dsh AS (SELECT doc_id, unnest(shs) AS s1 FROM dw),
         |hits AS (
         |  SELECT doc_id FROM dsh JOIN probe USING (s1)
         |  GROUP BY doc_id HAVING COUNT(*) >= 5),
         |docs5 AS (
         |  SELECT docs4.* FROM docs4 ANTI JOIN hits USING (doc_id)),
         |qx AS (
         |  SELECT doc_id,
         |    FLOOR((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
         |      + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |        / len(string_split(text, ' ')) * 0.3
         |      + LEAST(CAST(len(list_filter(string_split(text, ' '),
         |          tk -> tk IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
         |        / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3)
         |      * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM docs5),
         |docs6 AS MATERIALIZED (
         |  SELECT docs5.doc_id, docs5.lang, docs5.text,
         |    CAST(len(string_split(docs5.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM docs5 JOIN qx USING (doc_id) WHERE qx.quality >= 0.5)""".stripMargin

  private def pretrainSql(corpus: String, extraCtes: String = ""): String =
    s"""WITH RECURSIVE ${pretrainGatedCtes(corpus, extraCtes)},
         |mt AS (
         |  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS tok FROM docs6
         |  GROUP BY 1 HAVING SUM(n_tokens) > 0),
         |mw AS (
         |  SELECT lang,
         |    CAST(FLOOR(exp(0.5 * ln(CAST(tok AS DOUBLE))) * 1000000.0 + 0.5)
         |      AS BIGINT) AS wq
         |  FROM mt),
         |mb AS (
         |  SELECT lang,
         |    (8000::HUGEINT * wq::HUGEINT) // (SELECT SUM(wq) FROM mw)
         |      AS budget
         |  FROM mw),
         |mr AS (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY
         |      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |        / 4294967296.0, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
         |  FROM docs6),
         |sel AS (
         |  SELECT mr.doc_id FROM mr JOIN mb ON mr.lang = mb.lang
         |  WHERE mr.running <= mb.budget),
         |pt AS (
         |  SELECT docs6.doc_id, string_split(docs6.text, ' ') AS toks,
         |    len(string_split(docs6.text, ' ')) AS n
         |  FROM docs6 SEMI JOIN sel ON docs6.doc_id = sel.doc_id),
         |pc AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN n <= 64 THEN 1
         |         ELSE CAST(CEIL((n - 64) / 56.0) AS INT) + 1 END AS n_chunks
         |  FROM pt),
         |pe AS (
         |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_no FROM pc),
         |pch AS (
         |  SELECT doc_id, chunk_no,
         |    len(list_slice(toks, chunk_no * 56 + 1, chunk_no * 56 + 64)) AS n_tok,
         |    $bucket8 AS shard
         |  FROM pe),
         |pp AS (
         |  SELECT doc_id, chunk_no, shard,
         |    CAST(SUM(n_tok) OVER (PARTITION BY shard
         |      ORDER BY doc_id, chunk_no ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      - n_tok AS prefix
         |  FROM pch)
         |SELECT doc_id, chunk_no, shard,
         |  CAST(FLOOR(CAST(prefix AS DOUBLE) / 256.0) AS BIGINT) AS bin,
         |  prefix % 256 AS bin_tokens_before
         |FROM pp ORDER BY doc_id, chunk_no""".stripMargin

  val oracle: Map[String, String] = Map(
    "cur_weighted" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE $unit < least(1.0, CAST(n_chars AS DOUBLE) / 800.0)
         |ORDER BY doc_id""".stripMargin,

    // Composition of the five already-oracled signal derivations (quality,
    // repetition, lang-ID, contamination, bigram LM) + the gate logic.
    // concat_ws skips NULL reason slots in both engines.
    "cur_quality_gate" ->
      s"""WITH qs AS (
         |  SELECT doc_id,
         |    FLOOR((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
         |      + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |        / len(string_split(text, ' ')) * 0.3
         |      + LEAST(CAST(len(list_filter(string_split(text, ' '),
         |          t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
         |        / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3)
         |      * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM documents),
         |reps AS (
         |  SELECT doc_id,
         |    CASE WHEN GREATEST(len(string_split(text, ' ')) - 2, 0) = 0 THEN 0.0
         |         ELSE FLOOR(CAST(GREATEST(len(string_split(text, ' ')) - 2, 0)
         |           - len(list_distinct(list_transform(
         |               range(1, GREATEST(len(string_split(text, ' ')) - 2, 0) + 1),
         |               i -> string_split(text, ' ')[i] || ' ' ||
         |                    string_split(text, ' ')[i+1] || ' ' ||
         |                    string_split(text, ' ')[i+2]))) AS DOUBLE)
         |           / GREATEST(len(string_split(text, ' ')) - 2, 0)
         |           * 10000.0 + 0.5) / 10000.0 END AS rep
         |  FROM documents),
         |lids AS (
         |  SELECT doc_id, lang,
         |    ${TextQueries.markerSql("en")} AS s_en, ${TextQueries.markerSql("es")} AS s_es,
         |    ${TextQueries.markerSql("de")} AS s_de, ${TextQueries.markerSql("fr")} AS s_fr,
         |    ${TextQueries.markerSql("zh")} AS s_zh
         |  FROM documents),
         |lid AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN s_zh > GREATEST(s_en, s_es, s_de, s_fr) THEN 'zh'
         |         WHEN s_fr > GREATEST(s_en, s_es, s_de) THEN 'fr'
         |         WHEN s_de > GREATEST(s_en, s_es) THEN 'de'
         |         WHEN s_es > s_en THEN 'es'
         |         ELSE 'en' END AS lang_pred
         |  FROM lids),
         |w AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
         |      i -> string_split(text, ' ')[i] || ' ' ||
         |           string_split(text, ' ')[i+1] || ' ' ||
         |           string_split(text, ' ')[i+2])) AS shs
         |  FROM documents),
         |probe AS (SELECT DISTINCT unnest(shs) AS sgl FROM w WHERE doc_id % 100 = 0),
         |dsh AS (SELECT doc_id, unnest(shs) AS sgl FROM w),
         |cont AS (
         |  SELECT doc_id, COUNT(*) AS n_hits
         |  FROM dsh JOIN probe USING (sgl) GROUP BY doc_id),
         |occ AS (
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
         |lms AS (
         |  SELECT o2.doc_id,
         |    CAST(FLOOR(ln((CAST(c2.c2 AS DOUBLE) + 1.0)
         |        / (CAST(c1.c1 AS DOUBLE) + v.v)) * 1000000000.0 + 0.5)
         |      AS BIGINT) AS lnpq
         |  FROM o2 JOIN c2 USING (b) JOIN c1 USING (w1), v),
         |lm AS (
         |  SELECT doc_id,
         |    FLOOR(CAST(CAST(SUM(lnpq) AS BIGINT) AS DOUBLE) / 1000000000.0
         |      / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS lm_score
         |  FROM lms GROUP BY doc_id),
         |j AS (
         |  SELECT qs.doc_id, quality, rep, lang, lang_pred,
         |    COALESCE(cont.n_hits, 0) AS n_hits,
         |    COALESCE(lm.lm_score, 0.0) AS lm_score
         |  FROM qs JOIN reps USING (doc_id) JOIN lid USING (doc_id)
         |  LEFT JOIN cont USING (doc_id) LEFT JOIN lm USING (doc_id))
         |SELECT doc_id,
         |  NOT (quality < 0.5 OR rep > 0.2 OR lang_pred <> lang
         |       OR n_hits > 0 OR lm_score < -7.5) AS keep,
         |  concat_ws(',',
         |    CASE WHEN quality < 0.5 THEN 'quality' END,
         |    CASE WHEN rep > 0.2 THEN 'repeat' END,
         |    CASE WHEN lang_pred <> lang THEN 'lang' END,
         |    CASE WHEN n_hits > 0 THEN 'contam' END,
         |    CASE WHEN lm_score < -7.5 THEN 'lm' END) AS reasons
         |FROM j ORDER BY doc_id""".stripMargin,

    "cur_split" ->
      s"""SELECT CASE WHEN $bucket < 80 THEN 'train'
         |            WHEN $bucket < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs
         |FROM documents
         |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    // Leakage-safe split twin: recursive min-label closure over the exact
    // jaccard pairs of the CLONE corpus (the same chain as dedup_clusters,
    // re-pointed at documents2), then the md5 bucket of the split unit.
    "cur_split_safe" -> {
      val unitBucket =
        "(('0x' || substring(md5(CAST(unit AS VARCHAR)), 1, 8))::BIGINT % 100)"
      s"""WITH RECURSIVE ${DedupQueries.clonedDocsCte.stripPrefix("WITH ")},
        |${DedupQueries.jaccardBaseFrom("documents2")},
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
        |u AS (
        |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS unit
        |  FROM documents2 d LEFT JOIN cl ON cl.id = d.doc_id)
        |SELECT doc_id, unit AS split_unit,
        |  CASE WHEN $unitBucket < 80 THEN 'train'
        |       WHEN $unitBucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM u ORDER BY doc_id""".stripMargin
    },

    "cur_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE $bucket < 10 ORDER BY doc_id""".stripMargin,

    "cur_stratified" ->
      s"""SELECT lang, COUNT(*) AS n_docs FROM documents
         |WHERE $bucket < CASE lang WHEN 'en' THEN 20
         |  WHEN 'es' THEN 80 WHEN 'de' THEN 80 ELSE 0 END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "cur_redact" ->
      """WITH dirty AS (
        |  SELECT doc_id, text || ' contact user' || doc_id ||
        |    '@example.com or +1 555-01' || doc_id ||
        |    ' card 4111 1111 1111 1111 end' AS d
        |  FROM documents)
        |SELECT doc_id, md5(
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(d,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b(?:\d[ -]?){13,16}\d\b', '<CARD>', 'g'),
        |    '(?:\+\d{1,3}[ -])?(?:\(\d{2,4}\)[ -]?)?\b\d{3}[ -]\d{3,4}(?:[ -]\d{3,4})?\b',
        |    '<PHONE>', 'g')) AS fp_redacted
        |FROM dirty ORDER BY doc_id""".stripMargin,

    "cur_budget" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    FLOOR((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
        |      + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 0.3
        |      + LEAST(CAST(len(list_filter(string_split(text, ' '),
        |          t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3)
        |      * 10000.0 + 0.5) / 10000.0 AS quality,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, quality, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS running
        |  FROM q)
        |SELECT doc_id, quality, n_tokens FROM r
        |WHERE running <= 10000 ORDER BY doc_id""".stripMargin,

    // Contamination twin + anti join, kept side out.
    "cur_decontaminate" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i+1] || ' ' ||
        |           string_split(text, ' ')[i+2])) AS shs
        |  FROM documents),
        |probe AS (SELECT DISTINCT unnest(shs) AS s FROM w WHERE doc_id % 100 = 0),
        |d AS (SELECT doc_id, unnest(shs) AS s FROM w),
        |hits AS (
        |  SELECT doc_id FROM d JOIN probe USING (s)
        |  GROUP BY doc_id HAVING COUNT(*) >= 5)
        |SELECT doc_id, source FROM documents
        |ANTI JOIN hits USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Cross-corpus span replay: benchmark excerpts (tokens 10..29 of every
    // 100th doc) gram-joined against corpus grams — NO doc ordering, NO
    // hot-gram cap (see the Scala scaladoc) — then the same
    // gaps-and-islands run recovery and per-position cut/keep/reassembly
    // as dedup_substr_strip.
    "cur_decontaminate_spans" ->
      """WITH bsp AS (
        |  SELECT doc_id AS bench_id,
        |    string_split(text, ' ')[11:30] AS l
        |  FROM documents WHERE doc_id % 100 = 0),
        |bg AS (SELECT bench_id,
        |  list_transform(range(0, greatest(len(l) - 9, 0)),
        |    i -> array_to_string(l[i+1:i+10], ' ')) AS gs FROM bsp),
        |bocc AS (SELECT bench_id, unnest(gs) AS gr,
        |  unnest(range(0, len(gs))) AS pos_a FROM bg),
        |sp AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT doc_id,
        |  list_transform(range(0, greatest(len(l) - 9, 0)),
        |    i -> array_to_string(l[i+1:i+10], ' ')) AS gs FROM sp),
        |docc AS (SELECT doc_id, unnest(gs) AS gr,
        |  unnest(range(0, len(gs))) AS pos_b FROM g),
        |m AS (
        |  SELECT d.doc_id, b.bench_id, d.pos_b, d.pos_b - b.pos_a AS dd
        |  FROM docc d JOIN bocc b ON d.gr = b.gr),
        |r AS (
        |  SELECT *, pos_b - ROW_NUMBER() OVER (
        |    PARTITION BY doc_id, bench_id, dd ORDER BY pos_b) AS isl FROM m),
        |spans AS (
        |  SELECT doc_id, MIN(pos_b) AS b_start, COUNT(*) + 9 AS span_len
        |  FROM r GROUP BY doc_id, bench_id, dd, isl),
        |cutpos AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT doc_id,
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
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // The composed pipeline twin: boilerplate CTEs → strip reassembly →
    // quality over clean_text → md5-fingerprint dedup (min-id survivor) →
    // per-source hash-ordered budget windows. Each fragment is its stage's
    // own proven twin, chained.
    "cur_pipeline" ->
      s"""${TextQueries.boilerplateCtes},
         |tok AS (
         |  SELECT doc_id, i - 1 AS p, ts[i] AS token
         |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM t)),
         |kept0 AS (
         |  SELECT tok.doc_id, tok.p, tok.token
         |  FROM tok ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p),
         |agg AS (
         |  SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS clean_text
         |  FROM kept0 GROUP BY doc_id),
         |sdoc AS (
         |  SELECT t.doc_id, d.source, COALESCE(agg.clean_text, '') AS clean_text
         |  FROM t LEFT JOIN agg USING (doc_id)
         |  JOIN documents d USING (doc_id)
         |  WHERE COALESCE(agg.clean_text, '') <> ''),
         |q AS (
         |  SELECT doc_id,
         |    FLOOR((LEAST(CAST(length(clean_text) AS DOUBLE) / 500.0, 1.0) * 0.4
         |      + CAST(len(list_distinct(string_split(clean_text, ' '))) AS DOUBLE)
         |        / len(string_split(clean_text, ' ')) * 0.3
         |      + LEAST(CAST(len(list_filter(string_split(clean_text, ' '),
         |          tk -> tk IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
         |        / len(string_split(clean_text, ' ')) * 5.0, 1.0) * 0.3)
         |      * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM sdoc),
         |keptq AS (
         |  SELECT sdoc.doc_id, sdoc.source, sdoc.clean_text
         |  FROM sdoc JOIN q USING (doc_id) WHERE q.quality >= 0.5),
         |surv AS (
         |  SELECT MIN(doc_id) AS doc_id FROM keptq
         |  GROUP BY md5(trim(regexp_replace(lower(clean_text), '\\s+', ' ', 'g')))),
         |base AS (
         |  SELECT k.doc_id, k.source,
         |    CAST(len(string_split(k.clean_text, ' ')) AS BIGINT) AS n_tokens,
         |    ('0x' || substring(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))::BIGINT
         |      / 4294967296.0 AS u
         |  FROM keptq k SEMI JOIN surv ON k.doc_id = surv.doc_id
         |  WHERE k.source IN ('src0', 'src1', 'src2', 'src3')),
         |r AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
         |  FROM base)
         |SELECT doc_id, source, n_tokens FROM r
         |WHERE running <= CASE source WHEN 'src0' THEN 800
         |  WHEN 'src1' THEN 1000 WHEN 'src2' THEN 600 ELSE 2000 END
         |ORDER BY doc_id""".stripMargin,

    // The six-stage flagship twin: clone corpus → exact-jaccard collapse
    // (recursive closure, keep longest) → substring-span strip → probe-set
    // decontamination → quality gate → tempered per-lang budgets (HUGEINT
    // split) → shard-partitioned packing. Each fragment is the proven twin
    // of its stage's own query, chained through docs3..docs6.
    "cur_pretrain" -> pretrainSql("documents2"),

    // Corpus→index flagship twin: stage 1–4 gates → hashed-TF counts over
    // the survivors → a CTE named `embeddings` SHADOWING the fixture view
    // (DuckDB binds CTEs first), so the Lloyd/assignment replay chain runs
    // unchanged over the GENERATED vectors → SemDeDup pairs restricted to
    // co-assigned lists (dots sparse-exact: integer counts) → recursive
    // min-label closure → exact top-10 cosine from the min-id survivor
    // over survivors only (the Spark side's exhaustive tombstone-aware
    // probe ≡ brute force).
    "cur_pretrain_index" ->
      s"""WITH RECURSIVE $flagshipIndexCoreCtes,
         |fqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |fdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e
         |  LEFT JOIN fqd q ON e.b = q.b
         |  SEMI JOIN surv ON e.doc_id = surv.vec_id
         |  WHERE e.doc_id <> (SELECT q FROM fqid)
         |  GROUP BY e.doc_id),
         |fqn AS (SELECT SUM(qc * qc) AS qn2 FROM fqd)
         |SELECT d.doc_id AS vec_id,
         |  d.dot / NULLIF(sqrt(d.n2) * sqrt(fqn.qn2), 0) AS cosine
         |FROM fdots d, fqn
         |ORDER BY cosine DESC NULLS LAST, vec_id
         |LIMIT 10""".stripMargin,

    // RAG-serving flagship twin: the cur_pretrain_index chain (gates →
    // doc embed → doc Lloyd → SemDeDup closure → surv) continued through
    // the SERVING stages — pruned doc probe selection (4 of 16 lists) +
    // exact coarse re-rank to 20 parents, chunking of the LIVE docs only,
    // the chunk Lloyd chain (k-prefixed), chunk probe selection scored
    // with the doc query vector, candidates ∩ coarse parents, exact
    // sparse re-rank, and the rank-ordered 600-token packing law.
    "cur_rag_serve" ->
      s"""WITH RECURSIVE $flagshipIndexCoreCtes,
         |dprobe AS (
         |  SELECT cid FROM (
         |    SELECT sc2.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(sq AS DOUBLE) / sqrt(CAST(norm2q AS DOUBLE))
         |          DESC, sc2.cid) AS rn
         |    FROM sc2 JOIN nc2 USING (cid), fqid WHERE sc2.vec_id = fqid.q)
         |  WHERE rn <= 4),
         |dcand AS (
         |  SELECT a2.vec_id FROM a2 JOIN dprobe USING (cid)
         |  SEMI JOIN surv ON a2.vec_id = surv.vec_id
         |  WHERE a2.vec_id <> (SELECT q FROM fqid)),
         |tqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |tqn AS (SELECT SUM(qc * qc) AS qn2 FROM tqd),
         |tdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e LEFT JOIN tqd q ON e.b = q.b
         |  SEMI JOIN dcand ON e.doc_id = dcand.vec_id
         |  GROUP BY e.doc_id),
         |tcoarse AS (
         |  SELECT doc_id AS parent_id FROM (
         |    SELECT d.doc_id,
         |      ROW_NUMBER() OVER (ORDER BY
         |        d.dot / NULLIF(sqrt(d.n2) * sqrt(tqn.qn2), 0)
         |        DESC NULLS LAST, d.doc_id) AS rn
         |    FROM tdots d, tqn)
         |  WHERE rn <= 20),
         |livedocs AS (
         |  SELECT d.doc_id, d.text FROM docs6 d
         |  SEMI JOIN surv ON d.doc_id = surv.vec_id),
         |${SimilarityQueries.chunkCorpusCtesFrom("livedocs", "k")},
         |kgrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM kchunks)),
         |kemb AS MATERIALIZED (
         |  SELECT g.doc_id AS vec_id,
         |    list(CAST(COALESCE(kcnt.c, 0) AS REAL) ORDER BY g.dim)
         |      AS embedding
         |  FROM kgrid g LEFT JOIN kcnt ON g.doc_id = kcnt.doc_id
         |    AND g.dim = kcnt.b
         |  GROUP BY g.doc_id),
         |${SimilarityQueries.ivfCoreCtes(16, "", "", "kemb", "k")},
         |kqvd AS (SELECT dim, v FROM vd, fqid WHERE vec_id = fqid.q),
         |kqs AS (
         |  SELECT kc2.cid,
         |    CAST(SUM(CAST(FLOOR(kqvd.v * kc2.cq * 1000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sq
         |  FROM kqvd JOIN kc2 USING (dim) GROUP BY 1),
         |kprobe AS (
         |  SELECT cid FROM (
         |    SELECT q.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(q.sq AS DOUBLE) / sqrt(CAST(n.norm2q AS DOUBLE))
         |          DESC, q.cid) AS rn
         |    FROM kqs q JOIN nkc2 n USING (cid))
         |  WHERE rn <= 4),
         |kcand AS (
         |  SELECT ka2.vec_id FROM ka2 JOIN kprobe USING (cid)
         |  SEMI JOIN tcoarse ON ka2.vec_id // 1048576 = tcoarse.parent_id),
         |kchf AS (
         |  SELECT e.doc_id AS vec_id, e.doc_id // 1048576 AS parent_id,
         |    e.b, e.c
         |  FROM kcnt e SEMI JOIN kcand ON e.doc_id = kcand.vec_id),
         |kcd AS (
         |  SELECT vec_id, MIN(parent_id) AS parent_id,
         |    SUM(CAST(c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(c AS DOUBLE) * c) AS n2
         |  FROM kchf LEFT JOIN tqd q ON kchf.b = q.b
         |  GROUP BY vec_id),
         |trk AS (
         |  SELECT vec_id, parent_id,
         |    dot / NULLIF(sqrt(n2) * sqrt(tqn.qn2), 0) AS cosine
         |  FROM kcd, tqn
         |  ORDER BY cosine DESC NULLS LAST, vec_id LIMIT 20),
         |trn AS (
         |  SELECT vec_id, parent_id, cosine,
         |    ROW_NUMBER() OVER (ORDER BY cosine DESC NULLS LAST, vec_id)
         |      AS rn
         |  FROM trk),
         |trt AS (
         |  SELECT r.rn, r.vec_id, r.parent_id, r.cosine,
         |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
         |    c.text AS chunk_text
         |  FROM trn r JOIN kchunks c ON r.vec_id = c.doc_id),
         |trc AS (
         |  SELECT *, CAST(SUM(n_tokens) OVER (ORDER BY rn
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |  FROM trt)
         |SELECT rn, vec_id, parent_id, cosine, n_tokens, cum_tokens,
         |  chunk_text
         |FROM trc WHERE cum_tokens <= 600 ORDER BY rn""".stripMargin,

    // MMR-serving twin: the flagship chain through the pool (trk), then
    // the pool's pairwise chunk-vector sims, the unrolled greedy argmax
    // (mmrSelectCtes — the same literal weights), and the
    // selection-order packing law
    "cur_rag_serve_mmr" ->
      s"""WITH RECURSIVE $flagshipIndexCoreCtes,
         |dprobe AS (
         |  SELECT cid FROM (
         |    SELECT sc2.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(sq AS DOUBLE) / sqrt(CAST(norm2q AS DOUBLE))
         |          DESC, sc2.cid) AS rn
         |    FROM sc2 JOIN nc2 USING (cid), fqid WHERE sc2.vec_id = fqid.q)
         |  WHERE rn <= 4),
         |dcand AS (
         |  SELECT a2.vec_id FROM a2 JOIN dprobe USING (cid)
         |  SEMI JOIN surv ON a2.vec_id = surv.vec_id
         |  WHERE a2.vec_id <> (SELECT q FROM fqid)),
         |tqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |tqn AS (SELECT SUM(qc * qc) AS qn2 FROM tqd),
         |tdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e LEFT JOIN tqd q ON e.b = q.b
         |  SEMI JOIN dcand ON e.doc_id = dcand.vec_id
         |  GROUP BY e.doc_id),
         |tcoarse AS (
         |  SELECT doc_id AS parent_id FROM (
         |    SELECT d.doc_id,
         |      ROW_NUMBER() OVER (ORDER BY
         |        d.dot / NULLIF(sqrt(d.n2) * sqrt(tqn.qn2), 0)
         |        DESC NULLS LAST, d.doc_id) AS rn
         |    FROM tdots d, tqn)
         |  WHERE rn <= 20),
         |livedocs AS (
         |  SELECT d.doc_id, d.text FROM docs6 d
         |  SEMI JOIN surv ON d.doc_id = surv.vec_id),
         |${SimilarityQueries.chunkCorpusCtesFrom("livedocs", "k")},
         |kgrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM kchunks)),
         |kemb AS MATERIALIZED (
         |  SELECT g.doc_id AS vec_id,
         |    list(CAST(COALESCE(kcnt.c, 0) AS REAL) ORDER BY g.dim)
         |      AS embedding
         |  FROM kgrid g LEFT JOIN kcnt ON g.doc_id = kcnt.doc_id
         |    AND g.dim = kcnt.b
         |  GROUP BY g.doc_id),
         |${SimilarityQueries.ivfCoreCtes(16, "", "", "kemb", "k")},
         |kqvd AS (SELECT dim, v FROM vd, fqid WHERE vec_id = fqid.q),
         |kqs AS (
         |  SELECT kc2.cid,
         |    CAST(SUM(CAST(FLOOR(kqvd.v * kc2.cq * 1000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sq
         |  FROM kqvd JOIN kc2 USING (dim) GROUP BY 1),
         |kprobe AS (
         |  SELECT cid FROM (
         |    SELECT q.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(q.sq AS DOUBLE) / sqrt(CAST(n.norm2q AS DOUBLE))
         |          DESC, q.cid) AS rn
         |    FROM kqs q JOIN nkc2 n USING (cid))
         |  WHERE rn <= 4),
         |kcand AS (
         |  SELECT ka2.vec_id FROM ka2 JOIN kprobe USING (cid)
         |  SEMI JOIN tcoarse ON ka2.vec_id // 1048576 = tcoarse.parent_id),
         |kchf AS (
         |  SELECT e.doc_id AS vec_id, e.doc_id // 1048576 AS parent_id,
         |    e.b, e.c
         |  FROM kcnt e SEMI JOIN kcand ON e.doc_id = kcand.vec_id),
         |kcd AS (
         |  SELECT vec_id, MIN(parent_id) AS parent_id,
         |    SUM(CAST(c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(c AS DOUBLE) * c) AS n2
         |  FROM kchf LEFT JOIN tqd q ON kchf.b = q.b
         |  GROUP BY vec_id),
         |trk AS (
         |  SELECT vec_id, parent_id,
         |    dot / NULLIF(sqrt(n2) * sqrt(tqn.qn2), 0) AS cosine
         |  FROM kcd, tqn
         |  ORDER BY cosine DESC NULLS LAST, vec_id LIMIT 20),
         |rel AS MATERIALIZED (
         |  SELECT vec_id, parent_id, cosine,
         |    COALESCE(cosine, -2.0) AS rel2
         |  FROM trk),
         |pcv AS MATERIALIZED (
         |  SELECT e.doc_id AS vec_id, e.b, CAST(e.c AS DOUBLE) AS c
         |  FROM kcnt e SEMI JOIN rel ON e.doc_id = rel.vec_id),
         |pnorm AS (SELECT vec_id, SUM(c * c) AS n2 FROM pcv GROUP BY vec_id),
         |pdot AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b2, SUM(x.c * y.c) AS dot
         |  FROM pcv x JOIN pcv y ON x.b = y.b AND x.vec_id <> y.vec_id
         |  GROUP BY 1, 2),
         |psim AS MATERIALIZED (
         |  SELECT a, b2,
         |    COALESCE(dot / NULLIF(sqrt(na.n2) * sqrt(nb.n2), 0), 0) AS s
         |  FROM pdot
         |  JOIN pnorm na ON na.vec_id = pdot.a
         |  JOIN pnorm nb ON nb.vec_id = pdot.b2),
         |${SimilarityQueries.mmrSelectCtes(8)},
         |mmrt AS (
         |  SELECT s.rn, s.vec_id, r.parent_id, r.cosine,
         |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
         |    c.text AS chunk_text
         |  FROM selall s
         |  JOIN rel r USING (vec_id)
         |  JOIN kchunks c ON s.vec_id = c.doc_id),
         |mmrc AS (
         |  SELECT *, CAST(SUM(n_tokens) OVER (ORDER BY rn
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |  FROM mmrt)
         |SELECT CAST(rn AS BIGINT) AS rn, vec_id, parent_id, cosine,
         |  n_tokens, cum_tokens, chunk_text
         |FROM mmrc WHERE cum_tokens <= 600 ORDER BY rn""".stripMargin,

    // Hybrid-RAG-serving twin: the flagship core (gates → doc IVF →
    // SemDeDup closure → surv/fqid) continued through the FUSED doc
    // stage — bm25 chain over livedocs (query = the min-id live
    // survivor, self excluded), pruned doc probe + dense exact re-rank
    // over the live candidates, RRF fusion → the top-20 fused parents —
    // then the chunk probe ∩ fused parents and the packing law.
    "cur_rag_serve_hybrid" ->
      s"""WITH RECURSIVE $flagshipIndexCoreCtes,
         |livedocs AS (
         |  SELECT d.doc_id, d.text FROM docs6 d
         |  SEMI JOIN surv ON d.doc_id = surv.vec_id),
         |${TextQueries.bm25BaseCtes("livedocs")},
         |bq AS (SELECT DISTINCT t FROM (
         |  SELECT unnest(string_split(text, ' ')) AS t
         |  FROM livedocs, fqid WHERE doc_id = fqid.q)),
         |bsc AS MATERIALIZED (
         |  SELECT f.doc_id,
         |    CAST(SUM(CAST(FLOOR(CAST(i.idf_q * f.tf AS DOUBLE) * 2.2
         |      / (CAST(f.tf AS DOUBLE) + 0.3
         |         + 0.9 * (CAST(d.dl AS DOUBLE) / (SELECT avgdl FROM bavg)))
         |      + 0.5) AS BIGINT)) AS BIGINT) AS score_q
         |  FROM btf f
         |  JOIN bq USING (t)
         |  JOIN bidf i USING (t)
         |  JOIN bdl d ON d.doc_id = f.doc_id
         |  WHERE f.doc_id <> (SELECT q FROM fqid)
         |  GROUP BY f.doc_id),
         |hbr AS (SELECT doc_id,
         |  ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS brn FROM bsc),
         |hb AS (SELECT doc_id, brn FROM hbr WHERE brn <= 20),
         |dprobe AS (
         |  SELECT cid FROM (
         |    SELECT sc2.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(sq AS DOUBLE) / sqrt(CAST(norm2q AS DOUBLE))
         |          DESC, sc2.cid) AS rn
         |    FROM sc2 JOIN nc2 USING (cid), fqid WHERE sc2.vec_id = fqid.q)
         |  WHERE rn <= 4),
         |dcand AS (
         |  SELECT a2.vec_id FROM a2 JOIN dprobe USING (cid)
         |  SEMI JOIN surv ON a2.vec_id = surv.vec_id
         |  WHERE a2.vec_id <> (SELECT q FROM fqid)),
         |tqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |tqn AS (SELECT SUM(qc * qc) AS qn2 FROM tqd),
         |hdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e LEFT JOIN tqd q ON e.b = q.b
         |  SEMI JOIN dcand ON e.doc_id = dcand.vec_id
         |  GROUP BY e.doc_id),
         |hvr AS (SELECT doc_id, ROW_NUMBER() OVER (
         |    ORDER BY dot / NULLIF(sqrt(n2) * sqrt(qn2), 0) DESC NULLS LAST,
         |      doc_id) AS vrn
         |  FROM hdots, tqn),
         |hv AS (SELECT doc_id, vrn FROM hvr WHERE vrn <= 20),
         |hf AS (
         |  SELECT COALESCE(hv.doc_id, hb.doc_id) AS doc_id,
         |    COALESCE(1.0 / (60 + hv.vrn), 0) + COALESCE(1.0 / (60 + hb.brn), 0)
         |      AS rrf
         |  FROM hv FULL OUTER JOIN hb ON hv.doc_id = hb.doc_id),
         |tcoarse AS (
         |  SELECT doc_id AS parent_id FROM (
         |    SELECT doc_id,
         |      ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn
         |    FROM hf)
         |  WHERE rn <= 20),
         |${SimilarityQueries.chunkCorpusCtesFrom("livedocs", "k")},
         |kgrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM kchunks)),
         |kemb AS MATERIALIZED (
         |  SELECT g.doc_id AS vec_id,
         |    list(CAST(COALESCE(kcnt.c, 0) AS REAL) ORDER BY g.dim)
         |      AS embedding
         |  FROM kgrid g LEFT JOIN kcnt ON g.doc_id = kcnt.doc_id
         |    AND g.dim = kcnt.b
         |  GROUP BY g.doc_id),
         |${SimilarityQueries.ivfCoreCtes(16, "", "", "kemb", "k")},
         |kqvd AS (SELECT dim, v FROM vd, fqid WHERE vec_id = fqid.q),
         |kqs AS (
         |  SELECT kc2.cid,
         |    CAST(SUM(CAST(FLOOR(kqvd.v * kc2.cq * 1000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sq
         |  FROM kqvd JOIN kc2 USING (dim) GROUP BY 1),
         |kprobe AS (
         |  SELECT cid FROM (
         |    SELECT q.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(q.sq AS DOUBLE) / sqrt(CAST(n.norm2q AS DOUBLE))
         |          DESC, q.cid) AS rn
         |    FROM kqs q JOIN nkc2 n USING (cid))
         |  WHERE rn <= 4),
         |kcand AS (
         |  SELECT ka2.vec_id FROM ka2 JOIN kprobe USING (cid)
         |  SEMI JOIN tcoarse ON ka2.vec_id // 1048576 = tcoarse.parent_id),
         |kchf AS (
         |  SELECT e.doc_id AS vec_id, e.doc_id // 1048576 AS parent_id,
         |    e.b, e.c
         |  FROM kcnt e SEMI JOIN kcand ON e.doc_id = kcand.vec_id),
         |kcd AS (
         |  SELECT vec_id, MIN(parent_id) AS parent_id,
         |    SUM(CAST(c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(c AS DOUBLE) * c) AS n2
         |  FROM kchf LEFT JOIN tqd q ON kchf.b = q.b
         |  GROUP BY vec_id),
         |trk AS (
         |  SELECT vec_id, parent_id,
         |    dot / NULLIF(sqrt(n2) * sqrt(tqn.qn2), 0) AS cosine
         |  FROM kcd, tqn
         |  ORDER BY cosine DESC NULLS LAST, vec_id LIMIT 20),
         |trn AS (
         |  SELECT vec_id, parent_id, cosine,
         |    ROW_NUMBER() OVER (ORDER BY cosine DESC NULLS LAST, vec_id)
         |      AS rn
         |  FROM trk),
         |trt AS (
         |  SELECT r.rn, r.vec_id, r.parent_id, r.cosine,
         |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
         |    c.text AS chunk_text
         |  FROM trn r JOIN kchunks c ON r.vec_id = c.doc_id),
         |trc AS (
         |  SELECT *, CAST(SUM(n_tokens) OVER (ORDER BY rn
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |  FROM trt)
         |SELECT rn, vec_id, parent_id, cosine, n_tokens, cum_tokens,
         |  chunk_text
         |FROM trc WHERE cum_tokens <= 600 ORDER BY rn""".stripMargin,

    // The idf flagship twin: the SAME gate chain, but the embedding CTEs
    // are the idf-weighted counts (itf/idf/cnt — N = |docs6|) and the
    // embeddings CTE emits c/1024 (the Spark side's 2⁻¹⁰ downscale — an
    // exact exponent shift, so the REAL cast loses nothing while
    // |c| < 2²⁴). The SemDeDup/probe dots run on the INTEGER cnt table:
    // every sum term is exact, and scaling numerator and denominator by
    // the same power of two commutes with IEEE rounding, so the cosine
    // values are bit-identical to the Spark side's float-vector cosines.
    // Threshold 0.65 — the idf-calibrated cut (see the query comment).
    "cur_pretrain_index_idf" ->
      s"""WITH RECURSIVE ${pretrainGatedCtes("documents2")},
         |${TextQueries.embedIdfCntCteFrom("docs6")},
         |egrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM docs6)),
         |embeddings AS MATERIALIZED (
         |  SELECT g.doc_id AS vec_id,
         |    list(CAST(CAST(COALESCE(cnt.c, 0) AS DOUBLE) / 1024.0 AS REAL)
         |      ORDER BY g.dim) AS embedding
         |  FROM egrid g LEFT JOIN cnt ON g.doc_id = cnt.doc_id
         |    AND g.dim = cnt.b
         |  GROUP BY g.doc_id),
         |${SimilarityQueries.ivfCoreCtes(16)},
         |edot AS (
         |  SELECT x.doc_id AS va, y.doc_id AS vb,
         |    SUM(CAST(x.c AS DOUBLE) * y.c) AS dot
         |  FROM cnt x JOIN cnt y ON x.b = y.b AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |en AS (
         |  SELECT doc_id, SUM(CAST(c AS DOUBLE) * c) AS n2
         |  FROM cnt GROUP BY doc_id),
         |sem AS (
         |  SELECT aa.vec_id AS va, bb.vec_id AS vb
         |  FROM a2 aa
         |  JOIN a2 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
         |  JOIN edot d ON d.va = aa.vec_id AND d.vb = bb.vec_id
         |  JOIN en na ON na.doc_id = aa.vec_id
         |  JOIN en nb ON nb.doc_id = bb.vec_id
         |  WHERE d.dot / NULLIF(sqrt(na.n2) * sqrt(nb.n2), 0) >= 0.65),
         |sedges AS (
         |  SELECT va AS s, vb AS d FROM sem
         |  UNION ALL
         |  SELECT vb AS s, va AS d FROM sem),
         |swalk(id, lbl) AS (
         |  SELECT s, s FROM sedges
         |  UNION
         |  SELECT e.s, w2.lbl FROM sedges e JOIN swalk w2 ON w2.id = e.d),
         |scl AS (SELECT id, MIN(lbl) AS cluster_id FROM swalk GROUP BY id),
         |surv AS MATERIALIZED (
         |  SELECT e.vec_id FROM embeddings e
         |  LEFT JOIN scl ON scl.id = e.vec_id
         |  WHERE scl.id IS NULL OR scl.cluster_id = e.vec_id),
         |fqid AS (SELECT MIN(vec_id) AS q FROM surv),
         |fqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |fdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e
         |  LEFT JOIN fqd q ON e.b = q.b
         |  SEMI JOIN surv ON e.doc_id = surv.vec_id
         |  WHERE e.doc_id <> (SELECT q FROM fqid)
         |  GROUP BY e.doc_id),
         |fqn AS (SELECT SUM(qc * qc) AS qn2 FROM fqd)
         |SELECT d.doc_id AS vec_id,
         |  d.dot / NULLIF(sqrt(d.n2) * sqrt(fqn.qn2), 0) AS cosine
         |FROM fdots d, fqn
         |ORDER BY cosine DESC NULLS LAST, vec_id
         |LIMIT 10""".stripMargin,

    // The incremental twin is the same chain FULLY RECOMPUTED over the
    // edited corpus — DuckDB never sees the increment, so the hash match
    // proves incremental ≡ full across engines.
    "cur_pretrain_incr" -> pretrainSql("documents2c", curCorpusCte),

    // Refresh-flagship twin: the ENTIRE target state recomputed from
    // scratch — pretrain gates on the edited corpus (docs6), gates on the
    // PREVIOUS corpus via a nested self-contained WITH (docs6prev, names
    // shadowed inside the subquery), both corpora embedded, ONE embeddings
    // CTE holding prev vectors at their original ids (the quantizer
    // TRAINS on these — trainWhere, seeds keyed by the real doc ids
    // exactly as the Spark side froze them) and cur vectors offset by
    // 5·10⁷ (assignment only), SemDeDup full closure over the cur
    // assignments, exhaustive probe from the min-id survivor. The Spark
    // side produced the same state INCREMENTALLY (pair carry-over, diff ×
    // list-width fresh pairs, delete/compact/append/re-tombstone), so the
    // hash match is the incremental ≡ full proof.
    "cur_pretrain_index_incr" ->
      s"""WITH RECURSIVE $incrIndexCoreCtes,
         |fqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |fdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e
         |  LEFT JOIN fqd q ON e.b = q.b
         |  SEMI JOIN surv ON e.doc_id = surv.vec_id
         |  WHERE e.doc_id <> (SELECT q FROM fqid)
         |  GROUP BY e.doc_id),
         |fqn AS (SELECT SUM(qc * qc) AS qn2 FROM fqd)
         |SELECT d.doc_id AS vec_id,
         |  d.dot / NULLIF(sqrt(d.n2) * sqrt(fqn.qn2), 0) AS cosine
         |FROM fdots d, fqn
         |ORDER BY cosine DESC NULLS LAST, vec_id
         |LIMIT 10""".stripMargin,

    // Incremental-RAG-serving twin: the ENTIRE target serving state
    // recomputed from scratch over the edited corpus — the shared incr
    // core (gates on both corpora, doc quantizer trained on prev, cur
    // SemDeDup closure → surv/fqid), PLUS the PREV closure → prev live
    // docs (the chunk quantizer's training corpus — the state last
    // night's build froze), chunks of BOTH live corpora in one offset-id
    // embeddings CTE, the chunk quantizer trained on PREV chunks only,
    // pruned doc probe (4 of 16) → coarse top-20, chunk probe (4 of 16)
    // ∩ coarse parents, exact sparse re-rank, 600-token packing. The
    // Spark side produced the same state by chunk-granular diff verbs
    // (tombstone/compact/append on the chunk index, text-store diff), so
    // the hash match proves incremental ≡ full for the serving stack.
    "cur_rag_serve_incr" ->
      s"""WITH RECURSIVE $incrIndexCoreCtes,
         |pvedot AS (
         |  SELECT x.doc_id AS va, y.doc_id AS vb,
         |    SUM(CAST(x.c AS DOUBLE) * y.c) AS dot
         |  FROM pvcnt x JOIN pvcnt y ON x.b = y.b AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |pven AS (
         |  SELECT doc_id, SUM(CAST(c AS DOUBLE) * c) AS n2
         |  FROM pvcnt GROUP BY doc_id),
         |pvsem AS (
         |  SELECT aa.vec_id AS va, bb.vec_id AS vb
         |  FROM a2 aa
         |  JOIN a2 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
         |  JOIN pvedot d ON d.va = aa.vec_id AND d.vb = bb.vec_id
         |  JOIN pven na ON na.doc_id = aa.vec_id
         |  JOIN pven nb ON nb.doc_id = bb.vec_id
         |  WHERE aa.vec_id < 50000000 AND bb.vec_id < 50000000
         |    AND d.dot / NULLIF(sqrt(na.n2) * sqrt(nb.n2), 0) >= 0.8),
         |pvsedges AS (
         |  SELECT va AS s, vb AS d FROM pvsem
         |  UNION ALL
         |  SELECT vb AS s, va AS d FROM pvsem),
         |pvswalk(id, lbl) AS (
         |  SELECT s, s FROM pvsedges
         |  UNION
         |  SELECT e.s, w2.lbl FROM pvsedges e JOIN pvswalk w2 ON w2.id = e.d),
         |pvscl AS (SELECT id, MIN(lbl) AS cluster_id FROM pvswalk GROUP BY id),
         |psurv AS MATERIALIZED (
         |  SELECT d.doc_id AS vec_id FROM pvdocs6 d
         |  LEFT JOIN pvscl ON pvscl.id = d.doc_id
         |  WHERE pvscl.id IS NULL OR pvscl.cluster_id = d.doc_id),
         |pvlive AS (
         |  SELECT d.doc_id, d.text FROM pvdocs6 d
         |  SEMI JOIN psurv ON d.doc_id = psurv.vec_id),
         |livedocs AS (
         |  SELECT d.doc_id, d.text FROM docs6 d
         |  SEMI JOIN surv ON d.doc_id = surv.vec_id),
         |${SimilarityQueries.chunkCorpusCtesFrom("pvlive", "pk")},
         |${SimilarityQueries.chunkCorpusCtesFrom("livedocs", "k")},
         |pkgrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM pkchunks)),
         |kgrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM kchunks)),
         |kemb AS MATERIALIZED (
         |  SELECT g.doc_id AS vec_id,
         |    list(CAST(COALESCE(pkcnt.c, 0) AS REAL) ORDER BY g.dim)
         |      AS embedding
         |  FROM pkgrid g LEFT JOIN pkcnt ON g.doc_id = pkcnt.doc_id
         |    AND g.dim = pkcnt.b
         |  GROUP BY g.doc_id
         |  UNION ALL
         |  SELECT g.doc_id + 52428800000000 AS vec_id,
         |    list(CAST(COALESCE(kcnt.c, 0) AS REAL) ORDER BY g.dim)
         |      AS embedding
         |  FROM kgrid g LEFT JOIN kcnt ON g.doc_id = kcnt.doc_id
         |    AND g.dim = kcnt.b
         |  GROUP BY g.doc_id),
         |${SimilarityQueries.ivfCoreCtes(16, "vec_id < 52428800000000", "",
             "kemb", "k")},
         |ka2c AS MATERIALIZED (
         |  SELECT vec_id - 52428800000000 AS vid, cid FROM ka2
         |  WHERE vec_id >= 52428800000000),
         |dprobe AS (
         |  SELECT cid FROM (
         |    SELECT sc2.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(sq AS DOUBLE) / sqrt(CAST(norm2q AS DOUBLE))
         |          DESC, sc2.cid) AS rn
         |    FROM sc2 JOIN nc2 USING (cid), fqid
         |    WHERE sc2.vec_id = fqid.q + 50000000)
         |  WHERE rn <= 4),
         |dcand AS (
         |  SELECT e.vid AS vec_id FROM a2c e JOIN dprobe USING (cid)
         |  SEMI JOIN surv ON e.vid = surv.vec_id
         |  WHERE e.vid <> (SELECT q FROM fqid)),
         |tqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |tqn AS (SELECT SUM(qc * qc) AS qn2 FROM tqd),
         |tdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e LEFT JOIN tqd q ON e.b = q.b
         |  SEMI JOIN dcand ON e.doc_id = dcand.vec_id
         |  GROUP BY e.doc_id),
         |tcoarse AS (
         |  SELECT doc_id AS parent_id FROM (
         |    SELECT d.doc_id,
         |      ROW_NUMBER() OVER (ORDER BY
         |        d.dot / NULLIF(sqrt(d.n2) * sqrt(tqn.qn2), 0)
         |        DESC NULLS LAST, d.doc_id) AS rn
         |    FROM tdots d, tqn)
         |  WHERE rn <= 20),
         |kqvd AS (SELECT dim, v FROM vd, fqid
         |  WHERE vec_id = fqid.q + 50000000),
         |kqs AS (
         |  SELECT kc2.cid,
         |    CAST(SUM(CAST(FLOOR(kqvd.v * kc2.cq * 1000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sq
         |  FROM kqvd JOIN kc2 USING (dim) GROUP BY 1),
         |kprobe AS (
         |  SELECT cid FROM (
         |    SELECT q.cid,
         |      ROW_NUMBER() OVER (
         |        ORDER BY CAST(q.sq AS DOUBLE) / sqrt(CAST(n.norm2q AS DOUBLE))
         |          DESC, q.cid) AS rn
         |    FROM kqs q JOIN nkc2 n USING (cid))
         |  WHERE rn <= 4),
         |kcand AS (
         |  SELECT e.vid AS vec_id FROM ka2c e JOIN kprobe USING (cid)
         |  SEMI JOIN tcoarse ON e.vid // 1048576 = tcoarse.parent_id),
         |kchf AS (
         |  SELECT e.doc_id AS vec_id, e.doc_id // 1048576 AS parent_id,
         |    e.b, e.c
         |  FROM kcnt e SEMI JOIN kcand ON e.doc_id = kcand.vec_id),
         |kcd AS (
         |  SELECT vec_id, MIN(parent_id) AS parent_id,
         |    SUM(CAST(c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(c AS DOUBLE) * c) AS n2
         |  FROM kchf LEFT JOIN tqd q ON kchf.b = q.b
         |  GROUP BY vec_id),
         |trk AS (
         |  SELECT vec_id, parent_id,
         |    dot / NULLIF(sqrt(n2) * sqrt(tqn.qn2), 0) AS cosine
         |  FROM kcd, tqn
         |  ORDER BY cosine DESC NULLS LAST, vec_id LIMIT 20),
         |trn AS (
         |  SELECT vec_id, parent_id, cosine,
         |    ROW_NUMBER() OVER (ORDER BY cosine DESC NULLS LAST, vec_id)
         |      AS rn
         |  FROM trk),
         |trt AS (
         |  SELECT r.rn, r.vec_id, r.parent_id, r.cosine,
         |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
         |    c.text AS chunk_text
         |  FROM trn r JOIN kchunks c ON r.vec_id = c.doc_id),
         |trc AS (
         |  SELECT *, CAST(SUM(n_tokens) OVER (ORDER BY rn
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |  FROM trt)
         |SELECT rn, vec_id, parent_id, cosine, n_tokens, cum_tokens,
         |  chunk_text
         |FROM trc WHERE cum_tokens <= 600 ORDER BY rn""".stripMargin,

    // Frozen-idf refresh twin: the incr chain with BOTH embedding sides
    // idf-weighted — prev vectors by the prev corpus's OWN idf
    // (pv-prefixed idf chain), cur vectors by THAT SAME FROZEN table (cur
    // tf ⋈ pvidf — the serving law), both downscaled /1024, quantizer
    // trained on prev rows, SemDeDup at the idf-calibrated 0.65 over the
    // integer cnt dots (scale-commute exactness), exhaustive probe.
    "cur_pretrain_index_incr_idf" ->
      s"""WITH RECURSIVE ${pretrainGatedCtes("documents2c", curCorpusCte)},
         |${prefixCtes(pretrainGatedCtes("documents2"), "pv", gatedChainNames)},
         |${prefixCtes(TextQueries.embedIdfCntCteFrom("pvdocs6"), "pv",
             Seq("itoks", "iocc", "itf", "idf", "cnt"))},
         |${TextQueries.embedIdfCntFrozenCteFrom("docs6", "pvidf")},
         |egrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM docs6)),
         |pgrid AS (
         |  SELECT doc_id, unnest(range(0, 64)) AS dim
         |  FROM (SELECT DISTINCT doc_id FROM pvdocs6)),
         |embeddings AS MATERIALIZED (
         |  SELECT g.doc_id AS vec_id,
         |    list(CAST(CAST(COALESCE(p.c, 0) AS DOUBLE) / 1024.0 AS REAL)
         |      ORDER BY g.dim) AS embedding
         |  FROM pgrid g LEFT JOIN pvcnt p ON g.doc_id = p.doc_id
         |    AND g.dim = p.b
         |  GROUP BY g.doc_id
         |  UNION ALL
         |  SELECT g.doc_id + 50000000 AS vec_id,
         |    list(CAST(CAST(COALESCE(cnt.c, 0) AS DOUBLE) / 1024.0 AS REAL)
         |      ORDER BY g.dim) AS embedding
         |  FROM egrid g LEFT JOIN cnt ON g.doc_id = cnt.doc_id
         |    AND g.dim = cnt.b
         |  GROUP BY g.doc_id),
         |${SimilarityQueries.ivfCoreCtes(16, "vec_id < 50000000")},
         |a2c AS MATERIALIZED (
         |  SELECT vec_id - 50000000 AS vid, cid FROM a2
         |  WHERE vec_id >= 50000000),
         |edot AS (
         |  SELECT x.doc_id AS va, y.doc_id AS vb,
         |    SUM(CAST(x.c AS DOUBLE) * y.c) AS dot
         |  FROM cnt x JOIN cnt y ON x.b = y.b AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |en AS (
         |  SELECT doc_id, SUM(CAST(c AS DOUBLE) * c) AS n2
         |  FROM cnt GROUP BY doc_id),
         |sem AS (
         |  SELECT aa.vid AS va, bb.vid AS vb
         |  FROM a2c aa
         |  JOIN a2c bb ON aa.cid = bb.cid AND aa.vid < bb.vid
         |  JOIN edot d ON d.va = aa.vid AND d.vb = bb.vid
         |  JOIN en na ON na.doc_id = aa.vid
         |  JOIN en nb ON nb.doc_id = bb.vid
         |  WHERE d.dot / NULLIF(sqrt(na.n2) * sqrt(nb.n2), 0) >= 0.65),
         |sedges AS (
         |  SELECT va AS s, vb AS d FROM sem
         |  UNION ALL
         |  SELECT vb AS s, va AS d FROM sem),
         |swalk(id, lbl) AS (
         |  SELECT s, s FROM sedges
         |  UNION
         |  SELECT e.s, w2.lbl FROM sedges e JOIN swalk w2 ON w2.id = e.d),
         |scl AS (SELECT id, MIN(lbl) AS cluster_id FROM swalk GROUP BY id),
         |surv AS MATERIALIZED (
         |  SELECT e.vid AS vec_id FROM a2c e
         |  LEFT JOIN scl ON scl.id = e.vid
         |  WHERE scl.id IS NULL OR scl.cluster_id = e.vid),
         |fqid AS (SELECT MIN(vec_id) AS q FROM surv),
         |fqd AS (
         |  SELECT b, CAST(c AS DOUBLE) AS qc
         |  FROM cnt, fqid WHERE doc_id = fqid.q),
         |fdots AS (
         |  SELECT e.doc_id,
         |    SUM(CAST(e.c AS DOUBLE) * COALESCE(q.qc, 0)) AS dot,
         |    SUM(CAST(e.c AS DOUBLE) * e.c) AS n2
         |  FROM cnt e
         |  LEFT JOIN fqd q ON e.b = q.b
         |  SEMI JOIN surv ON e.doc_id = surv.vec_id
         |  WHERE e.doc_id <> (SELECT q FROM fqid)
         |  GROUP BY e.doc_id),
         |fqn AS (SELECT SUM(qc * qc) AS qn2 FROM fqd)
         |SELECT d.doc_id AS vec_id,
         |  d.dot / NULLIF(sqrt(d.n2) * sqrt(fqn.qn2), 0) AS cosine
         |FROM fdots d, fqn
         |ORDER BY cosine DESC NULLS LAST, vec_id
         |LIMIT 10""".stripMargin,

    // Quality-ranked per-source running sums (the cur_budget window twin,
    // partitioned by source, against the CASE budget).
    "cur_mixture_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    FLOOR((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
        |      + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 0.3
        |      + LEAST(CAST(len(list_filter(string_split(text, ' '),
        |          t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3)
        |      * 10000.0 + 0.5) / 10000.0 AS quality,
        |    source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |r AS (
        |  SELECT doc_id, source, quality, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        |  FROM q)
        |SELECT doc_id, source, quality, n_tokens FROM r
        |WHERE running <= CASE source WHEN 'src0' THEN 800
        |  WHEN 'src1' THEN 1000 WHEN 'src2' THEN 600 ELSE 2000 END
        |ORDER BY doc_id""".stripMargin,

    // Per-source hash-ordered running sums against per-source budgets
    // (the hashUnit twin: first 8 md5 hex chars as a 32-bit int × 2⁻³²).
    "cur_mixture" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      / 4294967296.0 AS u
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |r AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        |  FROM c)
        |SELECT doc_id, source, n_tokens FROM r
        |WHERE running <= CASE source WHEN 'src0' THEN 800
        |  WHEN 'src1' THEN 1000 WHEN 'src2' THEN 600 ELSE 2000 END
        |ORDER BY doc_id""".stripMargin,

    "cur_sample_k" ->
      """WITH v AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      / 4294967296.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
        |  FROM v)
        |SELECT doc_id, lang FROM r WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    // cur_mixture's prefix machinery with temperedBudgets' weight chain
    // replayed: per-lang totals → 1e-6-quantized √t → exact HUGEINT
    // floor-division budget split → hash-ordered running-sum prefix.
    "cur_mixture_temp" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      / 4294967296.0 AS u
        |  FROM documents),
        |t AS (
        |  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS tok FROM c
        |  GROUP BY 1 HAVING SUM(n_tokens) > 0),
        |w AS (
        |  SELECT lang,
        |    CAST(FLOOR(exp(0.5 * ln(CAST(tok AS DOUBLE))) * 1000000.0 + 0.5)
        |      AS BIGINT) AS wq
        |  FROM t),
        |b AS (
        |  SELECT lang,
        |    (8000::HUGEINT * wq::HUGEINT) // (SELECT SUM(wq) FROM w)
        |      AS budget
        |  FROM w),
        |r AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY u, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        |  FROM c)
        |SELECT r.doc_id, r.lang, r.n_tokens
        |FROM r JOIN b ON r.lang = b.lang
        |WHERE r.running <= b.budget
        |ORDER BY r.doc_id""".stripMargin,

    // Same chunk derivation as cur_chunks, then the shard-partitioned
    // running sum (CAST to BIGINT: DuckDB window SUM yields HUGEINT).
    "cur_pack" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN n <= 64 THEN 1
        |         ELSE CAST(CEIL((n - 64) / 56.0) AS INT) + 1 END AS n_chunks
        |  FROM t),
        |e AS (
        |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_no FROM c),
        |ch AS (
        |  SELECT doc_id, chunk_no,
        |    len(list_slice(toks, chunk_no * 56 + 1, chunk_no * 56 + 64)) AS n_tok,
        |    $bucket8 AS shard
        |  FROM e),
        |p AS (
        |  SELECT doc_id, chunk_no, shard,
        |    CAST(SUM(n_tok) OVER (PARTITION BY shard
        |      ORDER BY doc_id, chunk_no ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      - n_tok AS prefix
        |  FROM ch)
        |SELECT doc_id, chunk_no, shard,
        |  CAST(FLOOR(CAST(prefix AS DOUBLE) / 256.0) AS BIGINT) AS bin,
        |  prefix % 256 AS bin_tokens_before
        |FROM p ORDER BY doc_id, chunk_no""".stripMargin,

    // BPE-true packing twin: the 8-round merge replay (w8) → per-word
    // piece counts → per-chunk piece sums → the cur_pack bin law with the
    // BPE count as the token column.
    "cur_pack_bpe" ->
      s"""${TextQueries.bpeCtes},
        |f AS (
        |  SELECT word, len(string_split(trim(syms, '~'), '~~')) AS nsym
        |  FROM w8),
        |t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN n <= 64 THEN 1
        |         ELSE CAST(CEIL((n - 64) / 56.0) AS INT) + 1 END AS n_chunks
        |  FROM t),
        |e AS (
        |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_no FROM c),
        |chx AS (
        |  SELECT doc_id, chunk_no,
        |    list_slice(toks, chunk_no * 56 + 1, chunk_no * 56 + 64) AS ctoks,
        |    $bucket8 AS shard
        |  FROM e),
        |cb AS (
        |  SELECT doc_id, chunk_no, CAST(SUM(f.nsym) AS BIGINT) AS n_bpe
        |  FROM (SELECT doc_id, chunk_no, unnest(ctoks) AS word FROM chx) u
        |  JOIN f USING (word)
        |  GROUP BY doc_id, chunk_no),
        |p AS (
        |  SELECT x.doc_id, x.chunk_no, x.shard, cb.n_bpe,
        |    CAST(SUM(cb.n_bpe) OVER (PARTITION BY x.shard
        |      ORDER BY x.doc_id, x.chunk_no ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) - cb.n_bpe AS prefix
        |  FROM chx x JOIN cb ON x.doc_id = cb.doc_id
        |    AND x.chunk_no = cb.chunk_no)
        |SELECT doc_id, chunk_no, n_bpe AS n_bpe_tokens, shard,
        |  CAST(FLOOR(CAST(prefix AS DOUBLE) / 256.0) AS BIGINT) AS bin,
        |  prefix % 256 AS bin_tokens_before
        |FROM p ORDER BY doc_id, chunk_no""".stripMargin,

    "cur_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN n <= 64 THEN 1
        |         ELSE CAST(CEIL((n - 64) / 56.0) AS INT) + 1 END AS n_chunks
        |  FROM t),
        |e AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, n_chunks)) AS chunk_no
        |  FROM c)
        |SELECT doc_id, chunk_no,
        |  len(list_slice(toks, chunk_no * 56 + 1, chunk_no * 56 + 64)) AS n_chunk_tokens,
        |  md5(array_to_string(list_slice(toks, chunk_no * 56 + 1, chunk_no * 56 + 64), ' ')) AS fp_chunk
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin,

    // Full-outer fingerprint compare; IS DISTINCT FROM mirrors the Spark
    // null-safe inequality (unreachable on this corpus, pinned anyway).
    "cur_snapshot_diff" ->
      """WITH cur AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 30 = 0 THEN text || ' qqedit' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 50 <> 0
        |  UNION ALL
        |  SELECT doc_id + 900000 AS doc_id, text
        |  FROM documents WHERE doc_id % 40 = 0),
        |p AS (SELECT doc_id, md5(text) AS fp_prev FROM documents),
        |c AS (SELECT doc_id, md5(text) AS fp_cur FROM cur),
        |d AS (
        |  SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
        |    CASE WHEN p.doc_id IS NULL THEN 'added'
        |         WHEN c.doc_id IS NULL THEN 'removed'
        |         WHEN p.fp_prev IS DISTINCT FROM c.fp_cur THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM p FULL OUTER JOIN c ON p.doc_id = c.doc_id)
        |SELECT doc_id, status FROM d
        |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin,

    // Same quality formula as cur_mixture_quality; per-source row_number
    // against ceil(0.25 × the source's own count).
    "cur_quality_top" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    FLOOR((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
        |      + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 0.3
        |      + LEAST(CAST(len(list_filter(string_split(text, ' '),
        |          t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3)
        |      * 10000.0 + 0.5) / 10000.0 AS quality,
        |    source
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, quality,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS gn
        |  FROM q)
        |SELECT doc_id, source, quality FROM r
        |WHERE rn <= CEIL(gn * 0.25)
        |ORDER BY doc_id""".stripMargin,

    // DSIR twin: same unigram+bigram explode as the lm/termfreq twins,
    // md5 bucket hash, both lns on the 1e-9 integer grid, per-doc SUM of
    // the long bucket weights (CAST back to BIGINT: DuckDB SUM → HUGEINT).
    "cur_dsir" ->
      s"""WITH $dsirCore
        |SELECT ob.doc_id, COUNT(*) AS n_feats,
        |  FLOOR(CAST(CAST(SUM(lnwq) AS BIGINT) AS DOUBLE)
        |    / 1000000000.0 * 10000.0 + 0.5) / 10000.0 AS dsir_weight
        |FROM ob JOIN bw USING (b)
        |GROUP BY ob.doc_id ORDER BY ob.doc_id""".stripMargin,

    // Gumbel-top-k twin: score_q = wq + floor(−ln(−ln((h+0.5)/2³²))·1e9),
    // top 100 by (score_q DESC, doc_id), presented in doc_id order.
    "cur_dsir_sample" ->
      s"""WITH $dsirCore,
        |dw AS (
        |  SELECT ob.doc_id, CAST(SUM(lnwq) AS BIGINT) AS wq
        |  FROM ob JOIN bw USING (b) GROUP BY ob.doc_id),
        |g AS (
        |  SELECT doc_id, wq + CAST(FLOOR(-ln(-ln(
        |      ((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        + 0.5) / 4294967296.0)))
        |    * 1000000000.0 + 0.5) AS BIGINT) AS score_q
        |  FROM dw),
        |top AS (SELECT doc_id, score_q FROM g
        |  ORDER BY score_q DESC, doc_id LIMIT 100)
        |SELECT doc_id,
        |  FLOOR(CAST(score_q AS DOUBLE) / 1000000000.0 * 10000.0 + 0.5)
        |    / 10000.0 AS score
        |FROM top ORDER BY doc_id""".stripMargin
  )
}
