package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus→index flagship compositions: raw documents through the
  * pretrain gates, the native hashing-trick embedder, one IVF build shared
  * by SemDeDup and serving, tombstone maintenance, and retrieval — plus
  * the INCREMENTAL refresh that keeps a served index in step with a
  * changing corpus without rebuilding it (the production nightly shape:
  * only the diff and its consequences touch the expensive stages; the
  * index mutates through the existing delete/compact/append verbs).
  */
object CorpusIndex {

  final case class Built(model: Ivf.IvfModel, emb: DataFrame,
                         doomed: DataFrame)

  /** The `cur_pretrain_index` body: gate → embed → build → SemDeDup inside
    * the index's own lists → tombstone the collapsed near-dups. Replay-safe
    * within a JVM (memoized build; batch-0 re-delete resolves to identical
    * content and no-ops on the ingest marker) and across JVMs (a fresh
    * build overwrites the index root).
    */
  def build(docs0: DataFrame, probe: DataFrame, stateKey: String,
            indexKey: String, threshold: Double = 0.8,
            scope: graft.CacheScope = graft.CacheScope.global): Built = {
    val gated = Pretrain.buildState(stateKey, docs0, probe, scope).gated
    val emb = scope.persist(Embed.hashedTf(gated))
    val model = Ivf.buildIndex(indexKey, emb)
    val doomed = Dedup
      .nearDupClusters(Dedup.semanticDupPairs(emb, threshold, indexKey),
        "vec_a", "vec_b", scope = scope)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id").as("vec_id"))
    Ivf.deleteFromIndex(model, doomed, batchId = 0L)
    Built(model, emb, doomed)
  }

  // once-per-JVM guard for the refresh's mutation sequence: compact and
  // append change PHYSICAL rows, so a replayed pass must not re-derive the
  // diff from post-refresh state (a fresh JVM rebuilds the index from
  // scratch first, so the guard resets exactly when the state does)
  private val refreshed =
    new java.util.concurrent.ConcurrentHashMap[String, Unit]()

  /** INCREMENTAL corpus→index refresh — [[build]]'s nightly sibling. Given
    * the previous corpus (whose state, embeddings, index and semantic
    * tombstones [[build]] materialized under `stateKey`/`indexKey`) and
    * the current corpus, brings the SERVED index to exactly the state a
    * from-scratch build-on-cur under the FROZEN quantizer would produce:
    *
    *   1. gated survivors of `curDocs` via [[Pretrain.gatedIncremental]]
    *      (only the diff and its shared-gram frontier re-gate);
    *   2. membership diff by (doc_id, text-md5): docs LEAVING the gated
    *      set, ENTERING it, or surviving with CHANGED text;
    *   3. pair maintenance under the frozen quantizer: previous semantic
    *      pairs with both endpoints untouched carry over verbatim
    *      (unchanged text ⇒ unchanged vector ⇒ unchanged list); fresh
    *      vectors (entering ∪ changed) pair only against co-assigned live
    *      vectors — diff × list-width work, never corpus × corpus;
    *   4. global closure over the maintained pair table (pair-table-sized
    *      metadata work, the [[Dedup.collapseNearDups]] precedent) →
    *      the current doomed set;
    *   5. index mutation through the existing verbs, once per JVM:
    *      tombstone leavers+changed → compact (physically drops them AND
    *      the previous round's semantic tombstones, consuming the
    *      tombstone table) → frozen-quantizer append of entering ∪
    *      changed ∪ RESURRECTED docs (previously-doomed docs whose dup
    *      partner left — compaction dropped their rows, and their
    *      unchanged text re-embeds bit-identically) → tombstone the
    *      current doomed set.
    *
    * Soundness of the pair identity (what the oracle proves): with the
    * quantizer frozen, unchanged docs keep vector and list, so the current
    * pair set = carried pairs ∪ fresh-touching pairs exactly; the final
    * visible content is embed(gatedCur) ∖ doomedCur — the DuckDB twin
    * recomputes THAT from scratch and the hash must match.
    *
    * Returns (model, embCur) — probe with
    * `Ivf.probe(model, embCur, qid, …)`; [[minLiveVecId]] gives the
    * deterministic query id from materialized state alone (replay-stable:
    * later passes skip every derivation above).
    */
  def refresh(prevDocs: DataFrame, curDocs: DataFrame, probe: DataFrame,
              stateKey: String, indexKey: String, threshold: Double = 0.8,
              scope: graft.CacheScope = graft.CacheScope.global)
      : (Ivf.IvfModel, DataFrame) = {
    val spark = curDocs.sparkSession
    val st = Pretrain.buildState(stateKey, prevDocs, probe, scope)
    val gatedCur = scope.checkpoint(
      Pretrain.gatedIncremental(prevDocs, curDocs, probe, st, scope))
    val embCur = Embed.hashedTf(gatedCur)
    var modelOut: Ivf.IvfModel = null
    refreshed.computeIfAbsent(indexKey, _ => {
      val b = build(prevDocs, probe, stateKey, indexKey, threshold, scope)
      val model = b.model
      val doomedPrev = scope.persist(b.doomed)
      val pairsPrev = scope.persist(
        Dedup.semanticDupPairs(b.emb, threshold, indexKey))
      val embCurP = scope.persist(embCur)
      val gPrev = st.gated.select(col("doc_id"), md5(col("text")).as("fp_prev"))
      val gCur = gatedCur.select(col("doc_id"), md5(col("text")).as("fp_cur"))
      val leaving = gPrev.join(gCur, Seq("doc_id"), "left_anti")
        .select("doc_id")
      val entering = gCur.join(gPrev, Seq("doc_id"), "left_anti")
        .select("doc_id")
      val changed = gPrev.join(gCur, "doc_id")
        .filter(col("fp_prev") =!= col("fp_cur")).select("doc_id")
      val touched = scope.persist(leaving.unionByName(changed).distinct())
      val freshIds = scope.persist(entering.unionByName(changed).distinct())
      // 3. pair maintenance (pre-mutation index rows = prev embeddings)
      val kept = pairsPrev
        .join(touched.select(col("doc_id").as("vec_a")), Seq("vec_a"), "left_anti")
        .join(touched.select(col("doc_id").as("vec_b")), Seq("vec_b"), "left_anti")
      val freshAssigned = scope.persist(Ivf.index(
        embCurP.join(freshIds.withColumnRenamed("doc_id", "vec_id"),
          Seq("vec_id"), "left_semi"),
        model.centroids))
      val unchangedRows = spark.read.parquet(model.indexPath)
        .select("vec_id", "embedding", "list")
        .join(touched.withColumnRenamed("doc_id", "vec_id"),
          Seq("vec_id"), "left_anti")
      val sideB = unchangedRows
        .unionByName(freshAssigned.select("vec_id", "embedding", "list"))
      val freshPairs = freshAssigned
        .select(col("list"), col("vec_id").as("fid"),
          col("embedding").as("f_emb"))
        .join(sideB.select(col("list"), col("vec_id").as("oid"),
          col("embedding").as("o_emb")), "list")
        .filter(col("fid") =!= col("oid"))
        .withColumn("cosine",
          graft.functions.VectorOps.cosine(col("f_emb"), col("o_emb")))
        .filter(col("cosine") >= threshold)
        .select(least(col("fid"), col("oid")).as("vec_a"),
          greatest(col("fid"), col("oid")).as("vec_b"), col("cosine"))
        .distinct()
      // 4. global closure — metadata-scale
      val doomedCur = scope.persist(Dedup
        .nearDupClusters(kept.unionByName(freshPairs), "vec_a", "vec_b",
          scope = scope)
        .filter(col("cluster_id") =!= col("doc_id"))
        .select(col("doc_id").as("vec_id")))
      // 5. mutate: delete → compact (drops leavers/changed AND doomedPrev
      // physically) → append fresh + resurrected → current tombstones
      Ivf.deleteFromIndex(model,
        touched.select(col("doc_id").as("vec_id")), batchId = 1L)
      Ivf.compactIndex(spark, model, maxFilesPerList = Int.MaxValue)
      val resurrected = doomedPrev
        .join(doomedCur, Seq("vec_id"), "left_anti")
        .join(gCur.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      val appendIds = freshIds.withColumnRenamed("doc_id", "vec_id")
        .unionByName(resurrected).distinct()
      Ivf.appendToIndex(model,
        embCurP.join(appendIds, Seq("vec_id"), "left_semi"))
      Ivf.deleteFromIndex(model, doomedCur, batchId = 2L)
      modelOut = model
      ()
    })
    if (modelOut == null)
      modelOut = Ivf.buildIndex(indexKey, Embed.hashedTf(st.gated))
    (modelOut, embCur)
  }

  /** Smallest live vec_id of a materialized index (rows minus tombstones)
    * — the replay-stable deterministic query id for the refresh flagship.
    */
  def minLiveVecId(model: Ivf.IvfModel): Long = {
    val spark = org.apache.spark.sql.SparkSession.active
    val rows = spark.read.parquet(model.indexPath).select("vec_id")
    val live = graft.sources.Sinks
      .readTombstones(spark, Ivf.tombstonesPath(model.indexPath), None)
      .fold(rows)(t => rows.join(t, Seq("vec_id"), "left_anti"))
    live.agg(min("vec_id")).head().getLong(0)
  }
}
