package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks DataFrames persisted inside composite operators (MinHash
  * signature tables, inverted indexes) so callers can release exactly those
  * blocks once the operator's result is materialized — instead of relying
  * on `spark.catalog.clearCache()`, which nukes every cached table in the
  * session including the caller's own.
  *
  * Operators that cache take a `scope: CacheScope = CacheScope.global`
  * parameter. Library users embedding graft alongside their own cached
  * tables should pass a fresh scope and `release()` it after the action:
  *
  * {{{
  * val scope = new CacheScope
  * val pairs = Dedup.minhashPairs(docs, 0.8, scope = scope)
  * pairs.write.parquet(out)   // materialize first — the result is lazy
  * scope.release()
  * }}}
  */
final class CacheScope {
  private val handles = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private var warned = false

  private[graft] def persist(df: DataFrame): DataFrame = synchronized {
    handles += df
    if (handles.size > CacheScope.warnThreshold && !warned) {
      warned = true
      System.err.println(
        s"[graft] CacheScope holds ${handles.size} persisted DataFrames — " +
          "a long-lived caller is probably missing release() (see " +
          "CacheScope.global scaladoc)")
    }
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  private val checkpoints = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Eager `localCheckpoint` tracked for [[release]]: materializes `df`
    * once and REPLACES its logical plan with a `LogicalRDD` scan of the
    * stored partitions. Unlike [[persist]] (which caches data but leaves
    * the full plan tree in place, so every subsequent action re-analyzes
    * it), this truncates lineage — the tool for a deep-pipeline boundary
    * whose downstream launches many small jobs (measured on the pretrain
    * flagship: stages 5–6 fell from 20–50 s to seconds once `gated`
    * stopped dragging the whole stage-1..4 tree into each mixture/pack
    * job's analysis). Same data, same results; cost-only, like the
    * label-propagation rounds in [[operators.Dedup.nearDupClusters]].
    * Cluster note: local checkpoints don't survive executor loss — a
    * nightly production run materializes these boundaries as tables
    * instead ([[operators.Pretrain.buildState]] / the versioned stream
    * state), which has the same plan-truncating effect.
    */
  private[graft] def checkpoint(df: DataFrame): DataFrame = synchronized {
    // constraint-stripping variant (see CheckpointBridge scaladoc): plain
    // localCheckpoint preserves origin constraints across the cut, and the
    // iterated DPs (Viterbi states) compound them exponentially into a
    // >64 KB pushed filter — interpreted-fallback territory
    val out = org.apache.spark.sql.graft.CheckpointBridge
      .localCheckpointNoConstraints(df)
    checkpoints += out
    out
  }

  /** Unpersist every DataFrame acquired in this scope (non-blocking) and
    * forget the handles. Safe to call repeatedly; only affects blocks this
    * scope acquired.
    */
  def release(): Unit = synchronized {
    handles.foreach(_.unpersist(blocking = false))
    handles.clear()
    checkpoints.foreach(CacheScope.releaseCheckpoint)
    checkpoints.clear()
  }

  /** Number of currently-held handles (diagnostics/tests). */
  def size: Int = synchronized(handles.size)
}

object CacheScope {
  private val perThread = new ThreadLocal[CacheScope] {
    override def initialValue(): CacheScope = new CacheScope
  }

  /** Default scope for callers that don't manage one — PER THREAD since
    * round 9 (previously a process-wide singleton). Harness entry points
    * (Verify, Bench) release it after each query; long-lived applications
    * should prefer a scope per job and release it deterministically.
    *
    * Thread-local because Verify now runs independent queries concurrently:
    * with one shared singleton, thread A's release() would unpersist
    * thread B's in-flight intermediates — for plain persists merely a
    * recompute tax, but for [[checkpoint]]ed frames (lineage TRUNCATED) a
    * hard job failure. Each worker thread now gets its own default scope
    * and must call release() on the SAME thread that ran the job.
    *
    * Caveat: code that persists from a thread it doesn't own (e.g. a
    * Structured Streaming micro-batch callback, `Streams.scala`) acquires
    * that thread's scope; if nothing releases it, the blocks live until
    * the ContextCleaner GCs them — a bounded soft leak, flagged by the
    * [[warnThreshold]] tripwire. As before, anything running graft
    * operators concurrently within ONE logical job should pass an explicit
    * `new CacheScope`.
    */
  def global: CacheScope = perThread.get()

  /** Handle count above which [[global]] warns about a likely missing
    * release() (libraries shouldn't hard-fail on a soft leak).
    */
  val warnThreshold = 64

  /** Free the storage blocks of a `localCheckpoint`ed DataFrame.
    * `Dataset.unpersist()` is a CacheManager operation and does NOT touch a
    * local checkpoint — that persists at the RDD level, so without this the
    * superseded round of an iterative loop (label propagation, BPE merges)
    * lingers on executors until the ContextCleaner GCs the RDD. Walks the
    * analyzed plan to the `LogicalRDD` the checkpoint pinned and unpersists
    * that RDD directly (non-blocking). No-op on a non-checkpointed plan.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
