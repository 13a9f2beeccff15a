package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * splits, hash sampling, PII redaction, and context-window chunking.
  *
  * Determinism rule: anything that "samples" does so by content/key hash,
  * never by `rand()` — the same row lands in the same split/sample on any
  * cluster, any partitioning, any run. The hash here is `md5` (not
  * xxhash64) so the DuckDB oracle can reproduce it bit-for-bit.
  *
  * Scale notes: all operators are narrow per-row transforms (no shuffle);
  * chunking explodes rows but its downstream aggregations combine map-side.
  */
object Curation {

  /** Uniform bucket in [0, buckets) from the md5 of a key column — the
    * deterministic replacement for rand(): first 8 hex chars as a long,
    * mod buckets. Engine-portable (md5 is standardized; DuckDB twin in
    * CurationQueries).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets))

  /** Adds `split`: train/val/test by hash bucket with the given percentage
    * cut points (e.g. 80/10/10). Key-stable: re-running on a grown corpus
    * never moves an existing row between splits.
    */
  def trainValTest(df: DataFrame, key: Column,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(key, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic pct% sample by key hash — the scalable, reproducible
    * `TABLESAMPLE`: no shuffle, no seed state, stable under re-partitioning.
    */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key, 100) < pct)

  /** Stratified deterministic sampling: per-stratum percentage rates
    * (e.g. downsample dominant languages, keep all of rare ones) — the
    * domain-mixing primitive of training-data pipelines. Strata absent
    * from `rates` are dropped. Same md5-bucket law as [[hashSample]].
    */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0)) { case (acc, (s, pct)) =>
      when(strata === s, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(key, 100) < rate)
  }

  /** PII redaction: emails, then phone-shaped digit runs, then 16-digit
    * card-shaped runs, replaced with typed placeholder tags. Order matters
    * (emails contain digit runs); each pass is one codegen'd
    * regexp_replace.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val card = regexp_replace(email,
      "\\b(?:\\d[ -]?){13,16}\\d\\b", "<CARD>")
    // no leading \b: "+" is a non-word char so a boundary can't precede it;
    // RE2-compatible (no lookbehind) because the DuckDB oracle mirrors this
    regexp_replace(card,
      "(?:\\+\\d{1,3}[ -])?(?:\\(\\d{2,4}\\)[ -]?)?\\b\\d{3}[ -]\\d{3,4}(?:[ -]\\d{3,4})?\\b",
      "<PHONE>")
  }

  /** Budget-capped selection: rank rows by `rank` (desc, ties by `key`
    * asc) and keep the prefix whose running `cost` total stays within
    * `budget` — "give me the best documents up to N tokens", the data-
    * selection primitive of training-set construction. One window over the
    * rank order; at warehouse scale pre-aggregate per rank-bucket first if
    * a single ordered window becomes the bottleneck.
    */
  def selectUnderBudget(df: DataFrame, rank: Column, key: Column,
                        cost: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(rank.desc, key.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("_running_cost", sum(cost).over(w))
      .filter(col("_running_cost") <= budget)
      .drop("_running_cost")
  }

  /** Context-window chunking: whitespace tokens packed into windows of
    * `chunkTokens` with `overlap` tokens carried between consecutive
    * chunks. Emits (…, chunk_no, chunk_text, n_chunk_tokens). Stride =
    * chunkTokens − overlap; the final partial window is kept iff it
    * contributes new tokens.
    */
  def chunk(documents: DataFrame, chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than the chunk")
    val stride = chunkTokens - overlap
    val toks = split(col("text"), " ")
    val nChunks = when(size(toks) <= chunkTokens, lit(1))
      .otherwise(ceil((size(toks) - lit(chunkTokens)).cast("double") / stride)
        .cast("int") + 1)
    documents
      .withColumn("toks", toks)
      .select(col("*"), posexplode(transform(sequence(lit(0), nChunks - 1),
        i => slice(col("toks"), i * stride + 1, lit(chunkTokens))))
        .as(Seq("chunk_no", "chunk_toks")))
      .select(col("doc_id"), col("chunk_no"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"),
        size(col("chunk_toks")).as("n_chunk_tokens"))
  }
}
