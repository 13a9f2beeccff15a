package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Curation

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

    // Deterministic 10% hash sample — the reproducible TABLESAMPLE.
    "cur_sample" -> ((s, dir) =>
      Curation.hashSample(Tables.documents(s, dir), col("doc_id"), 10)
        .select("doc_id", "lang")
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

    // Sequence packing: chunks → 256-token training bins across 8 shards.
    "cur_pack" -> ((s, dir) =>
      Curation.packSequences(
          Curation.chunk(Tables.documents(s, dir), 64, 8), 256, 8)
        .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
          col("shard"), col("bin"), col("bin_tokens_before"))
        .orderBy("doc_id", "chunk_no")),

    // Context-window chunking: 64-token windows, 8-token overlap.
    "cur_chunks" -> ((s, dir) =>
      Curation.chunk(Tables.documents(s, dir), 64, 8)
        .select(col("doc_id"), col("chunk_no"),
          col("n_chunk_tokens").cast("long").as("n_chunk_tokens"),
          md5(col("chunk_text")).as("fp_chunk"))
        .orderBy("doc_id", "chunk_no"))
  )

  // DuckDB twin of Curation.hashBucket(doc_id, 100) / (doc_id, 8).
  private val bucket =
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
  private val bucket8 =
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8)"

  val oracle: Map[String, String] = Map(
    "cur_split" ->
      s"""SELECT CASE WHEN $bucket < 80 THEN 'train'
         |            WHEN $bucket < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs
         |FROM documents
         |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

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
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin
  )
}
