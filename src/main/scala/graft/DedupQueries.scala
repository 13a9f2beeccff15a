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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup on normalized-content fingerprint; deterministic survivor.
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactByKey(Tables.documents(s, dir),
          TextAnalysis.fingerprintMd5(col("text")), "doc_id")
        .orderBy("doc_id")),

    // Ground-truth near-dup pairs: exact 3-shingle Jaccard ≥ 0.5.
    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), 0.5)
        .orderBy("doc_a", "doc_b")),

    // MinHash-LSH near-dup: same contract, linear-cost plan (see scaladoc
    // for why it shares the exact oracle).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.documents(s, dir), 0.5)
        .orderBy("doc_a", "doc_b")),

    // SimHash near-dup (hamming ≤ 3 over 64-bit signatures) — Spark-hash
    // based, no SQL twin; rows-only check + spec coverage.
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), 3)
        .orderBy("doc_a", "doc_b")),

    // Embedding-cosine near-dup pairs (exact, ≥ 0.4).
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingPairs(Tables.embeddings(s, dir), 0.4)
        .orderBy("vec_a", "vec_b")),

    // Corpus duplication-rate KPI: docs vs distinct fingerprints, 4-dp.
    "dedup_rate" -> ((s, dir) =>
      Tables.documents(s, dir)
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(TextAnalysis.fingerprintMd5(col("text"))).as("n_distinct"))
        .select(col("n_docs"), col("n_distinct"),
          (floor((col("n_docs") - col("n_distinct")).cast("double")
            / col("n_docs") * 10000.0 + 0.5) / 10000.0).as("dup_rate")))
  )

  private val jaccardSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i+1] || ' ' ||
      |           string_split(text, ' ')[i+2])) AS shs
      |  FROM documents),
      |sh AS (SELECT doc_id, unnest(shs) AS s FROM w),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common) AS jaccard
      |FROM pairs
      |JOIN n na ON na.doc_id = doc_a
      |JOIN n nb ON nb.doc_id = doc_b
      |WHERE CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_key,
        |  MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "dedup_jaccard_pairs" -> jaccardSql,
    "dedup_minhash_lsh" -> jaccardSql,

    "dedup_rate" ->
      """SELECT COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_distinct,
        |  FLOOR(CAST(COUNT(*) - COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS DOUBLE)
        |    / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS dup_rate
        |FROM documents""".stripMargin,

    "dedup_embedding" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  (${dotSql("a.embedding", "b.embedding")})
         |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
         |       * sqrt(${dotSql("b.embedding", "b.embedding")})) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE (${dotSql("a.embedding", "b.embedding")})
         |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
         |       * sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin
  )
}
