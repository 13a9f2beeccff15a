package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import DedupQueries.dotSql

/** Similarity-search queries over `embeddings` with DuckDB oracles for the
  * exact paths; the LSH path is probabilistic and covered by a recall spec.
  */
object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact top-10 cosine neighbors of vec_id 0.
    "ann_topk" -> ((s, dir) =>
      Similarity.topK(Tables.embeddings(s, dir), 0L, 10)),

    // Exact kNN join: top-3 neighbors for each of the first 10 vectors.
    "ann_knn_join" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnJoin(emb, emb.filter(col("vec_id") < 10), 3)
        .orderBy("query_id", "rn")
    }),

    // LSH-bucketed approximate top-10 for vec_id 0 — rows-only check here;
    // recall vs the exact path is asserted in SimilaritySpec.
    "ann_topk_lsh" -> ((s, dir) =>
      Similarity.annTopKLsh(Tables.embeddings(s, dir), 0L, 10)),

    // IVF (centroid-list) approximate top-10 — rows-only check; exhaustive-
    // probe equality and partial-probe recall are asserted in IvfSpec.
    // Build/probe split: the quantizer is trained once per corpus dir
    // (memoized IvfModel) and every probe reuses it — the index-build cost
    // is paid once, as in a real IVF deployment.
    "ann_topk_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      operators.Ivf.probe(operators.Ivf.buildIndex(dir, emb), emb, 0L, 10)
    }),

    // Corpus×corpus kNN through LSH buckets + TopK aggregate — the linear
    // layout for all-pairs similarity. Rows-only check (probabilistic);
    // recall vs exact kNN asserted in SimilaritySpec.
    "ann_knn_lsh_all" -> ((s, dir) =>
      Similarity.knnJoinLsh(Tables.embeddings(s, dir), 3)
        .orderBy("query_id", "rn")),

    // Same contract as ann_knn_join through the k-bounded TopK aggregator
    // (shuffle ships ≤k rows/partition/query instead of all candidates) —
    // shares the window formulation's oracle.
    "ann_knn_agg" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnJoinAgg(emb, emb.filter(col("vec_id") < 10), 3)
        .orderBy("query_id", "rn")
    })
  )

  // shared by the window (ann_knn_join) and aggregator (ann_knn_agg)
  // formulations — same contract, two physical strategies
  private val knnSql: String =
    s"""WITH s AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    (${dotSql("e.embedding", "q.embedding")})
       |      / (sqrt(${dotSql("e.embedding", "e.embedding")})
       |         * sqrt(${dotSql("q.embedding", "q.embedding")})) AS cosine
       |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
       |SELECT query_id, neighbor_id, cosine, rn FROM r
       |WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin

  val oracle: Map[String, String] = Map(
    "ann_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  (${dotSql("e.embedding", "q.qe")})
         |    / (sqrt(${dotSql("e.embedding", "e.embedding")})
         |       * sqrt(${dotSql("q.qe", "q.qe")})) AS cosine
         |FROM embeddings e, q
         |WHERE e.vec_id <> 0
         |ORDER BY cosine DESC, e.vec_id
         |LIMIT 10""".stripMargin,

    "ann_knn_join" -> knnSql,
    "ann_knn_agg" -> knnSql
  )
}
