package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal queries over the asset table derived from `documents`
  * (Multimodal.assetsFromDocuments — blob + typed metadata). The derivation
  * is mirrored in SQL so DuckDB builds the identical asset table from the
  * same parquet, making the metadata and frame-sampling paths oracle-checked;
  * the stub-decode and feature paths are Spark-specific (rows-only check +
  * MultimodalSpec).
  */
object MultimodalQueries {

  private def assets(s: SparkSession, dir: String) =
    Multimodal.assetsFromDocuments(Tables.documents(s, dir))

  private def typedAssets(s: SparkSession, dir: String) = {
    import s.implicits._
    assets(s, dir).as[Multimodal.Asset]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata-only scan over blob-bearing rows (parquet never reads the
    // blob pages for this projection — asserted by plan in MultimodalSpec).
    "mm_meta" -> ((s, dir) =>
      Multimodal.meta(assets(s, dir)).orderBy("asset_id")),

    // Batched stub decode (mapPartitions) — byte stats per asset.
    "mm_decode" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decode(typedAssets(s, dir)).toDF()
        .select(col("asset_id"), col("kind"), col("n_bytes"),
          // 4-dp grid so the double mean is hash-stable cross-engine
          (floor(col("mean_byte") * 10000.0 + 0.5) / 10000.0).as("mean_byte"),
          col("min_byte"), col("max_byte"))
        .orderBy("asset_id")
    }),

    // Frame sampling: every 4th 256-byte chunk of video assets.
    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(typedAssets(s, dir), 4)
        .groupBy("asset_id")
        .agg(count(lit(1)).as("n_sampled"),
          sum(length(col("frame")).cast("long")).as("sampled_bytes"))
        .orderBy("asset_id")),

    // Hash-projected features feeding the embedding dedup operator: assets
    // whose stub features are near-identical (trivially, exact dups of the
    // underlying bytes). Runs on the planted-clone corpus
    // (Tables.documentsWithClones) so duplicate pairs actually exist —
    // on the raw fixture this returned 0 rows and verified nothing.
    // Rows-only check; determinism in MultimodalSpec.
    "mm_feature_dups" -> ((s, dir) => {
      import s.implicits._
      val cloned = Multimodal.assetsFromDocuments(
        Tables.documentsWithClones(s, dir)).as[Multimodal.Asset]
      val feats = Multimodal.features(cloned, 16).toDF()
        .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
      operators.Dedup.embeddingPairs(feats, 0.999999)
        .orderBy("vec_a", "vec_b")
    })
  )

  // SQL twin of assetsFromDocuments for the oracle.
  private val assetCte =
    """WITH assets AS (
      |  SELECT doc_id AS asset_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    octet_length(encode(text)) AS n_bytes,
      |    CAST(doc_id % 8 AS INT) * 64 + 64 AS width,
      |    CAST(doc_id % 4 AS INT) * 64 + 64 AS height,
      |    CAST(length(text) * 10 AS INT) AS duration_ms
      |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "mm_meta" ->
      s"""$assetCte
         |SELECT asset_id, kind, n_bytes, width, height, duration_ms
         |FROM assets ORDER BY asset_id""".stripMargin,

    // chunks = ceil(bytes/256); sampled = indices 0,4,8,… = ceil(chunks/4);
    // all sampled frames are full 256 B except a possibly-short last chunk,
    // which is sampled iff (chunks-1) % 4 == 0.
    "mm_frames" ->
      s"""$assetCte
         |SELECT asset_id,
         |  CAST(CEIL(CEIL(n_bytes / 256.0) / 4.0) AS BIGINT) AS n_sampled,
         |  CAST(CEIL(CEIL(n_bytes / 256.0) / 4.0) AS BIGINT) * 256
         |    - CASE WHEN (CAST(CEIL(n_bytes / 256.0) AS BIGINT) - 1) % 4 = 0
         |             AND n_bytes % 256 <> 0
         |           THEN 256 - n_bytes % 256 ELSE 0 END AS sampled_bytes
         |FROM assets
         |WHERE kind = 'video' AND n_bytes > 0
         |ORDER BY asset_id""".stripMargin
  )
}
