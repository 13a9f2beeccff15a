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

    // Batched stub decode (mapPartitions) — byte stats per asset. Oracle:
    // the corpus is pure ASCII (verified across all SFs), so per-character
    // code points equal UTF-8 bytes and DuckDB can rebuild the exact stats
    // (integer byte sums are exact in both engines, so the 4-dp mean is
    // bit-identical).
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

    // Hash-projected features feeding the exact-dup pair operator: assets
    // whose stub features are IDENTICAL (trivially, exact dups of the
    // underlying bytes — identical bytes ⇒ identical features, and 16-way
    // -hash feature collisions from DIFFERENT bytes don't occur). Runs on
    // the planted-clone corpus (Tables.documentsWithClones) so duplicate
    // pairs actually exist — on the raw fixture this returned 0 rows and
    // verified nothing. The DuckDB twin states the same pair set directly
    // as text equality. Scale note: this was embeddingPairs(·, 0.999999)
    // through round 4 — a near-1.0 threshold makes the brute-force
    // crossJoin pure waste (30 s at the sf1 fixture for what IS an
    // equality join); identicalVectorPairs shuffles once on a vector hash
    // and verifies equality (sub-second, same rows).
    "mm_feature_dups" -> ((s, dir) => {
      import s.implicits._
      val cloned = Multimodal.assetsFromDocuments(
        Tables.documentsWithClones(s, dir)).as[Multimodal.Asset]
      val feats = Multimodal.features(cloned, 16).toDF()
        .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
      operators.Dedup.identicalVectorPairs(feats)
        .orderBy("vec_a", "vec_b")
    }),

    // REAL media decode (round 7): blobs are genuine PPM files built by
    // MediaCodecs.encodePpm from the generative pixel law; the query
    // decodes them with the full P6 parser and reports header dims +
    // position-weighted raster stats. The oracle rebuilds the law in pure
    // SQL and never sees a byte — any header/raster bug hash-mismatches.
    "mm_decode_ppm" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeImages(
        Multimodal.mediaAssetsFromDocuments(Tables.documents(s, dir))
          .filter(_.fmt == "ppm"))
        .toDF().orderBy("asset_id")
    }),

    // Same end-to-end law check through the BMP container: BGR channel
    // order, 4-byte row padding, bottom-up rows — the decoder must undo all
    // three or wsum_val breaks (widths cover every padding class).
    "mm_decode_bmp" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeImages(
        Multimodal.mediaAssetsFromDocuments(Tables.documents(s, dir))
          .filter(_.fmt == "bmp"))
        .toDF().orderBy("asset_id")
    }),

    // Compressed-format decode (round 8, retires the stub on a real-world
    // format): every document becomes a genuine PNG — zlib-deflated IDAT,
    // filter type varied per scanline (None/Sub/Up/Average/Paeth), CRC'd
    // chunks — and the decoder must inflate + reconstruct all five filters
    // for the law stats to hash-match. Oracle is the pure-SQL law over ALL
    // doc_ids (no %3 gate), so this row is independent of the ppm/bmp rows.
    "mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeImages(
        Multimodal.mediaAssetsPngFromDocuments(Tables.documents(s, dir)))
        .toDF().orderBy("asset_id")
    }),

    // LOSSY-format decode (round 8, the last real-world image stub): every
    // document becomes a genuine baseline JPEG — fixed-point DCT, Annex-K
    // quantization, canonical Huffman with byte stuffing — of a
    // BLOCK-CONSTANT color law. Constant 8×8 blocks leave only DC
    // coefficients, so the whole lossy pipeline (RGB→YCbCr → FDCT → quant
    // → dequant → IDCT → YCbCr→RGB) collapses to exact integer arithmetic
    // the oracle replays per block — a decoder bug anywhere in the
    // entropy/DCT/color path shifts the reconstructed values and breaks
    // the hash.
    "mm_decode_jpeg" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeImages(
        Multimodal.mediaAssetsJpegFromDocuments(Tables.documents(s, dir)))
        .toDF().orderBy("asset_id")
    }),

    // REAL decode → resize pipeline (retires the stub resize as the only
    // path): lossless-format assets decoded through their real containers,
    // nearest-neighbor resized to 16×12, position-weighted stats over the
    // RESIZED raster. The oracle replays the integer source-index law over
    // the pixel law — wrong rounding, axis swap, or channel slip all shift
    // wsum_val.
    "mm_resize_real" -> ((s, dir) => {
      import s.implicits._
      Multimodal.resizeImagesReal(
        Multimodal.mediaAssetsFromDocuments(Tables.documents(s, dir))
          .filter(a => a.fmt == "ppm" || a.fmt == "bmp"), 16, 12)
        .toDF().orderBy("asset_id")
    }),

    // REAL video decode + frame sampling (round 8): every document becomes
    // an MJPEG-AVI (frames = quality-75 JPEGs of a per-frame block-constant
    // law), the query demuxes the RIFF container, decodes every frame, and
    // keeps every 2nd — per-frame stats, so the oracle checks the demuxer's
    // chunk walk, the frame ORDER, the sampling phase, and the whole JPEG
    // pipeline per frame via the same DC closed form as mm_decode_jpeg.
    "mm_video_frames" -> ((s, dir) => {
      import s.implicits._
      Multimodal.sampleVideoFrames(
        Multimodal.mediaAssetsAviFromDocuments(Tables.documents(s, dir)), 2)
        .toDF().orderBy("asset_id", "frame_idx")
    }),

    // VIDEO near-dup detection: real AVIs + planted near-dup clones (same
    // content law, one color-nudged block in frame 0), per-sampled-frame
    // aHash over DECODED pixels, hamming-banded frame join → video pairs
    // with ≥1 matching frame. The multimodal-training-data dedup op: finds
    // the "slightly edited re-upload" without ever comparing videos
    // pairwise.
    // Fixture note: restricted to the 32×16 (8-block) dims class — aHash
    // over a SINGLE solid 8×8 block has almost no entropy (solid frames
    // collapse to a handful of hash patterns), so tiny-dims videos would
    // drown the planted pairs in legitimate-but-uninteresting collisions.
    // Production guidance is the same: hash thumbnails with ≥ tens of
    // blocks, not single-block crops.
    "mm_video_dups" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 480 && col("doc_id") % 4 === 3)
      val base = Multimodal.mediaAssetsAviFromDocuments(docs)
      val clones = Multimodal.mediaAssetsAviClonesFromDocuments(
        docs.filter(col("doc_id") % 12 === 3), 100000L)
      Multimodal.videoNearDups(
        Multimodal.videoFrameHashes(base.unionByName(clones), 2))
        .orderBy("video_a", "video_b")
    }),

    // AUDIO near-dup detection (completes the modality triple): real WAVs
    // + planted clones (same sample law, a 10-sample +16 "click"), 64-bit
    // energy fingerprint over DECODED |samples|, hamming banding join.
    // Every planted pair survives the edit (measured: 81 at distance 0, 2
    // at distance 1 at sf0.01); the fixture's sawtooth sample law also
    // phase-aligns some unrelated assets into close fingerprints — those
    // extra pairs are correct outputs of the hash law on this synthetic
    // signal, pinned exactly by the oracle.
    "mm_audio_dups" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).filter(col("doc_id") % 3 === 2)
      val base = Multimodal.mediaAssetsFromDocuments(docs)
      val clones = Multimodal.mediaAssetsWavClonesFromDocuments(
        docs.filter(col("doc_id") % 6 === 2), 100000L)
      operators.Dedup.hammingPairs64(
        Multimodal.audioFingerprints(base.unionByName(clones)),
        "asset_id", "phash", 3)
        .orderBy("doc_a", "doc_b")
    }),

    // WAV chunk-walk decode: sample_rate read from the fmt chunk, stats
    // over signed int16 samples from the data chunk.
    "mm_decode_wav" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeAudio(
        Multimodal.mediaAssetsFromDocuments(Tables.documents(s, dir))
          .filter(_.fmt == "wav"))
        .toDF().orderBy("asset_id")
    }),

    // aHash over REAL decoded pixels (both image formats) via the fused
    // native kernel — the perceptual-dedup fingerprint fed by an actual
    // decode, not text-byte stand-ins. Oracle rebuilds pixel codes from the
    // law and inlines the same 64 block terms.
    "mm_phash_media" -> ((s, dir) => {
      import s.implicits._
      val codes = Multimodal.decodedPixelCodes(
        Multimodal.mediaAssetsFromDocuments(Tables.documents(s, dir)))
      codes.select(col("asset_id"),
        Multimodal.aHash64FromCodes(col("codes")).as("phash"))
        .orderBy("asset_id")
    }),

    // Perceptual-hash near-dup: 64-bit aHash over each blob's bytes,
    // pairs within Hamming ≤ 3 via the pigeonhole banding join — the
    // image-dedup pipeline on the planted-clone corpus (clones pair at
    // distance 0). Fully hash-oracled: the twin inlines all 64 block
    // terms of the aHash and verifies with xor + bit_count.
    "mm_phash_dups" -> ((s, dir) => {
      val cloned = Multimodal.assetsFromDocuments(
        Tables.documentsWithClones(s, dir))
      val sigs = cloned.select(col("asset_id"),
        Multimodal.aHash64(col("content").cast("string")).as("phash"))
      operators.Dedup.hammingPairs64(sigs, "asset_id", "phash", 3)
        .orderBy("doc_a", "doc_b")
    })
  )

  // The 64 aHash block terms (bit c = [block-sum·n > total·block-len],
  // integer cross-multiplication — no division), as disjoint-bit addends;
  // bit 63 is the sign bit, spelled as Long.MinValue like the simhash twin.
  private val phashTerms: String = (0 until 64).map { c =>
    val from = s"CAST(FLOOR($c * n / 64.0) AS BIGINT)"
    val to = s"CAST(FLOOR(${c + 1} * n / 64.0) AS BIGINT)"
    val sumC = s"COALESCE(CAST(list_sum(list_slice(codes, $from + 1, $to)) AS BIGINT), 0)"
    val bit = if (c == 63) "-9223372036854775807 - 1" else s"(1::BIGINT << $c)"
    s"CASE WHEN $sumC * n > total * ($to - $from) THEN $bit ELSE 0 END"
  }.mkString("\n    + ")

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

  // SQL twin of the media generative law (Multimodal.mediaPixelLaw /
  // mediaDims): per-asset pixel stream rebuilt by unnest(range(n)) — the
  // oracle never parses a media file, so a decoder that survives the hash
  // compare provably round-tripped the real container format.
  private def imageLawSql(fmtMod: Int): String = imageLawSqlWhere(s"WHERE doc_id % 3 = $fmtMod")

  private def imageLawSqlWhere(where: String): String =
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(8 + (doc_id % 8) * 4 AS INT) AS width,
       |         CAST(8 + (doc_id % 4) * 4 AS INT) AS height
       |  FROM documents $where),
       |idx AS (
       |  SELECT doc_id, width, height,
       |         unnest(range(0, CAST(width AS BIGINT) * height * 3)) AS i
       |  FROM dims),
       |px AS (
       |  SELECT doc_id, width, height, i, (doc_id * 131 + i * 7) % 256 AS v
       |  FROM idx)
       |SELECT doc_id AS asset_id, width, height,
       |  CAST(COUNT(*) AS BIGINT) AS n_vals, CAST(SUM(v) AS BIGINT) AS sum_val,
       |  CAST(SUM((i + 1) * v) AS BIGINT) AS wsum_val,
       |  CAST(MIN(v) AS INT) AS min_val, CAST(MAX(v) AS INT) AS max_val
       |FROM px GROUP BY 1, 2, 3 ORDER BY asset_id""".stripMargin

  // ---- mm_decode_jpeg twin: the exact integer DC pipeline per block ----
  // Power-of-two divisions use FLOOR(x / 2^k) (exact in doubles at these
  // magnitudes) because the JVM's >> is a floor shift while DuckDB's //
  // truncates toward zero on negatives.

  /** SQL floor-division by a power of two. */
  private def fdiv(x: String, p: Long): String =
    s"CAST(FLOOR(($x) / $p.0) AS BIGINT)"

  /** SQL for the constant-block DC reconstruction of channel value `v`
    * under DC quant step `q`: level shift → FDCT DC ((8·DcB)² scale) →
    * symmetric-round quantize → dequant → IDCT DC (DcB² scale) → +128,
    * clamped. Constants: DcB = 1448 ⇒ (8·DcB)² = 134189056, DcB² =
    * 2096704; 2²³ = 8388608, 2²⁴ = 16777216 (pinned against the codec in
    * MediaCodecsSpec).
    */
  private def dcReconSql(v: String, q: Int): String = {
    val f = fdiv(s"134189056 * (($v) - 128) + 8388608", 16777216L)
    val dc = s"(CASE WHEN $f >= 0 THEN ($f + ${q / 2}) // $q" +
      s" ELSE -((-$f + ${q / 2}) // $q) END)"
    s"LEAST(255, GREATEST(0, ${fdiv(s"$dc * $q * 2096704 + 8388608", 16777216L)} + 128))"
  }

  private val jpegLawSql: String = {
    val (qy, qc) = graft.operators.MediaCodecs.dcQuants(75)
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(8 * (1 + doc_id % 4) AS INT) AS w,
       |         CAST(8 * (1 + doc_id % 2) AS INT) AS h
       |  FROM documents),
       |idx AS (
       |  SELECT doc_id, w, h,
       |         unnest(range(0, CAST(w AS BIGINT) * h * 3)) AS i
       |  FROM dims),
       |geo AS (
       |  SELECT doc_id, w, h, i,
       |    ((i // 3) // w // 8) * (w // 8) + ((i // 3) % w // 8) AS b,
       |    i % 3 AS ch
       |  FROM idx),
       |rgb AS (
       |  SELECT doc_id, w, h, i, ch,
       |    (doc_id * 131 + b * 17) % 256 AS r,
       |    (doc_id * 59 + b * 23) % 256 AS g,
       |    (doc_id * 101 + b * 29) % 256 AS bl
       |  FROM geo),
       |ycc AS (
       |  SELECT doc_id, w, h, i, ch,
       |    LEAST(255, GREATEST(0,
       |      ${fdiv("19595 * r + 38470 * g + 7471 * bl + 32768", 65536L)})) AS yy,
       |    LEAST(255, GREATEST(0,
       |      ${fdiv("-11059 * r - 21709 * g + 32768 * bl + 32768", 65536L)} + 128)) AS cb,
       |    LEAST(255, GREATEST(0,
       |      ${fdiv("32768 * r - 27439 * g - 5329 * bl + 32768", 65536L)} + 128)) AS cr
       |  FROM rgb),
       |rec AS (
       |  SELECT doc_id, w, h, i, ch,
       |    ${dcReconSql("yy", qy)} AS y2,
       |    ${dcReconSql("cb", qc)} AS cb2,
       |    ${dcReconSql("cr", qc)} AS cr2
       |  FROM ycc),
       |px AS (
       |  SELECT doc_id, w, h, i,
       |    CASE ch
       |      WHEN 0 THEN LEAST(255, GREATEST(0,
       |        y2 + ${fdiv("91881 * (cr2 - 128) + 32768", 65536L)}))
       |      WHEN 1 THEN LEAST(255, GREATEST(0,
       |        y2 - ${fdiv("22554 * (cb2 - 128) + 46802 * (cr2 - 128) + 32768", 65536L)}))
       |      ELSE LEAST(255, GREATEST(0,
       |        y2 + ${fdiv("116130 * (cb2 - 128) + 32768", 65536L)}))
       |    END AS v
       |  FROM rec)
       |SELECT doc_id AS asset_id, w AS width, h AS height,
       |  CAST(COUNT(*) AS BIGINT) AS n_vals, CAST(SUM(v) AS BIGINT) AS sum_val,
       |  CAST(SUM((i + 1) * v) AS BIGINT) AS wsum_val,
       |  CAST(MIN(v) AS INT) AS min_val, CAST(MAX(v) AS INT) AS max_val
       |FROM px GROUP BY 1, 2, 3 ORDER BY asset_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "mm_decode_ppm" -> imageLawSql(0),
    "mm_decode_bmp" -> imageLawSql(1),
    "mm_decode_png" -> imageLawSqlWhere(""),
    "mm_decode_jpeg" -> jpegLawSql,

    // video-dedup twin: decoded-pixel codes per (video, sampled frame) via
    // the DC pipeline (base + perturbed-clone laws), the 64 inline aHash
    // terms, then a brute-force frame-pair join at the same ≤3-bit gate —
    // Spark's banding join is COMPLETE for ≤3 (pigeonhole), so the sets
    // agree exactly
    "mm_video_dups" -> {
      val (qy, qc) = graft.operators.MediaCodecs.dcQuants(75)
      s"""WITH vids AS (
         |  SELECT doc_id AS src, doc_id AS vid, FALSE AS pert
         |  FROM documents WHERE doc_id < 480 AND doc_id % 4 = 3
         |  UNION ALL
         |  SELECT doc_id AS src, doc_id + 100000 AS vid, TRUE AS pert
         |  FROM documents WHERE doc_id < 480 AND doc_id % 12 = 3),
         |dims AS (
         |  SELECT src, vid, pert, CAST(8 * (1 + src % 4) AS INT) AS w,
         |         CAST(8 * (1 + src % 2) AS INT) AS h
         |  FROM vids),
         |fr AS (
         |  SELECT src, vid, pert, w, h, unnest(range(0, 2 + src % 3)) AS f
         |  FROM dims),
         |sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
         |idx AS (
         |  SELECT src, vid, pert, w, h, f,
         |         unnest(range(0, CAST(w AS BIGINT) * h * 3)) AS i
         |  FROM sampled),
         |geo AS (
         |  SELECT src, vid, pert, w, h, f, i,
         |    ((i // 3) // w // 8) * (w // 8) + ((i // 3) % w // 8) AS b,
         |    i % 3 AS ch
         |  FROM idx),
         |rgb0 AS (
         |  SELECT vid, w, h, f, i, ch, pert, b,
         |    (src * 131 + f * 71 + b * 17) % 256 AS r0,
         |    (src * 59 + f * 41 + b * 23) % 256 AS g,
         |    (src * 101 + f * 53 + b * 29) % 256 AS bl
         |  FROM geo),
         |rgb AS (
         |  SELECT vid, w, h, f, i, ch,
         |    CASE WHEN pert AND f = 0 AND b = 0
         |         THEN CASE WHEN r0 >= 254 THEN r0 - 2 ELSE r0 + 2 END
         |         ELSE r0 END AS r,
         |    g, bl
         |  FROM rgb0),
         |ycc AS (
         |  SELECT vid, w, h, f, i, ch,
         |    LEAST(255, GREATEST(0,
         |      ${fdiv("19595 * r + 38470 * g + 7471 * bl + 32768", 65536L)})) AS yy,
         |    LEAST(255, GREATEST(0,
         |      ${fdiv("-11059 * r - 21709 * g + 32768 * bl + 32768", 65536L)} + 128)) AS cb,
         |    LEAST(255, GREATEST(0,
         |      ${fdiv("32768 * r - 27439 * g - 5329 * bl + 32768", 65536L)} + 128)) AS cr
         |  FROM rgb),
         |rec AS (
         |  SELECT vid, w, h, f, i, ch,
         |    ${dcReconSql("yy", qy)} AS y2,
         |    ${dcReconSql("cb", qc)} AS cb2,
         |    ${dcReconSql("cr", qc)} AS cr2
         |  FROM ycc),
         |px AS (
         |  SELECT vid, w, h, f, i,
         |    CASE ch
         |      WHEN 0 THEN LEAST(255, GREATEST(0,
         |        y2 + ${fdiv("91881 * (cr2 - 128) + 32768", 65536L)}))
         |      WHEN 1 THEN LEAST(255, GREATEST(0,
         |        y2 - ${fdiv("22554 * (cb2 - 128) + 46802 * (cr2 - 128) + 32768", 65536L)}))
         |      ELSE LEAST(255, GREATEST(0,
         |        y2 + ${fdiv("116130 * (cb2 - 128) + 32768", 65536L)}))
         |    END AS v
         |  FROM rec),
         |cl AS (
         |  SELECT vid, f, CAST(w AS BIGINT) * h * 3 AS n,
         |    list(v ORDER BY i) AS codes, CAST(SUM(v) AS BIGINT) AS total
         |  FROM px GROUP BY vid, f, w, h),
         |hh AS (
         |  SELECT vid, f, CAST($phashTerms AS BIGINT) AS phash FROM cl),
         |fp AS (
         |  SELECT a.vid AS video_a, b.vid AS video_b
         |  FROM hh a JOIN hh b ON a.vid < b.vid
         |  WHERE bit_count(xor(a.phash, b.phash)) <= 3)
         |SELECT video_a, video_b, CAST(COUNT(*) AS BIGINT) AS matched_frames
         |FROM fp GROUP BY 1, 2 HAVING COUNT(*) >= 1
         |ORDER BY video_a, video_b""".stripMargin
    },

    // audio-dedup twin: |sample| codes per audio (base + clicked-clone
    // laws), the 64 inline aHash terms, brute-force pair join at the same
    // ≤3-bit gate (Spark's banding is complete for ≤3)
    "mm_audio_dups" ->
      s"""WITH auds AS (
         |  SELECT doc_id AS src, doc_id AS aid, FALSE AS pert
         |  FROM documents WHERE doc_id % 3 = 2
         |  UNION ALL
         |  SELECT doc_id AS src, doc_id + 100000 AS aid, TRUE AS pert
         |  FROM documents WHERE doc_id % 6 = 2),
         |dims AS (
         |  SELECT src, aid, pert, CAST(200 + (src % 16) * 50 AS BIGINT) AS n
         |  FROM auds),
         |idx AS (
         |  SELECT src, aid, pert, n, unnest(range(0, n)) AS i FROM dims),
         |sm AS (
         |  SELECT aid, n, i,
         |    abs((src * 37 + i * 11) % 4096 - 2048
         |        + CASE WHEN pert AND i BETWEEN 10 AND 19 THEN 16 ELSE 0 END) AS v
         |  FROM idx),
         |cl AS (
         |  SELECT aid, n, list(v ORDER BY i) AS codes,
         |         CAST(SUM(v) AS BIGINT) AS total
         |  FROM sm GROUP BY aid, n),
         |hh AS (SELECT aid, CAST($phashTerms AS BIGINT) AS phash FROM cl)
         |SELECT a.aid AS doc_a, b.aid AS doc_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         |FROM hh a JOIN hh b ON a.aid < b.aid
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    // video twin: the jpeg DC pipeline per (asset, sampled frame) with the
    // frame-extended color law; weights restart per frame
    "mm_video_frames" -> {
      val (qy, qc) = graft.operators.MediaCodecs.dcQuants(75)
      s"""WITH dims AS (
         |  SELECT doc_id, CAST(8 * (1 + doc_id % 4) AS INT) AS w,
         |         CAST(8 * (1 + doc_id % 2) AS INT) AS h
         |  FROM documents),
         |fr AS (
         |  SELECT doc_id, w, h, unnest(range(0, 2 + doc_id % 3)) AS f
         |  FROM dims),
         |sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
         |idx AS (
         |  SELECT doc_id, w, h, f,
         |         unnest(range(0, CAST(w AS BIGINT) * h * 3)) AS i
         |  FROM sampled),
         |geo AS (
         |  SELECT doc_id, w, h, f, i,
         |    ((i // 3) // w // 8) * (w // 8) + ((i // 3) % w // 8) AS b,
         |    i % 3 AS ch
         |  FROM idx),
         |rgb AS (
         |  SELECT doc_id, w, h, f, i, ch,
         |    (doc_id * 131 + f * 71 + b * 17) % 256 AS r,
         |    (doc_id * 59 + f * 41 + b * 23) % 256 AS g,
         |    (doc_id * 101 + f * 53 + b * 29) % 256 AS bl
         |  FROM geo),
         |ycc AS (
         |  SELECT doc_id, w, h, f, i, ch,
         |    LEAST(255, GREATEST(0,
         |      ${fdiv("19595 * r + 38470 * g + 7471 * bl + 32768", 65536L)})) AS yy,
         |    LEAST(255, GREATEST(0,
         |      ${fdiv("-11059 * r - 21709 * g + 32768 * bl + 32768", 65536L)} + 128)) AS cb,
         |    LEAST(255, GREATEST(0,
         |      ${fdiv("32768 * r - 27439 * g - 5329 * bl + 32768", 65536L)} + 128)) AS cr
         |  FROM rgb),
         |rec AS (
         |  SELECT doc_id, w, h, f, i, ch,
         |    ${dcReconSql("yy", qy)} AS y2,
         |    ${dcReconSql("cb", qc)} AS cb2,
         |    ${dcReconSql("cr", qc)} AS cr2
         |  FROM ycc),
         |px AS (
         |  SELECT doc_id, w, h, f, i,
         |    CASE ch
         |      WHEN 0 THEN LEAST(255, GREATEST(0,
         |        y2 + ${fdiv("91881 * (cr2 - 128) + 32768", 65536L)}))
         |      WHEN 1 THEN LEAST(255, GREATEST(0,
         |        y2 - ${fdiv("22554 * (cb2 - 128) + 46802 * (cr2 - 128) + 32768", 65536L)}))
         |      ELSE LEAST(255, GREATEST(0,
         |        y2 + ${fdiv("116130 * (cb2 - 128) + 32768", 65536L)}))
         |    END AS v
         |  FROM rec)
         |SELECT doc_id AS asset_id, CAST(f AS INT) AS frame_idx,
         |  w AS width, h AS height,
         |  CAST(COUNT(*) AS BIGINT) AS n_vals, CAST(SUM(v) AS BIGINT) AS sum_val,
         |  CAST(SUM((i + 1) * v) AS BIGINT) AS wsum_val,
         |  CAST(MIN(v) AS INT) AS min_val, CAST(MAX(v) AS INT) AS max_val
         |FROM px GROUP BY 1, 2, 3, 4 ORDER BY asset_id, frame_idx""".stripMargin
    },

    // resize twin: out pixel (x', y', ch) reads law index
    // 3·((y'·h // 12)·w + (x'·w // 16)) + ch — the same floor arithmetic
    // the nearest-neighbor kernel uses (all operands non-negative, so
    // DuckDB's truncating // IS floor here)
    "mm_resize_real" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(8 + (doc_id % 8) * 4 AS INT) AS w,
        |         CAST(8 + (doc_id % 4) * 4 AS INT) AS h
        |  FROM documents WHERE doc_id % 3 IN (0, 1)),
        |idx AS (
        |  SELECT doc_id, w, h, unnest(range(0, 16 * 12 * 3)) AS j FROM dims),
        |src AS (
        |  SELECT doc_id, j,
        |    3 * ((((j // 3) // 16) * h // 12) * w + ((j // 3) % 16) * w // 16)
        |      + j % 3 AS i
        |  FROM idx),
        |px AS (
        |  SELECT doc_id, j, (doc_id * 131 + i * 7) % 256 AS v FROM src)
        |SELECT doc_id AS asset_id, CAST(16 AS INT) AS width,
        |  CAST(12 AS INT) AS height,
        |  CAST(COUNT(*) AS BIGINT) AS n_vals, CAST(SUM(v) AS BIGINT) AS sum_val,
        |  CAST(SUM((j + 1) * v) AS BIGINT) AS wsum_val,
        |  CAST(MIN(v) AS INT) AS min_val, CAST(MAX(v) AS INT) AS max_val
        |FROM px GROUP BY 1 ORDER BY asset_id""".stripMargin,

    "mm_decode_wav" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |         CAST(200 + (doc_id % 16) * 50 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |idx AS (
        |  SELECT doc_id, sample_rate, unnest(range(0, n)) AS i FROM dims),
        |sm AS (
        |  SELECT doc_id, sample_rate, i,
        |         (doc_id * 37 + i * 11) % 4096 - 2048 AS v
        |  FROM idx)
        |SELECT doc_id AS asset_id, sample_rate,
        |  CAST(COUNT(*) AS BIGINT) AS n_vals, CAST(SUM(v) AS BIGINT) AS sum_val,
        |  CAST(SUM((i + 1) * v) AS BIGINT) AS wsum_val,
        |  CAST(MIN(v) AS INT) AS min_val, CAST(MAX(v) AS INT) AS max_val
        |FROM sm GROUP BY 1, 2 ORDER BY asset_id""".stripMargin,

    // aHash over law-rebuilt pixel codes: same 64 inline block terms as
    // mm_phash_dups, with `codes` = the generative pixel list (both image
    // formats, doc_id % 3 IN (0, 1)).
    "mm_phash_media" ->
      s"""WITH dims AS (
         |  SELECT doc_id,
         |         CAST(8 + (doc_id % 8) * 4 AS BIGINT)
         |           * (8 + (doc_id % 4) * 4) * 3 AS n
         |  FROM documents WHERE doc_id % 3 IN (0, 1)),
         |d AS (
         |  SELECT doc_id, n,
         |    list_transform(range(0, n),
         |      i -> (doc_id * 131 + i * 7) % 256) AS codes
         |  FROM dims),
         |t AS (
         |  SELECT doc_id, n, codes,
         |    COALESCE(CAST(list_sum(codes) AS BIGINT), 0) AS total
         |  FROM d)
         |SELECT doc_id AS asset_id, CAST($phashTerms AS BIGINT) AS phash
         |FROM t ORDER BY asset_id""".stripMargin,

    // Equal-content asset pairs on the planted-clone corpus — see the
    // mm_feature_dups query comment for why text equality is the exact twin.
    "mm_feature_dups" ->
      s"""${DedupQueries.clonedDocsCte}
         |SELECT a.doc_id AS vec_a, b.doc_id AS vec_b
         |FROM documents2 a JOIN documents2 b
         |  ON a.doc_id < b.doc_id AND a.text = b.text
         |ORDER BY vec_a, vec_b""".stripMargin,

    "mm_meta" ->
      s"""$assetCte
         |SELECT asset_id, kind, n_bytes, width, height, duration_ms
         |FROM assets ORDER BY asset_id""".stripMargin,

    "mm_phash_dups" ->
      s"""${DedupQueries.clonedDocsCte},
         |d AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
         |    list_transform(range(1, length(text) + 1),
         |      i -> ascii(substring(text, CAST(i AS INT), 1))) AS codes
         |  FROM documents2),
         |t AS (
         |  SELECT doc_id, n, codes,
         |    COALESCE(CAST(list_sum(codes) AS BIGINT), 0) AS total
         |  FROM d),
         |h AS (
         |  SELECT doc_id, CAST($phashTerms AS BIGINT) AS phash
         |  FROM t)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Byte stats via per-character code points (ASCII corpus ⇒ code point
    // == UTF-8 byte). The stub's integer byte sum is exact in both engines,
    // so mean = CAST(sum AS DOUBLE)/n matches Spark's division bit-for-bit.
    "mm_decode" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    text, octet_length(encode(text)) AS n_bytes
        |  FROM documents),
        |idx AS (
        |  SELECT asset_id, text, unnest(range(1, length(text) + 1)) AS i FROM a),
        |bytes AS (
        |  SELECT asset_id, ascii(substring(text, CAST(i AS INT), 1)) AS b FROM idx),
        |stats AS (
        |  SELECT asset_id, SUM(b) AS s, MIN(b) AS mn, MAX(b) AS mx
        |  FROM bytes GROUP BY asset_id)
        |SELECT a.asset_id, a.kind, CAST(a.n_bytes AS BIGINT) AS n_bytes,
        |  CASE WHEN a.n_bytes = 0 THEN 0.0
        |       ELSE FLOOR(CAST(st.s AS DOUBLE) / a.n_bytes * 10000.0 + 0.5)
        |            / 10000.0 END AS mean_byte,
        |  COALESCE(st.mn, 0) AS min_byte, COALESCE(st.mx, 0) AS max_byte
        |FROM a LEFT JOIN stats st USING (asset_id)
        |ORDER BY asset_id""".stripMargin,

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
