package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for LLM-data pipelines.
  *
  * Model: media are opaque `binary` columns alongside *typed metadata*
  * columns, parquet-backed. Parquet is columnar, so metadata-only queries
  * never read the blob pages — the schema itself is the optimization; keep
  * blobs and metadata in the same row but never force a blob scan for a
  * meta predicate.
  *
  * The decode step is a clearly-marked deterministic STUB (this container
  * ships no image/audio codecs): [[MultimodalStub.decode]] computes byte
  * statistics where a real codec would produce pixels/samples. Everything
  * around the stub — schema, batched per-partition execution, explode
  * shapes, feature vectors feeding the ANN path — is real engine plumbing
  * and is what the specs cover.
  *
  * Scale notes: decode/feature-extract run as `mapPartitions` over the
  * typed Dataset — the Scala analog of batched pandas UDFs: one iterator
  * per partition, no per-row lambda dispatch, no driver involvement. Blob
  * partition sizing is governed by `spark.sql.files.maxPartitionBytes`, and
  * the operators never collect() or shuffle blobs (only ids + features).
  */
object Multimodal {

  /** A media asset row: blob + typed metadata. */
  case class Asset(asset_id: Long, kind: String, content: Array[Byte],
    width: Int, height: Int, duration_ms: Int)

  /** Stub decode output: byte statistics standing in for decoded content. */
  case class Decoded(asset_id: Long, kind: String, n_bytes: Long,
    mean_byte: Double, min_byte: Int, max_byte: Int)

  /** A fixed-width feature vector per asset (hash-projected from bytes) —
    * the bridge from media to the similarity/dedup operators.
    */
  case class AssetFeatures(asset_id: Long, features: Array[Float])

  /** Deterministic asset table derived from `documents`: the text's UTF-8
    * bytes are the blob (a stand-in payload with realistic variable sizes),
    * kind cycles image/audio/video by doc_id, metadata is a pure function
    * of doc_id and length. Mirrors into SQL for the DuckDB oracle
    * (MultimodalQueries).
    */
  def assetsFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      col("text").cast("binary").as("content"),
      (pmod(col("doc_id"), lit(8)).cast("int") * 64 + 64).as("width"),
      (pmod(col("doc_id"), lit(4)).cast("int") * 64 + 64).as("height"),
      (length(col("text")) * 10).cast("int").as("duration_ms"))

  /** Metadata-only projection — reads zero blob bytes from parquet (column
    * pruning; asserted by plan in the spec).
    */
  def meta(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"), col("kind"),
      length(col("content")).cast("long").as("n_bytes"),
      col("width"), col("height"), col("duration_ms"))

  /** Batched stub decode: one [[Decoded]] row per asset via mapPartitions.
    * Swap [[MultimodalStub.decode]] for a real codec call per batch in
    * production; the Spark plumbing (typed Dataset in, typed Dataset out,
    * per-partition batching) is final.
    */
  def decode(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(MultimodalStub.decode))
  }

  /** Stub resize: blob → blob of exactly `w*h` bytes + updated metadata,
    * same row count (a real impl calls an image library per batch).
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a =>
      a.copy(content = MultimodalStub.resize(a.content, w * h),
        width = w, height = h)))
  }

  /** Frame sampling for video assets: every `everyN`-th fixed-size chunk of
    * the blob becomes a "frame" row (asset_id, frame_no, frame binary) —
    * the row-explosion shape a real frame sampler produces. Non-video rows
    * are dropped.
    */
  def sampleFrames(assets: Dataset[Asset], everyN: Int,
                   frameBytes: Int = 256): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video")
      .flatMap { a =>
        MultimodalStub.frames(a.content, frameBytes).zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (f, i) => (a.asset_id, i, f) }
      }
      .toDF("asset_id", "frame_no", "frame")
  }

  /** 64-bit perceptual average-hash (aHash) of a blob's bytes — THE classic
    * image-dedup fingerprint: split the byte stream into 64 blocks, bit c =
    * [block c's mean > global mean]. Robust to small local edits (one
    * changed block flips at most one bit), so near-identical assets land
    * within small Hamming distance — feed [[graft.operators.Dedup.hammingPairs64]]
    * for the linear-cost pair join (`mm_phash_dups`). A real pipeline
    * computes this over decoded pixel blocks; here the deterministic stub
    * blob IS the byte stream, and the hash is a pure expression.
    *
    * Determinism: block boundaries are floor(c·n/64) (exact doubles at any
    * realistic n), the mean comparison is the integer cross-multiplication
    * sum_c·n > total·len_c — no division anywhere, identical in any
    * engine; the DuckDB twin inlines all 64 block terms.
    *
    * Takes the blob as a STRING column (the stub blobs are UTF-8 text
    * bytes; `content.cast("string")` round-trips them — ASCII corpus).
    */
  def aHash64(text: Column): Column = aHash64FromCodes(blobCodes(text))

  /** Adds `phash` to an asset table (blob bytes hashed via the kernel). */
  def withAHash(assets: DataFrame): DataFrame =
    assets.withColumn("phash", aHash64(col("content").cast("string")))

  /** Byte codes of an (ASCII) blob string as array<long>, via one O(n)
    * split — NOT per-position substr, which is O(n²) (substring at i scans
    * i chars). The slice drops the trailing empty token Spark's limit=-1
    * split emits.
    */
  def blobCodes(text: Column): Column =
    transform(slice(split(text, ""), lit(1), length(text)),
      c => ascii(c).cast("long"))

  /** [[aHash64]] over a code array — the fused native kernel
    * ([[graft.plans.AHash64]]): one O(n) codegen pass. The HOF reference
    * formulation below ([[aHash64Reference]]) is bit-parity-asserted in
    * NativeKernelsSpec; it re-evaluates its inlined subtrees per reference
    * (interpreted HOFs have no subexpression elimination — the original
    * substr-based spelling measured 229 s at sf0.1 vs ~1 s fused).
    */
  def aHash64FromCodes(codesCol: Column): Column =
    graft.plans.NativeKernels.aHash64(codesCol)

  /** Interpreted HOF reference of the aHash law (spec oracle only). */
  private[graft] def aHash64Reference(codesCol: Column): Column = {
    val n = size(codesCol).cast("long")
    val total = aggregate(codesCol, lit(0L), _ + _)
    val bits = (0 until 64).map { c =>
      val from = floor(lit(c.toDouble) * n / 64.0).cast("long")
      val to = floor(lit(c + 1.0) * n / 64.0).cast("long")
      val lenC = to - from
      val sumC = aggregate(
        slice(codesCol, (from + 1L).cast("int"), lenC.cast("int")),
        lit(0L), _ + _)
      when(sumC * n > total * lenC, shiftleft(lit(1L), c)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Hash-projected feature vector per asset (deterministic stand-in for a
    * real encoder's embedding). Output plugs straight into
    * [[Similarity]]/[[Ivf]]/[[Dedup.embeddingPairs]].
    */
  def features(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a =>
      AssetFeatures(a.asset_id, MultimodalStub.features(a.content, dim))))
  }

  // ------------------------------------------------------- real media decode
  // Round-7 upgrade: the decode path below is NOT a stub — the blobs are
  // real PPM/BMP/WAV files (built by [[MediaCodecs]] encoders from a
  // deterministic generative law) and the decoders are full parsers. The
  // DuckDB oracle rebuilds the law in SQL without ever seeing the bytes, so
  // the encode→decode round trip through real container formats is what
  // gets hash-verified (mm_decode_ppm / mm_decode_bmp / mm_decode_wav).

  /** A media file row: real encoded bytes + the format tag. */
  case class MediaAsset(asset_id: Long, fmt: String, content: Array[Byte])

  /** Decoded-image statistics. width/height come from the file HEADER (not
    * carried-along metadata), n/sum/min/max from the decoded raster, and
    * `wsum_val` = Σ (i+1)·pixel_i over the normalized top-down RGB order —
    * position-weighted so channel-swap / row-order / padding bugs cannot
    * cancel out the way permutation-invariant stats would let them.
    */
  case class ImageStats(asset_id: Long, width: Int, height: Int, n_vals: Long,
    sum_val: Long, wsum_val: Long, min_val: Int, max_val: Int)

  /** Decoded-audio statistics; sample_rate parsed from the fmt chunk. */
  case class AudioStats(asset_id: Long, sample_rate: Int, n_vals: Long,
    sum_val: Long, wsum_val: Long, min_val: Int, max_val: Int)

  /** The generative law, mirrored verbatim in the DuckDB oracle SQL:
    * pixel i of asset `id` is (id·131 + i·7) mod 256 over the top-down RGB
    * raster. Stride 7 (coprime to 256) makes any decoder misalignment —
    * off-by-one raster start, wrong row stride — shift every value.
    */
  def mediaPixelLaw(id: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((id * 131 + i.toLong * 7) % 256).toByte)

  /** Audio law: sample i = ((id·37 + i·11) mod 4096) − 2048 (int16 range). */
  def mediaSampleLaw(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (((id * 37 + i.toLong * 11) % 4096) - 2048).toShort)

  /** Image dims by id: widths hit every (w·3 mod 4) padding class so the BMP
    * row-stride logic is exercised at all alignments.
    */
  def mediaDims(id: Long): (Int, Int) =
    ((8 + (id % 8) * 4).toInt, (8 + (id % 4) * 4).toInt)

  def mediaRate(id: Long): Int = (8000 + (id % 4) * 4000).toInt
  def mediaSampleCount(id: Long): Int = (200 + (id % 16) * 50).toInt

  /** Deterministic real media files from `documents` ids: fmt cycles
    * ppm/bmp/wav by doc_id mod 3; content is the law encoded through the
    * real container format. Pure per-row byte work inside mapPartitions —
    * blobs are born on executors and never shuffled.
    */
  def mediaAssetsFromDocuments(documents: DataFrame): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      (id % 3) match {
        case 0 =>
          val (w, h) = mediaDims(id)
          MediaAsset(id, "ppm", MediaCodecs.encodePpm(w, h, mediaPixelLaw(id, w * h * 3)))
        case 1 =>
          val (w, h) = mediaDims(id)
          MediaAsset(id, "bmp", MediaCodecs.encodeBmp(w, h, mediaPixelLaw(id, w * h * 3)))
        case _ =>
          MediaAsset(id, "wav",
            MediaCodecs.encodeWav(mediaRate(id), mediaSampleLaw(id, mediaSampleCount(id))))
      }
    })
  }

  /** PNG variant of [[mediaAssetsFromDocuments]]: EVERY document becomes a
    * real compressed PNG (zlib-deflated, per-row-varied filters) of the same
    * pixel law and dims — so `mm_decode_png`'s oracle is the law over all
    * doc_ids, independent of the %3 fmt cycle, and the decoder must undo
    * inflate + all five filter reconstructions to match the hash.
    */
  def mediaAssetsPngFromDocuments(documents: DataFrame): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val (w, h) = mediaDims(id)
      MediaAsset(id, "png", MediaCodecs.encodePng(w, h, mediaPixelLaw(id, w * h * 3)))
    })
  }

  /** JPEG dims: multiples of 8, so every DCT block is law-constant (the
    * property that makes the LOSSY pipeline exactly oracle-able — see
    * [[mediaBlockColor]]).
    */
  def mediaJpegDims(id: Long): (Int, Int) =
    ((8 * (1 + id % 4)).toInt, (8 * (1 + id % 2)).toInt)

  /** Block-color law: the RGB of every pixel in 8×8 block `b` (row-major
    * block index) of asset `id`. Mirrored in the mm_decode_jpeg oracle,
    * which then replays the integer DC pipeline per block.
    */
  def mediaBlockColor(id: Long, b: Int): (Int, Int, Int) = (
    ((id * 131 + b * 17) % 256).toInt,
    ((id * 59 + b * 23) % 256).toInt,
    ((id * 101 + b * 29) % 256).toInt)

  /** JPEG variant of [[mediaAssetsFromDocuments]]: every document becomes a
    * REAL lossy baseline JPEG (quality 75) of the block-constant color law.
    * Constant 8×8 blocks leave only DC coefficients, whose quantize →
    * dequant → IDCT path is exact integer arithmetic — so the decoder's
    * output has a closed form the DuckDB oracle replays without parsing a
    * byte, even though the format is lossy.
    */
  def mediaAssetsJpegFromDocuments(documents: DataFrame): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val (w, h) = mediaJpegDims(id)
      val wb = w / 8
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = mediaBlockColor(id, (y / 8) * wb + (x / 8))
          val o = 3 * (y * w + x)
          rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      MediaAsset(id, "jpg", MediaCodecs.encodeJpeg(w, h, rgb, 75))
    })
  }

  /** Frames per video asset: 2–4, keyed by id. */
  def mediaFrameCount(id: Long): Int = (2 + id % 3).toInt

  /** Per-frame block-color law: RGB of every pixel in 8×8 block `b` of
    * frame `f` of asset `id` — [[mediaBlockColor]] extended with a frame
    * term so adjacent frames differ everywhere.
    */
  def mediaFrameColor(id: Long, f: Int, b: Int): (Int, Int, Int) = (
    ((id * 131 + f * 71 + b * 17) % 256).toInt,
    ((id * 59 + f * 41 + b * 23) % 256).toInt,
    ((id * 101 + f * 53 + b * 29) % 256).toInt)

  /** REAL video assets: every document becomes an MJPEG-AVI whose frames
    * are quality-75 JPEGs of the per-frame block-constant law — the same
    * closed-form-oracle trick as [[mediaAssetsJpegFromDocuments]], now
    * through a real video container.
    */
  def mediaAssetsAviFromDocuments(documents: DataFrame): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => aviFromLaw(id, id, perturb = false)))
  }

  private def aviFromLaw(id: Long, assetId: Long, perturb: Boolean): MediaAsset = {
    val (w, h) = mediaJpegDims(id)
    val wb = w / 8
    val frames = (0 until mediaFrameCount(id)).map { f =>
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = (y / 8) * wb + (x / 8)
          var (r, g, bl) = mediaFrameColor(id, f, b)
          // the near-dup edit: nudge frame 0 / block 0's red channel ±2
          if (perturb && f == 0 && b == 0) r = if (r >= 254) r - 2 else r + 2
          val o = 3 * (y * w + x)
          rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = bl.toByte
          x += 1
        }
        y += 1
      }
      rgb
    }
    MediaAsset(assetId, "avi", MediaCodecs.encodeAviMjpeg(w, h, frames))
  }

  /** Planted near-dup videos: the SAME content law as the base id, re-keyed
    * `id + offset`, with one 8×8 block of frame 0 color-nudged — the
    * "slightly edited re-upload" shape video dedup exists for.
    */
  def mediaAssetsAviClonesFromDocuments(documents: DataFrame, offset: Long): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => aviFromLaw(id, id + offset, perturb = true)))
  }

  /** Per-sampled-frame aHash64 over REAL decoded video frames — the
    * fingerprint table video near-dup detection runs on.
    */
  def videoFrameHashes(assets: Dataset[MediaAsset], step: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      require(a.fmt == "avi", s"videoFrameHashes: not a video asset (${a.fmt})")
      val v = MediaCodecs.decodeAviMjpeg(a.content)
      v.frames.zipWithIndex.collect { case (im, f) if f % step == 0 =>
        (a.asset_id, f, im.pixels.map(b => (b & 0xff).toLong))
      }
    }.toDF("asset_id", "frame_idx", "codes")
      .withColumn("phash", aHash64FromCodes(col("codes")))
      .drop("codes")
  }

  /** Near-dup VIDEO pairs from a frame-hash table: the linear-cost
    * [[graft.operators.Dedup.hammingPairs64]] banding join over ALL frame
    * hashes (key = asset·1024 + frame, frame counts ≪ 1024), mapped back
    * to video pairs and kept when ≥ `minFrames` sampled-frame pairs agree
    * within `maxDist` bits. Never corpus×corpus: cost ∝ frames sharing a
    * 16-bit hash chunk — the same scale law as SimHash text dedup.
    */
  def videoNearDups(frameHashes: DataFrame, maxDist: Int = 3,
                    minFrames: Long = 1L): DataFrame = {
    // loud guard, not a silent comment: a frame_idx >= 1024 would alias
    // into a neighboring asset_id and corrupt pair attribution. raise_error
    // keeps the check distributed (no extra action) and codegen-friendly.
    val keyed = frameHashes.select(
      when(col("frame_idx") >= 1024 || col("frame_idx") < 0,
        raise_error(concat(lit("videoNearDups: frame_idx out of [0, 1024): "),
          col("frame_idx").cast("string"))))
        .otherwise(col("asset_id") * 1024 + col("frame_idx")).as("fid"),
      col("phash"))
    graft.operators.Dedup.hammingPairs64(keyed, "fid", "phash", maxDist)
      .select(expr("doc_a div 1024").as("video_a"),
        expr("doc_b div 1024").as("video_b"))
      .filter(col("video_a") =!= col("video_b"))
      .groupBy("video_a", "video_b")
      .agg(count(lit(1)).as("matched_frames"))
      .filter(col("matched_frames") >= minFrames)
  }

  /** Planted near-dup audio: the SAME sample law as the base id, re-keyed
    * `id + offset`, with samples 10..19 nudged +16 — the "re-encoded with a
    * click" shape audio dedup exists for.
    */
  def mediaAssetsWavClonesFromDocuments(documents: DataFrame, offset: Long): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val s = mediaSampleLaw(id, mediaSampleCount(id))
      var i = 10
      while (i < 20 && i < s.length) { s(i) = (s(i) + 16).toShort; i += 1 }
      MediaAsset(id + offset, "wav", MediaCodecs.encodeWav(mediaRate(id), s))
    })
  }

  /** 64-bit energy fingerprint of a real decoded WAV: aHash over the
    * |sample| stream — bit c = [segment c's mean magnitude > global mean
    * magnitude]. Same robustness law as the image aHash (a local edit
    * perturbs few segments), same [[graft.operators.Dedup.hammingPairs64]]
    * pair path.
    */
  def audioFingerprints(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.collect { case a if a.fmt == "wav" =>
      val au = MediaCodecs.decodeWav(a.content)
      (a.asset_id, au.samples.map(s => math.abs(s.toLong)))
    }).toDF("asset_id", "codes")
      .withColumn("phash", aHash64FromCodes(col("codes")))
      .drop("codes")
  }

  /** Per-sampled-frame decoded statistics of a real video asset. */
  case class VideoFrameStats(asset_id: Long, frame_idx: Int, width: Int,
    height: Int, n_vals: Long, sum_val: Long, wsum_val: Long,
    min_val: Int, max_val: Int)

  /** REAL frame sampling: demux the AVI, decode every frame, keep every
    * `step`-th — the production form of the stub [[sampleFrames]]. Stats
    * are per frame (weights restart each frame), so a frame-order or
    * sampling-phase bug breaks the oracle hash.
    */
  def sampleVideoFrames(assets: Dataset[MediaAsset], step: Int): Dataset[VideoFrameStats] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      require(a.fmt == "avi", s"sampleVideoFrames: not a video asset (${a.fmt})")
      val v = MediaCodecs.decodeAviMjpeg(a.content)
      v.frames.zipWithIndex.collect { case (im, f) if f % step == 0 =>
        val st = imageStatsOf(a.asset_id, im)
        VideoFrameStats(a.asset_id, f, st.width, st.height, st.n_vals,
          st.sum_val, st.wsum_val, st.min_val, st.max_val)
      }
    }
  }

  private def imageStatsOf(id: Long, im: MediaCodecs.Image): ImageStats = {
    val px = im.pixels
    var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      sum += v; wsum += (i + 1L) * v
      if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    ImageStats(id, im.width, im.height, px.length.toLong, sum, wsum,
      if (px.isEmpty) 0 else mn, mx)
  }

  /** Real image decode (PPM or BMP per the fmt tag) → normalized-raster
    * statistics. Batched mapPartitions; decoded frames live only inside the
    * iterator.
    */
  def decodeImages(assets: Dataset[MediaAsset]): Dataset[ImageStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.collect {
      case a if a.fmt == "ppm" => imageStatsOf(a.asset_id, MediaCodecs.decodePpm(a.content))
      case a if a.fmt == "bmp" => imageStatsOf(a.asset_id, MediaCodecs.decodeBmp(a.content))
      case a if a.fmt == "png" => imageStatsOf(a.asset_id, MediaCodecs.decodePng(a.content))
      case a if a.fmt == "jpg" => imageStatsOf(a.asset_id, MediaCodecs.decodeJpeg(a.content))
    })
  }

  /** REAL decode → nearest-neighbor resize → raster statistics: the
    * decode/resize/feature thumbnail pipeline over genuine container
    * formats (the production form of the stub [[resize]]). Stats carry the
    * RESIZED dims; position-weighted sums run over the resized raster, so
    * a wrong source-index law breaks the oracle hash.
    */
  def resizeImagesReal(assets: Dataset[MediaAsset], ow: Int, oh: Int): Dataset[ImageStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.collect {
      case a if a.fmt == "ppm" =>
        imageStatsOf(a.asset_id, MediaCodecs.resizeNearest(MediaCodecs.decodePpm(a.content), ow, oh))
      case a if a.fmt == "bmp" =>
        imageStatsOf(a.asset_id, MediaCodecs.resizeNearest(MediaCodecs.decodeBmp(a.content), ow, oh))
      case a if a.fmt == "png" =>
        imageStatsOf(a.asset_id, MediaCodecs.resizeNearest(MediaCodecs.decodePng(a.content), ow, oh))
      case a if a.fmt == "jpg" =>
        imageStatsOf(a.asset_id, MediaCodecs.resizeNearest(MediaCodecs.decodeJpeg(a.content), ow, oh))
    })
  }

  /** Real WAV decode → sample statistics (signed int16 values). */
  def decodeAudio(assets: Dataset[MediaAsset]): Dataset[AudioStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.collect { case a if a.fmt == "wav" =>
      val au = MediaCodecs.decodeWav(a.content)
      val s = au.samples
      var sum = 0L; var wsum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var i = 0
      while (i < s.length) {
        val v = s(i).toInt
        sum += v; wsum += (i + 1L) * v
        if (v < mn) mn = v; if (v > mx) mx = v
        i += 1
      }
      AudioStats(a.asset_id, au.sampleRate, s.length.toLong, sum, wsum,
        if (s.isEmpty) 0 else mn, if (s.isEmpty) 0 else mx)
    })
  }

  /** Decoded pixel codes (unsigned bytes as longs) per image asset — feeds
    * [[aHash64FromCodes]] so the perceptual-hash dedup path runs over REAL
    * decoded pixels, not stand-in text bytes.
    */
  def decodedPixelCodes(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.collect {
      case a if a.fmt == "ppm" =>
        (a.asset_id, MediaCodecs.decodePpm(a.content).pixels.map(b => (b & 0xff).toLong))
      case a if a.fmt == "bmp" =>
        (a.asset_id, MediaCodecs.decodeBmp(a.content).pixels.map(b => (b & 0xff).toLong))
    }).toDF("asset_id", "codes")
  }
}

/** The stubbed kernels — every function here would call a real codec in
  * production (STUB: no image/audio libraries in this environment). All are
  * deterministic pure functions of the input bytes so tests and oracles are
  * stable.
  */
object MultimodalStub {

  def decode(a: Multimodal.Asset): Multimodal.Decoded = {
    val bs = a.content
    var sum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < bs.length) {
      val v = bs(i) & 0xff
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    val mean = if (bs.length == 0) 0.0 else sum.toDouble / bs.length
    Multimodal.Decoded(a.asset_id, a.kind, bs.length.toLong, mean,
      if (bs.length == 0) 0 else mn, mx)
  }

  /** Truncate-or-cycle bytes to exactly `n` — stands in for pixel resampling. */
  def resize(bs: Array[Byte], n: Int): Array[Byte] = {
    if (bs.isEmpty) new Array[Byte](n)
    else Array.tabulate(n)(i => bs(i % bs.length))
  }

  /** Fixed-size chunks of the blob — stands in for container demuxing. */
  def frames(bs: Array[Byte], frameBytes: Int): Seq[Array[Byte]] =
    bs.grouped(frameBytes).toSeq

  /** dim XXH64 hashes of the blob under different seeds, scaled to
    * [-1, 1] floats — stands in for an encoder forward pass.
    */
  def features(bs: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bs, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bs.length, d.toLong)
      (h.toDouble / Long.MaxValue).toFloat
    }
}
