package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaCodecs, Multimodal}

/** Real-codec coverage: byte-exact round trips through each container
  * format, the header/padding/order corners a real decoder must survive,
  * loud rejection of unsupported variants, and the Spark pipeline built on
  * top (mm_decode_* / mm_phash_media wiring).
  */
class MediaCodecsSpec extends SparkSpec {
  import spark.implicits._

  private def law(id: Long, n: Int) = Multimodal.mediaPixelLaw(id, n)

  // ------------------------------------------------------------------ PPM

  test("ppm round trip is byte-exact") {
    for (id <- Seq(0L, 3L, 17L)) {
      val (w, h) = Multimodal.mediaDims(id)
      val rgb = law(id, w * h * 3)
      val im = MediaCodecs.decodePpm(MediaCodecs.encodePpm(w, h, rgb))
      assert(im.width === w && im.height === h && im.maxVal === 255)
      assert(im.pixels.toSeq === rgb.toSeq)
    }
  }

  test("ppm parser handles comments, CRLF, and multi-space headers") {
    val rgb = law(5L, 2 * 2 * 3)
    val raster = rgb
    val header = "P6 # magic\r\n# a comment line\n  2\t2 # dims\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val im = MediaCodecs.decodePpm(header ++ raster)
    assert(im.width === 2 && im.height === 2)
    assert(im.pixels.toSeq === rgb.toSeq)
  }

  test("ppm parser rejects bad magic, 2-byte maxval, and short raster") {
    val ok = MediaCodecs.encodePpm(2, 2, law(1L, 12))
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm("P5\n2 2\n255\n".getBytes ++ new Array[Byte](12))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm("P6\n2 2\n65535\n".getBytes ++ new Array[Byte](24))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm(ok.dropRight(1))
    }
  }

  // ------------------------------------------------------------------ BMP

  test("bmp round trip is byte-exact at every row-padding alignment") {
    // w*3 mod 4 cycles 0,3,2,1 over w=8,9,10,11 — all four padding classes
    for (w <- 8 to 11; id <- Seq(2L, 9L)) {
      val h = 5
      val rgb = law(id, w * h * 3)
      val im = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(w, h, rgb))
      assert(im.width === w && im.height === h)
      assert(im.pixels.toSeq === rgb.toSeq, s"w=$w id=$id")
    }
  }

  test("bmp decoder honors top-down (negative height) files") {
    val (w, h) = (3, 2)
    val rgb = law(7L, w * h * 3)
    val up = MediaCodecs.encodeBmp(w, h, rgb)
    // hand-flip to a top-down file: negate height, reorder rows
    val stride = (w * 3 + 3) & ~3
    val down = up.clone()
    def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
      a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
    }
    putIntLE(down, 22, -h)
    for (y <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - y) * stride, down, 54 + y * stride, stride)
    val im = MediaCodecs.decodeBmp(down)
    assert(im.pixels.toSeq === rgb.toSeq)
  }

  test("bmp decoder honors a nonstandard pixel-data offset") {
    val (w, h) = (2, 2)
    val rgb = law(4L, w * h * 3)
    val base = MediaCodecs.encodeBmp(w, h, rgb)
    // splice 6 junk bytes between headers and raster, bump the offset field
    val out = new Array[Byte](base.length + 6)
    System.arraycopy(base, 0, out, 0, 54)
    java.util.Arrays.fill(out, 54, 60, 0x5a.toByte)
    System.arraycopy(base, 54, out, 60, base.length - 54)
    out(10) = 60.toByte
    assert(MediaCodecs.decodeBmp(out).pixels.toSeq === rgb.toSeq)
  }

  test("bmp decoder rejects non-24bpp and compressed files") {
    val ok = MediaCodecs.encodeBmp(2, 2, law(1L, 12))
    val bad8 = ok.clone(); bad8(28) = 8
    intercept[IllegalArgumentException] { MediaCodecs.decodeBmp(bad8) }
    val rle = ok.clone(); rle(30) = 1
    intercept[IllegalArgumentException] { MediaCodecs.decodeBmp(rle) }
  }

  // ------------------------------------------------------------------ WAV

  test("wav round trip preserves samples, rate, channels") {
    val s = Multimodal.mediaSampleLaw(11L, 333)
    val au = MediaCodecs.decodeWav(MediaCodecs.encodeWav(16000, s))
    assert(au.sampleRate === 16000 && au.channels === 1)
    assert(au.samples.toSeq === s.toSeq)
    // int16 extremes survive the LE round trip with sign intact
    val ext = MediaCodecs.decodeWav(
      MediaCodecs.encodeWav(8000, Array(Short.MinValue, -1, 0, 1, Short.MaxValue)))
    assert(ext.samples.toSeq === Seq(Short.MinValue, -1, 0, 1, Short.MaxValue))
  }

  test("wav decoder skips unknown chunks and the odd-size pad byte") {
    val s = Multimodal.mediaSampleLaw(3L, 50)
    val base = MediaCodecs.encodeWav(8000, s)
    // rebuild with a 5-byte (odd) LIST chunk between fmt and data
    val fmt = base.slice(12, 36)
    val data = base.slice(36, base.length)
    val junk = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0) // 5 bytes + pad to even
    val body = fmt ++ junk ++ data
    val out = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes ++ body
    def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
      a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
    }
    putIntLE(out, 4, out.length - 8)
    assert(MediaCodecs.decodeWav(out).samples.toSeq === s.toSeq)
  }

  test("wav decoder rejects non-PCM and missing data") {
    val ok = MediaCodecs.encodeWav(8000, Multimodal.mediaSampleLaw(1L, 10))
    val mulaw = ok.clone(); mulaw(20) = 7 // format code 7 = mu-law
    intercept[IllegalArgumentException] { MediaCodecs.decodeWav(mulaw) }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav("RIFF".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "WAVE".getBytes)
    }
  }

  // ------------------------------------------- Spark pipeline over real media

  test("mediaAssetsFromDocuments emits parseable files of the right format") {
    val media = Multimodal.mediaAssetsFromDocuments(
      Tables.documents(spark, sfDir)).cache()
    try {
      val byFmt = media.groupBy("fmt").count().as[(String, Long)].collect().toMap
      assert(byFmt.keySet === Set("ppm", "bmp", "wav"))
      // spot-parse one of each on the driver
      for (fmt <- Seq("ppm", "bmp", "wav")) {
        val a = media.filter(_.fmt == fmt).head()
        fmt match {
          case "ppm" =>
            val im = MediaCodecs.decodePpm(a.content)
            val (w, h) = Multimodal.mediaDims(a.asset_id)
            assert(im.width === w && im.height === h)
          case "bmp" =>
            val im = MediaCodecs.decodeBmp(a.content)
            val (w, h) = Multimodal.mediaDims(a.asset_id)
            assert(im.width === w && im.height === h)
          case "wav" =>
            val au = MediaCodecs.decodeWav(a.content)
            assert(au.sampleRate === Multimodal.mediaRate(a.asset_id))
            assert(au.samples.length === Multimodal.mediaSampleCount(a.asset_id))
        }
      }
    } finally media.unpersist()
  }

  test("decoded image stats equal the generative law (both formats)") {
    val media = Multimodal.mediaAssetsFromDocuments(Tables.documents(spark, sfDir))
    val stats = Multimodal.decodeImages(media).collect()
    assert(stats.nonEmpty)
    stats.foreach { st =>
      val px = law(st.asset_id, st.width * st.height * 3).map(_ & 0xff)
      assert(st.n_vals === px.length.toLong)
      assert(st.sum_val === px.map(_.toLong).sum)
      assert(st.wsum_val === px.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum)
      assert(st.min_val === px.min && st.max_val === px.max)
    }
  }

  test("aHash kernel over real decoded pixels matches the HOF reference") {
    val media = Multimodal.mediaAssetsFromDocuments(
      Tables.documents(spark, sfDir)).filter(_.asset_id < 60)
    val codes = Multimodal.decodedPixelCodes(media)
    val both = codes.select(col("asset_id"),
      Multimodal.aHash64FromCodes(col("codes")).as("fused"),
      Multimodal.aHash64Reference(col("codes")).as("ref"))
      .as[(Long, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, fused, ref) =>
      assert(fused === ref, s"aHash mismatch on asset $id")
    }
  }
}
