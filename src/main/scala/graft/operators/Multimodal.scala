package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat images/audio/video as opaque `binary`
  * columns with typed metadata, with decode / feature-extraction running as
  * partition-batched transforms.
  *
  * Uncompressed 24-bit BMP decodes FOR REAL ([[Multimodal.bmpDecode]]: pure
  * JVM, header/stride/flip/BGR per the public format spec). Compressed
  * codecs (JPEG/audio/video) remain STUBBED (this environment ships no
  * codec libraries): `decodeStub` derives a deterministic fake (width,
  * height, channels, features) from the bytes. Everything around both —
  * schema, binary column handling, batch iteration shape, partition
  * sizing — is the real Spark plumbing a production decoder (e.g. a JNI
  * codec or an Arrow-batched Python worker) would plug into.
  */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of the text, standing
    * in for image bytes) plus standard binary metadata columns. */
  def withBinaryMeta(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"))
      .select(
        col(idCol),
        col("payload"),
        length(col("payload")).as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 4))).as("magic"),
        sha2(col("payload"), 256).as("sha256"))

  val DecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Deterministic fake decoder: dimensions + an 8-dim feature vector derived
    * from an md5 of the payload bytes (md5 so an external engine can verify
    * the plumbing end-to-end: width = 64 + hash%512 is plain SQL over
    * md5(payload)). Replace with a real codec at this boundary in production. */
  private[operators] def fakeDecode(id: Long, payload: Array[Byte]): Row = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(payload)
    // hex chars 1..15 as a non-negative long — same formulation as the text
    // hash kernels (equals ('0x'||substr(md5(payload),1,15))::BIGINT)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) & 0xf0L) >> 4)
    val width = 64 + (h % 512).toInt
    val height = 64 + ((h >> 16) % 512).toInt
    val features = Array.tabulate(8)(k =>
      (math.floorMod(graft.rng.Rng.mix64(h + k), 2000L) / 1000.0f - 1.0f))
    Row(id, width, height, 3, features.toSeq)
  }

  /** Frame sampling for "video" payloads: `nFrames` evenly-spaced sample
    * points per document, exploded to one row per frame — the standard
    * video -> frame-batch shape a real pipeline feeds to a vision encoder.
    * Container-metadata parsing is stubbed (duration is md5-derived from the
    * payload, like [[fakeDecode]]); the Spark side — pure projection +
    * explode, no shuffle, frame offsets computable WITHOUT decoding — is the
    * production shape. Integer `div` keeps the arithmetic engine-portable. */
  def frameSample(withMeta: DataFrame, idCol: String, nFrames: Int = 4): DataFrame =
    withMeta
      .select(
        col(idCol), col("n_bytes").cast("long").as("n_bytes"),
        (conv(substring(md5(col("payload")), 1, 15), 16, 10).cast("long") % 60000L + 1000L)
          .as("duration_ms"))
      .withColumn("frame_idx", explode(sequence(lit(0L), lit(nFrames - 1L))))
      .select(
        col(idCol), col("frame_idx"),
        expr(s"duration_ms * frame_idx div $nFrames").as("frame_ts_ms"),
        expr(s"n_bytes * frame_idx div $nFrames").as("frame_offset"))

  /** Resize PLANNING over decoded dimensions: fit-within-`maxDim` preserving
    * aspect ratio, never upscaling — all integer arithmetic (`div`), so the
    * plan is engine-portable and verifiable without any codec. This is the
    * split a production pipeline wants: the (cheap, exact) geometry planning
    * runs as a Catalyst projection over the whole corpus and can be audited/
    * aggregated (e.g. total output pixels = GPU budget) BEFORE the
    * (expensive, stubbed-here) pixel resampling runs partition-batched next
    * to the decoder at this same boundary. */
  def resizePlan(decoded: DataFrame, idCol: String, maxDim: Int = 224): DataFrame = {
    val long = (c: String) => col(c).cast("long")
    val m = greatest(long("width"), long("height"))
    val fit = (c: String) => when(m <= maxDim, long(c)).otherwise(
      expr(s"CAST($c AS BIGINT) * $maxDim div " +
        "greatest(CAST(width AS BIGINT), CAST(height AS BIGINT))"))
    decoded.select(
      col(idCol), long("width").as("width"), long("height").as("height"),
      fit("width").as("out_w"), fit("height").as("out_h"))
  }

  /** Partition-batched decode over the binary column. The iterator shape
    * (whole-partition lazy traversal, no row materialization beyond the
    * batch) is exactly where a vectorized decoder slots in. */
  def decodeStub(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1))))
    spark.createDataFrame(rdd, DecodedSchema)
  }

  // --- real codec: uncompressed 24-bit BMP ---------------------------------

  /** Little-endian int32 write. */
  private[graft] def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def getLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def getLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode a 24-bit uncompressed (BI_RGB) bottom-up BMP: 14-byte file
    * header + 40-byte BITMAPINFOHEADER + BGR rows padded to 4 bytes.
    * `pixel(x, y)` returns (r, g, b) in TOP-DOWN image coordinates — the
    * encoder stores rows bottom-up as positive-height BMP requires, so a
    * decoder that forgets the vertical flip produces wrong row-indexed
    * stats. Format layout per the public Windows BMP specification. */
  def bmpEncode(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val stride = ((3 * width + 3) / 4) * 4
    val size = 54 + stride * height
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, size)
    putLe32(b, 10, 54) // pixel-data offset
    putLe32(b, 14, 40) // info-header size
    putLe32(b, 18, width)
    putLe32(b, 22, height) // positive: bottom-up
    b(26) = 1 // planes
    b(28) = 24 // bits per pixel
    putLe32(b, 30, 0) // BI_RGB
    putLe32(b, 34, stride * height)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, y)
        val o = rowOff + 3 * x
        b(o) = bl.toByte; b(o + 1) = g.toByte; b(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Decoded-image statistics in integer space: exact per-channel sums plus
    * a row-index-weighted red sum. Sums are order-free (exactly
    * aggregatable) while `wsumR = Σ (y+1)·R(x,y)` is row-SENSITIVE, so a
    * decoder that mis-handles bottom-up storage, row padding, or BGR order
    * cannot produce the right tuple. */
  final case class BmpStats(
      width: Int, height: Int, channels: Int,
      sumR: Long, sumG: Long, sumB: Long, wsumR: Long)

  /** Parsed-and-validated 24-bit BMP header geometry. */
  private final case class BmpHeader(
      pixelOff: Int, width: Int, height: Int, bottomUp: Boolean, stride: Int) {
    /** Byte offset of pixel (x, y) in TOP-DOWN image coordinates. */
    @inline def at(x: Int, y: Int): Int = {
      val srcRow = if (bottomUp) height - 1 - y else y
      pixelOff + srcRow * stride + 3 * x
    }
  }

  private def bmpHeader(bytes: Array[Byte]): BmpHeader = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val pixelOff = getLe32(bytes, 10)
    val width = getLe32(bytes, 18)
    val rawHeight = getLe32(bytes, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(getLe16(bytes, 26) == 1, "BMP planes must be 1")
    require(getLe16(bytes, 28) == 24, s"only 24-bit BMP supported")
    require(getLe32(bytes, 30) == 0, "only uncompressed (BI_RGB) BMP supported")
    require(width > 0 && height > 0, "degenerate BMP dimensions")
    val stride = ((3 * width + 3) / 4) * 4
    require(bytes.length >= pixelOff + stride * height, "truncated BMP pixel data")
    BmpHeader(pixelOff, width, height, bottomUp, stride)
  }

  /** Real pure-JVM decode of an uncompressed 24-bit BMP (bottom-up or
    * top-down via negative height) straight off the byte array — header
    * offsets, row stride padding and BGR ordering per the public format
    * spec. Rejects anything else loudly rather than guessing. */
  def bmpDecode(bytes: Array[Byte]): BmpStats = {
    val hdr = bmpHeader(bytes)
    val pixelOff = hdr.pixelOff
    val width = hdr.width
    val height = hdr.height
    val bottomUp = hdr.bottomUp
    val stride = hdr.stride
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumR = 0L
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val rowOff = pixelOff + srcRow * stride
      var x = 0
      while (x < width) {
        val o = rowOff + 3 * x
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        sumB += b; sumG += g; sumR += r
        wsumR += (y + 1).toLong * r
        x += 1
      }
      y += 1
    }
    BmpStats(width, height, 3, sumR, sumG, sumB, wsumR)
  }

  /** `buckets`-bin LUMINANCE histogram of a 24-bit BMP — the exposure/
    * contrast profile behind brightness filtering and dark/blank-image
    * detection in an image-curation pipeline. Integer ITU-R 601 luma
    * (`(299r + 587g + 114b) div 1000`, the classic fixed-point weights),
    * bucket = `lum·buckets div 256` — every count exactly recomputable
    * from the fixture formula. One pass over the pixel rows, O(buckets)
    * state. */
  def bmpHistogram(bytes: Array[Byte], buckets: Int = 8): Array[Long] = {
    require(buckets >= 1 && buckets <= 256)
    val hdr = bmpHeader(bytes)
    val out = new Array[Long](buckets)
    var y = 0
    while (y < hdr.height) {
      val srcRow = if (hdr.bottomUp) hdr.height - 1 - y else y
      val rowOff = hdr.pixelOff + srcRow * hdr.stride
      var x = 0
      while (x < hdr.width) {
        val o = rowOff + 3 * x
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        val lum = (299 * r + 587 * g + 114 * b) / 1000
        out(lum * buckets / 256) += 1L
        x += 1
      }
      y += 1
    }
    out
  }

  val BmpHistogramSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("n_pixels", LongType, nullable = false)))

  /** Partition-batched luminance histograms over a BMP binary column,
    * exploded to (id, bucket, n_pixels) — empty buckets kept at 0 so the
    * histogram shape is uniform per image. */
  def histogramBmp(withPayload: DataFrame, idCol: String,
      buckets: Int = 8): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.flatMap { r =>
        val h = bmpHistogram(r.getAs[Array[Byte]](1), buckets)
        h.iterator.zipWithIndex.map { case (n, b) => Row(r.getLong(0), b.toLong, n) }
      })
    spark.createDataFrame(rdd, BmpHistogramSchema)
  }

  /** Deterministic BMP fixture per document: dimensions and channel values
    * are simple integer functions of (doc_id, x, y), so an external engine
    * can recompute every decoded statistic from the FORMULA while Spark
    * recomputes it from the BYTES — the decoder sits in the middle and any
    * parsing defect (offset, stride, flip, channel order) breaks the match.
    *   w = 8 + id % 25, h = 8 + (id·7) % 25
    *   R = (x + 3y + id) % 256, G = (2x + y) % 256, B = (x + y + id) % 256 */
  def bmpFixtures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions(_.map { row =>
      val id = row.getLong(0)
      val w = (8 + id % 25).toInt
      val h = (8 + (id * 7) % 25).toInt
      val payload = bmpEncode(w, h, (x, y) => (
        ((x + 3 * y + id) % 256).toInt,
        ((2 * x + y) % 256).toInt,
        ((x + y + id) % 256).toInt))
      Row(id, payload)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  val BmpDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("wsum_r", LongType, nullable = false)))

  /** Partition-batched REAL decode over a BMP binary column — same
    * iterator shape as [[decodeStub]] with actual pixel math inside.
    * Other codecs still stub through [[decodeStub]]. */
  def decodeBmp(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = bmpDecode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.width.toLong, s.height.toLong, s.channels.toLong,
          s.sumR, s.sumG, s.sumB, s.wsumR)
      })
    spark.createDataFrame(rdd, BmpDecodedSchema)
  }

  val SniffSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("rate", LongType, nullable = false)))

  /** Header-only media sniff: format + dimensions from MAGIC BYTES and
    * fixed header fields alone — no pixel/sample decode, no decompression.
    * This is the 100 TB triage pass: dimension/format stats, size filters,
    * and per-format routing over a petabyte of blobs should cost header
    * reads, not IDCT/inflate time (the full decoders stay for the rows
    * that survive routing).
    *
    * Recognizes BMP (BITMAPINFOHEADER dims, LE), PNG (IHDR dims BE +
    * channels from the color type), GIF (logical screen, LE; palette
    * entries are RGB so channels reports 3), baseline/progressive JPEG
    * (marker walk to the first SOF frame header — segment-length hops
    * only, entropy data never touched), and RIFF/WAVE (fmt + data chunk
    * walk: width = frames = data size / block align, height = 1, rate =
    * sample rate). Anything else reports ("unknown", 0, 0, 0, 0) — sniff
    * must never throw on arbitrary bytes. Pure row-local projection. */
  private[graft] def sniffHeader(b: Array[Byte]): (String, Long, Long, Long, Long) = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def be16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    val n = b.length
    val unknown = ("unknown", 0L, 0L, 0L, 0L)
    if (n >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      // negative BITMAPINFOHEADER height encodes top-down row order
      ("bmp", le32(18), math.abs(le32(22).toInt).toLong, 3L, 0L)
    } else if (n >= 26 && u8(0) == 0x89 && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
        b(3) == 'G'.toByte && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a) {
      val ch = u8(25) match {
        case 0 => 1L; case 2 => 3L; case 3 => 3L; case 4 => 2L; case 6 => 4L; case _ => 0L
      }
      ("png", be32(16), be32(20), ch, 0L)
    } else if (n >= 10 && b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) {
      ("gif", le16(6), le16(8), 3L, 0L)
    } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out = unknown
      var done = false
      while (!done && i + 4 <= n) {
        if (u8(i) != 0xff) { done = true }
        else {
          val m = u8(i + 1)
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone markers
          else if (m == 0xd9 || m == 0xda) done = true      // EOI / entropy data starts
          else {
            val segLen = be16(i + 2).toInt
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof && i + 9 < n) {
              out = ("jpeg", be16(i + 7), be16(i + 5), u8(i + 9).toLong, 0L)
              done = true
            } else i += 2 + segLen
          }
        }
      }
      out
    } else if (n >= 12 && b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
        b(3) == 'F'.toByte && b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
        b(10) == 'V'.toByte && b(11) == 'E'.toByte) {
      var i = 12
      var channels = 0L
      var rate = 0L
      var blockAlign = 0L
      var frames = 0L
      while (i + 8 <= n) {
        val cid = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(i + 4)
        if (cid == "fmt " && i + 24 <= n) {
          channels = le16(i + 10)
          rate = le32(i + 12)
          blockAlign = le16(i + 20)
        } else if (cid == "data" && blockAlign > 0) {
          frames = size / blockAlign
        }
        // word-aligned chunk hop (odd sizes pad one byte)
        i += 8 + size.toInt + (size.toInt & 1)
      }
      if (channels > 0) ("wav", frames, 1L, channels, rate) else unknown
    } else unknown
  }

  /** [[sniffHeader]] over a binary `payload` column — same partition-batched
    * projection shape as the decoders, but header-cost only. */
  def sniff(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val (fmt, w, h, ch, rate) = sniffHeader(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), fmt, w, h, ch, rate)
      })
    spark.createDataFrame(rdd, SniffSchema)
  }

  // --- perceptual hashing: 8×8 DCT pHash ------------------------------------

  /** Quantized DCT-II basis `floor(cos(π·(2x+1)·u/16)·1e6 + 0.5)` as a
    * LITERAL table (the engine's standard way to share a transcendental
    * curve with an external oracle — no runtime cos on either side). */
  private[operators] val QCos: Array[Array[Long]] = Array(
    Array(1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L),
    Array(980785L, 831470L, 555570L, 195090L, -195090L, -555570L, -831470L, -980785L),
    Array(923880L, 382683L, -382683L, -923880L, -923880L, -382683L, 382683L, 923880L),
    Array(831470L, -195090L, -980785L, -555570L, 555570L, 980785L, 195090L, -831470L),
    Array(707107L, -707107L, -707107L, 707107L, 707107L, -707107L, -707107L, 707107L),
    Array(555570L, -980785L, 195090L, 831470L, -831470L, -195090L, 980785L, -555570L),
    Array(382683L, -923880L, 923880L, -382683L, -382683L, 923880L, -923880L, 382683L),
    Array(195090L, -555570L, 831470L, -980785L, 980785L, -831470L, 555570L, -195090L))

  /** 63-bit perceptual DCT hash of a 24-bit BMP: nearest-neighbor resize to
    * 8×8 integer luma, unnormalized 2D DCT-II over the quantized [[QCos]]
    * basis (normalization cancels under thresholding), bit k = coefficient
    * (v,u) — row-major, DC skipped, k = v·8+u−1 — above the truncating
    * integer mean of the 63 AC coefficients. All integer end to end, so the
    * hash itself is exactly recomputable from the pixel formula by an
    * external engine. Overflow: |lum·c_v·c_u| ≤ 255·10¹², ×64 terms < 2⁶³.
    * Near-duplicate images (recompression, mild crop/resize) land within a
    * few bits — the image twin of SimHash. */
  def bmpPhash(bytes: Array[Byte]): Long = {
    val hdr = bmpHeader(bytes)
    val lum = new Array[Long](64)
    var y8 = 0
    while (y8 < 8) {
      val sy = y8 * hdr.height / 8
      var x8 = 0
      while (x8 < 8) {
        val sx = x8 * hdr.width / 8
        val o = hdr.at(sx, sy)
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        lum(y8 * 8 + x8) = (299L * r + 587L * g + 114L * b) / 1000L
        x8 += 1
      }
      y8 += 1
    }
    val coef = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0L
        var y = 0
        while (y < 8) {
          val cv = QCos(v)(y)
          var x = 0
          while (x < 8) {
            s += lum(y * 8 + x) * cv * QCos(u)(x)
            x += 1
          }
          y += 1
        }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    var sumAc = 0L
    var i = 1
    while (i < 64) { sumAc += coef(i); i += 1 }
    val mean = sumAc / 63L // truncates toward zero, same as Spark div / DuckDB //
    var hash = 0L
    i = 1
    while (i < 64) {
      if (coef(i) > mean) hash |= 1L << (i - 1)
      i += 1
    }
    hash
  }

  /** Partition-batched [[bmpPhash]] over a BMP binary column → (id, phash). */
  def phashBmp(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map(r => Row(r.getLong(0), bmpPhash(r.getAs[Array[Byte]](1)))))
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false))))
  }

  /** Near-duplicate image pairs by pHash Hamming distance ≤ `maxDist`:
    * each 64-bit hash splits into `bands` 16-bit segments; by pigeonhole a
    * pair within `maxDist` < `bands` bit flips shares at least one verbatim
    * segment, so the band equi-join is LOSSLESS candidate generation (the
    * SimHash/MinHash banding argument applied to image hashes) and the
    * exact `bit_count(xor)` check runs over candidates only — never all
    * pairs. Scale shape: one narrow (band, value) shuffle; a degenerate
    * band value (e.g. all-dark corpus → identical low bands) is the same
    * hot-key risk as any LSH band and AQE-splittable. */
  def phashPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(maxDist >= 0 && maxDist < bands, "banding is lossless only for maxDist < bands")
    // the 64-bit hash must split into `bands` DISTINCT segments — a fixed
    // 16-bit stride beyond 4 bands would alias (shift-by-64 wraps) and
    // silently drop true pairs despite the pigeonhole require above
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64, got $bands")
    val stride = 64 / bands
    val mask = if (stride == 64) -1L else (1L << stride) - 1
    val h = hashes.select(col(idCol).cast("long").as("id"), col(hashCol).as("h"))
    val banded = h.select(col("id"), col("h"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bval", expr(s"(h >> (band * $stride)) & $mask"))
    val a = banded.select(col("band"), col("bval"), col("id").as("id_a"), col("h").as("h_a"))
    val b = banded.select(col("band"), col("bval"), col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** TEXTURED BMP fixtures for the perceptual-hash pair gate: quadratic
    * cross-term pixel formulas give every source id a distinct frequency
    * signature — the linear gradients of [[bmpFixtures]] collapse to
    * near-identical DCT sign patterns (measured: 58% of all pairs within
    * Hamming 3; with these formulas only byte-identical mirrors fall under
    * distance 19). `ids` must carry (doc_id, sid); equal sids yield
    * byte-identical images, so planted mirrors are exact Hamming-0 pairs.
    *   w = 8 + sid % 25, h = 8 + (sid·7) % 25
    *   R = ((37x + 23y + 101·sid)·(x + y + sid%7 + 1)) % 256
    *   G = ((11x + 41y + 59·sid)·(x + 2y + sid%5 + 1)) % 256
    *   B = ((29x + 13y + 83·sid)·(2x + y + sid%3 + 1)) % 256 */
  def bmpFixturesTextured(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col("doc_id").cast("long"), col("sid").cast("long")).rdd
      .mapPartitions(_.map { row =>
        val id = row.getLong(0)
        val sid = row.getLong(1)
        val w = (8 + sid % 25).toInt
        val h = (8 + (sid * 7) % 25).toInt
        val payload = bmpEncode(w, h, (x, y) => (
          (((x * 37 + y * 23 + sid * 101) * (x + y + sid % 7 + 1)) % 256).toInt,
          (((x * 11 + y * 41 + sid * 59) * (x + 2 * y + sid % 5 + 1)) % 256).toInt,
          (((x * 29 + y * 13 + sid * 83) * (2 * x + y + sid % 3 + 1)) % 256).toInt))
        Row(id, payload)
      })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  // --- real codec: GIF (LZW) ------------------------------------------------

  /** LSB-first variable-width bit writer — GIF's LZW packs code bits little-
    * endian within bytes (the opposite of PNG/DEFLATE's Huffman ordering). */
  private final class BitWriterLsb {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code << nBits
      nBits += width
      while (nBits >= 8) {
        out.write(acc & 0xff)
        acc >>>= 8
        nBits -= 8
      }
    }
    def toArray: Array[Byte] = {
      if (nBits > 0) { out.write(acc & 0xff); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** GIF-variant LZW compression of an index stream: initial clear code,
    * dictionary growth with the canonical width-bump rule (code size
    * increments when the NEXT assignable code reaches 2^size — the giflib
    * pairing), table reset at 4096. */
  private def lzwEncode(indices: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bits = new BitWriterLsb
    val dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var nextCode = eoi + 1
    var codeSize = minCodeSize + 1
    bits.write(clear, codeSize)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val k = indices(i)
      if (prefix == -1) prefix = k
      else dict.get((prefix, k)) match {
        case Some(c) => prefix = c
        case None =>
          bits.write(prefix, codeSize)
          dict((prefix, k)) = nextCode
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          else if (nextCode == 4096) {
            bits.write(clear, codeSize)
            dict.clear()
            nextCode = eoi + 1
            codeSize = minCodeSize + 1
          }
          prefix = k
      }
      i += 1
    }
    if (prefix != -1) bits.write(prefix, codeSize)
    // mirror the decoder's one-early bump for the EOI read: processing the
    // final data code adds one dictionary entry on the decoder side, and if
    // that lands on 2^size−1 the decoder widens BEFORE reading EOI — the
    // encoder must widen with it (every other code is followed by an
    // encoder-side add that re-synchronizes; EOI is not). Caught by the
    // scalacheck round-trip property, not the gate fixtures.
    if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
    bits.write(eoi, codeSize)
    bits.toArray
  }

  /** GIF-variant LZW decompression: clear/EOI handling, KwKwK first-unseen-
    * code case, the same width-bump rule as [[lzwEncode]]. Any bit-level
    * defect desynchronizes the whole remaining stream — which is what makes
    * a formula-vs-bytes oracle so sharp for this codec. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, maxPixels: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val dict = Array.ofDim[Array[Int]](4096)
    def reset(): Int = {
      java.util.Arrays.fill(dict.asInstanceOf[Array[AnyRef]], null)
      var c = 0
      while (c < clear) { dict(c) = Array(c); c += 1 }
      eoi + 1
    }
    var nextCode = reset()
    var codeSize = minCodeSize + 1
    var acc = 0L
    var nBits = 0
    var pos = 0
    var prev: Array[Int] = null
    val result = new scala.collection.mutable.ArrayBuffer[Int](maxPixels)
    var done = false
    while (!done) {
      while (nBits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nBits
        nBits += 8
        pos += 1
      }
      require(nBits >= codeSize, "truncated LZW stream")
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize
      nBits -= codeSize
      if (code == clear) {
        nextCode = reset()
        codeSize = minCodeSize + 1
        prev = null
      } else if (code == eoi) {
        done = true
      } else {
        val entry: Array[Int] =
          if (dict(code) != null) dict(code)
          else if (code == nextCode && prev != null) prev :+ prev(0) // KwKwK
          else throw new IllegalStateException(s"bad LZW code $code")
        result ++= entry
        if (prev != null && nextCode < 4096) {
          dict(nextCode) = prev :+ entry(0)
          nextCode += 1
          // one EARLIER than the encoder's bump: the decoder learns each
          // dictionary entry one code later than the encoder assigned it,
          // so its width must widen one assignment ahead to stay in sync
          if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        prev = entry
        require(result.length <= maxPixels, "LZW output exceeds image size")
      }
    }
    result.toArray
  }

  /** Encode an indexed image as a canonical GIF87a: 256-entry global color
    * table with palette[i] = (i, 2i mod 256, 5i+1 mod 256) — non-trivial on
    * purpose, so stats must go THROUGH the color table — one full-frame
    * image, real LZW sub-blocks. */
  def gifEncode(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    var i = 0
    while (i < 256) {
      out.write(i); out.write((2 * i) % 256); out.write((5 * i + 1) % 256)
      i += 1
    }
    out.write(0x2C) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0) // no local color table, no interlace
    val indices = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { indices(y * width + x) = pixel(x, y) & 0xff; x += 1 }
      y += 1
    }
    out.write(8) // LZW minimum code size
    val lzw = lzwEncode(indices, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  final case class GifStats(width: Int, height: Int, nPixels: Long,
      sumR: Long, sumG: Long, sumB: Long, wsumR: Long)

  /** Real pure-JVM GIF decode: header + logical screen descriptor, global
    * color table read (stats go through the PALETTE, not raw indices),
    * extension-block skipping, image descriptor, sub-block reassembly and
    * full LZW decompression ([[lzwDecode]]). Rejects interlace/local tables
    * loudly rather than guessing. */
  def gifDecode(bytes: Array[Byte]): GifStats = {
    require(bytes.length > 13 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F',
      "not a GIF payload")
    val sw = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
    val sh = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    val flags = bytes(10) & 0xff
    require((flags & 0x80) != 0, "GIF without a global color table")
    val gctSize = 2 << (flags & 7)
    var p = 13
    val palR = new Array[Int](gctSize)
    val palG = new Array[Int](gctSize)
    val palB = new Array[Int](gctSize)
    var i = 0
    while (i < gctSize) {
      palR(i) = bytes(p) & 0xff; palG(i) = bytes(p + 1) & 0xff; palB(i) = bytes(p + 2) & 0xff
      p += 3; i += 1
    }
    // walk blocks to the first image descriptor, skipping extensions
    while ((bytes(p) & 0xff) == 0x21) {
      p += 2 // introducer + label
      while ((bytes(p) & 0xff) != 0) p += 1 + (bytes(p) & 0xff)
      p += 1
    }
    require((bytes(p) & 0xff) == 0x2C, "expected GIF image descriptor")
    val w = (bytes(p + 5) & 0xff) | ((bytes(p + 6) & 0xff) << 8)
    val h = (bytes(p + 7) & 0xff) | ((bytes(p + 8) & 0xff) << 8)
    val iFlags = bytes(p + 9) & 0xff
    require((iFlags & 0x80) == 0, "local color tables unsupported")
    require((iFlags & 0x40) == 0, "interlaced GIF unsupported")
    p += 10
    val minCodeSize = bytes(p) & 0xff
    p += 1
    val data = new java.io.ByteArrayOutputStream()
    while ((bytes(p) & 0xff) != 0) {
      val n = bytes(p) & 0xff
      data.write(bytes, p + 1, n)
      p += 1 + n
    }
    val indices = lzwDecode(data.toByteArray, minCodeSize, w * h)
    require(indices.length == w.toLong * h, s"LZW decoded ${indices.length} of ${w * h} pixels")
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumR = 0L
    var k = 0
    while (k < indices.length) {
      val idx = indices(k)
      val r = palR(idx)
      sumR += r; sumG += palG(idx); sumB += palB(idx)
      wsumR += (k / w + 1).toLong * r
      k += 1
    }
    GifStats(sw, sh, w.toLong * h, sumR, sumG, sumB, wsumR)
  }

  /** Deterministic GIF fixtures: dims and palette INDICES are integer
    * functions of (doc_id, x, y) — the oracle recomputes every stat from
    * the formula THROUGH the palette formula, while Spark decodes the
    * actual LZW bytes.
    *   w = 8 + id % 17, h = 8 + (id·3) % 17, idx = (7x + 11y + 13·id) % 256 */
  def gifFixtures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions(_.map { row =>
      val id = row.getLong(0)
      val w = (8 + id % 17).toInt
      val h = (8 + (id * 3) % 17).toInt
      val payload = gifEncode(w, h, (x, y) => ((x * 7 + y * 11 + id * 13) % 256).toInt)
      Row(id, payload)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  val GifDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("wsum_r", LongType, nullable = false)))

  /** Partition-batched REAL GIF decode over a binary column. */
  def decodeGif(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = gifDecode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.width.toLong, s.height.toLong, s.nPixels,
          s.sumR, s.sumG, s.sumB, s.wsumR)
      })
    spark.createDataFrame(rdd, GifDecodedSchema)
  }

  // --- real codec: PCM16 WAV (RIFF) ----------------------------------------

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  /** Encode interleaved PCM16 samples as a canonical RIFF/WAVE file:
    * 12-byte RIFF header, 16-byte PCM "fmt " chunk, "data" chunk with
    * little-endian 16-bit two's-complement samples. Layout per the public
    * RIFF/WAVE format specification. */
  def wavEncode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && samples.length % channels == 0)
    val dataSize = 2 * samples.length
    val b = new Array[Byte](44 + dataSize)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLe32(b, 4, 36 + dataSize)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putLe32(b, 16, 16) // PCM fmt chunk size
    putLe16(b, 20, 1) // audio format: PCM
    putLe16(b, 22, channels)
    putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate * channels * 2) // byte rate
    putLe16(b, 32, channels * 2) // block align
    putLe16(b, 34, 16) // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putLe32(b, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putLe16(b, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    b
  }

  /** Decoded-audio statistics in integer space: exact absolute-amplitude and
    * energy sums (order-free, exactly aggregatable) plus a frame-index-
    * weighted channel-0 sum `wsumC0 = Σ (i+1)·s(i, 0)` that is both order-
    * and interleave-SENSITIVE — a decoder that misreads the data offset,
    * sample width, sign or channel interleaving cannot produce the right
    * tuple. `durationMs = frames·1000 div rate` stays in integer division so
    * the value is engine-portable. */
  final case class WavStats(
      channels: Int, sampleRate: Int, nFrames: Long, durationMs: Long,
      sumAbs: Long, energy: Long, wsumC0: Long)

  /** Real pure-JVM decode of a PCM16 RIFF/WAVE payload straight off the byte
    * array: validates the RIFF/WAVE magic, then WALKS the chunk list (word-
    * aligned sizes, unknown chunks skipped — real-world WAV files carry
    * LIST/INFO chunks before data) until "fmt " and "data" are both seen.
    * Rejects non-PCM and non-16-bit loudly rather than guessing. */
  private final case class WavHeader(channels: Int, sampleRate: Int,
      dataOff: Int, nFrames: Int)

  /** RIFF/WAVE chunk walk shared by [[wavDecode]] and [[wavResample]]:
    * validates magic, walks word-aligned chunks past LIST/INFO/fact to
    * "fmt " + "data", rejects non-PCM16 loudly. */
  private def wavHeader(bytes: Array[Byte]): WavHeader = {
    require(bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE payload")
    var off = 12
    var channels = -1
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = getLe32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          require(getLe16(bytes, off + 8) == 1, "only PCM WAV supported")
          channels = getLe16(bytes, off + 10)
          sampleRate = getLe32(bytes, off + 12)
          require(getLe16(bytes, off + 22) == 16, "only 16-bit WAV supported")
        case "data" =>
          dataOff = off + 8
          dataLen = size
        case _ => // skip unknown chunk (LIST, INFO, fact, ...)
      }
      off += 8 + size + (size & 1) // chunk sizes are word-aligned
    }
    require(channels > 0 && sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataLen % (2 * channels) == 0, "data chunk not frame-aligned")
    WavHeader(channels, sampleRate, dataOff, dataLen / (2 * channels))
  }

  /** Little-endian int16 sample of (frame, channel), sign-extended. */
  @inline private def wavSample(bytes: Array[Byte], h: WavHeader,
      frame: Int, ch: Int): Int = {
    val o = h.dataOff + 2 * (frame * h.channels + ch)
    ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
  }

  def wavDecode(bytes: Array[Byte]): WavStats = {
    val h = wavHeader(bytes)
    val channels = h.channels
    val sampleRate = h.sampleRate
    val dataOff = h.dataOff
    val nFrames = h.nFrames
    var sumAbs = 0L; var energy = 0L; var wsumC0 = 0L
    var f = 0
    while (f < nFrames) {
      var ch = 0
      while (ch < channels) {
        val o = dataOff + 2 * (f * channels + ch)
        // little-endian int16, sign-extended
        val v = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
        sumAbs += math.abs(v)
        energy += v.toLong * v
        if (ch == 0) wsumC0 += (f + 1).toLong * v
        ch += 1
      }
      f += 1
    }
    WavStats(channels, sampleRate, nFrames.toLong,
      nFrames.toLong * 1000L / sampleRate, sumAbs, energy, wsumC0)
  }

  /** Deterministic WAV fixture per document: frame count, channel count,
    * sample rate and every sample value are integer functions of
    * (doc_id, frame, channel), so an external engine recomputes the decoded
    * statistics from the FORMULA while Spark recomputes them from the BYTES.
    *   frames = 64 + id % 193, channels = 1 + id % 2,
    *   rate = 8000 + (id % 3)·4000,
    *   s(i, ch) = (i·(3 + ch) + id·11) % 4001 − 2000 */
  def wavFixtures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions(_.map { row =>
      val id = row.getLong(0)
      val frames = (64 + id % 193).toInt
      val channels = (1 + id % 2).toInt
      val rate = (8000 + (id % 3) * 4000).toInt
      val samples = new Array[Short](frames * channels)
      var f = 0
      while (f < frames) {
        var ch = 0
        while (ch < channels) {
          samples(f * channels + ch) =
            ((f.toLong * (3 + ch) + id * 11L) % 4001L - 2000L).toShort
          ch += 1
        }
        f += 1
      }
      Row(id, wavEncode(rate, channels, samples))
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  val WavDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("wsum_c0", LongType, nullable = false)))

  /** Resized-image statistics: output geometry plus exact per-channel sums
    * and a row-weighted red sum over the RESAMPLED pixels. */
  final case class BmpResampleStats(
      srcW: Int, srcH: Int, outW: Int, outH: Int,
      sumR: Long, sumG: Long, sumB: Long, wsumR: Long)

  /** REAL pixel resampling (the step [[resizePlan]] plans): nearest-neighbor
    * fit-within-`maxDim` downscale of a 24-bit BMP, all-integer — source
    * pixel of output (x, y) is (x·srcW div outW, y·srcH div outH), the
    * truncating-division mapping both engines share — so the resampled
    * image's statistics are exactly recomputable from the pixel formula.
    * Never upscales (geometry identical to [[resizePlan]]). Reads only the
    * sampled source rows/pixels off the byte array. */
  def bmpResample(bytes: Array[Byte], maxDim: Int): BmpResampleStats = {
    require(maxDim > 0)
    val hdr = bmpHeader(bytes)
    val m = math.max(hdr.width, hdr.height)
    val outW = if (m <= maxDim) hdr.width else hdr.width * maxDim / m
    val outH = if (m <= maxDim) hdr.height else hdr.height * maxDim / m
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumR = 0L
    var y = 0
    while (y < outH) {
      val sy = y * hdr.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * hdr.width / outW
        val o = hdr.at(sx, sy)
        sumB += bytes(o) & 0xff
        sumG += bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        sumR += r
        wsumR += (y + 1).toLong * r
        x += 1
      }
      y += 1
    }
    BmpResampleStats(hdr.width, hdr.height, outW, outH, sumR, sumG, sumB, wsumR)
  }

  val BmpResampledSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("src_w", LongType, nullable = false),
    StructField("src_h", LongType, nullable = false),
    StructField("out_w", LongType, nullable = false),
    StructField("out_h", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("wsum_r", LongType, nullable = false)))

  /** Partition-batched REAL resample over a BMP binary column — decode +
    * nearest-neighbor downscale in one pass, same iterator shape as
    * [[decodeBmp]]. */
  def resampleBmp(withPayload: DataFrame, idCol: String, maxDim: Int = 16): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = bmpResample(r.getAs[Array[Byte]](1), maxDim)
        Row(r.getLong(0), s.srcW.toLong, s.srcH.toLong, s.outW.toLong, s.outH.toLong,
          s.sumR, s.sumG, s.sumB, s.wsumR)
      })
    spark.createDataFrame(rdd, BmpResampledSchema)
  }

  /** Partition-batched REAL decode over a WAV binary column — the audio twin
    * of [[decodeBmp]], same iterator shape as [[decodeStub]]. */
  def decodeWav(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = wavDecode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.channels.toLong, s.sampleRate.toLong, s.nFrames,
          s.durationMs, s.sumAbs, s.energy, s.wsumC0)
      })
    spark.createDataFrame(rdd, WavDecodedSchema)
  }

  /** Channel-0 audio features: zero-crossing count (sign flips between
    * consecutive samples, zeros transparent — the classic voiced/unvoiced
    * and noisiness signal), peak absolute amplitude, and the signed DC-
    * offset sum Σs(i,0) (a nonzero DC bias flags a broken recording
    * chain). All integers off the decoded samples — exactly recomputable
    * from the fixture formula. */
  final case class WavFeatureStats(
      channels: Int, sampleRate: Int, nFrames: Long,
      zcrC0: Long, peakAbs: Long, dcSumC0: Long)

  /** Feature-extract a PCM16 WAV without materializing the sample array:
    * one pass over the data chunk, O(1) state. */
  def wavFeatures(bytes: Array[Byte]): WavFeatureStats = {
    val h = wavHeader(bytes)
    var zcr = 0L; var peak = 0L; var dc = 0L
    var prevSign = 0
    var f = 0
    while (f < h.nFrames) {
      var ch = 0
      while (ch < h.channels) {
        val v = wavSample(bytes, h, f, ch)
        val a = math.abs(v).toLong
        if (a > peak) peak = a
        if (ch == 0) {
          dc += v
          val s = Integer.signum(v)
          if (s != 0) {
            if (prevSign != 0 && s != prevSign) zcr += 1
            prevSign = s
          }
        }
        ch += 1
      }
      f += 1
    }
    WavFeatureStats(h.channels, h.sampleRate, h.nFrames.toLong, zcr, peak, dc)
  }

  val WavFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("zcr_c0", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("dc_sum_c0", LongType, nullable = false)))

  /** Windowed frame-energy voice-activity detection over PCM16 — the
    * drop-the-silence curation cut for audio corpora (the gopher-battery
    * analogue for sound): per `windowFrames`-frame window, the summed
    * squared sample energy across ALL channels, flagged voiced when the
    * mean square clears `thrMeanSq`. Pure integer (energy ≤
    * 32768²·window·channels ≈ 2³¹ per window — BIGINT-safe by orders of
    * magnitude), so the decision is bit-portable. Returns (win, n_samples,
    * energy, voiced) tuples via the same chunk-walking parser as
    * [[wavFeatures]]. */
  def wavVad(bytes: Array[Byte], windowFrames: Int,
      thrMeanSq: Long): Array[(Long, Long, Long, Long)] = {
    require(windowFrames >= 1, "windowFrames must be positive")
    val h = wavHeader(bytes)
    val nWin = (h.nFrames + windowFrames - 1) / windowFrames
    val nSamples = new Array[Long](nWin)
    val energy = new Array[Long](nWin)
    var f = 0
    while (f < h.nFrames) {
      val w = f / windowFrames
      var ch = 0
      while (ch < h.channels) {
        val v = wavSample(bytes, h, f, ch).toLong
        energy(w) += v * v
        nSamples(w) += 1L
        ch += 1
      }
      f += 1
    }
    Array.tabulate(nWin) { w =>
      (w.toLong, nSamples(w), energy(w),
        if (energy(w) >= thrMeanSq * nSamples(w)) 1L else 0L)
    }
  }

  val WavVadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("win", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("voiced", LongType, nullable = false)))

  /** Partition-batched VAD over a WAV binary column, exploded per window. */
  def vadWav(withPayload: DataFrame, idCol: String,
      windowFrames: Int = 64, thrMeanSq: Long = 1330000L): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.flatMap { r =>
        wavVad(r.getAs[Array[Byte]](1), windowFrames, thrMeanSq).iterator.map {
          case (w, n, e, v) => Row(r.getLong(0), w, n, e, v)
        }
      })
    spark.createDataFrame(rdd, WavVadSchema)
  }

  /** ViT-style patch grid over a decoded BMP: the image splits into
    * `patch`×`patch` pixel tiles (edge tiles smaller) and each reports its
    * pixel count and truncating-mean ITU-601 luma in MILLI units — the
    * patch-embedding front half of a vision-transformer ingest (the
    * per-patch linear projection consumes exactly this grid), and the
    * blur/blank-TILE detector a whole-image histogram can't localize.
    * Integer throughout: per-patch Σ(299r+587g+114b) div n. */
  def bmpPatches(bytes: Array[Byte], patch: Int): Array[(Long, Long, Long, Long)] = {
    require(patch >= 1, "patch must be positive")
    val hdr = bmpHeader(bytes)
    val pw = (hdr.width + patch - 1) / patch
    val ph = (hdr.height + patch - 1) / patch
    val n = new Array[Long](pw * ph)
    val s = new Array[Long](pw * ph)
    var y = 0
    while (y < hdr.height) {
      val srcRow = if (hdr.bottomUp) hdr.height - 1 - y else y
      val rowOff = hdr.pixelOff + srcRow * hdr.stride
      var x = 0
      while (x < hdr.width) {
        val o = rowOff + 3 * x
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        val i = (y / patch) * pw + (x / patch)
        s(i) += (299L * r + 587L * g + 114L * b)
        n(i) += 1L
        x += 1
      }
      y += 1
    }
    Array.tabulate(pw * ph) { i =>
      ((i / pw).toLong, (i % pw).toLong, n(i), s(i) / n(i))
    }
  }

  val BmpPatchSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("py", LongType, nullable = false),
    StructField("px", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("mean_luma_milli", LongType, nullable = false)))

  /** Sharpness/blur moments: the 5-point Laplacian response over the
    * 601-luma (milli) grid, interior pixels only — Laplacian VARIANCE is
    * the classic blur detector (blur kills edges, so the second derivative
    * collapses toward 0; a corpus of decode-garbled or out-of-focus images
    * scores near zero). Emitted as exact integer moments (n, Σlap, Σlap²)
    * so the variance derives downstream and the statistic hash-matches the
    * oracle's pixel-formula recomputation. |lap| ≤ 4·255000 ⇒ lap² ≤
    * ~1.05e12 — the Σlap² long bound holds to ~8.7e6 interior pixels per
    * image (a 3000×3000 frame). */
  def bmpLaplacian(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val hdr = bmpHeader(bytes)
    val w = hdr.width
    val h = hdr.height
    val lum = new Array[Long](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (hdr.bottomUp) h - 1 - y else y
      val rowOff = hdr.pixelOff + srcRow * hdr.stride
      var x = 0
      while (x < w) {
        val o = rowOff + 3 * x
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        lum(y * w + x) = 299L * r + 587L * g + 114L * b
        x += 1
      }
      y += 1
    }
    var n = 0L
    var s1 = 0L
    var s2 = 0L
    y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val lap = 4L * lum(y * w + x) - lum(y * w + x - 1) - lum(y * w + x + 1) -
          lum((y - 1) * w + x) - lum((y + 1) * w + x)
        n += 1L
        s1 += lap
        s2 += lap * lap
        x += 1
      }
      y += 1
    }
    (w.toLong, h.toLong, n, s1, s2)
  }

  val BmpBlurSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_int", LongType, nullable = false),
    StructField("sum_lap", LongType, nullable = false),
    StructField("sum_lap2", LongType, nullable = false)))

  /** Partition-batched Laplacian blur moments over a BMP binary column. */
  def blurScoreBmp(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val (w, h, n, s1, s2) = bmpLaplacian(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w, h, n, s1, s2)
      })
    spark.createDataFrame(rdd, BmpBlurSchema)
  }

  /** Partition-batched patch grids over a BMP binary column. */
  def patchifyBmp(withPayload: DataFrame, idCol: String, patch: Int = 8): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.flatMap { r =>
        bmpPatches(r.getAs[Array[Byte]](1), patch).iterator.map {
          case (py, px, np, m) => Row(r.getLong(0), py, px, np, m)
        }
      })
    spark.createDataFrame(rdd, BmpPatchSchema)
  }

  /** Partition-batched audio feature extraction over a WAV binary column. */
  def audioFeatures(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = wavFeatures(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.channels.toLong, s.sampleRate.toLong, s.nFrames,
          s.zcrC0, s.peakAbs, s.dcSumC0)
      })
    spark.createDataFrame(rdd, WavFeatureSchema)
  }

  /** Resampled-audio statistics over the decimated frames (same exactness
    * contract as [[WavStats]]: order-free integer sums + the interleave-
    * sensitive weighted channel-0 sum, weights over OUTPUT frame indices). */
  final case class WavResampleStats(
      channels: Int, srcRate: Int, outRate: Int, srcFrames: Long,
      outFrames: Long, sumAbs: Long, energy: Long, wsumC0: Long)

  /** REAL audio downsampling: nearest-frame decimation of a PCM16 WAV to
    * `targetRate` — output frame i reads source frame `i·srcFrames div
    * outFrames` with `outFrames = srcFrames·outRate div srcRate`, the same
    * truncating-division mapping as [[bmpResample]], so every resampled
    * statistic is exactly recomputable from the sample formula. Never
    * upsamples (`outRate = min(target, src)` — identity at or below the
    * target, the fit-within contract). Touches only the sampled frames'
    * bytes; all channels of a kept frame are kept (no remix). */
  def wavResample(bytes: Array[Byte], targetRate: Int): WavResampleStats = {
    require(targetRate > 0, "targetRate must be positive")
    val h = wavHeader(bytes)
    val outRate = math.min(targetRate, h.sampleRate)
    val outFrames = (h.nFrames.toLong * outRate / h.sampleRate).toInt
    var sumAbs = 0L; var energy = 0L; var wsumC0 = 0L
    var i = 0
    while (i < outFrames) {
      val src = (i.toLong * h.nFrames / outFrames).toInt
      var ch = 0
      while (ch < h.channels) {
        val v = wavSample(bytes, h, src, ch)
        sumAbs += math.abs(v)
        energy += v.toLong * v
        if (ch == 0) wsumC0 += (i + 1).toLong * v
        ch += 1
      }
      i += 1
    }
    WavResampleStats(h.channels, h.sampleRate, outRate, h.nFrames.toLong,
      outFrames.toLong, sumAbs, energy, wsumC0)
  }

  val WavResampledSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("src_rate", LongType, nullable = false),
    StructField("out_rate", LongType, nullable = false),
    StructField("src_frames", LongType, nullable = false),
    StructField("out_frames", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("wsum_c0", LongType, nullable = false)))

  /** Partition-batched REAL downsampling over a WAV binary column — the
    * audio twin of [[resampleBmp]]. */
  def resampleWav(withPayload: DataFrame, idCol: String,
      targetRate: Int = 4000): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = wavResample(r.getAs[Array[Byte]](1), targetRate)
        Row(r.getLong(0), s.channels.toLong, s.srcRate.toLong, s.outRate.toLong,
          s.srcFrames, s.outFrames, s.sumAbs, s.energy, s.wsumC0)
      })
    spark.createDataFrame(rdd, WavResampledSchema)
  }

  // --- real codec: PNG (8-bit RGB, non-interlaced) --------------------------

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }
  private def getBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length); out.write(len)
    val tb = typ.getBytes("US-ASCII"); out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
    val cb = new Array[Byte](4); putBe32(cb, 0, crc.getValue.toInt); out.write(cb)
  }

  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG encoder (public spec RFC 2083): 8-bit truecolor RGB,
    * non-interlaced, zlib-deflated scanlines with per-row filters. Rows
    * deliberately CYCLE through all five filter types (None/Sub/Up/Average/
    * Paeth, `y % 5`) so the decoder's whole unfilter path is exercised by
    * every fixture, and each chunk carries its correct CRC32. */
  def pngEncode(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    val cur = new Array[Int](stride) // unfiltered current row
    val prev = new Array[Int](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        cur(3 * x) = r & 0xff; cur(3 * x + 1) = g & 0xff; cur(3 * x + 2) = b & 0xff
        x += 1
      }
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= 3) cur(i - 3) else 0
        val b = if (y > 0) prev(i) else 0
        val c = if (i >= 3 && y > 0) prev(i - 3) else 0
        val f = ft match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - (a + b) / 2
          case _ => cur(i) - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + i) = f.toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", comp.toByteArray)
    pngChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  final case class PngStats(width: Int, height: Int, channels: Int,
      sumR: Long, sumG: Long, sumB: Long, wsumR: Long)

  /** REAL PNG decoder: signature + chunk walk with CRC32 VERIFICATION,
    * IHDR parse (8-bit RGB non-interlaced only — anything else fails
    * loudly, the honest-codec contract), multi-IDAT zlib inflate, and full
    * scanline unfiltering (all five filter types incl. the Paeth
    * predictor). Same stats as the BMP decoder so any defect in filter
    * reversal, chunk walking or channel order breaks the formula oracle. */
  def pngDecode(bytes: Array[Byte]): PngStats = {
    val (width, height, px) = pngPixels(bytes)
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumR = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = 3 * (y * width + x)
        val r = px(o)
        sumR += r; sumG += px(o + 1); sumB += px(o + 2)
        wsumR += (y + 1).toLong * r
        x += 1
      }
      y += 1
    }
    PngStats(width, height, 3, sumR, sumG, sumB, wsumR)
  }

  /** Decode to a top-down packed RGB int array (full unfilter path). */
  private def pngPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 8 && (0 until 8).forall(i => bytes(i) == PngSig(i)),
      "not a PNG: bad signature")
    var off = 8
    var width = -1; var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "truncated PNG chunk header")
      val len = getBe32(bytes, off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      require(off + 12 + len <= bytes.length, s"truncated PNG chunk $typ")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == getBe32(bytes, off + 8 + len),
        s"PNG chunk $typ CRC mismatch")
      typ match {
        case "IHDR" =>
          width = getBe32(bytes, off + 8); height = getBe32(bytes, off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          val colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(bitDepth == 8 && colorType == 2 && interlace == 0,
            s"unsupported PNG variant (bitDepth=$bitDepth colorType=$colorType " +
              s"interlace=$interlace); this decoder covers 8-bit RGB non-interlaced")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(width > 0 && height > 0, "PNG missing IHDR")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    var filled = 0
    while (filled < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, filled, raw.length - filled)
      require(n > 0 || inflater.finished(), "PNG IDAT underflow")
      filled += n
    }
    inflater.end()
    require(filled == raw.length, s"PNG IDAT decoded $filled of ${raw.length} bytes")
    val px = new Array[Int](3 * width * height)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"bad PNG filter type $ft")
      var i = 0
      while (i < stride) {
        val f = raw(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= 3) cur(i - 3) else 0
        val b = if (y > 0) prev(i) else 0
        val c = if (i >= 3 && y > 0) prev(i - 3) else 0
        cur(i) = (ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case _ => f + paeth(a, b, c)
        }) & 0xff
        i += 1
      }
      System.arraycopy(cur, 0, px, y * stride, stride)
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    (width, height, px)
  }

  /** Nearest-neighbor fit-within downscale straight off the decoded PNG —
    * the same truncating-integer source mapping as [[bmpResample]]
    * (`sx = x·srcW div outW`), so the oracle re-derives the sampled
    * coordinates exactly. */
  /** [[bmpHistogram]]'s PNG twin: same integer ITU-R 601 luma bucketing
    * over the CRC-checked, inflated, unfiltered pixel stream. */
  def pngHistogram(bytes: Array[Byte], buckets: Int = 8): Array[Long] = {
    require(buckets >= 1 && buckets <= 256)
    val (w, h, px) = pngPixels(bytes)
    val out = new Array[Long](buckets)
    var i = 0
    val n = w * h
    while (i < n) {
      val o = 3 * i
      val lum = (299 * px(o) + 587 * px(o + 1) + 114 * px(o + 2)) / 1000
      out(lum * buckets / 256) += 1L
      i += 1
    }
    out
  }

  /** Partition-batched PNG luminance histograms, exploded like
    * [[histogramBmp]]. */
  def histogramPng(withPayload: DataFrame, idCol: String,
      buckets: Int = 8): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.flatMap { r =>
        val h = pngHistogram(r.getAs[Array[Byte]](1), buckets)
        h.iterator.zipWithIndex.map { case (n, b) => Row(r.getLong(0), b.toLong, n) }
      })
    spark.createDataFrame(rdd, BmpHistogramSchema)
  }

  def pngResample(bytes: Array[Byte], maxDim: Int): BmpResampleStats = {
    require(maxDim > 0)
    val (srcW, srcH, px) = pngPixels(bytes)
    val m = math.max(srcW, srcH)
    val outW = if (m <= maxDim) srcW else srcW * maxDim / m
    val outH = if (m <= maxDim) srcH else srcH * maxDim / m
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumR = 0L
    var y = 0
    while (y < outH) {
      val sy = y * srcH / outH
      var x = 0
      while (x < outW) {
        val sx = x * srcW / outW
        val o = 3 * (sy * srcW + sx)
        val r = px(o)
        sumR += r; sumG += px(o + 1); sumB += px(o + 2)
        wsumR += (y + 1).toLong * r
        x += 1
      }
      y += 1
    }
    BmpResampleStats(srcW, srcH, outW, outH, sumR, sumG, sumB, wsumR)
  }

  /** Partition-batched PNG resample — the PNG twin of [[resampleBmp]]. */
  def resamplePng(withPayload: DataFrame, idCol: String, maxDim: Int = 16): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = pngResample(r.getAs[Array[Byte]](1), maxDim)
        Row(r.getLong(0), s.srcW.toLong, s.srcH.toLong, s.outW.toLong, s.outH.toLong,
          s.sumR, s.sumG, s.sumB, s.wsumR)
      })
    spark.createDataFrame(rdd, BmpResampledSchema)
  }

  /** Deterministic PNG fixture per document (same contract as
    * [[bmpFixtures]], different formulas so the two codecs cannot share a
    * decode path unnoticed):
    *   w = 8 + id % 21, h = 8 + (id·5) % 21
    *   R = (2x + y + id) % 256, G = (x + 2y) % 256, B = (3x + y + id) % 256 */
  def pngFixtures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions(_.map { row =>
      val id = row.getLong(0)
      val w = (8 + id % 21).toInt
      val h = (8 + (id * 5) % 21).toInt
      val payload = pngEncode(w, h, (x, y) => (
        ((2 * x + y + id) % 256).toInt,
        ((x + 2 * y) % 256).toInt,
        ((3 * x + y + id) % 256).toInt))
      Row(id, payload)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /** Partition-batched REAL PNG decode — the third real codec beside BMP
    * and WAV; shares [[BmpDecodedSchema]] (same stat set). */
  def decodePng(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = pngDecode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.width.toLong, s.height.toLong, s.channels.toLong,
          s.sumR, s.sumG, s.sumB, s.wsumR)
      })
    spark.createDataFrame(rdd, BmpDecodedSchema)
  }

  // --- real codec: baseline JPEG (grayscale, sequential DCT) ----------------
  //
  // The fifth real codec: genuine ITU T.81 baseline JPEG — JFIF markers,
  // standard Annex-K quantization + Huffman tables, zigzag, DC differential
  // coding, byte stuffing, canonical Huffman decode, dequantization and an
  // integer IDCT over a QUANTIZED cosine basis (the mm_phash_dct trick:
  // fixed-point basis constants make the whole reconstruction exact integer
  // math, reproducible bit-for-bit by the SQL oracle for DC-only blocks and
  // by the property test for arbitrary blocks). Grayscale (one component) —
  // an honest, real-world subset of baseline JPEG; chroma subsampling adds
  // plumbing but no new decoding concepts.

  /** Annex-K luminance quantization table (zigzag-ORDER-free: natural
    * row-major order here; zigzagged at write). */
  private val JpegBaseQt: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Quality-scaled table (libjpeg formula; quality fixed at 75 for the
    * fixtures). */
  private[graft] def jpegQt(quality: Int): Array[Int] = {
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    JpegBaseQt.map { b =>
      val q = (b * scale + 50) / 100
      math.max(1, math.min(255, q))
    }
  }

  /** Zigzag scan order: zigzag(k) = natural index of the k-th coefficient. */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex-K standard Huffman tables (luminance): bits(i) = #codes of length
  // i+1, then the symbol values in code order.
  private val JpegDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val JpegAcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val JpegAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman code assignment: symbol -> (code, length). */
  private def jpegCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = bits(len - 1)
      while (n > 0) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; n -= 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val JpegDcEnc = jpegCodes(JpegDcBits, JpegDcVals)
  private lazy val JpegAcEnc = jpegCodes(JpegAcBits, JpegAcVals)

  /** Fixed-point cosine basis (13-bit, the libjpeg-class precision):
    * `JpegBasis(u)(x) = round(C(u)·cos((2x+1)uπ/16) · 8192)` with
    * C(0)=1/√2, C(u>0)=1. All IDCT/DCT arithmetic runs over these integer
    * constants, so reconstruction is exact integer math reproducible in
    * SQL (DC-only) and in the round-trip property (general blocks). */
  private[graft] val JpegBasis: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    math.floor(c * math.cos((2 * x + 1) * u * math.Pi / 16.0) * 8192.0 + 0.5).toLong
  }

  /** Integer IDCT of one dequantized block + level shift + clamp.
    * acc = ΣΣ F(u,v)·B(u,x)·B(v,y); pixel = acc/(4·8192²) rounded half-up,
    * via truncating division on a bias-shifted non-negative value (floor ==
    * truncate there; Spark `div`/DuckDB `//` truncate toward zero, so the
    * SQL twin is `(acc + 2^27 + 2^50) // 2^28 - 2^22 + 128`). */
  private[graft] def jpegIdct(f: Array[Long]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var v = 0
        while (v < 8) {
          var u = 0
          val bvy = JpegBasis(v)(y)
          while (u < 8) {
            val c = f(v * 8 + u)
            if (c != 0) acc += c * JpegBasis(u)(x) * bvy
            u += 1
          }
          v += 1
        }
        val p = ((acc + (1L << 27) + (1L << 50)) / (1L << 28)) - (1L << 22) + 128L
        out(y * 8 + x) = math.max(0L, math.min(255L, p)).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Forward integer DCT (encoder side): F(u,v) = round(ΣΣ (p−128)·B(u,x)·
    * B(v,y) / 2^28) — the exact adjoint of [[jpegIdct]]'s basis. */
  private[graft] def jpegFdct(px: Array[Int]): Array[Long] = {
    val out = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          val bvy = JpegBasis(v)(y)
          while (x < 8) {
            acc += (px(y * 8 + x) - 128).toLong * JpegBasis(u)(x) * bvy
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = ((acc + (1L << 27) + (1L << 50)) / (1L << 28)) - (1L << 22)
        u += 1
      }
      v += 1
    }
    out
  }

  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(value: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1-bits per T.81
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** Magnitude category (SSSS) of a coefficient. */
  private def jpegCategory(v: Long): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Encode a grayscale image as baseline JFIF. `pixel(x, y)` in [0,255];
    * partial edge blocks are padded by edge replication. Quality fixed by
    * `qt`. */
  def jpegEncode(width: Int, height: Int, pixel: (Int, Int) => Int,
      quality: Int = 75): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xffff && height <= 0xffff)
    // quality 0 divides by zero in the scale formula; quality >= ~96 drives
    // qt entries to 1, where coefficients can exceed the Annex-K Huffman
    // tables' magnitude categories (AC size <= 10, DC <= 11) mid-encode
    require(quality >= 1 && quality <= 95, s"jpeg quality must be in [1, 95], got $quality")
    val qt = jpegQt(quality)
    val out = new java.io.ByteArrayOutputStream(1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xdb, (Array(0) ++ (0 until 64).map(k => qt(JpegZigzag(k)))).map(_.toByte)) // DQT
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0).map(_.toByte)) // SOF0: 8-bit, 1 component, no subsampling
    seg(0xc4, (Array(0x00) ++ JpegDcBits ++ JpegDcVals).map(_.toByte)) // DHT DC
    seg(0xc4, (Array(0x10) ++ JpegAcBits ++ JpegAcVals).map(_.toByte)) // DHT AC
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte)) // SOS
    val bw = new JpegBitWriter(out)
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    var prevDc = 0L
    val block = new Array[Int](64)
    for (b <- 0 until bx * by) {
      val x0 = (b % bx) * 8
      val y0 = (b / bx) * 8
      var i = 0
      while (i < 64) {
        val x = math.min(x0 + i % 8, width - 1)
        val y = math.min(y0 + i / 8, height - 1)
        block(i) = pixel(x, y) & 0xff
        i += 1
      }
      val f = jpegFdct(block)
      val fq = new Array[Long](64)
      var k = 0
      while (k < 64) { // round-half-up quantization, IEEE-exact double div
        val nat = JpegZigzag(k)
        fq(k) = math.floor(f(nat).toDouble / qt(nat) + 0.5).toLong
        k += 1
      }
      // DC: category + offset bits of the differential
      val diff = fq(0) - prevDc
      prevDc = fq(0)
      val t = jpegCategory(diff)
      val (dcode, dlen) = JpegDcEnc(t)
      bw.write(dcode, dlen)
      if (t > 0)
        bw.write((if (diff < 0) diff + (1L << t) - 1 else diff).toInt, t)
      // AC: run-length of zeros + category, ZRL for 16, EOB at end
      var lastNz = 63
      while (lastNz >= 1 && fq(lastNz) == 0) lastNz -= 1
      var run = 0
      k = 1
      while (k <= lastNz) {
        if (fq(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = JpegAcEnc(0xf0); bw.write(c, l); run -= 16 }
          val sz = jpegCategory(fq(k))
          val (c, l) = JpegAcEnc((run << 4) | sz)
          bw.write(c, l)
          bw.write((if (fq(k) < 0) fq(k) + (1L << sz) - 1 else fq(k)).toInt, sz)
          run = 0
        }
        k += 1
      }
      if (lastNz < 63) { val (c, l) = JpegAcEnc(0x00); bw.write(c, l) }
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman decode tables: per code length, the smallest code,
    * largest code and index of its first symbol (T.81 F.2.2.3). */
  private final class JpegHuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        } else maxCode(len) = -1
        code <<= 1
      }
    }
  }

  private final class JpegBitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val nxt = bytes(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException(
            f"jpeg: unexpected marker 0xff$nxt%02x inside entropy data")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def decode(t: JpegHuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | readBit()
        len += 1
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.values(t.valPtr(len) + code - t.minCode(len))
      }
      throw new IllegalArgumentException("jpeg: invalid Huffman code")
    }
  }

  final case class JpegStats(width: Int, height: Int, channels: Int,
      sumLuma: Long, wsumLuma: Long)

  /** Decode a baseline grayscale JFIF stream and return pixel-level stats
    * computed over the TRUE w×h region (edge-block padding excluded).
    * Walks markers, reads DQT/SOF0/DHT/SOS, entropy-decodes every MCU with
    * canonical Huffman + DC prediction, dequantizes and reconstructs via
    * the integer IDCT. */
  def jpegDecode(bytes: Array[Byte]): JpegStats = {
    val (w, h, px) = jpegPixels(bytes)
    var sum = 0L
    var wsum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        sum += p
        wsum += (y + 1).toLong * p
        x += 1
      }
      y += 1
    }
    JpegStats(w, h, 1, sum, wsum)
  }

  /** Full pixel decode (row-major luma) — shared by [[jpegDecode]] and the
    * round-trip property test. */
  private[graft] def jpegPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG (no SOI)")
    var pos = 2
    var qt: Array[Int] = null
    var dcT: JpegHuffTable = null
    var acT: JpegHuffTable = null
    var w = 0
    var h = 0
    var sosAt = -1
    while (sosAt < 0) {
      require((bytes(pos) & 0xff) == 0xff, f"jpeg: expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      val body = pos + 4
      m match {
        case 0xdb =>
          require((bytes(body) & 0xff) == 0, "jpeg: only 8-bit qt id 0 supported")
          qt = new Array[Int](64)
          for (k <- 0 until 64) qt(JpegZigzag(k)) = bytes(body + 1 + k) & 0xff
        case 0xc0 =>
          require((bytes(body) & 0xff) == 8, "jpeg: 8-bit precision only")
          h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
          w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
          require((bytes(body + 5) & 0xff) == 1, "jpeg: grayscale (1 component) only")
          require((bytes(body + 7) & 0xff) == 0x11, "jpeg: no subsampling expected")
        case 0xc4 =>
          val cls = (bytes(body) & 0xff) >> 4
          val bits = Array.tabulate(16)(i => bytes(body + 1 + i) & 0xff)
          val n = bits.sum
          val vals = Array.tabulate(n)(i => bytes(body + 17 + i) & 0xff)
          val t = new JpegHuffTable(bits, vals)
          if (cls == 0) dcT = t else acT = t
        case 0xda => sosAt = body + (bytes(body) & 0xff) * 2 + 1 + 3
        case 0xc2 => throw new IllegalArgumentException("jpeg: progressive not supported")
        case _ => () // APPn/COM: skip
      }
      if (sosAt < 0) pos += 2 + len
    }
    require(qt != null && dcT != null && acT != null && w > 0 && h > 0,
      "jpeg: missing DQT/DHT/SOF0 before SOS")
    val br = new JpegBitReader(bytes, sosAt)
    val bx = (w + 7) / 8
    val by = (h + 7) / 8
    val px = new Array[Int](w * h)
    var prevDc = 0L
    val f = new Array[Long](64)
    for (b <- 0 until bx * by) {
      java.util.Arrays.fill(f, 0L)
      val t = br.decode(dcT)
      val diff =
        if (t == 0) 0L
        else {
          val v = br.readBits(t)
          if (v < (1 << (t - 1))) v.toLong - (1L << t) + 1 else v.toLong
        }
      prevDc += diff
      f(0) = prevDc * qt(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = br.decode(acT)
        if (rs == 0x00) eob = true
        else if (rs == 0xf0) k += 16
        else {
          k += rs >> 4
          require(k < 64, "jpeg: AC run past block end")
          val sz = rs & 0x0f
          val v = br.readBits(sz)
          val c = if (v < (1 << (sz - 1))) v.toLong - (1L << sz) + 1 else v.toLong
          f(JpegZigzag(k)) = c * qt(JpegZigzag(k))
          k += 1
        }
      }
      val rec = jpegIdct(f)
      val x0 = (b % bx) * 8
      val y0 = (b / bx) * 8
      var yy = 0
      while (yy < 8 && y0 + yy < h) {
        var xx = 0
        while (xx < 8 && x0 + xx < w) {
          px((y0 + yy) * w + (x0 + xx)) = rec(yy * 8 + xx)
          xx += 1
        }
        yy += 1
      }
    }
    (w, h, px)
  }

  /** Deterministic JPEG fixtures: dims are integer functions of the id, and
    * the luma is CONSTANT PER 8×8 BLOCK — `v(bx, by) = (17·bx + 29·by + id)
    * % 256`. Constant blocks put ALL signal in the DC coefficient, whose
    * encode→decode path (fdct → quantize → Huffman DC chain → dequantize →
    * idct) stays closed-form integer math the SQL oracle re-derives exactly;
    * the AC/Huffman machinery is exercised by the arbitrary-block round-trip
    * property (the GIF lesson: fixtures alone sample bit-level codecs too
    * thinly). Edge replication keeps partial blocks constant too. */
  def jpegFixtures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions(_.map { row =>
      val id = row.getLong(0)
      val w = (8 + id % 21).toInt
      val h = (8 + (id * 5) % 21).toInt
      val payload = jpegEncode(w, h,
        (x, y) => ((17 * (x / 8) + 29 * (y / 8) + id) % 256).toInt)
      Row(id, payload)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  val JpegDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sum_luma", LongType, nullable = false),
    StructField("wsum_luma", LongType, nullable = false)))

  final case class JpegResampleStats(srcW: Int, srcH: Int, outW: Int, outH: Int,
      sumLuma: Long, wsumLuma: Long)

  /** Decode + nearest-neighbor fit-within downscale in one pass over the
    * JPEG bytes (truncating `x·srcW div outW` source mapping — the same
    * integer geometry as [[bmpResample]]/[[pngResample]], no upscale). */
  def jpegResample(bytes: Array[Byte], maxDim: Int): JpegResampleStats = {
    require(maxDim > 0)
    val (w, h, px) = jpegPixels(bytes)
    val m = math.max(w, h)
    val outW = if (m <= maxDim) w else w * maxDim / m
    val outH = if (m <= maxDim) h else h * maxDim / m
    var sum = 0L
    var wsum = 0L
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val p = px(sy * w + (x * w / outW))
        sum += p
        wsum += (y + 1).toLong * p
        x += 1
      }
      y += 1
    }
    JpegResampleStats(w, h, outW, outH, sum, wsum)
  }

  val JpegResampledSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("src_w", LongType, nullable = false),
    StructField("src_h", LongType, nullable = false),
    StructField("out_w", LongType, nullable = false),
    StructField("out_h", LongType, nullable = false),
    StructField("sum_luma", LongType, nullable = false),
    StructField("wsum_luma", LongType, nullable = false)))

  /** Partition-batched REAL JPEG resample — same iterator shape as
    * [[resampleBmp]]/[[resamplePng]]. */
  def resampleJpeg(withPayload: DataFrame, idCol: String, maxDim: Int = 16): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = jpegResample(r.getAs[Array[Byte]](1), maxDim)
        Row(r.getLong(0), s.srcW.toLong, s.srcH.toLong, s.outW.toLong, s.outH.toLong,
          s.sumLuma, s.wsumLuma)
      })
    spark.createDataFrame(rdd, JpegResampledSchema)
  }

  /** Partition-batched REAL JPEG decode — the fifth real codec. */
  def decodeJpeg(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = jpegDecode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.width.toLong, s.height.toLong, s.channels.toLong,
          s.sumLuma, s.wsumLuma)
      })
    spark.createDataFrame(rdd, JpegDecodedSchema)
  }

  // ----- color baseline JPEG (r12): 3-component YCbCr with 4:2:0 chroma -----

  /** Integer color-space contract, pinned so encoder, decoder AND the SQL
    * oracle share one arithmetic (every dividend is biased NONNEGATIVE so
    * `>> 16` == truncating division in Scala, Spark `div` and DuckDB `//`
    * alike — floor-vs-truncate on negatives never arises):
    *   Y  = (19595·R + 38470·G +  7471·B + 32768) >> 16
    *   Cb = clamp((−11059·R − 21709·G + 32768·B + 32768 + 8388608) >> 16)
    *   Cr = clamp((32768·R − 27439·G −  5329·B + 32768 + 8388608) >> 16)
    *   R  = clamp(Y + ((91881·Cr′ + 32768 + 16777216) >> 16) − 256)
    *   G  = clamp(Y − ((22554·Cb′ + 46802·Cr′ + 32768 + 33554432) >> 16) + 512)
    *   B  = clamp(Y + ((116130·Cb′ + 32768 + 16777216) >> 16) − 256)
    * with Cb′ = Cb − 128, Cr′ = Cr − 128 (the JFIF BT.601 matrix in 16-bit
    * fixed point, round-half-up via the +32768 term). */
  private[graft] def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def cl(v: Int) = math.min(255, math.max(0, v))
    val y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    val cb = cl((-11059 * r - 21709 * g + 32768 * b + 32768 + 8388608) >> 16)
    val cr = cl((32768 * r - 27439 * g - 5329 * b + 32768 + 8388608) >> 16)
    (cl(y), cb, cr)
  }

  private[graft] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Int) = math.min(255, math.max(0, v))
    val cbp = cb - 128
    val crp = cr - 128
    val r = y + ((91881 * crp + 32768 + 16777216) >> 16) - 256
    val g = y - ((22554 * cbp + 46802 * crp + 32768 + 33554432) >> 16) + 512
    val b = y + ((116130 * cbp + 32768 + 16777216) >> 16) - 256
    (cl(r), cl(g), cl(b))
  }

  /** Encode an RGB image as baseline 3-component YCbCr JFIF with 4:2:0
    * chroma (Y sampled 2×2, Cb/Cr 1×1 — the ubiquitous web-JPEG layout).
    * Chroma subsampling PICKS the top-left sample of each 2×2 (documented
    * deterministic choice; averaging is an encoder freedom T.81 does not
    * mandate). One shared quant table and one shared DC/AC Huffman pair
    * (Annex K) serve all components. MCUs are 16×16: four Y blocks in
    * raster order, then Cb, then Cr, with per-component DC prediction. */
  def jpegEncodeColor(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int),
      quality: Int = 75): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xffff && height <= 0xffff)
    require(quality >= 1 && quality <= 95, s"jpeg quality must be in [1, 95], got $quality")
    val qt = jpegQt(quality)
    val out = new java.io.ByteArrayOutputStream(4096)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8)
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, (Array(0) ++ (0 until 64).map(k => qt(JpegZigzag(k)))).map(_.toByte))
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0).map(_.toByte)) // SOF0: Y 2x2, Cb/Cr 1x1
    seg(0xc4, (Array(0x00) ++ JpegDcBits ++ JpegDcVals).map(_.toByte))
    seg(0xc4, (Array(0x10) ++ JpegAcBits ++ JpegAcVals).map(_.toByte))
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0).map(_.toByte))
    val bw = new JpegBitWriter(out)
    val block = new Array[Int](64)
    val crBlock = new Array[Int](64)
    var prevY = 0L
    var prevCb = 0L
    var prevCr = 0L
    def writeBlock(prevDc: Long): Long = {
      val f = jpegFdct(block)
      val fq = new Array[Long](64)
      var k = 0
      while (k < 64) {
        val nat = JpegZigzag(k)
        fq(k) = math.floor(f(nat).toDouble / qt(nat) + 0.5).toLong
        k += 1
      }
      val diff = fq(0) - prevDc
      val t = jpegCategory(diff)
      val (dcode, dlen) = JpegDcEnc(t)
      bw.write(dcode, dlen)
      if (t > 0)
        bw.write((if (diff < 0) diff + (1L << t) - 1 else diff).toInt, t)
      var lastNz = 63
      while (lastNz >= 1 && fq(lastNz) == 0) lastNz -= 1
      var run = 0
      k = 1
      while (k <= lastNz) {
        if (fq(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = JpegAcEnc(0xf0); bw.write(c, l); run -= 16 }
          val sz = jpegCategory(fq(k))
          val (c, l) = JpegAcEnc((run << 4) | sz)
          bw.write(c, l)
          bw.write((if (fq(k) < 0) fq(k) + (1L << sz) - 1 else fq(k)).toInt, sz)
          run = 0
        }
        k += 1
      }
      if (lastNz < 63) { val (c, l) = JpegAcEnc(0x00); bw.write(c, l) }
      fq(0)
    }
    def yAt(x: Int, y: Int): Int = {
      val (r, g, b) = rgb(math.min(x, width - 1), math.min(y, height - 1))
      rgbToYcc(r, g, b)._1
    }
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    def chromaAt(cx: Int, cy: Int): (Int, Int) = {
      // top-left pick of the 2x2, edge-replicated past the chroma plane
      val sx = math.min(cx, cw - 1) * 2
      val sy = math.min(cy, ch - 1) * 2
      val (r, g, b) = rgb(math.min(sx, width - 1), math.min(sy, height - 1))
      val (_, cb, cr) = rgbToYcc(r, g, b)
      (cb, cr)
    }
    val mx = (width + 15) / 16
    val my = (height + 15) / 16
    for (m <- 0 until mx * my) {
      val x0 = (m % mx) * 16
      val y0 = (m / mx) * 16
      for (yb <- 0 until 4) {
        val bx0 = x0 + (yb % 2) * 8
        val by0 = y0 + (yb / 2) * 8
        var i = 0
        while (i < 64) { block(i) = yAt(bx0 + i % 8, by0 + i / 8); i += 1 }
        prevY = writeBlock(prevY)
      }
      val cx0 = (m % mx) * 8
      val cy0 = (m / mx) * 8
      // one chromaAt per position fills both planes (rgb() + the 3x3
      // matrix are the cost; discarding one component doubled both)
      var i = 0
      while (i < 64) {
        val (cb, cr) = chromaAt(cx0 + i % 8, cy0 + i / 8)
        block(i) = cb; crBlock(i) = cr
        i += 1
      }
      prevCb = writeBlock(prevCb)
      System.arraycopy(crBlock, 0, block, 0, 64)
      prevCr = writeBlock(prevCr)
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

  /** Full color decode: parse markers (multiple quant/Huffman tables per
    * segment, per-component table refs), entropy-decode interleaved 16×16
    * MCUs (4 Y + Cb + Cr, per-component DC chains), reconstruct planes via
    * the integer IDCT, upsample chroma by 2×2 replication (the integer
    * 4:2:0 upsampler matching the encoder's top-left pick), and convert
    * through the pinned YCbCr→RGB fixed-point matrix. Refuses progressive
    * and non-4:2:0 sampling loudly. */
  private[graft] def jpegPixelsColor(bytes: Array[Byte]): (Int, Int, Array[Int], Array[Int], Array[Int]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG (no SOI)")
    var pos = 2
    val qts = new Array[Array[Int]](4)
    val dcTs = new Array[JpegHuffTable](4)
    val acTs = new Array[JpegHuffTable](4)
    var w = 0
    var h = 0
    // per component (3): id, qt id, dc table id, ac table id
    val compQt = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    val compId = new Array[Int](3)
    var sosAt = -1
    while (sosAt < 0) {
      require((bytes(pos) & 0xff) == 0xff, f"jpeg: expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      val body = pos + 4
      m match {
        case 0xdb =>
          var p = body
          while (p < pos + 2 + len) {
            require((bytes(p) & 0xf0) == 0, "jpeg: only 8-bit quant tables supported")
            val id = bytes(p) & 0x0f
            val t = new Array[Int](64)
            for (k <- 0 until 64) t(JpegZigzag(k)) = bytes(p + 1 + k) & 0xff
            qts(id) = t
            p += 65
          }
        case 0xc0 =>
          require((bytes(body) & 0xff) == 8, "jpeg: 8-bit precision only")
          h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
          w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
          require((bytes(body + 5) & 0xff) == 3,
            "jpeg: color path needs 3 components (use jpegDecode for grayscale)")
          for (c <- 0 until 3) {
            compId(c) = bytes(body + 6 + c * 3) & 0xff
            val samp = bytes(body + 7 + c * 3) & 0xff
            require(samp == (if (c == 0) 0x22 else 0x11),
              f"jpeg: only 4:2:0 sampling supported (component $c has 0x$samp%02x)")
            compQt(c) = bytes(body + 8 + c * 3) & 0xff
          }
        case 0xc4 =>
          var p = body
          while (p < pos + 2 + len) {
            val cls = (bytes(p) & 0xff) >> 4
            val id = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val t = new JpegHuffTable(bits, vals)
            if (cls == 0) dcTs(id) = t else acTs(id) = t
            p += 17 + n
          }
        case 0xda =>
          require((bytes(body) & 0xff) == 3, "jpeg: SOS must carry 3 components")
          for (c <- 0 until 3) {
            require((bytes(body + 1 + c * 2) & 0xff) == compId(c), "jpeg: SOS order != SOF order")
            compDc(c) = (bytes(body + 2 + c * 2) & 0xff) >> 4
            compAc(c) = bytes(body + 2 + c * 2) & 0x0f
          }
          sosAt = body + 1 + 6 + 3
        case 0xc2 => throw new IllegalArgumentException("jpeg: progressive not supported")
        case _ => ()
      }
      if (sosAt < 0) pos += 2 + len
    }
    require(w > 0 && h > 0, "jpeg: missing SOF0 before SOS")
    for (c <- 0 until 3) {
      require(qts(compQt(c)) != null, s"jpeg: component $c references missing quant table")
      require(dcTs(compDc(c)) != null && acTs(compAc(c)) != null,
        s"jpeg: component $c references missing Huffman table")
    }
    val br = new JpegBitReader(bytes, sosAt)
    val mx = (w + 15) / 16
    val my = (h + 15) / 16
    val yW = mx * 16
    val cwP = mx * 8
    val yPlane = new Array[Int](yW * my * 16)
    val cbPlane = new Array[Int](cwP * my * 8)
    val crPlane = new Array[Int](cwP * my * 8)
    val prevDc = new Array[Long](3)
    val f = new Array[Long](64)
    def readBlock(comp: Int): Array[Int] = {
      java.util.Arrays.fill(f, 0L)
      val qt = qts(compQt(comp))
      val t = br.decode(dcTs(compDc(comp)))
      val diff =
        if (t == 0) 0L
        else {
          val v = br.readBits(t)
          if (v < (1 << (t - 1))) v.toLong - (1L << t) + 1 else v.toLong
        }
      prevDc(comp) += diff
      f(0) = prevDc(comp) * qt(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = br.decode(acTs(compAc(comp)))
        if (rs == 0x00) eob = true
        else if (rs == 0xf0) k += 16
        else {
          k += rs >> 4
          require(k < 64, "jpeg: AC run past block end")
          val sz = rs & 0x0f
          val v = br.readBits(sz)
          val c = if (v < (1 << (sz - 1))) v.toLong - (1L << sz) + 1 else v.toLong
          f(JpegZigzag(k)) = c * qt(JpegZigzag(k))
          k += 1
        }
      }
      jpegIdct(f)
    }
    for (m <- 0 until mx * my) {
      val x0 = (m % mx) * 16
      val y0 = (m / mx) * 16
      for (yb <- 0 until 4) {
        val rec = readBlock(0)
        val bx0 = x0 + (yb % 2) * 8
        val by0 = y0 + (yb / 2) * 8
        var i = 0
        while (i < 64) { yPlane((by0 + i / 8) * yW + bx0 + i % 8) = rec(i); i += 1 }
      }
      val cx0 = (m % mx) * 8
      val cy0 = (m / mx) * 8
      val recCb = readBlock(1)
      val recCr = readBlock(2)
      var i = 0
      while (i < 64) {
        cbPlane((cy0 + i / 8) * cwP + cx0 + i % 8) = recCb(i)
        crPlane((cy0 + i / 8) * cwP + cx0 + i % 8) = recCr(i)
        i += 1
      }
    }
    val rA = new Array[Int](w * h)
    val gA = new Array[Int](w * h)
    val bA = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = yccToRgb(
          yPlane(y * yW + x), cbPlane((y / 2) * cwP + x / 2), crPlane((y / 2) * cwP + x / 2))
        rA(y * w + x) = r; gA(y * w + x) = g; bA(y * w + x) = b
        x += 1
      }
      y += 1
    }
    (w, h, rA, gA, bA)
  }

  final case class JpegColorStats(width: Int, height: Int, channels: Int,
      sumR: Long, sumG: Long, sumB: Long, wsumR: Long)

  def jpegDecodeColor(bytes: Array[Byte]): JpegColorStats = {
    val (w, h, r, g, b) = jpegPixelsColor(bytes)
    var sr = 0L
    var sg = 0L
    var sb = 0L
    var wr = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        sr += r(i); sg += g(i); sb += b(i)
        wr += (y + 1).toLong * r(i)
        x += 1
      }
      y += 1
    }
    JpegColorStats(w, h, 3, sr, sg, sb, wr)
  }

  /** Color JPEG fixtures: dims integer functions of the id; RGB CONSTANT
    * PER 16×16 MCU — `(r,g,b)(mx,my) = ((17mx+29my+id)%256, (23mx+31my+2id)%256,
    * (13mx+37my+3id)%256)`. A constant MCU keeps every component DC-only
    * (Y constant over its 4 blocks, chroma constant) so the full color
    * chain — RGB→YCbCr, 4:2:0 pick, DC quantize chain, IDCT, 2×2 upsample,
    * YCbCr→RGB — is closed-form per MCU for the oracle; AC/Huffman and
    * mixed-content paths ride the arbitrary-grid round-trip property. */
  def jpegColorFixtures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions(_.map { row =>
      val id = row.getLong(0)
      val w = (16 + id % 19).toInt
      val h = (16 + (id * 7) % 19).toInt
      val payload = jpegEncodeColor(w, h, (x, y) => {
        val mx = x / 16
        val my = y / 16
        (((17 * mx + 29 * my + id) % 256).toInt,
          ((23 * mx + 31 * my + 2 * id) % 256).toInt,
          ((13 * mx + 37 * my + 3 * id) % 256).toInt)
      })
      Row(id, payload)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  val JpegColorDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("wsum_r", LongType, nullable = false)))

  def decodeJpegColor(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = jpegDecodeColor(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.width.toLong, s.height.toLong, s.channels.toLong,
          s.sumR, s.sumG, s.sumB, s.wsumR)
      })
    spark.createDataFrame(rdd, JpegColorDecodedSchema)
  }

  final case class JpegColorResampleStats(srcW: Int, srcH: Int, outW: Int, outH: Int,
      sumR: Long, sumG: Long, sumB: Long, wsumR: Long)

  /** Color decode + nearest-neighbor fit-within downscale in one pass —
    * the same truncating `x·srcW div outW` geometry as the grayscale
    * [[jpegResample]], applied after the full YCbCr→RGB reconstruction. */
  def jpegResampleColor(bytes: Array[Byte], maxDim: Int): JpegColorResampleStats = {
    require(maxDim > 0)
    val (w, h, rA, gA, bA) = jpegPixelsColor(bytes)
    val m = math.max(w, h)
    val outW = if (m <= maxDim) w else w * maxDim / m
    val outH = if (m <= maxDim) h else h * maxDim / m
    var sr = 0L
    var sg = 0L
    var sb = 0L
    var wr = 0L
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val i = sy * w + (x * w / outW)
        sr += rA(i); sg += gA(i); sb += bA(i)
        wr += (y + 1).toLong * rA(i)
        x += 1
      }
      y += 1
    }
    JpegColorResampleStats(w, h, outW, outH, sr, sg, sb, wr)
  }

  val JpegColorResampledSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("src_w", LongType, nullable = false),
    StructField("src_h", LongType, nullable = false),
    StructField("out_w", LongType, nullable = false),
    StructField("out_h", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("wsum_r", LongType, nullable = false)))

  def resampleJpegColor(withPayload: DataFrame, idCol: String, maxDim: Int = 24): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val s = jpegResampleColor(r.getAs[Array[Byte]](1), maxDim)
        Row(r.getLong(0), s.srcW.toLong, s.srcH.toLong, s.outW.toLong, s.outH.toLong,
          s.sumR, s.sumG, s.sumB, s.wsumR)
      })
    spark.createDataFrame(rdd, JpegColorResampledSchema)
  }
}
