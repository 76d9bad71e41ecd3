package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary metadata, real BMP/WAV decode, resize, frame sampling.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait MultimodalQueries extends QueryHelpers {

  protected def multimodalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- multimodal plumbing ---
    "mm_binary_meta" -> ((s, dir) => {
      Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("magic"), col("sha256"))
        .orderBy(col("doc_id"))
    }),


    "mm_decode_stub" -> ((s, dir) => {
      Multimodal.decodeStub(
        Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("channels"))
        .orderBy(col("doc_id"))
    }),


    "mm_resize_plan" -> ((s, dir) => {
      // integer-exact resize geometry (fit-within-224, no upscale) over the
      // decoded dims — the auditable planning half of a resize pipeline
      Multimodal.resizePlan(Multimodal.decodeStub(
        Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text"),
        "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_frame_sample" -> ((s, dir) => {
      Multimodal.frameSample(
        Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text"), "doc_id", 4)
        .orderBy(col("doc_id"), col("frame_idx"))
    }),


    "mm_decode_bmp" -> ((s, dir) => {
      // REAL pixel decode: deterministic 24-bit BMP fixtures (dims and
      // channel values are integer functions of doc_id/x/y), decoded from
      // the BYTES by the pure-JVM parser; the oracle recomputes every stat
      // from the FORMULA via a range cross join — any header/stride/flip/
      // BGR defect in the decoder breaks the hash
      Multimodal.decodeBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_decode_png" -> ((s, dir) => {
      // third REAL codec: full PNG path — chunk walk with CRC32 checks,
      // multi-IDAT zlib inflate, all five scanline filters (fixtures cycle
      // y % 5 through None/Sub/Up/Average/Paeth) — against the same
      // formula-vs-bytes oracle scheme as BMP
      Multimodal.decodePng(
        Multimodal.pngFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_resize_png" -> ((s, dir) => {
      // decode + nearest-neighbor fit-within downscale in one pass over the
      // PNG bytes; sampled coordinates re-derived by the oracle via the
      // same truncating-integer mapping
      Multimodal.resamplePng(
        Multimodal.pngFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_resize_bmp" -> ((s, dir) => {
      // REAL pixel resampling: nearest-neighbor fit-within-16 downscale of
      // the BMP fixtures, all-integer source mapping (x*srcW div outW) —
      // the oracle recomputes the resampled image's stats from the pixel
      // formula at the sampled coordinates
      Multimodal.resampleBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_sniff" -> ((s, dir) => {
      // header-only triage over a MIXED blob column: five real container
      // formats (doc_id % 5 routes to the matching fixture builder) plus
      // raw text bytes every 31st doc (the unknown fallback) — format and
      // dims must come out of MAGIC BYTES alone, no decode; the oracle
      // re-derives every field from the fixture dimension formulas
      val d = spread(t(s, dir, "documents"))
      val unk = d.filter(col("doc_id") % 31 === 0)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val rest = d.filter(col("doc_id") % 31 =!= 0)
      def fam(k: Int) = rest.filter(col("doc_id") % 5 === k)
      val mixed = Multimodal.bmpFixtures(fam(0), "doc_id")
        .union(Multimodal.pngFixtures(fam(1), "doc_id"))
        .union(Multimodal.gifFixtures(fam(2), "doc_id"))
        .union(Multimodal.jpegFixtures(fam(3), "doc_id"))
        .union(Multimodal.wavFixtures(fam(4), "doc_id"))
        .union(unk)
      Multimodal.sniff(mixed, "doc_id").orderBy(col("doc_id"))
    }),

    "mm_decode_gif" -> ((s, dir) => {
      // fourth REAL codec: GIF with genuine LZW — variable-width LSB-first
      // code unpacking, dictionary growth + KwKwK case, sub-block
      // reassembly, stats THROUGH the parsed color table; one bit-level
      // defect desynchronizes the stream and breaks the formula oracle
      Multimodal.decodeGif(
        Multimodal.gifFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_decode_jpeg" -> ((s, dir) => {
      // fifth REAL codec: baseline JPEG — JFIF markers, Annex-K quant +
      // Huffman tables, DC differential coding, byte stuffing, canonical
      // Huffman decode, integer IDCT over the quantized cosine basis. The
      // fixtures are constant per 8x8 block, so the full encode->decode
      // chain stays closed-form integer math the oracle re-derives; the
      // AC/Huffman machinery is covered by the arbitrary-block round-trip
      // property in OperatorsSpec (the GIF lesson)
      Multimodal.decodeJpeg(
        Multimodal.jpegFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_decode_jpeg_color" -> ((s, dir) => {
      // COLOR baseline JPEG: 3-component YCbCr with 4:2:0 chroma (Y 2x2,
      // Cb/Cr 1x1) — interleaved 16x16 MCUs, per-component DC chains,
      // integer 2x2 chroma upsampling, pinned fixed-point color matrices.
      // Fixtures are constant per MCU so the WHOLE color chain is
      // closed-form for the oracle; AC/Huffman + mixed content ride the
      // arbitrary-grid round-trip property (the GIF lesson)
      Multimodal.decodeJpegColor(
        Multimodal.jpegColorFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_resize_jpeg_color" -> ((s, dir) => {
      // color decode + nearest-neighbor fit-within-24 downscale in one
      // pass; the oracle re-derives the sampled source coordinates with
      // the same truncating mapping and the constant-MCU color chain
      Multimodal.resampleJpegColor(
        Multimodal.jpegColorFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_resize_jpeg" -> ((s, dir) => {
      // decode + nearest-neighbor fit-within-16 downscale in one pass over
      // the JPEG bytes; the oracle re-derives the sampled coordinates with
      // the same truncating mapping and the block-constant decode formula
      Multimodal.resampleJpeg(
        Multimodal.jpegFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_decode_wav" -> ((s, dir) => {
      // REAL audio decode: deterministic PCM16 RIFF/WAVE fixtures (frame
      // count, channels, rate and every sample are integer functions of
      // doc_id/frame/channel), decoded from the BYTES by the pure-JVM
      // chunk-walking parser; the oracle recomputes every stat from the
      // FORMULA — any offset/sign/width/interleave defect breaks the hash
      Multimodal.decodeWav(
        Multimodal.wavFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_histogram_bmp" -> ((s, dir) => {
      // exposure profile: 8-bucket integer ITU-R 601 luminance histogram
      // per image — the dark/blank-image detector; empty buckets kept at 0
      Multimodal.histogramBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"), col("bucket"))
    }),


    "mm_histogram_png" -> ((s, dir) => {
      // the PNG twin of mm_histogram_bmp over the inflated, unfiltered
      // pixel stream — same fixed-point luma, same uniform bucket shape
      Multimodal.histogramPng(
        Multimodal.pngFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"), col("bucket"))
    }),


    "mm_phash_dct" -> ((s, dir) => {
      // perceptual DCT hash per image: 8×8 nearest-neighbor luma, integer
      // 2D DCT-II over the LITERAL quantized cosine table, 63 AC bits
      // thresholded at their truncating mean — the image twin of SimHash,
      // exactly recomputable from the pixel formula
      Multimodal.phashBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_phash_pairs" -> ((s, dir) => {
      // near-duplicate image pairs: banded pHash join (4×16-bit segments —
      // LOSSLESS for Hamming ≤ 3 by pigeonhole) + exact bit_count verify.
      // Gate runs on a screening cohort (every 10th doc) of TEXTURED
      // fixtures with a planted byte-identical mirror set: quadratic pixel
      // formulas make non-mirrors land ≥ 19 bits apart, so the result is
      // exactly the mirrors — a gate that fails if banding drops a pair OR
      // the verify threshold leaks a non-dup
      // mirror ids live at +10_000_000 — far beyond any fixture SF's
      // doc_id range, so planted keys can never collide with real ones
      val base = t(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") % 10 === 0)
      val ids = base.select(col("doc_id"), col("doc_id").as("sid"))
        .unionByName(base.select((col("doc_id") + 10000000).as("doc_id"),
          col("doc_id").as("sid")))
      val h = Multimodal.phashBmp(Multimodal.bmpFixturesTextured(spread(ids)), "doc_id")
      Multimodal.phashPairs(h, "doc_id", "phash")
        .orderBy(col("id_a"), col("id_b"))
    }),


    "mm_blur_scores" -> ((s, dir) => {
      // blur detection: 5-point Laplacian moments over the interior luma
      // grid — Laplacian variance collapses toward 0 on blurred/garbled
      // frames; bytes-side decode vs the oracle's pixel-formula recompute
      Multimodal.blurScoreBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_patchify" -> ((s, dir) => {
      // ViT ingest front half: 8x8 patch grid per BMP, per-tile pixel count
      // and truncating-mean 601 luma (milli) — bytes-side decode vs the
      // oracle's formula recomputation, localized to tiles
      Multimodal.patchifyBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"), col("py"), col("px"))
    }),


    "mm_audio_vad" -> ((s, dir) => {
      // silence cut for audio corpora: 64-frame windowed energy over all
      // channels, voiced iff mean square clears the threshold — decoded
      // from bytes, re-derived from the sample formula by the oracle
      Multimodal.vadWav(
        Multimodal.wavFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"), col("win"))
    }),


    "mm_audio_features" -> ((s, dir) => {
      // audio feature extraction: zero-crossing count (zeros transparent),
      // all-channel peak amplitude, signed channel-0 DC-offset sum — one
      // O(1)-state pass over the data chunk, never materializing samples
      Multimodal.audioFeatures(
        Multimodal.wavFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),


    "mm_resize_wav" -> ((s, dir) => {
      // REAL audio downsampling to 4 kHz: nearest-frame decimation with the
      // truncating-division source mapping (i*srcFrames div outFrames) —
      // the oracle recomputes the decimated stats from the sample formula
      // at the sampled frame indices
      Multimodal.resampleWav(
        Multimodal.wavFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }))

  /** The quantized DCT-II basis as a SQL VALUES literal — the SAME 64 longs
    * as [[graft.operators.Multimodal.QCos]] (literal-weight-table pattern:
    * no runtime cos on either side). */
  private val qcosValuesSql: String =
    """(0,0,1000000),(0,1,1000000),(0,2,1000000),(0,3,1000000),
      |(0,4,1000000),(0,5,1000000),(0,6,1000000),(0,7,1000000),
      |(1,0,980785),(1,1,831470),(1,2,555570),(1,3,195090),
      |(1,4,-195090),(1,5,-555570),(1,6,-831470),(1,7,-980785),
      |(2,0,923880),(2,1,382683),(2,2,-382683),(2,3,-923880),
      |(2,4,-923880),(2,5,-382683),(2,6,382683),(2,7,923880),
      |(3,0,831470),(3,1,-195090),(3,2,-980785),(3,3,-555570),
      |(3,4,555570),(3,5,980785),(3,6,195090),(3,7,-831470),
      |(4,0,707107),(4,1,-707107),(4,2,-707107),(4,3,707107),
      |(4,4,707107),(4,5,-707107),(4,6,-707107),(4,7,707107),
      |(5,0,555570),(5,1,-980785),(5,2,195090),(5,3,831470),
      |(5,4,-831470),(5,5,-195090),(5,6,980785),(5,7,-555570),
      |(6,0,382683),(6,1,-923880),(6,2,923880),(6,3,-382683),
      |(6,4,-382683),(6,5,923880),(6,6,-923880),(6,7,382683),
      |(7,0,195090),(7,1,-555570),(7,2,831470),(7,3,-980785),
      |(7,4,980785),(7,5,-831470),(7,6,555570),(7,7,-195090)""".stripMargin

  /** pHash re-derivation CTEs from the BMP pixel FORMULA for a given id set
    * (`idsSelect` must yield (doc_id, sid)) and per-channel pixel formulas
    * over (sx, sy, sid): sampled 8×8 luma, DCT via the literal basis,
    * AC-mean threshold, bit assembly — ends with a `ph` relation
    * (doc_id, phash). */
  private def phashCtes(idsSelect: String,
      rF: String, gF: String, bF: String): String =
    s"""WITH ids AS ($idsSelect),
       |d AS (
       |  SELECT doc_id, sid,
       |    CAST(8 + sid % 25 AS BIGINT) AS w,
       |    CAST(8 + (sid * 7) % 25 AS BIGINT) AS h
       |  FROM ids
       |), px AS (
       |  SELECT d.doc_id, xs.range AS x8, ys.range AS y8, d.sid AS sid,
       |    xs.range * d.w // 8 AS sx, ys.range * d.h // 8 AS sy
       |  FROM d CROSS JOIN range(0, 8) xs CROSS JOIN range(0, 8) ys
       |), lum AS (
       |  SELECT doc_id, x8, y8,
       |    (299 * ($rF) + 587 * ($gF) + 114 * ($bF)) // 1000 AS lum
       |  FROM px
       |), qc(u, x, c) AS (VALUES
       |$qcosValuesSql),
       |coef AS (
       |  SELECT l.doc_id, cv.u AS v, cu.u AS u,
       |    CAST(sum(l.lum * cv.c * cu.c) AS BIGINT) AS coef
       |  FROM lum l JOIN qc cu ON cu.x = l.x8 JOIN qc cv ON cv.x = l.y8
       |  GROUP BY 1, 2, 3
       |), m AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN v = 0 AND u = 0 THEN 0 ELSE coef END) // 63 AS mean
       |  FROM coef GROUP BY 1
       |), ph AS (
       |  SELECT coef.doc_id,
       |    CAST(sum(CASE WHEN NOT (v = 0 AND u = 0) AND coef > m.mean
       |      THEN CAST(1 AS BIGINT) << CAST(v * 8 + u - 1 AS INT) ELSE 0 END) AS BIGINT)
       |      AS phash
       |  FROM coef JOIN m ON m.doc_id = coef.doc_id GROUP BY 1
       |)""".stripMargin

  /** The constant-block JPEG DC chain (fdct → round-half-up quantize at
    * qt00 = 8 → dequant → integer IDCT, clamped) over a SQL expression —
    * shared by the grayscale and color JPEG oracles. */
  private def jpegDcChainSql(v: String): String =
    s"least(255, greatest(0, (CAST(floor(((($v - 128) * 46344 * 46344 + 134217728" +
      " + 1125899906842624) // 268435456 - 4194304) / 8.0 + 0.5) AS BIGINT)" +
      " * 8 * 5793 * 5793 + 134217728 + 1125899906842624) // 268435456 - 4194304 + 128))"

  /** Color JPEG oracle: constant-per-MCU fixtures make every component
    * DC-only, so the chain RGB→YCbCr (pinned fixed-point matrix, biased
    * nonnegative dividends) → DC quantize chain per plane → YCbCr→RGB is
    * closed-form per MCU. */
  private def jpegColorOracleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(16 + doc_id % 19 AS BIGINT) AS width,
       |    CAST(16 + (doc_id * 7) % 19 AS BIGINT) AS height
       |  FROM documents
       |), mcu AS (
       |  SELECT d.doc_id, d.width, d.height, mxs.range AS mx, mys.range AS my,
       |    least(d.width - mxs.range * 16, 16) AS nx,
       |    least(d.height - mys.range * 16, 16) AS ny,
       |    (17 * mxs.range + 29 * mys.range + d.doc_id) % 256 AS r,
       |    (23 * mxs.range + 31 * mys.range + 2 * d.doc_id) % 256 AS g,
       |    (13 * mxs.range + 37 * mys.range + 3 * d.doc_id) % 256 AS b
       |  FROM d CROSS JOIN range(0, 3) mxs CROSS JOIN range(0, 3) mys
       |  WHERE mxs.range * 16 < d.width AND mys.range * 16 < d.height
       |), ycc AS (
       |  SELECT *,
       |    (19595 * r + 38470 * g + 7471 * b + 32768) // 65536 AS y,
       |    least(255, greatest(0, (-11059 * r - 21709 * g + 32768 * b + 32768 + 8388608) // 65536)) AS cb,
       |    least(255, greatest(0, (32768 * r - 27439 * g - 5329 * b + 32768 + 8388608) // 65536)) AS cr
       |  FROM mcu
       |), dec AS (
       |  SELECT *, ${jpegDcChainSql("y")} AS yh,
       |    ${jpegDcChainSql("cb")} AS cbh,
       |    ${jpegDcChainSql("cr")} AS crh
       |  FROM ycc
       |), rgb AS (
       |  SELECT *,
       |    least(255, greatest(0, yh + (91881 * (crh - 128) + 32768 + 16777216) // 65536 - 256)) AS rh,
       |    least(255, greatest(0, yh - (22554 * (cbh - 128) + 46802 * (crh - 128) + 32768 + 33554432) // 65536 + 512)) AS gh,
       |    least(255, greatest(0, yh + (116130 * (cbh - 128) + 32768 + 16777216) // 65536 - 256)) AS bh
       |  FROM dec
       |)
       |SELECT doc_id, width, height, CAST(3 AS BIGINT) AS channels,
       |  CAST(sum(rh * nx * ny) AS BIGINT) AS sum_r,
       |  CAST(sum(gh * nx * ny) AS BIGINT) AS sum_g,
       |  CAST(sum(bh * nx * ny) AS BIGINT) AS sum_b,
       |  CAST(sum(rh * nx * (ny * my * 16 + ny * (ny + 1) // 2)) AS BIGINT) AS wsum_r
       |FROM rgb GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin

  /** Color resize oracle: fit-within-24 geometry, truncating source
    * mapping, then the same constant-MCU color chain per sampled pixel
    * (`oy` = output row; luma keeps the `y` name inside the chain). */
  private def jpegColorResizeOracleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(16 + doc_id % 19 AS BIGINT) AS src_w,
       |    CAST(16 + (doc_id * 7) % 19 AS BIGINT) AS src_h
       |  FROM documents
       |), geo AS (
       |  SELECT doc_id, src_w, src_h,
       |    CASE WHEN greatest(src_w, src_h) <= 24 THEN src_w
       |         ELSE src_w * 24 // greatest(src_w, src_h) END AS out_w,
       |    CASE WHEN greatest(src_w, src_h) <= 24 THEN src_h
       |         ELSE src_h * 24 // greatest(src_w, src_h) END AS out_h
       |  FROM d
       |), px AS (
       |  SELECT geo.doc_id, geo.src_w, geo.src_h, geo.out_w, geo.out_h, ys.range AS oy,
       |    (xs.range * geo.src_w // geo.out_w) // 16 AS mx,
       |    (ys.range * geo.src_h // geo.out_h) // 16 AS my
       |  FROM geo CROSS JOIN range(0, 24) xs CROSS JOIN range(0, 24) ys
       |  WHERE xs.range < geo.out_w AND ys.range < geo.out_h
       |), rgb0 AS (
       |  SELECT *, (17 * mx + 29 * my + doc_id) % 256 AS r,
       |    (23 * mx + 31 * my + 2 * doc_id) % 256 AS g,
       |    (13 * mx + 37 * my + 3 * doc_id) % 256 AS b
       |  FROM px
       |), ycc AS (
       |  SELECT *,
       |    (19595 * r + 38470 * g + 7471 * b + 32768) // 65536 AS y,
       |    least(255, greatest(0, (-11059 * r - 21709 * g + 32768 * b + 32768 + 8388608) // 65536)) AS cb,
       |    least(255, greatest(0, (32768 * r - 27439 * g - 5329 * b + 32768 + 8388608) // 65536)) AS cr
       |  FROM rgb0
       |), dec AS (
       |  SELECT *, ${jpegDcChainSql("y")} AS yh,
       |    ${jpegDcChainSql("cb")} AS cbh,
       |    ${jpegDcChainSql("cr")} AS crh
       |  FROM ycc
       |), rgb AS (
       |  SELECT *,
       |    least(255, greatest(0, yh + (91881 * (crh - 128) + 32768 + 16777216) // 65536 - 256)) AS rh,
       |    least(255, greatest(0, yh - (22554 * (cbh - 128) + 46802 * (crh - 128) + 32768 + 33554432) // 65536 + 512)) AS gh,
       |    least(255, greatest(0, yh + (116130 * (cbh - 128) + 32768 + 16777216) // 65536 - 256)) AS bh
       |  FROM dec
       |)
       |SELECT doc_id, src_w, src_h, out_w, out_h,
       |  CAST(sum(rh) AS BIGINT) AS sum_r,
       |  CAST(sum(gh) AS BIGINT) AS sum_g,
       |  CAST(sum(bh) AS BIGINT) AS sum_b,
       |  CAST(sum((oy + 1) * rh) AS BIGINT) AS wsum_r
       |FROM rgb GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id""".stripMargin

  /** Laplacian-moments oracle generated from the fixture pixel formula:
    * lm at the five stencil positions, interior pixels only. */
  private def blurOracleSql: String = {
    def lm(xe: String, ye: String): String =
      s"(299 * ((($xe) + 3 * ($ye) + doc_id) % 256)" +
        s" + 587 * ((2 * ($xe) + ($ye)) % 256)" +
        s" + 114 * ((($xe) + ($ye) + doc_id) % 256))"
    val lap = s"(4 * ${lm("x", "y")} - ${lm("x - 1", "y")} - ${lm("x + 1", "y")}" +
      s" - ${lm("x", "y - 1")} - ${lm("x", "y + 1")})"
    s"""WITH px AS (
       |  SELECT doc_id, x.range AS x, y.range AS y,
       |    8 + doc_id % 25 AS w, 8 + (doc_id * 7) % 25 AS h
       |  FROM documents CROSS JOIN range(0, 32) x CROSS JOIN range(0, 32) y
       |  WHERE x.range < 8 + doc_id % 25 AND y.range < 8 + (doc_id * 7) % 25
       |), lap AS (
       |  SELECT doc_id, w, h, $lap AS lap
       |  FROM px WHERE x >= 1 AND x < w - 1 AND y >= 1 AND y < h - 1
       |)
       |SELECT doc_id, CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
       |  CAST(count(*) AS BIGINT) AS n_int, CAST(sum(lap) AS BIGINT) AS sum_lap,
       |  CAST(sum(lap * lap) AS BIGINT) AS sum_lap2
       |FROM lap GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  protected def multimodalOracles: Map[String, String] = Map(

    // per-tile sums recomputed from the pixel FORMULA over a bounded
    // position cross join (dims <= 32); mean = sum // count
    "mm_blur_scores" -> blurOracleSql,

    "mm_patchify" ->
      """WITH px AS (
        |  SELECT doc_id, x.range AS x, y.range AS y
        |  FROM documents CROSS JOIN range(0, 32) x CROSS JOIN range(0, 32) y
        |  WHERE x.range < 8 + doc_id % 25 AND y.range < 8 + (doc_id * 7) % 25
        |), lum AS (
        |  SELECT doc_id, y // 8 AS py, x // 8 AS px,
        |    299 * ((x + 3 * y + doc_id) % 256)
        |      + 587 * ((2 * x + y) % 256)
        |      + 114 * ((x + y + doc_id) % 256) AS lm
        |  FROM px
        |)
        |SELECT doc_id, CAST(py AS BIGINT) AS py, CAST(px AS BIGINT) AS px,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(CAST(sum(lm) AS BIGINT) // count(*) AS BIGINT) AS mean_luma_milli
        |FROM lum GROUP BY 1, 2, 3 ORDER BY doc_id, py, px""".stripMargin,


    // windowed energy recomputed from the sample formula across channels;
    // voiced iff energy >= thr * n_samples
    "mm_audio_vad" ->
      """WITH d AS (
        |  SELECT doc_id, 64 + doc_id % 193 AS frames, 1 + doc_id % 2 AS channels
        |  FROM documents
        |), sm AS (
        |  SELECT doc_id, f.range AS f,
        |    (f.range * (3 + ch.range) + doc_id * 11) % 4001 - 2000 AS s
        |  FROM d CROSS JOIN range(0, 257) f CROSS JOIN range(0, 2) ch
        |  WHERE f.range < frames AND ch.range < channels
        |)
        |SELECT doc_id, CAST(f // 64 AS BIGINT) AS win,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(s * s) AS BIGINT) AS energy,
        |  CAST(CASE WHEN sum(s * s) >= 1330000 * count(*) THEN 1 ELSE 0 END AS BIGINT) AS voiced
        |FROM sm GROUP BY 1, 2 ORDER BY doc_id, win""".stripMargin,

    "mm_decode_jpeg_color" -> jpegColorOracleSql,

    "mm_resize_jpeg_color" -> jpegColorResizeOracleSql,

    // hash bits re-derived from the pixel formula through the SAME literal
    // cosine table — any resize/luma/DCT/threshold defect flips bits
    "mm_phash_dct" ->
      (phashCtes("SELECT doc_id, doc_id AS sid FROM documents",
        "(sx + 3 * sy + sid) % 256",
        "(2 * sx + sy) % 256",
        "(sx + sy + sid) % 256") +
        "\nSELECT doc_id, phash FROM ph ORDER BY doc_id"),

    // naive-quadratic twin of the banded pair join (banding is lossless at
    // Hamming <= 3 with 4 bands, so the exact join IS the oracle); textured
    // cohort fixtures re-derived from the quadratic pixel formulas
    "mm_phash_pairs" ->
      (phashCtes(
        """SELECT doc_id, doc_id AS sid FROM documents WHERE doc_id % 10 = 0
          |  UNION ALL SELECT doc_id + 10000000, doc_id FROM documents WHERE doc_id % 10 = 0""".stripMargin,
        "((sx * 37 + sy * 23 + sid * 101) * (sx + sy + sid % 7 + 1)) % 256",
        "((sx * 11 + sy * 41 + sid * 59) * (sx + 2 * sy + sid % 5 + 1)) % 256",
        "((sx * 29 + sy * 13 + sid * 83) * (2 * sx + sy + sid % 3 + 1)) % 256") +
        """
          |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
          |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.phash, b.phash)) <= 3
          |ORDER BY id_a, id_b""".stripMargin),


    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(hex(encode(substr(text, 1, 4)))) AS magic,
        |  sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin,


    "mm_decode_stub" ->
      """SELECT doc_id,
        |  CAST(64 + h % 512 AS INT) AS width,
        |  CAST(64 + (h >> 16) % 512 AS INT) AS height,
        |  3 AS channels
        |FROM (
        |  SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents)
        |ORDER BY doc_id""".stripMargin,


    "mm_resize_plan" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(64 + h % 512 AS BIGINT) AS width,
        |    CAST(64 + (h >> 16) % 512 AS BIGINT) AS height
        |  FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents)
        |)
        |SELECT doc_id, width, height,
        |  CASE WHEN greatest(width, height) <= 224 THEN width
        |       ELSE width * 224 // greatest(width, height) END AS out_w,
        |  CASE WHEN greatest(width, height) <= 224 THEN height
        |       ELSE height * 224 // greatest(width, height) END AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,


    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT % 60000 + 1000 AS duration_ms
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, n_bytes, duration_ms, k.range AS frame_idx
        |  FROM m CROSS JOIN range(0, 4) k
        |)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(duration_ms * frame_idx // 4 AS BIGINT) AS frame_ts_ms,
        |  CAST(n_bytes * frame_idx // 4 AS BIGINT) AS frame_offset
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,


    // the decoder reads BYTES; this recomputes from the pixel FORMULA over
    // a bounded range cross join (dims <= 32) — row-weighted wsum_r pins
    // the bottom-up flip, distinct per-channel formulas pin BGR order
    "mm_decode_bmp" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 7) % 25 AS BIGINT) AS height
        |  FROM documents
        |), px AS (
        |  SELECT d.doc_id, d.width, d.height, xs.range AS x, ys.range AS y
        |  FROM d CROSS JOIN range(0, 33) xs CROSS JOIN range(0, 33) ys
        |  WHERE xs.range < d.width AND ys.range < d.height
        |)
        |SELECT doc_id, width, height, CAST(3 AS BIGINT) AS channels,
        |  CAST(sum((x + 3*y + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*x + y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x + y + doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((y + 1) * ((x + 3*y + doc_id) % 256)) AS BIGINT) AS wsum_r
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    "mm_decode_png" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 21 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 5) % 21 AS BIGINT) AS height
        |  FROM documents
        |), px AS (
        |  SELECT d.doc_id, d.width, d.height, xs.range AS x, ys.range AS y
        |  FROM d CROSS JOIN range(0, 29) xs CROSS JOIN range(0, 29) ys
        |  WHERE xs.range < d.width AND ys.range < d.height
        |)
        |SELECT doc_id, width, height, CAST(3 AS BIGINT) AS channels,
        |  CAST(sum((2*x + y + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((x + 2*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((3*x + y + doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((y + 1) * ((2*x + y + doc_id) % 256)) AS BIGINT) AS wsum_r
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    // constant-per-block fixtures: the decoded luma of block (bx, by) is the
    // closed-form chain fdct -> quantize (qt00 = 8 at quality 75) -> dequant
    // -> idct, all integer except one IEEE-exact /8.0; the bias-shift makes
    // DuckDB's truncating // equal to the decoder's floor division
    "mm_decode_jpeg" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 21 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 5) % 21 AS BIGINT) AS height
        |  FROM documents
        |), b AS (
        |  SELECT d.doc_id, d.width, d.height, bxs.range AS bx, bys.range AS by,
        |    least(d.width - bxs.range * 8, 8) AS nx,
        |    least(d.height - bys.range * 8, 8) AS ny,
        |    (17 * bxs.range + 29 * bys.range + d.doc_id) % 256 AS v
        |  FROM d CROSS JOIN range(0, 4) bxs CROSS JOIN range(0, 4) bys
        |  WHERE bxs.range * 8 < d.width AND bys.range * 8 < d.height
        |), f AS (
        |  SELECT *, ((v - 128) * 46344 * 46344 + 134217728 + 1125899906842624)
        |    // 268435456 - 4194304 AS f00
        |  FROM b
        |), p AS (
        |  SELECT *, least(255, greatest(0,
        |    (CAST(floor(f00 / 8.0 + 0.5) AS BIGINT) * 8 * 5793 * 5793
        |      + 134217728 + 1125899906842624) // 268435456 - 4194304 + 128)) AS pv
        |  FROM f
        |)
        |SELECT doc_id, width, height, CAST(1 AS BIGINT) AS channels,
        |  CAST(sum(pv * nx * ny) AS BIGINT) AS sum_luma,
        |  CAST(sum(pv * nx * (ny * by * 8 + ny * (ny + 1) // 2)) AS BIGINT) AS wsum_luma
        |FROM p GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    "mm_resize_jpeg" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 21 AS BIGINT) AS src_w,
        |    CAST(8 + (doc_id * 5) % 21 AS BIGINT) AS src_h
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, src_w, src_h,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_w
        |         ELSE src_w * 16 // greatest(src_w, src_h) END AS out_w,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_h
        |         ELSE src_h * 16 // greatest(src_w, src_h) END AS out_h
        |  FROM d
        |), px AS (
        |  SELECT g.doc_id, g.src_w, g.src_h, g.out_w, g.out_h, ys.range AS y,
        |    (xs.range * g.src_w // g.out_w) // 8 AS bx,
        |    (ys.range * g.src_h // g.out_h) // 8 AS by
        |  FROM g CROSS JOIN range(0, 16) xs CROSS JOIN range(0, 16) ys
        |  WHERE xs.range < g.out_w AND ys.range < g.out_h
        |), f AS (
        |  SELECT *, (((17 * bx + 29 * by + doc_id) % 256 - 128) * 46344 * 46344
        |    + 134217728 + 1125899906842624) // 268435456 - 4194304 AS f00
        |  FROM px
        |), p AS (
        |  SELECT *, least(255, greatest(0,
        |    (CAST(floor(f00 / 8.0 + 0.5) AS BIGINT) * 8 * 5793 * 5793
        |      + 134217728 + 1125899906842624) // 268435456 - 4194304 + 128)) AS pv
        |  FROM f
        |)
        |SELECT doc_id, src_w, src_h, out_w, out_h,
        |  CAST(sum(pv) AS BIGINT) AS sum_luma,
        |  CAST(sum((y + 1) * pv) AS BIGINT) AS wsum_luma
        |FROM p GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id""".stripMargin,

    "mm_resize_png" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 21 AS BIGINT) AS src_w,
        |    CAST(8 + (doc_id * 5) % 21 AS BIGINT) AS src_h
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, src_w, src_h,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_w
        |         ELSE src_w * 16 // greatest(src_w, src_h) END AS out_w,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_h
        |         ELSE src_h * 16 // greatest(src_w, src_h) END AS out_h
        |  FROM d
        |), px AS (
        |  SELECT g.doc_id, g.src_w, g.src_h, g.out_w, g.out_h, ys.range AS y,
        |    (xs.range * g.src_w // g.out_w) AS sx, (ys.range * g.src_h // g.out_h) AS sy
        |  FROM g CROSS JOIN range(0, 16) xs CROSS JOIN range(0, 16) ys
        |  WHERE xs.range < g.out_w AND ys.range < g.out_h
        |)
        |SELECT doc_id, src_w, src_h, out_w, out_h,
        |  CAST(sum((2*sx + sy + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((sx + 2*sy) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((3*sx + sy + doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((y + 1) * ((2*sx + sy + doc_id) % 256)) AS BIGINT) AS wsum_r
        |FROM px GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id""".stripMargin,


    "mm_resize_bmp" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS BIGINT) AS src_w,
        |    CAST(8 + (doc_id * 7) % 25 AS BIGINT) AS src_h
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, src_w, src_h,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_w
        |         ELSE src_w * 16 // greatest(src_w, src_h) END AS out_w,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_h
        |         ELSE src_h * 16 // greatest(src_w, src_h) END AS out_h
        |  FROM d
        |), px AS (
        |  SELECT g.doc_id, g.src_w, g.src_h, g.out_w, g.out_h, ys.range AS y,
        |    (xs.range * g.src_w // g.out_w) AS sx, (ys.range * g.src_h // g.out_h) AS sy
        |  FROM g CROSS JOIN range(0, 16) xs CROSS JOIN range(0, 16) ys
        |  WHERE xs.range < g.out_w AND ys.range < g.out_h
        |)
        |SELECT doc_id, src_w, src_h, out_w, out_h,
        |  CAST(sum((sx + 3*sy + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*sx + sy) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((sx + sy + doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((y + 1) * ((sx + 3*sy + doc_id) % 256)) AS BIGINT) AS wsum_r
        |FROM px GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id""".stripMargin,


    // stats re-derived from the index formula THROUGH the palette formula
    // (r=i, g=2i mod 256, b=5i+1 mod 256) — the decoder reads both from
    // the BYTES, after a full LZW decompression
    // every field re-derived from the fixture dimension formulas — a sniff
    // that mis-parses any header field diverges from the formula value
    "mm_sniff" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 31 = 0 THEN 'unknown'
        |       WHEN doc_id % 5 = 0 THEN 'bmp'
        |       WHEN doc_id % 5 = 1 THEN 'png'
        |       WHEN doc_id % 5 = 2 THEN 'gif'
        |       WHEN doc_id % 5 = 3 THEN 'jpeg'
        |       ELSE 'wav' END AS format,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN 0
        |       WHEN doc_id % 5 = 0 THEN 8 + doc_id % 25
        |       WHEN doc_id % 5 = 1 THEN 8 + doc_id % 21
        |       WHEN doc_id % 5 = 2 THEN 8 + doc_id % 17
        |       WHEN doc_id % 5 = 3 THEN 8 + doc_id % 21
        |       ELSE 64 + doc_id % 193 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN 0
        |       WHEN doc_id % 5 = 0 THEN 8 + (doc_id * 7) % 25
        |       WHEN doc_id % 5 = 1 THEN 8 + (doc_id * 5) % 21
        |       WHEN doc_id % 5 = 2 THEN 8 + (doc_id * 3) % 17
        |       WHEN doc_id % 5 = 3 THEN 8 + (doc_id * 5) % 21
        |       ELSE 1 END AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN 0
        |       WHEN doc_id % 5 = 3 THEN 1
        |       WHEN doc_id % 5 = 4 THEN 1 + doc_id % 2
        |       ELSE 3 END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 31 <> 0 AND doc_id % 5 = 4
        |       THEN 8000 + (doc_id % 3) * 4000 ELSE 0 END AS BIGINT) AS rate
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_decode_gif" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 17 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 3) % 17 AS BIGINT) AS height
        |  FROM documents
        |), px AS (
        |  SELECT d.doc_id, d.width, d.height, xs.range AS x, ys.range AS y,
        |    (xs.range * 7 + ys.range * 11 + d.doc_id * 13) % 256 AS i
        |  FROM d CROSS JOIN range(0, 25) xs CROSS JOIN range(0, 25) ys
        |  WHERE xs.range < d.width AND ys.range < d.height
        |)
        |SELECT doc_id, width, height,
        |  CAST(width * height AS BIGINT) AS n_pixels,
        |  CAST(sum(i) AS BIGINT) AS sum_r,
        |  CAST(sum((2 * i) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((5 * i + 1) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((y + 1) * i) AS BIGINT) AS wsum_r
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    "mm_decode_wav" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |    CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
        |    CAST(64 + doc_id % 193 AS BIGINT) AS n_frames
        |  FROM documents
        |), s AS (
        |  SELECT d.doc_id, d.channels, d.sample_rate, d.n_frames,
        |    i.range AS i, c.range AS ch,
        |    (i.range * (3 + c.range) + d.doc_id * 11) % 4001 - 2000 AS v
        |  FROM d CROSS JOIN range(0, 257) i CROSS JOIN range(0, 2) c
        |  WHERE i.range < d.n_frames AND c.range < d.channels
        |)
        |SELECT doc_id, channels, sample_rate, n_frames,
        |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN ch = 0 THEN (i + 1) * v ELSE 0 END) AS BIGINT) AS wsum_c0
        |FROM s GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin,


    // PNG twin: same luma/bucket math over the PNG fixture formula
    "mm_histogram_png" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 21 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 5) % 21 AS BIGINT) AS height
        |  FROM documents
        |), px AS (
        |  SELECT d.doc_id, xs.range AS x, ys.range AS y
        |  FROM d CROSS JOIN range(0, 29) xs CROSS JOIN range(0, 29) ys
        |  WHERE xs.range < d.width AND ys.range < d.height
        |), lum AS (
        |  SELECT doc_id,
        |    (299 * ((2*x + y + doc_id) % 256)
        |     + 587 * ((x + 2*y) % 256)
        |     + 114 * ((3*x + y + doc_id) % 256)) // 1000 AS lum
        |  FROM px
        |), hb AS (
        |  SELECT doc_id, lum * 8 // 256 AS bucket, CAST(count(*) AS BIGINT) AS n
        |  FROM lum GROUP BY 1, 2
        |), grid AS (
        |  SELECT d.doc_id, b.range AS bucket FROM d CROSS JOIN range(0, 8) b
        |)
        |SELECT g.doc_id, CAST(g.bucket AS BIGINT) AS bucket,
        |  CAST(COALESCE(hb.n, 0) AS BIGINT) AS n_pixels
        |FROM grid g LEFT JOIN hb ON hb.doc_id = g.doc_id AND hb.bucket = g.bucket
        |ORDER BY g.doc_id, g.bucket""".stripMargin,


    // luma and bucket re-derived from the pixel formula; the full
    // (doc, bucket) grid left-joined so empty buckets stay present at 0
    "mm_histogram_bmp" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 7) % 25 AS BIGINT) AS height
        |  FROM documents
        |), px AS (
        |  SELECT d.doc_id, xs.range AS x, ys.range AS y
        |  FROM d CROSS JOIN range(0, 33) xs CROSS JOIN range(0, 33) ys
        |  WHERE xs.range < d.width AND ys.range < d.height
        |), lum AS (
        |  SELECT doc_id,
        |    (299 * ((x + 3*y + doc_id) % 256)
        |     + 587 * ((2*x + y) % 256)
        |     + 114 * ((x + y + doc_id) % 256)) // 1000 AS lum
        |  FROM px
        |), hb AS (
        |  SELECT doc_id, lum * 8 // 256 AS bucket, CAST(count(*) AS BIGINT) AS n
        |  FROM lum GROUP BY 1, 2
        |), grid AS (
        |  SELECT d.doc_id, b.range AS bucket FROM d CROSS JOIN range(0, 8) b
        |)
        |SELECT g.doc_id, CAST(g.bucket AS BIGINT) AS bucket,
        |  CAST(COALESCE(hb.n, 0) AS BIGINT) AS n_pixels
        |FROM grid g LEFT JOIN hb ON hb.doc_id = g.doc_id AND hb.bucket = g.bucket
        |ORDER BY g.doc_id, g.bucket""".stripMargin,


    // features re-derived from the fixture formula: zero crossings via
    // lag(sign) over the NONZERO channel-0 subsequence (zeros transparent,
    // exactly the decoder's prevSign rule); peak over ALL channels
    "mm_audio_features" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |    CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
        |    CAST(64 + doc_id % 193 AS BIGINT) AS n_frames
        |  FROM documents
        |), s AS (
        |  SELECT d.doc_id, i.range AS i, c.range AS ch,
        |    (i.range * (3 + c.range) + d.doc_id * 11) % 4001 - 2000 AS v
        |  FROM d CROSS JOIN range(0, 257) i CROSS JOIN range(0, 2) c
        |  WHERE i.range < d.n_frames AND c.range < d.channels
        |), pk AS (
        |  SELECT doc_id, CAST(max(abs(v)) AS BIGINT) AS peak_abs FROM s GROUP BY 1
        |), c0 AS (
        |  SELECT doc_id, i, v FROM s WHERE ch = 0
        |), dc AS (
        |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS dc_sum_c0 FROM c0 GROUP BY 1
        |), zc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS zcr FROM (
        |    SELECT doc_id, sign(v) AS sg,
        |      lag(sign(v)) OVER (PARTITION BY doc_id ORDER BY i) AS ps
        |    FROM c0 WHERE v != 0) q
        |  WHERE ps IS NOT NULL AND sg != ps GROUP BY 1
        |)
        |SELECT d.doc_id, d.channels, d.sample_rate, d.n_frames,
        |  CAST(COALESCE(zc.zcr, 0) AS BIGINT) AS zcr_c0,
        |  pk.peak_abs, dc.dc_sum_c0
        |FROM d
        |LEFT JOIN zc USING (doc_id)
        |JOIN pk USING (doc_id)
        |JOIN dc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    // decimation re-derived from the fixture formula at the SAMPLED frame
    // indices: src(i) = i*src_frames // out_frames, out_frames =
    // src_frames*4000 // src_rate (all fixture rates >= 8000, so out_rate
    // is the 4 kHz target everywhere)
    "mm_resize_wav" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |    CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS src_rate,
        |    CAST(64 + doc_id % 193 AS BIGINT) AS src_frames
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, channels, src_rate,
        |    CAST(least(4000, src_rate) AS BIGINT) AS out_rate,
        |    src_frames,
        |    src_frames * least(4000, src_rate) // src_rate AS out_frames
        |  FROM d
        |), s AS (
        |  SELECT g.doc_id, g.channels, g.src_rate, g.out_rate, g.src_frames,
        |    g.out_frames, i.range AS i, c.range AS ch,
        |    ((i.range * g.src_frames // g.out_frames) * (3 + c.range)
        |      + g.doc_id * 11) % 4001 - 2000 AS v
        |  FROM g CROSS JOIN range(0, 257) i CROSS JOIN range(0, 2) c
        |  WHERE i.range < g.out_frames AND c.range < g.channels
        |)
        |SELECT doc_id, channels, src_rate, out_rate, src_frames,
        |  CAST(out_frames AS BIGINT) AS out_frames,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN ch = 0 THEN (i + 1) * v ELSE 0 END) AS BIGINT) AS wsum_c0
        |FROM s GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY doc_id""".stripMargin)
}
