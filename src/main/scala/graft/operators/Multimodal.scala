package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat images/audio/video as opaque `binary`
  * columns with typed metadata, with decode / feature-extraction running as
  * partition-batched transforms.
  *
  * The decode step itself is STUBBED (this environment ships no image/audio
  * codecs): `decodeStub` derives a deterministic fake (width, height,
  * channels, features) from the bytes. Everything around it — schema, binary
  * column handling, batch iteration shape, partition sizing — is the real
  * Spark plumbing a production decoder (e.g. a JNI codec or an Arrow-batched
  * Python worker) would plug into: swap `fakeDecode` for the real kernel.
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
}
