package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata alongside (SURVEY §2.11). The Spark-side shape —
  * schema, partition-wise batch iteration, feature-vector output — is real
  * and tested; only the codec call is stubbed (image/audio libraries are
  * not in this container) behind `decodeStub`, which any real decoder
  * (JNI, ONNX runtime, subprocess) can replace without touching the plan.
  *
  * Scale notes: payload bytes never reach a wide shuffle — metadata is
  * computed scan-side; feature extraction is mapPartitions (one codec
  * init per partition, not per row), after `repartition` sized so one
  * partition's payloads fit executor memory.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      features: Array[Float])

  /** Wrap a text table as a media table (the driver testdata has no binary
    * column; UTF-8 bytes stand in for real payloads — same plumbing).
    */
  def payloadFrom(df: DataFrame, idCol: String, textCol: String,
      kind: String = "text"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** Scan-side metadata: byte length + SHA-256 — no decode needed. */
  def withMetadata(media: DataFrame): DataFrame =
    media.withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("sha256", sha2(col("payload"), 256))

  /** STUB decoder — deterministic fake "features" derived from payload
    * bytes. A real implementation would decode the image/audio and run a
    * feature extractor here; the signature (bytes → fixed-size Float
    * vector) is the contract.
    */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Deterministic frame sampling over the raw payload: frames of
    * `frameLen` bytes starting every `stride` bytes (stride < frameLen ⇒
    * overlap), the video/audio analog of token-window chunking. All
    * codegen'd built-ins — binary `substring` slices, no decode, no
    * shuffle — so the sampler runs at scan speed and ships each frame to
    * the (stubbed) codec as its own row. Same tail arithmetic as
    * `Corpus.tokenChunks`: a frame starts at every stride multiple below
    * `byte_len`; the final frames may be short.
    */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    require(frameLen >= 1 && stride >= 1)
    val n = length(col("payload")).cast("long")
    media
      .select(col("media_id"), col("payload"), n.as("_n"),
        explode(when(n >= 1,
          sequence(lit(0L), floor((n - 1) / stride))).otherwise(array()))
          .as("frame_no"))
      .select(col("media_id"), col("frame_no"),
        call_function("substring", col("payload"),
          (col("frame_no") * stride + 1).cast("int"), lit(frameLen)).as("frame"))
      .select(col("media_id"), col("frame_no"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(hex(col("frame"))).as("frame_md5"))
  }

  /** Partition-wise feature extraction over the typed Dataset — the shape a
    * real codec needs: per-partition init, iterator-in/iterator-out.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // real codecs initialize their native context HERE, once.
        rows.map(r => MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          decodeStub(r.payload, dims)))
      }
  }
}
