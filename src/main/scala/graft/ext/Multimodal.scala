package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract / frame-
  * sample stages (BASELINE.json surface).
  *
  * The actual media decode is STUBBED (`fakeDecode`) — codec libraries
  * aren't in this environment — but everything Spark-side is real and
  * tested: the schema contract, the typed `Dataset` pipeline, partition-
  * preserving `mapPartitions` batching (the Scala analogue of a Pandas-UDF
  * `mapInPandas` batch loop), and deterministic downstream columns.
  *
  * Scale notes: payloads travel as parquet binary; the decode stage is a
  * narrow map (no shuffle), so 100 TB of media shards across executors
  * linearly. Frame sampling multiplies rows map-side — the explode stays
  * inside the stage, never shuffled un-aggregated.
  */
object Multimodal {

  /** Typed media record: the schema contract for multimodal tables. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      source: String)

  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: String)

  /** Wrap the documents table as a media table: the utf-8 payload stands
    * in for image bytes; real pipelines swap the loader only. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** Deterministic fake decode: dimensions derived from payload length,
    * checksum from the bytes. A real build replaces ONLY the arithmetic
    * here with a codec call; batching shape stays. */
  def fakeDecode(r: MediaRecord): DecodedMedia = {
    val len = r.payload.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
    DecodedMedia(r.media_id, r.kind, len,
      width = (len % 640).toInt,
      height = ((len * 7) % 480).toInt,
      n_frames = (len / 256).toInt + 1,
      checksum = checksum)
  }

  /** Decode stage: partition-preserving batched map over the binary
    * payloads (mapPartitions == one decoder init per partition, the same
    * batching contract as `mapInPandas`). */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it => it.map(fakeDecode) }
  }

  /** Frame sampling: every `step`-th frame index per video, map-side. */
  def sampleFrames(decoded: Dataset[DecodedMedia], step: Int = 4): DataFrame =
    decoded.toDF()
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
}
