package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, plus batch "decode"/feature-extract operators.
  *
  * The real decode (image/audio codecs) is STUBBED — the container has
  * no media libraries — but everything Spark-side is real: schema,
  * batch shape, partition-preserving mapPartitions, and deterministic
  * outputs so the pipeline is testable end-to-end. Swap
  * [[StubDecoder]] for a real codec (JNI/FFI) without touching the
  * plan: at 100 TB the decode runs once per partition batch, with no
  * shuffle before or after.
  */
object Multimodal {

  /** media row: opaque payload + typed metadata (the documents table
    * stands in for a media corpus; payload = utf-8 bytes).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      col("source"))

  final case class MediaFeature(
      media_id: Long, media_type: String, n_bytes: Long,
      checksum: String, width: Int, height: Int)

  /** Deterministic stand-in for a real media decoder. A real
    * implementation would parse the payload header; the stub derives
    * stable pseudo-dimensions from the byte length so tests have
    * fixed expectations.
    */
  object StubDecoder {
    def decode(mediaId: Long, mediaType: String, payload: Array[Byte]): MediaFeature = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val checksum = md.digest(payload).map("%02x".format(_)).mkString
      MediaFeature(mediaId, mediaType, payload.length.toLong, checksum,
        width = 1 + (payload.length % 640), height = 1 + (payload.length % 480))
    }
  }

  /** Batch feature extraction over the binary payload column. Runs as
    * a partition-local map (no shuffle); the per-partition iterator is
    * the batch boundary a real codec would amortize setup over.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-batch decoder setup would go here (codec init, model load)
        it.map { case (id, tpe, bytes) => StubDecoder.decode(id, tpe, bytes) }
      }
  }

  /** Column-expression twin of the stub decode (codegen'd; used by the
    * oracle-checked query so the SQL oracle can reproduce it exactly).
    */
  def extractFeaturesSql(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"),
      (lit(1) + octet_length(col("payload")) % 640).cast("long").as("width"),
      (lit(1) + octet_length(col("payload")) % 480).cast("long").as("height"))

  /** Frame sampling — the video-pipeline fan-out shape: one media row
    * explodes into one row per SAMPLED frame (every `stride`-th fixed
    * -size frame), each carrying its index and a per-frame checksum.
    * Row-local (`posexplode` of a sequence, no shuffle), so a
    * 1000-executor scan fans frames out at full parallelism. Frames
    * here are fixed CHARACTER windows of the stand-in payload (a real
    * video decoder would emit pixel buffers at timestamps — same
    * plan, different decode call); an empty payload yields one empty
    * frame rather than zero rows, so every media id survives the
    * explode.
    */
  def frameSample(docs: DataFrame, frameChars: Int = 1000,
      stride: Int = 2): DataFrame = {
    val nFrames = ceil(length(col("text")).cast("double") / frameChars)
      .cast("long")
    val frame = substr(col("text"),
      col("frame_idx").cast("int") * frameChars + 1, lit(frameChars))
    docs
      .select(col("doc_id").as("media_id"), col("text"),
        greatest(nFrames - 1L, lit(0L)).as("maxf"))
      .select(col("media_id"), col("text"),
        explode(sequence(lit(0L), col("maxf"), lit(stride.toLong)))
          .as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx"),
        length(frame).cast("long").as("n_chars"),
        md5(frame.cast("binary")).as("frame_md5"))
  }

  /** Resize stub — the binary→binary transform shape: a partition-
    * local map decimating the payload by `factor` (every factor-th
    * byte), deterministic, no shuffle. A real image resampler (JNI
    * codec) replaces the loop body; the batching, schema, and
    * partition preservation are what the plan needs at scale.
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "resize factor must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-batch codec/scaler setup would go here
        it.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          (id, out, bytes.length.toLong, out.length.toLong)
        }
      }
      .toDF("media_id", "payload", "n_bytes_in", "n_bytes_out")
  }
}
