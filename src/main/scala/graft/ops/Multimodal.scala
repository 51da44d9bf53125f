package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2b north star): image/audio/
  * video handled as opaque `binary` payloads plus typed metadata, with
  * decode / feature-extraction / frame-sampling as batched
  * `mapPartitions` stages over a typed Dataset.
  *
  * The Spark-side shape is real and tested — schema, encoders,
  * partition-local batching (the JVM analog of `mapInPandas` batch
  * semantics), deterministic output. The codec call itself is a STUB
  * (`decodeStub`): this container has no image/audio libraries, so it
  * computes a deterministic fake feature vector from the bytes. A real
  * deployment swaps `decodeStub` for a JNI/codec call without touching
  * any of the surrounding plumbing.
  *
  * Scale notes: payloads never pass through a shuffle here — all stages
  * are narrow `mapPartitions`; metadata-only columns are projected
  * before any wide operation so 100 TB of media bytes aren't dragged
  * through an exchange.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      n_frames: Int, features: Array[Float])

  /** Adapt the `documents` table into media records: utf-8 payload
    * bytes, kind assigned round-robin. Deterministic. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRecord]
  }

  /** STUB for the codec: deterministic pseudo-decode. Real impl would
    * hand `payload` to an image/audio decoder; this one derives a
    * 8-dim feature vector from a rolling checksum of the bytes so the
    * pipeline shape (batching, schema, determinism) is fully testable. */
  private[ops] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var h = 0L
    val feat = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
      feat(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (h, feat)
  }

  /** Decode + feature-extract, `batchSize` records per codec call —
    * mirrors the arrow-batch shape of a `mapInPandas` pipeline so a
    * vectorized decoder drops in unchanged. */
  def extractFeatures(ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (checksum, feats) = decodeStub(r.payload)
          val frames = math.max(1, r.payload.length / 64)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
            checksum, frames, feats)
        }
      }
    }
  }

  /** Frame sampling: keep every `stride`-th frame index up to `maxN` —
    * pure metadata arithmetic, no payload movement. */
  def sampleFrames(feats: Dataset[MediaFeatures], stride: Int = 4,
      maxN: Int = 8): DataFrame =
    feats.toDF()
      .withColumn("sampled_frames",
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxN))
      .withColumn("n_sampled", size(col("sampled_frames")))
}
