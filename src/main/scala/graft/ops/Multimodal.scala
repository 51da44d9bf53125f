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
  * semantics), deterministic output. The IMAGE codec is real:
  * [[decodeImages]] decodes PNG payloads with the JDK's
  * `javax.imageio` (zero added dependencies). Audio/video and
  * unreadable payloads fall back to `decodeStub` — a deterministic
  * byte-fold tagged `decoder = "stub"` — so the pipeline shape stays
  * fully testable where a codec genuinely isn't available; a real
  * deployment swaps the stub for a JNI/codec call without touching
  * any of the surrounding plumbing.
  *
  * Scale notes: payloads never pass through a shuffle here — all stages
  * are narrow `mapPartitions`; metadata-only columns are projected
  * before any wide operation so 100 TB of media bytes aren't dragged
  * through an exchange.
  */
object Multimodal {

  // ImageIO's default ImageInputStream/ImageOutputStream is DISK-
  // cached: every read()/write() call spools the stream through a
  // fresh temp FILE, so a 5000-image partition pays 10k file
  // create/delete syscalls for payloads that are already in-memory
  // byte arrays (q124/q126 benched 1.3-6 s at sf0.1 purely on FS
  // contention). Memory-cached streams are strictly better here —
  // payloads are bounded per batch and never larger than the heap
  // already holds them. JVM-global, set once when the object loads
  // (executors load it with the task closure).
  javax.imageio.ImageIO.setUseCache(false)

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

  // ---------------------------------------------------------------------
  // REAL image codec — JDK javax.imageio (PNG/JPEG/BMP/GIF with zero
  // added dependencies; offline-safe). This replaces the stub for
  // image payloads the JVM can actually decode; anything else falls
  // back to [[decodeStub]] and is tagged `decoder = "stub"` so a
  // pipeline can SEE which rows went through a real codec.
  // ---------------------------------------------------------------------

  /** One decoded image: real dimensions read from the pixels plus a
    * band-0 sample sum as a deterministic content checksum.
    * `decoder` is "imageio" (real decode) or "stub" (fallback). */
  case class DecodedImage(
      media_id: Long, kind: String, width: Int, height: Int,
      n_pixels: Long, pixel_sum: Long, decoder: String)

  /** PNG signature sniff (the 8-byte magic) — dispatch without
    * throwing a decoder at arbitrary bytes. */
  private[ops] def isPng(p: Array[Byte]): Boolean =
    p.length > 8 && (p(0) & 0xff) == 0x89 &&
      p(1) == 'P' && p(2) == 'N' && p(3) == 'G'

  /** Deterministic grayscale PNG fixture:
    * `pixel(y, x) = (seed·31 + (y·width + x)·7) mod 256`, encoded with
    * the JDK PNG writer. Gray8 PNG is lossless, so a decode reads the
    * exact formula back — the property MultimodalSpec and catalog
    * q124 assert. (The reference carries image URL columns,
    * data/sample-data.csv:1 `Image-URL-{S,M,L}`; this synthesizes the
    * bytes those URLs would fetch, deterministically.) */
  def syntheticPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0,
          ((seed * 31 + (y.toLong * width + x) * 7) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a batch of media records: PNG payloads go through the REAL
    * ImageIO codec (dimensions and pixel sum read from the decoded
    * raster); everything else — non-image kinds, truncated files,
    * formats this JVM lacks a reader for — degrades to the stub with
    * an explicit tag, never an exception (one corrupt blob in 100 TB
    * must not kill the stage). Same batched-`mapPartitions` shape as
    * [[extractFeatures]]: a vectorized codec drops in unchanged. */
  def decodeImages(ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[DecodedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val real: Option[DecodedImage] =
            if (!isPng(r.payload)) None
            else
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(r.payload))
                if (img == null) None
                else {
                  val (w, h) = (img.getWidth, img.getHeight)
                  val raster = img.getRaster
                  var sum = 0L
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
                    y += 1
                  }
                  Some(DecodedImage(r.media_id, r.kind, w, h,
                    w.toLong * h, sum, "imageio"))
                }
              } catch { case scala.util.control.NonFatal(_) => None }
          real.getOrElse {
            val (cs, _) = decodeStub(r.payload)
            DecodedImage(r.media_id, r.kind, r.width, r.height, 0L, cs, "stub")
          }
        }
      }
    }
  }

  /** One resized image: source dims read from the codec, target dims
    * fixed, band-0 sum of the RESIZED raster as content checksum. */
  case class ResizedImage(
      media_id: Long, src_w: Int, src_h: Int, width: Int, height: Int,
      pixel_sum: Long, decoder: String)

  // ---------------------------------------------------------------------
  // REAL audio codec — JDK javax.sound.sampled (WAV/PCM with zero added
  // dependencies; offline-safe). Same contract as the image path: real
  // decode where the payload is readable, tagged stub fallback where it
  // isn't, batched narrow mapPartitions throughout.
  // ---------------------------------------------------------------------

  /** One decoded audio clip: format read from the WAV header, content
    * statistics read from the decoded PCM frames. `sample_sum` is the
    * exact sum of signed 16-bit samples; `energy` the exact sum of
    * their squares (≤ 2³⁰ per sample — far inside int64 for any clip
    * that fits in memory). `decoder` is "wavpcm" or "stub". */
  case class DecodedAudio(
      media_id: Long, kind: String, sample_rate: Int, channels: Int,
      n_samples: Long, sample_sum: Long, energy: Long, decoder: String)

  /** RIFF/WAVE signature sniff — dispatch without throwing a decoder
    * at arbitrary bytes (the image path's isPng analog). */
  private[ops] def isWav(p: Array[Byte]): Boolean =
    p.length > 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Deterministic 16-bit PCM mono WAV fixture:
    * `sample(i) = ((seed·31 + i·7) mod 65536) − 32768`, encoded with
    * the JDK WAV writer. PCM is lossless, so a decode reads the exact
    * formula back — the same closed-form-oracle property as
    * [[syntheticPng]], but over the amplitude axis (sample sum and
    * energy are statable in SQL; a float sine would be neither
    * integer-exact nor portable). */
  def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((seed * 31 + i.toLong * 7) % 65536) - 32768).toInt
      data(2 * i) = (v & 0xff).toByte        // little-endian PCM
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a batch of media records as audio: WAV payloads go through
    * the REAL javax.sound.sampled codec (format from the header, the
    * statistics from the decoded little-endian PCM frames; channels
    * are summed per frame position so a stereo clip still yields one
    * sample stream). Everything else degrades to the tagged stub,
    * never an exception. Batched narrow mapPartitions — full-size
    * clips live and die inside the stage, only fixed-width statistics
    * move on, the shape that carries 100 TB of audio. */
  def decodeAudio(ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[DecodedAudio] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val real: Option[DecodedAudio] =
            if (!isWav(r.payload)) None
            else
              try {
                val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(r.payload))
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
                else {
                  val bytes = ais.readAllBytes()
                  val ch = fmt.getChannels
                  val n = bytes.length / (2 * ch)
                  var (sum, energy) = (0L, 0L)
                  var i = 0
                  while (i < n) {
                    var c = 0
                    var v = 0L
                    while (c < ch) {
                      val o = (i * ch + c) * 2
                      v += ((bytes(o) & 0xff) | (bytes(o + 1).toInt << 8)).toShort
                      c += 1
                    }
                    sum += v
                    energy += v * v
                    i += 1
                  }
                  Some(DecodedAudio(r.media_id, r.kind,
                    fmt.getSampleRate.toInt, ch, n.toLong, sum, energy,
                    "wavpcm"))
                }
              } catch { case scala.util.control.NonFatal(_) => None }
          real.getOrElse {
            val (cs, _) = decodeStub(r.payload)
            DecodedAudio(r.media_id, r.kind, r.sample_rate, 0, 0L, cs, 0L,
              "stub")
          }
        }
      }
    }
  }

  /** Decode + NEAREST-NEIGHBOR resize to `outW`×`outH` in one batched
    * narrow stage. Nearest-neighbor on purpose: the sample index map
    * `src(x2,y2) = (⌊x2·W/outW⌋, ⌊y2·H/outH⌋)` is integer-exact, so
    * the result is bit-reproducible across JVMs AND statable by an
    * external oracle — `Graphics2D` bilinear filtering is neither
    * (platform-dependent rounding). Up- and down-scaling both fall
    * out of the same formula. Payloads never shuffle: decode, sample,
    * and reduce to fixed-size metadata all happen in one
    * mapPartitions pass, the shape that carries full-size frames at
    * 100 TB. Undecodable payloads degrade to the stub checksum with
    * dimensions zeroed (not a throw — one corrupt blob must not kill
    * the stage). */
  def resizeImages(ds: Dataset[MediaRecord], outW: Int, outH: Int,
      batchSize: Int = 64): Dataset[ResizedImage] = {
    require(outW >= 1 && outH >= 1, s"target dims must be >= 1")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val real: Option[ResizedImage] =
            if (!isPng(r.payload)) None
            else
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(r.payload))
                if (img == null) None
                else {
                  val (w, h) = (img.getWidth, img.getHeight)
                  val raster = img.getRaster
                  var sum = 0L
                  var y2 = 0
                  while (y2 < outH) {
                    val sy = y2 * h / outH
                    var x2 = 0
                    while (x2 < outW) {
                      sum += raster.getSample(x2 * w / outW, sy, 0)
                      x2 += 1
                    }
                    y2 += 1
                  }
                  Some(ResizedImage(r.media_id, w, h, outW, outH,
                    sum, "imageio"))
                }
              } catch { case scala.util.control.NonFatal(_) => None }
          real.getOrElse {
            val (cs, _) = decodeStub(r.payload)
            ResizedImage(r.media_id, 0, 0, outW, outH, cs, "stub")
          }
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // VIDEO — frame-sampled decode over a raw-frame container. No video
  // codec ships with the JDK, so the container here is a minimal
  // self-describing raw format (header + fixed-size frames) that makes
  // the SAMPLING ACCESS PATTERN real: the reader seeks directly to the
  // sampled frames' byte ranges and never touches the rest of the
  // payload — the property that matters at 100 TB, where decoding
  // every frame to keep one in four is the difference between a
  // tractable pipeline and a 4× compute bill. A real codec (keyframe
  // seeking in an MP4) drops into the same mapPartitions slot.
  // ---------------------------------------------------------------------

  /** One sampled video frame: container metadata plus the exact
    * unsigned-byte sum of THAT frame's pixels. `decoder` is "gvid"
    * (real container parse) or "stub" (fallback). */
  case class VideoFrame(
      media_id: Long, n_frames: Int, frame_idx: Int, frame_sum: Long,
      decoder: String)

  /** GVID signature sniff (isPng/isWav analog). */
  private[ops] def isGvid(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'G' && p(1) == 'V' && p(2) == 'I' && p(3) == 'D'

  /** Deterministic raw-frame video fixture: header `GVID`, int16
    * width/height, int32 frame count, then `nFrames` frames of
    * `w*h` bytes with `pixel(f, p) = (seed·31 + f·17 + p·7) mod 251`.
    * Raw frames are lossless, so a decode reads the formula back —
    * the closed-form-oracle property of [[syntheticPng]] /
    * [[syntheticWav]], extended along the time axis. */
  def syntheticVideo(seed: Long, nFrames: Int, w: Int, h: Int)
      : Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + nFrames * w * h)
    buf.put("GVID".getBytes("US-ASCII"))
    buf.putShort(w.toShort).putShort(h.toShort).putInt(nFrames)
    var f = 0
    while (f < nFrames) {
      var p = 0
      while (p < w * h) {
        buf.put(((seed * 31 + f.toLong * 17 + p.toLong * 7) % 251).toByte)
        p += 1
      }
      f += 1
    }
    buf.array()
  }

  /** Frame-sampled video decode: every `stride`-th frame up to `maxN`
    * per clip, each frame's statistics computed from ONLY its own
    * byte range (offset arithmetic from the header — unsampled frames
    * are never read). Non-GVID payloads degrade to one tagged stub
    * row, never an exception. Batched narrow mapPartitions: payloads
    * live and die inside the stage; only (id, frame, stats) rows move
    * on. */
  def sampleVideoFrames(ds: Dataset[MediaRecord], stride: Int = 3,
      maxN: Int = 4, batchSize: Int = 64): Dataset[VideoFrame] = {
    import ds.sparkSession.implicits._
    require(stride > 0 && maxN > 0, "stride and maxN must be positive")
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val p = r.payload
          val real: Option[Seq[VideoFrame]] =
            if (!isGvid(p)) None
            else
              try {
                val bb = java.nio.ByteBuffer.wrap(p)
                bb.position(4)
                val w = bb.getShort.toInt
                val h = bb.getShort.toInt
                val n = bb.getInt
                val fs = w * h
                if (n < 0 || fs <= 0 || p.length < 12 + n.toLong * fs) None
                else Some(Iterator.range(0, n, stride).take(maxN).map { f =>
                  val off = 12 + f * fs
                  var sum = 0L
                  var i = 0
                  while (i < fs) { sum += (p(off + i) & 0xff); i += 1 }
                  VideoFrame(r.media_id, n, f, sum, "gvid")
                }.toSeq)
              } catch { case scala.util.control.NonFatal(_) => None }
          real.getOrElse {
            val (cs, _) = decodeStub(p)
            Seq(VideoFrame(r.media_id, 0, -1, cs, "stub"))
          }
        }
      }
    }
  }
}
