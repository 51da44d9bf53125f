package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world", "en", "src0", 11L),
    (1L, "abc", "de", "src1", 3L),
    (2L, "x" * 200, "en", "src0", 200L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("fromDocuments: typed records with deterministic kinds/payloads") {
    val ds = Multimodal.fromDocuments(docs)
    val byId = ds.collect().map(r => r.media_id -> r).toMap
    assert(byId(0L).kind === "image" && byId(1L).kind === "audio"
      && byId(2L).kind === "video")
    assert(new String(byId(1L).payload, "UTF-8") === "abc")
    assert(byId(0L).width === 1 && byId(2L).height === 3)
  }

  test("extractFeatures: checksum matches the parity hash, batching intact") {
    val out = Multimodal.extractFeatures(Multimodal.fromDocuments(docs),
      batchSize = 2).collect().map(r => r.media_id -> r).toMap
    // "abc" -> same fold as TextOps.polyHash: 96354
    assert(out(1L).checksum === 96354L)
    assert(out(1L).n_bytes === 3L)
    assert(out(1L).n_frames === 1)
    assert(out(2L).n_frames === 3)
    assert(out(0L).features.length === 8)
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .collect().map(r => r.media_id -> r.checksum).toMap
    assert(again === out.view.mapValues(_.checksum).toMap)
  }

  test("decodeImages: real ImageIO decode reads back the generated pixels") {
    val recs = Seq(
      Multimodal.MediaRecord(7L, "image",
        Multimodal.syntheticPng(7L, 5, 3), 5, 3, 0),
      Multimodal.MediaRecord(2L, "image",
        Multimodal.syntheticPng(2L, 1, 1), 1, 1, 0),
      // non-PNG payload: must fall back to the stub, loudly tagged
      Multimodal.MediaRecord(9L, "audio",
        "not an image".getBytes("UTF-8"), 9, 9, 0),
      // PNG magic but truncated body: decoder failure degrades, never throws
      Multimodal.MediaRecord(4L, "image",
        Multimodal.syntheticPng(4L, 4, 4).take(12), 4, 4, 0))
      .toDS()
    val out = Multimodal.decodeImages(recs, batchSize = 2)
      .collect().map(r => r.media_id -> r).toMap
    val d7 = out(7L)
    assert(d7.decoder === "imageio")
    // decoded DIMENSIONS come from the codec, not the metadata columns
    assert(d7.width === 5 && d7.height === 3 && d7.n_pixels === 15L)
    // decoded pixel sum == the generator formula (lossless roundtrip)
    val expect7 = (0 until 15).map(i => (7L * 31 + i * 7) % 256).sum
    assert(d7.pixel_sum === expect7)
    val d2 = out(2L)
    assert(d2.decoder === "imageio" && d2.width === 1 && d2.height === 1)
    assert(d2.pixel_sum === (2L * 31) % 256)
    assert(out(9L).decoder === "stub" && out(9L).width === 9)
    assert(out(4L).decoder === "stub")
  }

  test("resizeImages: nearest-neighbor matches the index-map formula") {
    def gen(seed: Long, w: Int, h: Int)(y: Int, x: Int): Long =
      (seed * 31 + (y.toLong * w + x) * 7) % 256
    val recs = Seq(
      Multimodal.MediaRecord(3L, "image",
        Multimodal.syntheticPng(3L, 6, 5), 6, 5, 0), // downscale
      Multimodal.MediaRecord(5L, "image",
        Multimodal.syntheticPng(5L, 2, 2), 2, 2, 0), // upscale
      Multimodal.MediaRecord(8L, "audio",
        "noise".getBytes("UTF-8"), 0, 0, 0))
      .toDS()
    val out = Multimodal.resizeImages(recs, outW = 4, outH = 4)
      .collect().map(r => r.media_id -> r).toMap
    def expect(seed: Long, w: Int, h: Int): Long =
      (for (y2 <- 0 until 4; x2 <- 0 until 4)
        yield gen(seed, w, h)(y2 * h / 4, x2 * w / 4)).sum
    val d3 = out(3L)
    assert(d3.decoder === "imageio" && d3.src_w === 6 && d3.src_h === 5)
    assert(d3.width === 4 && d3.height === 4)
    assert(d3.pixel_sum === expect(3L, 6, 5))
    // upscale repeats source pixels through the same formula
    assert(out(5L).pixel_sum === expect(5L, 2, 2))
    assert(out(8L).decoder === "stub")
  }

  test("decodeAudio: WAV round-trip reads the waveform formula back") {
    def sample(seed: Long, i: Int): Long =
      ((seed * 31 + i.toLong * 7) % 65536) - 32768
    val recs = Seq(
      Multimodal.MediaRecord(7L, "audio",
        Multimodal.syntheticWav(7L, 40, 16000), 0, 0, 16000),
      Multimodal.MediaRecord(2L, "audio",
        Multimodal.syntheticWav(2L, 1, 8000), 0, 0, 8000), // 1-sample clip
      Multimodal.MediaRecord(9L, "audio",
        "not a wav at all".getBytes("UTF-8"), 0, 0, 44100),
      Multimodal.MediaRecord(4L, "audio", // RIFF magic, truncated junk
        "RIFF1234WAVEjunk".getBytes("UTF-8"), 0, 0, 44100))
      .toDS()
    val out = Multimodal.decodeAudio(recs, batchSize = 2)
      .collect().map(r => r.media_id -> r).toMap
    val d7 = out(7L)
    assert(d7.decoder === "wavpcm" && d7.sample_rate === 16000 &&
      d7.channels === 1 && d7.n_samples === 40L)
    assert(d7.sample_sum === (0 until 40).map(sample(7L, _)).sum)
    assert(d7.energy ===
      (0 until 40).map(i => sample(7L, i) * sample(7L, i)).sum)
    val d2 = out(2L)
    assert(d2.decoder === "wavpcm" && d2.n_samples === 1L &&
      d2.sample_sum === sample(2L, 0))
    // undecodable payloads degrade to the tagged stub, never a throw
    assert(out(9L).decoder === "stub" && out(9L).n_samples === 0L)
    assert(out(4L).decoder === "stub")
  }

  test("decodeAudio: stereo channels sum per frame position") {
    // hand-built 2-channel WAV: frames (L,R) = (100,-30), (-7,7)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = Array[Short](100, -30, -7, 7)
    val bytes = new Array[Byte](pcm.length * 2)
    pcm.zipWithIndex.foreach { case (v, i) =>
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, 2L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Multimodal.decodeAudio(Seq(Multimodal.MediaRecord(
        1L, "audio", bos.toByteArray, 0, 0, 8000)).toDS())
      .collect().head
    assert(out.decoder === "wavpcm" && out.channels === 2 &&
      out.n_samples === 2L)
    assert(out.sample_sum === 70L) // (100-30) + (-7+7)
    assert(out.energy === 70L * 70L)
  }

  test("sampleFrames: stride + cap arithmetic, no payload needed") {
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
    val s = Multimodal.sampleFrames(feats, stride = 1, maxN = 2)
      .select(col("media_id"), col("n_sampled"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s(1L) === 1) // 1 frame -> 1 sample
    assert(s(2L) === 2) // 3 frames capped at 2
  }

  test("sampleVideoFrames: container parse reads the pixel formula " +
      "back for sampled frames only; junk degrades to stub") {
    import spark.implicits._
    val seed = 7L
    val rec = Multimodal.MediaRecord(seed, "video",
      Multimodal.syntheticVideo(seed, nFrames = 8, w = 4, h = 3), 4, 3, 0)
    val junk = Multimodal.MediaRecord(99L, "video",
      Array[Byte](1, 2, 3), 0, 0, 0)
    val out = Multimodal.sampleVideoFrames(
        Seq(rec, junk).toDS(), stride = 3, maxN = 4)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    // clip of 8 frames at stride 3 -> frames 0, 3, 6
    val vid = out.filter(_.media_id == seed)
    assert(vid.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    assert(vid.forall(_.n_frames == 8))
    assert(vid.forall(_.decoder == "gvid"))
    def expectedSum(f: Int): Long =
      (0 until 12).map(p => (seed * 31 + f * 17 + p * 7) % 251).sum
    vid.foreach(v => assert(v.frame_sum == expectedSum(v.frame_idx),
      s"frame ${v.frame_idx}: ${v.frame_sum} != ${expectedSum(v.frame_idx)}"))
    // junk payload: one stub-tagged row, no exception
    val st = out.filter(_.media_id == 99L)
    assert(st.length == 1 && st.head.decoder == "stub" &&
      st.head.frame_idx == -1)
  }
}
