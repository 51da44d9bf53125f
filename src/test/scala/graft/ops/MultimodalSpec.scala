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

  test("sampleFrames: stride + cap arithmetic, no payload needed") {
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
    val s = Multimodal.sampleFrames(feats, stride = 1, maxN = 2)
      .select(col("media_id"), col("n_sampled"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s(1L) === 1) // 1 frame -> 1 sample
    assert(s(2L) === 2) // 3 frames capped at 2
  }
}
