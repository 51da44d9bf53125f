package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The [[Puffin]] codecs: portable roaring64 (array/bitmap container
  * sizes, sparse high keys), `deletion-vector-v1` framing (length,
  * magic, CRC), and the Puffin file layout (blobs + JSON footer) —
  * byte-level round-trips plus corruption refusals, no Spark. */
class PuffinSpec extends AnyFunSuite {

  test("roaring64 portable round-trips array, bitmap and sparse keys") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(7L, 8L, 63L, 4096L),
      // > 4096 values in one 16-bit container → bitmap container
      (0L until 5000L).toArray,
      // sparse high-32 keys: 0, 3, and one past 2^33
      Array(1L, (3L << 32) | 5L, (8L << 32) | 123456L),
      // container boundary values
      Array(65535L, 65536L, (1L << 32) - 1, 1L << 32))
    cases.foreach { ps =>
      if (ps.isEmpty)
        assert(Puffin.Roaring64Portable
          .deserialize(Puffin.Roaring64Portable.serialize(ps)).isEmpty)
      else
        assert(Puffin.Roaring64Portable
          .deserialize(Puffin.Roaring64Portable.serialize(ps))
          .sameElements(ps), s"case ${ps.take(5).mkString(",")}…")
    }
  }

  test("deletion-vector-v1 blob round-trips; corruption refuses") {
    val ps = Array(0L, 5L, 9999L, (2L << 32) | 17L)
    val blob = Puffin.encodeDeletionVector(ps)
    assert(Puffin.decodeDeletionVector(blob).sameElements(ps))
    // flip one bitmap byte → CRC refusal
    val bad = blob.clone()
    bad(10) = (bad(10) ^ 0x7f).toByte
    val e = intercept[IllegalArgumentException](
      Puffin.decodeDeletionVector(bad))
    assert(e.getMessage.contains("checksum") ||
      e.getMessage.contains("magic"))
    // wrong inner magic refuses by name
    val badMagic = blob.clone()
    badMagic(4) = 0
    assert(intercept[IllegalArgumentException](
      Puffin.decodeDeletionVector(badMagic))
      .getMessage.contains("magic"))
  }

  test("puffin file: blobs address through footer and manifest-style offsets") {
    val dir = Files.createTempDirectory("puffin_spec_")
    val f = dir.resolve("dv.puffin")
    val a = Array(1L, 2L, 3L)
    val b = Array(10L, 20L, 1L << 33)
    val written = Puffin.writeDvFile(f, snapshotId = 42L,
      sequenceNumber = 7L, Seq("data/a.parquet" -> a, "data/b.parquet" -> b))
    assert(written.map(_.referencedDataFile) ===
      Seq("data/a.parquet", "data/b.parquet"))
    assert(written.map(_.cardinality) === Seq(3L, 3L))
    // the manifest route: offset/length alone, no footer parse
    written.zip(Seq(a, b)).foreach { case (w, ps) =>
      assert(Puffin.decodeDeletionVector(
        Puffin.readBlob(f, w.offset, w.length)).sameElements(ps))
    }
    // the footer route agrees with what the writer returned
    val footer = Puffin.readFooter(f)
    assert(footer.blobs.map(_.blobType).forall(_ == "deletion-vector-v1"))
    assert(footer.blobs.map(b0 => (b0.offset, b0.length)) ===
      written.map(w => (w.offset, w.length)))
    assert(footer.blobs.map(
      _.properties("referenced-data-file")) ===
      Seq("data/a.parquet", "data/b.parquet"))
    assert(footer.blobs.map(_.properties("cardinality")) ===
      Seq("3", "3"))
    assert(footer.blobs.map(_.snapshotId).forall(_ == 42L))
    assert(footer.blobs.map(_.sequenceNumber).forall(_ == 7L))
    // compressed-footer flag refuses loudly
    val bytes = Files.readAllBytes(f)
    bytes(bytes.length - 8) = 1 // flag byte 0, bit 0
    val g = dir.resolve("flagged.puffin")
    Files.write(g, bytes)
    assert(intercept[IllegalArgumentException](Puffin.readFooter(g))
      .getMessage.contains("flags"))
  }
}
