package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.CRC32

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Dependency-free reader (plus a spec-conformant fixture writer) for
  * the PUBLIC Apache Puffin file format (iceberg.apache.org/puffin-spec/)
  * and the Iceberg format-version-3 `deletion-vector-v1` blob type
  * (iceberg.apache.org/spec/, "Deletion Vectors") — the v3 analog of
  * the Delta codecs in [[DeletionVectors]]:
  *
  *  - file layout: `Magic("PFA1") | blob… | Magic | FooterPayload(JSON)
  *    | FooterPayloadSize(int32 LE) | Flags(4B) | Magic` — the footer
  *    JSON lists each blob's type/offset/length/properties;
  *  - `deletion-vector-v1` blob framing: combined length of magic +
  *    vector as int32 BE, the 4-byte magic `D1 D3 3D E1`, the bitmap,
  *    then a CRC-32 of magic + bitmap as int32 BE;
  *  - the bitmap is the 64-bit RoaringBitmap "portable" serialization:
  *    int64 LE count of 32-bit bitmaps, then per bitmap an int32 LE
  *    high-32 key (ascending) followed by a standard RoaringFormatSpec
  *    32-bit bitmap — the container core is shared with Delta's
  *    [[RoaringBitmapArray]] (which differs only at the top: magic +
  *    DENSE array instead of sparse keys).
  *
  * Readers of real tables never need the footer: the v3 manifest entry
  * records `content_offset`/`content_size_in_bytes`, so [[readBlob]]
  * seeks straight to the blob. [[readFooter]] exists for tooling and
  * the round-trip specs.
  */
object Puffin {

  private val mapper = new ObjectMapper()

  /** "PFA1" — both the leading magic and the two footer magics. */
  val Magic: Array[Byte] = "PFA1".getBytes(UTF_8)

  /** `deletion-vector-v1` inner magic, in file byte order. */
  val DvMagic: Array[Byte] =
    Array(0xD1, 0xD3, 0x3D, 0xE1).map(_.toByte)

  val DeletionVectorV1 = "deletion-vector-v1"

  final case class BlobMeta(blobType: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long, offset: Long, length: Long,
      compressionCodec: Option[String], properties: Map[String, String])

  final case class Footer(blobs: Seq[BlobMeta],
      properties: Map[String, String])

  /** Parse the footer of a Puffin file. Refuses compressed footer
    * payloads (flag bit 0 — lz4, which this reader does not carry)
    * and any other set flag bit, loudly. */
  def readFooter(path: Path): Footer = {
    val bytes = Files.readAllBytes(path)
    require(bytes.length >= 8 + Magic.length * 3,
      s"puffin: $path too short to be a Puffin file")
    require(bytes.startsWith(Magic), s"puffin: $path lacks leading magic")
    require(bytes.slice(bytes.length - 4, bytes.length).sameElements(Magic),
      s"puffin: $path lacks trailing magic")
    val flags = bytes.slice(bytes.length - 8, bytes.length - 4)
    require(flags.forall(_ == 0),
      s"puffin: $path footer flags ${flags.mkString(",")} not supported " +
        "(compressed footer payload)")
    val size = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    require(size >= 0 && size <= bytes.length - 12 - Magic.length * 2,
      s"puffin: $path implausible footer payload size $size")
    val payloadStart = bytes.length - 12 - size
    require(bytes.slice(payloadStart - 4, payloadStart).sameElements(Magic),
      s"puffin: $path footer start magic missing")
    val json = mapper.readTree(
      new String(bytes, payloadStart, size, UTF_8))
    val blobs = Option(json.get("blobs")).toSeq
      .flatMap(_.elements().asScala)
      .map { b =>
        BlobMeta(
          blobType = b.get("type").asText(),
          fields = Option(b.get("fields")).toSeq
            .flatMap(_.elements().asScala).map(_.asInt()),
          snapshotId = Option(b.get("snapshot-id")).map(_.asLong())
            .getOrElse(-1L),
          sequenceNumber = Option(b.get("sequence-number"))
            .map(_.asLong()).getOrElse(-1L),
          offset = b.get("offset").asLong(),
          length = b.get("length").asLong(),
          compressionCodec = Option(b.get("compression-codec"))
            .filter(!_.isNull).map(_.asText()),
          properties = Option(b.get("properties")).map(p =>
            p.fields().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty))
      }
    val props = Option(json.get("properties")).map(p =>
      p.fields().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)
    Footer(blobs, props)
  }

  /** Read one blob's raw bytes by offset/length — a positioned read,
    * never the whole file (at scale a Puffin DV file can carry many
    * blobs; the manifest entry addresses exactly one). */
  def readBlob(path: Path, offset: Long, length: Long): Array[Byte] = {
    require(length >= 0 && length <= Int.MaxValue,
      s"puffin: implausible blob length $length")
    val ch = java.nio.channels.FileChannel.open(path)
    try {
      val bb = ByteBuffer.allocate(length.toInt)
      ch.position(offset)
      while (bb.hasRemaining) {
        require(ch.read(bb) >= 0,
          s"puffin: EOF reading blob at $offset+$length in $path")
      }
      bb.array()
    } finally ch.close()
  }

  /** Decode a `deletion-vector-v1` blob to SORTED row positions,
    * verifying the framing magic and CRC. */
  def decodeDeletionVector(blob: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val combined = bb.getInt // magic + vector length
    require(combined >= 4 && combined <= blob.length - 8,
      s"puffin: deletion-vector-v1 length $combined does not fit " +
        s"blob of ${blob.length} bytes")
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(magic.sameElements(DvMagic),
      s"puffin: bad deletion-vector-v1 magic ${magic.mkString(",")}")
    val vector = new Array[Byte](combined - 4)
    bb.get(vector)
    val crc = bb.getInt
    val c = new CRC32(); c.update(DvMagic); c.update(vector)
    require(crc == c.getValue.toInt,
      "puffin: deletion-vector-v1 checksum mismatch")
    Roaring64Portable.deserialize(vector)
  }

  /** Encode SORTED positions as a `deletion-vector-v1` blob
    * (framing per the v3 spec; the vector itself uncompressed, as the
    * spec requires). */
  def encodeDeletionVector(positions: Array[Long]): Array[Byte] = {
    val vector = Roaring64Portable.serialize(positions)
    val bb = ByteBuffer.allocate(4 + 4 + vector.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    bb.putInt(4 + vector.length)
    bb.put(DvMagic)
    bb.put(vector)
    val c = new CRC32(); c.update(DvMagic); c.update(vector)
    bb.putInt(c.getValue.toInt)
    bb.array()
  }

  val ThetaV1 = "apache-datasketches-theta-v1"

  /** Estimate of a COMPACT Theta sketch (the Apache DataSketches
    * serialization the Iceberg Puffin spec mandates for
    * `apache-datasketches-theta-v1` NDV blobs; format per the
    * published DataSketches memory layout, serial version 3):
    *
    *  - byte 0 preamble longs (1 empty/single-item, 2 exact,
    *    3 estimation), byte 1 serVer (3), byte 2 family (3 =
    *    COMPACT), byte 5 flags (bit 0 big-endian, 1 read-only,
    *    2 empty, 3 compact, 4 ordered), bytes 6-7 seed hash;
    *  - preLongs 2: long 1 low half = retained count (theta = 1, the
    *    estimate IS the count); preLongs 3: long 2 = thetaLong and
    *    estimate = retained / (thetaLong / 2^63);
    *  - preLongs 1, not empty: the single-item form (estimate 1).
    *
    * Refuses big-endian and non-compact families loudly — a guessed
    * NDV silently mis-sizes every downstream join. */
  def thetaEstimate(blob: Array[Byte]): Long = {
    require(blob.length >= 8, s"puffin: theta blob too short (${blob.length})")
    val preLongs = blob(0) & 0x3f
    val serVer = blob(1) & 0xff
    val family = blob(2) & 0xff
    val flags = blob(5) & 0xff
    require(serVer == 3,
      s"puffin: theta sketch serialization version $serVer not supported (3)")
    require(family == 3,
      s"puffin: sketch family $family is not COMPACT theta (3)")
    require((flags & 0x01) == 0,
      "puffin: big-endian theta sketches not supported")
    val empty = (flags & 0x04) != 0
    if (empty) return 0L
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    preLongs match {
      case 1 => 1L // single-item compact form
      case 2 =>
        val retained = bb.getInt(8)
        require(retained >= 0, s"puffin: negative retained count $retained")
        retained.toLong // exact mode: theta = 1
      case 3 =>
        val retained = bb.getInt(8)
        val thetaLong = bb.getLong(16)
        require(retained >= 0 && thetaLong > 0,
          s"puffin: implausible theta preamble ($retained, $thetaLong)")
        math.round(retained.toDouble * (Long.MaxValue.toDouble / thetaLong))
      case other => throw new IllegalArgumentException(
        s"puffin: theta preamble of $other longs not supported")
    }
  }

  /** Serialize an NDV as a spec-shaped compact ORDERED theta sketch
    * whose ESTIMATE decodes to exactly `ndv`: empty (0), single-item
    * (1), exact mode when ndv fits the nominal 4096 entries, else
    * estimation mode with thetaLong sized so retained/theta = ndv.
    * DIVERGENCE, stated: the retained hash values are a uniform grid
    * below theta, not murmur hashes of the actual column values — the
    * estimate (what NDV consumers read) is exact, but merging this
    * sketch with a value-hashed one degrades to the grid's estimate.
    * The paired blob `properties.ndv` carries the authoritative
    * number, which Iceberg engines read preferentially. */
  def encodeThetaSketch(ndv: Long): Array[Byte] = {
    require(ndv >= 0, s"puffin: negative ndv $ndv")
    val seedHash: Short = 0x93cc.toShort // the default-seed hash
    def header(preLongs: Int, flags: Int): ByteBuffer = {
      val retained = if (preLongs == 1) 0 else math.min(ndv, 4096L).toInt
      val bb = ByteBuffer.allocate(
        preLongs * 8 + (if (preLongs == 1 && ndv == 1) 8
        else retained * 8)).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(preLongs.toByte).put(3.toByte).put(3.toByte)
        .put(12.toByte).put(0.toByte).put(flags.toByte)
        .putShort(seedHash)
      bb
    }
    val ReadOnly = 0x02; val Empty = 0x04; val Compact = 0x08
    val Ordered = 0x10
    if (ndv == 0L)
      header(1, ReadOnly | Empty | Compact | Ordered).array()
    else if (ndv == 1L) {
      val bb = header(1, ReadOnly | Compact | Ordered)
      bb.putLong(Long.MaxValue / 3) // one arbitrary in-range hash
      bb.array()
    } else if (ndv <= 4096L) {
      val bb = header(2, ReadOnly | Compact | Ordered)
      bb.putInt(ndv.toInt) // retained; theta = 1 (exact mode)
      bb.putFloat(1.0f)
      var i = 0L
      val step = Long.MaxValue / (ndv + 1)
      while (i < ndv) { bb.putLong((i + 1) * step); i += 1 }
      bb.array()
    } else {
      val retained = 4096
      val thetaLong = math.max(1L,
        (Long.MaxValue.toDouble * retained / ndv).toLong)
      val bb = header(3, ReadOnly | Compact | Ordered)
      bb.putInt(retained)
      bb.putFloat(1.0f)
      bb.putLong(thetaLong)
      val step = thetaLong / (retained + 1)
      var i = 0
      while (i < retained) { bb.putLong((i + 1L) * step); i += 1 }
      bb.array()
    }
  }

  /** Write a Puffin STATISTICS file (one `apache-datasketches-theta-v1`
    * blob per column) and return what the metadata.json `statistics`
    * entry records: the per-blob metadata (field id, offset, length,
    * the spec's `ndv` property) plus the file and footer sizes. */
  final case class StatsBlob(fieldId: Int, ndv: Long, offset: Long,
      length: Long)
  final case class WrittenStats(path: Path, fileSize: Long,
      footerSize: Long, blobs: Seq[StatsBlob])

  def writeStatsFile(path: Path, snapshotId: Long, sequenceNumber: Long,
      ndvs: Seq[(Int, Long)]): WrittenStats = {
    require(ndvs.nonEmpty, "puffin: no NDV blobs to write")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val written = ndvs.map { case (fieldId, ndv) =>
      val blob = encodeThetaSketch(ndv)
      val off = out.size().toLong
      out.write(blob)
      StatsBlob(fieldId, ndv, off, blob.length.toLong)
    }
    val blobsJson = written.map { b =>
      val f = mapper.createObjectNode()
      f.put("type", ThetaV1)
      f.putArray("fields").add(b.fieldId)
      f.put("snapshot-id", snapshotId)
      f.put("sequence-number", sequenceNumber)
      f.put("offset", b.offset)
      f.put("length", b.length)
      f.putObject("properties").put("ndv", b.ndv.toString)
      f
    }
    val footer = mapper.createObjectNode()
    val arr = footer.putArray("blobs")
    blobsJson.foreach(arr.add)
    footer.putObject("properties").put("created-by", "graft")
    val payload = mapper.writeValueAsString(footer).getBytes(UTF_8)
    out.write(Magic)
    out.write(payload)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed
    out.write(Magic)
    Files.createDirectories(path.getParent)
    val bytes = out.toByteArray
    Files.write(path, bytes)
    // footer size per the Iceberg StatisticsFile contract: magic +
    // payload + size word + flags + magic
    WrittenStats(path, bytes.length.toLong,
      (Magic.length * 2 + payload.length + 8).toLong, written)
  }

  /** One written blob's addressing, exactly what a v3 delete-manifest
    * entry records. */
  final case class WrittenBlob(referencedDataFile: String, offset: Long,
      length: Long, cardinality: Long)

  /** Write a Puffin file holding one `deletion-vector-v1` blob per
    * (referenced data file → sorted positions) pair, with the
    * spec-required `referenced-data-file` / `cardinality` blob
    * properties and an uncompressed JSON footer. The writer side of
    * [[readBlob]]/[[decodeDeletionVector]] — fixtures, specs, and the
    * v3 DELETE path. */
  def writeDvFile(path: Path, snapshotId: Long, sequenceNumber: Long,
      dvs: Seq[(String, Array[Long])]): Seq[WrittenBlob] = {
    require(dvs.nonEmpty, "puffin: no deletion vectors to write")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val written = dvs.map { case (dataFile, positions) =>
      val blob = encodeDeletionVector(positions)
      val off = out.size().toLong
      out.write(blob)
      (dataFile, off, blob.length.toLong, positions.length.toLong)
    }
    val blobsJson = written.map { case (dataFile, off, len, card) =>
      val f = mapper.createObjectNode()
      f.put("type", DeletionVectorV1)
      val fields = f.putArray("fields")
      fields.add(IcebergMeta.DeletePosFieldId)
      f.put("snapshot-id", snapshotId)
      f.put("sequence-number", sequenceNumber)
      f.put("offset", off)
      f.put("length", len)
      val props = f.putObject("properties")
      props.put("referenced-data-file", dataFile)
      props.put("cardinality", card.toString)
      f
    }
    val footer = mapper.createObjectNode()
    val arr = footer.putArray("blobs")
    blobsJson.foreach(arr.add)
    footer.putObject("properties").put("created-by", "graft")
    val payload = mapper.writeValueAsString(footer).getBytes(UTF_8)
    out.write(Magic)
    out.write(payload)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed
    out.write(Magic)
    Files.createDirectories(path.getParent)
    Files.write(path, out.toByteArray)
    written.map { case (dataFile, off, len, card) =>
      WrittenBlob(dataFile, off, len, card) }
  }

  /** The 64-bit RoaringBitmap "portable" serialization (the
    * RoaringFormatSpec's cross-language form, which Iceberg v3
    * mandates for deletion vectors): int64 LE bitmap count, then per
    * bitmap an int32 LE high-32 key in ASCENDING order followed by a
    * standard 32-bit bitmap. Sparse keys — unlike Delta's dense
    * [[RoaringBitmapArray]] — so a DV over positions near 2^33 costs
    * two keyed bitmaps, not 2^33/2^32 array slots. */
  object Roaring64Portable {

    def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val n = bb.getLong
      require(n >= 0 && n <= Int.MaxValue,
        s"puffin: implausible portable-roaring64 bitmap count $n")
      val out = Array.newBuilder[Long]
      var i = 0L
      var lastKey = -1L
      while (i < n) {
        val key = bb.getInt & 0xffffffffL
        require(key > lastKey,
          s"puffin: portable-roaring64 keys not ascending ($key after $lastKey)")
        lastKey = key
        RoaringBitmapArray.readBitmap32(bb,
          v => out += (key << 32) | (v & 0xffffffffL))
        i += 1
      }
      out.result()
    }

    def serialize(positions: Array[Long]): Array[Byte] = {
      require(positions.sameElements(positions.sorted),
        "puffin: positions must be sorted")
      require(positions.forall(_ >= 0), "puffin: negative position")
      val byKey = positions.groupBy(_ >>> 32).toSeq.sortBy(_._1)
      val bitmaps = byKey.map { case (key, vs) =>
        key -> RoaringBitmapArray.serializeBitmap32(
          vs.map(v => (v & 0xffffffffL).toInt))
      }
      val bb = ByteBuffer.allocate(
        8 + bitmaps.map(4 + _._2.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(bitmaps.size.toLong)
      bitmaps.foreach { case (key, data) =>
        bb.putInt(key.toInt)
        bb.put(data)
      }
      bb.array()
    }
  }
}
