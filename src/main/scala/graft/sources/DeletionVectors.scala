package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.CRC32

/** Dependency-free codecs for Delta Lake DELETION VECTORS, from the
  * published protocol (delta.io `PROTOCOL.md`, "Deletion Vectors" +
  * "Deletion Vector Format" sections):
  *
  *  - [[Z85]] — RFC-1924/ZeroMQ base85 (the `pathOrInlineDv`
  *    encoding: 5 chars ↔ 4 bytes, the spec's alphabet);
  *  - [[RoaringBitmapArray]] — the "portable" serialization of
  *    Delta's 64-bit roaring bitmap: magic 1681511377, a DENSE array
  *    of standard 32-bit RoaringBitmaps (RoaringFormatSpec: cookies
  *    12346/12347, array/bitmap/run containers), high-32 index = the
  *    bitmap's position in the array;
  *  - [[DeletionVectors]] — descriptor resolution (inline `i`,
  *    UUID-relative `u`, absolute `p`), the on-disk framing (version
  *    byte; per-DV `[size int32 BE][data][crc32 int32 BE]`), and a
  *    conformant writer for fixtures and tests.
  *
  * Positions are PHYSICAL row indices in the data file — exactly what
  * Spark's parquet `_metadata.row_index` reports, which is how
  * [[graft.ext.DeltaMorScan]] applies them.
  */
object Z85 {
  private val alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val decodeMap: Array[Int] = {
    val m = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
    m
  }

  /** Encode bytes (length MUST be a multiple of 4 — the caller pads;
    * Delta's codec pads with zeros and records the true length in the
    * descriptor's sizeInBytes). */
  def encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85: length ${bytes.length} not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85: length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) decodeMap(c.toInt) else -1
        require(d >= 0, s"z85: invalid character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      o += 4
      i += 5
    }
    out
  }
}

object RoaringBitmapArray {

  /** Magic number of Delta's portable RoaringBitmapArray format. */
  val Magic = 1681511377

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Deserialize to SORTED row positions. Parses all three standard
    * container types (array, bitmap, run) — real writers emit any. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic,
      s"deletion vector: bad magic $magic (expected $Magic)")
    val numBitmaps = bb.getLong
    require(numBitmaps >= 0 && numBitmaps <= Int.MaxValue,
      s"deletion vector: implausible bitmap count $numBitmaps")
    val out = Array.newBuilder[Long]
    var hi = 0L
    while (hi < numBitmaps) {
      readBitmap32(bb, v => out += (hi << 32) | (v & 0xffffffffL))
      hi += 1
    }
    out.result()
  }

  /** One standard-format 32-bit RoaringBitmap, emitting each value.
    * `private[sources]`: [[Puffin]] reuses the container parser for
    * Iceberg v3's 64-bit "portable" serialization (same
    * RoaringFormatSpec core, keyed rather than dense at the top). */
  private[sources] def readBitmap32(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = bb.getInt
    val (numContainers, runFlags): (Int, Array[Boolean]) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Boolean](n)
        val flagBytes = new Array[Byte]((n + 7) / 8)
        bb.get(flagBytes)
        var i = 0
        while (i < n) {
          flags(i) = (flagBytes(i / 8) & (1 << (i % 8))) != 0
          i += 1
        }
        (n, flags)
      } else if (cookie == SerialCookieNoRun) {
        (bb.getInt, Array.empty[Boolean])
      } else throw new IllegalStateException(
        s"deletion vector: unknown roaring cookie $cookie")
    val keys = new Array[Int](numContainers)
    val cards = new Array[Int](numContainers)
    var i = 0
    while (i < numContainers) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    val hasRun = runFlags.nonEmpty
    val hasOffsets = !hasRun || numContainers >= NoOffsetThreshold
    if (hasOffsets) bb.position(bb.position() + 4 * numContainers)
    i = 0
    while (i < numContainers) {
      val base = keys(i) << 16
      val isRun = hasRun && runFlags(i)
      if (isRun) {
        val numRuns = bb.getShort & 0xffff
        var r = 0
        while (r < numRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff // stored as length - 1
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitmap container: 1024 × 64-bit words
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          var bit = 0
          while (word != 0) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            bit += t
            emit(base | (w * 64 + bit))
            word = word >>> t >>> 1
            bit += 1
          }
          w += 1
        }
      } else {
        var c = 0
        while (c < cards(i)) { emit(base | (bb.getShort & 0xffff)); c += 1 }
      }
      i += 1
    }
  }

  /** Serialize SORTED positions (writer side: fixtures/tests). Emits
    * cookie-12346 array/bitmap containers only — always legal; run
    * containers are an optional compression real writers may choose. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    require(positions.sameElements(positions.sorted),
      "deletion vector: positions must be sorted")
    val byHi = positions.groupBy(_ >>> 32)
    val numBitmaps = if (positions.isEmpty) 0L else byHi.keys.max + 1
    val bitmaps = (0L until numBitmaps).map { hi =>
      serializeBitmap32(byHi.getOrElse(hi, Array.empty)
        .map(v => (v & 0xffffffffL).toInt))
    }
    val bb = ByteBuffer.allocate(12 + bitmaps.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(numBitmaps)
    bitmaps.foreach(bb.put)
    bb.array()
  }

  private[sources] def serializeBitmap32(values: Array[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    val containers = byKey.map { case (key, vs) =>
      val lows = vs.map(_ & 0xffff).sorted
      if (lows.length > 4096) {
        val words = new Array[Long](1024)
        lows.foreach(v => words(v / 64) |= (1L << (v % 64)))
        val cb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(cb.putLong)
        (key, lows.length, cb.array())
      } else {
        val cb = ByteBuffer.allocate(2 * lows.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        lows.foreach(v => cb.putShort(v.toShort))
        (key, lows.length, cb.array())
      }
    }
    val n = containers.size
    val headerSize = 8 + 4 * n + 4 * n // cookie+count, desc, offsets
    val bb = ByteBuffer.allocate(
      headerSize + containers.map(_._3.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun)
    bb.putInt(n)
    containers.foreach { case (k, card, _) =>
      bb.putShort(k.toShort); bb.putShort((card - 1).toShort)
    }
    var off = headerSize
    containers.foreach { case (_, _, data) =>
      bb.putInt(off); off += data.length
    }
    containers.foreach { case (_, _, data) => bb.put(data) }
    bb.array()
  }
}

object DeletionVectors {

  /** The `deletionVector` struct of an `add` action. `offset` is the
    * position of the size-prefixed entry inside the DV file (absent
    * for inline). */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  /** On-disk file a descriptor's bitmap lives in — None for inline
    * ('i') descriptors. 'u': pathOrInlineDv = [random prefix]<20-char
    * z85 UUID>, the file is <root>/[prefix/]deletion_vector_<uuid>.bin;
    * 'p': an absolute path. Vacuum uses this to keep live DV files. */
  def fileOf(root: String, d: Descriptor): Option[Path] =
    d.storageType match {
      case "p" => Some(Paths.get(d.pathOrInlineDv))
      case "u" =>
        val enc = d.pathOrInlineDv
        require(enc.length >= 20,
          s"deletion vector: bad UUID encoding '$enc'")
        val (prefix, uuidEnc) = enc.splitAt(enc.length - 20)
        val ub = ByteBuffer.wrap(Z85.decode(uuidEnc))
        val uuid = new java.util.UUID(ub.getLong, ub.getLong)
        val dir = if (prefix.isEmpty) Paths.get(root)
          else Paths.get(root, prefix)
        Some(dir.resolve(s"deletion_vector_$uuid.bin"))
      case _ => None
    }

  /** Resolve a descriptor to sorted deleted row positions. */
  def read(root: String, d: Descriptor): Array[Long] = {
    val data = d.storageType match {
      case "i" =>
        Z85.decode(d.pathOrInlineDv).take(d.sizeInBytes)
      case "u" | "p" =>
        val file = fileOf(root, d).get
        val bytes = Files.readAllBytes(file)
        require(bytes.nonEmpty && bytes(0) == 1,
          s"deletion vector: unsupported DV file version in $file")
        val off = d.offset.getOrElse(throw new IllegalStateException(
          s"deletion vector: storageType ${d.storageType} requires offset"))
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        bb.position(off)
        val len = bb.getInt
        require(len == d.sizeInBytes,
          s"deletion vector: size $len != descriptor ${d.sizeInBytes}")
        val data = new Array[Byte](len)
        bb.get(data)
        val crc = bb.getInt
        val c = new CRC32(); c.update(data)
        require(crc == c.getValue.toInt,
          s"deletion vector: checksum mismatch in $file")
        data
      case other => throw new UnsupportedOperationException(
        s"deletion vector: storageType '$other' not supported")
    }
    val positions = RoaringBitmapArray.deserialize(data)
    require(positions.length == d.cardinality,
      s"deletion vector: decoded ${positions.length} positions, " +
        s"descriptor says ${d.cardinality}")
    positions
  }

  /** Write positions as a UUID-named DV FILE under `root` (spec
    * framing: version byte 1; `[size BE][data][crc32 BE]`) and return
    * the `u`-descriptor — the fixture/writer side of [[read]]. */
  def writeFile(root: String, positions: Array[Long]): Descriptor = {
    val data = RoaringBitmapArray.serialize(positions)
    val uuid = java.util.UUID.randomUUID()
    val file = Paths.get(root, s"deletion_vector_$uuid.bin")
    val bb = ByteBuffer.allocate(1 + 4 + data.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    bb.put(1.toByte)
    bb.putInt(data.length)
    bb.put(data)
    val c = new CRC32(); c.update(data)
    bb.putInt(c.getValue.toInt)
    Files.write(file, bb.array())
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    Descriptor("u", Z85.encode(ub.array()), Some(1), data.length,
      positions.length)
  }

  /** The inline (`i`) descriptor for small DVs — z85 of the bitmap,
    * zero-padded to a multiple of 4 with the true length recorded. */
  def inline(positions: Array[Long]): Descriptor = {
    val data = RoaringBitmapArray.serialize(positions)
    val padded = java.util.Arrays.copyOf(data, (data.length + 3) / 4 * 4)
    Descriptor("i", Z85.encode(padded), None, data.length,
      positions.length)
  }
}
