package graft.sources.lance

import scala.collection.mutable.ArrayBuffer

/** Minimal protobuf wire-format walker — enough to read Lance manifests
  * and file metadata without a generated proto stack (the container has no
  * protoc/protobuf-java; the messages we need are tiny).
  *
  * Wire reference: protobuf encoding spec (public). Message layouts follow
  * lance's public `format.proto`/`file2.proto` as evidenced in the golden
  * dataset bytes (/root/reference/test/test_data.lance — SURVEY §1.1).
  */
object Proto {

  /** One decoded field occurrence. */
  final case class PField(tag: Int, wire: Int, varint: Long, bytes: Array[Byte])

  /** Decode all top-level fields of a message. */
  def parse(buf: Array[Byte], from: Int, until: Int): Seq[PField] = {
    val out = ArrayBuffer.empty[PField]
    var p = from
    while (p < until) {
      val (key, p1) = readVarint(buf, p)
      val tag = (key >>> 3).toInt
      val wire = (key & 7).toInt
      wire match {
        case 0 => // varint
          val (v, p2) = readVarint(buf, p1)
          out += PField(tag, wire, v, null); p = p2
        case 1 => // fixed64
          out += PField(tag, wire, readFixed64(buf, p1), null); p = p1 + 8
        case 2 => // length-delimited
          val (len, p2) = readVarint(buf, p1)
          out += PField(tag, wire, len, java.util.Arrays.copyOfRange(buf, p2, p2 + len.toInt))
          p = p2 + len.toInt
        case 5 => // fixed32
          out += PField(tag, wire, readFixed32(buf, p1), null); p = p1 + 4
        case w => throw new IllegalArgumentException(s"unsupported wire type $w at $p")
      }
    }
    out.toSeq
  }

  def parse(buf: Array[Byte]): Seq[PField] = parse(buf, 0, buf.length)

  def readVarint(buf: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos; var shift = 0; var v = 0L
    while ({
      val b = buf(p) & 0xff
      v |= (b & 0x7fL) << shift
      p += 1; shift += 7
      (b & 0x80) != 0
    }) ()
    (v, p)
  }

  def readFixed64(buf: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
    v
  }

  def readFixed32(buf: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = 3
    while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
    v
  }

  // --- field accessors ---------------------------------------------------
  def all(fs: Seq[PField], tag: Int): Seq[PField] = fs.filter(_.tag == tag)
  def firstVarint(fs: Seq[PField], tag: Int): Option[Long] =
    fs.find(f => f.tag == tag && f.wire == 0).map(_.varint)
  def firstBytes(fs: Seq[PField], tag: Int): Option[Array[Byte]] =
    fs.find(f => f.tag == tag && f.wire == 2).map(_.bytes)
  def firstString(fs: Seq[PField], tag: Int): Option[String] =
    firstBytes(fs, tag).map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))

  /** Packed repeated varints (wire 2) with fallback to unpacked (wire 0). */
  def packedVarints(fs: Seq[PField], tag: Int): Seq[Long] = {
    val out = ArrayBuffer.empty[Long]
    fs.filter(_.tag == tag).foreach {
      case PField(_, 0, v, _) => out += v
      case PField(_, 2, _, b) =>
        var p = 0
        while (p < b.length) { val (v, p2) = readVarint(b, p); out += v; p = p2 }
      case f => throw new IllegalArgumentException(s"unexpected wire ${f.wire} for packed tag $tag")
    }
    out.toSeq
  }

  // --- encoders (write path) --------------------------------------------
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def writeVarintRaw(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def varint(tag: Int, v: Long): this.type = { writeVarintRaw((tag.toLong << 3) | 0); writeVarintRaw(v); this }
    def fixed64(tag: Int, v: Long): this.type = {
      writeVarintRaw((tag.toLong << 3) | 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (i * 8)) & 0xff).toInt); i += 1 }
      this
    }
    def bytes(tag: Int, b: Array[Byte]): this.type = {
      writeVarintRaw((tag.toLong << 3) | 2); writeVarintRaw(b.length.toLong); out.write(b); this
    }
    def fixed32(tag: Int, v: Long): this.type = {
      writeVarintRaw((tag.toLong << 3) | 5)
      var i = 0
      while (i < 4) { out.write(((v >>> (i * 8)) & 0xff).toInt); i += 1 }
      this
    }
    /** Re-emit a parsed field verbatim (proto-level patching: rewrite a
      * message while preserving fields we don't model). */
    def raw(f: PField): this.type = f.wire match {
      case 0 => varint(f.tag, f.varint)
      case 1 => fixed64(f.tag, f.varint)
      case 2 => bytes(f.tag, f.bytes)
      case 5 => fixed32(f.tag, f.varint)
      case w => throw new IllegalArgumentException(s"raw: wire $w")
    }
    def string(tag: Int, s: String): this.type = bytes(tag, s.getBytes("UTF-8"))
    def message(tag: Int, w: Writer): this.type = bytes(tag, w.result())
    def packed(tag: Int, vs: Seq[Long]): this.type = {
      val w = new Writer; vs.foreach(w.writeVarintRaw); bytes(tag, w.result())
    }
    def result(): Array[Byte] = out.toByteArray
  }
}
