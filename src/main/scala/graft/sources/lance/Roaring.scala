package graft.sources.lance

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RoaringBitmap portable-format codec — enough to read and write
  * Lance deletion files (fragment `deletion_file` of type BITMAP stores a
  * serialized roaring bitmap of deleted row offsets; the lance crate uses
  * the `roaring` Rust crate, which implements this same public
  * interoperable format).
  *
  * Portable spec (roaringbitmap.org "format specification", public):
  *  - u32 LE cookie: 12346 (no run containers) followed by u32 container
  *    count, OR 12347 (has runs) with (count-1) in the upper 16 bits
  *    followed by a (count+7)/8-byte bitset flagging run containers;
  *  - descriptive header: per container, u16 key (upper 16 bits of the
  *    values) and u16 (cardinality - 1);
  *  - offset header (present for cookie 12346, or when count >= 4 with
  *    runs): u32 absolute byte offset of each container — we recompute
  *    layouts sequentially and only validate presence;
  *  - containers in key order: array (u16 LE values, cardinality <= 4096),
  *    bitmap (8 KiB, 1 bit per value), or run (u16 run count, then u16
  *    (start, length-1) pairs).
  *
  * The writer emits array/bitmap containers with the 12346 cookie (always
  * valid; runs are an optional optimization). The reader accepts all three
  * container types.
  */
object Roaring {

  private val CookieNoRuns = 12346
  private val CookieRuns = 12347

  /** Serialize a sorted array of non-negative ints (row offsets). */
  def serialize(sorted: Array[Int]): Array[Byte] = {
    // group by upper-16-bit key
    val groups = scala.collection.mutable.LinkedHashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    sorted.foreach { v =>
      groups.getOrElseUpdate(v >>> 16, scala.collection.mutable.ArrayBuffer.empty) += (v & 0xffff)
    }
    val n = groups.size
    val containers = groups.map { case (_, vals) =>
      if (vals.length <= 4096) {
        val bb = ByteBuffer.allocate(vals.length * 2).order(ByteOrder.LITTLE_ENDIAN)
        vals.foreach(v => bb.putShort(v.toShort))
        bb.array()
      } else {
        val bits = new Array[Byte](8192)
        vals.foreach(v => bits(v >> 3) = (bits(v >> 3) | (1 << (v & 7))).toByte)
        bits
      }
    }.toSeq
    val headerLen = 8 + n * 4 + n * 4 // cookie+count, desc header, offset header
    val total = headerLen + containers.map(_.length).sum
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(CookieNoRuns).putInt(n)
    groups.zip(containers).foreach { case ((key, vals), _) =>
      out.putShort(key.toShort).putShort((vals.length - 1).toShort)
    }
    var off = headerLen
    containers.foreach { c => out.putInt(off); off += c.length }
    containers.foreach(out.put)
    out.array()
  }

  /** Deserialize to a sorted array of ints. */
  def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val cookie = bb.getInt(0)
    val (n, runFlags, headerStart) =
      if ((cookie & 0xffff) == CookieRuns) {
        val count = (cookie >>> 16) + 1
        val flagBytes = (count + 7) / 8
        val flags = java.util.Arrays.copyOfRange(bytes, 4, 4 + flagBytes)
        (count, flags, 4 + flagBytes)
      } else {
        require(cookie == CookieNoRuns, s"not a roaring bitmap (cookie $cookie)")
        (bb.getInt(4), Array.empty[Byte], 8)
      }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = bb.getShort(headerStart + i * 4) & 0xffff
      cards(i) = (bb.getShort(headerStart + i * 4 + 2) & 0xffff) + 1
      i += 1
    }
    def isRun(c: Int): Boolean =
      runFlags.nonEmpty && ((runFlags(c >> 3) >> (c & 7)) & 1) == 1
    // offset header present: no-runs always, runs only when n >= 4
    val hasOffsets = runFlags.isEmpty || n >= 4
    var pos = headerStart + n * 4 + (if (hasOffsets) n * 4 else 0)
    val out = Array.newBuilder[Int]
    i = 0
    while (i < n) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort(pos) & 0xffff
        pos += 2
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort(pos) & 0xffff
          val len = (bb.getShort(pos + 2) & 0xffff) + 1
          var v = 0
          while (v < len) { out += base | (start + v); v += 1 }
          pos += 4
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var j = 0
        while (j < cards(i)) { out += base | (bb.getShort(pos + j * 2) & 0xffff); j += 1 }
        pos += cards(i) * 2
      } else {
        var v = 0
        while (v < 65536) {
          if (((bytes(pos + (v >> 3)) >> (v & 7)) & 1) == 1) out += base | v
          v += 1
        }
        pos += 8192
      }
      i += 1
    }
    out.result()
  }
}
