package graft.sources.lance

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Decodes one Lance v2 plain-encoded column into a value array.
  *
  * Fixed-width types: one buffer of little-endian values (bool = bitmap,
  * LSB first). Strings/binary: two buffers — i64 *end* offsets (row i spans
  * [end(i-1), end(i)), first row starts at 0) and the concatenated bytes
  * (verified against the golden file: offsets [5,8,15,20,23] over
  * "AliceBobCharlieDavidEve" — reference test/test_data.lance).
  */
object LanceColumnDecoder {

  /** buffers: per page, the raw bytes of each buffer of that page. */
  def decode(logicalType: String, pages: Seq[Seq[Array[Byte]]], numRows: Int): Array[Any] = {
    val out = new Array[Any](numRows)
    var row = 0
    pages.foreach { bufs =>
      row = decodePage(logicalType, bufs, out, row)
    }
    require(row == numRows, s"decoded $row rows, expected $numRows")
    out
  }

  private def decodePage(logicalType: String, bufs: Seq[Array[Byte]],
                         out: Array[Any], start: Int): Int = {
    logicalType match {
      case "string" | "utf8" | "large_string" | "binary" | "large_binary" =>
        require(bufs.length == 2, s"string page expects 2 buffers, got ${bufs.length}")
        val offs = bufs(0); val bytes = bufs(1)
        val n = offs.length / 8
        val bb = java.nio.ByteBuffer.wrap(offs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var prev = 0L
        var i = 0
        while (i < n) {
          val end = bb.getLong(i * 8)
          val slice = java.util.Arrays.copyOfRange(bytes, prev.toInt, end.toInt)
          out(start + i) =
            if (logicalType.contains("binary")) slice else UTF8String.fromBytes(slice)
          prev = end
          i += 1
        }
        start + n
      case "bool" =>
        val b = bufs.head
        // page row count isn't derivable from the bitmap alone; caller slices
        // by buffer size * 8 then trims via total numRows
        var i = 0
        val n = math.min(b.length * 8, out.length - start)
        while (i < n) {
          out(start + i) = ((b(i >> 3) >> (i & 7)) & 1) == 1
          i += 1
        }
        start + n
      case t =>
        val width = LanceFormat.bitsPerValue(t) / 8
        val b = bufs.head
        val n = b.length / width
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          out(start + i) = t match {
            case "int8" => b(i)
            case "uint8" => (b(i) & 0xff).toShort
            case "int16" => bb.getShort(i * 2)
            case "uint16" => (bb.getShort(i * 2) & 0xffff)
            case "int32" => bb.getInt(i * 4)
            case "uint32" => bb.getInt(i * 4).toLong & 0xffffffffL
            case "int64" => bb.getLong(i * 8)
            case "uint64" => Decimal(java.math.BigDecimal.valueOf(bb.getLong(i * 8)).abs())
            case "float" => bb.getFloat(i * 4)
            case "double" => bb.getDouble(i * 8)
            case "date32:day" | "date32" => bb.getInt(i * 4)
            case ts if ts.startsWith("timestamp") => bb.getLong(i * 8)
            case other => throw new UnsupportedOperationException(s"decode: $other")
          }
          i += 1
        }
        start + n
    }
  }
}
