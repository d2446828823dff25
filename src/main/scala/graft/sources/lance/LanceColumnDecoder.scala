package graft.sources.lance

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Decodes one Lance v2 plain-encoded column into a value array.
  *
  * Fixed-width types: one buffer of little-endian values (bool = bitmap,
  * LSB first). Strings/binary: two buffers — i64 *end* offsets (row i
  * spans [end(i-1), end(i)), first row starts at 0) and the concatenated
  * bytes (verified against the golden file: offsets [5,8,15,20,23] over
  * "AliceBobCharlieDavidEve" — reference test/test_data.lance).
  * fixed_size_list:<elem>:<d>: one buffer of rows*d contiguous elements.
  * decimal:128:<p>:<s>: 16-byte little-endian two's-complement values.
  *
  * Dictionary-encoded var-width pages (this writer's own encoding, page
  * proto tag 14 = 1): three buffers — i32 indices, i64 dictionary end
  * offsets, dictionary bytes.
  *
  * Nulls: a page carrying nulls has one extra leading buffer — a validity
  * bitmap (LSB first, 1 = present). This mirrors the writer's convention
  * (see LanceFragmentWriter); pages without nulls omit the bitmap, so
  * non-null data stays byte-compatible with the reference golden layout.
  */
object LanceColumnDecoder {

  /** pages: per page, (raw buffers, row count, dictionary-encoded?). */
  def decode(logicalType: String, pages: Seq[(Seq[Array[Byte]], Long, Boolean)],
             numRows: Int): Array[Any] = {
    val out = new Array[Any](numRows)
    var row = 0
    pages.foreach { case (bufs, pageRows, dictEnc) =>
      decodePage(logicalType, bufs, pageRows.toInt, out, row, dictEnc)
      row += pageRows.toInt
    }
    require(row == numRows, s"decoded $row rows, expected $numRows")
    out
  }

  private def isVarWidth(t: String): Boolean =
    t == "string" || t == "utf8" || t == "large_string" ||
      t == "binary" || t == "large_binary"

  private[lance] def decodePage(logicalType: String, allBufs: Seq[Array[Byte]],
                                pageRows: Int, out: Array[Any], start: Int,
                                dictEnc: Boolean = false): Unit = {
    val expected =
      if (dictEnc && isVarWidth(logicalType)) 3
      else if (isVarWidth(logicalType)) 2
      else 1
    val (validity, bufs) =
      if (allBufs.length == expected + 1) (Some(allBufs.head), allBufs.tail)
      else (None, allBufs)
    require(bufs.length == expected,
      s"$logicalType page expects $expected buffers (+optional validity), got ${allBufs.length}")

    if (dictEnc && isVarWidth(logicalType)) {
      val idxBB = java.nio.ByteBuffer.wrap(bufs(0)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dict = decodeVarSlices(logicalType, bufs(1), bufs(2))
      var i = 0
      while (i < pageRows) {
        out(start + i) = dict(idxBB.getInt(i * 4))
        i += 1
      }
    } else if (isVarWidth(logicalType)) {
      val offs = bufs(0); val bytes = bufs(1)
      val bb = java.nio.ByteBuffer.wrap(offs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var prev = 0L
      var i = 0
      while (i < pageRows) {
        val end = bb.getLong(i * 8)
        val slice = java.util.Arrays.copyOfRange(bytes, prev.toInt, end.toInt)
        out(start + i) =
          if (logicalType.contains("binary")) slice else UTF8String.fromBytes(slice)
        prev = end
        i += 1
      }
    } else if (logicalType == "bool") {
      val b = bufs.head
      var i = 0
      while (i < pageRows) {
        out(start + i) = ((b(i >> 3) >> (i & 7)) & 1) == 1
        i += 1
      }
    } else if (logicalType.startsWith("fixed_size_list:")) {
      val (elemType, dim) = LanceFormat.fslParts(logicalType)
      val elems = new Array[Any](pageRows * dim)
      decodePage(elemType, bufs, pageRows * dim, elems, 0)
      var i = 0
      while (i < pageRows) {
        out(start + i) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          java.util.Arrays.copyOfRange(elems.asInstanceOf[Array[AnyRef]],
                                       i * dim, (i + 1) * dim))
        i += 1
      }
    } else if (logicalType.startsWith("decimal:128:") ||
               logicalType.startsWith("decimal128:")) {
      val dt = LanceFormat.toSparkType(logicalType).asInstanceOf[DecimalType]
      val b = bufs.head
      var i = 0
      while (i < pageRows) {
        // arrow decimal128: 16-byte little-endian two's complement
        val be = new Array[Byte](16)
        var j = 0
        while (j < 16) { be(j) = b(i * 16 + 15 - j); j += 1 }
        val unscaled = new java.math.BigInteger(be)
        out(start + i) = Decimal(
          new java.math.BigDecimal(unscaled, dt.scale), dt.precision, dt.scale)
        i += 1
      }
    } else {
      val t = logicalType
      val width = LanceFormat.bitsPerValue(t) / 8
      val b = bufs.head
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < pageRows) {
        out(start + i) = t match {
          case "int8" => b(i)
          case "uint8" => (b(i) & 0xff).toShort
          case "int16" => bb.getShort(i * 2)
          case "uint16" => (bb.getShort(i * 2) & 0xffff)
          case "int32" => bb.getInt(i * 4)
          case "uint32" => bb.getInt(i * 4).toLong & 0xffffffffL
          case "int64" => bb.getLong(i * 8)
          case "uint64" => Decimal(new java.math.BigDecimal(
            java.lang.Long.toUnsignedString(bb.getLong(i * 8))))
          case "float" => bb.getFloat(i * 4)
          case "double" => bb.getDouble(i * 8)
          case "date32:day" | "date32" => bb.getInt(i * 4)
          case "date64" | "date64:ms" => // ms since epoch -> days
            java.lang.Math.floorDiv(bb.getLong(i * 8), 86400000L).toInt
          case ts if ts.startsWith("timestamp") => bb.getLong(i * 8)
          case other => throw new UnsupportedOperationException(s"decode: $other")
        }
        i += 1
      }
    }

    validity.foreach { vb =>
      var i = 0
      while (i < pageRows) {
        if (((vb(i >> 3) >> (i & 7)) & 1) == 0) out(start + i) = null
        i += 1
      }
    }
  }

  /** Decode an offsets+bytes pair into one value per entry. */
  private[lance] def decodeVarSlices(logicalType: String, offs: Array[Byte],
                                     bytes: Array[Byte]): Array[Any] = {
    val n = offs.length / 8
    val bb = java.nio.ByteBuffer.wrap(offs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Any](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      val end = bb.getLong(i * 8)
      val slice = java.util.Arrays.copyOfRange(bytes, prev.toInt, end.toInt)
      out(i) =
        if (logicalType.contains("binary")) slice else UTF8String.fromBytes(slice)
      prev = end
      i += 1
    }
    out
  }
}
