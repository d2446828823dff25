package graft.sources.lance

import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.{Decimal, DecimalType}

/** Decodes one Lance page straight into a Spark `WritableColumnVector` —
  * no boxing through `Array[Any]`. Fixed-width types use the vector's
  * little-endian bulk copies (one memcpy per page); var-width types write
  * each row's byte slice directly out of the page's concatenated value
  * buffer; fixed_size_list pages bulk-copy rows*dim elements into the
  * array child vector. Page layout/validity/dictionary conventions are
  * those of [[LanceColumnDecoder]] (the boxed twin used by the row reader).
  */
object LanceVectorDecoder {

  private def isVarWidth(t: String): Boolean =
    t == "string" || t == "utf8" || t == "large_string" ||
      t == "binary" || t == "large_binary"

  /** Variable-length list page into an ArrayType vector: child values are
    * bulk-decoded into the array child vector, then each row becomes an
    * (offset, length) slice from the page-local i64 end offsets. */
  def decodeListPage(childType: String, offBufs: Seq[Array[Byte]],
                     valBufs: Seq[Array[Byte]], rows: Int,
                     vec: WritableColumnVector): Unit = {
    val (validity, offs) =
      if (offBufs.length == 2) (Some(offBufs(0)), offBufs(1))
      else (None, offBufs.head)
    val offBB = java.nio.ByteBuffer.wrap(offs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val totalVals = if (rows == 0) 0 else offBB.getLong((rows - 1) * 8).toInt
    val child = vec.getChild(0)
    child.reserve(totalVals)
    decodePage(childType, valBufs, totalVals, child)
    var prev = 0
    var i = 0
    while (i < rows) {
      val end = offBB.getLong(i * 8).toInt
      vec.putArray(i, prev, end - prev)
      prev = end
      i += 1
    }
    validity.foreach { vb =>
      var i = 0
      while (i < rows) {
        if (((vb(i >> 3) >> (i & 7)) & 1) == 0) vec.putNull(i)
        i += 1
      }
    }
  }

  /** Struct page into a StructType vector: each leaf column's page decodes
    * into the corresponding child vector (struct rows themselves are
    * non-null — the writer nulls leaves, not the struct). */
  def decodeStructPage(childTypes: Array[String], leafBufs: Array[Seq[Array[Byte]]],
                       leafDict: Array[Boolean], rows: Int,
                       vec: WritableColumnVector): Unit = {
    var k = 0
    while (k < childTypes.length) {
      decodePage(childTypes(k), leafBufs(k), rows, vec.getChild(k), leafDict(k))
      k += 1
    }
  }

  /** Decode the first `rows` rows of a page (rows < page rows when a pushed
    * LIMIT caps the scan) into `vec` starting at vector row 0. */
  def decodePage(logicalType: String, allBufs: Seq[Array[Byte]], rows: Int,
                 vec: WritableColumnVector, dictEnc: Boolean = false): Unit = {
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
      val offBB = java.nio.ByteBuffer.wrap(bufs(1)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dictBytes = bufs(2)
      var i = 0
      while (i < rows) {
        val d = idxBB.getInt(i * 4)
        val dStart = if (d == 0) 0 else offBB.getLong((d - 1) * 8).toInt
        val dEnd = offBB.getLong(d * 8).toInt
        vec.putByteArray(i, dictBytes, dStart, dEnd - dStart)
        i += 1
      }
    } else if (isVarWidth(logicalType)) {
      val offs = bufs(0); val bytes = bufs(1)
      val bb = java.nio.ByteBuffer.wrap(offs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var prev = 0
      var i = 0
      while (i < rows) {
        val end = bb.getLong(i * 8).toInt
        vec.putByteArray(i, bytes, prev, end - prev)
        prev = end
        i += 1
      }
    } else if (logicalType.startsWith("fixed_size_list:")) {
      val (elemType, dim) = LanceFormat.fslParts(logicalType)
      val child = vec.getChild(0)
      child.reserve(rows * dim)
      decodePage(elemType, bufs, rows * dim, child)
      var i = 0
      while (i < rows) { vec.putArray(i, i * dim, dim); i += 1 }
    } else if (logicalType.startsWith("decimal:128:") ||
               logicalType.startsWith("decimal128:")) {
      val dt = LanceFormat.toSparkType(logicalType).asInstanceOf[DecimalType]
      val b = bufs.head
      var i = 0
      while (i < rows) {
        val be = new Array[Byte](16)
        var j = 0
        while (j < 16) { be(j) = b(i * 16 + 15 - j); j += 1 }
        vec.putDecimal(i, Decimal(
          new java.math.BigDecimal(new java.math.BigInteger(be), dt.scale),
          dt.precision, dt.scale), dt.precision)
        i += 1
      }
    } else logicalType match {
      case "bool" =>
        val b = bufs.head
        var i = 0
        while (i < rows) { vec.putBoolean(i, ((b(i >> 3) >> (i & 7)) & 1) == 1); i += 1 }
      case "int8" => vec.putBytes(0, rows, bufs.head, 0)
      case "uint8" =>
        val b = bufs.head
        var i = 0
        while (i < rows) { vec.putShort(i, (b(i) & 0xff).toShort); i += 1 }
      case "int16" => vec.putShorts(0, rows, bufs.head, 0)
      case "uint16" =>
        val bb = java.nio.ByteBuffer.wrap(bufs.head).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < rows) { vec.putInt(i, bb.getShort(i * 2) & 0xffff); i += 1 }
      case "int32" | "date32:day" | "date32" => vec.putIntsLittleEndian(0, rows, bufs.head, 0)
      case "uint32" =>
        val bb = java.nio.ByteBuffer.wrap(bufs.head).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < rows) { vec.putLong(i, bb.getInt(i * 4).toLong & 0xffffffffL); i += 1 }
      case "int64" => vec.putLongsLittleEndian(0, rows, bufs.head, 0)
      case "date64" | "date64:ms" =>
        val bb = java.nio.ByteBuffer.wrap(bufs.head).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < rows) {
          vec.putInt(i, java.lang.Math.floorDiv(bb.getLong(i * 8), 86400000L).toInt)
          i += 1
        }
      case ts if ts.startsWith("timestamp") => vec.putLongsLittleEndian(0, rows, bufs.head, 0)
      case "uint64" =>
        val bb = java.nio.ByteBuffer.wrap(bufs.head).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < rows) {
          val v = bb.getLong(i * 8)
          vec.putDecimal(i, Decimal(new java.math.BigDecimal(java.lang.Long.toUnsignedString(v))), 20)
          i += 1
        }
      case "halffloat" | "float" => vec.putFloatsLittleEndian(0, rows, bufs.head, 0)
      case "double" => vec.putDoublesLittleEndian(0, rows, bufs.head, 0)
      case other => throw new UnsupportedOperationException(s"columnar decode: $other")
    }

    validity.foreach { vb =>
      var i = 0
      while (i < rows) {
        if (((vb(i >> 3) >> (i & 7)) & 1) == 0) vec.putNull(i)
        i += 1
      }
    }
  }
}
