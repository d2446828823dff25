package graft.sources.lance

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Lance v2 data-file writer (plain "flat" encodings; the same scope the
  * reader supports, plus list-of-scalar columns for embedding vectors).
  *
  * Unlike the reference's writer — which buffers the whole dataset in RAM
  * before a single write (`rust/writer.rs:27-50`, called out as a non-goal
  * in SURVEY §6) — this writer flushes a page per `pageRows` rows per
  * column, so task memory is bounded by one page set regardless of
  * fragment size.
  *
  * Physical layout mirrors the golden file's structure: 64-byte-aligned
  * data buffers, global file-descriptor buffer, per-column ColumnMetadata
  * protobufs, column-metadata offset table, global-buffer offset table,
  * 40-byte footer + LANC magic. A list field occupies two physical columns
  * (i64 page-local end-offsets; flat child values), and two schema fields
  * (the list field + a child field with parent_id).
  */
object LanceSchemaLayout {

  /** One physical column of the file. */
  sealed trait Phys { def dt: DataType }
  final case class Scalar(dt: DataType) extends Phys
  final case class ListOffsets(dt: DataType) extends Phys // dt = LongType
  final case class ListValues(dt: DataType) extends Phys
  /** lance vector column: rows*dim contiguous values, ONE physical column */
  final case class FslValues(dt: DataType, dim: Int) extends Phys

  /** One lance schema field (manifest/descriptor entry). */
  final case class FieldDef(id: Int, parentId: Int, name: String, logicalType: String,
                            varWidth: Boolean)

  /** rowCountCol(c): index of the offsets column whose element count is
    * column c's per-page row count, or -1 for row-aligned columns. */
  final case class Layout(fields: Seq[FieldDef], phys: Seq[Phys],
                          topFieldIdOfCol: Seq[Int], rowCountCol: Seq[Int])

  /** DFS field-id assignment matching the reader's expectations:
    * field ids and physical column indices advance together.
    * `fsl` maps column name -> dimension for arrays to be stored as
    * lance `fixed_size_list:<elem>:<dim>` vector columns.
    *
    * Nesting is fully recursive: struct/list/map compose at any depth
    * (struct-of-list, list-of-list, map values of any supported type…).
    * A struct owns no physical column; a list/map owns one offsets column
    * whose per-page row count rides under its nearest enclosing offsets
    * column (`asChildOf`), mirroring the reader's recursive
    * `decodeBoxedPage` reconstruction. */
  def of(schema: StructType, fsl: Map[String, Int] = Map.empty): Layout = {
    val fields = Seq.newBuilder[FieldDef]
    val phys = Seq.newBuilder[Phys]
    val colField = Seq.newBuilder[Int]
    val rowCount = Seq.newBuilder[Int]
    var id = 0
    var col = 0

    def scalarField(name: String, dt: DataType, parentId: Int,
                    asChildOf: Int): Unit = {
      fields += FieldDef(id, parentId, name, LanceWriteSupport.logicalTypeFor(dt),
        dt == StringType || dt == BinaryType)
      phys += (if (asChildOf >= 0) ListValues(dt) else Scalar(dt))
      colField += id
      rowCount += asChildOf
      id += 1
      col += 1
    }

    /** One field of any type; asChildOf >= 0 = the offsets column this
      * field's values ride under. */
    def anyField(name: String, dt: DataType, parentId: Int, asChildOf: Int): Unit =
      dt match {
        case st: StructType =>
          val structId = id
          fields += FieldDef(structId, parentId, name, "struct", varWidth = false)
          id += 1
          st.fields.foreach(f => anyField(f.name, f.dataType, structId, asChildOf))
        case ArrayType(elem, _) =>
          val listId = id
          val offsetsCol = col
          fields += FieldDef(listId, parentId, name, "list", varWidth = false)
          phys += ListOffsets(LongType)
          colField += listId
          rowCount += asChildOf
          id += 1
          col += 1
          anyField("item", elem, listId, offsetsCol)
        case MapType(kt, vt, _) =>
          val mapId = id
          val offsetsCol = col
          fields += FieldDef(mapId, parentId, name, "map", varWidth = false)
          phys += ListOffsets(LongType)
          colField += mapId
          rowCount += asChildOf
          id += 1
          col += 1
          anyField("key", kt, mapId, offsetsCol)
          anyField("value", vt, mapId, offsetsCol)
        case other => scalarField(name, other, parentId, asChildOf)
      }

    schema.fields.foreach { f =>
      f.dataType match {
        case ArrayType(elem, _) if fsl.contains(f.name) =>
          val dim = fsl(f.name)
          fields += FieldDef(id, -1, f.name,
            s"fixed_size_list:${LanceWriteSupport.logicalTypeFor(elem)}:$dim",
            varWidth = false)
          phys += FslValues(elem, dim)
          colField += id
          rowCount += -1
          id += 1
          col += 1
        case dt => anyField(f.name, dt, -1, -1)
      }
    }
    Layout(fields.result(), phys.result(), colField.result(), rowCount.result())
  }
}

class LanceFragmentWriter(out: java.io.OutputStream, schema: StructType,
                          pageRows: Int = 1 << 16,
                          fsl: Map[String, Int] = Map.empty,
                          codec: String = "") {
  import LanceSchemaLayout._

  private val codecId = LanceCodec.idOf(codec)

  private val layout = LanceSchemaLayout.of(schema, fsl)
  private val nPhys = layout.phys.length
  private var pos = 0L
  private var rowsInPage = 0
  private var totalRows = 0L

  private val fixedBufs = Array.fill(nPhys)(new ByteArrayOutputStream())
  private val byteBufs = Array.fill(nPhys)(new ByteArrayOutputStream()) // var-width payloads
  private val boolAcc = Array.fill(nPhys)(0)
  private val boolBit = Array.fill(nPhys)(0)
  private val listValCount = Array.fill(nPhys)(0L) // per-page cumulative child values
  // validity bitmaps (null support): only emitted for pages that saw nulls
  private val validBufs = Array.fill(nPhys)(new ByteArrayOutputStream())
  private val validAcc = Array.fill(nPhys)(0)
  private val validBit = Array.fill(nPhys)(0)
  private val sawNull = Array.fill(nPhys)(false)
  // per-page zone maps (numeric min/max as doubles, conservative) for
  // filter pushdown; NaN-initialized = no stats
  private val zoneMin = Array.fill(nPhys)(Double.NaN)
  private val zoneMax = Array.fill(nPhys)(Double.NaN)
  // string zone maps: lexicographic min/max bytes per page (top-level string
  // columns only), emitted as 8-byte big-endian prefixes
  private val strZoneMin = Array.fill[Array[Byte]](nPhys)(null)
  private val strZoneMax = Array.fill[Array[Byte]](nPhys)(null)
  private val pageMetas = Array.fill(nPhys)(scala.collection.mutable.ArrayBuffer
    .empty[(Seq[Long], Seq[Long], Long, Double, Double)])
  // Some(raw buffer sizes) for pages stored compressed (codec helped);
  // None for plain pages — parallel with pageMetas
  private val compMetas = Array.fill(nPhys)(scala.collection.mutable.ArrayBuffer
    .empty[Option[Seq[Long]]])
  private val strZoneMetas = Array.fill(nPhys)(scala.collection.mutable.ArrayBuffer
    .empty[Option[(Long, Long)]])
  private val dictFlags = Array.fill(nPhys)(scala.collection.mutable.ArrayBuffer
    .empty[Boolean])
  // dictionary encoding for low-cardinality top-level string columns:
  // page-local dictionary (insertion order) + i32 indices; falls back to
  // plain offsets+bytes when cardinality exceeds the cap or half the rows
  private val dictable: Array[Boolean] = layout.phys.map {
    case Scalar(StringType) => true
    case _ => false
  }.toArray
  private val DictCap = 4096
  private val dictMaps = Array.fill(nPhys)(
    new java.util.LinkedHashMap[java.nio.ByteBuffer, Integer]())
  private val dictIdx = Array.fill(nPhys)(scala.collection.mutable.ArrayBuffer.empty[Int])
  private val dictOverflow = Array.fill(nPhys)(false)

  private def trackDict(c: Int, b: Array[Byte]): Unit = {
    if (!dictable(c) || dictOverflow(c)) return
    val m = dictMaps(c)
    val key = java.nio.ByteBuffer.wrap(b)
    var id = m.get(key)
    if (id == null) {
      if (m.size >= DictCap) { dictOverflow(c) = true; return }
      id = Integer.valueOf(m.size)
      m.put(key, id)
    }
    dictIdx(c) += id.intValue
  }

  // file-level zone ranges (for manifest fragment stats -> whole-fragment
  // pruning at plan time, before any file is opened)
  private val fileZoneMin = Array.fill(nPhys)(Double.NaN)
  private val fileZoneMax = Array.fill(nPhys)(Double.NaN)
  private val fileStrMin = Array.fill[Array[Byte]](nPhys)(null)
  private val fileStrMax = Array.fill[Array[Byte]](nPhys)(null)

  private def trackZone(c: Int, v: Double): Unit = {
    if (zoneMin(c).isNaN || v < zoneMin(c)) zoneMin(c) = v
    if (zoneMax(c).isNaN || v > zoneMax(c)) zoneMax(c) = v
    if (fileZoneMin(c).isNaN || v < fileZoneMin(c)) fileZoneMin(c) = v
    if (fileZoneMax(c).isNaN || v > fileZoneMax(c)) fileZoneMax(c) = v
  }

  /** Numeric file stats: (top-level field id, min, max); valid after
    * [[finish]]. String columns ride the same channel with their 8-byte
    * big-endian prefixes reinterpreted as doubles via long bits (the
    * manifest stat message is type-agnostic fixed64; the reader knows
    * which columns are strings from the schema). */
  def fileStats: Seq[(Int, Double, Double)] =
    (0 until nPhys).flatMap { c =>
      if (!fileZoneMin(c).isNaN && !fileZoneMax(c).isNaN)
        Some((layout.topFieldIdOfCol(c), fileZoneMin(c), fileZoneMax(c)))
      else if (fileStrMin(c) != null)
        Some((layout.topFieldIdOfCol(c),
          java.lang.Double.longBitsToDouble(ZoneFilter.prefixLong(fileStrMin(c))),
          java.lang.Double.longBitsToDouble(ZoneFilter.prefixLong(fileStrMax(c)))))
      else None
    }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def trackStrZone(c: Int, b: Array[Byte]): Unit = {
    if (strZoneMin(c) == null || cmpBytes(b, strZoneMin(c)) < 0) strZoneMin(c) = b
    if (strZoneMax(c) == null || cmpBytes(b, strZoneMax(c)) > 0) strZoneMax(c) = b
    if (fileStrMin(c) == null || cmpBytes(b, fileStrMin(c)) < 0) fileStrMin(c) = b
    if (fileStrMax(c) == null || cmpBytes(b, fileStrMax(c)) > 0) fileStrMax(c) = b
  }

  private def markValidity(c: Int, valid: Boolean): Unit = {
    if (valid) validAcc(c) |= (1 << validBit(c)) else sawNull(c) = true
    validBit(c) += 1
    if (validBit(c) == 8) { validBufs(c).write(validAcc(c)); validAcc(c) = 0; validBit(c) = 0 }
  }

  private def putFixed(c: Int, dt: DataType, get: => Any): Unit =
    putFixed(c, dt, get, track = true)

  private def putFixed(c: Int, dt: DataType, get: => Any, track: Boolean): Unit = dt match {
    case BooleanType =>
      if (get.asInstanceOf[Boolean]) boolAcc(c) |= (1 << boolBit(c))
      boolBit(c) += 1
      if (boolBit(c) == 8) { fixedBufs(c).write(boolAcc(c)); boolAcc(c) = 0; boolBit(c) = 0 }
    case ByteType =>
      val v = get.asInstanceOf[Byte]; if (track) trackZone(c, v.toDouble)
      fixedBufs(c).write(v.toInt)
    case ShortType =>
      val v = get.asInstanceOf[Short]; if (track) trackZone(c, v.toDouble)
      fixedBufs(c).write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(v).array())
    case IntegerType | DateType =>
      val v = get.asInstanceOf[Int]; if (track) trackZone(c, v.toDouble)
      fixedBufs(c).write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v).array())
    case LongType | TimestampType | TimestampNTZType =>
      val v = get.asInstanceOf[Long]; if (track) trackZone(c, v.toDouble)
      fixedBufs(c).write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v).array())
    case FloatType =>
      val v = get.asInstanceOf[Float]; if (!v.isNaN) if (track) trackZone(c, v.toDouble)
      fixedBufs(c).write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(v).array())
    case DoubleType =>
      val v = get.asInstanceOf[Double]; if (track && !v.isNaN) trackZone(c, v)
      fixedBufs(c).write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v).array())
    case _: DecimalType =>
      // arrow decimal128 layout: 16-byte little-endian two's complement
      val dec = get.asInstanceOf[org.apache.spark.sql.types.Decimal]
      if (track) trackZone(c, dec.toDouble)
      val be = dec.toJavaBigDecimal.unscaledValue.toByteArray // minimal BE
      val out = new Array[Byte](16)
      val sign: Byte = if (be.length > 0 && be(0) < 0) -1 else 0
      java.util.Arrays.fill(out, sign)
      var i = 0
      while (i < be.length) { out(i) = be(be.length - 1 - i); i += 1 } // reverse to LE
      fixedBufs(c).write(out)
    case other => throw new UnsupportedOperationException(s"lance writer: $other")
  }

  private def putVar(c: Int, bytes: Array[Byte]): Unit = {
    byteBufs(c).write(bytes)
    fixedBufs(c).write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(byteBufs(c).size().toLong).array())
  }

  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters

  /** Physical columns a value of `dt` spans (must mirror Layout.of). */
  private def colsOf(dt: DataType): Int = dt match {
    case st: StructType => st.fields.map(f => colsOf(f.dataType)).sum
    case ArrayType(elem, _) => 1 + colsOf(elem)
    case MapType(kt, vt, _) => 1 + colsOf(kt) + colsOf(vt)
    case _ => 1
  }

  /** One scalar cell into column c (top = tracks zone/dict stats). */
  private def emitScalar(dt: DataType, src: SpecializedGetters, ord: Int,
                         c: Int, top: Boolean, validity: Boolean): Unit = {
    val isNull = src.isNullAt(ord)
    if (validity) markValidity(c, !isNull)
    dt match {
      case StringType =>
        if (isNull) { if (top) trackDict(c, Array.emptyByteArray); putVar(c, Array.emptyByteArray) }
        else {
          val b = src.getUTF8String(ord).getBytes
          if (top) { trackStrZone(c, b); trackDict(c, b) }
          putVar(c, b)
        }
      case BinaryType =>
        putVar(c, if (isNull) Array.emptyByteArray else src.getBinary(ord))
      case dt =>
        putFixed(c, dt, if (isNull) LanceWriteSupport.zeroOf(dt) else src.get(ord, dt),
          track = !isNull)
    }
  }

  /** One value of any type at (src, ord) into columns starting at c;
    * returns columns consumed. Recursive mirror of Layout.of's anyField:
    * struct leaves spread over columns, list/map write one offsets entry
    * then recurse per element. `validity` = track a validity bit on
    * scalar columns (off for list elements, whose nulls are rejected). */
  private def emitValue(dt: DataType, src: SpecializedGetters, ord: Int,
                        c: Int, top: Boolean, validity: Boolean): Int = dt match {
    case st: StructType =>
      require(!src.isNullAt(ord),
        "lance writer: null struct values not supported (null the leaves instead)")
      val sr = src.getStruct(ord, st.length)
      var cc = c
      var k = 0
      while (k < st.length) {
        cc += emitValue(st.fields(k).dataType, sr, k, cc, top = false, validity = true)
        k += 1
      }
      cc - c
    case ArrayType(elem, _) =>
      val isNull = src.isNullAt(ord)
      markValidity(c, !isNull)
      if (!isNull) {
        val arr = src.getArray(ord)
        val n = arr.numElements()
        var k = 0
        while (k < n) {
          require(!arr.isNullAt(k),
            "lance writer: null list elements are not supported")
          emitValue(elem, arr, k, c + 1, top = false, validity = false)
          k += 1
        }
        listValCount(c) += n
      }
      // null array = zero-length slice (validity bit marks the null)
      fixedBufs(c).write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(listValCount(c)).array())
      1 + colsOf(elem)
    case MapType(kt, vt, _) =>
      val isNull = src.isNullAt(ord)
      markValidity(c, !isNull)
      val valCol = c + 1 + colsOf(kt)
      if (!isNull) {
        val m = src.getMap(ord)
        val keys = m.keyArray()
        val vals = m.valueArray()
        val n = m.numElements()
        var k = 0
        while (k < n) {
          emitValue(kt, keys, k, c + 1, top = false, validity = false)
          // map values may be null: validity rides the value column
          emitValue(vt, vals, k, valCol, top = false, validity = true)
          k += 1
        }
        listValCount(c) += n
      }
      fixedBufs(c).write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(listValCount(c)).array())
      1 + colsOf(kt) + colsOf(vt)
    case other =>
      emitScalar(other, src, ord, c, top, validity)
      1
  }

  def write(row: InternalRow): Unit = {
    var c = 0 // physical column cursor
    var s = 0 // schema field cursor
    while (s < schema.length) {
      val isNull = row.isNullAt(s)
      schema(s).dataType match {
        case ArrayType(elem, _) if layout.phys(c).isInstanceOf[FslValues] =>
          // lance vector column: exactly dim contiguous values per row
          val dim = layout.phys(c).asInstanceOf[FslValues].dim
          markValidity(c, !isNull)
          if (!isNull) {
            val arr = row.getArray(s)
            require(arr.numElements() == dim,
              s"fixed_size_list '${schema(s).name}' expects $dim elements, got ${arr.numElements()}")
            var k = 0
            while (k < dim) {
              require(!arr.isNullAt(k),
                "lance writer: null list elements are not supported")
              putFixed(c, elem, arr.get(k, elem), track = false)
              k += 1
            }
          } else {
            var k = 0
            while (k < dim) {
              putFixed(c, elem, LanceWriteSupport.zeroOf(elem), track = false)
              k += 1
            }
          }
          c += 1
        case dt =>
          c += emitValue(dt, row, s, c,
            top = !dt.isInstanceOf[StructType] && !dt.isInstanceOf[ArrayType] &&
                  !dt.isInstanceOf[MapType],
            validity = true)
      }
      s += 1
    }
    rowsInPage += 1
    totalRows += 1
    if (rowsInPage >= pageRows) flushPage()
  }

  private def pad64(): Unit = {
    val rem = (pos % 64).toInt
    if (rem != 0) { val pad = new Array[Byte](64 - rem); out.write(pad); pos += 64 - rem }
  }

  private def writeBuf(b: Array[Byte]): (Long, Long) = {
    pad64()
    val off = pos
    out.write(b); pos += b.length
    (off, b.length.toLong)
  }

  private def flushPage(): Unit = {
    if (rowsInPage == 0) return
    var c = 0
    while (c < nPhys) {
      val varWidth = layout.phys(c) match {
        case Scalar(StringType | BinaryType) => true
        case ListValues(StringType | BinaryType) => true
        case _ => false
      }
      val isBool = layout.phys(c).dt == BooleanType && !varWidth
      val pageRowCount: Long = layout.rowCountCol(c) match {
        case -1 => rowsInPage.toLong
        case offsetsCol => listValCount(offsetsCol)
      }
      if (isBool && boolBit(c) > 0) {
        fixedBufs(c).write(boolAcc(c)); boolAcc(c) = 0; boolBit(c) = 0
      }
      if (validBit(c) > 0) {
        validBufs(c).write(validAcc(c)); validAcc(c) = 0; validBit(c) = 0
      }
      // pages that saw nulls get a leading validity-bitmap buffer
      val validityRaw: Seq[Array[Byte]] =
        if (sawNull(c)) Seq(validBufs(c).toByteArray) else Nil
      val useDict = varWidth && dictable(c) && !dictOverflow(c) &&
        dictMaps(c).size() > 0 && dictMaps(c).size() * 2 < rowsInPage
      val rawBufs: Seq[Array[Byte]] = if (useDict) {
        // indices buffer (i32 LE), dictionary end-offsets (i64 LE), bytes
        val n = dictIdx(c).length
        val idxBB = ByteBuffer.allocate(4 * n).order(ByteOrder.LITTLE_ENDIAN)
        dictIdx(c).foreach(idxBB.putInt)
        val dictBytes = new ByteArrayOutputStream()
        val offBB = ByteBuffer.allocate(8 * dictMaps(c).size()).order(ByteOrder.LITTLE_ENDIAN)
        val it = dictMaps(c).keySet().iterator()
        while (it.hasNext) {
          val k = it.next()
          dictBytes.write(k.array(), k.arrayOffset(), k.remaining())
          offBB.putLong(dictBytes.size().toLong)
        }
        byteBufs(c).reset()
        validityRaw ++ Seq(idxBB.array(), offBB.array(), dictBytes.toByteArray)
      } else if (varWidth) {
        val bufs = validityRaw ++ Seq(fixedBufs(c).toByteArray, byteBufs(c).toByteArray)
        byteBufs(c).reset()
        bufs
      } else {
        validityRaw ++ Seq(fixedBufs(c).toByteArray)
      }
      // compress the page's buffers when a codec is configured AND it
      // actually shrinks them; incompressible pages stay plain (no flag)
      val compressed: Option[Seq[Array[Byte]]] =
        if (codecId == LanceCodec.None) scala.None
        else {
          val comp = rawBufs.map(LanceCodec.compress(codecId, _))
          if (comp.map(_.length.toLong).sum < rawBufs.map(_.length.toLong).sum)
            Some(comp)
          else scala.None
        }
      val written = compressed.getOrElse(rawBufs).map(writeBuf)
      pageMetas(c) += ((written.map(_._1), written.map(_._2), pageRowCount,
        zoneMin(c), zoneMax(c)))
      compMetas(c) += compressed.map(_ => rawBufs.map(_.length.toLong))
      dictFlags(c) += useDict
      strZoneMetas(c) +=
        (if (strZoneMin(c) != null)
           Some((graft.sources.lance.ZoneFilter.prefixLong(strZoneMin(c)),
                 graft.sources.lance.ZoneFilter.prefixLong(strZoneMax(c))))
         else None)
      fixedBufs(c).reset()
      validBufs(c).reset()
      sawNull(c) = false
      zoneMin(c) = Double.NaN
      zoneMax(c) = Double.NaN
      strZoneMin(c) = null
      strZoneMax(c) = null
      dictMaps(c).clear()
      dictIdx(c).clear()
      dictOverflow(c) = false
      c += 1
    }
    java.util.Arrays.fill(listValCount, 0L)
    rowsInPage = 0
  }

  /** Finish the file; returns total row count. */
  def finish(): Long = {
    flushPage()
    // global buffer: file descriptor {1: schema{fields}, 2: numRows}
    val descr = {
      val w = new Proto.Writer
      val sw = new Proto.Writer
      layout.fields.foreach(f => sw.message(1, LanceWriteSupport.fieldProto(f)))
      w.message(1, sw).varint(2, totalRows)
      w.result()
    }
    val (gbOff, gbLen) = writeBuf(descr)
    // column metadata blobs
    pad64()
    val cmOffsets = (0 until nPhys).map { c =>
      val dt = layout.phys(c).dt
      val w = new Proto.Writer
      w.bytes(1, LanceWriteSupport.columnEncodingAny())
      pageMetas(c).zipWithIndex.foreach { case ((offs, sizes, nrows, mn, mx), pi) =>
        val pw = new Proto.Writer
        pw.packed(1, offs).packed(2, sizes).varint(3, nrows)
        pw.bytes(4, LanceWriteSupport.arrayEncodingAny(dt, LanceWriteSupport.bitsFor(dt)))
        if (!mn.isNaN && !mx.isNaN) {
          pw.fixed64(10, java.lang.Double.doubleToLongBits(mn))
          pw.fixed64(11, java.lang.Double.doubleToLongBits(mx))
        }
        strZoneMetas(c).lift(pi).flatten.foreach { case (sMin, sMax) =>
          pw.fixed64(12, sMin)
          pw.fixed64(13, sMax)
        }
        if (dictFlags(c).lift(pi).contains(true)) pw.varint(14, 1L)
        compMetas(c).lift(pi).flatten.foreach { rawSizes =>
          pw.varint(15, codecId.toLong)
          pw.packed(16, rawSizes)
        }
        w.message(2, pw)
      }
      val b = w.result()
      val off = pos
      out.write(b); pos += b.length
      (off, b.length.toLong)
    }
    val colMetaStart = cmOffsets.headOption.map(_._1).getOrElse(pos)
    // column metadata offset table
    val cmoStart = pos
    val cmoBuf = ByteBuffer.allocate(nPhys * 16).order(ByteOrder.LITTLE_ENDIAN)
    cmOffsets.foreach { case (o, l) => cmoBuf.putLong(o); cmoBuf.putLong(l) }
    out.write(cmoBuf.array()); pos += nPhys * 16
    // global buffer offset table
    val gboStart = pos
    val gboBuf = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(gbOff).putLong(gbLen)
    out.write(gboBuf.array()); pos += 16
    // footer
    val f = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    f.putLong(colMetaStart).putLong(cmoStart).putLong(gboStart)
    f.putInt(1).putInt(nPhys)
    f.putShort(0.toShort).putShort(3.toShort) // file version 2.0 = (0, 3)
    f.put(LanceFormat.Magic)
    out.write(f.array()); pos += 40
    totalRows
  }
}

object LanceWriteSupport {
  import LanceSchemaLayout._

  def logicalTypeFor(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date32:day"
    case TimestampType => "timestamp:us:UTC"
    case TimestampNTZType => "timestamp:us"
    case d: DecimalType => s"decimal:128:${d.precision}:${d.scale}"
    case other => throw new UnsupportedOperationException(s"lance: $other")
  }

  /** Placeholder written under a null's validity bit. */
  def zeroOf(dt: DataType): Any = dt match {
    case BooleanType => false
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType | DateType => 0
    case LongType | TimestampType | TimestampNTZType => 0L
    case FloatType => 0.0f
    case DoubleType => 0.0
    case d: DecimalType =>
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(java.math.BigInteger.ZERO, d.scale), d.precision, d.scale)
    case other => throw new UnsupportedOperationException(s"lance: $other")
  }

  def bitsFor(dt: DataType): Int = dt match {
    case BooleanType => 1
    case ByteType => 8
    case ShortType => 16
    case IntegerType | FloatType | DateType => 32
    case _: DecimalType => 128
    case _ => 64
  }

  /** Field message as observed in the golden manifest: name=2, id=3,
    * parent_id=4, logical_type=5, encoding=7, storage_class=11. */
  def fieldProto(f: FieldDef): Proto.Writer = {
    val w = new Proto.Writer
    w.string(2, f.name)
    if (f.id != 0) w.varint(3, f.id.toLong)
    // always explicit (even 0) — the reader treats an absent parent as -1,
    // mirroring the golden manifest's explicit -1 for top-level fields
    w.varint(4, if (f.parentId == -1) -1L else f.parentId.toLong)
    w.string(5, f.logicalType)
    w.varint(7, if (f.varWidth) 2L else 1L)
    w.string(11, "default")
    w
  }

  /** Same message from a parsed manifest field (schema-evolution path:
    * committed ids re-emitted verbatim). */
  def fieldProtoOf(f: LanceFormat.LanceField): Proto.Writer =
    fieldProto(FieldDef(f.id, f.parentId, f.name, f.logicalType,
      varWidth = Set("string", "utf8", "large_string", "binary", "large_binary")
        .contains(f.logicalType)))

  /** ColumnEncoding Any wrapper (observed constant: values encoding). */
  def columnEncodingAny(): Array[Byte] = {
    val any = new Proto.Writer
    any.string(1, "/lance.encodings.ColumnEncoding")
    any.bytes(2, { val v = new Proto.Writer; v.bytes(1, Array.emptyByteArray); v.result() })
    // Encoding { direct = 2 { DirectEncoding { encoding = 1: Any } } } —
    // the golden file's three-level wrapper
    val direct = new Proto.Writer
    direct.message(1, any)
    val outer = new Proto.Writer
    outer.message(2, direct)
    outer.result()
  }

  /** ArrayEncoding Any wrapper: flat value encoding with bits-per-value,
    * nested as observed in the golden file; var-width columns get the
    * binary encoding (index buffer + byte buffer). */
  def arrayEncodingAny(dt: DataType, bits: Int): Array[Byte] = {
    def flat(bitsPer: Int, bufIdx: Option[Int]): Proto.Writer = {
      val buf = new Proto.Writer
      // Buffer{ buffer_index = 1 } — the golden file stores the page-buffer
      // index at field 1 (`08 01` for the bytes buffer of Binary)
      bufIdx.foreach(i => buf.varint(1, i.toLong))
      val l4 = new Proto.Writer; l4.varint(1, bitsPer.toLong).bytes(2, buf.result())
      val l3 = new Proto.Writer; l3.message(1, l4)
      val l2 = new Proto.Writer; l2.message(1, l3)
      val l1 = new Proto.Writer; l1.message(1, l2)
      l1
    }
    val enc = new Proto.Writer
    dt match {
      case StringType | BinaryType =>
        val bin = new Proto.Writer
        val idx = new Proto.Writer; idx.message(2, flat(64, None))
        bin.bytes(1, idx.result())
        val dat = new Proto.Writer; dat.message(2, flat(8, Some(1)))
        bin.bytes(2, dat.result())
        // null_adjustment = 0, truthfully: this writer emits PLAIN
        // end-offsets (null rows get an empty range) with validity in a
        // separate buffer — it does NOT use the end+adjustment null
        // encoding. The golden file's 24 was cargo-culted here until
        // round 7; stamping it made our own pages indistinguishable from
        // foreign adjusted-offset pages, which the tightened classify()
        // now routes to the tree-driven decoder.
        bin.varint(3, 0L)
        enc.message(6, bin)
      case _ =>
        enc.message(2, flat(bits, None))
    }
    val any = new Proto.Writer
    any.string(1, "/lance.encodings.ArrayEncoding")
    any.bytes(2, enc.result())
    val direct = new Proto.Writer
    direct.message(1, any)
    val outer = new Proto.Writer
    outer.message(2, direct)
    outer.result()
  }

  /** Serialize a manifest (version N) and commit it atomically.
    * `fragments`: (file name, rows, fragment-level numeric stats). */
  def writeManifest(conf: Configuration, dataset: Path, schema: StructType,
                    fragments: Seq[(String, Long, Seq[(Int, Double, Double)])],
                    startFragId: Long,
                    previous: Seq[LanceFormat.FragmentMeta], version: Long,
                    fsl: Map[String, Int] = Map.empty,
                    prevFields: Seq[LanceFormat.LanceField] = Nil,
                    newRowIds: Seq[Seq[LanceFormat.RowIdSeg]] = Nil,
                    nextRowId: Long = 0L,
                    newPartVals: Seq[Seq[String]] = Nil,
                    partitionCols: Seq[String] = Nil,
                    sortCols: Seq[String] = Nil): Unit = {
    require(newRowIds.isEmpty || newRowIds.length == fragments.length,
      "lance: newRowIds must align 1:1 with the new fragments")
    require(newPartVals.isEmpty || newPartVals.length == fragments.length,
      "lance: newPartVals must align 1:1 with the new fragments")
    val layout = LanceSchemaLayout.of(schema, fsl)
    // On an evolved dataset (column added/dropped/renamed) field ids are no
    // longer the DFS positions this schema would regenerate — appends must
    // reuse the previous manifest's ids verbatim, or carried-over fragments
    // would resolve their columns against the wrong ids.
    val keepPrevIds = prevFields.nonEmpty && (
      layout.fields.length != prevFields.length ||
      layout.fields.zip(prevFields).exists { case (g, p) =>
        g.id != p.id || g.name != p.name || g.logicalType != p.logicalType
      })
    // generated field id (== DFS position) -> committed manifest id.
    // Matching is PATH-keyed, not positional: after nested evolution the
    // manifest's field order is no longer this schema's DFS order (an
    // appended struct sub-field sits at the end of the field list), but
    // (parent-path, name) still identifies every field uniquely.
    def dottedPaths(ids: Seq[Int], parents: Seq[Int],
                    names: Seq[String]): Map[Int, String] = {
      val parentOf = ids.zip(parents).toMap
      val nameOf = ids.zip(names).toMap
      def walk(i: Int): String = {
        val p = parentOf(i)
        if (p == -1) nameOf(i) else walk(p) + "." + nameOf(i)
      }
      ids.map(id => id -> walk(id)).toMap
    }
    val idOf: Int => Int =
      if (!keepPrevIds) identity
      else {
        val genPathOf = dottedPaths(layout.fields.map(_.id),
          layout.fields.map(_.parentId), layout.fields.map(_.name))
        val prevPathOf = dottedPaths(prevFields.map(_.id),
          prevFields.map(_.parentId), prevFields.map(_.name))
        val prevByPath = prevFields.map(f => prevPathOf(f.id) -> f).toMap
        val unmatched = layout.fields.filterNot(g =>
          prevByPath.get(genPathOf(g.id)).exists(_.logicalType == g.logicalType))
        require(unmatched.isEmpty && layout.fields.length == prevFields.length,
          s"lance append: write schema ${layout.fields.map(f => s"${genPathOf(f.id)}:${f.logicalType}")} " +
          s"does not match dataset fields ${prevFields.map(f => s"${prevPathOf(f.id)}:${f.logicalType}")}")
        genId => prevByPath(genPathOf(genId)).id
      }
    val w = new Proto.Writer
    if (keepPrevIds) prevFields.foreach(f => w.message(1, fieldProtoOf(f)))
    else layout.fields.foreach(f => w.message(1, fieldProto(f)))
    def statMsgs(fw: Proto.Writer, stats: Seq[(Int, Double, Double)]): Unit =
      stats.foreach { case (fid, mn, mx) =>
        val sw = new Proto.Writer
        sw.varint(1, fid.toLong)
        sw.fixed64(2, java.lang.Double.doubleToLongBits(mn))
        sw.fixed64(3, java.lang.Double.doubleToLongBits(mx))
        fw.message(9, sw)
      }
    // carried-over fragments (append mode), then the new ones
    previous.foreach { fr =>
      val fw = new Proto.Writer
      if (fr.id != 0) fw.varint(1, fr.id)
      fr.files.foreach { df =>
        val dw = new Proto.Writer
        dw.string(1, df.path).packed(2, df.fieldIds.map(_.toLong))
          .packed(3, df.columnIndices.map(_.toLong)).varint(4, 2L)
        fw.message(2, dw)
      }
      // deletion vectors survive appends: re-emit the carried fragment's
      // deletion_file (DataFragment field 3) untouched
      fr.deletion.foreach { d =>
        val dv = new Proto.Writer
        dv.varint(1, d.readVersion).varint(2, d.id)
          .varint(3, d.fileType.toLong).varint(4, d.numDeleted)
        fw.message(3, dv)
      }
      fw.varint(4, fr.physicalRows)
      // move-stable row ids survive appends: re-emit the carried
      // fragment's row_id_meta (DataFragment field 5, inline bytes)
      fr.rowIds.foreach { segs =>
        val rm = new Proto.Writer
        rm.bytes(1, LanceFormat.encodeRowIds(segs))
        fw.message(5, rm)
      }
      statMsgs(fw, fr.stats)
      // layout extension: carried fragments keep their partition values
      fr.partValues.foreach(v => fw.string(10, v))
      w.message(2, fw)
    }
    // DataFile.fields lists only fields that own a physical column (struct
    // parents own none; their leaves do)
    val colFieldIds = layout.topFieldIdOfCol.map(g => idOf(g).toLong)
    fragments.zipWithIndex.foreach { case ((path, rows, stats), i) =>
      val fw = new Proto.Writer
      val fid = startFragId + i
      if (fid != 0) fw.varint(1, fid)
      val dw = new Proto.Writer
      dw.string(1, path).packed(2, colFieldIds)
        .packed(3, colFieldIds.indices.map(_.toLong)).varint(4, 2L)
      fw.message(2, dw)
      fw.varint(4, rows)
      if (newRowIds.nonEmpty) {
        val rm = new Proto.Writer
        rm.bytes(1, LanceFormat.encodeRowIds(newRowIds(i)))
        fw.message(5, rm)
      }
      // stats arrive keyed by generated positional ids (fileStats uses
      // layout.topFieldIdOfCol) — on an evolved dataset those differ from
      // the committed ids the fragment's fieldIds use, so remap through
      // idOf or pruning would read the wrong column's min/max
      statMsgs(fw, stats.map { case (fid, mn, mx) => (idOf(fid), mn, mx) })
      if (newPartVals.nonEmpty) newPartVals(i).foreach(v => fw.string(10, v))
      w.message(2, fw)
    }
    w.varint(3, version)
    if (nextRowId > 0L) w.varint(14, nextRowId)
    // layout extension (private tags; see Manifest scaladoc)
    partitionCols.foreach(c => w.string(499, c))
    sortCols.foreach(c => w.string(498, c))
    w.message(13, { val v = new Proto.Writer; v.string(1, "lance").string(2, "0.32.1"); v })
    w.message(15, { val v = new Proto.Writer; v.string(1, "lance").string(2, "2.0"); v })
    commitManifest(conf, dataset, w.result(), version)
  }

  /** Frame + atomically commit serialized Manifest bytes as version N. */
  def commitManifest(conf: Configuration, dataset: Path, pb: Array[Byte],
                     version: Long): Unit = {
    val body = new ByteArrayOutputStream()
    val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(pb.length)
    body.write(len.array()); body.write(pb)
    // tail as observed in the golden manifest: 8 zero bytes, u16 = 1, magic
    body.write(new Array[Byte](8))
    body.write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(1.toShort).array())
    body.write(LanceFormat.Magic)

    val fs = dataset.getFileSystem(conf)
    val versionsDir = new Path(dataset, "_versions")
    fs.mkdirs(versionsDir)
    val dest = new Path(versionsDir, s"$version.manifest")
    // Commit strategy is conf-switchable (`graft.lance.commit.mode`):
    //
    //  - "rename" (default): stage to a .tmp and FileContext.rename with
    //    Options.Rename.NONE, which refuses an existing dest (plain
    //    FileSystem.rename silently OVERWRITES on local/raw filesystems,
    //    losing a concurrent committer's manifest). Correct wherever
    //    rename is atomic (local, HDFS).
    //  - "create": write dest DIRECTLY with create(overwrite = false) —
    //    the object-store shape. S3A/GCS rename is copy+delete and NOT
    //    atomic, so the rename dance both costs a copy and proves
    //    nothing there; a single PUT is atomically visible, and
    //    create-no-overwrite maps to the store's conditional write.
    //    Readers are protected against a torn in-progress manifest by
    //    the framing validation (length prefix + LANC tail).
    //
    // The version-claim itself is read-modify-write of `latest`, so true
    // multi-writer safety needs a coordinating catalog — single-writer
    // per dataset is the documented assumption; concurrent commits to
    // the SAME version are detected in either mode and rejected.
    conf.get("graft.lance.commit.mode", "rename") match {
      case "create" =>
        val os = try fs.create(dest, false) catch {
          case e: Exception =>
            throw new LanceCommitConflict(
              s"lance: concurrent write detected committing $dest", e)
        }
        // Object-store PUT visibility is all-or-nothing, so a failed PUT
        // leaves nothing. On a POSIX fs an interrupted create+write CAN
        // leave torn bytes at the final path — best-effort delete on any
        // write failure so retries aren't blocked by a poisoned version;
        // readers racing a torn manifest are rejected by readManifest's
        // framing validation either way. (For POSIX deployments the
        // default rename mode stages through a .tmp and never exposes
        // partial bytes.)
        try os.write(body.toByteArray)
        catch { case e: Throwable =>
          try { os.close(); fs.delete(dest, false) } catch { case _: Throwable => () }
          throw e
        }
        os.close()
      case _ =>
        val tmp = new Path(versionsDir, s".$version.manifest.${UUID.randomUUID()}.tmp")
        val os = fs.create(tmp, false)
        try os.write(body.toByteArray) finally os.close()
        val local = Option(dest.toUri.getScheme).forall(_ == "file")
        try {
          if (local) {
            // Local FS: FileContext.rename(NONE) is a client-side
            // exists-check + POSIX rename (which CLOBBERS) — a TOCTOU
            // window where two same-version committers both pass the
            // check and one manifest is silently lost (observed under a
            // loaded test box). link(2) is the kernel-atomic no-clobber
            // primitive: it FAILS if dest exists, no window at all.
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(dest.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            fs.delete(tmp, false)
          } else {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(dest.toUri, conf)
            fc.rename(tmp, dest)
          }
        } catch {
          case e: Exception =>
            fs.delete(tmp, false)
            throw new LanceCommitConflict(
              s"lance: concurrent write detected committing $dest", e)
        }
    }
  }
}

/** A concurrent committer claimed this version first (the Rename.NONE
  * version-claim failed). Appends catch this and rebase on the new
  * latest manifest. */
class LanceCommitConflict(msg: String, cause: Throwable)
    extends java.io.IOException(msg, cause)
