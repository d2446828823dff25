package graft.sources.lance

import org.apache.spark.sql.types.{Decimal, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** Foreign-page encoding support: pages written by the real `lance` crate
  * (reference pins lance 0.32.1 — `/root/reference/Cargo.lock:2664`),
  * whose writer emits compressed encodings our own writer never produces.
  *
  * Two page families are recognized from the page's `encoding` Any wrapper
  * (Page proto field 4 → Encoding → direct(2) → Any{type_url=1, value=2}):
  *
  *  - `/lance.encodings.ArrayEncoding` — the 2.0 "logical encoding tree".
  *    Byte-verified tags (golden file `test/test_data.lance`): flat=1
  *    (Flat{bits_per_value=1, buffer=2}), nullable=2 (no_nulls=1 wrapping
  *    values=1), binary=6 (indices=1, bytes=2, null_adjustment=3), and
  *    Buffer{buffer_index=1}. Remaining tags follow the public
  *    `encodings.proto` ordering and are documented here as assumptions
  *    (no reference-written file with them exists in this container):
  *    fixed_size_list=3 (items=1, dimension=2), dictionary=4 (indices=1,
  *    items=2, num_dictionary_items=3), fsst=7 (binary=1, symbol_table=2
  *    — see [[AFsst]]), bitpacked=8 (compressed_bits=1,
  *    uncompressed_bits=2, buffer=3, signed=4), bitpacked_for_non_neg=10
  *    (same minus signed), constant=11 (value=1, num_values=2).
  *
  *  - `/lance.encodings.PageLayout` — the 2.1 structural layout:
  *    mini_block=1, full_zip=2 (see [[FullZipPage]]), all_null=3.
  *    MiniBlockLayout{def_compression=2, value_compression=3,
  *    repetition_index_depth=4}; compressive encodings: flat=1
  *    {bits_per_value=1}, inline_bitpacking=2 {uncompressed_bits=1},
  *    variable=3 {bits_per_offset=1}.
  *
  * Miniblock physical layout (per the published 2.1 design: values are
  * chunked so a chunk decompresses independently; offsets unverifiable
  * offline, golden fixtures in LanceForeignSpec pin this reading):
  * buffer 0 = one u16 LE word per chunk — low 12 bits: chunk byte length
  * in 8-byte words; high 4 bits: log2(values in chunk), every chunk but
  * the last holding a power-of-two value count and the last taking the
  * remainder; buffer 1 = the chunks, each 8-byte aligned. Chunk content:
  * flat = contiguous LE values; inline bitpacking = 1 width byte then
  * LSB-first packed values; variable = u32 end offsets then bytes.
  *
  * Bitpacked streams (both families) are LSB-first: value i occupies bits
  * [i*w, (i+1)*w) of the buffer read as a little-endian bit stream; the
  * signed variant sign-extends from bit w-1.
  */
object LanceEncodings {

  // ---- parsed page encoding ----------------------------------------------
  sealed trait PageEnc { def foreign: Boolean = false }
  /** No encoding proto, or one matching our writer's conventions. */
  case object NativeShape extends PageEnc
  final case class ForeignArray(enc: AEnc) extends PageEnc { override def foreign = true }
  /** 2.1 miniblock page. `defComp`, when present, compresses per-item u16
    * definition levels (0 = null, >0 = present for a flat column); each
    * chunk then lays out [def section (8-byte aligned)][values for
    * non-null items]. */
  final case class MiniBlockPage(valComp: CEnc, defComp: Option[CEnc]) extends PageEnc {
    override def foreign = true
  }
  /** 2.1 full-zip page: items stored self-contained in one buffer. Layout
    * per item (assumed, fixture-pinned): optional 1-byte rep level when
    * `hasRep` (Parquet-style shredding restricted to one nesting level:
    * 0 = the item starts a new top-level row, 1 = it extends the current
    * row's list), optional 1-byte def marker when `hasDef` (0 = null —
    * null ROW under `hasRep` — with no value bytes; 1 = empty list under
    * `hasRep`; max = value present), then the value — fixed `bits/8`
    * bytes for [[CFlat]], or a `bits_per_offset/8`-byte LE length prefix
    * + bytes for [[CVariable]]. */
  final case class FullZipPage(enc: CEnc, hasDef: Boolean,
                               hasRep: Boolean = false) extends PageEnc {
    override def foreign = true
  }
  case object AllNullPage extends PageEnc { override def foreign = true }

  sealed trait AEnc
  final case class AFlat(bits: Int, bufIdx: Int) extends AEnc
  final case class ANoNull(values: AEnc) extends AEnc
  final case class ASomeNull(validity: AEnc, values: AEnc) extends AEnc
  case object AAllNull extends AEnc
  final case class ABinary(indices: AEnc, bytes: AEnc, nullAdj: Long) extends AEnc
  final case class AFsl(dim: Int, items: AEnc) extends AEnc
  final case class ADict(indices: AEnc, items: AEnc, numItems: Int) extends AEnc
  final case class ABitpacked(cbits: Int, ubits: Int, bufIdx: Int, signed: Boolean) extends AEnc
  final case class AConstant(value: Array[Byte], n: Long) extends AEnc
  /** FSST-compressed strings (public FSST scheme — Boncz et al., VLDB'20):
    * `binary` is the usual offsets+bytes tree whose byte ranges hold the
    * compressed form; `table` is the serialized symbol table. Proto
    * (assumed, fixture-pinned): Fsst{ binary ArrayEncoding = 1,
    * symbol_table bytes = 2 }. Table layout (assumed): n = len/9 symbols —
    * n 8-byte LE symbol slots then n length bytes. Decode: code 255
    * escapes the next literal byte; any other code c emits symbol c. */
  final case class AFsst(binary: AEnc, table: Array[Byte]) extends AEnc
  final case class AUnsupported(what: String) extends AEnc

  sealed trait CEnc
  final case class CFlat(bits: Int) extends CEnc
  final case class CInlineBitpack(ubits: Int) extends CEnc
  final case class CVariable(bitsPerOffset: Int) extends CEnc
  /** General block compression wrapping an inner encoding. Chunk content:
    * u32 LE compressed length, then that many compressed bytes (zero pad
    * to the 8-byte chunk boundary); decompressed bytes decode via `inner`.
    * Proto (assumed, fixture-pinned): tag 4 = General{ compression = 1
    * { scheme: string = 1 }, inner CompressiveEncoding = 2 }; schemes
    * "zstd" and "lz4" (frame format) — the codecs Spark itself ships. */
  final case class CGeneral(scheme: String, inner: CEnc) extends CEnc

  // ---- parsing -----------------------------------------------------------
  /** Parse a Page proto's `encoding` field (tag 4) into a [[PageEnc]].
    * Malformed or unrecognized wrappers fall back to [[NativeShape]] —
    * decode then proceeds on the positional convention, never failing a
    * scan on metadata we merely couldn't interpret. */
  def parsePage(pageFields: Seq[Proto.PField]): PageEnc =
    try {
      Proto.firstBytes(pageFields, 4).map { encBytes =>
        val enc = Proto.parse(encBytes)
        // Encoding { direct = 2 { Any encoding = 1 } } (golden layout);
        // historical files from this writer put the Any at field 2 directly
        def looksLikeAny(bytes: Array[Byte]): Boolean =
          try Proto.firstString(Proto.parse(bytes), 1).exists(_.startsWith("/"))
          catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => false }
        val direct = Proto.firstBytes(enc, 2)
        val any = direct.flatMap { d =>
          if (looksLikeAny(d)) Some(d)
          else Proto.parse(d).find(f => f.tag == 1 && f.wire == 2)
            .map(_.bytes).filter(looksLikeAny)
        }
        any.map { a =>
          val af = Proto.parse(a)
          val url = Proto.firstString(af, 1).getOrElse("")
          val value = Proto.firstBytes(af, 2).getOrElse(Array.emptyByteArray)
          if (url.endsWith("ArrayEncoding")) classify(parseArray(value))
          else if (url.endsWith("PageLayout")) parseLayout(value)
          // unknown wrapper: positional decode would read garbage — carry
          // a clear decode-time error instead
          else ForeignArray(AUnsupported(s"page encoding wrapper '$url'"))
        }.getOrElse(
          ForeignArray(AUnsupported("unrecognized page encoding structure")))
      }.getOrElse(NativeShape) // no encoding recorded: positional layout
    } catch {
      case _: RuntimeException | _: ArrayIndexOutOfBoundsException =>
        ForeignArray(AUnsupported("malformed page encoding proto"))
    }

  /** Our own writer emits flat (via nullable.no_nulls) and binary trees but
    * layers its validity/dictionary conventions on top without describing
    * them in the proto — those shapes stay on the positional decode path.
    * Anything else present in the tree is genuinely foreign. */
  private def classify(enc: AEnc): PageEnc = {
    def nativeLeaf(e: AEnc): Boolean = e match {
      case _: AFlat => true
      case ANoNull(v) => nativeLeaf(v)
      case _ => false
    }
    def flatBits(e: AEnc): Option[Int] = e match {
      case AFlat(b, _) => Some(b)
      case ANoNull(v) => flatBits(v)
      case _ => None
    }
    enc match {
      case e if nativeLeaf(e) => NativeShape
      // positional binary decode hardcodes 64-bit offsets and
      // end-exclusive semantics: a binary tree only qualifies when the
      // proto says exactly that (i64 offset indices, null_adjustment 0).
      // Foreign-written plain binary with i32 offsets or end+adjustment
      // null encoding routes to decodeTree, which derives the layout from
      // the tree — previously it slipped through and decoded garbage
      // (silently wrong blob ranges through the blobRefs guard).
      case ABinary(i, b, adj)
          if flatBits(i).contains(64) && nativeLeaf(b) && adj == 0 => NativeShape
      case other => ForeignArray(other)
    }
  }

  private[lance] def parseArray(bytes: Array[Byte]): AEnc = {
    val fs = Proto.parse(bytes)
    fs.headOption match {
      case None => AUnsupported("empty ArrayEncoding")
      case Some(f) => f.tag match {
        case 1 => // Flat
          val m = Proto.parse(f.bytes)
          AFlat(Proto.firstVarint(m, 1).getOrElse(64L).toInt, bufIdxOf(m, 2))
        case 2 => // Nullable
          val m = Proto.parse(f.bytes)
          Proto.firstBytes(m, 1).map(n =>
            ANoNull(Proto.firstBytes(Proto.parse(n), 1).map(parseArray)
              .getOrElse(AUnsupported("no_nulls without values")))
          ).orElse(Proto.firstBytes(m, 2).map { s =>
            val sf = Proto.parse(s)
            ASomeNull(
              Proto.firstBytes(sf, 1).map(parseArray).getOrElse(AUnsupported("some_nulls w/o validity")),
              Proto.firstBytes(sf, 2).map(parseArray).getOrElse(AUnsupported("some_nulls w/o values")))
          }).getOrElse(AAllNull)
        case 3 => // FixedSizeList
          val m = Proto.parse(f.bytes)
          AFsl(Proto.firstVarint(m, 2).getOrElse(0L).toInt,
               Proto.firstBytes(m, 1).map(parseArray).getOrElse(AUnsupported("fsl w/o items")))
        case 4 => // Dictionary
          val m = Proto.parse(f.bytes)
          ADict(
            Proto.firstBytes(m, 1).map(parseArray).getOrElse(AUnsupported("dict w/o indices")),
            Proto.firstBytes(m, 2).map(parseArray).getOrElse(AUnsupported("dict w/o items")),
            Proto.firstVarint(m, 3).getOrElse(0L).toInt)
        case 6 => // Binary
          val m = Proto.parse(f.bytes)
          ABinary(
            Proto.firstBytes(m, 1).map(parseArray).getOrElse(AUnsupported("binary w/o indices")),
            Proto.firstBytes(m, 2).map(parseArray).getOrElse(AUnsupported("binary w/o bytes")),
            Proto.firstVarint(m, 3).getOrElse(0L))
        case 8 => // Bitpacked
          val m = Proto.parse(f.bytes)
          ABitpacked(
            Proto.firstVarint(m, 1).getOrElse(0L).toInt,
            Proto.firstVarint(m, 2).getOrElse(64L).toInt,
            bufIdxOf(m, 3),
            Proto.firstVarint(m, 4).contains(1L))
        case 10 => // BitpackedForNonNeg
          val m = Proto.parse(f.bytes)
          ABitpacked(
            Proto.firstVarint(m, 1).getOrElse(0L).toInt,
            Proto.firstVarint(m, 2).getOrElse(64L).toInt,
            bufIdxOf(m, 3), signed = false)
        case 11 => // Constant
          val m = Proto.parse(f.bytes)
          AConstant(Proto.firstBytes(m, 1).getOrElse(Array.emptyByteArray),
                    Proto.firstVarint(m, 2).getOrElse(0L))
        case 7 => // Fsst
          val m = Proto.parse(f.bytes)
          AFsst(
            Proto.firstBytes(m, 1).map(parseArray).getOrElse(AUnsupported("fsst w/o binary")),
            Proto.firstBytes(m, 2).getOrElse(Array.emptyByteArray))
        case other => AUnsupported(s"ArrayEncoding tag $other")
      }
    }
  }

  /** Nested Buffer message at `tag` → buffer_index (field 1), default 0. */
  private def bufIdxOf(fs: Seq[Proto.PField], tag: Int): Int =
    Proto.firstBytes(fs, tag)
      .flatMap(b => Proto.firstVarint(Proto.parse(b), 1))
      .getOrElse(0L).toInt

  private def parseLayout(bytes: Array[Byte]): PageEnc = {
    val fs = Proto.parse(bytes)
    Proto.firstBytes(fs, 1).map { mb => // mini_block_layout
      val m = Proto.parse(mb)
      val valComp = Proto.firstBytes(m, 3).map(parseCompressive).getOrElse(CFlat(64))
      MiniBlockPage(valComp, defComp = Proto.firstBytes(m, 2).map(parseCompressive))
    }.orElse(Proto.firstBytes(fs, 2).map { fz => // full_zip_layout
      // FullZipLayout (assumed tags): bits_rep=1, bits_def=2, details
      // oneof { bits_per_value=3 | bits_per_offset=4 },
      // value_compression=5
      val m = Proto.parse(fz)
      val bitsRep = Proto.firstVarint(m, 1).getOrElse(0L).toInt
      val bitsDef = Proto.firstVarint(m, 2).getOrElse(0L).toInt
      val enc = Proto.firstBytes(m, 5).map(parseCompressive)
        .orElse(Proto.firstVarint(m, 3).map(b => CFlat(b.toInt): CEnc))
        .orElse(Proto.firstVarint(m, 4).map(b => CVariable(b.toInt): CEnc))
        .getOrElse(CFlat(64))
      FullZipPage(enc, hasDef = bitsDef > 0, hasRep = bitsRep > 0): PageEnc
    }).orElse(Proto.firstBytes(fs, 3).map(_ => AllNullPage: PageEnc))
     .getOrElse(ForeignArray(AUnsupported("unrecognized 2.1 page layout")))
  }

  private def parseCompressive(bytes: Array[Byte]): CEnc = {
    val fs = Proto.parse(bytes)
    fs.headOption match {
      case Some(f) if f.tag == 1 =>
        CFlat(Proto.firstVarint(Proto.parse(f.bytes), 1).getOrElse(64L).toInt)
      case Some(f) if f.tag == 2 =>
        CInlineBitpack(Proto.firstVarint(Proto.parse(f.bytes), 1).getOrElse(64L).toInt)
      case Some(f) if f.tag == 3 =>
        CVariable(Proto.firstVarint(Proto.parse(f.bytes), 1).getOrElse(32L).toInt)
      case Some(f) if f.tag == 4 =>
        val g = Proto.parse(f.bytes)
        val scheme = Proto.firstBytes(g, 1)
          .flatMap(c => Proto.firstString(Proto.parse(c), 1)).getOrElse("zstd")
        val inner = Proto.firstBytes(g, 2).map(parseCompressive).getOrElse(CFlat(64))
        CGeneral(scheme, inner)
      case _ => CFlat(64)
    }
  }

  // ---- decoding ----------------------------------------------------------
  /** Decode the first `rows` values of a foreign page into boxed values. */
  def decodeForeign(logicalType: String, enc: PageEnc, bufs: Seq[Array[Byte]],
                    rows: Int): Array[Any] = {
    val out = new Array[Any](rows)
    enc match {
      case ForeignArray(tree) => decodeTree(logicalType, tree, bufs, rows, out)
      case MiniBlockPage(valComp, defComp) =>
        decodeMiniBlock(logicalType, valComp, defComp, bufs, rows, out)
      case FullZipPage(zenc, hasDef, hasRep) =>
        require(!hasRep,
          "full-zip repetition levels on a non-list column: structural " +
          "pages decode through the list path (decodeFullZipRep)")
        decodeFullZip(logicalType, zenc, hasDef, bufs, rows, out)
      case AllNullPage => // out stays null
      case NativeShape =>
        throw new IllegalStateException("decodeForeign called on a native page")
    }
    out
  }

  private def decodeTree(lt: String, enc: AEnc, bufs: Seq[Array[Byte]],
                         rows: Int, out: Array[Any]): Unit = enc match {
    case AFlat(_, idx) =>
      // the logical type, not the declared bit width, drives the layout —
      // plain pages are exactly our positional single-buffer shape
      LanceColumnDecoder.decodePage(lt, Seq(bufs(idx)), rows, out, 0)
    case ANoNull(values) => decodeTree(lt, values, bufs, rows, out)
    case AAllNull => ()
    case ASomeNull(validity, values) =>
      decodeTree(lt, values, bufs, rows, out)
      val vb = validity match {
        case AFlat(_, idx) => bufs(idx)
        case ABitpacked(_, _, idx, _) => bufs(idx) // 1-bit bitmap either way
        case other => throw new UnsupportedOperationException(s"validity encoding $other")
      }
      var i = 0
      while (i < rows) {
        if (((vb(i >> 3) >> (i & 7)) & 1) == 0) out(i) = null
        i += 1
      }
    case ABinary(indices, bytesEnc, nullAdj) =>
      val isBin = lt.contains("binary")
      val offBits = indices match {
        case AFlat(b, _) => b
        case ANoNull(AFlat(b, _)) => b
        case _ => 64
      }
      val offBuf = bufs(leafBufIdx(indices, 0))
      val bytes = bufs(leafBufIdx(bytesEnc, 1))
      val bb = java.nio.ByteBuffer.wrap(offBuf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var prev = 0L
      var i = 0
      while (i < rows) {
        val raw = if (offBits == 32) bb.getInt(i * 4).toLong & 0xffffffffL else bb.getLong(i * 8)
        // null rows carry end + null_adjustment (public binary encoding)
        val isNull = nullAdj > 0 && raw >= nullAdj
        val end = if (isNull) raw - nullAdj else raw
        // consistency guard: under the adjustment interpretation the
        // effective ends must stay monotone and inside the bytes buffer.
        // A violation means the page does NOT use adjusted offsets — the
        // known case is pre-round-7 files from THIS writer, which stamped
        // null_adjustment=24 (copied from the golden file) while writing
        // PLAIN end-offsets + separate validity. Refuse loudly instead of
        // emitting nulls/garbage slices.
        if (end < prev || end > bytes.length)
          throw new UnsupportedOperationException(
            s"lance: binary page decode inconsistent at row $i (end $end, " +
            s"prev $prev, bytes ${bytes.length}, null_adjustment $nullAdj) — " +
            "either the page is corrupt, or it was written by a pre-2026-08 " +
            "version of this library that mis-stamped null_adjustment=24 with " +
            "plain offsets; rewrite the dataset with the current writer")
        out(i) =
          if (isNull) null
          else {
            val slice = java.util.Arrays.copyOfRange(bytes, prev.toInt, end.toInt)
            if (isBin) slice else UTF8String.fromBytes(slice)
          }
        prev = end
        i += 1
      }
    case AFsl(dim, items) =>
      val elemLt = if (lt.startsWith("fixed_size_list:")) LanceFormat.fslParts(lt)._1 else lt
      val elems = new Array[Any](rows * dim)
      decodeTree(elemLt, items, bufs, rows * dim, elems)
      var i = 0
      while (i < rows) {
        out(i) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          java.util.Arrays.copyOfRange(elems.asInstanceOf[Array[AnyRef]], i * dim, (i + 1) * dim))
        i += 1
      }
    case ADict(indices, items, numItems) =>
      val idx = new Array[Any](rows)
      decodeTree("int32", indices, bufs, rows, idx)
      val dict = new Array[Any](numItems)
      decodeTree(lt, items, bufs, numItems, dict)
      var i = 0
      while (i < rows) {
        val d = idx(i).asInstanceOf[Int]
        out(i) = if (d < 0 || d >= numItems) null else dict(d)
        i += 1
      }
    case ABitpacked(cbits, _, idx, signed) =>
      val longs = unpackBits(bufs(idx), cbits, rows, signed)
      narrowLongs(lt, longs, rows, out)
    case AConstant(value, _) =>
      val v = constantValue(lt, value)
      var i = 0
      while (i < rows) { out(i) = v; i += 1 }
    case AFsst(inner, table) =>
      val comp = new Array[Any](rows)
      decodeTree("binary", inner, bufs, rows, comp)
      val (syms, lens) = parseFsstTable(table)
      val isBin = lt.contains("binary")
      var i = 0
      while (i < rows) {
        comp(i) match {
          case null => // stays null
          case b: Array[Byte] =>
            val plain = fsstDecode(b, syms, lens)
            out(i) = if (isBin) plain else UTF8String.fromBytes(plain)
          case other => throw new IllegalStateException(s"fsst inner value $other")
        }
        i += 1
      }
    case AUnsupported(what) =>
      throw new UnsupportedOperationException(
        s"lance page encoding not supported by this reader: $what (type $lt)")
  }

  private def leafBufIdx(enc: AEnc, default: Int): Int = enc match {
    case AFlat(_, i) => i
    case ANoNull(v) => leafBufIdx(v, default)
    case ABitpacked(_, _, i, _) => i
    case _ => default
  }

  /** LSB-first bit unpack: value i = bits [i*w, (i+1)*w) of the stream. */
  private[lance] def unpackBits(buf: Array[Byte], w: Int, n: Int,
                                signed: Boolean): Array[Long] = {
    require(w > 0 && w <= 64, s"bitpack width $w")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var v = 0L
      var bit = 0
      var pos = i.toLong * w
      while (bit < w) {
        val b = buf((pos >> 3).toInt) & 0xff
        val avail = 8 - (pos & 7).toInt
        val take = math.min(avail, w - bit)
        v |= (((b >> (pos & 7).toInt) & ((1 << take) - 1)).toLong) << bit
        bit += take
        pos += take
      }
      if (signed && w < 64 && ((v >> (w - 1)) & 1L) == 1L) v |= -1L << w
      out(i) = v
      i += 1
    }
    out
  }

  /** Bitpack `n` longs at width `w`, LSB-first (golden-fixture writer and
    * our miniblock chunk encoder share this with [[unpackBits]]). */
  private[lance] def packBits(vals: Array[Long], w: Int): Array[Byte] = {
    val out = new Array[Byte]((vals.length.toLong * w + 7).toInt / 8)
    var i = 0
    while (i < vals.length) {
      val v = vals(i) & (if (w == 64) -1L else (1L << w) - 1)
      var bit = 0
      var pos = i.toLong * w
      while (bit < w) {
        val idx = (pos >> 3).toInt
        val off = (pos & 7).toInt
        val take = math.min(8 - off, w - bit)
        out(idx) = (out(idx) | (((v >>> bit) & ((1 << take) - 1)) << off)).toByte
        bit += take
        pos += take
      }
      i += 1
    }
    out
  }

  private def narrowLongs(lt: String, longs: Array[Long], rows: Int,
                          out: Array[Any]): Unit = {
    var i = 0
    lt match {
      case "int8" => while (i < rows) { out(i) = longs(i).toByte; i += 1 }
      case "uint8" => while (i < rows) { out(i) = (longs(i) & 0xff).toShort; i += 1 }
      case "int16" => while (i < rows) { out(i) = longs(i).toShort; i += 1 }
      case "uint16" => while (i < rows) { out(i) = (longs(i) & 0xffff).toInt; i += 1 }
      case "int32" | "date32:day" | "date32" => while (i < rows) { out(i) = longs(i).toInt; i += 1 }
      case "uint32" => while (i < rows) { out(i) = longs(i) & 0xffffffffL; i += 1 }
      case "int64" => while (i < rows) { out(i) = longs(i); i += 1 }
      case "uint64" => while (i < rows) {
        out(i) = Decimal(new java.math.BigDecimal(java.lang.Long.toUnsignedString(longs(i))))
        i += 1
      }
      case ts if ts.startsWith("timestamp") => while (i < rows) { out(i) = longs(i); i += 1 }
      case "date64" | "date64:ms" =>
        while (i < rows) { out(i) = java.lang.Math.floorDiv(longs(i), 86400000L).toInt; i += 1 }
      case other => throw new UnsupportedOperationException(s"bitpacked $other")
    }
  }

  /** Parse the serialized FSST symbol table: n = len/9 symbols laid out as
    * n 8-byte LE symbol slots then n length bytes (1..8). */
  private[lance] def parseFsstTable(table: Array[Byte]): (Array[Array[Byte]], Array[Int]) = {
    require(table.length % 9 == 0,
      s"fsst symbol table length ${table.length} not a multiple of 9")
    val n = table.length / 9
    require(n <= 255, s"fsst symbol table holds $n symbols (max 255)")
    val syms = new Array[Array[Byte]](n)
    val lens = new Array[Int](n)
    var i = 0
    while (i < n) {
      val len = table(n * 8 + i) & 0xff
      require(len >= 1 && len <= 8, s"fsst symbol $i length $len")
      syms(i) = java.util.Arrays.copyOfRange(table, i * 8, i * 8 + len)
      lens(i) = len
      i += 1
    }
    (syms, lens)
  }

  /** FSST decompress one value: code 255 = escape (emit next byte),
    * code c < table size = emit symbol c. */
  private[lance] def fsstDecode(in: Array[Byte], syms: Array[Array[Byte]],
                                lens: Array[Int]): Array[Byte] = {
    // worst case 8x expansion
    val out = new java.io.ByteArrayOutputStream(in.length * 4)
    var i = 0
    while (i < in.length) {
      val c = in(i) & 0xff
      if (c == 255) {
        require(i + 1 < in.length, "fsst escape at end of input")
        out.write(in(i + 1))
        i += 2
      } else {
        require(c < syms.length, s"fsst code $c outside symbol table (${syms.length})")
        out.write(syms(c), 0, lens(c))
        i += 1
      }
    }
    out.toByteArray
  }

  /** Fixture-side FSST encoder (greedy longest-match over the same table
    * layout) — exists so tests can produce well-formed compressed pages. */
  private[lance] def fsstEncode(plain: Array[Byte], syms: Array[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(plain.length)
    var i = 0
    while (i < plain.length) {
      var best = -1
      var bestLen = 0
      var c = 0
      while (c < syms.length) {
        val s = syms(c)
        if (s.length > bestLen && i + s.length <= plain.length) {
          var j = 0
          var ok = true
          while (ok && j < s.length) { ok = s(j) == plain(i + j); j += 1 }
          if (ok) { best = c; bestLen = s.length }
        }
        c += 1
      }
      if (best >= 0) { out.write(best); i += bestLen }
      else { out.write(255); out.write(plain(i)); i += 1 }
    }
    out.toByteArray
  }

  private def constantValue(lt: String, value: Array[Byte]): Any = lt match {
    case "string" | "utf8" | "large_string" => UTF8String.fromBytes(value)
    case "binary" | "large_binary" => value
    case "bool" => value.nonEmpty && value(0) != 0
    case other =>
      val one = new Array[Any](1)
      LanceColumnDecoder.decodePage(other, Seq(value), 1, one, 0)
      one(0)
  }

  // ---- miniblock ---------------------------------------------------------
  private def decodeMiniBlock(lt: String, valComp: CEnc, defComp: Option[CEnc],
                              bufs: Seq[Array[Byte]], rows: Int, out: Array[Any]): Unit = {
    require(bufs.length >= 2, s"miniblock page expects [chunk words, data], got ${bufs.length}")
    val words = bufs(0)
    val data = bufs(1)
    val nChunks = words.length / 2
    val wb = java.nio.ByteBuffer.wrap(words).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var dataOff = 0
    var row = 0
    var c = 0
    while (c < nChunks && row < rows) {
      val word = wb.getShort(c * 2) & 0xffff
      val chunkBytes = (word & 0xfff) * 8
      val logVals = word >>> 12
      val isLast = c == nChunks - 1
      val declared = 1 << logVals
      val chunkVals = if (isLast) rows - row else math.min(declared, rows - row)
      defComp match {
        case None =>
          decodeChunk(lt, valComp, data, dataOff, chunkBytes, chunkVals, out, row)
        case Some(dc) =>
          // [def section, 8-byte aligned][values for non-null items]
          val (levels, defRaw) = decodeLevels(dc, data, dataOff, chunkVals)
          val defBytes = align8(defRaw)
          var nonNull = 0
          var i = 0
          while (i < chunkVals) { if (levels(i) > 0) nonNull += 1; i += 1 }
          val tmp = new Array[Any](nonNull)
          if (nonNull > 0)
            decodeChunk(lt, valComp, data, dataOff + defBytes,
                        chunkBytes - defBytes, nonNull, tmp, 0)
          var v = 0
          i = 0
          while (i < chunkVals) {
            if (levels(i) > 0) { out(row + i) = tmp(v); v += 1 }
            i += 1
          }
      }
      row += chunkVals
      dataOff += chunkBytes
      c += 1
    }
    require(row >= rows, s"miniblock decoded $row of $rows rows")
  }

  private def align8(n: Int): Int = (n + 7) & ~7

  /** Decode `n` u16 definition levels at `off` with `comp`; returns
    * (levels, raw bytes consumed before alignment). */
  private def decodeLevels(comp: CEnc, data: Array[Byte], off: Int,
                           n: Int): (Array[Int], Int) = comp match {
    case CFlat(bits) =>
      require(bits == 16 || bits == 8, s"def-level width $bits unsupported")
      val w = bits / 8
      val levels = new Array[Int](n)
      var i = 0
      while (i < n) {
        levels(i) =
          if (w == 1) data(off + i) & 0xff
          else (data(off + i * 2) & 0xff) | ((data(off + i * 2 + 1) & 0xff) << 8)
        i += 1
      }
      (levels, n * w)
    case CInlineBitpack(_) =>
      val w = data(off) & 0xff
      val packedBytes = (n.toLong * w + 7).toInt / 8
      val packed = java.util.Arrays.copyOfRange(data, off + 1, off + 1 + packedBytes)
      val longs = unpackBits(packed, w, n, signed = false)
      (longs.map(_.toInt), 1 + packedBytes)
    case other => throw new UnsupportedOperationException(
      s"miniblock def-level compression $other")
  }

  // ---- full-zip ----------------------------------------------------------
  private def decodeFullZip(lt: String, zenc: CEnc, hasDef: Boolean,
                            bufs: Seq[Array[Byte]], rows: Int, out: Array[Any]): Unit = {
    require(bufs.nonEmpty, "full-zip page expects one data buffer")
    val data = bufs(0)
    val isBin = lt.contains("binary")
    var off = 0
    var i = 0
    zenc match {
      case CFlat(bits) =>
        val w = math.max(1, bits / 8)
        val one = new Array[Any](1)
        while (i < rows) {
          val isNull = hasDef && { val d = data(off) & 0xff; off += 1; d == 0 }
          if (!isNull) {
            LanceColumnDecoder.decodePage(
              lt, Seq(java.util.Arrays.copyOfRange(data, off, off + w)), 1, one, 0)
            out(i) = one(0)
            off += w
          }
          i += 1
        }
      case CVariable(bpo) =>
        require(bpo == 32, s"full-zip offset width $bpo unsupported")
        while (i < rows) {
          val isNull = hasDef && { val d = data(off) & 0xff; off += 1; d == 0 }
          if (!isNull) {
            val len = java.nio.ByteBuffer.wrap(data, off, 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
            off += 4
            val slice = java.util.Arrays.copyOfRange(data, off, off + len)
            out(i) = if (isBin) slice else UTF8String.fromBytes(slice)
            off += len
          }
          i += 1
        }
      case other => throw new UnsupportedOperationException(
        s"full-zip value encoding $other")
    }
  }

  /** Structural full-zip page with repetition levels (one nesting level —
    * list<scalar>/list<string>): decode the zipped item stream into one
    * ArrayData (or null) per top-level row. Item layout per the
    * [[FullZipPage]] scaladoc: [rep][def?][value]; def semantics with
    * `hasDef`: 0 = null row, 1 = empty list, >=2 = value present. ASSUMED
    * layout, fixture-pinned (no crate-written nested 2.1 file exists in
    * this container to byte-confirm against). */
  def decodeFullZipRep(childLt: String, fz: FullZipPage,
                       bufs: Seq[Array[Byte]], rows: Int): Array[Any] = {
    require(bufs.nonEmpty, "full-zip page expects one data buffer")
    val data = bufs(0)
    val isBin = childLt.contains("binary")
    val out = new Array[Any](rows)
    val cur = scala.collection.mutable.ArrayBuffer.empty[Any]
    var row = -1
    var curNull = false
    var off = 0
    val one = new Array[Any](1)
    def flush(): Unit = if (row >= 0 && row < rows) {
      out(row) =
        if (curNull) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(cur.toArray)
    }
    var done = false
    while (!done && off < data.length) {
      val rep = data(off) & 0xff; off += 1
      if (rep == 0) {
        flush()
        cur.clear(); curNull = false
        row += 1
        if (row >= rows) done = true // page decoded past the requested rows
      }
      if (!done) {
        val defv = if (fz.hasDef) { val d = data(off) & 0xff; off += 1; d } else 2
        if (defv == 0) curNull = true
        else if (defv >= 2) {
          fz.enc match {
            case CFlat(bits) =>
              val w = math.max(1, bits / 8)
              LanceColumnDecoder.decodePage(
                childLt, Seq(java.util.Arrays.copyOfRange(data, off, off + w)), 1, one, 0)
              cur += one(0)
              off += w
            case CVariable(bpo) =>
              require(bpo == 32, s"full-zip offset width $bpo unsupported")
              val len = java.nio.ByteBuffer.wrap(data, off, 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
              off += 4
              val slice = java.util.Arrays.copyOfRange(data, off, off + len)
              cur += (if (isBin) slice else UTF8String.fromBytes(slice))
              off += len
            case other => throw new UnsupportedOperationException(
              s"full-zip rep-level value encoding $other")
          }
        } // defv == 1: empty list — no value bytes
      }
    }
    if (!done) {
      flush()
      // fail closed: an assumed-layout misread would desynchronize the
      // stream — the fully-consumed buffer must have produced exactly the
      // declared row count, no silent null tails
      if (row != rows - 1 || off != data.length)
        throw new IllegalStateException(
          s"lance full-zip rep stream decoded ${row + 1}/$rows rows, " +
          s"consumed $off/${data.length} bytes — layout mismatch")
    }
    out
  }

  private def decodeChunk(lt: String, valComp: CEnc, data: Array[Byte], off: Int,
                          len: Int, n: Int, out: Array[Any], start: Int): Unit =
    valComp match {
      case CFlat(_) =>
        val slice = java.util.Arrays.copyOfRange(data, off, off + len)
        LanceColumnDecoder.decodePage(lt, Seq(slice), n, out, start)
      case CInlineBitpack(_) =>
        val w = data(off) & 0xff
        val packed = java.util.Arrays.copyOfRange(data, off + 1, off + len)
        val longs = unpackBits(packed, w, n, signed = false)
        val tmp = new Array[Any](n)
        narrowLongs(lt, longs, n, tmp)
        System.arraycopy(tmp, 0, out, start, n)
      case CVariable(bpo) =>
        require(bpo == 32, s"miniblock variable offsets: $bpo bits unsupported")
        val bb = java.nio.ByteBuffer.wrap(data, off, len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val bytesStart = off + n * 4
        val isBin = lt.contains("binary")
        var prev = 0
        var i = 0
        while (i < n) {
          val end = bb.getInt(off + i * 4)
          val slice = java.util.Arrays.copyOfRange(data, bytesStart + prev, bytesStart + end)
          out(start + i) = if (isBin) slice else UTF8String.fromBytes(slice)
          prev = end
          i += 1
        }
      case CGeneral(scheme, inner) =>
        val clen = java.nio.ByteBuffer.wrap(data, off, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        val comp = java.util.Arrays.copyOfRange(data, off + 4, off + 4 + clen)
        val plain = decompress(scheme, comp)
        decodeChunk(lt, inner, plain, 0, plain.length, n, out, start)
    }

  private[lance] def decompress(scheme: String, bytes: Array[Byte]): Array[Byte] =
    scheme match {
      case "zstd" =>
        val size = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
        require(size > 0 && size < Int.MaxValue, s"zstd frame size $size")
        com.github.luben.zstd.Zstd.decompress(bytes, size.toInt)
      case "lz4" =>
        val in = new net.jpountz.lz4.LZ4FrameInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try in.readAllBytes() finally in.close()
      case "none" => bytes
      case other => throw new UnsupportedOperationException(
        s"lance general compression scheme '$other' (zstd/lz4/none supported)")
    }

  private[lance] def compress(scheme: String, bytes: Array[Byte]): Array[Byte] =
    scheme match {
      case "zstd" => com.github.luben.zstd.Zstd.compress(bytes)
      case "lz4" =>
        val bos = new java.io.ByteArrayOutputStream()
        val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        out.write(bytes); out.close()
        bos.toByteArray
      case "none" => bytes
      case other => throw new UnsupportedOperationException(s"compress: $other")
    }
}
