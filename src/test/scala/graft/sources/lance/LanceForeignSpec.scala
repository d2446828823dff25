package graft.sources.lance

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Foreign-layout interop: files NOT produced by our writer — a
  * hand-crafted fragment carrying the lance-crate type spellings
  * (`fixed_size_list:<elem>:<dim>` vector columns, `decimal:128:<p>:<s>`,
  * `date64:ms`) per the public Lance v2 layout (plain value encodings:
  * one contiguous buffer per fixed-width page) — plus dictionary-encoded
  * string pages written by our own writer.
  */
class LanceForeignSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpDs(): String = {
    val f = java.nio.file.Files.createTempDirectory("lance_foreign").toFile
    f.delete()
    f.getAbsolutePath + "/ds.lance"
  }

  private def dec128LE(unscaled: Long): Array[Byte] = {
    val be = java.math.BigInteger.valueOf(unscaled).toByteArray // minimal BE
    val out = new Array[Byte](16)
    val sign: Byte = if (unscaled < 0) -1 else 0
    java.util.Arrays.fill(out, sign)
    // copy BE bytes into the tail, then reverse to LE
    System.arraycopy(be, 0, out, 16 - be.length, be.length)
    val le = new Array[Byte](16)
    var i = 0
    while (i < 16) { le(i) = out(15 - i); i += 1 }
    le
  }

  test("hand-crafted foreign file: fixed_size_list / decimal128 / date64") {
    val ds = tmpDs()
    new java.io.File(ds, "data").mkdirs()
    new java.io.File(ds, "_versions").mkdirs()

    val out = new java.io.ByteArrayOutputStream()
    def writeBuf(b: Array[Byte]): (Long, Long) = {
      val off = out.size.toLong; out.write(b); (off, b.length.toLong)
    }
    def floats(vs: Float*): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat); bb.array()
    }
    def longs(vs: Long*): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putLong); bb.array()
    }

    // 5 rows in 2 pages (3 + 2) — pages aligned across the 3 columns
    val day = 86400000L
    // col 0: vec fixed_size_list:float:4
    val vecP1 = writeBuf(floats((0 until 12).map(i => i * 0.5f): _*))
    val vecP2 = writeBuf(floats((12 until 20).map(i => i * 0.5f): _*))
    // col 1: dec decimal:128:10:2 — 123.45, -1.23, 0.00 | 99999999.99, 0.01
    val decP1 = writeBuf(dec128LE(12345) ++ dec128LE(-123) ++ dec128LE(0))
    val decP2 = writeBuf(dec128LE(9999999999L) ++ dec128LE(1))
    // col 2: d64 date64:ms — epoch days 0, 1, 100 | 20000, -1
    val d64P1 = writeBuf(longs(0L, day, 100 * day))
    val d64P2 = writeBuf(longs(20000 * day, -day))

    def colMeta(pages: Seq[((Long, Long), Long)]): Array[Byte] = {
      val w = new Proto.Writer
      pages.foreach { case ((off, len), rows) =>
        val pw = new Proto.Writer
        pw.packed(1, Seq(off)).packed(2, Seq(len)).varint(3, rows)
        w.message(2, pw)
      }
      w.result()
    }
    val metas = Seq(
      colMeta(Seq((vecP1, 3L), (vecP2, 2L))),
      colMeta(Seq((decP1, 3L), (decP2, 2L))),
      colMeta(Seq((d64P1, 3L), (d64P2, 2L))))
    val metaOffs = metas.map(writeBuf)
    val cmoStart = out.size.toLong
    val cmo = ByteBuffer.allocate(16 * 3).order(ByteOrder.LITTLE_ENDIAN)
    metaOffs.foreach { case (o, l) => cmo.putLong(o); cmo.putLong(l) }
    out.write(cmo.array())
    val footer = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    footer.putLong(0L).putLong(cmoStart).putLong(0L)
      .putInt(0).putInt(3).putShort(2).putShort(0)
      .put("LANC".getBytes("ASCII"))
    out.write(footer.array())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ds, "data", "frag0.lance"), out.toByteArray)

    // manifest: fields + one fragment + version
    def field(name: String, id: Int, lt: String): Proto.Writer = {
      val w = new Proto.Writer
      w.string(2, name)
      if (id != 0) w.varint(3, id.toLong)
      w.string(5, lt)
      w
    }
    val mw = new Proto.Writer
    mw.message(1, field("vec", 0, "fixed_size_list:float:4"))
    mw.message(1, field("dec", 1, "decimal:128:10:2"))
    mw.message(1, field("d64", 2, "date64:ms"))
    val fw = new Proto.Writer
    val dw = new Proto.Writer
    dw.string(1, "frag0.lance").packed(2, Seq(0L, 1L, 2L)).packed(3, Seq(0L, 1L, 2L))
    fw.message(2, dw).varint(4, 5L)
    mw.message(2, fw)
    mw.varint(3, 1L)
    val pb = mw.result()
    val mout = new java.io.ByteArrayOutputStream()
    mout.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(pb.length).array())
    mout.write(pb)
    // real manifests end with the LANC footer (readManifest validates it
    // on every read since round 7) — fixtures must conform to the format
    mout.write(new Array[Byte](8))
    mout.write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(1.toShort).array())
    mout.write("LANC".getBytes("ASCII"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ds, "_versions", "1.manifest"), mout.toByteArray)

    // scan through the full connector
    val back = spark.read.format("lance").load(ds)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("vec", "array<float>"), ("dec", "decimal(10,2)"), ("d64", "date")))
    val rows = back.orderBy("d64").collect()
    assert(rows.length == 5)
    val byDec = back.collect().map(r => (r.getDecimal(1).toString, r)).toMap
    assert(byDec.keySet == Set("123.45", "-1.23", "0.00", "99999999.99", "0.01"))
    val first = byDec("123.45")
    assert(first.getSeq[Float](0) == Seq(0.0f, 0.5f, 1.0f, 1.5f))
    assert(first.getDate(2).toString == "1970-01-01")
    assert(byDec("0.01").getDate(2).toString == "1969-12-31") // negative ms
    assert(byDec("99999999.99").getSeq[Float](0) == Seq(6.0f, 6.5f, 7.0f, 7.5f))
    // limit pushdown still pages correctly over the foreign file
    assert(back.limit(4).count() == 4)
  }

  // ---- encoding-proto builders (mirror LanceEncodings' documented tags) --
  private def anyWrap(url: String, value: Array[Byte]): Array[Byte] = {
    val any = new Proto.Writer
    any.string(1, url).bytes(2, value)
    val direct = new Proto.Writer
    direct.message(1, any)
    val enc = new Proto.Writer
    enc.message(2, direct)
    enc.result()
  }
  private def flatEnc(bits: Int, bufIdx: Int): Array[Byte] = {
    val buf = new Proto.Writer; if (bufIdx != 0) buf.varint(1, bufIdx.toLong)
    val flat = new Proto.Writer; flat.varint(1, bits.toLong).bytes(2, buf.result())
    val ae = new Proto.Writer; ae.message(1, flat)
    ae.result()
  }
  private def bitpackedEnc(tag: Int, cbits: Int, ubits: Int, bufIdx: Int,
                           signed: Boolean): Array[Byte] = {
    val buf = new Proto.Writer; if (bufIdx != 0) buf.varint(1, bufIdx.toLong)
    val bp = new Proto.Writer
    bp.varint(1, cbits.toLong).varint(2, ubits.toLong).bytes(3, buf.result())
    if (signed) bp.varint(4, 1L)
    val ae = new Proto.Writer; ae.bytes(tag, bp.result())
    ae.result()
  }
  private def dictEnc(indices: Array[Byte], items: Array[Byte], n: Int): Array[Byte] = {
    val d = new Proto.Writer
    d.bytes(1, indices).bytes(2, items).varint(3, n.toLong)
    val ae = new Proto.Writer; ae.message(4, d)
    ae.result()
  }
  private def binaryEnc(offsets: Array[Byte], bytes: Array[Byte], nullAdj: Long): Array[Byte] = {
    val b = new Proto.Writer
    b.bytes(1, offsets).bytes(2, bytes).varint(3, nullAdj)
    val ae = new Proto.Writer; ae.message(6, b)
    ae.result()
  }
  private def someNullEnc(validity: Array[Byte], values: Array[Byte]): Array[Byte] = {
    val sn = new Proto.Writer; sn.bytes(1, validity).bytes(2, values)
    val nu = new Proto.Writer; nu.bytes(2, sn.result())
    val ae = new Proto.Writer; ae.message(2, nu)
    ae.result()
  }
  private def constantEnc(value: Array[Byte], n: Long): Array[Byte] = {
    val c = new Proto.Writer; c.bytes(1, value).varint(2, n)
    val ae = new Proto.Writer; ae.bytes(11, c.result())
    ae.result()
  }
  private def miniBlockLayout(compTag: Int, compField1: Int): Array[Byte] = {
    val comp = new Proto.Writer; comp.bytes(compTag,
      { val w = new Proto.Writer; w.varint(1, compField1.toLong); w.result() })
    val mb = new Proto.Writer; mb.bytes(3, comp.result())
    val pl = new Proto.Writer; pl.message(1, mb)
    pl.result()
  }

  /** Write a single-fragment dataset whose pages carry explicit encoding
    * protos. cols: (name, logicalType, pages: Seq[(buffers, rows, encodingAny)]). */
  private def writeForeign(ds: String,
                           cols: Seq[(String, String, Seq[(Seq[Array[Byte]], Long, Array[Byte])])]): Unit = {
    new java.io.File(ds, "data").mkdirs()
    new java.io.File(ds, "_versions").mkdirs()
    val out = new java.io.ByteArrayOutputStream()
    def writeBuf(b: Array[Byte]): (Long, Long) = {
      val off = out.size.toLong; out.write(b); (off, b.length.toLong)
    }
    val metas = cols.map { case (_, _, pages) =>
      val w = new Proto.Writer
      pages.foreach { case (bufs, rows, encAny) =>
        val placed = bufs.map(writeBuf)
        val pw = new Proto.Writer
        pw.packed(1, placed.map(_._1)).packed(2, placed.map(_._2)).varint(3, rows)
        if (encAny.nonEmpty) pw.bytes(4, encAny)
        w.message(2, pw)
      }
      w.result()
    }
    val metaOffs = metas.map(writeBuf)
    val cmoStart = out.size.toLong
    val cmo = ByteBuffer.allocate(16 * cols.length).order(ByteOrder.LITTLE_ENDIAN)
    metaOffs.foreach { case (o, l) => cmo.putLong(o); cmo.putLong(l) }
    out.write(cmo.array())
    val footer = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    footer.putLong(0L).putLong(cmoStart).putLong(0L)
      .putInt(0).putInt(cols.length).putShort(2).putShort(0)
      .put("LANC".getBytes("ASCII"))
    out.write(footer.array())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ds, "data", "frag0.lance"), out.toByteArray)
    val rows = cols.head._3.map(_._2).sum
    val mw = new Proto.Writer
    cols.zipWithIndex.foreach { case ((name, lt, _), i) =>
      val f = new Proto.Writer
      f.string(2, name); if (i != 0) f.varint(3, i.toLong); f.string(5, lt)
      mw.message(1, f)
    }
    val fw = new Proto.Writer
    val dw = new Proto.Writer
    dw.string(1, "frag0.lance")
      .packed(2, cols.indices.map(_.toLong))
      .packed(3, cols.indices.map(_.toLong))
    fw.message(2, dw).varint(4, rows)
    mw.message(2, fw)
    mw.varint(3, 1L)
    val pb = mw.result()
    val mout = new java.io.ByteArrayOutputStream()
    mout.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(pb.length).array())
    mout.write(pb)
    // real manifests end with the LANC footer (readManifest validates it
    // on every read since round 7) — fixtures must conform to the format
    mout.write(new Array[Byte](8))
    mout.write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(1.toShort).array())
    mout.write("LANC".getBytes("ASCII"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ds, "_versions", "1.manifest"), mout.toByteArray)
  }

  private def ints(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putInt); bb.array()
  }
  private def dbls(vs: Double*): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putDouble); bb.array()
  }
  private def longsLE(vs: Long*): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putLong); bb.array()
  }

  test("foreign bitpacked / dictionary / some_nulls / constant pages scan green") {
    val ds = tmpDs()
    val n = 10
    // bp: uint-style bitpacked int32, width 5, values 0,3,6,...,27
    val bpVals = (0 until n).map(i => (i * 3).toLong).toArray
    val bp = (Seq(LanceEncodings.packBits(bpVals, 5)), n.toLong,
              anyWrap("/lance.encodings.ArrayEncoding", bitpackedEnc(10, 5, 32, 0, signed = false)))
    // bps: signed bitpacked int64, width 7, values -30..24 step 6
    val bpsVals = (0 until n).map(i => (i * 6 - 30).toLong).toArray
    val bps = (Seq(LanceEncodings.packBits(bpsVals, 7)), n.toLong,
               anyWrap("/lance.encodings.ArrayEncoding", bitpackedEnc(8, 7, 64, 0, signed = true)))
    // cat: proto-level dictionary — indices int32 flat (buffer 0), items
    // binary {offsets i64 flat (buffer 1), bytes flat (buffer 2)}
    val dictItems = Seq("alpha", "beta", "gamma")
    val idx = (0 until n).map(_ % 3)
    val itemBytes = dictItems.mkString.getBytes("UTF-8")
    val itemOffs = dictItems.scanLeft(0L)(_ + _.length).tail
    val cat = (Seq(ints(idx: _*), longsLE(itemOffs: _*), itemBytes), n.toLong,
               anyWrap("/lance.encodings.ArrayEncoding",
                 dictEnc(flatEnc(32, 0),
                         binaryEnc(flatEnc(64, 1), flatEnc(8, 2), 0L), dictItems.length)))
    // nn: double with nulls at rows 2 and 7 — some_nulls{validity bitmap
    // (buffer 0), values flat64 (buffer 1)}
    val validity = Array[Byte](((0xff & ~((1 << 2) | (1 << 7))).toByte), 0x03)
    val nnVals = (0 until n).map(i => i * 1.5)
    val nn = (Seq(validity, dbls(nnVals: _*)), n.toLong,
              anyWrap("/lance.encodings.ArrayEncoding",
                someNullEnc(flatEnc(1, 0), flatEnc(64, 1))))
    // konst: constant string page, zero buffers
    val konst = (Seq.empty[Array[Byte]], n.toLong,
                 anyWrap("/lance.encodings.ArrayEncoding",
                   constantEnc("fixed".getBytes("UTF-8"), n.toLong)))
    writeForeign(ds, Seq(
      ("bp", "int32", Seq(bp)),
      ("bps", "int64", Seq(bps)),
      ("cat", "string", Seq(cat)),
      ("nn", "double", Seq(nn)),
      ("konst", "string", Seq(konst))))

    val back = spark.read.format("lance").load(ds)
    val rows = back.orderBy("bp").collect()
    assert(rows.length == n)
    assert(rows.map(_.getInt(0)).toSeq == (0 until n).map(_ * 3))
    assert(rows.map(_.getLong(1)).toSeq == (0 until n).map(i => (i * 6 - 30).toLong))
    assert(rows.map(_.getString(2)).toSeq ==
      (0 until n).map(i => dictItems(i % 3)))
    assert(rows.map(r => if (r.isNullAt(3)) null else r.getDouble(3)).toSeq ==
      (0 until n).map(i => if (i == 2 || i == 7) null else i * 1.5))
    assert(rows.map(_.getString(4)).distinct.toSeq == Seq("fixed"))
    // filters and projection still work over foreign pages
    assert(back.filter("bps < 0").count() == 5)
    assert(back.select("cat").distinct().count() == 3)
  }

  test("foreign plain-binary variants: i32 offsets and null_adjustment pages") {
    // The round-6 advice hole: classify() used to collapse ANY flat-leaf
    // binary tree to the positional decode, which hardcodes i64 offsets
    // and ignores null_adjustment — so these two public-encoding variants
    // silently decoded garbage. They must route through decodeTree.
    val ds = tmpDs()
    val n = 5
    val words = Seq("aa", "bbb", "c", "dddd", "ee")
    // s32: i32 end-offsets, no nulls
    val ends32 = words.scanLeft(0)(_ + _.length).tail
    val s32 = (Seq(ints(ends32: _*), words.mkString.getBytes("UTF-8")), n.toLong,
               anyWrap("/lance.encodings.ArrayEncoding",
                 binaryEnc(flatEnc(32, 0), flatEnc(8, 1), 0L)))
    // sadj: i64 offsets, nulls at rows 1 and 3 via end + null_adjustment
    val adj = 1000L
    val kept = Seq(Some("xy"), None, Some("zzz"), None, Some("w"))
    var acc = 0L
    val endsAdj = kept.map { o =>
      acc += o.map(_.length).getOrElse(0).toLong
      if (o.isEmpty) acc + adj else acc
    }
    val sadj = (Seq(longsLE(endsAdj: _*),
                    kept.flatten.mkString.getBytes("UTF-8")), n.toLong,
                anyWrap("/lance.encodings.ArrayEncoding",
                  binaryEnc(flatEnc(64, 0), flatEnc(8, 1), adj)))
    writeForeign(ds, Seq(
      ("s32", "string", Seq(s32)),
      ("sadj", "binary", Seq(sadj)),
      ("k", "int32", Seq((Seq(ints(0 until n: _*)), n.toLong,
        anyWrap("/lance.encodings.ArrayEncoding", flatEnc(32, 0)))))))
    val rows = spark.read.format("lance").load(ds).orderBy("k").collect()
    assert(rows.map(_.getString(0)).toSeq == words)
    assert(rows.map(r => if (r.isNullAt(1)) null
                         else new String(r.getAs[Array[Byte]](1), "UTF-8")).toSeq ==
      kept.map(_.orNull))
    // blobRefs over an adjusted-offset page must refuse loudly (the
    // page-level guard — sadj IS binary-typed, so the schema check
    // passes), not emit silently wrong ranges from the hardcoded layout
    val ex = intercept[Exception] {
      spark.read.format("lance").option("blobRefs", "sadj").load(ds)
        .selectExpr("sadj.len").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.contains("foreign-encoded") ||
                               m.contains("blobRefs requires plain")),
      s"wrong error: ${msgs(ex).mkString(" | ")}")
  }

  test("lance 2.1 miniblock pages: inline-bitpacked ints and variable strings") {
    val ds = tmpDs()
    val n = 10
    // mb: int32 miniblock, 2 chunks: 8 values bitpacked w=4, then 2 values
    // w=7. Chunk = [width byte][packed bytes], zero-padded to 8 bytes.
    def chunk(vals: Array[Long]): Array[Byte] = {
      val w = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(vals.max))
      val packed = LanceEncodings.packBits(vals, w)
      val raw = Array(w.toByte) ++ packed
      raw ++ new Array[Byte]((8 - raw.length % 8) % 8)
    }
    val c0 = chunk((0 until 8).map(i => (i * 2).toLong).toArray)   // w=4
    val c1 = chunk(Array(100L, 101L))                              // w=7
    def word(bytes: Int, logVals: Int): Short = ((bytes / 8) | (logVals << 12)).toShort
    val words = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(word(c0.length, 3)).putShort(word(c1.length, 1)).array()
    val mb = (Seq(words, c0 ++ c1), n.toLong,
              anyWrap("/lance.encodings.PageLayout", miniBlockLayout(2, 32)))
    // mbs: string miniblock, single chunk: u32 end offsets then bytes
    val strs = (0 until n).map(i => s"doc_$i")
    val sBytes = strs.mkString.getBytes("UTF-8")
    val sOffs = strs.scanLeft(0)(_ + _.length).tail
    val sChunkRaw = ints(sOffs: _*) ++ sBytes
    val sChunk = sChunkRaw ++ new Array[Byte]((8 - sChunkRaw.length % 8) % 8)
    val sWords = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(word(sChunk.length, 4)).array()
    val mbs = (Seq(sWords, sChunk), n.toLong,
               anyWrap("/lance.encodings.PageLayout", miniBlockLayout(3, 32)))
    writeForeign(ds, Seq(("mb", "int32", Seq(mb)), ("mbs", "string", Seq(mbs))))

    val back = spark.read.format("lance").load(ds)
    val rows = back.orderBy("mb").collect()
    assert(rows.map(_.getInt(0)).toSeq ==
      ((0 until 8).map(_ * 2) ++ Seq(100, 101)))
    assert(back.orderBy("mb").collect().map(_.getString(1)).toSet ==
      strs.toSet)
    assert(back.filter("mb >= 100").count() == 2)
  }

  test("miniblock pages with definition levels decode nulls") {
    val ds = tmpDs()
    val n = 12
    // int64 miniblock, one chunk: def section (u16 flat levels, 8-byte
    // aligned) then values for the 9 non-null items
    val nulls = Set(2, 5, 9)
    val levels = (0 until n).map(i => if (nulls(i)) 0 else 1)
    val defRaw = ByteBuffer.allocate(n * 2).order(ByteOrder.LITTLE_ENDIAN)
    levels.foreach(l => defRaw.putShort(l.toShort))
    val defSection = defRaw.array() ++ new Array[Byte]((8 - (n * 2) % 8) % 8)
    val vals = (0 until n).filterNot(nulls).map(i => i * 10L)
    val chunkRaw = defSection ++ longsLE(vals: _*)
    val chunk = chunkRaw ++ new Array[Byte]((8 - chunkRaw.length % 8) % 8)
    def word(bytes: Int, logVals: Int): Short = ((bytes / 8) | (logVals << 12)).toShort
    val words = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(word(chunk.length, 4)).array()
    // layout: def_compression (tag 2) = flat 16; value_compression = flat 64
    val defComp = { val f = new Proto.Writer; f.varint(1, 16L)
      val c = new Proto.Writer; c.bytes(1, f.result()); c.result() }
    val valComp = { val f = new Proto.Writer; f.varint(1, 64L)
      val c = new Proto.Writer; c.bytes(1, f.result()); c.result() }
    val mb = new Proto.Writer; mb.bytes(2, defComp).bytes(3, valComp)
    val pl = new Proto.Writer; pl.message(1, mb)
    val enc = anyWrap("/lance.encodings.PageLayout", pl.result())
    writeForeign(ds, Seq(("v", "int64", Seq((Seq(words, chunk), n.toLong, enc)))))
    val back = spark.read.format("lance").load(ds)
    val got = back.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.count(_ == null) == nulls.size)
    assert(got.filter(_ != null).map(_.asInstanceOf[Long]).sorted.toSeq ==
      (0 until n).filterNot(nulls).map(_ * 10L))
    assert(back.filter("v IS NULL").count() == nulls.size)
  }

  test("full-zip pages decode fixed-width and variable-width items") {
    val ds = tmpDs()
    val n = 10
    // fixed-width int32 with def markers: [def byte][4 value bytes]
    val fzNulls = Set(1, 8)
    val fixed = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      if (fzNulls(i)) fixed.write(0)
      else {
        fixed.write(1)
        fixed.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(i * 7).array())
      }
    }
    def fullZipLayout(detailTag: Int, detailVal: Int, bitsDef: Int): Array[Byte] = {
      val fz = new Proto.Writer
      if (bitsDef > 0) fz.varint(2, bitsDef.toLong)
      fz.varint(detailTag, detailVal.toLong)
      val pl = new Proto.Writer; pl.message(2, fz)
      anyWrap("/lance.encodings.PageLayout", pl.result())
    }
    // variable-width strings, no nulls: [u32 length][bytes]
    val strs = (0 until n).map(i => s"item_${i}_" + ("y" * (i % 5)))
    val varBuf = new java.io.ByteArrayOutputStream()
    strs.foreach { s =>
      val b = s.getBytes("UTF-8")
      varBuf.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(b.length).array())
      varBuf.write(b)
    }
    writeForeign(ds, Seq(
      ("num", "int32", Seq((Seq(fixed.toByteArray), n.toLong, fullZipLayout(3, 32, 8)))),
      ("txt", "string", Seq((Seq(varBuf.toByteArray), n.toLong, fullZipLayout(4, 32, 0))))))
    val back = spark.read.format("lance").load(ds)
    val rows = back.orderBy("txt").collect()
    assert(rows.length == n)
    assert(back.filter("num IS NULL").count() == fzNulls.size)
    assert(back.collect().map(_.getString(1)).toSet == strs.toSet)
    assert(back.filter("num = 14").count() == 1) // i=2
  }

  /** Like [[writeForeign]] but with an explicit field tree (id, parentId)
    * and DataFile fieldIds — for structural (2.1 rep-level) fixtures where
    * a list child field owns no physical column. */
  private def writeForeignFields(ds: String,
      cols: Seq[Seq[(Seq[Array[Byte]], Long, Array[Byte])]],
      fields: Seq[(String, Int, Int, String)],
      fileFieldIds: Seq[Int]): Unit = {
    new java.io.File(ds, "data").mkdirs()
    new java.io.File(ds, "_versions").mkdirs()
    val out = new java.io.ByteArrayOutputStream()
    def writeBuf(b: Array[Byte]): (Long, Long) = {
      val off = out.size.toLong; out.write(b); (off, b.length.toLong)
    }
    val metas = cols.map { pages =>
      val w = new Proto.Writer
      pages.foreach { case (bufs, rows, encAny) =>
        val placed = bufs.map(writeBuf)
        val pw = new Proto.Writer
        pw.packed(1, placed.map(_._1)).packed(2, placed.map(_._2)).varint(3, rows)
        if (encAny.nonEmpty) pw.bytes(4, encAny)
        w.message(2, pw)
      }
      w.result()
    }
    val metaOffs = metas.map(writeBuf)
    val cmoStart = out.size.toLong
    val cmo = ByteBuffer.allocate(16 * cols.length).order(ByteOrder.LITTLE_ENDIAN)
    metaOffs.foreach { case (o, l) => cmo.putLong(o); cmo.putLong(l) }
    out.write(cmo.array())
    val footer = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    footer.putLong(0L).putLong(cmoStart).putLong(0L)
      .putInt(0).putInt(cols.length).putShort(2).putShort(0)
      .put("LANC".getBytes("ASCII"))
    out.write(footer.array())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ds, "data", "frag0.lance"), out.toByteArray)
    val rows = cols.head.map(_._2).sum
    val mw = new Proto.Writer
    fields.foreach { case (name, id, parentId, lt) =>
      val f = new Proto.Writer
      f.string(2, name)
      if (id != 0) f.varint(3, id.toLong)
      f.varint(4, if (parentId == -1) -1L else parentId.toLong)
      f.string(5, lt)
      mw.message(1, f)
    }
    val fw = new Proto.Writer
    val dw = new Proto.Writer
    dw.string(1, "frag0.lance")
      .packed(2, fileFieldIds.map(_.toLong))
      .packed(3, cols.indices.map(_.toLong))
    fw.message(2, dw).varint(4, rows)
    mw.message(2, fw)
    mw.varint(3, 1L)
    val pb = mw.result()
    val mout = new java.io.ByteArrayOutputStream()
    mout.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(pb.length).array())
    mout.write(pb)
    // real manifests end with the LANC footer (readManifest validates it
    // on every read since round 7) — fixtures must conform to the format
    mout.write(new Array[Byte](8))
    mout.write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(1.toShort).array())
    mout.write("LANC".getBytes("ASCII"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ds, "_versions", "1.manifest"), mout.toByteArray)
  }

  test("full-zip pages with repetition levels decode a zipped list column") {
    val ds = tmpDs()
    val lists: Seq[Option[Seq[Int]]] = Seq(
      Some(Seq(1, 2, 3)), Some(Seq(4)), None, Some(Seq.empty),
      Some(Seq(5, 6)), Some(Seq(7)))
    val n = lists.length
    // structural zip stream: [rep][def][value?] per item; null row and
    // empty list are single items with def 0 / 1 and no value bytes
    val zip = new java.io.ByteArrayOutputStream()
    lists.foreach {
      case None => zip.write(0); zip.write(0)
      case Some(Nil) => zip.write(0); zip.write(1)
      case Some(vs) => vs.zipWithIndex.foreach { case (v, i) =>
        zip.write(if (i == 0) 0 else 1); zip.write(2)
        zip.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(v).array())
      }
    }
    val fz = new Proto.Writer
    fz.varint(1, 8L).varint(2, 8L).varint(3, 32L) // bits_rep, bits_def, bits_per_value
    val pl = new Proto.Writer; pl.message(2, fz)
    val layout = anyWrap("/lance.encodings.PageLayout", pl.result())
    writeForeignFields(ds,
      cols = Seq(
        Seq((Seq(longsLE((0L until n.toLong): _*)), n.toLong, Array.emptyByteArray)),
        Seq((Seq(zip.toByteArray), n.toLong, layout))),
      fields = Seq(("id", 0, -1, "int64"), ("vals", 1, -1, "list"),
                   ("item", 2, 1, "int32")),
      fileFieldIds = Seq(0, 1))
    val back = spark.read.format("lance").load(ds).orderBy("id").collect()
    assert(back.length == n)
    val got = back.map(r => if (r.isNullAt(1)) None else Some(r.getSeq[Int](1)))
    assert(got.toSeq == lists.map(_.map(_.toSeq)))
  }

  test("Arrow-spelled map (entries struct) decodes to MapType") {
    val ds = tmpDs()
    // maps: {1->10, 2->20}, {}, {3->30} — field tree in the crate's Arrow
    // form: map -> entries struct -> (key, value); physical columns are
    // the same [offsets, keys, values] as our two-child spelling
    val ends = longsLE(2L, 2L, 3L)
    val keys = ints(1, 2, 3)
    val values = longsLE(10L, 20L, 30L)
    writeForeignFields(ds,
      cols = Seq(
        Seq((Seq(longsLE(0L, 1L, 2L)), 3L, Array.emptyByteArray)),
        Seq((Seq(ends), 3L, Array.emptyByteArray)),
        Seq((Seq(keys), 3L, Array.emptyByteArray)),
        Seq((Seq(values), 3L, Array.emptyByteArray))),
      fields = Seq(("id", 0, -1, "int64"), ("m", 1, -1, "map"),
                   ("entries", 2, 1, "struct"),
                   ("key", 3, 2, "int32"), ("value", 4, 2, "int64")),
      fileFieldIds = Seq(0, 1, 3, 4))
    val back = spark.read.format("lance").load(ds)
    assert(back.schema("m").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType, valueContainsNull = true))
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getMap[Int, Long](1).toMap).toSeq ==
      Seq(Map(1 -> 10L, 2 -> 20L), Map.empty[Int, Long], Map(3 -> 30L)))
  }

  test("fsst-compressed string pages decode through the connector") {
    val ds = tmpDs()
    val n = 12
    // symbol table: "document", "chunk", "_v" + escapes for digits
    val symStrs = Seq("document", "chunk", "_v")
    val table = new Array[Byte](symStrs.length * 9)
    symStrs.zipWithIndex.foreach { case (s, i) =>
      System.arraycopy(s.getBytes("UTF-8"), 0, table, i * 8, math.min(8, s.length))
      table(symStrs.length * 8 + i) = s.length.toByte
    }
    val (syms, lens) = LanceEncodings.parseFsstTable(table)
    val strs = (0 until n).map(i => s"document_${i}_vchunk_v$i")
    // round-trip sanity of the test encoder itself
    assert(strs.forall { s =>
      new String(LanceEncodings.fsstDecode(
        LanceEncodings.fsstEncode(s.getBytes("UTF-8"), syms), syms, lens), "UTF-8") == s
    })
    val comp = strs.map(s => LanceEncodings.fsstEncode(s.getBytes("UTF-8"), syms))
    val bytes = comp.reduce(_ ++ _)
    val offs = comp.scanLeft(0L)(_ + _.length).tail
    def fsstEnc(binary: Array[Byte], tbl: Array[Byte]): Array[Byte] = {
      val f = new Proto.Writer
      f.bytes(1, binary).bytes(2, tbl)
      val ae = new Proto.Writer; ae.bytes(7, f.result())
      ae.result()
    }
    val col = (Seq(longsLE(offs: _*), bytes), n.toLong,
               anyWrap("/lance.encodings.ArrayEncoding",
                 fsstEnc(binaryEnc(flatEnc(64, 0), flatEnc(8, 1), 0L), table)))
    writeForeign(ds, Seq(("doc", "string", Seq(col))))
    val back = spark.read.format("lance").load(ds)
    assert(back.collect().map(_.getString(0)).toSet == strs.toSet)
    assert(back.filter("doc LIKE 'document_3%'").count() == 1)
  }

  test("general-compressed (zstd/lz4) miniblock chunks decode through the connector") {
    val ds = tmpDs()
    val n = 40
    def generalLayout(scheme: String, innerTag: Int, innerField1: Int): Array[Byte] = {
      val compMsg = new Proto.Writer; compMsg.string(1, scheme)
      val inner = new Proto.Writer; inner.bytes(innerTag,
        { val w = new Proto.Writer; w.varint(1, innerField1.toLong); w.result() })
      val gen = new Proto.Writer; gen.message(1, compMsg).bytes(2, inner.result())
      val comp = new Proto.Writer; comp.message(4, gen)
      val mb = new Proto.Writer; mb.bytes(3, comp.result())
      val pl = new Proto.Writer; pl.message(1, mb)
      anyWrap("/lance.encodings.PageLayout", pl.result())
    }
    def pad8(b: Array[Byte]): Array[Byte] = b ++ new Array[Byte]((8 - b.length % 8) % 8)
    // strings: inner = variable (u32 end offsets + bytes), zstd-compressed
    val strs = (0 until n).map(i => s"payload_${i}_" + ("x" * (i % 7)))
    val sBytes = strs.mkString.getBytes("UTF-8")
    val sOffs = strs.scanLeft(0)(_ + _.length).tail
    val plain = ints(sOffs: _*) ++ sBytes
    def chunkOf(scheme: String): Array[Byte] = {
      val comp = LanceEncodings.compress(scheme, plain)
      pad8(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(comp.length).array() ++ comp)
    }
    def word(bytes: Int): Short = (bytes / 8).toShort // single last chunk
    val zChunk = chunkOf("zstd")
    val lChunk = chunkOf("lz4")
    val zWords = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(word(zChunk.length)).array()
    val lWords = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(word(lChunk.length)).array()
    writeForeign(ds, Seq(
      ("sz", "string", Seq((Seq(zWords, zChunk), n.toLong, generalLayout("zstd", 3, 32)))),
      ("sl", "string", Seq((Seq(lWords, lChunk), n.toLong, generalLayout("lz4", 3, 32))))))
    val back = spark.read.format("lance").load(ds).collect()
    assert(back.length == n)
    assert(back.map(_.getString(0)).toSet == strs.toSet)
    assert(back.forall(r => r.getString(0) == r.getString(1)))
  }

  test("fixedSizeList write option stores vectors as lance FSL and round-trips") {
    val ds = tmpDs()
    val src = spark.range(1000).selectExpr(
      "id",
      "CASE WHEN id % 10 = 0 THEN CAST(NULL AS ARRAY<FLOAT>) " +
      "ELSE array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT), CAST(id * 2 AS FLOAT), 0.5f) END AS vec"
    ).coalesce(2)
    src.write.format("lance").option("fixedSizeList", "vec:4").mode("append").save(ds)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(ds, conf)
    val manifest = LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, None))
    assert(manifest.fields.find(_.name == "vec").get.logicalType == "fixed_size_list:float:4")
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 1000)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    assert(back.filter(org.apache.spark.sql.functions.col("vec").isNull).count() == 100)
  }

  test("decimal columns round-trip (decimal:128 write + read, negatives and nulls)") {
    val ds = tmpDs()
    val src = spark.range(2000).selectExpr(
      "id",
      "CASE WHEN id % 7 = 0 THEN NULL " +
      "ELSE CAST((id - 1000) * 1.37 AS DECIMAL(12,2)) END AS amt",
      "CAST(id AS DECIMAL(38,6)) * CAST(id AS DECIMAL(10,0)) AS big"
    ).coalesce(1)
    src.write.format("lance").mode("append").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.schema("amt").dataType == org.apache.spark.sql.types.DecimalType(12, 2))
    assert(back.count() == 2000)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // zone maps work on decimal columns too (tracked as doubles)
    assert(back.filter(org.apache.spark.sql.functions.col("amt") < -1300).count() ==
      src.filter(org.apache.spark.sql.functions.col("amt") < -1300).count())
  }

  test("dictionary-encoded string pages round-trip and are actually dict pages") {
    val ds = tmpDs()
    val src = spark.range(100000).selectExpr(
      "id",
      "CASE WHEN id % 3 = 0 THEN 'alpha' WHEN id % 3 = 1 THEN 'beta' ELSE 'gamma' END AS cat",
      "CASE WHEN id % 11 = 0 THEN NULL ELSE concat('grp_', CAST(id % 5 AS STRING)) END AS grp",
      "uuid() AS hi_card" // high cardinality -> must stay plain
    ).coalesce(1)
    src.write.format("lance").mode("append").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 100000)
    assert(back.select("id", "cat", "grp").exceptAll(src.select("id", "cat", "grp")).isEmpty)
    assert(back.filter(org.apache.spark.sql.functions.col("grp").isNull).count() ==
      100000 / 11 + 1)

    // inspect page metadata: cat/grp pages dict-encoded, hi_card plain
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(ds, conf)
    val manifest = LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, None))
    val frag = manifest.fragments.head
    val f = frag.files.head
    val part = LanceInputPartition(
      new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(ds, "data"), f.path).toString,
      f.fieldIds.toArray, f.columnIndices.toArray, frag.physicalRows)
    def fieldId(n: String): Int = manifest.fields.find(_.name == n).get.id
    val specs = Array("cat", "grp", "hi_card").map(n => ColSpec(fieldId(n), "string"))
    val pages = new FragmentPages(part, specs, Nil, conf)
    try {
      assert(pages.pageMetasOf(fieldId("cat")).forall(_.dictEnc), "cat should be dict-encoded")
      assert(pages.pageMetasOf(fieldId("grp")).forall(_.dictEnc), "grp should be dict-encoded")
      assert(pages.pageMetasOf(fieldId("hi_card")).forall(!_.dictEnc), "uuid column must stay plain")
    } finally pages.close()
  }
}
