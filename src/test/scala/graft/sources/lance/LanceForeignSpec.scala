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
    val specs = Array("cat", "grp", "hi_card").map(n =>
      ColSpec(fieldId(n), "string", Array.empty, Array.empty, Array.empty))
    val pages = new FragmentPages(part, specs, Nil, conf)
    try {
      assert(pages.pageMetasOf(fieldId("cat")).forall(_.dictEnc), "cat should be dict-encoded")
      assert(pages.pageMetasOf(fieldId("grp")).forall(_.dictEnc), "grp should be dict-encoded")
      assert(pages.pageMetasOf(fieldId("hi_card")).forall(!_.dictEnc), "uuid column must stay plain")
    } finally pages.close()
  }
}
