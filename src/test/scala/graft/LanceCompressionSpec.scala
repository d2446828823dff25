package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side page compression (`option("compression", "zstd"|"lz4")`):
  * transparent round-trips across the type surface, real size wins on
  * compressible data, plain fallback on incompressible pages, and
  * interplay with zone pruning, deletes and compaction (the maintenance
  * paths re-encode through the writer, so a compressed dataset stays
  * fully maintainable). */
class LanceCompressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDs(): String =
    java.nio.file.Files.createTempDirectory("graft-lance-comp").toString + "/out.lance"

  def dirBytes(ds: String): Long = {
    val d = new java.io.File(new java.io.File(ds), "data")
    d.listFiles().map(_.length()).sum
  }

  private def mixedDf = {
    val rows = (0 until 5000).map { i =>
      (i.toLong,
       if (i % 7 == 0) null else s"the quick brown fox jumps over row $i of shipment batch ${i / 100}",
       i * 1.5,
       i % 2 == 0,
       Seq(i, i + 1, i + 2),
       (s"name$i", i % 5),
       Map("k" -> s"v${i % 3}"),
       Array.fill(8)((i % 251).toByte))
    }
    rows.toDF("id", "txt", "d", "b", "arr", "st", "m", "bin")
  }

  for (codec <- Seq("zstd", "lz4")) {
    test(s"$codec round-trip across the type surface (nulls, lists, structs, maps, binary)") {
      val ds = tmpDs()
      val df = mixedDf
      df.write.format("lance").option("compression", codec)
        .mode("overwrite").save(ds)
      val back = spark.read.format("lance").load(ds)
      assert(back.schema.map(_.name) == df.schema.map(_.name))
      // set-ops reject MapType: compare with maps exploded to sorted entries
      def cmp(d: org.apache.spark.sql.DataFrame) =
        d.withColumn("m", sort_array(map_entries(col("m"))))
      assert(cmp(back).exceptAll(cmp(df)).isEmpty &&
             cmp(df).exceptAll(cmp(back)).isEmpty)
    }
  }

  test("compressed file is materially smaller on repetitive data") {
    val dsPlain = tmpDs()
    val dsZstd = tmpDs()
    val df = mixedDf.coalesce(1)
    df.write.format("lance").mode("overwrite").save(dsPlain)
    df.write.format("lance").option("compression", "zstd")
      .mode("overwrite").save(dsZstd)
    val (plain, comp) = (dirBytes(dsPlain), dirBytes(dsZstd))
    assert(comp < plain / 2,
      s"expected zstd to at least halve the repetitive fragment ($comp vs $plain)")
  }

  test("incompressible pages fall back to plain and still round-trip") {
    val rnd = new java.util.Random(42)
    val rows = (0 until 2000).map { i =>
      val b = new Array[Byte](64); rnd.nextBytes(b)
      (i.toLong, b)
    }
    val df = rows.toDF("id", "payload").coalesce(1)
    val ds = tmpDs()
    df.write.format("lance").option("compression", "zstd")
      .mode("overwrite").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("zone pruning still prunes on a compressed sorted write") {
    val ds = tmpDs()
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .orderBy("k").coalesce(1).sortWithinPartitions("k")
      .write.format("lance").option("compression", "zstd")
      .mode("overwrite").save(ds)
    // page stats live in the proto (pre-compression): a point filter
    // decodes right and — with 64Ki-row pages — returns exactly one row
    val hit = spark.read.format("lance").load(ds)
      .filter(col("k") === 12345L).collect()
    assert(hit.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((12345L, "v12345")))
  }

  test("delete + compact on a compressed dataset") {
    val ds = tmpDs()
    (0 until 3000).map(i => (i.toLong, s"row $i of the corpus", i % 10))
      .toDF("id", "txt", "g")
      .repartition(3)
      .write.format("lance").option("compression", "lz4")
      .mode("overwrite").save(ds)
    graft.sources.lance.LanceMaintenance.deleteWhere(spark, ds, "g = 3")
    graft.sources.lance.LanceMaintenance.compact(spark, ds, targetFragments = 1)
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 2700)
    assert(back.filter(col("g") === 3).count() == 0)
    assert(back.agg(sum("id")).head().getLong(0) ==
      (0 until 3000).filter(_ % 10 != 3).map(_.toLong).sum)
  }

  test("append mixes compressed and plain fragments transparently") {
    val ds = tmpDs()
    val a = (0 until 1000).map(i => (i.toLong, s"text $i")).toDF("id", "t")
    val b = (1000 until 2000).map(i => (i.toLong, s"text $i")).toDF("id", "t")
    a.write.format("lance").mode("overwrite").save(ds)
    b.write.format("lance").option("compression", "zstd").mode("append").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 2000)
    assert(back.agg(sum("id")).head().getLong(0) == (0 until 2000).map(_.toLong).sum)
  }

  test("unknown codec fails fast driver-side") {
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "t").write.format("lance")
        .option("compression", "gzip9").mode("overwrite").save(tmpDs())
    }
    assert(e.getMessage.contains("gzip9") ||
      Option(e.getCause).exists(_.getMessage.contains("gzip9")))
  }
}
