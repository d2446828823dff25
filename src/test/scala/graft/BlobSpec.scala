package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Blob references: `option("blobRefs", col)` emits struct<path,pos,len>
  * decoded from offsets buffers alone; `Blobs.fetch` resolves ranges. */
class BlobSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDs(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-blob").toString + s"/$name.lance"

  private val payloads: Seq[(Long, Array[Byte])] = (0L until 50L).map { i =>
    i -> (if (i % 7 == 3) null
          else Array.tabulate((i * 13 % 300).toInt + 1)(j => ((i * 31 + j) % 251).toByte))
  }

  test("refs fetch round-trips every payload including nulls") {
    val ds = tmpDs("rt")
    payloads.toDF("id", "payload").write.format("lance").mode("overwrite").save(ds)
    val refs = spark.read.format("lance").option("blobRefs", "payload").load(ds)
    assert(refs.schema("payload").dataType == graft.operators.Blobs.refType)
    val got = graft.operators.Blobs.fetch(refs, "payload")
      .select("id", "bytes").as[(Long, Array[Byte])].collect().toMap
    assert(got.size == payloads.size)
    payloads.foreach { case (i, b) =>
      if (b == null) assert(got(i) == null, s"row $i")
      else assert(java.util.Arrays.equals(got(i), b), s"row $i")
    }
  }

  test("a refs-only projection never reads payload bytes") {
    val ds = tmpDs("io")
    val big = (0L until 200L).map(i => i -> Array.fill(10000)((i % 251).toByte))
    big.toDF("id", "payload").write.format("lance").mode("overwrite").save(ds)
    val payloadBytes = 200L * 10000
    def scanBytes(refsMode: Boolean): Long = {
      val before = graft.sources.lance.LanceDataSource.bytesRead.sum()
      val r = spark.read.format("lance")
      val df = (if (refsMode) r.option("blobRefs", "payload") else r).load(ds)
      df.selectExpr(if (refsMode) "payload.len" else "length(payload)")
        .agg(sum(col(if (refsMode) "len" else "length(payload)"))).collect()
      graft.sources.lance.LanceDataSource.bytesRead.sum() - before
    }
    val full = scanBytes(refsMode = false)
    val refs = scanBytes(refsMode = true)
    assert(full > payloadBytes, s"full scan must read the payloads ($full)")
    assert(refs < payloadBytes / 10,
      s"refs scan must skip payload buffers (read $refs of $payloadBytes)")
    // and the offsets-derived lengths agree with the real ones
    val a = spark.read.format("lance").option("blobRefs", "payload").load(ds)
      .select(col("id"), col("payload.len").as("l")).as[(Long, Long)].collect().toMap
    big.foreach { case (i, b) => assert(a(i) == b.length) }
  }

  test("blobRefs composes with pushed filters and fetches survivors only") {
    val ds = tmpDs("fl")
    payloads.filter(_._2 != null).toDF("id", "payload")
      .write.format("lance").option("sortBy", "id").mode("overwrite").save(ds)
    val refs = spark.read.format("lance").option("blobRefs", "payload").load(ds)
      .filter(col("id") >= 40L)
    val got = graft.operators.Blobs.fetch(refs, "payload")
      .select("id", "bytes").as[(Long, Array[Byte])].collect()
    val want = payloads.filter(p => p._1 >= 40L && p._2 != null)
    assert(got.map(_._1).sorted.toSeq == want.map(_._1))
    got.foreach { case (i, b) =>
      assert(java.util.Arrays.equals(b, want.find(_._1 == i).get._2)) }
  }

  test("blobRefs on a compressed or non-binary column fails loudly") {
    val ds = tmpDs("bad")
    payloads.filter(_._2 != null).toDF("id", "payload")
      .write.format("lance").option("compression", "zstd").mode("overwrite").save(ds)
    val e = intercept[Exception] {
      spark.read.format("lance").option("blobRefs", "payload").load(ds)
        .select("payload.len").collect()
    }
    assert(e.getMessage != null || e.getCause != null)
    val e2 = intercept[Exception] {
      spark.read.format("lance").option("blobRefs", "id").load(ds).collect()
    }
    assert(e2.getMessage.contains("not binary") ||
           String.valueOf(e2.getCause).contains("not binary"))
  }
}
