package graft

import graft.operators.SketchIndex
import graft.sources.lance.LanceMaintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NDV sketch sidecars: accuracy, sidecar-only answering (the source's
  * data files can be GONE), fragment-incremental refresh, deletion
  * refusal, compaction recovery. */
class SketchIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def writeIds(path: String, ids: Seq[Long], parts: Int): Unit =
    ids.toDF("v").repartition(parts)
      .write.format("lance").mode("overwrite").save(path)

  test("estimate within 5% of exact; answers with source data files renamed away") {
    val dir = tmp("ndv_basic")
    val src = s"$dir/src.lance"; val ix = s"$dir/ndv_ix"
    // 8000 distinct values, duplicated across 4 fragments
    writeIds(src, (0L until 8000L) ++ (0L until 4000L), 4)
    SketchIndex.build(spark, src, "v", ix)
    // decisive sidecar-only proof: hide the source's data directory
    val data = new java.io.File(s"$src/data")
    val hidden = new java.io.File(s"$src/data_hidden")
    assert(data.renameTo(hidden))
    try {
      val est = SketchIndex.ndv(spark, src, ix)
      assert(math.abs(est - 8000.0) / 8000.0 < 0.05, s"estimate $est")
    } finally assert(hidden.renameTo(data))
  }

  test("refresh sketches only appended fragments") {
    val dir = tmp("ndv_refresh")
    val src = s"$dir/src.lance"; val ix = s"$dir/ndv_ix"
    writeIds(src, 0L until 1000L, 2)
    SketchIndex.build(spark, src, "v", ix)
    val rows0 = spark.read.format("lance").load(ix).count()
    (1000L until 3000L).toDF("v").repartition(3)
      .write.format("lance").mode("append").save(src)
    assert(SketchIndex.refresh(spark, ix) == 3L)
    assert(spark.read.format("lance").load(ix).count() == rows0 + 3)
    assert(SketchIndex.refresh(spark, ix) == 0L) // idempotent
    val est = SketchIndex.ndv(spark, src, ix)
    assert(math.abs(est - 3000.0) / 3000.0 < 0.05, s"estimate $est")
  }

  test("unsketched fragments are refused until refresh") {
    val dir = tmp("ndv_unsketched")
    val src = s"$dir/src.lance"; val ix = s"$dir/ndv_ix"
    writeIds(src, 0L until 500L, 1)
    SketchIndex.build(spark, src, "v", ix)
    (500L until 600L).toDF("v").coalesce(1)
      .write.format("lance").mode("append").save(src)
    val e = intercept[IllegalArgumentException] {
      SketchIndex.ndv(spark, src, ix)
    }
    assert(e.getMessage.contains("not sketched"))
  }

  test("deletions refuse by default; allowDeletes upper-bounds live NDV") {
    val dir = tmp("ndv_del")
    val src = s"$dir/src.lance"; val ix = s"$dir/ndv_ix"
    writeIds(src, 0L until 2000L, 2)
    SketchIndex.build(spark, src, "v", ix)
    LanceMaintenance.deleteWhere(spark, src, "v >= 1000")
    val e = intercept[IllegalArgumentException] {
      SketchIndex.ndv(spark, src, ix)
    }
    assert(e.getMessage.contains("deletion vectors"))
    val upper = SketchIndex.ndv(spark, src, ix, allowDeletes = true)
    val exact = spark.read.format("lance").load(src)
      .select("v").distinct().count()
    assert(upper >= exact, s"upper $upper < live exact $exact")
  }

  test("compaction invalidates old fragment ids; refresh re-covers, stale rows ignored") {
    val dir = tmp("ndv_compact")
    val src = s"$dir/src.lance"; val ix = s"$dir/ndv_ix"
    writeIds(src, 0L until 3000L, 3)
    SketchIndex.build(spark, src, "v", ix)
    LanceMaintenance.deleteWhere(spark, src, "v >= 2000")
    LanceMaintenance.compact(spark, src, targetFragments = 1)
    // post-compaction head has fresh fragment ids: must refresh first
    assert(SketchIndex.refresh(spark, ix) >= 1L)
    val est = SketchIndex.ndv(spark, src, ix)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.05, s"estimate $est")
  }
}
