package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.lance.{LanceFormat, LanceMaintenance}

/** Move-stable row ids (the crate's `enable_move_stable_row_ids`):
  * persistent `_rowid` assigned at write, carried through appends and
  * compaction (rows move, ids don't), new ids on update — and the index
  * contract they exist for: a scalar index keyed by row id answers
  * correctly after the dataset is compacted underneath it.
  */
class LanceRowIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/ds.lance"

  private def readIds(path: String): Seq[(Long, Long)] =
    spark.read.format("lance").load(path)
      .select(col("k"), col("_rowid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  test("fresh stable write assigns ids 0..n-1 in row order; append continues") {
    val p = tmp("rowid_basic")
    (0L until 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    assert(readIds(p).map(_._2) == (0L until 10L))

    // append WITHOUT the option: the manifest's next_row_id governs
    (10L until 15L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("lance").mode("append").save(p)
    assert(readIds(p).map(_._2) == (0L until 15L))

    val conf = spark.sessionState.newHadoopConf()
    val (fs, path) = LanceFormat.fileSystem(p, conf)
    val m = LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, path, None))
    assert(m.nextRowId == 15L && m.stableRowIds)
    assert(m.fragments.forall(_.rowIds.isDefined))
  }

  test("non-stable dataset: _rowid projection fails loudly") {
    val p = tmp("rowid_off")
    Seq((1L, "a")).toDF("k", "v").write.format("lance").mode("overwrite").save(p)
    val e = intercept[Exception] {
      spark.read.format("lance").load(p).select("_rowid").collect()
    }
    assert(e.getMessage != null)
  }

  test("deletes keep ids; time travel sees the old sequence") {
    val p = tmp("rowid_del")
    (0L until 20L).map(k => (k, k % 3)).toDF("k", "tag")
      .coalesce(2).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    val before = readIds(p).toMap
    LanceMaintenance.deleteWhere(spark, p, "k % 4 = 0")
    val after = readIds(p)
    // survivors keep their exact pre-delete ids
    assert(after.forall { case (k, id) => before(k) == id })
    assert(after.map(_._1).toSet == (0L until 20L).filter(_ % 4 != 0).toSet)
  }

  test("compaction preserves ids: rows move, ids don't") {
    val p = tmp("rowid_compact")
    (0L until 30L).map(k => (k, s"t$k")).toDF("k", "v")
      .repartition(3).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    val before = readIds(p).toMap
    LanceMaintenance.deleteWhere(spark, p, "k % 5 = 0")
    val v = LanceMaintenance.compactStable(spark, p, targetFragments = 1)
    val after = readIds(p)
    assert(after.forall { case (k, id) => before(k) == id },
      "surviving rows must keep their pre-compaction row ids")
    assert(after.map(_._1).toSet == (0L until 30L).filterNot(_ % 5 == 0).toSet)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, path) = LanceFormat.fileSystem(p, conf)
    val m = LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, path, None))
    assert(m.version == v && m.fragments.length == 1)
    assert(m.fragments.head.deletion.isEmpty, "compaction materializes deletes")
    assert(m.nextRowId == 30L, "the id counter never rewinds")
    // addresses DID change (rows moved into the new fragment)
    val addrs = spark.read.format("lance").load(p)
      .select(org.apache.spark.sql.functions
        .shiftrightunsigned(col("_rowaddr"), 32)).distinct().collect()
    assert(addrs.length == 1)
    // time travel still reads the pre-compaction layout
    assert(spark.read.format("lance").option("versionAsOf", v - 1)
      .load(p).count() == 24)
  }

  test("plain compact() delegates on a stable dataset and keeps ids") {
    val p = tmp("rowid_delegate")
    (0L until 12L).map(k => (k, k)).toDF("k", "w")
      .repartition(4).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    val before = readIds(p).toMap
    LanceMaintenance.compact(spark, p, targetFragments = 2)
    val after = readIds(p)
    assert(after.forall { case (k, id) => before(k) == id })
    intercept[IllegalArgumentException] {
      LanceMaintenance.compact(spark, p, 1, sortBy = Seq("k"))
    }
  }

  test("update assigns NEW ids to rewritten rows (move-stable, not value-stable)") {
    val p = tmp("rowid_update")
    (0L until 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    LanceMaintenance.updateWhere(spark, p, "k >= 8", Map("v" -> "concat(v, '!')"))
    val ids = readIds(p).toMap
    assert((0L until 8L).forall(k => ids(k) == k), "untouched rows keep ids")
    assert(Seq(8L, 9L).forall(k => ids(k) >= 10L), "rewritten rows take fresh ids")
    val conf = spark.sessionState.newHadoopConf()
    val (fs, path) = LanceFormat.fileSystem(p, conf)
    val m = LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, path, None))
    assert(m.nextRowId == 12L)
  }

  test("scalar index keyed by row ids survives compaction") {
    import graft.operators.ScalarIndex
    val p = tmp("rowid_index")
    val ix = java.nio.file.Files.createTempDirectory("rowid_ix").toString
    (0L until 40L).map(k => (k, s"name_${k % 8}", k * 10))
      .toDF("k", "name", "amount")
      .repartition(4).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    ScalarIndex.build(spark, p, "name", ix, stableRowIds = true)
    def probe(): Set[Long] =
      ScalarIndex.lookup(spark, p, ix, Seq("name_3"))
        .select("k").collect().map(_.getLong(0)).toSet
    val before = probe()
    assert(before == (0L until 40L).filter(_ % 8 == 3).toSet)
    // delete some indexed rows, then compact: addresses all change
    LanceMaintenance.deleteWhere(spark, p, "k = 11")
    LanceMaintenance.compactStable(spark, p, targetFragments = 1)
    assert(probe() == before - 11L,
      "post-compaction lookup through the SAME index must stay correct")
    // an address-keyed index would now fetch wrong/no rows; assert the
    // stable one still resolves every id to the moved location
    val r = ScalarIndex.lookupRange(spark, p, ix, "name_3", "name_4")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(r == before - 11L)
  }

  test("changesBetween: update = delete+insert; compaction-only range is empty") {
    val p = tmp("rowid_cdc")
    (0L until 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    val v1 = 1L
    LanceMaintenance.updateWhere(spark, p, "k = 4", Map("v" -> "'patched'"))
    val conf = spark.sessionState.newHadoopConf()
    val (fs, path) = LanceFormat.fileSystem(p, conf)
    def head(): Long = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, path, None)).version
    val v2 = head()
    val feed = LanceMaintenance.changesBetween(spark, p, v1, v2)
      .select(col("_change"), col("k"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(feed == Set(("delete", 4L, "v4"), ("insert", 4L, "patched")),
      s"update must surface as one delete + one insert, got $feed")
    // compaction alone moves every row but changes no identity
    LanceMaintenance.compactStable(spark, p, targetFragments = 1)
    val v3 = head()
    assert(LanceMaintenance.changesBetween(spark, p, v2, v3).count() == 0L,
      "a compaction-only range must produce an empty feed")
    // and the full range still reports just the update
    assert(LanceMaintenance.changesBetween(spark, p, v1, v3).count() == 2L)
  }

  test("changesBetween fast path ≡ rowid anti-join reference over every version pair") {
    // churn history: appends, predicate deletes, an update (delete+insert),
    // a restore (forces the anti-join fallback: a deletion vector shrinks),
    // and a compaction (forces the fallback: fragments disappear). The
    // manifest-diff fast path must agree with an independently computed
    // _rowid anti-join reference on EVERY (from, to) version pair.
    val p = tmp("rowid_cdc_diff")
    (0L until 60L).map(k => (k, k * 10)).toDF("k", "x")
      .repartition(3).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    LanceMaintenance.deleteWhere(spark, p, "k % 7 = 0")
    (100L until 120L).map(k => (k, k)).toDF("k", "x")
      .write.format("lance").mode("append").save(p)
    LanceMaintenance.updateWhere(spark, p, "k = 101", Map("x" -> "999"))
    // schema evolution mid-history: rows before the addColumn null-fill
    // the new column on read; the feed must carry it via unionByName
    LanceMaintenance.addColumn(spark, p, "y",
      org.apache.spark.sql.types.LongType)
    LanceMaintenance.deleteWhere(spark, p, "x > 500 AND x < 560")
    val conf = spark.sessionState.newHadoopConf()
    val (fs, path) = LanceFormat.fileSystem(p, conf)
    def head(): Long = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, path, None)).version
    val preRestore = head()
    LanceMaintenance.restore(spark, p, 2L) // un-deletes: dv shrinks vs v3+
    LanceMaintenance.compactStable(spark, p, targetFragments = 1)
    (200L until 205L).map(k => (k, k)).toDF("k", "x")
      .write.format("lance").mode("append").save(p)
    val last = head()

    def at(v: Long) = spark.read.format("lance")
      .option("versionAsOf", v.toString).load(p)
    def reference(a: Long, b: Long): Set[(String, Long, Long)] = {
      val ins = at(b).withColumn("_rowid", col("_rowid"))
        .join(at(a).select(col("_rowid")), Seq("_rowid"), "left_anti")
        .select(lit("insert").as("c"), col("k"), col("x"))
      val del = at(a).withColumn("_rowid", col("_rowid"))
        .join(at(b).select(col("_rowid")), Seq("_rowid"), "left_anti")
        .select(lit("delete").as("c"), col("k"), col("x"))
      ins.unionByName(del).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    for (a <- 1L to last; b <- (a + 1) to last) {
      val got = LanceMaintenance.changesBetween(spark, p, a, b)
        .select(col("_change"), col("k"), col("x")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == reference(a, b),
        s"feed $a->$b diverged: extra=${got -- reference(a, b)} " +
          s"missing=${reference(a, b) -- got}")
    }
    assert(preRestore >= 5L && last > preRestore) // history really churned
  }

  test("changesBetween refuses an address-only dataset") {
    val p = tmp("rowid_cdc_off")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("lance").mode("overwrite").save(p)
    Seq((3L, "c")).toDF("k", "v").write.format("lance").mode("append").save(p)
    val e = intercept[IllegalArgumentException] {
      LanceMaintenance.changesBetween(spark, p, 1L, 2L)
    }
    assert(e.getMessage.contains("stable"))
  }

  test("row-id codec round-trips ranges and arrays") {
    import LanceFormat._
    val segs = Seq(RangeSeg(0L, 5L), ArraySeg(Array(9L, 7L, 100L)), RangeSeg(200L, 2L))
    val back = decodeRowIds(encodeRowIds(segs))
    assert(back.length == 3)
    assert(back(0) == RangeSeg(0L, 5L))
    assert(back(1).asInstanceOf[ArraySeg].ids.toSeq == Seq(9L, 7L, 100L))
    assert(back(2) == RangeSeg(200L, 2L))
    assert((0L until 10L).map(rowIdAt(segs, _)) ==
      Seq(0L, 1L, 2L, 3L, 4L, 9L, 7L, 100L, 200L, 201L))
  }
}
