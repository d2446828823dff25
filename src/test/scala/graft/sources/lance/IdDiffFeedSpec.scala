package graft.sources.lance

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The id-diff change feed: metadata-driven CDC across compaction /
  * restore intervals (where the append/delete-only fast path refuses).
  * The all-pairs differential in LanceRowIdSpec checks end-to-end
  * equality; this spec pins that the id path ACTIVATES on such
  * intervals and that the interval algebra is exact.
  */
class IdDiffFeedSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("intervalDiff: exact over adjacency, containment, partial overlap") {
    def d(a: Seq[(Long, Long)], b: Seq[(Long, Long)]) =
      LanceMaintenance.intervalDiff(a.toArray, b.toArray).toSeq
    assert(d(Seq((0L, 9L)), Seq()) == Seq((0L, 9L)))
    assert(d(Seq((0L, 9L)), Seq((0L, 9L))) == Seq())
    assert(d(Seq((0L, 9L)), Seq((3L, 5L))) == Seq((0L, 2L), (6L, 9L)))
    assert(d(Seq((0L, 9L)), Seq((0L, 4L))) == Seq((5L, 9L)))
    assert(d(Seq((0L, 9L)), Seq((5L, 20L))) == Seq((0L, 4L)))
    assert(d(Seq((0L, 3L), (10L, 12L)), Seq((2L, 10L))) ==
      Seq((0L, 1L), (11L, 12L)))
    assert(d(Seq((5L, 5L)), Seq((5L, 5L))) == Seq())
    assert(d(Seq((0L, 1L), (2L, 3L)), Seq((1L, 2L))) == Seq((0L, 0L), (3L, 3L)))
  }

  test("changesById answers a compaction-spanning interval without the anti-join") {
    val dir = java.nio.file.Files.createTempDirectory("iddiff").toString
    val p = s"$dir/t.lance"
    (0L until 40L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(2).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(p)
    LanceMaintenance.deleteWhere(spark, p, "k % 5 = 0")          // v2
    LanceMaintenance.compactStable(spark, p, targetFragments = 1) // v3
    (100L until 105L).map(k => (k, s"n$k")).toDF("k", "v")
      .write.format("lance").mode("append").save(p)              // v4
    val conf = spark.sessionState.newHadoopConf()

    // v1 -> v4 spans delete + compaction + append: the dv-diff fast path
    // must refuse (fragments disappeared) but the id path must answer
    val feed = LanceMaintenance.changesById(spark, p, 1L, 4L, conf)
    assert(feed.isDefined, "id-diff path did not activate across compaction")
    val rows = feed.get.select(col("_change"), col("k")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val expected =
      (0L until 40L).filter(_ % 5 == 0).map(("delete", _)).toSet ++
        (100L until 105L).map(("insert", _)).toSet
    assert(rows == expected,
      s"missing=${expected -- rows} extra=${rows -- expected}")

    // compaction-only interval: empty feed from metadata alone
    val f23 = LanceMaintenance.changesById(spark, p, 2L, 3L, conf)
    assert(f23.isDefined && f23.get.count() == 0L)
  }

  test("liveIdIntervals + addrsOfIdIntervals over ArraySeg sequences (crate-interop shape)") {
    // our writer emits RangeSegs; ArraySegs are the crate's irregular
    // compaction tails — fabricate a manifest mixing both (no deletion
    // files, so no fs access happens on the dv branch)
    import LanceFormat._
    val m = Manifest(
      fields = Nil,
      fragments = Seq(
        FragmentMeta(0L, Nil, physicalRows = 5,
          rowIds = Some(Seq(RangeSeg(100L, 3), ArraySeg(Array(7L, 42L))))),
        FragmentMeta(1L, Nil, physicalRows = 2,
          rowIds = Some(Seq(ArraySeg(Array(9L, 8L)))))),
      version = 1L, nextRowId = 200L)
    val conf = spark.sessionState.newHadoopConf()
    val dummy = new org.apache.hadoop.fs.Path("/tmp")
    val live = LanceMaintenance.liveIdIntervals(m, dummy, conf).get.toSeq
    assert(live == Seq((7L, 7L), (8L, 8L), (9L, 9L), (42L, 42L), (100L, 102L)))
    // id -> addr mapping: RangeSeg interior, ArraySeg elements, and an
    // id owned by the second fragment
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val n = LanceMaintenance.addrsOfIdIntervals(m,
      Array((8L, 9L), (42L, 42L), (101L, 102L)), out, cap = 100, have = 0)
    assert(n == 5)
    val addrs = out.result().sorted.toSeq
    // frag 0: positions 0,1,2 = ids 100..102; positions 3,4 = ids 7,42
    // frag 1: positions 0,1 = ids 9,8
    assert(addrs == Seq(
      (0L << 32) | 1L, (0L << 32) | 2L,           // ids 101, 102
      (0L << 32) | 4L,                            // id 42
      (1L << 32) | 0L, (1L << 32) | 1L))          // ids 9, 8
    // cap: abort signals -1 without materializing past the limit
    val out2 = new scala.collection.mutable.ArrayBuilder.ofLong
    assert(LanceMaintenance.addrsOfIdIntervals(m,
      Array((100L, 102L)), out2, cap = 2, have = 0) == -1)
  }

  test("changesById refuses an address-only dataset (no row-id sequences)") {
    val dir = java.nio.file.Files.createTempDirectory("iddiff-off").toString
    val p = s"$dir/t.lance"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("lance").mode("overwrite").save(p)
    Seq((3L, "c")).toDF("k", "v").write.format("lance").mode("append").save(p)
    val conf = spark.sessionState.newHadoopConf()
    assert(LanceMaintenance.changesById(spark, p, 1L, 2L, conf).isEmpty)
  }
}
