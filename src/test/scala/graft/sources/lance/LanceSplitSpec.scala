package graft.sources.lance

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fragment splitting (`option("splitRows", n)`): a fragment larger than
  * n physical rows fans out over multiple tasks — read-side parallelism
  * for datasets whose writer cut huge fragments. Slices address physical
  * rows, so results, `_rowaddr`, and deletion masks are identical to the
  * unsplit scan.
  */
class LanceSplitSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpDs(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.delete()
    f.getAbsolutePath + "/ds.lance"
  }

  /** One big fragment (single write task). */
  private def writeOneFragment(ds: String, n: Int): Unit =
    spark.range(n).selectExpr("id", "id % 97 AS grp", "CONCAT('v', id) AS s")
      .coalesce(1)
      .write.format("lance").mode("overwrite").save(ds)

  test("split scan equals unsplit scan, with more partitions") {
    val ds = tmpDs("lance_split_eq")
    writeOneFragment(ds, 200000)
    val unsplit = spark.read.format("lance").load(ds)
    val split = spark.read.format("lance").option("splitRows", 30000).load(ds)
    assert(unsplit.rdd.getNumPartitions == 1)
    assert(split.rdd.getNumPartitions == 7) // ceil(200000 / 30000)
    assert(split.count() == 200000)
    val a = split.agg(sum("id"), count(lit(1)), min("s"), max("s")).head()
    val b = unsplit.agg(sum("id"), count(lit(1)), min("s"), max("s")).head()
    assert(a == b)
    // spot-check exact content equality
    assert(split.exceptAll(unsplit).isEmpty && unsplit.exceptAll(split).isEmpty)
  }

  test("_rowaddr values are identical split vs unsplit") {
    val ds = tmpDs("lance_split_addr")
    writeOneFragment(ds, 100000)
    val unsplit = spark.read.format("lance").load(ds)
      .select("id", "_rowaddr").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val split = spark.read.format("lance").option("splitRows", 17000).load(ds)
      .select("id", "_rowaddr").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(split == unsplit)
  }

  test("split + deletions stays exact") {
    val ds = tmpDs("lance_split_del")
    writeOneFragment(ds, 100000)
    LanceMaintenance.deleteWhere(spark, ds, "grp IN (5, 11, 42)")
    val expected = (0 until 100000).count(i => !Set(5, 11, 42)(i % 97))
    val split = spark.read.format("lance").option("splitRows", 14000).load(ds)
    assert(split.count() == expected)
    assert(split.filter("grp IN (5, 11, 42)").count() == 0)
    assert(split.agg(sum("id")).head().getLong(0) ==
      (0L until 100000L).filter(i => !Set(5L, 11L, 42L)(i % 97)).sum)
  }

  test("split + zone filter prunes and stays exact") {
    val ds = tmpDs("lance_split_zone")
    writeOneFragment(ds, 120000)
    val split = spark.read.format("lance").option("splitRows", 20000).load(ds)
      .filter("id >= 50000 AND id < 50100")
    assert(split.count() == 100)
    assert(split.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(50000L, 50099L))
  }

  test("pushed limit disables splitting (whole-fragment trim already minimal)") {
    val ds = tmpDs("lance_split_limit")
    writeOneFragment(ds, 100000)
    val limited = spark.read.format("lance").option("splitRows", 10000).load(ds).limit(5)
    assert(limited.collect().length == 5)
  }

  test("metadata-only projection respects slices") {
    val ds = tmpDs("lance_split_meta")
    writeOneFragment(ds, 60000)
    val addrs = spark.read.format("lance").option("splitRows", 25000).load(ds)
      .select("_rowaddr")
    assert(addrs.count() == 60000)
    assert(addrs.distinct().count() == 60000)
  }

  test("small fragments are not split") {
    val ds = tmpDs("lance_split_small")
    writeOneFragment(ds, 5000)
    val split = spark.read.format("lance").option("splitRows", 30000).load(ds)
    assert(split.rdd.getNumPartitions == 1)
    assert(split.count() == 5000)
  }
}
