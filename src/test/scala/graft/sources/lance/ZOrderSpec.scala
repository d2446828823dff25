package graft.sources.lance

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered lance writes: fragments cover hyper-rectangles of
  * the clustered column space, so manifest stats prune on EITHER column —
  * vs a 1-D sort, which prunes only its leading column.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpDs(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.delete()
    f.getAbsolutePath + "/ds.lance"
  }

  /** 256x256 grid in pseudo-random row order. */
  private def grid() =
    spark.range(65536)
      .selectExpr("CAST(id % 256 AS BIGINT) AS x",
                  "CAST(id DIV 256 AS BIGINT) AS y",
                  "id AS payload")
      .orderBy(expr("hash(id)"))

  private def plannedFragments(ds: String, filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
    val schema = spark.read.format("lance").load(ds).schema
    val b = new LanceScanBuilder(ds, schema, None)
    b.pushFilters(filters)
    b.build().asInstanceOf[LanceScan].planInputPartitions().length
  }

  test("z-ordered write round-trips losslessly") {
    val ds = tmpDs("lance_zorder_rt")
    ZOrder.writeLance(grid(), ds, Seq("x", "y"), parts = 16)
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 65536)
    assert(back.agg(sum("payload")).head().getLong(0) == 65535L * 65536 / 2)
    assert(back.filter("x = 7 AND y = 9").select("payload").head().getLong(0)
      == 9L * 256 + 7)
  }

  test("z-order prunes fragments on BOTH columns; 1-D sort only on its leading column") {
    val zds = tmpDs("lance_zorder_2d")
    ZOrder.writeLance(grid(), zds, Seq("x", "y"), parts = 16)
    val sds = tmpDs("lance_sorted_1d")
    grid().write.format("lance")
      .option("sortBy", "x").option("writePartitions", "16")
      .mode("overwrite").save(sds)

    val xSlice = Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("x", 0L), LessThan("x", 16L))
    val ySlice = Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("y", 0L), LessThan("y", 16L))

    val zx = plannedFragments(zds, xSlice)
    val zy = plannedFragments(zds, ySlice)
    val sx = plannedFragments(sds, xSlice)
    val sy = plannedFragments(sds, ySlice)

    // z-order: a 1/16-wide slice in either dimension touches only the
    // fragments whose hyper-rectangle overlaps it (<= half of them;
    // ideally ~1/4)
    assert(zx <= 8, s"x-slice planned $zx of 16 z-ordered fragments")
    assert(zy <= 8, s"y-slice planned $zy of 16 z-ordered fragments")
    // 1-D sort: perfect on the sorted column, useless on the other
    assert(sx <= 2, s"x-slice planned $sx of 16 x-sorted fragments")
    assert(sy == 16, s"y-slice should prune nothing on an x-sorted layout")
    // and the pruned z-scan still computes the right answer
    val zback = spark.read.format("lance").load(zds).filter("y >= 0 AND y < 16")
    assert(zback.count() == 16L * 256)
  }

  test("zValue interleaves bits (unit)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L))
      .toDF("x", "y")
    val bounds = Map("x" -> (0.0, 255.0), "y" -> (0.0, 255.0))
    val zs = df.select(ZOrder.zValue(df, Seq("x", "y"), bounds).as("z"))
      .collect().map(_.getLong(0))
    // corners: (0,0) -> 0; (max,max) -> all 32 bits set
    assert(zs(0) == 0L)
    assert(zs(3) == (1L << 32) - 1)
    // x occupies even bits, y odd bits
    assert(zs(1) == 0x55555555L)
    assert(zs(2) == 0xAAAAAAAAL)
  }

  test("zorder rejects unsupported shapes loudly") {
    val df = grid()
    intercept[IllegalArgumentException] { ZOrder.zOrdered(df, Seq("x"), 4) }
    intercept[IllegalArgumentException] {
      val withS = df.withColumn("s", lit("a"))
      ZOrder.zOrdered(withS, Seq("x", "s"), 4)
    }
  }
}
