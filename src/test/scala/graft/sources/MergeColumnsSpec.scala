package graft.sources

import graft.TestSpark
import graft.sources.lance.LanceMaintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-merge (crate `Dataset::merge` / `add_columns` analogue): new
  * columns land as per-fragment column-slice data files; existing files
  * are never rewritten; the reader routes field ids across a fragment's
  * slices. l15 oracles the values end-to-end; these pin the mechanics.
  */
class MergeColumnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDs(rows: Int = 10000, frags: Int = 3): String = {
    val dir = java.nio.file.Files.createTempDirectory("mergec").toString
    val ds = s"$dir/base.lance"
    spark.range(rows)
      .selectExpr("id AS k", "CAST(id % 100 AS DOUBLE) AS v",
                  "concat('row-', id) AS s")
      .repartition(frags)
      .write.format("lance").mode("overwrite").save(ds)
    ds
  }

  test("merged columns read back joined; unmatched rows null-fill") {
    val ds = freshDs()
    val right = spark.range(0, 10000, 2) // even keys only
      .selectExpr("id AS rk", "id * 10 AS extra", "concat('tag', id % 5) AS tag")
    val v = LanceMaintenance.mergeColumns(spark, ds, right, "k", "rk")
    assert(v >= 2)
    val back = spark.read.format("lance").load(ds)
    assert(back.columns.toSeq == Seq("k", "v", "s", "extra", "tag"))
    assert(back.count() == 10000)
    val rows = back.select("k", "extra", "tag").collect()
    rows.foreach { r =>
      val k = r.getLong(0)
      if (k % 2 == 0) {
        assert(r.getLong(1) == k * 10, s"k=$k extra")
        assert(r.getString(2) == s"tag${k % 5}")
      } else {
        assert(r.isNullAt(1) && r.isNullAt(2), s"k=$k should null-fill")
      }
    }
    // the previous version still reads WITHOUT the merged columns
    val old = spark.read.format("lance").option("versionAsOf", v - 1).load(ds)
    assert(old.columns.toSeq == Seq("k", "v", "s"))
    // existing data files were not rewritten: aggregates over old columns
    // agree across versions
    assert(old.agg(sum("v")).head().getDouble(0) ==
           back.agg(sum("v")).head().getDouble(0))
  }

  test("filters and aggregates run over merged columns; pushdown safe") {
    val ds = freshDs()
    val right = spark.range(10000).selectExpr("id AS rk", "id % 7 AS bucket")
    LanceMaintenance.mergeColumns(spark, ds, right, "k", "rk")
    val back = spark.read.format("lance").load(ds)
    val got = back.filter(col("bucket") === 3L).agg(count(lit(1))).head().getLong(0)
    assert(got == spark.range(10000).filter(col("id") % 7 === 3).count())
    val bySum = back.groupBy("bucket").agg(sum("v").as("sv")).collect()
    assert(bySum.length == 7)
  }

  test("merge over deletions: dead offsets stay dead, live values align") {
    val ds = freshDs(rows = 5000, frags = 2)
    LanceMaintenance.deleteWhere(spark, ds, "k % 10 = 0")
    val right = spark.range(5000).selectExpr("id AS rk", "id + 100000 AS m")
    LanceMaintenance.mergeColumns(spark, ds, right, "k", "rk")
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 4500)
    assert(back.filter(col("k") % 10 === 0).count() == 0)
    // every LIVE row carries the right merged value (alignment across the
    // deletion gaps — a one-off offset error would misalign neighbours)
    assert(back.filter(col("m") =!= col("k") + 100000L).count() == 0)
  }

  test("fragments appended after the merge null-fill the merged columns") {
    val ds = freshDs(rows = 3000, frags = 2)
    val right = spark.range(3000).selectExpr("id AS rk", "id * 2 AS dbl")
    LanceMaintenance.mergeColumns(spark, ds, right, "k", "rk")
    spark.range(3000, 3500)
      .selectExpr("id AS k", "CAST(id % 100 AS DOUBLE) AS v",
                  "concat('row-', id) AS s",
                  "CAST(NULL AS BIGINT) AS dbl")
      .write.format("lance").mode("append").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 3500)
    assert(back.filter(col("k") >= 3000L && col("dbl").isNotNull).count() == 0)
    assert(back.filter(col("k") < 3000L && col("dbl") =!= col("k") * 2).count() == 0)
  }

  test("multi-page fragments align slice pages (one fragment > page size)") {
    val dir = java.nio.file.Files.createTempDirectory("mergec_pg").toString
    val ds = s"$dir/base.lance"
    val n = 150000 // > 2 pages of 64Ki rows in one fragment
    spark.range(n).selectExpr("id AS k", "id * 3 AS w")
      .coalesce(1).write.format("lance").mode("overwrite").save(ds)
    val right = spark.range(n).selectExpr("id AS rk", "id + 7 AS plus7")
    LanceMaintenance.mergeColumns(spark, ds, right, "k", "rk")
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == n)
    assert(back.filter(col("plus7") =!= col("k") + 7L).count() == 0)
    // zone-mapped page pruning on the MERGED column: a narrow range
    // predicate must not lose rows through the slice routing
    assert(back.filter(col("plus7") >= 100000L && col("plus7") < 100010L)
      .count() == 10)
  }

  test("duplicate right keys and existing names are rejected") {
    val ds = freshDs(rows = 100, frags = 1)
    val dup = spark.range(50).union(spark.range(50))
      .selectExpr("id AS rk", "id AS x")
    intercept[IllegalArgumentException] {
      LanceMaintenance.mergeColumns(spark, ds, dup, "k", "rk")
    }
    val clash = spark.range(50).selectExpr("id AS rk", "id AS v")
    intercept[IllegalArgumentException] {
      LanceMaintenance.mergeColumns(spark, ds, clash, "k", "rk")
    }
  }

  test("merged dataset survives compaction and a second merge") {
    val ds = freshDs(rows = 2000, frags = 4)
    val r1 = spark.range(2000).selectExpr("id AS rk", "id % 3 AS a")
    LanceMaintenance.mergeColumns(spark, ds, r1, "k", "rk")
    LanceMaintenance.compact(spark, ds, targetFragments = 2)
    val r2 = spark.range(2000).selectExpr("id AS rk", "id % 5 AS b")
    LanceMaintenance.mergeColumns(spark, ds, r2, "k", "rk")
    val back = spark.read.format("lance").load(ds)
    assert(back.columns.toSeq == Seq("k", "v", "s", "a", "b"))
    assert(back.filter(col("a") =!= col("k") % 3 || col("b") =!= col("k") % 5)
      .count() == 0)
  }
}
