package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nested struct-field pruning on the lance scan: selecting one subfield
  * must not read its siblings' byte ranges (struct subfields are separate
  * physical columns), values and schema must stay exact, and the whole
  * scan must keep working when Spark does NOT prune. */
class NestedPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDs(): String = {
    val ds = java.nio.file.Files.createTempDirectory("graft-nested").toString + "/t.lance"
    // meta.big is ~200 bytes/row; meta.small is an int
    (1 to 5000).map(i => (i.toLong, s"k$i", i * 3, "x" * 200))
      .toDF("id", "k", "small0", "big0")
      .select(col("id"),
        struct(col("k").as("tag"), col("small0").as("small"),
               col("big0").as("big")).as("meta"))
      .coalesce(1).write.format("lance").mode("overwrite").save(ds)
    ds
  }

  test("subfield projection reads a fraction of the full struct's bytes, values exact") {
    val ds = mkDs()
    def run(cols: String*): (Long, Seq[org.apache.spark.sql.Row]) = {
      val before = graft.sources.lance.LanceDataSource.bytesRead.sum()
      val rows = spark.read.format("lance").load(ds)
        .selectExpr(cols: _*).orderBy(cols.head.split("\\.").last).collect().toSeq
      (graft.sources.lance.LanceDataSource.bytesRead.sum() - before, rows)
    }
    val (prunedBytes, prunedRows) = run("meta.small")
    val (fullBytes, fullRows) = run("meta.small", "meta.big")
    assert(prunedRows.map(_.getInt(0)) == fullRows.map(_.getInt(0)))
    assert(prunedRows.map(_.getInt(0)).sorted.take(3) == Seq(3, 6, 9))
    assert(prunedBytes * 5 < fullBytes,
      s"pruned scan read $prunedBytes vs full $fullBytes — big subfield not skipped")
  }

  test("full struct read is unchanged; pruned and full values agree") {
    val ds = mkDs()
    val full = spark.read.format("lance").load(ds)
      .select("id", "meta").orderBy("id").collect()
    assert(full.length == 5000)
    val m = full.head.getStruct(1)
    assert(m.schema.fieldNames.toSeq == Seq("tag", "small", "big"))
    assert(m.getString(0) == "k1" && m.getInt(1) == 3)
    // mixed access: one query touching a pruned subfield and the id
    val mixed = spark.read.format("lance").load(ds)
      .select(col("id"), col("meta.tag")).filter(col("id") <= 3)
      .orderBy("id").collect()
    assert(mixed.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "k1"), (2L, "k2"), (3L, "k3")))
  }

  test("aggregation over one subfield matches the unpruned computation") {
    val ds = mkDs()
    val viaPruned = spark.read.format("lance").load(ds)
      .agg(sum(col("meta.small"))).as[Long].head()
    val viaFull = spark.read.format("lance").load(ds)
      .select(col("meta")).agg(sum(col("meta.small"))).as[Long].head()
    assert(viaPruned == (1 to 5000).map(_ * 3L).sum)
    assert(viaPruned == viaFull)
  }
}
