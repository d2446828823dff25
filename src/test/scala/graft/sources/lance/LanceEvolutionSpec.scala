package graft.sources.lance

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution: add / rename / drop column as manifest-only commits.
  * Old fragments null-fill added columns on read; appends after evolution
  * keep the committed (non-positional) field ids; every step is a new
  * version so time travel sees each schema.
  */
class LanceEvolutionSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpDs(): String = {
    val f = java.nio.file.Files.createTempDirectory("lance_evo").toFile
    f.delete()
    f.getAbsolutePath + "/ds.lance"
  }

  private def seed(ds: String, n: Int): Unit =
    spark.range(n).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
        "concat('tag_', id % 3) AS tag")
      .coalesce(2).write.format("lance").mode("append").save(ds)

  test("addColumn null-fills old fragments; appends fill new ones") {
    val ds = tmpDs()
    seed(ds, 100)
    LanceMaintenance.addColumn(spark, ds, "score", DoubleType)
    val after = spark.read.format("lance").load(ds)
    assert(after.schema.fieldNames.toSeq == Seq("id", "v", "tag", "score"))
    assert(after.count() == 100)
    assert(after.filter(col("score").isNull).count() == 100)
    // mixed projections across old fragments work
    assert(after.select("id", "score").filter("id < 10 AND score IS NULL").count() == 10)

    // append rows WITH the new column: old fragments stay null, new ones real
    spark.range(100, 150).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
        "concat('tag_', id % 3) AS tag", "CAST(id AS DOUBLE) / 10 AS score")
      .coalesce(1).write.format("lance").mode("append").save(ds)
    val mixed = spark.read.format("lance").load(ds)
    assert(mixed.count() == 150)
    assert(mixed.filter(col("score").isNull).count() == 100)
    assert(mixed.filter("score >= 10.0").count() == 50)
    assert(mixed.filter("id = 120").head.getDouble(3) == 12.0)
  }

  test("renameColumn keeps data; dropColumn hides it; history keeps both") {
    val ds = tmpDs()
    seed(ds, 60)
    val v1 = 1L
    val v2 = LanceMaintenance.renameColumn(spark, ds, "v", "value")
    val renamed = spark.read.format("lance").load(ds)
    assert(renamed.schema.fieldNames.toSeq == Seq("id", "value", "tag"))
    assert(renamed.agg(sum("value")).head.getDouble(0) == (0 until 60).map(_ * 2.5).sum)

    val v3 = LanceMaintenance.dropColumn(spark, ds, "tag")
    val dropped = spark.read.format("lance").load(ds)
    assert(dropped.schema.fieldNames.toSeq == Seq("id", "value"))
    assert(dropped.count() == 60)

    // time travel: each schema state still reads
    val orig = spark.read.format("lance").option("versionAsOf", v1).load(ds)
    assert(orig.schema.fieldNames.toSeq == Seq("id", "v", "tag"))
    assert(orig.filter("tag = 'tag_1'").count() == 20)
    val mid = spark.read.format("lance").option("versionAsOf", v2).load(ds)
    assert(mid.schema.fieldNames.toSeq == Seq("id", "value", "tag"))
    assert(v3 == v2 + 1)
  }

  test("append after drop keeps committed field ids (no column remap)") {
    val ds = tmpDs()
    seed(ds, 40)
    LanceMaintenance.dropColumn(spark, ds, "v") // ids now 0, 2 (hole at 1)
    spark.range(40, 60).selectExpr("id", "concat('tag_', id % 3) AS tag")
      .coalesce(1).write.format("lance").mode("append").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 60)
    // tag values from BOTH old (id 3) and new (id resolved via prev ids)
    // fragments decode as strings, not as the dropped double column
    assert(back.filter("tag = 'tag_0'").count() ==
      (0 until 60).count(_ % 3 == 0))
    assert(back.filter("id >= 40").select("tag").distinct().count() == 3)
    // and old versions still see the dropped column
    val v1 = spark.read.format("lance").option("versionAsOf", 1).load(ds)
    assert(v1.schema.fieldNames.contains("v"))
    assert(v1.agg(sum("v")).head.getDouble(0) == (0 until 40).map(_ * 2.5).sum)
  }

  test("evolution composes with deletes and mergeInsert") {
    val ds = tmpDs()
    seed(ds, 80)
    LanceMaintenance.addColumn(spark, ds, "rank", LongType)
    LanceMaintenance.deleteWhere(spark, ds, "id % 4 = 0")
    val src = spark.range(70, 90).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
      "concat('tag_', id % 3) AS tag", "id * 100 AS rank")
    LanceMaintenance.mergeInsert(spark, ds, src, Seq("id"))
    val back = spark.read.format("lance").load(ds)
    // 80 - 20 deleted = 60; ids 70..79 live ones replaced; 70,72,..78 were
    // deleted but re-inserted by the merge; +10 new (80..89)
    val expectIds = ((0 until 70).filter(_ % 4 != 0) ++ (70 until 90)).map(_.toLong).toSet
    assert(back.select("id").collect().map(_.getLong(0)).toSet == expectIds)
    assert(back.filter("rank IS NOT NULL").count() == 20)
    assert(back.filter("id = 85").head.getLong(3) == 8500L)
  }

  test("restore re-commits an old version as the new head") {
    val ds = tmpDs()
    seed(ds, 100) // v1
    spark.range(100, 150).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
        "concat('tag_', id % 3) AS tag")
      .write.format("lance").mode("append").save(ds) // v2
    LanceMaintenance.deleteWhere(spark, ds, "id < 10") // v3
    assert(spark.read.format("lance").load(ds).count() == 140)

    val head = LanceMaintenance.restore(spark, ds, 1L)
    assert(head == 4L)
    val restored = spark.read.format("lance").load(ds)
    assert(restored.count() == 100) // appended rows gone, deletes reverted
    assert(restored.agg(sum("id")).head().getLong(0) == 99L * 100 / 2)
    // intermediate history still time-travels
    assert(spark.read.format("lance").option("versionAsOf", 3).load(ds)
      .count() == 140)
    // appends on the restored head keep working, ids self-consistent
    spark.range(500, 510).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
        "concat('tag_', id % 3) AS tag")
      .write.format("lance").mode("append").save(ds)
    assert(spark.read.format("lance").load(ds).count() == 110)
    // restoring the current head is a no-op
    assert(LanceMaintenance.restore(spark, ds, 5L) == 5L)
  }

  test("tags pin versions by name and resolve through tagAsOf") {
    val ds = tmpDs()
    seed(ds, 50)
    val v1 = LanceMaintenance.createTag(spark, ds, "baseline")
    spark.range(50, 90).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
        "concat('tag_', id % 3) AS tag")
      .coalesce(1).write.format("lance").mode("append").save(ds)
    val v2 = LanceMaintenance.createTag(spark, ds, "with-extra")
    assert(v2 == v1 + 1)
    assert(LanceMaintenance.listTags(spark, ds) ==
      Map("baseline" -> v1, "with-extra" -> v2))

    assert(spark.read.format("lance").option("tagAsOf", "baseline").load(ds)
      .count() == 50)
    assert(spark.read.format("lance").option("tagAsOf", "with-extra").load(ds)
      .count() == 90)
    assert(spark.read.format("lance").load(ds).count() == 90)
    // duplicate tag rejected; unknown tag errors clearly
    intercept[Exception](LanceMaintenance.createTag(spark, ds, "baseline"))
    intercept[Exception](
      spark.read.format("lance").option("tagAsOf", "nope").load(ds).count())
    assert(LanceMaintenance.deleteTag(spark, ds, "baseline"))
    assert(LanceMaintenance.listTags(spark, ds) == Map("with-extra" -> v2))
  }

  test("fromVersion reads only rows appended after a version (batch CDC)") {
    val ds = tmpDs()
    spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v", "'a' AS tag")
      .coalesce(1).write.format("lance").mode("append").save(ds) // v1
    spark.range(10, 15).selectExpr("id", "CAST(id AS DOUBLE) AS v", "'b' AS tag")
      .coalesce(1).write.format("lance").mode("append").save(ds) // v2
    spark.range(15, 22).selectExpr("id", "CAST(id AS DOUBLE) AS v", "'c' AS tag")
      .coalesce(1).write.format("lance").mode("append").save(ds) // v3

    def from(v: Long) =
      spark.read.format("lance").option("fromVersion", v).load(ds)
    assert(from(1).count() == 12)
    assert(from(2).count() == 7)
    assert(from(2).select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("c"))
    assert(from(3).count() == 0)
    // windowed: appended in (1, 2]
    assert(spark.read.format("lance")
      .option("fromVersion", 1).option("versionAsOf", 2).load(ds).count() == 5)
    // deletes on new fragments are honored
    LanceMaintenance.deleteWhere(spark, ds, "id >= 20") // v4
    assert(from(2).count() == 5)
    // compaction rewrites history -> incremental read refuses
    LanceMaintenance.compact(spark, ds)
    val e = intercept[Exception](from(2).count())
    assert(e.getMessage.contains("overwritten or compacted") ||
           e.getCause != null && e.getCause.getMessage.contains("overwritten or compacted"))
  }

  test("vacuum drops old versions but keeps tagged ones and live files") {
    val ds = tmpDs()
    seed(ds, 30) // v1
    LanceMaintenance.createTag(spark, ds, "keepme") // pins v1
    spark.range(30, 60).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
        "concat('tag_', id % 3) AS tag")
      .coalesce(1).write.format("lance").mode("append").save(ds) // v2
    LanceMaintenance.deleteWhere(spark, ds, "id < 5") // v3
    LanceMaintenance.compact(spark, ds) // v4 rewrites data files

    val (droppedVersions, removedFiles) =
      LanceMaintenance.vacuum(spark, ds, keepVersions = 1, olderThanMs = 0)
    assert(droppedVersions == 2) // v2, v3 gone; v1 tagged, v4 latest
    assert(removedFiles > 0)
    // latest and the tagged version still read correctly
    assert(spark.read.format("lance").load(ds).count() == 55)
    assert(spark.read.format("lance").option("tagAsOf", "keepme").load(ds)
      .count() == 30)
    // vacuumed versions are gone
    intercept[Exception](
      spark.read.format("lance").option("versionAsOf", 2).load(ds).count())
    // dropping the tag frees v1 on the next vacuum
    LanceMaintenance.deleteTag(spark, ds, "keepme")
    val (d2, _) = LanceMaintenance.vacuum(spark, ds, keepVersions = 1, olderThanMs = 0)
    assert(d2 == 1)
    assert(spark.read.format("lance").load(ds).count() == 55)
  }

  test("vacuum age threshold protects young unreferenced files") {
    val ds = tmpDs()
    seed(ds, 30) // v1
    LanceMaintenance.compact(spark, ds) // v2 rewrites data files -> v1's unreferenced
    // default-style cutoff: everything here is seconds old, nothing swept
    val (d1, r1) = LanceMaintenance.vacuum(spark, ds, keepVersions = 1,
      olderThanMs = 3600000L)
    assert(d1 == 1 && r1 == 0) // manifest dropped, data files protected
    assert(spark.read.format("lance").load(ds).count() == 30)
    // zero cutoff sweeps the now-unreferenced files
    val (_, r2) = LanceMaintenance.vacuum(spark, ds, keepVersions = 1, olderThanMs = 0)
    assert(r2 > 0)
    assert(spark.read.format("lance").load(ds).count() == 30)
  }

  test("vacuum racing concurrent appends never breaks a committed version") {
    val ds = tmpDs()
    seed(ds, 20)
    // appender and vacuumer race; the age threshold keeps in-flight
    // (durable-but-uncommitted) fragment files safe
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try {
        (0 until 6).foreach { i =>
          spark.range(100 + i * 10, 110 + i * 10)
            .selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v",
              "concat('tag_', id % 3) AS tag")
            .coalesce(1).write.format("lance").mode("append").save(ds)
        }
      } catch { case t: Throwable => errs.add(t) }
    })
    val vacuumer = new Thread(() => {
      try {
        (0 until 6).foreach { _ =>
          LanceMaintenance.vacuum(spark, ds, keepVersions = 1)
          Thread.sleep(5)
        }
      } catch { case t: Throwable => errs.add(t) }
    })
    appender.start(); vacuumer.start()
    appender.join(120000); vacuumer.join(120000)
    assert(errs.isEmpty, s"concurrent append/vacuum failed: ${errs.peek()}")
    // every surviving version reads cleanly and the latest has all rows
    assert(spark.read.format("lance").load(ds).count() == 20 + 60)
  }

  test("fragment stats after dropColumn+append prune by the right column") {
    val ds = tmpDs()
    seed(ds, 40) // columns (id, v, tag); v = id * 2.5 in [0, 97.5]
    LanceMaintenance.dropColumn(spark, ds, "id") // committed ids: v=1, tag=2
    // append a fragment whose v range is disjoint from the seed's: if its
    // stats were written under POSITIONAL ids (v->0, tag->1), the v filter
    // would read tag's string-prefix bits as v's min/max and silently
    // skip this fragment
    spark.range(1000, 1020).selectExpr("CAST(id AS DOUBLE) AS v",
        "concat('tag_', id % 3) AS tag")
      .coalesce(1).write.format("lance").mode("append").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 60)
    assert(back.filter("v >= 1000.0").count() == 20)
    assert(back.filter("v < 100.0").count() == 40)
    // bounded predicates are the decisive ones: tag's prefix bits read as
    // a double are astronomically large, so a misskeyed fragment would be
    // pruned for any finite upper bound
    assert(back.filter("v = 1005.0").count() == 1)
    assert(back.filter("v BETWEEN 1000.0 AND 1009.0").count() == 10)
    assert(back.filter("tag = 'tag_1'").count() ==
      (0 until 40).count(_ % 3 == 1) + (1000 until 1020).count(_ % 3 == 1))
  }

  test("nested evolution: add/rename/drop a struct sub-field") {
    val ds = tmpDs()
    spark.range(40).selectExpr("id",
        "named_struct('mime', concat('t/', id % 2), 'n', id * 3) AS meta")
      .coalesce(2).write.format("lance").mode("append").save(ds)

    // ADD meta.note: old fragments null-fill the new leaf
    LanceMaintenance.addColumn(spark, ds, "meta.note", StringType)
    val added = spark.read.format("lance").load(ds)
    assert(added.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("mime", "n", "note"))
    assert(added.filter("meta.note IS NULL").count() == 40)
    assert(added.filter("meta.n = 9").count() == 1)

    // append WITH the new sub-field: path-keyed id matching must route
    // the nested columns to their committed (non-DFS) ids
    spark.range(40, 50).selectExpr("id",
        "named_struct('mime', concat('t/', id % 2), 'n', id * 3, " +
        "'note', concat('note_', id)) AS meta")
      .coalesce(1).write.format("lance").mode("append").save(ds)
    val mixed = spark.read.format("lance").load(ds)
    assert(mixed.count() == 50)
    assert(mixed.filter("meta.note IS NOT NULL").count() == 10)
    assert(mixed.filter("id = 45").select("meta.note").head.getString(0) == "note_45")
    assert(mixed.filter("id = 45").select("meta.n").head.getLong(0) == 135)
    assert(mixed.filter("meta.mime = 't/1'").count() == 25)

    // RENAME meta.n -> meta.count (ids unchanged, both fragment eras read)
    LanceMaintenance.renameColumn(spark, ds, "meta.n", "count")
    val renamed = spark.read.format("lance").load(ds)
    assert(renamed.filter("meta.count = 135").count() == 1)

    // DROP meta.note: hidden from the current version, history intact
    val vBeforeDrop = LanceMaintenance.dropColumn(spark, ds, "meta.note") - 1
    val dropped = spark.read.format("lance").load(ds)
    assert(dropped.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("mime", "count"))
    assert(spark.read.format("lance").option("versionAsOf", vBeforeDrop).load(ds)
      .filter("meta.note IS NOT NULL").count() == 10)

    // guardrails: last struct field, non-struct path step
    LanceMaintenance.dropColumn(spark, ds, "meta.mime")
    intercept[Exception](LanceMaintenance.dropColumn(spark, ds, "meta.count"))
    intercept[Exception](LanceMaintenance.addColumn(spark, ds, "id.sub", LongType))
  }

  test("nested evolution through SQL ALTER TABLE") {
    val ds = tmpDs()
    spark.range(20).selectExpr("id",
        "named_struct('a', id, 'b', CAST(id AS DOUBLE)) AS s")
      .coalesce(1).write.format("lance").mode("append").save(ds)
    spark.sql(s"ALTER TABLE lance.`$ds` ADD COLUMN s.tag STRING")
    spark.sql(s"ALTER TABLE lance.`$ds` RENAME COLUMN s.a TO a2")
    spark.sql(s"ALTER TABLE lance.`$ds` DROP COLUMN s.b")
    val back = spark.read.format("lance").load(ds)
    assert(back.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("a2", "tag"))
    assert(back.filter("s.a2 = 7").count() == 1)
    assert(back.filter("s.tag IS NULL").count() == 20)
  }

  test("SQL ALTER TABLE through the lance catalog") {
    val ds = tmpDs()
    seed(ds, 30)
    spark.sql(s"ALTER TABLE lance.`$ds` ADD COLUMN note STRING")
    spark.sql(s"ALTER TABLE lance.`$ds` RENAME COLUMN tag TO label")
    spark.sql(s"ALTER TABLE lance.`$ds` DROP COLUMN v")
    val back = spark.read.format("lance").load(ds)
    assert(back.schema.fieldNames.toSeq == Seq("id", "label", "note"))
    assert(back.filter(col("note").isNull).count() == 30)
    assert(back.filter("label = 'tag_2'").count() == 10)
  }
}
