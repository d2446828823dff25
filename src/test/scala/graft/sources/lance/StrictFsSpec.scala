package graft.sources.lance

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write/append/DML round-trips against a NON-`file://` filesystem scheme
  * (the [[StrictFs]] object-store stand-in): every path in the connector
  * that resolves a FileSystem from a path + Hadoop conf must work when
  * the scheme is not the default local one — including from executors,
  * which see the conf only through SerializableConfiguration.
  */
class StrictFsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = graft.TestSpark.spark
    val hc = s.sparkContext.hadoopConfiguration
    hc.set("fs.strictfs.impl", classOf[StrictFs].getName)
    hc.set("fs.AbstractFileSystem.strictfs.impl", classOf[StrictAbstractFs].getName)
    s
  }

  test("lance write / append / delete / vacuum on a strictfs:// dataset") {
    val dir = java.nio.file.Files.createTempDirectory("lance_strictfs")
    val ds = s"strictfs://$dir/ds.lance"

    spark.range(100).selectExpr("id", "CAST(id * 2.0 AS DOUBLE) AS v")
      .coalesce(2).write.format("lance").mode("append").save(ds) // v1
    spark.range(100, 150).selectExpr("id", "CAST(id * 2.0 AS DOUBLE) AS v")
      .coalesce(1).write.format("lance").mode("append").save(ds) // v2
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 150)
    assert(back.filter("v >= 200.0").count() == 50)

    LanceMaintenance.deleteWhere(spark, ds, "id % 10 = 0") // v3
    assert(spark.read.format("lance").load(ds).count() == 135)
    // time travel still works through the scheme
    assert(spark.read.format("lance").option("versionAsOf", 1).load(ds)
      .count() == 100)

    // upsert (staging rename path) through the scheme
    val src = spark.range(140, 160).selectExpr("id", "CAST(id * 5.0 AS DOUBLE) AS v")
    LanceMaintenance.mergeInsert(spark, ds, src, Seq("id")) // v4
    val merged = spark.read.format("lance").load(ds)
    assert(merged.filter("id = 145").head.getDouble(1) == 725.0)
    assert(merged.filter("id >= 150").count() == 10)

    // vacuum sweeps dropped-version files through the scheme
    val (dropped, removed) = LanceMaintenance.vacuum(spark, ds,
      keepVersions = 1, olderThanMs = 0)
    assert(dropped == 3 && removed >= 0)
    assert(spark.read.format("lance").load(ds).count() == merged.count())
  }

  test("strictfs refuses rename-onto-existing (the semantics under test)") {
    val dir = java.nio.file.Files.createTempDirectory("strictfs_sem")
    val conf = spark.sessionState.newHadoopConf()
    val (fs, _) = LanceFormat.fileSystem(s"strictfs://$dir/x", conf)
    val a = new org.apache.hadoop.fs.Path(s"strictfs://$dir/a")
    val b = new org.apache.hadoop.fs.Path(s"strictfs://$dir/b")
    val o1 = fs.create(a, true); o1.write(1); o1.close()
    val o2 = fs.create(b, true); o2.write(2); o2.close()
    assert(!fs.rename(a, b), "strictfs must refuse clobbering renames")
  }
}
