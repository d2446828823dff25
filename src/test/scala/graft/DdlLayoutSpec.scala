package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CREATE TABLE ... PARTITIONED BY transforms become the lance table's
  * declared layout, and catalog INSERTs inherit it — the table-contract
  * behavior (the plain `spark.read.format("lance")` path stays low-level
  * and degrades, pinned by the layout suites). */
class DdlLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-ddl").toString + s"/$name.lance"

  private def manifest(ds: String) = {
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
  }

  test("CTAS with identity partitioning; INSERT INTO keeps the layout") {
    val ds = tmp("ident")
    (1 to 40).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp")
      .createOrReplaceTempView("ddl_src")
    spark.sql(s"CREATE TABLE lance.`$ds` PARTITIONED BY (grp) " +
      "AS SELECT * FROM ddl_src")
    val m1 = manifest(ds)
    assert(m1.partitionCols == Seq("grp"))
    assert(m1.fragments.forall(_.partValues.length == 1))
    spark.sql(s"INSERT INTO lance.`$ds` VALUES (100, 'g9')")
    val m2 = manifest(ds)
    assert(m2.partitionCols == Seq("grp"))
    assert(m2.fragments.forall(_.partValues.length == 1),
      "INSERT INTO must keep every fragment partition-valued")
    assert(spark.sql(s"CALL lance.describe('$ds')")
      .select("partitioning_reportable").as[Boolean].head())
    assert(spark.read.format("lance").load(ds).count() == 41)
  }

  test("CTAS with days(ts) transform; inserts land day-valued") {
    val ds = tmp("days")
    (0 until 60).map { i =>
      (new java.sql.Timestamp(i.toLong * 7200L * 1000L), i.toLong)
    }.toDF("ts", "v").createOrReplaceTempView("ddl_ts_src")
    spark.sql(s"CREATE TABLE lance.`$ds` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM ddl_ts_src")
    val m1 = manifest(ds)
    assert(m1.partitionCols == Seq("days(ts)"))
    assert(m1.fragments.map(_.partValues.head.toInt).toSet == (0 until 5).toSet)
    spark.sql(s"INSERT INTO lance.`$ds` SELECT CAST('1970-01-09 01:00:00' " +
      "AS TIMESTAMP), 999")
    val m2 = manifest(ds)
    assert(m2.partitionCols == Seq("days(ts)"))
    assert(m2.fragments.map(_.partValues.head.toInt).toSet ==
      ((0 until 5).toSet + 8))
  }

  test("CREATE TABLE with bucket(8, k); INSERT keeps the bucket spec") {
    val ds = tmp("bkt")
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("ddl_bkt_src")
    spark.sql(s"CREATE TABLE lance.`$ds` PARTITIONED BY (bucket(8, k)) " +
      "AS SELECT * FROM ddl_bkt_src")
    val m1 = manifest(ds)
    assert(m1.partitionCols == Seq("bucket(8,k)"))
    spark.sql(s"INSERT INTO lance.`$ds` VALUES (9999, 'new')")
    val m2 = manifest(ds)
    assert(m2.partitionCols == Seq("bucket(8,k)"))
    assert(m2.fragments.forall(_.partValues.length == 1))
    assert(spark.read.format("lance").load(ds).count() == 101)
  }

  test("explicit write options beat the inherited layout") {
    val ds = tmp("override")
    (1 to 20).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp")
      .write.format("lance").option("partitionBy", "grp")
      .mode("overwrite").save(ds)
    // a catalog CTAS-less insert path with explicit sortBy only: the
    // declared layout applies to partitioning, the explicit option wins
    // where given — here overwrite WITHOUT any layout clears it
    (1 to 5).map(i => (i.toLong, "z")).toDF("id", "grp")
      .write.format("lance").mode("overwrite").save(ds)
    assert(manifest(ds).partitionCols.isEmpty)
  }
}
