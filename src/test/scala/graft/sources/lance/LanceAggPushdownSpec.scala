package graft.sources.lance

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-only aggregate pushdown: COUNT(*) / MIN / MAX answered from
  * fragment metadata — no data file is opened (bytesRead delta 0). The
  * 100 TB story: a table count costs one manifest read, not a scan.
  */
class LanceAggPushdownSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpDs(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.delete()
    f.getAbsolutePath + "/ds.lance"
  }

  private def write(ds: String, n: Int, parts: Int): Unit =
    spark.range(n).selectExpr("id", "id % 7 AS grp",
        "CAST(id AS DOUBLE) AS v", "CONCAT('s', id) AS s")
      .repartition(parts)
      .write.format("lance").mode("overwrite").save(ds)

  test("count(*) is answered from the manifest without opening data files") {
    val ds = tmpDs("lance_aggpd_cnt")
    write(ds, 100000, 8)
    val df = spark.read.format("lance").load(ds)
    val before = LanceDataSource.bytesRead.sum()
    val n = df.count()
    val after = LanceDataSource.bytesRead.sum()
    assert(n == 100000)
    assert(after == before, s"count read ${after - before} data bytes")
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(plan.contains("LanceManifestAggScan"), plan)
  }

  test("count(*) stays exact (and pushed) under deletions") {
    val ds = tmpDs("lance_aggpd_del")
    write(ds, 10000, 4)
    LanceMaintenance.deleteWhere(spark, ds, "grp IN (1, 3)")
    val df = spark.read.format("lance").load(ds)
    val expected = (0 until 10000).count(i => i % 7 != 1 && i % 7 != 3)
    val before = LanceDataSource.bytesRead.sum()
    assert(df.count() == expected)
    assert(LanceDataSource.bytesRead.sum() == before)
  }

  test("min/max over integral columns come from fragment stats") {
    val ds = tmpDs("lance_aggpd_mm")
    write(ds, 50000, 8)
    val df = spark.read.format("lance").load(ds)
    val before = LanceDataSource.bytesRead.sum()
    val row = df.agg(min("id"), max("id"), count(lit(1))).head()
    assert(LanceDataSource.bytesRead.sum() == before)
    assert(row.getLong(0) == 0 && row.getLong(1) == 49999 && row.getLong(2) == 50000)
    val plan = df.agg(min("id"), max("id")).queryExecution.executedPlan.toString
    assert(plan.contains("LanceManifestAggScan"), plan)
  }

  test("min/max fall back to a real scan when deletions exist — still exact") {
    val ds = tmpDs("lance_aggpd_mmdel")
    write(ds, 10000, 4)
    LanceMaintenance.deleteWhere(spark, ds, "id < 100 OR id >= 9900")
    val df = spark.read.format("lance").load(ds)
    val row = df.agg(min("id"), max("id")).head()
    assert(row.getLong(0) == 100 && row.getLong(1) == 9899)
    val plan = df.agg(min("id"), max("id")).queryExecution.executedPlan.toString
    assert(!plan.contains("LanceManifestAggScan"), plan)
  }

  test("string and double min/max are not pushed (prefix/NaN hazards)") {
    val ds = tmpDs("lance_aggpd_str")
    write(ds, 1000, 2)
    val df = spark.read.format("lance").load(ds)
    assert(!df.agg(min("s")).queryExecution.executedPlan.toString
      .contains("LanceManifestAggScan"))
    assert(!df.agg(min("v")).queryExecution.executedPlan.toString
      .contains("LanceManifestAggScan"))
    assert(df.agg(min("s")).head().getString(0) == "s0")
  }

  test("aggregates under a WHERE are not pushed — still exact") {
    val ds = tmpDs("lance_aggpd_where")
    write(ds, 10000, 4)
    val df = spark.read.format("lance").load(ds)
    val row = df.filter("grp = 3").agg(count(lit(1)), max("id")).head()
    assert(row.getLong(0) == (0 until 10000).count(_ % 7 == 3))
    assert(row.getLong(1) == (0 until 10000).filter(_ % 7 == 3).max)
    val plan = df.filter("grp = 3").agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LanceManifestAggScan"), plan)
  }

  test("grouped aggregates on a NON-partitioned dataset are not pushed — still exact") {
    val ds = tmpDs("lance_aggpd_grp")
    write(ds, 7000, 4)
    val df = spark.read.format("lance").load(ds)
    val q = df.groupBy("grp").count().orderBy("grp")
    assert(!q.queryExecution.executedPlan.toString.contains("LanceManifestAggScan"))
    val rows = q.collect()
    assert(rows.length == 7 && rows.forall(_.getLong(1) == 1000))
  }

  test("GROUP BY partition columns is answered entirely from the manifest") {
    val ds = tmpDs("lance_aggpd_part")
    spark.range(7000).selectExpr("id", "id % 7 AS grp",
        "CONCAT('g', id % 5) AS tag", "CAST(id AS DOUBLE) AS v")
      .write.format("lance").option("partitionBy", "grp")
      .mode("overwrite").save(ds)
    val df = spark.read.format("lance").load(ds)
    val q = df.groupBy("grp").agg(count(lit(1)).as("n"),
                                  min("id").as("lo"), max("id").as("hi"))
      .orderBy("grp")
    val before = LanceDataSource.bytesRead.sum()
    val rows = q.collect()
    assert(LanceDataSource.bytesRead.sum() == before,
      "grouped manifest aggregate must not open data files")
    assert(q.queryExecution.executedPlan.toString.contains("LanceManifestAggScan"))
    assert(rows.length == 7)
    rows.foreach { r =>
      val g = r.getLong(0)
      assert(r.getLong(1) == 1000)
      assert(r.getLong(2) == g)           // min id of id%7==g is g
      assert(r.getLong(3) == 6993 + g)    // max is 6993+g
    }
    // a group whose rows are ALL deleted disappears (COUNT stays pushed);
    // min/max fall back to a scan under deletions but stay exact
    graft.sources.lance.LanceMaintenance.deleteWhere(spark, ds, "grp = 3")
    val df2 = spark.read.format("lance").load(ds)
    val counts = df2.groupBy("grp").count().orderBy("grp").collect()
    assert(counts.length == 6 && !counts.map(_.getLong(0)).contains(3L))
    val mm = df2.groupBy("grp").agg(min("id")).orderBy("grp").collect()
    assert(mm.length == 6 && mm.forall(r => r.getLong(1) == r.getLong(0)))
  }

  test("GROUP BY a non-partition column of a partitioned dataset is not pushed") {
    val ds = tmpDs("lance_aggpd_part2")
    spark.range(1000).selectExpr("id", "id % 7 AS grp", "CONCAT('g', id % 5) AS tag")
      .write.format("lance").option("partitionBy", "grp")
      .mode("overwrite").save(ds)
    val q = spark.read.format("lance").load(ds).groupBy("tag").count().orderBy("tag")
    assert(!q.queryExecution.executedPlan.toString.contains("LanceManifestAggScan"))
    assert(q.collect().forall(_.getLong(1) == 200))
  }

  test("count(*) respects time travel (versionAsOf)") {
    val ds = tmpDs("lance_aggpd_tt")
    write(ds, 1000, 2)
    spark.range(500).selectExpr("id + 10000 AS id", "id % 7 AS grp",
        "CAST(id AS DOUBLE) AS v", "CONCAT('t', id) AS s")
      .write.format("lance").mode("append").save(ds)
    val v1 = spark.read.format("lance").option("versionAsOf", 1).load(ds)
    assert(v1.count() == 1000)
    assert(spark.read.format("lance").load(ds).count() == 1500)
  }
}
