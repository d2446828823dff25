package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Built-in source/sink coverage beyond parquet (SURVEY §2.2 "Parquet/CSV/
  * JSON scan ✅ built-in" and "COPY TO parquet/csv ✅"): round-trips
  * through Spark's csv/json writers and readers. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-src").toString

  test("csv round-trip preserves values (header + explicit schema)") {
    val dir = tmp() + "/region.csv"
    val src = Tables.load(spark, TestSpark.sfDir, "region")
    src.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("json round-trip preserves values") {
    val dir = tmp() + "/orders.json"
    val src = Tables.load(spark, TestSpark.sfDir, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast("string")) // json has no timestamp type
    src.write.json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("parquet write round-trip (COPY TO parquet parity)") {
    val dir = tmp() + "/li.parquet"
    val src = Tables.load(spark, TestSpark.sfDir, "lineitem").limit(1000)
    src.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
