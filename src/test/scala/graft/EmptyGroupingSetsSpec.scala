package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** StandardEmptyGroupingSets: the SQL-standard grand-total row for the
  * empty grouping set over empty input (fuzzer-found divergence vs
  * DuckDB/PostgreSQL; Spark natively returns 0 rows).
  */
class EmptyGroupingSetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def setup(): Unit = {
    import spark.implicits._
    Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3))
      .toDF("k1", "k2", "v").createOrReplaceTempView("egs")
  }

  test("ROLLUP over empty input emits the grand-total row") {
    setup()
    val rows = spark.sql(
      """SELECT CAST(GROUPING(k1) AS INT) g1, CAST(GROUPING(k2) AS INT) g2,
        |       k1, k2, COUNT(*) n, SUM(v) s, MIN(k1) mn
        |FROM egs WHERE v > 100 GROUP BY ROLLUP(k1, k2)""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row(1, 1, null, null, 0L, null, null)))
  }

  test("CUBE over empty input emits exactly one grand-total row") {
    setup()
    val rows = spark.sql(
      """SELECT CAST(GROUPING(k1) AS INT) g1, k1, COUNT(*) n
        |FROM egs WHERE 1 = 0 GROUP BY CUBE(k1)""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row(1, null, 0L)))
  }

  test("GROUPING SETS without () over empty input stays empty") {
    setup()
    val rows = spark.sql(
      """SELECT k1, COUNT(*) n FROM egs WHERE v > 100
        |GROUP BY GROUPING SETS ((k1))""".stripMargin).collect()
    assert(rows.isEmpty)
  }

  test("GROUPING SETS listing () twice over empty input emits two rows") {
    setup()
    val rows = spark.sql(
      """SELECT k1, COUNT(*) n FROM egs WHERE v > 100
        |GROUP BY GROUPING SETS ((k1), (), ())""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row(null, 0L), Row(null, 0L)))
  }

  test("non-empty input results are unchanged (rollup still exact)") {
    setup()
    val rows = spark.sql(
      """SELECT CAST(GROUPING(k1) AS INT) g1, k1, COUNT(*) n, SUM(v) s
        |FROM egs GROUP BY ROLLUP(k1)
        |ORDER BY g1, k1""".stripMargin).collect()
    assert(rows.toSeq == Seq(
      Row(0, "a", 2L, 3L), Row(0, "b", 1L, 3L), Row(1, null, 3L, 6L)))
  }

  test("HAVING applies to the synthesized grand-total row too") {
    setup()
    val rows = spark.sql(
      """SELECT k1, COUNT(*) n FROM egs WHERE v > 100
        |GROUP BY ROLLUP(k1) HAVING COUNT(*) > 0""".stripMargin).collect()
    assert(rows.isEmpty)
  }
}
