package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.2 misc-scalar tail (excluded from the hash contract —
  * engine-specific output spellings): `typeof`, `uuid`, and the
  * settings-introspection surface (DuckDB `current_setting` ≡ Spark's
  * `current_timezone()`/`current_catalog()`/`current_database()`
  * built-ins for the settings users actually read). */
class MiscScalarsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typeof reports runtime types (Spark 4 builtin)") {
    val r = spark.sql("""
      SELECT typeof(1) AS t_int, typeof(1L) AS t_long,
             typeof(CAST(1.5 AS DOUBLE)) AS t_dbl, typeof('x') AS t_str,
             typeof(DATE '2026-01-01') AS t_date,
             typeof(array(1, 2)) AS t_arr,
             typeof(named_struct('a', 1)) AS t_struct""").head()
    assert(r.getString(0) == "int" && r.getString(1) == "bigint")
    assert(r.getString(2) == "double" && r.getString(3) == "string")
    assert(r.getString(4) == "date")
    assert(r.getString(5) == "array<int>")
    assert(r.getString(6) == "struct<a:int>")
  }

  test("uuid() is RFC-4122-shaped and unique per row") {
    val ids = spark.range(500).selectExpr("uuid() AS u").as[String].collect()
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    assert(ids.forall(u => re.matches(u)), s"bad uuid shape: ${ids.take(3).mkString(",")}")
    assert(ids.distinct.length == ids.length, "uuid() repeated a value")
  }

  test("settings introspection (current_setting analogues)") {
    val r = spark.sql(
      "SELECT current_timezone() AS tz, current_catalog() AS cat, " +
      "current_database() AS db").head()
    assert(r.getString(0) == spark.conf.get("spark.sql.session.timeZone"))
    assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
  }
}
