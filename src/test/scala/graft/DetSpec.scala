package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Det

/** Pins the bit-for-bit equality of [[Det.dsum]]'s fast fixed-point
  * interior (two codegen long sums) against [[Det.dsumWide]]'s per-row
  * DECIMAL(38,6) interior — the spelling the DuckDB oracle evaluates.
  * Equality here is what keeps every hash-matched aggregate query green
  * after the fast-path swap; see the proof sketch in Det's scaladoc.
  */
class DetSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def li = s.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")

  /** Bitwise double equality (also treats two nulls as equal). */
  private def assertSame(fast: org.apache.spark.sql.DataFrame,
                         wide: org.apache.spark.sql.DataFrame): Unit = {
    val f = fast.collect()
    val w = wide.collect()
    assert(f.length == w.length)
    f.zip(w).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        val (x, y) = (a.get(i), b.get(i))
        (x, y) match {
          case (null, null) => ()
          case (d1: java.lang.Double, d2: java.lang.Double) =>
            assert(java.lang.Double.doubleToLongBits(d1) ==
                   java.lang.Double.doubleToLongBits(d2),
                   s"col $i: $d1 != $d2 (row $a vs $b)")
          case _ => assert(x == y, s"col $i: $x != $y")
        }
      }
    }
  }

  private val terms: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "qty"      -> col("l_quantity"),
    "price"    -> col("l_extendedprice"),
    "disc"     -> col("l_discount"),
    "discp"    -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
    "charge"   -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
                     * (lit(1.0) + col("l_tax"))),
    "rev"      -> (col("l_extendedprice") * col("l_discount")),
    "qty2"     -> (col("l_quantity") * col("l_quantity")),
    "qty4"     -> (col("l_quantity") * col("l_quantity")
                     * col("l_quantity") * col("l_quantity")),
    "qtyprice" -> (col("l_quantity") * col("l_extendedprice")))

  test("dsum fast interior == decimal interior, grouped, all query terms") {
    val fastAggs = terms.map { case (n, c) => Det.dsum(c).as(n) }
    val wideAggs = terms.map { case (n, c) => Det.dsumWide(c).as(n) }
    val fast = li.groupBy("l_returnflag")
      .agg(fastAggs.head, fastAggs.tail: _*)
      .orderBy("l_returnflag")
    val wide = li.groupBy("l_returnflag")
      .agg(wideAggs.head, wideAggs.tail: _*)
      .orderBy("l_returnflag")
    assertSame(fast, wide)
  }

  test("dsum fast interior == decimal interior, global + other tables") {
    val t = Tables.register(s, TestSpark.sfDir)
    def both(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) =
      assertSame(df.agg(Det.dsum(c).as("v")), df.agg(Det.dsumWide(c).as("v")))
    both(li, col("l_extendedprice"))
    both(t("orders"), col("o_totalprice"))
    both(t("events"), col("value"))
    both(t("part"), col("p_retailprice"))
    both(t("supplier"), col("s_acctbal"))
  }

  test("sSum SQL spelling == decimal SQL spelling (grouped)") {
    li.createOrReplaceTempView("det_li")
    val fast = s.sql(s"""SELECT l_returnflag, ${Det.sSum("l_quantity")} AS a,
        ${Det.sSum("l_extendedprice * (1.0 - l_discount)")} AS b
      FROM det_li GROUP BY l_returnflag ORDER BY l_returnflag""")
    val wide = s.sql(s"""SELECT l_returnflag, ${Det.oSum("l_quantity")} AS a,
        ${Det.oSum("l_extendedprice * (1.0 - l_discount)")} AS b
      FROM det_li GROUP BY l_returnflag ORDER BY l_returnflag""")
    assertSame(fast, wide)
  }

  test("sSumSq cents-long spelling == decimal-square spelling (grouped)") {
    li.createOrReplaceTempView("det_li")
    // Spark can evaluate the DuckDB-oracle spelling too: decimal(19,2)
    // x decimal(19,2) adjusts to (38,4) — still exact for |x| <= 1e5
    val fast = s.sql(s"""SELECT l_returnflag, ${Det.sSumSq("l_extendedprice")} AS v
      FROM det_li GROUP BY l_returnflag ORDER BY l_returnflag""")
    val wide = s.sql(s"""SELECT l_returnflag, ${Det.oSumSq("l_extendedprice")} AS v
      FROM det_li GROUP BY l_returnflag ORDER BY l_returnflag""")
    assertSame(fast, wide)
  }

  test("sAvg SQL spelling == decimal SQL spelling (scalar subquery shape)") {
    s.read.parquet(s"${TestSpark.sfDir}/part.parquet")
      .createOrReplaceTempView("det_part")
    val fast = s.sql(s"SELECT ${Det.sAvg("p_retailprice")} AS v FROM det_part")
    val wide = s.sql(s"SELECT ${Det.oAvg("p_retailprice")} AS v FROM det_part")
    assertSame(fast, wide)
  }

  test("negative values and nulls round identically (HALF_UP away from zero)") {
    // all values stay in the documented fast-path domain: <= 6 true
    // decimal digits (7-decimal half-boundary values are out of contract)
    val df = Seq[java.lang.Double](1.000001, -1.000001, 0.123456, -0.123456,
      0.000001, -0.000001, 0.0, -0.0, null, 123456.789012, -123456.789012,
      -99999.99, 99999.99)
      .toDF("x")
    // dsumWide is the semantics anchor; signs must not break agreement
    assertSame(df.agg(Det.dsum(col("x")).as("v")),
               df.agg(Det.dsumWide(col("x")).as("v")))
  }

  test("fast-path magnitude audit: every summed term stays far below 1e9") {
    val mx = li.agg(max(abs(col("l_quantity") * col("l_extendedprice"))))
      .head.getDouble(0)
    assert(mx < 1e9, s"qtyprice magnitude $mx breaches the fast-path bound")
  }

  test("empty group yields null on both interiors") {
    val empty = li.filter(lit(false))
    assertSame(empty.agg(Det.dsum(col("l_quantity")).as("v")),
               empty.agg(Det.dsumWide(col("l_quantity")).as("v")))
  }
}
