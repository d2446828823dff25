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
    // the in-Spark twin of the DuckDB oracle must mirror DuckDB's
    // TWO-STEP decimal->double (integer numerator -> double -> /1e4):
    // Spark's own one-step cast correctly rounds and differs by one ulp
    // once the numerator passes 2^53 (price squares sum to ~7.1e16 cents²
    // here)
    val wide = s.sql(s"""SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2)) *
                 CAST(l_extendedprice AS DECIMAL(19,2))) * 10000 AS DOUBLE)
          / 10000.0D AS v
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

  test("fuzz: interiors agree on random cent values and their products") {
    import org.scalacheck.Gen
    // in-domain fuzz: 2-decimal "money" values (pos+neg) and products of
    // two of them (4 true decimals) — the documented fast-path universe
    val centsGen = Gen.chooseNum(-10000000L, 10000000L).map(_ / 100.0)
    (1L to 5L).foreach { seedN =>
      val seed = org.scalacheck.rng.Seed(seedN)
      val vals = Gen.listOfN(500, Gen.zip(centsGen, Gen.chooseNum(-100L, 100L).map(_ / 100.0)))
        .pureApply(Gen.Parameters.default, seed)
      val df = vals.toDF("a", "b").select(col("a"), (col("a") * col("b")).as("ab"))
      assertSame(
        df.agg(Det.dsum(col("a")).as("sa"), Det.dsum(col("ab")).as("sab")),
        df.agg(Det.dsumWide(col("a")).as("sa"), Det.dsumWide(col("ab")).as("sab")))
    }
  }
}

/** Differential test for the WordGramStats kernel: the HOF formulation
  * (split -> gram strings -> groupBy counts) is the semantics anchor;
  * the kernel's total/distinct/max must agree on adversarial strings
  * (empty tokens, repeated grams, unicode). */
class WordGramStatsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def hofStats(text: String, n: Int): (Long, Long, Long) = {
    val toks = text.split(" ", -1).toSeq
    val grams = (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
    if (grams.isEmpty) (0L, 0L, 0L)
    else {
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
      (grams.size.toLong, counts.size.toLong, counts.values.max)
    }
  }

  test("kernel total/distinct/max == reference on adversarial strings") {
    val cases = Seq(
      "a b a b a b", "x", "", "  ", "a  b", "a a a a a",
      "uno dos tres uno dos tres uno", "héllo wörld héllo wörld",
      "k1 v1 k1 v1 k2 v2 k1 v1", "single pair", "a b c d e f g h")
    val df = cases.toDF("text")
      .select(col("text"), graft.functions.ArrayKernels.wordGramStats(col("text"), 2).as("st"))
      .select(col("text"), col("st.total"), col("st.n_distinct"), col("st.max_count"))
      .collect()
    df.foreach { r =>
      val (t, d, m) = hofStats(r.getString(0), 2)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((t, d, m)),
             s"mismatch on '${r.getString(0)}'")
    }
  }

  test("kernel fuzz vs reference (random token streams, n=2 and n=5)") {
    import org.scalacheck.Gen
    val tokGen = Gen.oneOf("a", "b", "cc", "", "δ", "tok")
    val textGen = Gen.listOfN(30, tokGen).map(_.mkString(" "))
    (1L to 3L).foreach { seedN =>
      val texts = Gen.listOfN(50, textGen)
        .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seedN))
      Seq(2, 5).foreach { n =>
        val out = texts.toDF("text")
          .select(col("text"), graft.functions.ArrayKernels.wordGramStats(col("text"), n).as("st"))
          .select(col("text"), col("st.total"), col("st.n_distinct"), col("st.max_count"),
                  size(col("st.hashes")).cast("long").as("nh"))
          .collect()
        out.foreach { r =>
          val (t, d, m) = hofStats(r.getString(0), n)
          assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((t, d, m, d)),
                 s"seed $seedN n=$n text='${r.getString(0)}'")
        }
      }
    }
  }
}

/** Differential test for the RollingDocHash kernel: the explicit
  * word/char fold (the d10 SQL semantics anchor) recomputed in plain
  * Scala must agree on adversarial strings. */
class RollingDocHashSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def refHash(text: String): Long = {
    val words = text.split(" ", -1)
    val terms = words.zipWithIndex.map { case (w, wpos) =>
      val whash = w.toCharArray.zipWithIndex.map { case (ch, cpos) =>
        (ch.toLong % 128L) * math.pow(8, math.min(cpos, 15)).toLong
      }.sum % 1000000007L
      (wpos.toLong * 1000003L + whash) % 2147483647L
    }
    terms.sum % 2147483647L
  }

  test("kernel == reference fold on adversarial strings") {
    val cases = Seq(
      "a b a b", "x", "", "  ", "a  b", "trailing ", " leading",
      "one word word one", "k1 v1 k2", "a" * 40 + " tail",
      "exactly fifteen-plus chars wwwwwwwwwwwwwwwwwwww end")
    val out = cases.toDF("text")
      .select(col("text"),
              graft.functions.ArrayKernels.rollingDocHash(col("text")).as("h"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == refHash(r.getString(0)),
             s"mismatch on '${r.getString(0)}'")
    }
  }

  test("kernel fuzz vs reference fold") {
    import org.scalacheck.Gen
    val tokGen = Gen.oneOf("a", "b", "word", "", "Zz", "qqqqqqqqqqqqqqqqqqqq")
    val textGen = Gen.listOfN(20, tokGen).map(_.mkString(" "))
    val texts = Gen.listOfN(100, textGen)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
    val out = texts.toDF("text")
      .select(col("text"),
              graft.functions.ArrayKernels.rollingDocHash(col("text")).as("h"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == refHash(r.getString(0)),
             s"mismatch on '${r.getString(0)}'")
    }
  }
}

/** Differential test for the PiiRedactSummary kernel: its fused
  * count+redact must equal the builtin regexp_extract_all/regexp_replace
  * chain it replaced (the d25 semantics anchor), including counts over
  * the ORIGINAL text and the sequential email -> ip -> phone order. */
class PiiRedactSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phone = "(\\(\\d{3}\\)\\s?)?\\d{3}-\\d{4}"
  private val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  test("kernel == builtin regex chain on adversarial strings") {
    val cases = Seq(
      "",
      "no pii here at all",
      "mail me a@b.co or c.d+x@e-f.org today",
      "call (123) 456-7890 or 456-7890",
      "server at 10.0.0.1 and 255.255.255.255.",
      // ip-looking run adjacent to a phone-looking tail
      "123.456.789.123-4567 mixed",
      "a@b.co 1.2.3.4 123-4567 all three",
      "dot.at.end@x.yz.",
      "overlap 999-9999 and (999) 999-9999",
      "ip inside email? 1.2.3.4@5.6.7.8.com maybe")
    val df = cases.toDF("t")
    val kernel = df.select(col("t"),
        graft.functions.ArrayKernels.piiRedact(col("t")).as("p"))
      .select(col("t"), col("p.n_email"), col("p.n_phone"), col("p.n_ip"),
              col("p.red"))
      .collect()
    val builtin = df.select(col("t"),
        size(expr(s"regexp_extract_all(t, '${email.replace("\\", "\\\\")}', 0)")),
        size(expr(s"regexp_extract_all(t, '${phone.replace("\\", "\\\\")}', 0)")),
        size(expr(s"regexp_extract_all(t, '${ip.replace("\\", "\\\\")}', 0)")),
        regexp_replace(regexp_replace(regexp_replace(col("t"),
          email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>"))
      .collect()
    kernel.zip(builtin).foreach { case (k, b) =>
      (1 to 4).foreach { i =>
        assert(k.get(i) == b.get(i),
               s"col $i mismatch on '${k.getString(0)}': ${k.get(i)} vs ${b.get(i)}")
      }
    }
  }

  test("null text stays null") {
    val out = Seq(Tuple1[String](null)).toDF("t")
      .select(graft.functions.ArrayKernels.piiRedact(col("t"))).collect()
    assert(out.head.isNullAt(0))
  }
}
