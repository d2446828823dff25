package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared query of the correctness contract (SURVEY.md §2.2/§2.5):
  * a Spark-side DataFrame program plus (when SQL-expressible) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  /** Per-JVM scratch directory for a query family's persisted fixtures
    * (lance copies, indexes, staged postings), deleted on JVM exit.
    * Before the shutdown hook, every harness invocation leaked its
    * fixtures into /tmp — ~26 GB accumulated across bench rounds on
    * this sandbox, and the sf100 runs hit ENOSPC on the residue. */
  def tempWorkDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
}

/** Determinism helpers for oracle hash-matching.
  *
  * Floating-point SUM/AVG are accumulation-order dependent, so a
  * distributed Spark sum and a DuckDB single-node sum would differ in the
  * low bits. We instead aggregate through an exact, associative (hence
  * order-independent) fixed-point interior and cast the final value back
  * to DOUBLE. Both engines then produce bit-identical doubles.
  *
  * Two interiors exist:
  *
  *  - [[dsum]] (fast, the default): per row the value is scaled to a
  *    micro-unit long `k = round_half_away(x * 1e6)` and accumulated as
  *    TWO native long sums (`k >> 20` and `k & 0xFFFFF`), recombined in
  *    decimal only once per group. The whole per-row path is long
  *    arithmetic inside whole-stage codegen — no per-row BigDecimal.
  *    Overflow headroom: the split keeps partial sums exact up to
  *    ~2^63 / 2^20 rows x max|x| micro-units, i.e. ~8.8e12 row-units of
  *    |x| <= 1e6 — orders of magnitude past a 100 TB sum of money/
  *    quantity columns (and far past where a single long sum of `k`
  *    would wrap).
  *  - [[dsumWide]] (exact-decimal): per-row CAST to DECIMAL(38,6) and a
  *    decimal SUM, as DuckDB's oracle computes it. Needed only when
  *    |x| can exceed ~1e9 (e.g. squares of prices), where the double
  *    ulp passes 1e-6 and binary rounding of `x * 1e6` is no longer
  *    provably identical to decimal-string rounding.
  *
  * Why [[dsum]] equals [[dsumWide]] bit-for-bit on this data: every
  * summed expression here is a product of <=2-decimal columns, so its
  * TRUE value v has <= 6 decimal digits and |v| < ~5e6. The decimal cast
  * rounds the double's shortest decimal string w (|w - v| <= ulp(x) ~
  * 1e-9 << 1e-6, so it recovers exactly k = v*1e6); the binary path
  * computes round(x*1e6) whose multiply error is <= ulp(5e12)/2 ~ 5e-4
  * << 0.5, recovering the same k. Both interiors therefore accumulate
  * the identical integer k per row. The FINAL cast deliberately mirrors
  * DuckDB's decimal->double conversion (exact integer numerator ->
  * double, then a double division by 10^scale): once the numerator
  * passes 2^53 that two-step is no longer correctly rounded, and
  * Spark's one-step BigDecimal cast would land one ulp away (q01's
  * sum_charge at sf1). DetSpec pins the interior equality on the real
  * tables; the bound |x| < 1e9 is asserted-safe by
  * the data audit in that spec.
  */
object Det {
  private[queries] val Dec = DecimalType(38, 6)
  private val Acc  = DecimalType(38, 0)
  private val Mask = (1L << 20) - 1

  /** Half-away-from-zero micro-unit scaling (matches DECIMAL HALF_UP).
    *
    * Rounds the EXACT BINARY value of y = c * 1e6 (frac = y - floor(y)
    * is exact by Sterbenz, so the >= 0.5 test sees y's true value):
    * DuckDB's CAST(x AS DECIMAL(38,6)) rounds the binary product the
    * same way (verified: CAST == ROUND(x*1e6) on all 6M sf1 rows, zero
    * diffs). Neither the old `+0.5` floor trick (y + 0.5 rounds UP when
    * y = k + 0.49999999999999994) nor Spark's ROUND (BigDecimal.valueOf
    * goes through the SHORTEST string repr, which reads that y as k.5)
    * matches it — both skewed q01's sum_charge by a few micro-units at
    * sf1 row counts. */
  private def scaledLong(c: Column): Column = {
    val y = c * lit(1e6)
    val f = floor(y)
    val pos = f + when(y - f >= 0.5, 1L).otherwise(0L)
    val cl = ceil(y)
    val neg = cl - when(cl - y >= 0.5, 1L).otherwise(0L)
    when(c < 0, neg).otherwise(pos).cast(LongType)
  }

  /** Order-independent sum of a double column — fast fixed-point interior
    * (two codegen long sums). Valid for |values| < 1e9 with <= 6 true
    * decimal digits; use [[dsumWide]] beyond that.
    */
  def dsum(c: Column): Column = {
    val k  = scaledLong(c)
    val hi = sum(shiftright(k, 20)).cast(Acc)
    val lo = sum(k.bitwiseAND(lit(Mask))).cast(Acc)
    // final cast MIMICS DuckDB's decimal->double (two-step: exact
    // integer numerator -> double, then double division by 1e6). Spark's
    // one-step decimal division + cast is CORRECTLY rounded and can land
    // one ulp away once the micro numerator passes 2^53 (q01 at sf1:
    // numerator ...540 -> duck 45692686581.817535, correct .81754) —
    // agreeing bit-for-bit with the oracle beats being half-an-ulp
    // "righter"
    (hi * lit(1L << 20) + lo).cast(DoubleType) / lit(1e6)
  }

  /** Order-independent sum via per-row DECIMAL(38,6) — for wide values
    * (|x| >= 1e9, e.g. squared prices) where the fast path's binary
    * rounding is not provably identical to the oracle's decimal cast.
    */
  def dsumWide(c: Column): Column =
    // same two-step final cast as [[dsum]] (exact integer numerator ->
    // double -> /1e6), matching DuckDB's decimal->double exactly
    (sum(c.cast(Dec)) * lit(1000000L)).cast(DoubleType) / lit(1e6)

  /** Order-independent average: exact fixed-point sum / non-null count. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast(DoubleType)

  /** Windowed [[dsum]]: both long sums evaluate over the same frame in
    * one Window pass, recombined per row. */
  def dwsum(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val k  = scaledLong(c)
    val hi = sum(shiftright(k, 20)).over(w).cast(Acc)
    val lo = sum(k.bitwiseAND(lit(Mask))).over(w).cast(Acc)
    (hi * lit(1L << 20) + lo).cast(DoubleType) / lit(1e6)
  }

  /** Spark-SQL-side spelling of [[dsum]] for queries expressed as SQL
    * strings (same fixed-point interior, same result as [[oSum]]).
    */
  def sSum(x: String): String = {
    // same exact-binary half-away rounding as [[scaledLong]] (the `+0.5`
    // trick mis-rounds y = k + 0.49999999999999994 — see scaledLong doc)
    val y = s"(($x) * 1e6)"
    val k = s"CAST(CASE WHEN ($x) < 0D" +
      s" THEN CEIL($y) - IF(CEIL($y) - $y >= 0.5D, 1L, 0L)" +
      s" ELSE FLOOR($y) + IF($y - FLOOR($y) >= 0.5D, 1L, 0L) END AS BIGINT)"
    s"CAST(CAST(SUM(SHIFTRIGHT($k, 20)) AS DECIMAL(38,0)) * 1048576" +
      s" + CAST(SUM(($k) & 1048575) AS DECIMAL(38,0)) AS DOUBLE) / 1000000.0D"
  }

  /** Spark-SQL-side spelling of [[davg]]. */
  def sAvg(x: String): String = s"CAST(${sSum(x)} / COUNT($x) AS DOUBLE)"

  /** Exact sum-of-squares of a 2-decimal column, Spark-side fast
    * spelling: the value is taken to cents exactly (`p = round(x*100)`,
    * a long), squared exactly in long arithmetic (p^2 <= ~1e14 for
    * |x| <= 1e5), and accumulated via the same hi/lo split. Unlike
    * squaring in double first, no intermediate rounding exists at all,
    * so the [[oSumSq]] oracle twin (decimal x decimal product) agrees
    * bit-for-bit by construction.
    */
  def sSumSq(x: String): String = {
    val p = s"CAST(CASE WHEN ($x) < 0D THEN -((-($x)) * 100D + 0.5D)" +
      s" ELSE ($x) * 100D + 0.5D END AS BIGINT)"
    val k = s"(($p) * ($p))"
    s"CAST(CAST(SUM(SHIFTRIGHT($k, 20)) AS DECIMAL(38,0)) * 1048576" +
      s" + CAST(SUM(($k) & 1048575) AS DECIMAL(38,0)) AS DOUBLE) / 10000.0D"
  }

  /** Oracle-side twin of [[sSumSq]]: exact decimal-squared sum. */
  def oSumSq(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(19,2)) * CAST($x AS DECIMAL(19,2))) AS DOUBLE)"

  /** Oracle-side (DuckDB SQL) twin of [[dsum]]/[[dsumWide]] — DuckDB
    * evaluates the decimal interior natively fast, so the oracle keeps
    * the one-step spelling.
    */
  def oSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"

  /** Oracle-side twin of [[davg]]. */
  def oAvg(x: String): String = s"CAST(${oSum(x)} / COUNT($x) AS DOUBLE)"
}
