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

/** Determinism helpers for oracle hash-matching.
  *
  * Floating-point SUM/AVG are accumulation-order dependent, so a
  * distributed Spark sum and a DuckDB single-node sum would differ in the
  * low bits. We instead aggregate through DECIMAL(38,6) — exact and
  * associative, hence order-independent — and cast the final value back to
  * DOUBLE. Both engines then produce bit-identical doubles.
  */
object Det {
  private[queries] val Dec = DecimalType(38, 6)

  /** Order-independent sum of a double column (exact decimal interior). */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent average: exact decimal sum / non-null count. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast(DoubleType)

  /** Oracle-side (DuckDB SQL) twin of [[dsum]]. */
  def oSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"

  /** Oracle-side twin of [[davg]]. */
  def oAvg(x: String): String = s"CAST(${oSum(x)} / COUNT($x) AS DOUBLE)"
}
