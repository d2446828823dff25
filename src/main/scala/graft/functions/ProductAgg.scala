package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed product aggregate (SURVEY §2.2 "bool_and/.../product"; §2.6 UDAF
  * surface). Exact for long inputs whose running product stays in range —
  * the oracle twin is DuckDB's product() over doubles, which is exact and
  * order-independent for integer values < 2^53.
  */
object LongProduct extends Aggregator[Long, Long, Long] {
  override def zero: Long = 1L
  override def reduce(b: Long, a: Long): Long = b * a
  override def merge(b1: Long, b2: Long): Long = b1 * b2
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object ProductAgg {
  /** Column form usable in groupBy().agg(...). */
  def product_long(c: Column): Column = udaf(LongProduct).apply(c)
}
