package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustered layout for multi-column pruning.
  *
  * A 1-D `sortBy(a)` gives fragments disjoint ranges of `a` — perfect
  * pruning on `a`, none on `b`. Interleaving the bits of several columns
  * into one sort key clusters fragments in ALL those dimensions at once:
  * each fragment covers a small hyper-rectangle of the (a, b, …) space,
  * so its per-column manifest [min,max] stats stay tight on every z-order
  * column and a selective predicate on ANY of them skips most fragments
  * (the OPTIMIZE ZORDER story from Delta/Iceberg, over lance zone maps).
  *
  * Scale shape: one small aggregate pass for per-column [min,max] (k
  * doubles to the driver), then a map-only z-value projection and ONE
  * range exchange on the z key — identical cost to a plain global sort.
  * The z column is computed with codegen'd bit arithmetic (no UDF) and
  * dropped before the write, so the stored schema is unchanged.
  *
  * Reference semantics: the lance crate exposes sorted writes; multi-
  * column clustering is our scale extension (SURVEY §2.5). Results are
  * layout-invariant — oracles only see pruning as speed.
  */
object ZOrder {

  /** Bits kept per column: 2 cols → 16 bits each (32-bit z), 3 → 16 (48),
    * 4 → 12 (48). Beyond 4 columns interleaving stops paying — refuse. */
  private def bitsFor(k: Int): Int = k match {
    case 2 | 3 => 16
    case 4 => 12
    case n => throw new IllegalArgumentException(
      s"zorder: need 2-4 columns, got $n")
  }

  /** Morton-spread the low 16 bits of `x` so consecutive source bits land
    * `stride` positions apart (classic magic-mask spread, stride = number
    * of interleaved columns). Pure Column bit arithmetic — codegen'd. */
  private def spread(x: Column, bits: Int, stride: Int): Column = {
    // generic spread: place bit i of x at position i*stride
    // (loop unrolled driver-side into a fixed expression tree)
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * stride)
    }.reduce(_ bitwiseOR _)
  }

  /** Normalize a column to an unsigned `bits`-wide bucket in [0, 2^bits):
    * linear scale between the column's observed [min, max]; nulls → 0. */
  private def bucket(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = mx - mn
    val top = (1L << bits) - 1
    val scaled =
      if (span <= 0) lit(0L)
      else least(lit(top), greatest(lit(0L),
        ((c.cast("double") - lit(mn)) / lit(span) * lit(top.toDouble))
          .cast("long")))
    coalesce(scaled, lit(0L))
  }

  /** Numeric view of a z-order column (temporal types order by their
    * epoch value; everything else must already be numeric). */
  private def numericView(df: DataFrame, name: String): Column = {
    val dt = df.schema(name).dataType
    dt match {
      case _: NumericType => col(name)
      case DateType => col(name).cast("int")
      case TimestampType | TimestampNTZType => col(name).cast("long")
      case other => throw new IllegalArgumentException(
        s"zorder: column '$name' has unsupported type $other " +
          "(numeric/date/timestamp only)")
    }
  }

  /** The interleaved z-value for `cols`, using per-column [min,max]
    * bounds. Exposed for tests; `zOrdered` computes bounds itself. */
  def zValue(df: DataFrame, cols: Seq[String],
             bounds: Map[String, (Double, Double)]): Column = {
    val bits = bitsFor(cols.length)
    cols.zipWithIndex.map { case (name, i) =>
      val (mn, mx) = bounds(name)
      shiftleft(spread(bucket(numericView(df, name), mn, mx, bits),
                       bits, cols.length), i)
    }.reduce(_ bitwiseOR _)
  }

  /** Return `df` re-clustered on the z-curve of `cols` into `parts`
    * range partitions, each sorted by z within — ready for any sink that
    * cuts one file per partition (the lance writer records per-column
    * fragment stats, so pruning follows automatically). */
  def zOrdered(df: DataFrame, cols: Seq[String], parts: Int): DataFrame = {
    require(parts > 0, "zorder: parts must be positive")
    val aggs = cols.flatMap(c => Seq(
      min(numericView(df, c).cast("double")).as(s"mn_$c"),
      max(numericView(df, c).cast("double")).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = cols.zipWithIndex.map { case (c, i) =>
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      c -> (mn, mx)
    }.toMap
    val z = zValue(df, cols, bounds)
    df.withColumn("__graft_z", z)
      .repartitionByRange(parts, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  /** Z-order `df` and write it as a lance dataset at `path`. */
  def writeLance(df: DataFrame, path: String, cols: Seq[String],
                 parts: Int, mode: String = "overwrite"): Unit =
    zOrdered(df, cols, parts).write.format("lance").mode(mode).save(path)
}
