package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** As-of (point-in-time) join.
  *
  * Spark has no native ASOF JOIN (DuckDB does: `ASOF JOIN ... ON l.k = r.k
  * AND l.ts >= r.ts`, with all four inequality directions). The naive
  * rewrite — range join + `row_number() = 1` — explodes to O(|L|·|R|)
  * pairs per key before pruning, which is fatal at 100 TB. This
  * implementation uses the union + last-value trick instead:
  *
  *   1. union left and right rows, tagged with a side marker ordered so
  *      the right row sorts before the left at equal timestamps when the
  *      match is inclusive (>= / <=), after it when strict (> / <);
  *   2. one shuffle partitioned by the join keys, sorted by (time, side)
  *      — ascending for backward matches, descending for forward;
  *   3. for each right payload column, `last(col, ignoreNulls)` over the
  *      running window carries the most recent (or next) right ROW
  *      forward as one struct;
  *   4. keep only left rows; an optional tolerance nulls the payload when
  *      the matched right time is farther than `tolerance` units away
  *      (pandas `merge_asof` semantics — match-then-filter, NOT
  *      match-the-nearest-within-window).
  *
  * Cost: a single exchange of |L| + |R| rows on the key — the same shuffle
  * a plain equi-join would do — and a per-partition sort. No pair
  * explosion, no skew amplification beyond the key's own row count.
  */
object AsOf {

  /** Left as-of join: every row of `left` gains the payload columns of
    * the `right` row with the greatest (direction=backward) or smallest
    * (forward) `timeCol` on the matching side of left's `timeCol` within
    * the same `keys` group (nulls when no such row). `strict` excludes
    * equal timestamps (`>` / `<` instead of `>=` / `<=`). `tolerance`
    * (raw units for numeric time columns, MICROSECONDS for timestamps)
    * nulls the payload when the matched row is too far away. `left` and
    * `right` must have disjoint column names apart from `keys` and
    * `timeCol`.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String, direction: String = "backward",
           strict: Boolean = false,
           tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof direction must be backward|forward, got '$direction'")
    val side = "__graft_asof_side"
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == timeCol)
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == timeCol)

    // inclusive: right rows sort before left at equal times (they match);
    // strict: after (they don't)
    val (sideR, sideL) = if (strict) (1, 0) else (0, 1)
    val l = rightPayload.foldLeft(left.withColumn(side, lit(sideL))) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r = leftPayload.foldLeft(right.withColumn(side, lit(sideR))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l.unionByName(r)

    val timeOrd =
      if (direction == "backward") col(timeCol).asc else col(timeCol).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all right payload columns AND the right time ride in ONE struct
    // (null on left rows): last(_, ignoreNulls) then lands on the most
    // recent right ROW as a unit, so a genuinely-NULL payload value
    // inside the matched row is preserved instead of falling through to
    // an older non-null row (DuckDB ASOF JOIN semantics)
    val payload = "__graft_asof_payload"
    val matchedT = "__graft_asof_t"
    val fields = col(timeCol).as(matchedT) +: rightPayload.map(col).toSeq
    val filled = unioned.withColumn(payload,
      last(when(col(side) === lit(sideR), struct(fields: _*)),
           ignoreNulls = true).over(w))
    // tolerance: signed distance from left time to the matched right time
    // in the match direction; out-of-range matches null the whole payload
    def micros(c: org.apache.spark.sql.Column) =
      left.schema(timeCol).dataType match {
        case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
        case _ => c.cast("long")
      }
    val pruned = tolerance match {
      case None => filled
      case Some(tol) =>
        val dist =
          if (direction == "backward")
            micros(col(timeCol)) - micros(col(s"$payload.$matchedT"))
          else micros(col(s"$payload.$matchedT")) - micros(col(timeCol))
        filled.withColumn(payload,
          when(dist <= lit(tol), col(payload))) // null when too far / no match
    }
    val projected = rightPayload.foldLeft(pruned) { (df, c) =>
      df.withColumn(c, col(s"$payload.$c"))
    }
    projected.filter(col(side) === lit(sideL)).drop(side, payload)
  }
}
