package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join.
  *
  * Spark has no native ASOF JOIN (DuckDB does: `ASOF JOIN ... ON l.k = r.k
  * AND l.ts >= r.ts`). The naive rewrite — range join + `row_number() = 1`
  * — explodes to O(|L|·|R|) pairs per key before pruning, which is fatal at
  * 100 TB. This implementation uses the union + last-value trick instead:
  *
  *   1. union left and right rows, tagged with a side marker (right = 0,
  *      left = 1, so at equal timestamps the right row sorts first and the
  *      match is inclusive: rightTime <= leftTime);
  *   2. one shuffle partitioned by the join keys, sorted by (time, side);
  *   3. for each right payload column, `last(col, ignoreNulls)` over the
  *      running window carries the most recent right value forward;
  *   4. keep only left rows.
  *
  * Cost: a single exchange of |L| + |R| rows on the key — the same shuffle
  * a plain equi-join would do — and a per-partition sort. No pair
  * explosion, no skew amplification beyond the key's own row count.
  */
object AsOf {

  /** Left as-of join: every row of `left` gains the payload columns of the
    * `right` row with the greatest `timeCol` <= left's `timeCol` within the
    * same `keys` group (nulls when no such row). `left` and `right` must
    * have disjoint column names apart from `keys` and `timeCol`.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String], timeCol: String): DataFrame = {
    val side = "__graft_asof_side"
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == timeCol)
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == timeCol)

    val l = rightPayload.foldLeft(left.withColumn(side, lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r = leftPayload.foldLeft(right.withColumn(side, lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l.unionByName(r)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all right payload columns ride in ONE struct (null on left rows):
    // last(_, ignoreNulls) then lands on the most recent right ROW as a
    // unit, so a genuinely-NULL payload value inside the matched row is
    // preserved instead of falling through to an older non-null row
    // (DuckDB ASOF JOIN semantics)
    if (rightPayload.isEmpty) unioned.filter(col(side) === 1).drop(side)
    else {
      val payload = "__graft_asof_payload"
      val filled = unioned.withColumn(payload,
        last(when(col(side) === 0, struct(rightPayload.map(col): _*)),
             ignoreNulls = true).over(w))
      val projected = rightPayload.foldLeft(filled) { (df, c) =>
        df.withColumn(c, col(s"$payload.$c"))
      }
      projected.filter(col(side) === 1).drop(side, payload)
    }
  }
}
