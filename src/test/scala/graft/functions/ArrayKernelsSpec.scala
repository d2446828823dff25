package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NearestCentroid / PqEncode centroid-table handling.
  *
  * The table memo must hold ONE primitive conversion per (task thread,
  * table) even when CollapseProject merges the IVF assignment and the
  * PQ-encode projections into a single Project — the `ivfPqBuildPersist`
  * plan shape, where the coarse-centroid table and the PQ codebook
  * alternate on every row of one thread (a single-slot memo re-converted
  * BOTH per row). The SQL-exposed functions can also receive a per-row
  * (non-foldable) table column; that path must not touch the memo and
  * must agree with the memoized path value-for-value.
  */
class ArrayKernelsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private def vec(seed: Int): Seq[Float] =
    (0 until dim).map(d => ((seed * 31 + d * 7) % 17).toFloat / 4f)

  // 4 coarse centroids (dim 8) and a 1-subspace PQ codebook (256 x dim 8)
  private val cents: Seq[Seq[Double]] =
    (0 until 4).map(c => (0 until dim).map(d => ((c * 5 + d) % 11).toDouble / 3))
  private val codebook: Seq[Seq[Double]] =
    (0 until 256).map(c => (0 until dim).map(d => ((c * 3 + d) % 29).toDouble / 7))

  test("collapsed projection converts each table once per task, not per row") {
    val n = 8192
    val df = (0 until n).map(i => (i.toLong, vec(i))).toDF("id", "v")
      .repartition(2)
    val cLit = typedlit(cents)
    val cbLit = typedlit(codebook)
    // the ivfPqBuildPersist shape: assignment and encode end up in ONE
    // collapsed Project, alternating the two tables on each row
    val shaped = df
      .withColumn("list_id", ArrayKernels.nearestCentroid(col("v"), cLit))
      .select(col("id"), col("list_id"),
              ArrayKernels.pqEncode(col("v"), cbLit).as("code"))
    val before = NearestCentroid.conversions.get()
    val out = shaped.agg(sum(col("list_id")), sum(col("code"))).collect()
    val misses = NearestCentroid.conversions.get() - before
    assert(out.nonEmpty)
    // bound: a handful of conversions (2 tables x a few task threads,
    // plus any concurrently running suite), never O(rows) = 2 * 8192
    assert(misses <= 64, s"memo thrashed: $misses conversions for $n rows")
  }

  test("non-foldable table column agrees with the memoized literal path") {
    val rows = (0 until 100).map(i => (i.toLong, vec(i)))
    val df = rows.toDF("id", "v")
    val lit2 = typedlit(cents)
    val viaLit = df.select(col("id"),
        ArrayKernels.nearestCentroid(col("v"), lit2).as("c"),
        ArrayKernels.pqEncode(col("v"), typedlit(codebook)).as("k"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    // same tables shipped as per-row COLUMNS -> the direct (unmemoized) path
    val withCol = df
      .withColumn("cents", typedlit(cents))
      .withColumn("cb", typedlit(codebook))
      // defeat constant-folding into a literal: route through a no-op
      // array operation Catalyst does not fold on non-literal children
      .withColumn("cents", when(col("id") >= 0, col("cents")))
      .withColumn("cb", when(col("id") >= 0, col("cb")))
    val viaCol = withCol.select(col("id"),
        ArrayKernels.nearestCentroid(col("v"), col("cents")).as("c"),
        ArrayKernels.pqEncode(col("v"), col("cb")).as("k"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    assert(viaCol == viaLit)
  }
}
