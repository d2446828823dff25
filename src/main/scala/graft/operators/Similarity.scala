package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity-search operators over `ArrayType(FloatType)` columns
  * (SURVEY §2.5): brute-force exact top-k as the baseline, LSH-bucketed
  * search as the scale path.
  *
  * Kernels are built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`) — no Scala UDF in the hot path, so
  * whole-stage codegen fuses scan → dot-product → top-k.
  */
object Similarity {

  /** Sequential-fold dot product of two array<float> columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
              lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the codegen'd [[graft.functions.FloatCosine]] kernel — a
    * tight primitive loop fused into whole-stage codegen, ~10x the
    * interpreted HOF fold. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.ArrayKernels.floatCosine(a, b)

  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
    }), lit(0.0), (acc, x) => acc + x))

  /** Exact brute-force top-k by cosine similarity against one query vector.
    * Plans as scan → project (codegen'd kernel) → TakeOrderedAndProject:
    * no shuffle of the corpus, each partition keeps k candidates and the
    * driver merges — the right baseline even at 100 TB (one pass).
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id (`nBits`-bit signature) for a vector.
    * Hyperplane weights are pseudo-random but fully deterministic:
    * w(plane, dim) = xxhash64(plane, dim) scaled to [-1, 1]. The same
    * expression buckets both the corpus (once, at index-build time) and
    * each query, so search touches only matching buckets.
    */
  def lshBucket(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { p =>
      // dot(vec, plane_p) > 0 ? 2^p : 0, with plane weights hashed from (p, dim index)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          val w = pmod(xxhash64(lit(p), i), lit(2000001L)).cast(DoubleType) / 1000000.0 - 1.0
          x.cast(DoubleType) * w
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: restrict the exact cosine ranking to vectors whose
    * LSH bucket matches the query's bucket in at least one of `nTables`
    * independent hash tables. At scale: corpus bucketing is a one-off
    * (materialize `bucket_t` columns, partition by them); a query then
    * scans only its buckets' partitions instead of 100 TB.
    */
  def annCosineTopK(df: DataFrame, idCol: String, vecCol: String,
                    query: Seq[Float], k: Int, nBits: Int = 4,
                    nTables: Int = 16): DataFrame = {
    // default (4 bits x 16 tables) targets ~0.9 recall even for weakly
    // similar neighbours (cos ~ 0.3, hyperplane agreement ~ 0.6/plane);
    // strongly clustered corpora can afford more bits per table for
    // sharper pruning.
    val q = typedlit(query)
    // per-table bucket expressions differ by salting the plane index space
    def bucket(vec: Column, t: Int): Column = {
      val bits = (0 until nBits).map { p =>
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
            val w = pmod(xxhash64(lit(t * 1000 + p), i), lit(2000001L)).cast(DoubleType) / 1000000.0 - 1.0
            x.cast(DoubleType) * w
          }),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val anyMatch = (0 until nTables)
      .map(t => bucket(col(vecCol), t) === bucket(q, t))
      .reduce(_ || _)
    df.filter(anyMatch)
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
