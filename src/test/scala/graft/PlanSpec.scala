package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan hygiene (SURVEY §4, "Optimize for scale — concretely"):
  * these assertions pin the plan shapes that matter at 100 TB — filters
  * reaching the parquet scan, small dims broadcast, top-k fused, no
  * cartesian products where a hash join belongs. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q06 selective filters are pushed into the parquet scan") {
    val plan = physical("q06_forecast_revenue")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate") && plan.contains("GreaterThanOrEqual"),
      s"shipdate range not pushed:\n$plan")
  }

  test("q06 scan is column-pruned to the referenced columns") {
    val plan = physical("q06_forecast_revenue")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unexpected column read: $readSchema")
    assert(readSchema.contains("l_extendedprice"), readSchema)
  }

  test("q03 star join broadcasts the dimension side") {
    val plan = physical("q03_shipping_priority")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q05 five-way join has no cartesian/nested-loop stage") {
    val plan = physical("q05_region_revenue")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q40 top-k fuses into TakeOrderedAndProject") {
    val plan = physical("q40_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q01 aggregation is partial (map-side) before the exchange") {
    val plan = physical("q01_pricing_summary")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 && plan.contains("partial_"), s"no partial agg:\n$plan")
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
      .withColumn("x", col("l_quantity") + col("o_totalprice"))
    // disable broadcast so the join planner must pick SMJ; bucketing
    // should then elide both shuffle exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("f03 FTS probe: broadcast vocab join, one skinny exchange, fused top-k") {
    val plan = physical("f03_fts_search")
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not fused:\n$plan")
    // exactly one shuffle: the per-doc score aggregation (broadcast side
    // excluded — BroadcastExchange is not a shuffle)
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle, found $shuffles:\n$plan")
  }

  test("e03 cosine kernel participates in whole-stage codegen") {
    val df = SparkEntry.queries("e03_cosine_topk_kernel")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage; the
    // Project computing floatcosine must carry it
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("floatcosine")), plan)
  }

  test("d07 LSH: candidates are bucket-local (mapPartitions kernel), no pair join/distinct") {
    val plan = physical("d07_minhash_lsh")
    // the candidate stream must never exist as a joined/distinct dataset —
    // pairs are generated and filtered INSIDE the band buckets. Since r16
    // the kernel is repartition(cores, bucketKey) + sortWithinPartitions +
    // MapPartitions (core-derived parallelism, exempt from AQE's
    // byte-based coalescing) instead of groupByKey/flatMapGroups.
    assert(plan.contains("MapPartitions"),
      s"bucket-local kernel missing:\n$plan")
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"explicit core-derived kernel repartition missing:\n$plan")
    assert(!plan.contains("SortMergeJoin (band"), "candidate band self-join found")
    // survivors join ids via broadcast/shuffle — but no HashAggregate over
    // a (gid_a, gid_b) distinct
    assert(!plan.contains("distinct"), s"candidate distinct found:\n$plan")
  }

  test("d06 small-block branch broadcasts the pair-join build side") {
    val plan = physical("d06_jaccard_pairs")
    // the materialized-cache size estimate flipped this to a 20-key
    // SortMergeJoin once (4x at sf1) — the explicit broadcast must hold
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast pair join:\n$plan")
    assert(!plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("blk")),
      s"pair join degraded to a block-keyed SortMergeJoin:\n$plan")
  }

  test("q25 bitmap multi-distinct: no Expand, one partial aggregate pass") {
    val df = SparkEntry.queries("q25_count_distinct")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the bitmap buffers make every distinct clause a partial agg — the
    // native multi-COUNT(DISTINCT) Expand (3x row multiplication before
    // the shuffle) must not appear
    assert(!plan.contains("Expand"), s"Expand found:\n$plan")
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle, found $shuffles:\n$plan")
  }
}
