package graft

import java.nio.file.{Files, Paths}

/** Dumps formatted physical plans of flagship queries to PLANS.md —
  * the legible record of the plan shapes PlanSpec pins (pushdown,
  * broadcast, partial agg, codegen spans, top-k fusion). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.lance", "graft.sources.lance.LanceCatalog")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val picks = Seq(
      "q01_pricing_summary" -> "scan -> partial HashAggregate -> exchange -> final (fixed-point long-pair sums, codegen)",
      "q25_count_distinct" -> "one deduping scan; Expand multi-distinct over the already-deduped frame",
      "d15_decontaminate" -> "map-only: one-pass gram kernel + sorted-intersect vs benchmark literal (no shuffle before sort)",
      "q03_shipping_priority" -> "star join: broadcast dims, shuffle only fact-fact, TakeOrdered",
      "q06_forecast_revenue" -> "selective filters pushed to parquet (PushedFilters), pruned ReadSchema",
      "q09_topn_per_group" -> "window top-N per group",
      "q33_asof_join" -> "as-of join via union + running last-value (single shuffle on user_id)",
      "e01_cosine_topk" -> "scaled-long exact cosine: codegen LongDot kernel, broadcast query vector",
      "e03_cosine_topk_kernel" -> "FloatCosine codegen kernel fused in WholeStageCodegen, TakeOrdered",
      "d07_minhash_lsh" -> "MinHash sketch agg -> band-bucket census -> bucket-local generate-and-filter kernel (survivors only; the candidate stream never shuffles)",
      "d12_lsh_exact_pipeline" -> "two-stage dedup: LSH candidates -> exact sorted-intersect verification",
      "l01_lance_scan_golden" -> "lance DSv2 columnar scan with column pruning",
      "l03_lance_vector_search" -> "scaled-long exact cosine over a lance dataset (columnar list<float> scan)",
      "l05_lance_delete" -> "deletion-vector-masked lance scan (row reader, live-row stats)",
      "e06c_ann_sql" -> "AnnTopKRewrite: ORDER BY graft_cosine DESC LIMIT k -> probe-list zone filter on the persisted IVF index (pruned fragments)",
      "q02_case_project" -> "sort narrow source columns; CASE/try_cast projection ABOVE the sort (range-exchange sampling re-executes only the cheap child)",
      "d10_rolling_hash" -> "map-only RollingDocHash kernel (replaces double posexplode + two keyed aggregations)",
      "e06d_ann_filtered" -> "filtered ANN (prefilter): user predicate kept, probe filter nested beneath, index fragments pruned",
      "l10_lance_take" -> "take path: pushed _rowaddr IN-list plans one fragment, decodes only owning pages",
      "f03_fts_search" -> "persisted FTS probe: term IN-list pushed into the postings scan (term-range fragments pruned), broadcast vocabulary join, fixed-point BM25, fused top-k",
      "d20_dup_span_coverage" -> "map-only gram-hash kernel -> 8-byte-key census -> skinny mark-back join (no strings shuffle)",
      "d21_pipeline_end2end" -> "quality gate -> dedup window -> budget window chained: one kernel scan, three shuffles total",
      "l20_runtime_prune" -> "dynamic pruning: the dim's realized key set reaches the lance scan as RuntimeFilters (fragments pruned at execution, join re-checks)",
      "d28_minhash_portable" -> "portable minhash: identical-signature collapse -> md5 bands mapped injectively to longs -> bucket-local kernel -> pair expansion",
      "d34_neardup_capped" -> "bounded near-dup contract: same portable sketch as d28, per-doc K-smallest partners from sliced group arrays + bounded neighbor menus — linear output, no pair materialization",
      "l21_partitioned_join" -> "storage-partitioned join: co-partitioned lance facts (KeyGroupedPartitioning) — join without exchange (broadcast at this SF; SPJ pinned in LancePartitionSpec)",
      "l22_partitioned_agg" -> "partition-key aggregation over a lang-partitioned corpus: partial aggs per value-fragment ARE the groups",
      "l23_bucketed_join" -> "bucket(16,key) SPJ through the lance catalog's bucket function: SMJ directly over the two scans, no join exchange",
      "e12_binary_quant" -> "binary quantization: sign-pack + hamming codegen kernels, top-50 candidates, exact integer-cosine re-rank",
      "d29_url_dedup" -> "URL canonicalize (map-only) -> canonical-URL survivor groupBy -> TopKAgg domain quota -> census join",
      "d31_heavy_hitters" -> "mergeable Misra-Gries summary (bounded map-side partials) -> broadcast-candidate exact recount -> provably-exact top-20",
      "d32_chunking" -> "map-only chunking: sequence+posexplode per doc, md5-pinned windows, no shuffle before the presentation sort",
      "l26_days_partitioned" -> "days(ts) SPJ through the catalog's days function: day-fragments zip on the raw timestamp (plan pinned in LanceDaysSpec)",
      "q67b_sample_reservoir" -> "portable reservoir(n): bottom-n by keyed md5 plans as TakeOrderedAndProject — per-partition O(n) heaps, no global sort",
      "f08_fts_boolean" -> "boolean FTS: ONE term-pruned postings scan + ONE per-doc aggregate answers must/should/must_not (no per-clause re-read, no semi/anti joins)",
      "e14_int8_quant" -> "int8 scalar quantization: integer-exact codes + int64 dots, broadcast query code, fused top-k")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of flagship queries (sf0.001)\n\n")
    sb.append("Generated by `graft.PlanDump`; the shapes asserted in PlanSpec.\n")
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n_${note}_\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plandump] wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
