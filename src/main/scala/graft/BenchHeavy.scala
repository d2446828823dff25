package graft

import org.apache.spark.sql.SparkSession

/** Scale-decade smoke for the heavy families (dedup / sketch / FTS /
  * lance-lifecycle): runs each query at TWO scale factors with the same
  * session config as [[Bench]] and writes per-query seconds + the
  * sf-big/sf-small ratio to a JSON artifact. The point is the RATIOS: a
  * component whose cost grows faster than its declared contract (linear
  * for the production faces, quadratic only for the declared-contract
  * oracle twins) shows up as a ratio far above the data ratio.
  *
  * Usage: `runMain graft.BenchHeavy <sfSmallDir> <sfBigDir> <outFile>`
  * (defaults: localdata/sf1 localdata/sf10 BENCH_SF10_HEAVY.json). The
  * small SF runs two passes (min); the big SF runs one pass — decade
  * queries are seconds-to-minutes long, far above the job-overhead floor.
  */
object BenchHeavy {
  /** Queries excluded from the BIG scale factor, each with the reason
    * recorded in the artifact. Empty since round 11: the d06/d11 pair
    * stage moved to a prefix-filtered exact set-similarity join and d28's
    * candidates to the bucket-local kernel, so every heavy family now
    * completes the decade in-sandbox. */
  val bigSkip: Map[String, String] = Map.empty

  val heavy: Seq[String] = Seq(
    "d06_jaccard_pairs", "d07_minhash_lsh", "d11_cluster_dedup",
    "d23_dsir_sample", "d28_minhash_portable", "d33_fuzzy_decontaminate",
    "d34_neardup_capped", "e09_semantic_dedup",
    // ANN family (round 12): builds should track the data ratio, probes
    // should stay sub-linear (sqrt-scaled IVF lists + fragment pruning).
    // Since round 13 every probe row (e06_ivf_topk, e06b, e08_ivfpq_topk,
    // e10) reads a PERSISTED index; their fixtures are built by the
    // preceding build rows or warmed once untimed (warmOnce below), so
    // the timed rows measure probes.
    "e06_build", "e06_ivf_topk", "e06b_ivf_probe",
    "e08_build", "e08_ivfpq_topk", "e10_batch_ann", "e12_binary_quant",
    "f01_bm25_rank", "f02_fts_build", "f03_fts_search", "f04_fts_phrase",
    "f05_fts_sql_rewrite", "f06_fts_live", "f07_fts_phrase_indexed",
    "f08_fts_boolean", "f09_fts_fuzzy",
    "l21_partitioned_join", "l22_partitioned_agg", "l23_bucketed_join",
    "l24_incremental_matview", "l25_ndv_sidecar", "l26_days_partitioned",
    "l27_joined_matview")

  private def jstr(s: String): String =
    "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString } + "\""

  def main(args: Array[String]): Unit = {
    val sfSmall = if (args.length > 0) args(0) else "localdata/sf1"
    val sfBig   = if (args.length > 1) args(1) else "localdata/sf10"
    val outFile = if (args.length > 2) args(2) else "BENCH_SF10_HEAVY.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.lance", "graft.sources.lance.LanceCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      // UNLIKE Bench's sf0.1 config: decade queries are DISK-bound (d28's
      // declared-quadratic pair dump sorts ~560M rows at sf10 — the
      // uncompressed spill exhausted this sandbox's disk), so shuffle and
      // spill compression stay ON here. At sf0.1 the codec CPU dominates
      // and Bench keeps them off.
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    // Rows whose one-time fixture (persisted index / co-partitioned
    // layout) no EARLIER row builds: run once untimed so a 1-pass
    // (sf_big) measurement times the PROBE or JOIN, not the first-touch
    // build. e10's batch-corpus index build is the e06_build operation on
    // a 99.99%-identical corpus — its cost is already a labeled row.
    // l21/l23 exist to show the ZERO-SHUFFLE co-partitioned join; their
    // bucketed layout write is the offline cost (one clustered exchange
    // per table, data-ratio-proportional, same machinery l02 labels).
    val warmOnce = Set("e10_batch_ann", "l21_partitioned_join",
                       "l23_bucketed_join")
    def measure(dir: String, passes: Int,
                skip: Map[String, String]): Map[String, Either[String, Double]] = {
      Tables.register(spark, dir)
      Tables.names.foreach(n => spark.table(n).limit(1).collect())
      runOnce("d01_dedup_by_key", dir) // session/codegen warmup
      heavy.map { n =>
        val r =
          if (skip.contains(n)) Left("SKIPPED")
          else try {
            if (warmOnce.contains(n) && passes < 2) runOnce(n, dir)
            Right((1 to passes).map(_ => runOnce(n, dir)).min)
          }
          catch { case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}") }
        println(f"[heavy] $dir $n%-26s ${r.fold(identity, t => f"$t%8.3f s")}")
        n -> r
      }.toMap
    }
    val small = measure(sfSmall, 2, Map.empty)
    val big   = measure(sfBig, 1, bigSkip)

    val rows = heavy.map { n =>
      val bigPart = bigSkip.get(n) match {
        case Some(reason) => s""""sf_big_skipped":${jstr(reason)}"""
        case None =>
          big(n).fold(e => s""""sf_big_error":${jstr(e)}""", t => f""""sf_big":$t%.3f""")
      }
      val parts = Seq(
        small(n).fold(e => s""""sf_small_error":${jstr(e)}""", t => f""""sf_small":$t%.3f"""),
        bigPart) ++
        (for (s <- small(n).toOption; b <- big(n).toOption)
          yield f""""ratio":${b / s}%.2f""")
      s"${jstr(n)}:{${parts.mkString(",")}}"
    }
    def total(m: Map[String, Either[String, Double]]) =
      m.values.collect { case Right(t) => t }.sum
    val json =
      s"""{"metric":"heavy_scale_smoke","sf_small":${jstr(sfSmall)},""" +
      s""""sf_big":${jstr(sfBig)},"data_ratio":10,""" +
      f""""total_sf_small":${total(small)}%.1f,"total_sf_big":${total(big)}%.1f,""" +
      s""""note":"sf_small = min of 2 passes; sf_big = 1 pass (decade queries sit far above the job floor). Lifecycle queries (l24/l26/l27, f02) are commit-count-bound, not data-bound. Every ANN probe row (e06_ivf_topk, e06b_ivf_probe at nProbe=12, e08_ivfpq_topk, e10_batch_ann) reads a PERSISTED index; fixtures are built by the labeled build rows or warmed once untimed, so probe rows measure probes. l21/l23 likewise warm their one-time co-partitioned layout untimed: the timed row is the zero-shuffle join those layouts exist for (the layout write is the offline cost). Rows with per-JVM build memoization (f02/f05/f06, e08_build) report a WARM second pass at sf_small but a build-inclusive first pass at sf_big. Convention: a round-over-round sf_big delta inside the ~25% ambient band is adjudicated by interleaved same-session runs of both trees (min of 5), not by comparing artifacts across days — see NOTES.",""" +
      s""""queries":{${rows.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
