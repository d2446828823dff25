package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the d07 scale row (round-15 verdict ask: if the sf100
  * min stays above the data ratio, name the component that grows).
  * Times the [[graft.operators.Dedup.minHashLsh]] pipeline's stages
  * separately at one SF dir and reports the STRUCTURAL census that
  * explains them:
  *
  *  - `sig_reps_sec`: signature kernel + distinct-signature collapse
  *    (the first localCheckpoint) — corpus-linear by construction;
  *  - `census_sec`: band explode + hot-bucket aggregate (the second
  *    checkpoint) — corpus-linear skinny shuffle;
  *  - `kernel_sec`: full pipeline wall minus the two stages above —
  *    hot-row ship + bucket-local pair kernel + survivor join-back;
  *  - `hot_buckets` / `hot_rows` / `max_bucket` / `pair_compares`
  *    (Σ n·(n−1)/2 over hot buckets — the kernel's compare budget,
  *    before first-band ownership skips) / `out_pairs`: the numbers a
  *    cross-SF ratio should be read against — compare budget is a
  *    property of the FIXTURE's bucket density, not of the plan.
  *
  * Usage: runMain graft.DedupDecomp <sfDir> [numHashes bands tau]
  * (defaults: d07's 64 8 0.82). Prints one JSON line.
  */
object DedupDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numHashes = if (args.length > 1) args(1).toInt else 64
    val bands = if (args.length > 2) args(2).toInt else 8
    val tau = if (args.length > 3) args(3).toDouble else 0.82
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.load(spark, sfDir, "documents")

    // warm-up: one full-pipeline pass (reported as warmup_full_sec but
    // excluded from the decomposition) so the stage timings below
    // are measured in the same regime (OS page cache, JIT) as the timed
    // full run — without it, cold-cache stage timings subtracted from a
    // warm re-execution systematically understate kernel_sec. The
    // residual boundary error (checkpoint materialization vs in-pipeline
    // stage fusion) is ~1 job and noted in the emitted JSON.
    val (_, tWarm) = secs {
      Dedup.minHashLsh(docs, "doc_id", "text", numHashes, bands, tau).count()
    }

    // stage A — mirrors minHashLsh's signature collapse exactly
    val (reps, tA) = secs {
      Dedup.minHashSignatures(docs, "doc_id", "text", numHashes)
        .groupBy("sig")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .withColumn("gid", monotonically_increasing_id())
        .localCheckpoint(true)
    }
    val nReps = reps.count()

    // stage B — mirrors bucketLocalPairsFrom's census
    val (hot, tB) = secs {
      reps.select(col("gid"),
          graft.functions.SketchAggs.bandHashes(col("sig"), bands).as("bhs"))
        .select(col("gid"), posexplode(col("bhs")))
        .groupBy(col("pos").as("band"), col("col").as("bandHash"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .localCheckpoint(true)
    }
    val censusRow = hot.agg(
        count(lit(1)).as("buckets"), coalesce(sum("n"), lit(0L)).as("rows"),
        coalesce(max("n"), lit(0L)).as("maxb"),
        coalesce(sum((col("n") * (col("n") - 1) / 2).cast("long")), lit(0L)).as("cmp"))
      .head()

    // full pipeline wall, warm like the stages (stage C = full − A − B,
    // boundary effects ~1 job)
    val (outPairs, tFull) = secs {
      Dedup.minHashLsh(docs, "doc_id", "text", numHashes, bands, tau).count()
    }

    def f(v: Double): String = BigDecimal(v).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toString
    println(
      s"""{"metric":"d07_decomp","sf":"$sfDir","num_hashes":$numHashes,""" +
      s""""bands":$bands,"tau":$tau,"docs":${docs.count()},""" +
      s""""distinct_sigs":$nReps,"sig_reps_sec":${f(tA)},""" +
      s""""census_sec":${f(tB)},"full_sec":${f(tFull)},""" +
      s""""warmup_full_sec":${f(tWarm)},""" +
      s""""kernel_sec":${f(math.max(0.0, tFull - tA - tB))},""" +
      s""""timing_note":"all decomposition passes run after one """ +
      s"""full-pipeline warm-up (page cache + JIT); kernel_sec residual """ +
      s"""boundary error ~1 job (checkpoint materialization vs """ +
      s"""in-pipeline fusion)",""" +
      s""""hot_buckets":${censusRow.getLong(0)},""" +
      s""""hot_rows":${censusRow.getLong(1)},""" +
      s""""max_bucket":${censusRow.getLong(2)},""" +
      s""""pair_compares":${censusRow.getLong(3)},""" +
      s""""out_pairs":$outPairs}""")
    spark.stop()
  }
}
