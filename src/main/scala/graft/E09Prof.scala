package graft

import org.apache.spark.sql.functions._

/** Stage-level attribution for e09 (SemDeDup) at a given scale — the
  * round-11 verdict measured a sf10 ratio of 39.7 vs the contracted
  * N^1.5 ≈ 31.6 and asked where the extra ~25% goes. This main times the
  * pipeline's three stages in isolation:
  *
  *   1. K-means blocking (the IVF clustering fit + assignment),
  *   2. the within-cluster pair join + cosine threshold,
  *   3. connectedComponents over the surviving pairs (per-round
  *      localCheckpoint I/O included).
  *
  * Usage: `runMain graft.E09Prof <sfDir>` — prints one line per stage.
  * Stages are cut by materializing each intermediate with a noop write
  * (the same measurement convention as Bench), so a stage's time is not
  * inflated by downstream lineage.
  */
object E09Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "localdata/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.lance", "graft.sources.lance.LanceCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables.register(spark, dir)
    val emb = t("embeddings")
    val n = emb.count()
    val nClusters = math.max(16, math.ceil(math.sqrt(n / 8.0)).toInt)
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[e09prof] $dir $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup (codegen + table caches)
    emb.limit(1).collect()
    val (indexed0, _) = timed(s"1_kmeans_blocking(k=$nClusters)") {
      val v = graft.operators.Similarity.ivfIndexCached(
        emb, "vec_id", "embedding", nClusters, "e09prof:embedding")
      v._1.write.format("noop").mode("overwrite").save()
      v
    }
    val indexed = indexed0.localCheckpoint(true)
    val pairs = timed("2_pair_join+threshold") {
      val a = indexed.select(col("list_id"), col("vec_id").as("id_a"),
                             col("embedding").as("va"))
      val b = indexed.select(col("list_id").as("lb"), col("vec_id").as("id_b"),
                             col("embedding").as("vb"))
      val p = a.join(b, col("list_id") === col("lb") && col("id_a") < col("id_b"))
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
                graft.operators.Similarity.cosine(col("va"), col("vb")).as("cos"))
        .filter(col("cos") >= 0.92)
        .select("doc_a", "doc_b")
        .localCheckpoint(true)
      println(s"[e09prof] $dir pairs=${p.count()}")
      p
    }
    timed("3_connected_components") {
      graft.operators.Dedup.connectedComponents(
          emb.select(col("vec_id")), "vec_id", pairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
