package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost story for [[graft.operators.Similarity.ivfUpdateIndex]] (the
  * crate's `optimize_indices` for IVF): per fixture dir, build an index
  * over the 80% slice (`vec_id % 5 <> 0`), append the 20% tail, then
  * time the INCREMENTAL update against a FULL rebuild at the same head.
  * The claims under test, as numbers instead of arguments:
  *
  *  - update ≪ rebuild at the same SF (no re-train, no 80% rewrite);
  *  - update scales with the TAIL across a decade (O(tail): its
  *    cross-SF ratio tracks the data ratio while staying a fraction of
  *    the rebuild, whose K-means sample fit + full assignment + full
  *    rewrite it skips).
  *
  * Usage: runMain graft.IvfUpdateBench <embDir1> [embDir2 ...] — dirs
  * need only embeddings.parquet. Prints one JSON line with per-dir
  * seconds and the rebuild/update ratio.
  */
object IvfUpdateBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfUpdateBench <embDir> [embDir...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    def secs[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = f"$v%.3f"

    val rows = args.toSeq.map { dir =>
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") > 0)
      val n = corpus.count()
      val nLists = math.min(1024,
        math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
      val base = java.nio.file.Files.createTempDirectory("ivf_updbench").toString
      val src = s"$base/corpus.lance"
      // the PQ flavor runs the SAME protocol on the SAME corpus head
      // (its own index dir: separate sidecars, separate meta), so the
      // two flavors' numbers share one fixture and one page-cache regime
      val pqIx = s"$base/pqix"
      corpus.filter(col("vec_id") % 5 =!= 0)
        .write.format("lance").mode("overwrite").save(src)
      val tBuild80 = secs {
        Similarity.ivfBuildPersistLance(spark, src, "vec_id", "embedding",
          nLists, indexPath = base)
      }
      val tPqBuild80 = secs {
        Similarity.ivfPqBuildPersistLance(spark, src, "vec_id", "embedding",
          nLists, indexPath = pqIx)
      }
      corpus.filter(col("vec_id") % 5 === 0)
        .write.format("lance").mode("append").save(src)
      val tUpdate = secs {
        Similarity.ivfUpdateIndex(spark, src, base, "vec_id", "embedding")
      }
      val tPqUpdate = secs {
        Similarity.ivfPqUpdateIndex(spark, src, pqIx, "vec_id", "embedding")
      }
      // the alternative the update replaces: a full rebuild at the head
      val tRebuild = secs {
        Similarity.ivfBuildPersistLance(spark, src, "vec_id", "embedding",
          nLists, indexPath = base)
      }
      val tPqRebuild = secs {
        Similarity.ivfPqBuildPersistLance(spark, src, "vec_id", "embedding",
          nLists, indexPath = pqIx)
      }
      println(f"[ivf-update] $dir n=$n lists=$nLists " +
        f"build80=$tBuild80%.2f update=$tUpdate%.2f rebuild=$tRebuild%.2f " +
        f"pq_build80=$tPqBuild80%.2f pq_update=$tPqUpdate%.2f pq_rebuild=$tPqRebuild%.2f")
      s""""$dir":{"rows":$n,"n_lists":$nLists,""" +
      s""""build80_sec":${f3(tBuild80)},"update_sec":${f3(tUpdate)},""" +
      s""""rebuild_sec":${f3(tRebuild)},""" +
      s""""rebuild_over_update":${f3(tRebuild / tUpdate)},""" +
      s""""pq_build80_sec":${f3(tPqBuild80)},"pq_update_sec":${f3(tPqUpdate)},""" +
      s""""pq_rebuild_sec":${f3(tPqRebuild)},""" +
      s""""pq_rebuild_over_update":${f3(tPqRebuild / tPqUpdate)}}"""
    }
    println(
      s"""{"metric":"ivf_update_cost","note":"per dir: index built over""" +
      s""" the 80% slice, 20% appended, then incremental ivfUpdateIndex""" +
      s""" (assign tail to existing centroids + mergeInsert) timed against""" +
      s""" a full rebuild at the same head — the operation it replaces.""" +
      s""" Single pass per dir (the update is a one-shot state transition;""" +
      s""" min-of-N would time a no-op). pq_* keys: the IVF_PQ flavor under""" +
      s""" the same protocol on the same corpus (tail encodes with the""" +
      s""" EXISTING centroids+codebooks; rebuild re-trains codebooks on a""" +
      s""" fresh sample and re-encodes+rewrites every row's code).",""" +
      s""""dirs":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
