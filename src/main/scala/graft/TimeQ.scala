package graft

/** Dev harness: time named queries. `runMain graft.TimeQ <sfDir> <q1> [q2...]`
  * — same session config as Bench, per-query wall seconds to stdout. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.lance", "graft.sources.lance.LanceCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      // single-file testdata tables: split scans at row-group grain so a
      // 10x-SF table still fans out across cores (at cluster scale the
      // many-files default of 128m is right; this knob matches the
      // sandbox's one-file-per-table layout)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      // sf0.1 default: codec CPU beats the tmpfs-fast disks. Decade runs
      // (sf10) are DISK-bound instead — flip via env (BenchHeavy does)
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    Tables.names.foreach(n => spark.table(n).limit(1).collect())
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[timeq] $n%-28s $t%8.3f s")
    }
    spark.stop()
  }
}
