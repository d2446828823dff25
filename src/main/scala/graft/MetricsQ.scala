package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Dev tool: run named queries (Bench session config) and print the FINAL
  * adaptive physical plan annotated with per-operator runtime metrics
  * (rows out, per-metric times). `runMain graft.MetricsQ <sfDir> <q...>`.
  * This is how §1 of the optimization guide's "where is the time going"
  * question gets answered without the UI (disabled in this sandbox).
  */
object MetricsQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
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
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    Tables.names.foreach(n => spark.table(n).limit(1).collect())

    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        m.value > 0 && (k.contains("Rows") || k.contains("time") ||
          k.contains("Time") || k.contains("dataSize") || k == "numPartitions")
      }
      val ms = interesting.toSeq.sortBy(_._1).map { case (k, m) =>
        s"$k=${m.value}" }.mkString(" ")
      println(("  " * depth) + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case r: ReusedExchangeExec => walk(r.child, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach { sq => println(("  " * (depth + 1)) + "SUBQUERY:");
        walk(sq, depth + 2) }
    }

    names.foreach { n =>
      // two runs: metrics read from the second (warm) one. The warm pass
      // executes THIS DataFrame's own QueryExecution (toRdd) — a noop
      // write would plan a separate QueryExecution and leave these
      // metric accumulators untouched.
      val df0 = SparkEntry.queries(n)(spark, sfDir)
      df0.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"=== $n (wall $wall%.3f s, warm pass) ===")
      walk(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
