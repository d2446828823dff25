package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run named queries and print the FINAL adaptive physical plan
  * (joins / exchanges / scans only). `sbt "runMain graft.ExplainQ <sfDir>
  * <query...>"`. Complements TimeQ: TimeQ answers "how fast", this answers
  * "what shape did AQE actually pick" — e.g. it shows q04/q05's star joins
  * all converting to broadcast at sf0.1 (no shuffle join at all), which a
  * static explain() before execution does not.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.drop(1)) {
      val df = SparkEntry.queries(n)(spark, args(0))
      df.write.format("noop").mode("overwrite").save()
      println(s"=== $n (final adaptive plan) ===")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
                     l.contains("AQE") || l.contains("Scan "))
        .mkString("\n"))
    }
    spark.stop()
  }
}
