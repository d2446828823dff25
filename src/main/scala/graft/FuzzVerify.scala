package graft

import org.apache.spark.sql.SparkSession

/** Differential-fuzzing runner: executes a generated common-subset SQL set
  * (scripts/fuzzgen.py) through `spark.sql` and dumps results in the same
  * layout `graft.Verify` uses — each query's SQL text doubles as its own
  * DuckDB oracle, so `scripts/selfcheck.py` compares the two engines
  * value-for-value with zero extra plumbing.
  *
  * Not part of the driver contract: this is the repo's own confidence
  * harness for the relational surface (the FtsSpec randomized-differential
  * idea, generalized to SQL). Usage:
  *
  *   python3 scripts/fuzzgen.py 42 150 /tmp/fuzz.json
  *   sbt "runMain graft.FuzzVerify /root/testdata/sf0.01 /tmp/fuzzout /tmp/fuzz.json"
  *   python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/fuzzout
  */
object FuzzVerify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, queryFile) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    new java.io.File(outDir).mkdirs()

    // the file is a flat {"name": "sql"} object written by fuzzgen.py —
    // parse with the same no-extra-deps regex convention Bench uses
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(queryFile)), "UTF-8")
    val qs = """"(fz[^"]+)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) ->
        m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq.sortBy(_._1)
    require(qs.nonEmpty, s"no fz* queries parsed from $queryFile")

    var failed = 0
    qs.foreach { case (name, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz] $name failed: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200))
      }
    }
    // oracle_sql.json: identity — the query IS its own oracle
    val esc = qs.map { case (n, s) =>
      "\"" + n + "\": \"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "; case c => c.toString
      } + "\""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"), esc.getBytes("UTF-8"))
    println(s"[fuzz] ran ${qs.size} queries, $failed spark-side failures")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
