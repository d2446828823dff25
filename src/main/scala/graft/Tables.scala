package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture tables (TPC-H-ish star schema + events/documents/embeddings,
  * see TESTDATA.md). Loads parquet from a scale-factor directory and
  * registers temp views so both the DataFrame API and `spark.sql` can be
  * used. Registration is idempotent per (session, dir).
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the parquet reader, so the same code runs unchanged
  * on a multi-executor cluster over object storage.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts normalization is SCHEMA-DRIVEN: earlier testdata shipped
    // parquet TIMESTAMP(NANOS) (read as raw INT64 via nanosAsLong and
    // truncated to micros), current testdata ships TIMESTAMP(MICROS)
    // without UTC adjustment (read as TIMESTAMP_NTZ). Either way the view
    // exposes a session-UTC TimestampType at microsecond precision —
    // matching the DuckDB oracle contract (CAST(ts AS TIMESTAMP)).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val ts = df.schema("ts").dataType match {
        case LongType         => expr("timestamp_micros(ts div 1000)")
        case TimestampNTZType => col("ts").cast("timestamp")
        case _                => col("ts")
      }
      df.withColumn("ts", ts)
    } else df
  }

  /** Register all fixture tables as temp views; returns a loader. */
  def register(spark: SparkSession, dir: String): String => DataFrame = {
    val key = s"graft.tables.dir"
    val already = spark.conf.getOption(key).contains(dir)
    if (!already) {
      names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
      spark.conf.set(key, dir)
    }
    n => spark.table(n)
  }
}
