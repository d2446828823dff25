package graft.sources.lance

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (dynamic-pruning) filtering on the lance scan
  * (SupportsRuntimeV2Filtering): after a join's build side materializes,
  * Spark hands the realized key set to the scan, which prunes fragments
  * whose [min,max] stats cannot contain any key. The 100 TB story: a
  * selective dim filter cuts a fact scan to the few fragments it touches
  * — without any static predicate on the fact table.
  */
class LanceRuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpDs(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.delete()
    f.getAbsolutePath + "/ds.lance"
  }

  /** Minimal V2 literal (LiteralValue's companion isn't public in this
    * build); value is in Catalyst-internal form, as Spark ships it. */
  private case class Lit(v: Any, dt: DataType)
      extends org.apache.spark.sql.connector.expressions.Literal[Any] {
    override def value(): Any = v
    override def dataType(): DataType = dt
  }

  private def inPredicate(col: String, vs: Seq[Any], dt: DataType): Predicate =
    new Predicate("IN",
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column(col)) ++ vs.map(v => Lit(v, dt)))

  test("IN predicate over longs translates to an in-list zone filter") {
    val zs = LanceScan.runtimeZone(inPredicate("id", Seq(3L, 9L), LongType))
    assert(zs == Seq(ZoneFilter("id", "in", 0.0, values = Seq(3.0, 9.0))))
  }

  test("IN predicate over strings translates to prefix in-list") {
    val zs = LanceScan.runtimeZone(inPredicate("k",
      Seq(UTF8String.fromString("EUROPE"), UTF8String.fromString("ASIA")), StringType))
    assert(zs.length == 1 && zs.head.isStr && zs.head.op == "in")
    assert(zs.head.strPrefixes ==
      Seq("EUROPE", "ASIA").map(s => ZoneFilter.prefixLong(s.getBytes("UTF-8"))))
  }

  test("oversized IN list collapses to a [min,max] range pair") {
    val vs = (0 until 5000).map(i => java.lang.Long.valueOf(i * 2L))
    val zs = LanceScan.runtimeZone(inPredicate("id", vs, LongType))
    assert(zs == Seq(ZoneFilter("id", ">=", 0.0), ZoneFilter("id", "<=", 9998.0)))
  }

  test("non-literal / unsupported predicates translate to nothing") {
    val p = new Predicate("IS_NULL",
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("id")))
    assert(LanceScan.runtimeZone(p).isEmpty)
  }

  test("runtime IN keys prune fragments via manifest stats") {
    val ds = tmpDs("lance_rtf")
    // global range sort on id -> 8 fragments with disjoint id ranges
    spark.range(80000).selectExpr("id", "id % 100 AS grp")
      .write.format("lance")
      .option("sortBy", "id").option("writePartitions", "8")
      .mode("overwrite").save(ds)
    val schema = spark.read.format("lance").load(ds).schema
    val scan = new LanceScanBuilder(ds, schema, None).build().asInstanceOf[LanceScan]
    val before = scan.planInputPartitions().length
    assert(before == 8, s"expected 8 fragments, got $before")
    // keys that all live in ONE fragment's id range
    scan.asInstanceOf[SupportsRuntimeV2Filtering]
      .filter(Array(inPredicate("id", Seq(100L, 2000L, 7777L), LongType)))
    val after = scan.planInputPartitions().length
    assert(after == 1, s"runtime filter left $after fragments planned")
    // conservative: keys outside every range plan zero fragments
    scan.asInstanceOf[SupportsRuntimeV2Filtering]
      .filter(Array(inPredicate("id", Seq(999999999L), LongType)))
    assert(scan.planInputPartitions().isEmpty)
  }

  test("join against a filtered dim dynamically prunes the lance fact scan") {
    val ds = tmpDs("lance_dpp")
    spark.range(80000).selectExpr("id", "id % 8 AS bucket", "id * 2 AS v")
      .write.format("lance")
      .option("sortBy", "id").option("writePartitions", "8")
      .mode("overwrite").save(ds)
    import spark.implicits._
    // dim must be a file-based relation with a SURVIVING filter — a local
    // relation folds the filter away and PartitionPruning sees no
    // pruning-side predicate. Kept keys all land in fragment 0's id
    // range [0, 10000).
    val dimPath = java.nio.file.Files.createTempDirectory("rtf_dim").toString
    (0 until 500).map(i => (i.toLong * 100, if (i < 50) "keep" else "drop"))
      .toDF("fk", "name").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("rtf_dim")
    spark.read.format("lance").load(ds).createOrReplaceTempView("rtf_fact")
    val df = spark.sql(
      """SELECT f.id, f.v, d.name FROM rtf_fact f
        |JOIN rtf_dim d ON f.id = d.fk WHERE d.name = 'keep'""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0 until 50).map(_.toLong * 100))
    // the executed plan carried a runtime filter into the lance scan
    // (AQE wraps finished stages in leaf QueryStageExec nodes — unwrap)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(df.queryExecution.executedPlan)
      .filter(_.scan.isInstanceOf[LanceScan])
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val installed = scans.head.scan.asInstanceOf[LanceScan].installedRuntimeFilters
    assert(installed.nonEmpty,
      s"no runtime filter reached the scan:\n${df.queryExecution.executedPlan}")
  }
}
