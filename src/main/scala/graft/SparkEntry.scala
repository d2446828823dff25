package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared correctness contract: one entry per operator
  * group from SURVEY §2.2 (relational surface) and §2.5 ([EXT] pipeline
  * operators). Every SQL-expressible entry has a DuckDB oracle twin in
  * `oracleSql` with identical output column names and a total ORDER BY.
  */
object SparkEntry {

  /** All declared queries, in registry order. */
  val allDefs: Seq[QDef] =
    CoreAgg.defs ++ Joins.defs ++ Windows.defs ++ SetsAndShape.defs ++
      Scalars.defs ++ Arrays.defs ++ TextOps.defs ++ VectorOps.defs ++
      LanceOps.defs ++ Extras.defs ++ Extras2.defs ++ Extras3.defs ++
      Search.defs ++ HybridQ.defs ++ TrainOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
