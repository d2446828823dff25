package graft.sources.lance

import org.apache.spark.sql.SparkSession

/** Dataset maintenance operations.
  *
  * `compact` is the small-files remedy every long-lived 100 TB dataset
  * needs: streaming appends (one fragment per micro-batch/task) fragment
  * the dataset; scan parallelism and footer/metadata overhead degrade.
  * Compaction rewrites the current version's rows into `targetFragments`
  * larger fragments as a NEW version — old versions remain readable via
  * `versionAsOf` (lance versioning semantics), so it is safe to run while
  * readers hold older manifests.
  */
object LanceMaintenance {

  /** Rewrite the dataset into `targetFragments` fragments; returns the new
    * version number. Data is unchanged (same rows, new layout). */
  def compact(spark: SparkSession, path: String, targetFragments: Int = 1): Long = {
    require(targetFragments > 0, "targetFragments must be positive")
    spark.read.format("lance").load(path)
      .repartition(targetFragments)
      .write.format("lance").mode("overwrite").save(path)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(path, conf)
    LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, None)).version
  }
}
