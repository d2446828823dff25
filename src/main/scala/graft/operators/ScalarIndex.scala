package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar (BTREE-analogue) index over a lance dataset — the lance crate's
  * `create_scalar_index` re-expressed Spark-first (`/root/reference/
  * Cargo.lock`: `lance-index` ships btree/bitmap scalar indexes; the
  * reference surfaces them through the lance scan's pushdown).
  *
  * Structure: the index IS a lance dataset of `(key, addr)` pairs written
  * globally sorted by key (`sortBy` → RequiresDistributionAndOrdering →
  * range-disjoint fragments). A point/range probe therefore prunes to the
  * one fragment (and page) whose manifest stats cover the key — the same
  * mechanism a BTREE's interior nodes provide, expressed as zone maps.
  * The probe returns row ADDRESSES, and the fetch goes through the take
  * path: a pushed `_rowaddr` IN-list plans only the owning fragments and
  * decodes only the owning pages.
  *
  * At 100 TB: a lookup touches one index fragment (~1/writePartitions of
  * the skinny key+addr sidecar) plus the take pages — never the corpus.
  * The collect between probe and fetch is the index's result — a bounded
  * row-id list, exactly what the crate's btree hands its take; `maxRows`
  * fails loudly if a mis-used "lookup" would materialize a scan-sized
  * result on the driver (use a plain pushed filter for that).
  *
  * Staleness contract (same as the crate): the index addresses the
  * VERSION it was built from. Rows appended later are not covered until
  * [[build]] runs again; rows deleted later are masked by the take path's
  * deletion-vector handling (a stale addr fetches nothing, never a wrong
  * row).
  */
object ScalarIndex {

  /** Build (or rebuild) the index sidecar for `keyCol`. One range shuffle
    * of `(key, addr)` — the index build is the offline cost. The source
    * head version is recorded alongside (`meta.lance`) so [[lookupCombined]]
    * can cover the append tail.
    */
  def build(spark: SparkSession, datasetPath: String, keyCol: String,
            indexPath: String, writePartitions: Int = 8): Long = {
    import graft.sources.lance.LanceFormat
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(datasetPath, conf)
    val builtV = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
    spark.read.format("lance").option("versionAsOf", builtV).load(datasetPath)
      .select(col(keyCol).as("key"), col("_rowaddr").as("addr"))
      .write.format("lance")
      .option("sortBy", "key")
      .option("writePartitions", writePartitions.toString)
      .mode("overwrite").save(s"$indexPath/keys.lance")
    spark.createDataFrame(Seq((builtV, keyCol))).toDF("built_version", "key_col")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/meta.lance")
    builtV
  }

  /** Incrementally extend the index over rows appended after the build —
    * the crate's `optimize_indices` for a scalar index, O(tail): the
    * post-build fragments' `(key, addr)` pairs append as NEW range-sorted
    * fragments (existing fragments untouched; a probe prunes by zone maps
    * per fragment, so it opens at most one old + one new fragment), and
    * `meta.lance` advances to the covered version. After an update,
    * [[lookup]] covers exactly what a full [[build]] at the head would —
    * the addr SET is identical, only the fragment layout differs.
    */
  def update(spark: SparkSession, datasetPath: String, indexPath: String,
             writePartitions: Int = 2): Long = {
    import graft.sources.lance.LanceFormat
    val meta = spark.read.format("lance").load(s"$indexPath/meta.lance").head()
    val (builtV, keyCol) = (meta.getLong(0), meta.getString(1))
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(datasetPath, conf)
    val headV = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
    if (headV == builtV) return builtV
    spark.read.format("lance")
      .option("fromVersion", builtV).option("versionAsOf", headV)
      .load(datasetPath)
      .select(col(keyCol).as("key"), col("_rowaddr").as("addr"))
      .write.format("lance")
      .option("sortBy", "key")
      .option("writePartitions", writePartitions.toString)
      .mode("append").save(s"$indexPath/keys.lance")
    spark.createDataFrame(Seq((headV, keyCol))).toDF("built_version", "key_col")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/meta.lance")
    headV
  }

  private def fetchByAddrs(spark: SparkSession, datasetPath: String,
                           probe: DataFrame, maxRows: Int): DataFrame = {
    val addrs = probe.select("addr")
      .limit(maxRows + 1).collect().map(_.getLong(0))
    require(addrs.length <= maxRows,
      s"scalar-index lookup matched > $maxRows rows — this is a scan, " +
        "not a lookup; filter the dataset directly instead")
    val base = spark.read.format("lance").load(datasetPath)
    if (addrs.isEmpty) base.limit(0)
    else base.filter(col("_rowaddr").isin(addrs.toSeq: _*))
  }

  /** Point / IN-list lookup: zone-pruned index probe → take-path fetch. */
  def lookup(spark: SparkSession, datasetPath: String, indexPath: String,
             keys: Seq[Any], maxRows: Int = 100000): DataFrame = {
    val probe = spark.read.format("lance").load(s"$indexPath/keys.lance")
      .filter(col("key").isin(keys: _*))
    fetchByAddrs(spark, datasetPath, probe, maxRows)
  }

  /** Range lookup `lo <= key < hi` — the BTREE range-scan shape; the
    * sorted layout prunes to the covering fragment run.
    */
  def lookupRange(spark: SparkSession, datasetPath: String, indexPath: String,
                  lo: Any, hi: Any, maxRows: Int = 100000): DataFrame = {
    val probe = spark.read.format("lance").load(s"$indexPath/keys.lance")
      .filter(col("key") >= lit(lo) && col("key") < lit(hi))
    fetchByAddrs(spark, datasetPath, probe, maxRows)
  }

  /** Point / IN-list lookup that ALSO covers rows appended after the
    * index build (crate semantics for a stale index — the ANN combined
    * search's scalar twin): index probe for the covered prefix, plus a
    * `fromVersion` CDC scan of ONLY the post-build fragments with the
    * key filter pushed (zone maps still prune inside the tail). Union of
    * addrs, one take fetch; rows deleted since the build stay masked on
    * both sides (index addrs by the take path's deletion vectors, the
    * tail by reading the live dataset).
    */
  def lookupCombined(spark: SparkSession, datasetPath: String,
                     indexPath: String, keys: Seq[Any],
                     maxRows: Int = 100000): DataFrame = {
    val meta = spark.read.format("lance").load(s"$indexPath/meta.lance").head()
    val builtV = meta.getLong(0)
    val keyCol = meta.getString(1)
    val idxProbe = spark.read.format("lance").load(s"$indexPath/keys.lance")
      .filter(col("key").isin(keys: _*)).select("addr")
    val tailProbe = spark.read.format("lance")
      .option("fromVersion", builtV).load(datasetPath)
      .filter(col(keyCol).isin(keys: _*))
      .select(col("_rowaddr").as("addr"))
    fetchByAddrs(spark, datasetPath, idxProbe.unionByName(tailProbe), maxRows)
  }

  /** LABEL_LIST-analogue index over an ARRAY column (the lance-index
    * label-list type, which backs `array_has_any` queries): one
    * `(key, addr)` row per array ELEMENT, sorted by key — the posting-list
    * layout. A membership probe prunes to the labels' fragments; the addr
    * set dedupes before the take (a row tagged with two probed labels
    * fetches once).
    */
  def buildLabels(spark: SparkSession, datasetPath: String, arrayCol: String,
                  indexPath: String, writePartitions: Int = 8): Unit = {
    spark.read.format("lance").load(datasetPath)
      .select(explode(col(arrayCol)).as("key"), col("_rowaddr").as("addr"))
      .write.format("lance")
      .option("sortBy", "key")
      .option("writePartitions", writePartitions.toString)
      .mode("overwrite").save(s"$indexPath/keys.lance")
  }

  /** Rows whose indexed array contains ANY of `labels` (`array_has_any`). */
  def lookupAnyLabel(spark: SparkSession, datasetPath: String,
                     indexPath: String, labels: Seq[Any],
                     maxRows: Int = 100000): DataFrame = {
    val probe = spark.read.format("lance").load(s"$indexPath/keys.lance")
      .filter(col("key").isin(labels: _*))
      .select("addr").distinct()
    fetchByAddrs(spark, datasetPath, probe, maxRows)
  }
}
