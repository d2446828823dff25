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
            indexPath: String, writePartitions: Int = 8,
            stableRowIds: Boolean = false): Long = {
    import graft.sources.lance.LanceFormat
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(datasetPath, conf)
    val builtV = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
    // stable mode stores move-stable row IDS instead of addresses: the
    // index keeps answering correctly after the dataset is compacted
    // underneath it (ids survive the move; lookup resolves id -> current
    // address through the manifest's sequences at probe time)
    val addrCol = if (stableRowIds) "_rowid" else "_rowaddr"
    spark.read.format("lance").option("versionAsOf", builtV).load(datasetPath)
      .select(col(keyCol).as("key"), col(addrCol).as("addr"))
      .write.format("lance")
      .option("sortBy", "key")
      .option("writePartitions", writePartitions.toString)
      .mode("overwrite").save(s"$indexPath/keys.lance")
    spark.createDataFrame(Seq((builtV, keyCol, stableRowIds,
        headVersion(spark, s"$indexPath/keys.lance"))))
      .toDF("built_version", "key_col", "stable", "data_version")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/meta.lance")
    builtV
  }

  /** Whether this index stores row ids (vs addresses) — `stable` meta
    * column; absent in pre-stable indexes, defaulting to false. */
  private def isStable(meta: org.apache.spark.sql.Row): Boolean = {
    val i = meta.schema.fieldNames.indexOf("stable")
    i >= 0 && !meta.isNullAt(i) && meta.getBoolean(i)
  }

  /** The PUBLISHED data-sidecar version recorded in meta.lance (None:
    * legacy or label indexes without the column). meta.lance is the
    * index's one atomic publish point: an updater's data-sidecar append
    * is invisible to every reader until the meta overwrite lands, so a
    * fence abort (or crash) between the two commits publishes nothing —
    * the next updater sweeps the orphan tail (restore to the pinned
    * version) instead of re-appending the same rows on top of it. */
  private def dataVersionOf(meta: org.apache.spark.sql.Row): Option[Long] = {
    val i = meta.schema.fieldNames.indexOf("data_version")
    if (i >= 0 && !meta.isNullAt(i)) Some(meta.getLong(i)) else None
  }

  private def metaRowOpt(spark: SparkSession,
                         indexPath: String): Option[org.apache.spark.sql.Row] =
    try Some(spark.read.format("lance").load(s"$indexPath/meta.lance").head())
    catch { case _: Exception => None }

  /** Data-sidecar scan pinned at the published version when meta records
    * one — readers never see a fence-aborted updater's orphan tail. */
  private def pinnedSidecar(spark: SparkSession, indexPath: String,
                            name: String,
                            meta: Option[org.apache.spark.sql.Row]): DataFrame = {
    val base = spark.read.format("lance")
    meta.flatMap(dataVersionOf) match {
      case Some(v) =>
        base.option("versionAsOf", v).load(s"$indexPath/$name.lance")
      case None => base.load(s"$indexPath/$name.lance")
    }
  }

  /** Sweep a fence-aborted predecessor's orphan tail from an append-mode
    * data sidecar: restore it to the published version before we append
    * (overwrite-mode sidecars never need this — their readers pin). */
  private def sweepOrphanTail(spark: SparkSession, indexPath: String,
                              name: String,
                              meta: org.apache.spark.sql.Row): Unit =
    dataVersionOf(meta).foreach { v =>
      if (headVersion(spark, s"$indexPath/$name.lance") != v)
        graft.sources.lance.LanceMaintenance.restore(
          spark, s"$indexPath/$name.lance", v)
    }

  /** Translate a probed `addr` column to CURRENT row addresses: identity
    * for an address index; for a stable index, resolve ids through the
    * head manifest's row-id sequences (driver-side metadata walk). Ids
    * compacted away with their deletes simply vanish — a stale id fetches
    * nothing, never a wrong row.
    */
  private def resolveAddrs(spark: SparkSession, datasetPath: String,
                           stable: Boolean, vals: Array[Long]): Array[Long] =
    if (!stable) vals
    else {
      import graft.sources.lance.LanceFormat
      val conf = spark.sessionState.newHadoopConf()
      val (fs, p) = LanceFormat.fileSystem(datasetPath, conf)
      val m = LanceFormat.readManifest(fs,
        LanceFormat.latestManifestPath(fs, p, None))
      val byId = LanceFormat.addrOfRowIds(m, vals.toSeq)
      vals.flatMap(byId.get)
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
             writePartitions: Int = 2): Long =
    graft.sources.lance.MaintenanceLock.withLockFenced(indexPath,
        spark.sessionState.newHadoopConf()) { fence =>
    import graft.sources.lance.LanceFormat
    val meta = spark.read.format("lance").load(s"$indexPath/meta.lance").head()
    val (builtV, keyCol) = (meta.getLong(0), meta.getString(1))
    val stable = isStable(meta)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(datasetPath, conf)
    val headV = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
    if (headV == builtV) builtV
    else {
      val addrCol = if (stable) "_rowid" else "_rowaddr"
      // the meta overwrite below is the only PUBLISH: readers pin the
      // data_version it records, so a fence abort (clock-skew usurper,
      // swept holder) or crash between the two commits leaves the
      // published index untouched — sweep any such predecessor's orphan
      // tail before appending ours. Fence BEFORE the sweep (the Fts
      // ordering): a usurped holder resuming from a pause must not
      // restore the sidecar to ITS stale meta and delete a successor's
      // freshly-appended tail.
      fence.check()
      sweepOrphanTail(spark, indexPath, "keys", meta)
      spark.read.format("lance")
        .option("fromVersion", builtV).option("versionAsOf", headV)
        .load(datasetPath)
        .select(col(keyCol).as("key"), col(addrCol).as("addr"))
        .write.format("lance")
        .option("sortBy", "key")
        .option("writePartitions", writePartitions.toString)
        .mode("append").save(s"$indexPath/keys.lance")
      fence.check()
      spark.createDataFrame(Seq((headV, keyCol, stable,
          headVersion(spark, s"$indexPath/keys.lance"))))
        .toDF("built_version", "key_col", "stable", "data_version")
        .coalesce(1).write.format("lance").mode("overwrite")
        .save(s"$indexPath/meta.lance")
      headV
    }
  }

  /** Greedy coverage-optimal interval cover: split the sorted addrs at
    * the (maxIntervals - 1) largest gaps — for a fixed interval budget
    * this minimizes covered slack, so page pruning stays tight whether
    * the matches cluster (sorted layout) or scatter. */
  private[graft] def intervalCover(sorted: Array[Long],
                                   maxIntervals: Int): Array[(Long, Long)] = {
    if (sorted.isEmpty) return Array.empty
    val n = sorted.length
    if (n <= maxIntervals) return sorted.map(a => (a, a))
    // indices i where a gap sorted(i+1) - sorted(i) opens; keep the largest
    val gapIdx = (0 until n - 1).sortBy(i => -(sorted(i + 1) - sorted(i)))
      .take(maxIntervals - 1).sorted
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](maxIntervals)
    var start = 0
    for (g <- gapIdx) { out += ((sorted(start), sorted(g))); start = g + 1 }
    out += ((sorted(start), sorted(n - 1)))
    out.toArray
  }

  private def fetchByAddrs(spark: SparkSession, datasetPath: String,
                           probe: DataFrame, maxRows: Int,
                           stable: Boolean = false): DataFrame = {
    val vals = probe.select("addr")
      .limit(maxRows + 1).collect().map(_.getLong(0))
    require(vals.length <= maxRows,
      s"scalar-index lookup matched > $maxRows rows — this is a scan, " +
        "not a lookup; filter the dataset directly instead")
    val addrs = resolveAddrs(spark, datasetPath, stable, vals).sorted
    if (addrs.isEmpty)
      return spark.read.format("lance").load(datasetPath).limit(0)
    // ship the probe result as a <=256-interval cover through a scan
    // option (fragment + page pruning, no 100k-literal In expression);
    // exactness comes from the binary-searched membership kernel below
    val ranges = intervalCover(addrs, 256)
      .map { case (lo, hi) => s"$lo:$hi" }.mkString(",")
    spark.read.format("lance").option("addrRanges", ranges).load(datasetPath)
      .filter(graft.functions.ArrayKernels
        .longInSortedArray(col("_rowaddr"), addrs))
  }

  /** Point / IN-list lookup: zone-pruned index probe → take-path fetch. */
  def lookup(spark: SparkSession, datasetPath: String, indexPath: String,
             keys: Seq[Any], maxRows: Int = 100000): DataFrame = {
    val meta = metaRowOpt(spark, indexPath)
    val probe = pinnedSidecar(spark, indexPath, "keys", meta)
      .filter(col("key").isin(keys: _*))
    fetchByAddrs(spark, datasetPath, probe, maxRows, meta.exists(isStable))
  }

  /** Range lookup `lo <= key < hi` — the BTREE range-scan shape; the
    * sorted layout prunes to the covering fragment run.
    */
  def lookupRange(spark: SparkSession, datasetPath: String, indexPath: String,
                  lo: Any, hi: Any, maxRows: Int = 100000): DataFrame = {
    val meta = metaRowOpt(spark, indexPath)
    val probe = pinnedSidecar(spark, indexPath, "keys", meta)
      .filter(col("key") >= lit(lo) && col("key") < lit(hi))
    fetchByAddrs(spark, datasetPath, probe, maxRows, meta.exists(isStable))
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
    val stable = isStable(meta)
    val addrCol = if (stable) "_rowid" else "_rowaddr"
    val idxProbe = pinnedSidecar(spark, indexPath, "keys", Some(meta))
      .filter(col("key").isin(keys: _*)).select("addr")
    val tailProbe = spark.read.format("lance")
      .option("fromVersion", builtV).load(datasetPath)
      .filter(col(keyCol).isin(keys: _*))
      .select(col(addrCol).as("addr"))
    fetchByAddrs(spark, datasetPath, idxProbe.unionByName(tailProbe), maxRows,
                 stable)
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

  // --------------------------------------------------------------------------
  // BITMAP index (lance-index BITMAP scalar-index type)
  // --------------------------------------------------------------------------

  import graft.sources.lance.Roaring

  private val serBitmap = udf((offs: Seq[Int]) =>
    Roaring.serialize(offs.toArray.sorted))
  private val unionBitmaps = udf((bms: Seq[Array[Byte]]) =>
    Roaring.serialize(bms.flatMap(Roaring.deserialize).distinct.sorted.toArray))
  private val andBitmaps = udf((a: Array[Byte], b: Array[Byte]) => {
    // merge-intersect of two sorted offset arrays
    val xs = Roaring.deserialize(a); val ys = Roaring.deserialize(b)
    val out = Array.newBuilder[Int]
    var i = 0; var j = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) == ys(j)) { out += xs(i); i += 1; j += 1 }
      else if (xs(i) < ys(j)) i += 1 else j += 1
    }
    out.result()
  })

  /** BITMAP-analogue index for LOW-CARDINALITY columns (the lance-index
    * BITMAP scalar-index type): one roaring bitmap of local row offsets per
    * `(key, fragment)`, persisted as a lance sidecar sorted by key. The
    * per-fragment sharding is what makes it distributed — bitmaps build
    * executor-side (the same `Roaring` codec the deletion files use), a
    * probe reads only matched-key rows (zone-pruned), and set algebra
    * (OR within an index, AND across indexes) runs on the skinny
    * `(frag, bitmap)` frames before any row is fetched.
    *
    * Keys are stored in the column's canonical string spelling — bitmap
    * indexes target string/integer dictionary columns where that cast is
    * lossless; probes cast their literals identically.
    */
  def buildBitmap(spark: SparkSession, datasetPath: String, keyCol: String,
                  indexPath: String, writePartitions: Int = 4): Long = {
    val builtV = headVersion(spark, datasetPath)
    bitmapRows(spark, datasetPath, keyCol, Some((0L, builtV)))
      .write.format("lance")
      .option("sortBy", "key")
      .option("writePartitions", writePartitions.toString)
      .mode("overwrite").save(s"$indexPath/bitmaps.lance")
    writeMeta(spark, indexPath, builtV, keyCol,
              headVersion(spark, s"$indexPath/bitmaps.lance"))
    builtV
  }

  private def headVersion(spark: SparkSession, datasetPath: String): Long = {
    import graft.sources.lance.LanceFormat
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(datasetPath, conf)
    LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
  }

  private def writeMeta(spark: SparkSession, indexPath: String,
                        builtV: Long, keyCol: String, dataV: Long): Unit =
    spark.createDataFrame(Seq((builtV, keyCol, dataV)))
      .toDF("built_version", "key_col", "data_version")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/meta.lance")

  /** The per-(key, fragment) bitmap frame; `range = Some((fromV, toV))`
    * restricts to fragments committed in that version window (the
    * incremental-update slice). */
  private def bitmapRows(spark: SparkSession, datasetPath: String,
                         keyCol: String,
                         range: Option[(Long, Long)]): DataFrame = {
    val rd = spark.read.format("lance")
    val src = range match {
      case Some((from, to)) if from > 0 =>
        rd.option("fromVersion", from).option("versionAsOf", to).load(datasetPath)
      case Some((_, to)) => rd.option("versionAsOf", to).load(datasetPath)
      case None => rd.load(datasetPath)
    }
    src.select(col(keyCol).cast("string").as("key"),
               shiftrightunsigned(col("_rowaddr"), 32).as("frag"),
               col("_rowaddr").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("off"))
      .groupBy("key", "frag")
      .agg(count(lit(1)).as("card"),
           serBitmap(sort_array(collect_list(col("off")))).as("bitmap"))
  }

  /** Incrementally extend the bitmap index over post-build appends — new
    * fragments' bitmaps append as new key-sorted rows (a `(key, frag)`
    * never repeats across version windows, so probes stay exact); O(tail).
    */
  def updateBitmap(spark: SparkSession, datasetPath: String,
                   indexPath: String, writePartitions: Int = 2): Long =
    graft.sources.lance.MaintenanceLock.withLockFenced(indexPath,
        spark.sessionState.newHadoopConf()) { fence =>
    val meta = spark.read.format("lance").load(s"$indexPath/meta.lance").head()
    val (builtV, keyCol) = (meta.getLong(0), meta.getString(1))
    val headV = headVersion(spark, datasetPath)
    if (headV == builtV) builtV
    else {
      // see update(): meta is the only publish; fence, sweep a
      // fence-aborted predecessor's orphan tail, then append + publish
      fence.check()
      sweepOrphanTail(spark, indexPath, "bitmaps", meta)
      bitmapRows(spark, datasetPath, keyCol, Some((builtV, headV)))
        .write.format("lance")
        .option("sortBy", "key")
        .option("writePartitions", writePartitions.toString)
        .mode("append").save(s"$indexPath/bitmaps.lance")
      fence.check()
      writeMeta(spark, indexPath, headV, keyCol,
                headVersion(spark, s"$indexPath/bitmaps.lance"))
      headV
    }
  }

  /** Per-fragment OR of the bitmaps matching `keys` (one index) —
    * `(frag, bitmap)`, all executor-side. */
  private def fragBitmaps(spark: SparkSession, indexPath: String,
                          keys: Seq[Any]): DataFrame =
    pinnedSidecar(spark, indexPath, "bitmaps", metaRowOpt(spark, indexPath))
      .filter(col("key").isin(keys.map(_.toString): _*))
      .groupBy("frag")
      .agg(unionBitmaps(collect_list(col("bitmap"))).as("bitmap"))

  /** Rows whose indexed key is IN `keys` — bitmap OR, then take-fetch. */
  def lookupBitmap(spark: SparkSession, datasetPath: String,
                   indexPath: String, keys: Seq[Any],
                   maxRows: Int = 100000): DataFrame = {
    val probe = fragBitmaps(spark, indexPath, keys)
      .select(col("frag"), explode(deserBitmap(col("bitmap"))).as("off"))
      .select((col("frag") * lit(1L << 32) + col("off")).as("addr"))
    fetchByAddrs(spark, datasetPath, probe, maxRows)
  }

  private val deserBitmap = udf((bm: Array[Byte]) => Roaring.deserialize(bm))

  /** Conjunctive probe across TWO bitmap indexes of the same dataset —
    * the query shape bitmap indexes exist for (`WHERE a IN (...) AND
    * b IN (...)`): per index a per-fragment OR over its matched keys,
    * then a per-fragment AND across the indexes via merge-intersect of
    * the compressed offset sets, and ONE take-fetch of the surviving
    * addresses. Rows never materialize before the conjunction.
    */
  def lookupBitmapAnd(spark: SparkSession, datasetPath: String,
                      indexA: String, keysA: Seq[Any],
                      indexB: String, keysB: Seq[Any],
                      maxRows: Int = 100000): DataFrame = {
    val a = fragBitmaps(spark, indexA, keysA)
    val b = fragBitmaps(spark, indexB, keysB)
      .withColumnRenamed("bitmap", "bitmap_b")
    val probe = a.join(b, Seq("frag"))
      .select(col("frag"),
              explode(andBitmaps(col("bitmap"), col("bitmap_b"))).as("off"))
      .select((col("frag") * lit(1L << 32) + col("off")).as("addr"))
    fetchByAddrs(spark, datasetPath, probe, maxRows)
  }

  // --------------------------------------------------------------------------
  // NGRAM index (lance-index NGRAM scalar-index type)
  // --------------------------------------------------------------------------

  /** NGRAM-analogue index for substring (`LIKE '%needle%'` / `contains`)
    * queries over a text column — the lance-index NGRAM type: one
    * `(gram, addr)` posting row per DISTINCT character trigram of each
    * document, range-sorted by gram (the LABEL_LIST layout over derived
    * labels). A needle probe reads only its trigrams' posting fragments.
    */
  def buildNgram(spark: SparkSession, datasetPath: String, textCol: String,
                 indexPath: String, n: Int = 3,
                 writePartitions: Int = 8): Long = {
    val builtV = headVersion(spark, datasetPath)
    ngramRows(spark, datasetPath, textCol, n, Some((0L, builtV)))
      .write.format("lance")
      .option("sortBy", "key")
      .option("writePartitions", writePartitions.toString)
      .mode("overwrite").save(s"$indexPath/keys.lance")
    writeMeta(spark, indexPath, builtV, s"$textCol#$n",
              headVersion(spark, s"$indexPath/keys.lance"))
    builtV
  }

  private def ngramRows(spark: SparkSession, datasetPath: String,
                        textCol: String, n: Int,
                        range: Option[(Long, Long)]): DataFrame = {
    val rd = spark.read.format("lance")
    val src = range match {
      case Some((from, to)) if from > 0 =>
        rd.option("fromVersion", from).option("versionAsOf", to).load(datasetPath)
      case Some((_, to)) => rd.option("versionAsOf", to).load(datasetPath)
      case None => rd.load(datasetPath)
    }
    src.select(col("_rowaddr").as("addr"), col(textCol).as("t"))
      .select(col("addr"), explode(array_distinct(expr(
        s"transform(sequence(1, greatest(length(t) - ${n - 1}, 0))," +
          s" i -> substring(t, i, $n))"))).as("key"))
  }

  /** Incrementally extend the ngram index over post-build appends (new
    * fragments' gram postings as new range-sorted fragments; O(tail)). */
  def updateNgram(spark: SparkSession, datasetPath: String,
                  indexPath: String, writePartitions: Int = 2): Long =
    graft.sources.lance.MaintenanceLock.withLockFenced(indexPath,
        spark.sessionState.newHadoopConf()) { fence =>
    val meta = spark.read.format("lance").load(s"$indexPath/meta.lance").head()
    val builtV = meta.getLong(0)
    val Array(textCol, nStr) = meta.getString(1).split('#')
    val headV = headVersion(spark, datasetPath)
    if (headV == builtV) builtV
    else {
      // see update(): meta is the only publish; fence, sweep a
      // fence-aborted predecessor's orphan tail, then append + publish
      fence.check()
      sweepOrphanTail(spark, indexPath, "keys", meta)
      ngramRows(spark, datasetPath, textCol, nStr.toInt, Some((builtV, headV)))
        .write.format("lance")
        .option("sortBy", "key")
        .option("writePartitions", writePartitions.toString)
        .mode("append").save(s"$indexPath/keys.lance")
      fence.check()
      writeMeta(spark, indexPath, headV, meta.getString(1),
                headVersion(spark, s"$indexPath/keys.lance"))
      headV
    }
  }

  /** Rows whose `textCol` CONTAINS `needle` — exact (not approximate):
    * candidate rows must post ALL of the needle's trigrams (an
    * intersection expressed as a `HAVING count = n_grams` aggregate over
    * the probed slivers), and the take-fetched candidates re-verify with
    * a real `contains` — false positives (grams present but
    * non-adjacent) are filtered, false negatives are impossible. Needles
    * shorter than the gram size fall back to a pushed filter scan.
    */
  def lookupContains(spark: SparkSession, datasetPath: String,
                     indexPath: String, textCol: String, needle: String,
                     n: Int = 3, maxRows: Int = 100000): DataFrame = {
    val base = spark.read.format("lance").load(datasetPath)
    if (needle.length < n) return base.filter(col(textCol).contains(needle))
    val grams = needle.sliding(n).toSeq.distinct
    val probe = pinnedSidecar(spark, indexPath, "keys",
        metaRowOpt(spark, indexPath))
      .filter(col("key").isin(grams: _*))
      .groupBy("addr").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === grams.size)
    fetchByAddrs(spark, datasetPath, probe, maxRows)
      .filter(col(textCol).contains(needle))
  }
}
