package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity-search operators over `ArrayType(FloatType)` columns
  * (SURVEY §2.5): brute-force exact top-k as the baseline, LSH-bucketed
  * search as the scale path.
  *
  * Kernels are built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`) — no Scala UDF in the hot path, so
  * whole-stage codegen fuses scan → dot-product → top-k.
  */
object Similarity {

  /** The index-default probe width: what builds register for the
    * declarative SQL rewrite and what probe entry points default to.
    * Imperative per-call nProbe overrides never mutate a registration. */
  val DefaultNProbe = 6

  /** Sequential-fold dot product of two array<float> columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
              lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the codegen'd [[graft.functions.FloatCosine]] kernel — a
    * tight primitive loop fused into whole-stage codegen, ~10x the
    * interpreted HOF fold. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.ArrayKernels.floatCosine(a, b)

  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
    }), lit(0.0), (acc, x) => acc + x))

  /** Exact brute-force top-k by cosine similarity against one query vector.
    * Plans as scan → project (codegen'd kernel) → TakeOrderedAndProject:
    * no shuffle of the corpus, each partition keeps k candidates and the
    * driver merges — the right baseline even at 100 TB (one pass).
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes for table `t`: one
    * nBits x dim weight matrix in [-1, 1], derived from
    * avalanche(table, plane, dim) — same math driver-side (to bucket the
    * query) and executor-side (as a foldable literal in the codegen
    * kernel). */
  def planes(t: Int, nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits) { p =>
      Array.tabulate(dim) { d =>
        val h = graft.functions.Mix.avalanche(
          (t.toLong << 40) ^ (p.toLong << 20) ^ d.toLong ^ 0x5deece66dL)
        ((h % 1000001L).toDouble / 1000000.0) // in (-1, 1)
      }
    }

  private def bucketOf(vec: Seq[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      var i = 0
      val w = planes(p)
      while (i < math.min(vec.length, w.length)) { dot += vec(i) * w(i); i += 1 }
      if (dot > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** IVF (inverted-file) index: a KMeans coarse quantizer assigns every
    * vector to one of `nLists` lists (SURVEY §2.5 "scale path: IVF —
    * KMeans (MLlib) coarse quantizer, partition-pruned search").
    *
    * At 100 TB the returned frame is materialized partitioned-by-list;
    * a query then reads only its `nProbe` nearest lists — storage-level
    * pruning the same way lance-index's IVF does. Returns (indexed frame
    * with a `list_id` column, centroid matrix).
    */
  /** Spread a compute-dense per-row pass across the session's cores.
    * Size-based file splitting under-parallelizes when the input is a
    * few dense row groups but the per-row kernel is heavy — a
    * sqrt-scaled 448-list assignment is ~29k mults/row, so a 200k-row
    * single-row-group parquet plans ONE task doing 6e9 mults while the
    * other cores idle (measured: the entire sf10 ANN-build cost). No-op
    * once the input already fans at least as wide as the session; at
    * cluster scale (thousands of scan partitions) this never fires.
    * Callers pass scan-shaped frames (no upstream exchange), so the
    * partition-count inspection plans no job. */
  private def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  def ivfIndex(df: DataFrame, idCol: String, vecCol: String,
               nLists: Int, seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    // The quantizer trains on a bounded DETERMINISTIC sample (hash-gated
    // then head-limited — the lance-index recipe: coarse quantizers never
    // see the full corpus) with a seeded driver-side Lloyd; assignment is
    // then ONE codegen NearestCentroid pass over the corpus. This replaces
    // the MLlib KMeans fit, which paid several Spark jobs per iteration
    // plus a model broadcast — at 100 TB the sample collect is MBs and the
    // assignment is a map-only scan.
    val sampled = df.select(col(vecCol))
      .where(pmod(xxhash64(col(idCol)), lit(4)) === 0)
      .limit(16384).collect()
    val rows = if (sampled.nonEmpty) sampled
               else df.select(col(vecCol)).limit(math.max(nLists, 1)).collect()
    val sample = rows.map(_.getSeq[Float](0).toArray)
    val centroids = lloydFit(sample, nLists, iters = 8, seed)
    val cLit = typedlit(centroids.map(_.toSeq).toSeq)
    val indexed = fanOut(df).withColumn("list_id",
      graft.functions.ArrayKernels.nearestCentroid(col(vecCol), cLit))
    (indexed, centroids)
  }

  /** One Lloyd assignment + accumulation pass of `pts` against
    * `centroids`, fanned across a fixed chunk grid (common fork-join
    * pool) and merged in chunk order. Deterministic: chunk boundaries
    * and the merge order are pure functions of |pts|, so every rerun
    * reduces the per-centroid FP sums in the same order — bit-identical
    * centroids run-to-run (the order differs from the old sequential
    * loop ONCE, deterministically; cluster assignments are engine-
    * specific and nothing hash-oracled consumes them). This is the
    * training hot loop: at sqrt-scaled list counts the sequential form
    * was the dominant single-threaded cost of every index build
    * (8 iters × 16k sample × ~450 centroids × 64 dims ≈ 4e9 ops on one
    * core while 31 idled). */
  private def lloydPass(pts: Array[Array[Double]],
                        centroids: Array[Array[Double]])
      : (Array[Array[Double]], Array[Int]) = {
    val k = centroids.length
    val dim = pts.head.length
    val nChunks = math.max(1, math.min(64, pts.length / 256))
    val bounds = (0 to nChunks).map(i => (i.toLong * pts.length / nChunks).toInt)
    val parts = java.util.stream.IntStream.range(0, nChunks).parallel()
      .mapToObj[(Array[Array[Double]], Array[Int])] { ci =>
        val sums = Array.fill(k, dim)(0.0)
        val counts = new Array[Int](k)
        var i = bounds(ci)
        val hi = bounds(ci + 1)
        while (i < hi) {
          val v = pts(i)
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < k) {
            val cc = centroids(c)
            var d2 = 0.0; var d = 0
            while (d < dim) { val t = v(d) - cc(d); d2 += t * t; d += 1 }
            if (d2 < bd) { bd = d2; best = c }
            c += 1
          }
          val sb = sums(best)
          var d = 0
          while (d < dim) { sb(d) += v(d); d += 1 }
          counts(best) += 1
          i += 1
        }
        (sums, counts)
      }
      .toArray((n: Int) => new Array[(Array[Array[Double]], Array[Int])](n))
    val sums = Array.fill(k, dim)(0.0)
    val counts = new Array[Int](k)
    parts.foreach { case (s, cnt) =>
      var c = 0
      while (c < k) {
        val sc = sums(c); val pc = s(c)
        var d = 0
        while (d < dim) { sc(d) += pc(d); d += 1 }
        counts(c) += cnt(c)
        c += 1
      }
    }
    (sums, counts)
  }

  /** Seeded full-dimension Lloyd k-means on a driver-side sample (the
    * coarse-quantizer twin of [[pqTrain]]'s per-subspace loop); the
    * per-iteration pass runs through the parallel [[lloydPass]]. Empty
    * clusters keep their previous centroid; if the sample has fewer than
    * k points, the table pads with clones of centroid 0 (never nearest
    * except on exact ties, which keep the lower index). */
  private[operators] def lloydFit(sample: Array[Array[Float]], k: Int,
                                  iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "lloydFit needs a non-empty sample")
    val dim = sample.head.length
    val kk = math.min(k, sample.length)
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(sample.indices.toList).take(kk)
      .map(i => sample(i).map(_.toDouble)).toArray
    // widen once: float→double is exact, so the distance/sum math is
    // bit-identical to subtracting the floats in-loop
    val pts = sample.map(v => v.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val (sums, counts) = lloydPass(pts, centroids)
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { centroids(c)(d) = sums(c)(d) / counts(c); d += 1 }
        }
        c += 1
      }
      it += 1
    }
    if (kk < k) centroids ++ Array.fill(k - kk)(centroids(0).clone)
    else centroids
  }

  /** Build-once/probe-many IVF: the index (list assignments + centroids) is
    * memoized per (session, key) — the declared e06 query measures PROBING,
    * the production-relevant cost; at 100 TB the build is an offline job
    * that materializes the indexed table partitioned by list_id. */
  private val sessionIds =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]
  private def sessionId(s: org.apache.spark.sql.SparkSession): String =
    sessionIds.synchronized {
      val hit = sessionIds.get(s)
      if (hit != null) hit
      else { val id = java.util.UUID.randomUUID().toString; sessionIds.put(s, id); id }
    }

  private val ivfCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (DataFrame, Array[Array[Double]])](16, 0.75f, true) {
      // bounded LRU: a long-lived JVM hosting many sessions must not
      // accumulate one cached index per (session, key) forever
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (DataFrame, Array[Array[Double]])]): Boolean =
        size() > 32
    })
  def ivfIndexCached(df: DataFrame, idCol: String, vecCol: String,
                     nLists: Int, key: String): (DataFrame, Array[Array[Double]]) = {
    // reference-keyed session ids: identityHashCode (used before round 8)
    // can collide across sessions in one JVM; a weak map keyed on the
    // session OBJECT cannot, and lets dead sessions' ids be collected
    val cacheKey = s"${sessionId(df.sparkSession)}:$key:$nLists"
    // double-checked: the (seconds-long) build runs OUTSIDE the cache
    // lock so concurrent sessions' hits never block on another build; a
    // rare duplicate build under a race is harmless (last put wins)
    val hit = ivfCache.get(cacheKey)
    if (hit != null) hit
    else {
      val v = ivfIndex(df, idCol, vecCol, nLists)
      ivfCache.put(cacheKey, v)
      v
    }
  }

  /** IVF search: probe the `nProbe` lists whose centroids are closest to
    * the query (picked driver-side — centroids are tiny), then exact
    * cosine top-k inside them via the codegen kernel. */
  def ivfCosineTopK(indexed: DataFrame, centroids: Array[Array[Double]],
                    idCol: String, vecCol: String, query: Seq[Float],
                    k: Int, nProbe: Int): DataFrame = {
    val qd = query.map(_.toDouble).toArray
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(c.length, qd.length)) { val d = c(i) - qd(i); s += d * d; i += 1 }
      s
    }
    val probeLists = centroids.zipWithIndex.sortBy(p => dist2(p._1)).take(nProbe).map(_._2)
    indexed.filter(col("list_id").isin(probeLists.toIndexedSeq: _*))
      .select(col(idCol), cosine(col(vecCol), typedlit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  // ---- persisted IVF index (lance-index analogue) ------------------------

  /** Build the IVF index and PERSIST it as two lance datasets under
    * `indexPath`: `vectors.lance` (corpus + `list_id`, range-partitioned by
    * list so each fragment covers few lists — the manifest's per-fragment
    * [min,max] stats then let a probe prune whole fragments without opening
    * them) and `centroids.lance` (tiny). A fresh session pays only the
    * centroid read (~ms) instead of a KMeans fit; at 100 TB this is the
    * offline index build, and probes read `nProbe/nLists` of the data.
    * Also registers the index for the `ORDER BY graft_cosine(...) DESC
    * LIMIT k` planner rewrite ([[graft.plans.GraftAnn]]). */
  def ivfBuildPersist(df: DataFrame, idCol: String, vecCol: String,
                      nLists: Int, indexPath: String, nProbe: Int = DefaultNProbe): Unit = {
    val (indexed, centroids) = ivfIndex(df, idCol, vecCol, nLists)
    // persist across the write: RangePartitioning SAMPLES its child to
    // pick bounds, so without this the nearest-centroid assignment pass
    // runs twice over the corpus (once to sample, once to write)
    val assigned = indexed.persist()
    try {
      assigned
        .repartitionByRange(math.max(nLists / 2, 1), col("list_id"))
        .sortWithinPartitions("list_id")
        .write.format("lance").mode("overwrite").save(s"$indexPath/vectors.lance")
    } finally assigned.unpersist(false)
    val spark = df.sparkSession
    import spark.implicits._
    // the build-time probe width rides along in the sidecar
    // (`default_nprobe`, same value every row): a fresh JVM's
    // registerIfAbsent then restores the width the index was BUILT with,
    // so declarative SQL results never depend on process history across
    // restarts (they did when the first imperative touch registered the
    // global default)
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq, nProbe) }.toSeq
      .toDF("list_id", "centroid", "default_nprobe").coalesce(1)
      .write.format("lance").mode("overwrite").save(s"$indexPath/centroids.lance")
    centroidCache.put(s"$indexPath@-1", (centroids, nProbe))
    graft.plans.GraftAnn.register(s"$indexPath/vectors.lance", centroids, nProbe)
  }

  import graft.functions.Lru

  /** (centroids, build-time default nProbe) per index path — a fresh
    * session fills this with one tiny lance read, never a KMeans fit. */
  private val centroidCache = new Lru[(Array[Array[Double]], Int)](32)

  /** Test hook: simulate a fresh session (forces the centroid and
    * vectors-pin re-reads). */
  private[graft] def clearCentroidCache(): Unit = {
    centroidCache.clear()
    metaCache.clear()
  }

  private def centroidsAndWidth(spark: org.apache.spark.sql.SparkSession,
                                indexPath: String,
                                pin: Option[Long] = None): (Array[Array[Double]], Int) =
    // cache per (path, pin): the pinned read of a crashed-rebuild window
    // must not serve a head read cached before the crash, or vice versa
    centroidCache.getOrLoad(s"$indexPath@${pin.getOrElse(-1L)}") {
      val base = spark.read.format("lance")
      val df = pin.fold(base)(v => base.option("versionAsOf", v))
        .load(s"$indexPath/centroids.lance")
      val rows = df.orderBy("list_id").collect()
      val cents = rows.map(_.getSeq[Double](1).toArray)
      // indexes persisted before the width column existed fall back to
      // the session default (documented restart caveat, now closed for
      // every index this build writes)
      val w =
        if (df.schema.fieldNames.contains("default_nprobe") && rows.nonEmpty)
          rows.head.getInt(rows.head.fieldIndex("default_nprobe"))
        else DefaultNProbe
      (cents, w)
    }

  def ivfCentroids(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): Array[Array[Double]] =
    centroidsAndWidth(spark, indexPath)._1

  /** The probe width persisted at build time (falls back to
    * [[DefaultNProbe]] for pre-width sidecars). */
  def ivfDefaultNProbe(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String): Int =
    centroidsAndWidth(spark, indexPath)._2

  /** Probe a persisted IVF index: centroid read (cached), driver-side
    * probe-list pick, fragment-pruned scan of the probed lists, codegen
    * cosine top-k. No KMeans, no full scan. */
  def ivfSearchPersisted(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, idCol: String, vecCol: String,
                         query: Seq[Float], k: Int, nProbe: Int = DefaultNProbe): DataFrame =
    // the SQL-rewrite registration (inside the interior) uses the width
    // PERSISTED by the build — this call's nProbe is a per-query
    // parameter and must not leak into later SQL rewrites. The probe
    // pins vectors.lance at the meta-published version for updated
    // indexes, so a crashed ivfUpdateIndex's orphaned commit is
    // invisible here (the declarative GraftAnn face scans the head: its
    // relation IS the user-visible table, and orphan rows are real
    // corpus rows).
    ivfSearchPersistedAt(spark, indexPath, idCol, vecCol, query, k, nProbe,
      metaOf(spark, indexPath))

  /** Build the persisted IVF index FOR a lance dataset, recording the
    * source head version in the centroid sidecar (`built_version`
    * column). [[ivfSearchCombined]] uses it to brute-force the unindexed
    * append tail — the crate's behavior for fragments not covered by the
    * index.
    */
  def ivfBuildPersistLance(spark: org.apache.spark.sql.SparkSession,
                           sourcePath: String, idCol: String, vecCol: String,
                           nLists: Int, indexPath: String,
                           nProbe: Int = DefaultNProbe): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val builtV = datasetHead(conf, sourcePath)
    // pin the snapshot: a concurrent append between version read and scan
    // must not leak half-indexed rows past the recorded version
    val df = spark.read.format("lance")
      .option("versionAsOf", builtV).load(sourcePath)
    ivfBuildPersist(df, idCol, vecCol, nLists, indexPath, nProbe)
    // the meta is written with the FULL pinned schema from day one
    // (round-16 review): the vectors pin makes a crashed update's orphan
    // invisible, and the CENTROIDS pin closes the crashed-REBUILD window
    // — a rebuild overwrites centroids.lance before this meta publish,
    // and without the pin, probes would pair old pinned rows with new
    // head centroids (wrong probe lists). Legacy 1-column metas on disk
    // still upgrade at first update.
    import spark.implicits._
    Seq((builtV, datasetHead(conf, s"$indexPath/vectors.lance"),
         datasetHead(conf, s"$indexPath/centroids.lance")))
      .toDF("built_version", "vectors_version", "centroids_version")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/meta.lance")
    // a rebuild resets the publish pin: vectors.lance head IS the build
    metaCache.remove(s"$indexPath/meta.lance")
    builtV
  }

  /** Incrementally extend a persisted IVF index over the rows appended
    * to `sourcePath` after the recorded build version — the crate's
    * `optimize_indices` for a vector index, O(tail), NO re-train: tail
    * vectors are assigned to the EXISTING centroids (one codegen
    * NearestCentroid pass over the post-build fragments only) and land
    * in `vectors.lance` through ONE mergeInsert commit keyed on `idCol`,
    * so a row deleted-then-re-appended since the build REPLACES its
    * stale indexed copy instead of shadowing it (the crate gets the same
    * effect from its deletion bitmap). New fragments are range-sorted by
    * `list_id`, so probe pruning keeps working; centroids never change,
    * so every cached centroid read stays valid.
    *
    * Publish protocol (the [[graft.operators.ScalarIndex.update]]
    * pattern): probes pin `vectors.lance` at the version `meta.lance`
    * records, so the meta overwrite below is the only publish — a crash
    * between the mergeInsert commit and the meta write leaves an
    * orphaned index version that pinned probes never see (combined
    * search still brute-forces the tail, so nothing double-counts), and
    * the next update sweeps it by restoring to the recorded version
    * before re-applying. Deltas that contain ONLY deletions advance the
    * covered version without index writes (deletion masking stays a
    * query-time concern — the Live faces).
    *
    * Returns the covered source version. */
  def ivfUpdateIndex(spark: org.apache.spark.sql.SparkSession,
                     sourcePath: String, indexPath: String,
                     idCol: String, vecCol: String,
                     writePartitions: Int = 2): Long = {
    import graft.sources.lance.{LanceFormat, LanceMaintenance, MaintenanceLock}
    val conf = spark.sessionState.newHadoopConf()
    MaintenanceLock.withLock(indexPath, conf) {
      val vecPath = s"$indexPath/vectors.lance"
      val centsPath = s"$indexPath/centroids.lance"
      val meta = spark.read.format("lance").load(s"$indexPath/meta.lance")
      val mRow = meta.head()
      val builtV = mRow.getLong(0)
      def headOf(path: String): Long = datasetHead(conf, path)
      def pinOf(name: String): Option[Long] =
        if (meta.schema.fieldNames.contains(name))
          Some(mRow.getLong(mRow.fieldIndex(name)))
        else None
      // sweep a crashed update's orphaned index commit BEFORE touching
      // anything: the recorded vectors version is the last published
      // state. A legacy 1-column meta (built, never updated) first
      // UPGRADES to the pinned schema at the current heads — published
      // BEFORE any index mutation, so even the first update's crash
      // window is covered (an orphan after a legacy meta would otherwise
      // be invisible to the sweep and visible to unpinned probes).
      val (vv0, cv0) = (pinOf("vectors_version"), pinOf("centroids_version")) match {
        case (Some(v), c) => (v, c.getOrElse(headOf(centsPath)))
        case _ =>
          val (cur, curC) = (headOf(vecPath), headOf(centsPath))
          import spark.implicits._
          Seq((builtV, cur, curC))
            .toDF("built_version", "vectors_version", "centroids_version")
            .coalesce(1).write.format("lance").mode("overwrite")
            .save(s"$indexPath/meta.lance")
          metaCache.remove(s"$indexPath/meta.lance")
          (cur, curC)
      }
      if (headOf(vecPath) != vv0)
        LanceMaintenance.restore(spark, vecPath, vv0)
      // a crashed REBUILD's sidecar overwrite also sweeps: the rows being
      // extended carry list_ids from the PINNED centroids, so assigning
      // the tail (or probing) with drifted head centroids would publish
      // an index mixing two centroid sets
      if (headOf(centsPath) != cv0)
        LanceMaintenance.restore(spark, centsPath, cv0)
      val cvPub = headOf(centsPath)
      val headV = headOf(sourcePath)
      val publishedVv =
        if (headV == builtV) headOf(vecPath)
        else {
          val centroids = centroidsAndWidth(spark, indexPath, Some(cvPub))._1
          val cLit = typedlit(centroids.map(_.toSeq).toSeq)
          // the index schema is the source row + list_id (mergeInsert
          // requires the exact column set); the window pins at headV so
          // a concurrent append past the read cannot leak half-covered
          // rows into a version the meta then claims
          val idxCols = spark.read.format("lance").load(vecPath)
            .schema.fieldNames
          // persist the assigned tail: mergeInsert consumes its source
          // several times (emptiness check, matched-key semi-join,
          // staging) and repartitionByRange SAMPLES its child — without
          // this the NearestCentroid kernel re-runs over the tail four
          // to five times (the ivfBuildPersist lesson)
          val assigned = spark.read.format("lance")
            .option("fromVersion", builtV).option("versionAsOf", headV)
            .load(sourcePath)
            .withColumn("list_id",
              graft.functions.ArrayKernels.nearestCentroid(col(vecCol), cLit))
            .select(idxCols.map(col).toIndexedSeq: _*)
            .persist()
          try {
            LanceMaintenance.mergeInsert(spark, vecPath,
              assigned
                .repartitionByRange(math.max(writePartitions, 1), col("list_id"))
                .sortWithinPartitions("list_id"),
              Seq(idCol))
          } finally assigned.unpersist(false)
          headOf(vecPath)
        }
      import spark.implicits._
      Seq((headV, publishedVv, cvPub))
        .toDF("built_version", "vectors_version", "centroids_version")
        .coalesce(1).write.format("lance").mode("overwrite")
        .save(s"$indexPath/meta.lance")
      metaCache.remove(s"$indexPath/meta.lance")
      headV
    }
  }

  /** Manifest head version of a lance dataset — shared by the meta
    * reads, the build, and the update (one idiom, one place to change
    * manifest resolution). */
  private def datasetHead(conf: org.apache.hadoop.conf.Configuration,
                          path: String): Long = {
    import graft.sources.lance.LanceFormat
    val (fs, p) = LanceFormat.fileSystem(path, conf)
    LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, None)).version
  }

  /** One atomically-read publish record of an index's meta sidecar:
    * the covered source version, the pin of the index dataset
    * (vectors.lance / pq.lance), and the pins of the centroid/codebook
    * sidecars a rebuild overwrites (round-16 review: the index-dataset
    * pin alone left a window where a rebuild crashing after its sidecar
    * writes but before its meta publish would hand pinned probes NEW
    * centroids/codebooks against OLD pinned rows — garbage ADC scores /
    * wrong probe lists — and the next update would encode the tail under
    * the drifted sidecars and publish the mix). A None pin means "head"
    * (legacy metas without the column; never-updated plain builds). */
  private[graft] case class IdxMeta(built: Long, vecPin: Option[Long],
                                    centsPin: Option[Long],
                                    cbsPin: Option[Long])

  /** The [[IdxMeta]] of an index's meta sidecar, read ATOMICALLY: every
    * field always comes from the same meta version (a fresh built_version
    * paired with a stale cached pin would make the combined faces drop
    * rows a cross-process update had just folded in — empty tail AND
    * pre-update index). Values cache per meta MANIFEST version; a call on
    * an index with meta pays only a manifest-head read (plain file IO, no
    * Spark job) to detect cross-process publishes. The no-meta result
    * (plain [[ivfBuildPersist]] indexes) caches as None — no per-probe
    * existence check on that hot path; [[ivfBuildPersistLance]] (the
    * only way meta appears) invalidates in-process. */
  private val metaCache = new Lru[Option[(Long, IdxMeta)]](32)
  private def metaOf(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String,
                     metaName: String = "meta.lance"): Option[IdxMeta] = {
    import graft.sources.lance.LanceFormat
    val conf = spark.sessionState.newHadoopConf()
    // cache key = the meta dataset path, so the IVF and PQ flavors of one
    // index directory (each with its own meta sidecar) never collide
    val metaPath = s"$indexPath/$metaName"
    metaCache.get(metaPath) match {
      case Some(None) => None // cached no-meta index
      case cached =>
        val (fs, mp) = LanceFormat.fileSystem(metaPath, conf)
        if (!fs.exists(mp)) { metaCache.put(metaPath, None); None }
        else {
          val head = datasetHead(conf, metaPath)
          cached.flatten match {
            case Some((v, m)) if v == head => Some(m)
            case _ =>
              val mdf = spark.read.format("lance")
                .option("versionAsOf", head).load(metaPath)
              val r = mdf.head()
              def longOf(name: String): Option[Long] =
                if (mdf.schema.fieldNames.contains(name))
                  Some(r.getLong(r.fieldIndex(name)))
                else None
              val m = IdxMeta(r.getLong(0), longOf("vectors_version"),
                longOf("centroids_version"), longOf("codebooks_version"))
              metaCache.put(metaPath, Some((head, m)))
              Some(m)
          }
        }
    }
  }

  /** The probe interior with the explicit publish record — the combined
    * faces resolve the WHOLE [[IdxMeta]] in ONE [[metaOf]] read and pass
    * it here so the tail bound, the vectors pin AND the centroids pin
    * can never tear. Pinning the centroids alongside the rows matters
    * for the crashed-rebuild window: a rebuild overwrites
    * centroids.lance before its meta publish, and probing OLD pinned
    * rows (whose list_ids came from the OLD centroids) with NEW head
    * centroids would pick the wrong lists. */
  private def ivfSearchPersistedAt(spark: org.apache.spark.sql.SparkSession,
                                   indexPath: String, idCol: String,
                                   vecCol: String, query: Seq[Float],
                                   k: Int, nProbe: Int,
                                   meta: Option[IdxMeta]): DataFrame = {
    val (centroids, builtWidth) =
      centroidsAndWidth(spark, indexPath, meta.flatMap(_.centsPin))
    graft.plans.GraftAnn.registerIfAbsent(
      s"$indexPath/vectors.lance", centroids, builtWidth)
    val base = spark.read.format("lance")
    val indexed = meta.flatMap(_.vecPin).fold(base)(v => base.option("versionAsOf", v))
      .load(s"$indexPath/vectors.lance")
    ivfCosineTopK(indexed, centroids, idCol, vecCol, query, k, nProbe)
  }

  /** Combined search (crate semantics for a stale index): probe the
    * persisted index for rows it covers AND brute-force the rows appended
    * to `sourcePath` after the recorded build version (a `fromVersion`
    * CDC scan plans ONLY the new fragments — the tail stays a sliver of
    * the corpus until the next index rebuild), then merge the two top-k
    * streams. The tail side reads the live dataset, so deletions among
    * appended rows are masked for free; deletions of INDEXED rows need
    * [[ivfSearchPersistedLive]] (compose when both apply).
    */
  def ivfSearchCombined(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, sourcePath: String,
                        idCol: String, vecCol: String,
                        query: Seq[Float], k: Int,
                        nProbe: Int = DefaultNProbe): DataFrame = {
    // ONE atomic meta read: the tail bound and the index pin must come
    // from the same publish, or a cross-process update between two reads
    // would empty the tail while probing the pre-update index
    val meta = metaOf(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"$indexPath has no meta.lance — build with ivfBuildPersistLance"))
    val idxTop = ivfSearchPersistedAt(spark, indexPath, idCol, vecCol,
      query, k, nProbe, Some(meta))
    val tail = spark.read.format("lance")
      .option("fromVersion", meta.built).load(sourcePath)
    val tailTop = cosineTopK(tail, idCol, vecCol, query, k)
    idxTop.unionByName(tailTop)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The full crate search contract on a STALE index — appends AND
    * deletions since the build, composed from the two specialized paths:
    * the indexed side probes through [[ivfSearchPersistedLive]] (liveness
    * masked via the runtime-filter join against the current source, so
    * deleted-but-indexed rows drop), the tail side brute-forces only the
    * fragments appended after the recorded build version (deletions
    * among appended rows are masked by the scan itself), and the two
    * top-k streams merge. This is what `dataset.search()` does in the
    * crate between index rebuilds: index hits minus the deletion bitmap,
    * plus an unindexed-tail flat scan. */
  def ivfSearchCombinedLive(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, sourcePath: String,
                            idCol: String, vecCol: String,
                            query: Seq[Float], k: Int,
                            nProbe: Int = DefaultNProbe): DataFrame = {
    // ONE atomic meta read (see ivfSearchCombined): tail bound + pins
    // from the same publish
    val meta = metaOf(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"$indexPath has no meta.lance — build with ivfBuildPersistLance"))
    val tail = spark.read.format("lance")
      .option("fromVersion", meta.built).load(sourcePath)
    val tailTop = cosineTopK(tail, idCol, vecCol, query, k)
    // An id present in the post-build tail = a row deleted and
    // re-appended since the build (an update): the id-existence liveness
    // check keeps the STALE indexed copy alive, but the crate's
    // row-level deletion bitmap would mask it — drop indexed hits whose
    // id reappears ANYWHERE in the tail (not just in tailTop: a poorly-
    // ranking re-append must still retire its stale copy). The
    // retirement applies to the FULL 2k live over-fetch, BEFORE any
    // top-k cut: cutting first would let each retired hit permanently
    // consume a top-k slot, silently dropping live indexed rows ranked
    // k+1..2k that outrank tail rows.
    val cands = ivfSearchPersistedAt(spark, indexPath, idCol, vecCol,
      query, 2 * k, nProbe, Some(meta))
    val idxLive = liveMask(spark, sourcePath, idCol, cands)
    // Realize the retired ids as a ≤2k set FIRST: tail ids semi-join the
    // SAME broadcast candidate set (retiring on the candidate-id superset
    // equals retiring on live-candidate ids — idxLive's ids are a subset
    // of cands', and extra retired ids hit nothing in the anti-join), and
    // only THEN do the candidates anti-join the realized set. A left_anti
    // join can only broadcast its RIGHT side, so anti-joining the raw
    // tail id projection would shuffle (or broadcast) the whole append
    // sliver at 100 TB; here the tail streams against a broadcast and its
    // id scan receives the candidate IN-list as a runtime zone filter
    // (the liveness-join machinery), so retirement costs O(k) point reads
    // of the tail, never a sliver pass. Both retirement joins broadcast
    // the identical `cands` subtree with the identical id key, so the
    // exchange is planned once and reused (probe executes once here).
    val retired = tail.select(col(idCol))
      .join(broadcast(cands), Seq(idCol), "left_semi")
    val idxOnly = idxLive.join(broadcast(retired), Seq(idCol), "left_anti")
    idxOnly.unionByName(tailTop)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Delete-aware probe of a persisted IVF index — the crate's semantics:
    * deletions on the BASE dataset mask index hits at query time. The
    * plain IVF index stores a COPY of the vectors, so a row deleted from
    * `sourcePath` after the build would otherwise still surface. Here the
    * probe over-fetches 2k candidates, verifies the bounded candidate id
    * set's liveness against the source with a pushed IN-list (zone-pruned
    * point reads — O(k) like the crate's per-candidate deletion-bitmap
    * check, never a corpus scan), and returns the top k live survivors
    * (fewer only if deletions gutted the over-fetch margin).
    *
    * The PQ path ([[ivfPqSearch]]) needs none of this: its exact re-rank
    * reads the source, where deletion vectors already mask dead rows.
    */
  def ivfSearchPersistedLive(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String, sourcePath: String,
                             idCol: String, vecCol: String,
                             query: Seq[Float], k: Int,
                             nProbe: Int = DefaultNProbe): DataFrame =
    ivfLiveCandidates(spark, indexPath, sourcePath, idCol, vecCol,
        query, 2 * k, nProbe, metaOf(spark, indexPath))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** The liveness-masked candidate set BEFORE any top-k cut: up to
    * `fetch` index hits that still exist in `sourcePath`, as `(idCol,
    * cos)`. [[ivfSearchPersistedLive]] cuts this to k;
    * [[ivfSearchCombinedLive]] first retires tail-reappearing ids from
    * the FULL over-fetch so retired hits refill from candidates ranked
    * below k instead of consuming top-k slots. */
  private[graft] def ivfLiveCandidates(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, sourcePath: String,
      idCol: String, vecCol: String,
      query: Seq[Float], fetch: Int, nProbe: Int,
      meta: Option[IdxMeta]): DataFrame =
    liveMask(spark, sourcePath, idCol,
      ivfSearchPersistedAt(spark, indexPath, idCol, vecCol,
        query, fetch, nProbe, meta))

  /** The liveness join interior, parameterized on an already-built
    * candidate plan so [[ivfSearchCombinedLive]] can reuse ONE candidate
    * subtree (and thus one broadcast exchange) for both the liveness mask
    * and the retirement semi-join. */
  private def liveMask(spark: org.apache.spark.sql.SparkSession,
                       sourcePath: String, idCol: String,
                       candsDf: DataFrame): DataFrame = {
    // Liveness mask via Spark's runtime-filter path, no driver collect:
    // the source joins the broadcast candidate set, and because the lance
    // scan implements SupportsRuntimeV2Filtering (with idCol among its
    // filterAttributes) the optimizer's PartitionPruning rule attaches a
    // dynamic-pruning subquery that reuses the candidate broadcast — once
    // the ≤fetch candidates materialize, their realized ids reach the
    // source scan as an IN-list zone filter (bounded point reads — O(k)
    // like the crate's per-candidate deletion-bitmap check, never a
    // corpus scan). The probe subtree appears ONCE in the plan and its
    // broadcast is shared between the join build side and the pruning
    // subquery, so the probe executes once; the whole result stays a lazy
    // distributed plan. LivenessJoinSpec pins that the runtime filter
    // actually reaches the source scan and prunes fragments.
    val src = spark.read.format("lance").load(sourcePath).select(col(idCol))
    // grouped first-win: the inner join emits one row per matching SOURCE
    // row, so a source holding duplicate ids (update-by-append) would
    // repeat a candidate. Grouping on the id alone (instead of an
    // all-columns distinct) keeps the exchange keyed on ≤fetch ids after
    // map-side partial aggregation, and under duplicate ids in the INDEX
    // itself deterministically keeps the best-scoring copy.
    src.join(broadcast(candsDf), Seq(idCol), "inner")
      .groupBy(col(idCol)).agg(max(col("cos")).as("cos"))
  }

  // ---- IVF_PQ: product-quantized persisted index (lance-index IVF_PQ
  // analogue — /root/reference/Cargo.lock: lance-index) -------------------

  /** Train per-subspace PQ codebooks (Jégou/Douze/Schmid PQ, PAMI 2011)
    * with seeded Lloyd k-means on a bounded sample. Codebook training is
    * small-sample by design (256 centroids per 8-dim subspace saturate
    * quickly; the lance crate trains on a sample too), so the driver-side
    * sample here is a deliberate, bounded cost — NOT a scan collect.
    * Returns [m][256][dim/m]; when the sample has fewer than 256 distinct
    * points the tail codes duplicate code 0 (never emitted by the
    * encoder's strict-< argmin). */
  def pqTrain(sample: Array[Array[Float]], m: Int, iters: Int = 12,
              seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "pqTrain needs a non-empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by $m subspaces")
    require(m >= 1 && m <= 8, s"pqTrain: m=$m must be in [1,8] (codes pack into int64)")
    val dsub = dim / m
    val rnd = new scala.util.Random(seed)
    Array.tabulate(m) { s =>
      val subs = sample.map(v => Array.tabulate(dsub)(d => v(s * dsub + d).toDouble))
      val k = math.min(256, subs.length)
      val centroids = rnd.shuffle(subs.indices.toList).take(k)
        .map(subs(_).clone).toArray
      var it = 0
      while (it < iters) {
        val (sums, counts) = lloydPass(subs, centroids)
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var d = 0
            while (d < dsub) { centroids(c)(d) = sums(c)(d) / counts(c); d += 1 }
          }
          c += 1
        }
        it += 1
      }
      if (k < 256) centroids ++ Array.fill(256 - k)(centroids(0).clone)
      else centroids
    }
  }

  /** Build and persist an IVF_PQ index under `indexPath`:
    * `pq.lance` holds (id, list_id, pq_code int64) — 8-byte codes instead
    * of dim*4-byte vectors, range-partitioned by list so fragment stats
    * prune unprobed lists — plus tiny `pq_centroids.lance` (coarse) and
    * `pq_codebooks.lance` sidecars. Unlike [[ivfBuildPersist]] the corpus
    * is NOT copied: at 100 TB the index is ~2-3% of the data, and re-rank
    * reads the original table for just the candidate ids. */
  def ivfPqBuildPersist(df: DataFrame, idCol: String, vecCol: String,
                        nLists: Int, indexPath: String, m: Int = 8,
                        sampleN: Int = 16384): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (indexed, centroids) = ivfIndex(df, idCol, vecCol, nLists)
    // hash-gated like ivfIndex's coarse sample: a plain limit() takes the
    // FIRST fragments' rows, which on sorted/partitioned corpora trains
    // the codebooks on one corner of the distribution. A gated draw that
    // cannot FILL sampleN means the corpus is tiny (< 4*sampleN rows);
    // there the 256-entry-per-subspace codebooks need every row they can
    // get (a quartered sample underfits them), so fall back to ungated.
    val gated = df.select(col(vecCol))
      .where(pmod(xxhash64(col(idCol)), lit(4)) === 0)
      .limit(sampleN).collect()
    val rows = if (gated.length >= sampleN) gated
               else df.select(col(vecCol)).limit(sampleN).collect()
    val sample = rows.map(_.getSeq[Float](0).toArray)
    val codebooks = pqTrain(sample, m)
    val cbLit = typedlit(codebooks.flatMap(_.map(_.toSeq)).toSeq)
    // persist across the write: the range sampling would otherwise run
    // the assignment + PQ-encode kernels twice over the corpus (the
    // ivfBuildPersist lesson; these codes are 8 B/row — cheap to hold)
    val coded = indexed
      .select(col(idCol), col("list_id"),
        graft.functions.ArrayKernels.pqEncode(col(vecCol), cbLit).as("pq_code"))
      .persist()
    try {
      coded
        .repartitionByRange(math.max(nLists / 2, 1), col("list_id"))
        .sortWithinPartitions("list_id")
        .write.format("lance").mode("overwrite").save(s"$indexPath/pq.lance")
    } finally coded.unpersist(false)
    // the PQ index's coarse centroids live in their OWN sidecar
    // (`pq_centroids.lance`): the plain-IVF `centroids.lance` that
    // `vectors.lance`'s persisted list assignments depend on is never
    // overwritten by a PQ rebuild at the same path — consistency between
    // the two index flavors no longer rests on the Lloyd fit being
    // bit-identical across builds
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid").coalesce(1)
      .write.format("lance").mode("overwrite").save(s"$indexPath/pq_centroids.lance")
    // float storage halves the sidecar; training precision stays double
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (cent, b) => (s, b, cent.map(_.toFloat).toSeq) }
    }.toSeq.toDF("sub", "code", "centroid").coalesce(1)
      .write.format("lance").mode("overwrite").save(s"$indexPath/pq_codebooks.lance")
    pqCentroidCache.put(s"$indexPath@-1", centroids)
    pqCbCache.put(s"$indexPath@-1", codebooks)
  }

  /** Build the persisted IVF_PQ index FOR a lance dataset, recording the
    * source head version like [[ivfBuildPersistLance]] does for the plain
    * flavor. The PQ meta lives in its OWN sidecar (`pq_meta.lance`) so the
    * two index flavors can share one directory without stomping each
    * other's publish points (the same reasoning that gave the PQ coarse
    * centroids their own `pq_centroids.lance`). The meta is written with
    * the pinned schema from day one — (built_version, vectors_version
    * = pq.lance head) — so PQ probes are crash-window-safe from the first
    * build, no legacy upgrade path needed. Returns the recorded source
    * version. */
  def ivfPqBuildPersistLance(spark: org.apache.spark.sql.SparkSession,
                             sourcePath: String, idCol: String, vecCol: String,
                             nLists: Int, indexPath: String,
                             m: Int = 8): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val builtV = datasetHead(conf, sourcePath)
    // pin the snapshot (see ivfBuildPersistLance): a concurrent append
    // between version read and scan must not leak half-indexed rows
    val df = spark.read.format("lance")
      .option("versionAsOf", builtV).load(sourcePath)
    ivfPqBuildPersist(df, idCol, vecCol, nLists, indexPath, m)
    // the publish record pins pq.lance AND both sidecars (round-16
    // review): a rebuild overwrites pq_centroids/pq_codebooks before
    // this meta write, so without sidecar pins a crash in that window
    // would hand pinned probes NEW codebooks against OLD pinned codes —
    // garbage ADC scores. vectors_version keeps its name for the shared
    // metaOf reader (it is the pq.lance pin here).
    import spark.implicits._
    Seq((builtV, datasetHead(conf, s"$indexPath/pq.lance"),
         datasetHead(conf, s"$indexPath/pq_centroids.lance"),
         datasetHead(conf, s"$indexPath/pq_codebooks.lance")))
      .toDF("built_version", "vectors_version",
            "centroids_version", "codebooks_version")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/pq_meta.lance")
    metaCache.remove(s"$indexPath/pq_meta.lance")
    builtV
  }

  /** Incrementally extend a persisted IVF_PQ index over the rows appended
    * to `sourcePath` after the recorded build version — [[ivfUpdateIndex]]
    * for the PQ flavor (the crate's `optimize_indices` covers IVF_PQ the
    * same way): tail vectors assign to the EXISTING coarse centroids and
    * encode with the EXISTING codebooks (no re-train of either — one
    * codegen NearestCentroid + PqEncode pass over the post-build
    * fragments only), landing in `pq.lance` through ONE mergeInsert
    * commit keyed on `idCol`, so a deleted-then-re-appended row REPLACES
    * its stale code. Same publish protocol as the plain flavor: probes
    * pin `pq.lance` at the `pq_meta.lance`-recorded version, a crash
    * between the mergeInsert and the meta write leaves an orphan pinned
    * probes never see, and the next update restores-then-reapplies.
    * Returns the covered source version. */
  def ivfPqUpdateIndex(spark: org.apache.spark.sql.SparkSession,
                       sourcePath: String, indexPath: String,
                       idCol: String, vecCol: String,
                       writePartitions: Int = 2): Long = {
    import graft.sources.lance.{LanceFormat, LanceMaintenance, MaintenanceLock}
    val conf = spark.sessionState.newHadoopConf()
    MaintenanceLock.withLock(indexPath, conf) {
      val pqPath = s"$indexPath/pq.lance"
      val centsPath = s"$indexPath/pq_centroids.lance"
      val cbsPath = s"$indexPath/pq_codebooks.lance"
      val metaPath = s"$indexPath/pq_meta.lance"
      val (fs, mp) = LanceFormat.fileSystem(metaPath, conf)
      require(fs.exists(mp),
        s"$indexPath has no pq_meta.lance — build with ivfPqBuildPersistLance")
      val mdf = spark.read.format("lance").load(metaPath)
      val r = mdf.head()
      val builtV = r.getLong(0)
      val vv0 = r.getLong(r.fieldIndex("vectors_version"))
      def pinOf(name: String, path: String): Long =
        if (mdf.schema.fieldNames.contains(name))
          r.getLong(r.fieldIndex(name))
        else datasetHead(conf, path) // pre-sidecar-pin meta: head
      // sweep a crashed update's orphaned index commit AND a crashed
      // rebuild's sidecar overwrite BEFORE anything: the recorded
      // versions are the last published state, and encoding the tail
      // with drifted codebooks would publish codes no single LUT can
      // score
      if (datasetHead(conf, pqPath) != vv0)
        LanceMaintenance.restore(spark, pqPath, vv0)
      Seq((centsPath, pinOf("centroids_version", centsPath)),
          (cbsPath, pinOf("codebooks_version", cbsPath))).foreach {
        case (p, v) =>
          if (datasetHead(conf, p) != v) LanceMaintenance.restore(spark, p, v)
      }
      val (cvPub, cbPub) = (datasetHead(conf, centsPath), datasetHead(conf, cbsPath))
      val headV = datasetHead(conf, sourcePath)
      val publishedVv =
        if (headV == builtV) datasetHead(conf, pqPath)
        else {
          val cLit = typedlit(
            pqCentroids(spark, indexPath, Some(cvPub)).map(_.toSeq).toSeq)
          val cbLit = typedlit(
            pqCodebooks(spark, indexPath, Some(cbPub)).flatMap(_.map(_.toSeq)).toSeq)
          val idxCols = spark.read.format("lance").load(pqPath)
            .schema.fieldNames
          // persist the encoded tail: mergeInsert consumes its source
          // several times and repartitionByRange samples its child — the
          // ivfUpdateIndex lesson, which measured the kernels re-running
          // four to five times without this
          val assigned = spark.read.format("lance")
            .option("fromVersion", builtV).option("versionAsOf", headV)
            .load(sourcePath)
            .withColumn("list_id",
              graft.functions.ArrayKernels.nearestCentroid(col(vecCol), cLit))
            .withColumn("pq_code",
              graft.functions.ArrayKernels.pqEncode(col(vecCol), cbLit))
            .select(idxCols.map(col).toIndexedSeq: _*)
            .persist()
          try {
            LanceMaintenance.mergeInsert(spark, pqPath,
              assigned
                .repartitionByRange(math.max(writePartitions, 1), col("list_id"))
                .sortWithinPartitions("list_id"),
              Seq(idCol))
          } finally assigned.unpersist(false)
          datasetHead(conf, pqPath)
        }
      import spark.implicits._
      Seq((headV, publishedVv, cvPub, cbPub))
        .toDF("built_version", "vectors_version",
              "centroids_version", "codebooks_version")
        .coalesce(1).write.format("lance").mode("overwrite").save(metaPath)
      metaCache.remove(metaPath)
      headV
    }
  }

  private val pqCbCache = new Lru[Array[Array[Array[Double]]]](32)
  private val pqCentroidCache = new Lru[Array[Array[Double]]](32)

  /** Test hook: simulate a fresh session for the PQ path (includes the
    * meta cache — the PQ probe pin reads through it). */
  private[graft] def clearPqCache(): Unit = {
    pqCbCache.clear(); pqCentroidCache.clear(); metaCache.clear()
  }

  /** Coarse centroids of the PQ index (its own sidecar — see
    * [[ivfPqBuildPersist]]), optionally pinned at a meta-recorded
    * sidecar version (cache key carries the pin: a crashed-rebuild
    * window's pinned read must not serve a pre-crash head read). */
  def pqCentroids(spark: org.apache.spark.sql.SparkSession,
                  indexPath: String,
                  pin: Option[Long] = None): Array[Array[Double]] =
    pqCentroidCache.getOrLoad(s"$indexPath@${pin.getOrElse(-1L)}") {
      val base = spark.read.format("lance")
      pin.fold(base)(v => base.option("versionAsOf", v))
        .load(s"$indexPath/pq_centroids.lance")
        .orderBy("list_id").collect()
        .map(_.getSeq[Double](1).toArray)
    }

  def pqCodebooks(spark: org.apache.spark.sql.SparkSession,
                  indexPath: String,
                  pin: Option[Long] = None): Array[Array[Array[Double]]] =
    pqCbCache.getOrLoad(s"$indexPath@${pin.getOrElse(-1L)}") {
      val base = spark.read.format("lance")
      pin.fold(base)(v => base.option("versionAsOf", v))
        .load(s"$indexPath/pq_codebooks.lance")
        .orderBy("sub", "code").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.map(_.getSeq[Float](2).map(_.toDouble).toArray)).toArray
    }

  /** Probe an IVF_PQ index: pick `nProbe` lists driver-side, scan only
    * their fragments of `pq.lance`, score codes with the one-lookup-per-
    * subspace ADC kernel, keep the top `k * rerank` candidates, then
    * re-rank those ids EXACTLY against `corpus` via a broadcast semi-join
    * (the realized candidate ids push into a lance corpus scan's zone
    * maps as a runtime IN-list filter, so re-rank touches candidate rows,
    * not the table). One bounded driver transfer: probe lists (nLists
    * rows); candidate ids stay distributed. */
  def ivfPqSearch(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                  corpus: DataFrame, idCol: String, vecCol: String,
                  query: Seq[Float], k: Int, nProbe: Int = DefaultNProbe,
                  rerank: Int = 4): DataFrame = {
    val cand = ivfPqCandidates(spark, indexPath, idCol, query, k, nProbe, rerank)
    // Exact re-rank with NO driver collect (the ivfSearchPersistedLive
    // shape): the corpus semi-joins the broadcast ADC top-(k·rerank)
    // candidate ids, and when the corpus is a lance scan its
    // SupportsRuntimeV2Filtering receives the realized ids as an IN-list
    // zone filter through the PartitionPruning subquery that REUSES the
    // candidate broadcast — bounded point reads of candidate rows, never
    // a table scan, and the ADC probe executes once. A semi-join keeps
    // each corpus row at most once (exactly the old isin semantics), so
    // no dedup is needed.
    corpus.join(broadcast(cand.select(col(idCol))), Seq(idCol), "left_semi")
      .select(col(idCol), cosine(col(vecCol), typedlit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The ADC candidate plan of [[ivfPqSearch]] — (idCol, acos), the top
    * `k * rerank` approximate hits from the probed lists of `pq.lance`,
    * BEFORE the exact re-rank. Factored out so the spec can pin that the
    * realized candidate ids (exactly these) reach the corpus scan as a
    * runtime IN-list filter. */
  private[graft] def ivfPqCandidates(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      idCol: String, query: Seq[Float], k: Int, nProbe: Int,
      rerank: Int): DataFrame = {
    // ONE atomic publish-record read covers codes AND sidecars: inside a
    // crashed-rebuild window the head sidecars already hold the NEW
    // codebooks while the pin still points at OLD codes — scoring one
    // with the other would be garbage, so all three reads pin together
    val pqMeta = metaOf(spark, indexPath, "pq_meta.lance")
    val cents = pqCentroids(spark, indexPath, pqMeta.flatMap(_.centsPin))
    val cbs = pqCodebooks(spark, indexPath, pqMeta.flatMap(_.cbsPin))
    val m = cbs.length
    val dsub = cbs(0)(0).length
    val qd = query.map(_.toDouble).toArray
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(c.length, qd.length)) { val d = c(i) - qd(i); s += d * d; i += 1 }
      s
    }
    val probeLists = cents.zipWithIndex.sortBy(p => dist2(p._1)).take(nProbe).map(_._2)
    // ADC lookup table: dot(query_s, code) and |code|^2 per (subspace, code)
    val lut = new Array[Double](2 * m * 256)
    var s = 0
    while (s < m) {
      var b = 0
      while (b < 256) {
        val cent = cbs(s)(b)
        var dot = 0.0; var nrm = 0.0; var d = 0
        while (d < dsub) { val c = cent(d); dot += c * qd(s * dsub + d); nrm += c * c; d += 1 }
        lut(s * 256 + b) = dot
        lut((m + s) * 256 + b) = nrm
        b += 1
      }
      s += 1
    }
    val qNorm = math.sqrt(qd.map(x => x * x).sum)
    // Publish pin (the ivfSearchPersistedAt discipline for the PQ
    // flavor): an index built through ivfPqBuildPersistLance carries a
    // pq_meta.lance whose vectors_version records the last PUBLISHED
    // pq.lance state, so a crashed ivfPqUpdateIndex's orphaned commit is
    // invisible to probes. No-meta indexes (plain ivfPqBuildPersist on a
    // DataFrame) read head, as before.
    val base = spark.read.format("lance")
    val pinned = pqMeta.flatMap(_.vecPin)
      .fold(base)(v => base.option("versionAsOf", v))
    pinned.load(s"$indexPath/pq.lance")
      .filter(col("list_id").isin(probeLists.toIndexedSeq: _*))
      .select(col(idCol),
        (graft.functions.ArrayKernels.pqAdcScore(col("pq_code"), typedlit(lut.toSeq))
          / lit(qNorm)).as("acos"))
      .orderBy(col("acos").desc, col(idCol))
      .limit(k * rerank)
  }

  /** The full between-rebuilds search contract for the PQ flavor —
    * [[ivfSearchCombinedLive]] for an IVF_PQ index, in ONE face because
    * the PQ path gets liveness for free: the exact re-rank reads the
    * LIVE source, so deleted candidates drop out of the re-rank
    * semi-join, and a deleted-then-re-appended id scores with its
    * CURRENT vector (never the stale code's) — no anti-join retirement
    * and no over-fetch refill hazard, since the re-rank refills top-k
    * from the k*rerank ADC candidate pool. The tail side brute-forces
    * only the fragments appended after the recorded build version (a
    * sliver until the next rebuild or [[ivfPqUpdateIndex]]). An id
    * surfacing on both sides carries the SAME exact cosine — both sides
    * compute it from the live source — so a grouped first-win dedups
    * without choosing between copies.
    *
    * Torn-read note: unlike the plain flavor this face needs no atomic
    * (built_version, pin) pair. If a cross-process optimize publishes
    * between this tail-bound read and the probe's own pin read, every
    * row the newer index covers also still sits in the older-bounded
    * (larger) tail, and the grouped max merges the duplicates —
    * correctness never rests on the two meta reads agreeing. */
  def ivfPqSearchCombinedLive(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, sourcePath: String,
                              idCol: String, vecCol: String,
                              query: Seq[Float], k: Int,
                              nProbe: Int = DefaultNProbe,
                              rerank: Int = 4): DataFrame = {
    val builtV = metaOf(spark, indexPath, "pq_meta.lance").getOrElse(
      throw new IllegalStateException(
        s"$indexPath has no pq_meta.lance — build with ivfPqBuildPersistLance"))
      .built
    val live = spark.read.format("lance").load(sourcePath)
    val idxTop = ivfPqSearch(spark, indexPath, live, idCol, vecCol,
      query, k, nProbe, rerank)
    val tail = spark.read.format("lance")
      .option("fromVersion", builtV).load(sourcePath)
    val tailTop = cosineTopK(tail, idCol, vecCol, query, k)
    idxTop.unionByName(tailTop)
      .groupBy(col(idCol)).agg(max(col("cos")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Similarity JOIN within an L2 radius via MLlib's
    * BucketedRandomProjectionLSH (the §2.5-suggested building block):
    * (id_a, id_b, dist) pairs with dist <= radius, id_a < id_b.
    * Approximate — candidate pairs come from shared hash buckets, so
    * recall < 1; distances on surfaced pairs are exact. */
  def l2SimilarityJoinLsh(df: DataFrame, idCol: String, vecCol: String,
                          radius: Double, bucketLength: Double = 2.0,
                          numTables: Int = 3, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    val featured = df.select(col(idCol),
      org.apache.spark.ml.functions.array_to_vector(col(vecCol)).as("__features"))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      .setInputCol("__features").setOutputCol("__hashes")
      .fit(featured)
    model.approxSimilarityJoin(featured, featured, radius, "dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
              col(s"datasetB.$idCol").as("id_b"), col("dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** Approximate top-k: restrict the exact cosine ranking to vectors whose
    * LSH bucket matches the query's bucket in at least one of `nTables`
    * independent hash tables. Buckets are computed by the codegen'd
    * [[graft.functions.HyperplaneBucket]] kernel (one fused loop per
    * table). At scale: corpus bucketing is a one-off (materialize the
    * bucket columns, partition by them); a query then scans only its
    * buckets' partitions instead of 100 TB.
    *
    * Defaults (4 bits x 16 tables) target ~0.9 recall even for weakly
    * similar neighbours (cos ~ 0.3, hyperplane agreement ~ 0.6/plane);
    * strongly clustered corpora can afford more bits per table for
    * sharper pruning.
    */
  def annCosineTopK(df: DataFrame, idCol: String, vecCol: String,
                    query: Seq[Float], k: Int, nBits: Int = 4,
                    nTables: Int = 16): DataFrame = {
    val dim = query.length
    val q = typedlit(query)
    val anyMatch = (0 until nTables).map { t =>
      val pl = planes(t, nBits, dim)
      graft.functions.ArrayKernels.hyperplaneBucket(
        col(vecCol), typedlit(pl.map(_.toSeq).toSeq)) === lit(bucketOf(query, pl))
    }.reduce(_ || _)
    df.filter(anyMatch)
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Batched ANN: per-query IVF top-k for a whole TABLE of query vectors
    * — the shape dedup/retrieval pipelines actually run (N queries x
    * corpus, not one driver-side vector at a time). Fully distributed on
    * both sides:
    *
    *  1. probe assignment — centroids ship as one broadcast literal;
    *     each query row ranks them with array HOFs and explodes its
    *     `nProbe` closest list ids (no driver loop over queries);
    *  2. candidate generation — the skinny (qid, qvec, list_id) frame
    *     joins the indexed corpus ON list_id, so each query only meets
    *     the ~nProbe/nLists fraction of the corpus co-located with it;
    *  3. scoring + selection — codegen cosine per candidate, then the
    *     bounded-heap [[graft.functions.TopKAgg]] per qid: map-side
    *     partials mean only k rows per (mapper, query) reach the final
    *     shuffle.
    *
    * Returns (qid, rank, idCol, cos) with rank 1..k per query.
    */
  def ivfBatchCosineTopK(indexed: DataFrame, centroids: Array[Array[Double]],
                         idCol: String, vecCol: String,
                         queries: DataFrame, qidCol: String, qvecCol: String,
                         k: Int, nProbe: Int): DataFrame = {
    val cLit = typedlit(centroids.map(_.toSeq).toSeq)
    def dist2(q: Column, c: Column): Column =
      aggregate(zip_with(q, c, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
      }), lit(0.0), (acc, x) => acc + x)
    val probes = queries
      .select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
      .withColumn("probe_lists",
        slice(transform(
          array_sort(transform(cLit, (c, i) =>
            struct(dist2(col("qvec"), c).as("d"), i.as("list")))),
          s => s.getField("list")), 1, nProbe))
      .select(col("qid"), col("qvec"), explode(col("probe_lists")).as("list_id"))
    // Bound the corpus scan to the UNION of every query's probe lists —
    // one tiny query-side job shipping at most nLists ints to the driver
    // (regardless of batch size), so a PERSISTED index's per-fragment
    // [min,max] list_id stats prune unprobed fragments exactly like the
    // single-query probe path. The probe subtree runs twice (union pick +
    // join); its cost is bounded by the QUERY batch, never the corpus.
    val unionLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0))
    val pruned = indexed.filter(col("list_id").isin(unionLists.toIndexedSeq: _*))
    val scored = probes.join(pruned, "list_id")
      .select(col("qid"),
              cosine(col(vecCol), col("qvec")).as("cos"),
              col(idCol).cast("long").as("cand"))
    scored.groupBy("qid")
      .agg(graft.functions.TopKAgg.top_k(col("cos"), col("cand"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
              col("col.payload").as(idCol), col("col.ord").as("cos"))
  }
}
