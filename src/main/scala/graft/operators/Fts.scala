package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full-text search with BM25 ranking — the lance-index FTS analogue.
  *
  * The reference engine gets full-text search from the lance crate's
  * tantivy-backed inverted index (`/root/reference/Cargo.lock`: `lance-index`
  * -> `tantivy 0.24`): `create_index` builds term postings, queries rank with
  * BM25. This module re-expresses that Spark-first:
  *
  *  - [[buildIndex]] persists an inverted index as lance datasets:
  *    `postings.lance` `(term, doc_id, tf, dl)` range-partitioned and sorted
  *    by term — each fragment covers a narrow term range, so the manifest's
  *    per-fragment/page min-max stats let a query's term IN-list prune
  *    whole fragments without opening them (same mechanism the IVF index
  *    uses for `list_id`); `terms.lance` `(term, df)` (vocabulary-sized,
  *    same layout); `stats.lance` (one row: corpus size + total token
  *    count).
  *  - [[searchPersisted]] scores a term query against the index: the
  *    postings scan reads only probed-term fragments, document frequencies
  *    arrive via a broadcast join of the (pruned) vocabulary, scores
  *    accumulate in an order-independent fixed-point interior, and the
  *    final top-k fuses to TakeOrderedAndProject. At 100 TB the per-query
  *    cost is proportional to the query terms' posting lists — never the
  *    corpus — and the only shuffle is the skinny `(doc_id, long)`
  *    aggregation.
  *
  * Scoring is Lucene/tantivy-shape BM25:
  * {{{
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   w(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  * }}}
  * with k1 = 1.2, b = 0.75.
  *
  * Determinism contract (the d13/Det recipe): `idf` is rounded to 8
  * decimals (both engines' `ln` agree far past that at these magnitudes),
  * each per-(doc,term) contribution is floored to an exact micro-unit long
  * `floor(w * 1e6 + 0.5)`, and the per-doc score is the SUM of those longs
  * — associative, order-independent, bit-identical between a distributed
  * Spark aggregation and DuckDB's single-node oracle.
  */
object Fts {

  val K1 = 1.2
  val B  = 0.75

  /** Tokenized postings `(doc_id, term, tf, dl, positions)` — one row per
    * distinct (document, term); `dl` is the document's token count and
    * `positions` the sorted token offsets (what tantivy's
    * `with_position` postings store — they power persisted phrase
    * queries and cost nothing at ranking time: BM25 scans prune the
    * column). Tokenization is single-space split, matching the corpus
    * convention (and the oracle's `string_split`).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast(LongType).as("doc_id"),
                split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
              posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"),
           sort_array(collect_list(col("pos"))).as("positions"))

  /** Corpus stats: one row `(n_docs, total_len)`. NULL-text documents are
    * excluded — they post no terms (see [[postings]]), so counting them
    * here would make the statistics diverge between the raw path and the
    * postings-derived path ([[buildIndexFromPostings]]). */
  def corpusStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
           sum(size(split(col(textCol), " ")).cast(LongType)).as("total_len"))

  /** Build and persist the inverted index under `indexPath` (three lance
    * datasets — see the object doc). The postings write is the one big job
    * (a token explode + hash aggregate + range shuffle); everything else is
    * vocabulary-sized or constant.
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
                 indexPath: String, writePartitions: Int = 8): Unit =
    buildIndexFromPostings(docs.sparkSession,
      postings(docs, idCol, textCol), indexPath, writePartitions)

  /** [[buildIndex]] interior over an ALREADY-TOKENIZED postings frame
    * (the [[postings]] schema) — the "stage the tokenization once" path:
    * several index flavors over the same corpus (plain, lance-attached,
    * a live twin) each derive their sidecars from one staged
    * `(doc_id, dl, term, tf, positions)` dataset instead of re-tokenizing
    * the corpus per flavor. The frame is written to `postings.lance`
    * FIRST and the vocabulary + corpus stats derive from the on-disk
    * copy (column-pruned scans of the skinny columns), so even the
    * single-build path tokenizes exactly once — the round-10 shape
    * re-ran the tokenize lineage for postings, terms AND stats.
    *
    * Stats parity: every tokenized document posts ≥ 1 term (split never
    * returns an empty array) and `dl` is constant per doc, so the
    * (count, sum-of-dl) over one row per doc equals [[corpusStats]] on
    * the raw table exactly. Documents with NULL text post no terms and
    * are excluded from the statistics everywhere (they can never match
    * a term query); corpora that want them counted must coalesce
    * upstream.
    */
  def buildIndexFromPostings(spark: SparkSession, p: DataFrame,
                             indexPath: String,
                             writePartitions: Int = 8): Unit =
    // same lock updateIndex holds: two concurrent rebuilds (or a rebuild
    // racing an update) would interleave sidecar overwrites — readers
    // pin, so they stay consistent, but the LOSER's sidecars could end
    // up published under the winner's tombstone/pins
    graft.sources.lance.MaintenanceLock.withLock(indexPath,
        spark.sessionState.newHadoopConf()) {
      buildIndexFromPostingsLocked(spark, p, indexPath, writePartitions)
    }

  private def buildIndexFromPostingsLocked(spark: SparkSession, p: DataFrame,
                                           indexPath: String,
                                           writePartitions: Int): Unit = {
    p.repartitionByRange(writePartitions, col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.format("lance").mode("overwrite").save(s"$indexPath/postings.lance")
    val staged = spark.read.format("lance").load(s"$indexPath/postings.lance")
    // df per term: postings are already one row per (doc, term)
    staged.groupBy("term").agg(count(lit(1)).as("df"))
      .repartitionByRange(math.max(writePartitions / 4, 1), col("term"))
      .sortWithinPartitions("term")
      .write.format("lance").mode("overwrite").save(s"$indexPath/terms.lance")
    staged.groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
           sum(col("dl")).cast(LongType).as("total_len"))
      .coalesce(1)
      .write.format("lance").mode("overwrite").save(s"$indexPath/stats.lance")
    // a rebuild over a previously pinned path must retire the stale
    // publish point ITSELF, not just this JVM's cache: built.lance pins
    // the OLD sidecar versions and any other process would keep reading
    // them. Retire = overwrite with a TOMBSTONE row (every version field
    // = NoBuilt), NOT a delete: deleting resets the dataset's version
    // counter to 1 on the next publish, and a remote pins cache keyed at
    // (1, oldPins) would treat that republished version-1 head as
    // already-seen — stale pins forever. The tombstone keeps the publish
    // point's version strictly monotonic across rebuilds, and [[pinsOf]]
    // reads it as "unpinned" (sidecar heads are authoritative).
    try {
      import graft.sources.lance.LanceFormat
      val (bfs, bp) = LanceFormat.fileSystem(s"$indexPath/built.lance",
        spark.sessionState.newHadoopConf())
      if (bfs.exists(bp)) {
        spark.createDataFrame(
            Seq((NoBuilt, "", "", NoBuilt, NoBuilt, NoBuilt)))
          .toDF("built_version", "id_col", "text_col",
                "postings_version", "terms_version", "stats_version")
          .coalesce(1).write.format("lance").mode("overwrite")
          .save(s"$indexPath/built.lance")
      }
    } catch { case _: Exception => () } // best-effort; pinsOf stats per read
    val headAfter =
      try builtHeadVersion(spark, indexPath) catch { case _: Exception => NoBuilt }
    putPins(indexPath, headAfter, None)
    val sk = statsHeadKey(spark, indexPath)
    if (sk != null) statsCache.put(indexPath, (sk, readStats(spark, indexPath)))
  }

  /** Corpus stats cached per index, validated against a freshness key.
    * PUBLISHED (built.lance) indexes key on the current pins — a publish,
    * local or cross-process, changes the pins and invalidates the entry.
    * PINLESS (plain-build) indexes have no publish point whose version a
    * rebuild would advance, so they key on stats.lance's OWN head version
    * instead (one manifest stat per read) — a cross-process rebuild
    * overwrites stats.lance, advancing that version, and invalidates
    * here too. A null key marks a transient store failure: the lookup
    * bypasses the cache (fresh read) and nothing is cached. */
  private val statsCache = new graft.functions.Lru[(Any, (Long, Long))](32)

  /** stats.lance's head version boxed as the pinless freshness key, or
    * null on a transient store failure (callers bypass the cache). */
  private def statsHeadKey(spark: SparkSession, indexPath: String): Any =
    try java.lang.Long.valueOf(headVersion(
      spark.sessionState.newHadoopConf(), s"$indexPath/stats.lance"))
    catch { case _: Exception => null }

  private def statsOf(spark: SparkSession, indexPath: String): (Long, Long) = {
    val key: Any = pinsOf(spark, indexPath) match {
      case sp @ Some(_) => sp
      case None         => statsHeadKey(spark, indexPath)
    }
    val c = statsCache.get(indexPath).orNull
    if (key != null && c != null && c._1 == key) c._2
    else {
      val s = readStats(spark, indexPath)
      if (key != null) statsCache.put(indexPath, (key, s))
      s
    }
  }

  private def readStats(spark: SparkSession, indexPath: String): (Long, Long) = {
    val r = sidecar(spark, indexPath, "stats").head()
    (r.getLong(0), r.getLong(1))
  }

  /** Published sidecar versions. `built.lance` is the index's ONE atomic
    * publish point: it records the exact postings/terms/stats versions a
    * reader may see, so the multi-dataset update sequence in
    * [[updateIndex]] is all-or-nothing — a fence-aborted (or crashed)
    * updater leaves only UNREFERENCED sidecar versions behind, which the
    * next updater sweeps (postings: [[graft.sources.lance.LanceMaintenance.restore]]
    * back to the published version before re-appending) or simply never
    * reads (terms/stats overwrites read their pinned inputs). Without the
    * pins, a fence abort between sidecar commits left a half-published
    * update: the tail already appended to postings but `built_version`
    * unchanged, so the NEXT updater appended the same tail again —
    * duplicated (term, doc_id) rows, silent BM25 corruption. */
  private case class Pins(postingsV: Long, termsV: Long, statsV: Long)

  /** Sentinel "no built.lance" version for the pins cache. */
  private val NoBuilt = -1L

  /** Cached pins, keyed by the built.lance head version they were read
    * at — a cross-process publish advances that version, so the next
    * [[pinsOf]] call picks it up (one manifest stat per read, no TTL). */
  private val pinsCache = new graft.functions.Lru[(Long, Option[Pins])](32)

  /** Last-known pins per index path, NON-evicting by design: this map
    * backs only the transient-store-failure fallback in [[pinsOf]], whose
    * contract is "stale-but-consistent beats unpinned-and-possibly-torn".
    * The bounded [[pinsCache]] cannot serve that role — an LRU eviction
    * on a driver touching >32 indexes would silently downgrade a flaky
    * read to unpinned sidecar heads. Entries are three longs plus the
    * path string, so even a driver touching a million index paths holds
    * tens of MB here, and a path is only ever added when its index is
    * actually read — this is a roster, not a cache. */
  private val fallbackPins =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Pins]]()

  /** Write-through for the pins caches: the bounded LRU entry (fast
    * path, freshness-keyed) plus the non-evicting last-known entry the
    * failure fallback reads. */
  private def putPins(indexPath: String, head: Long,
                      pins: Option[Pins]): Unit = {
    pinsCache.put(indexPath, (head, pins))
    fallbackPins.put(indexPath, pins)
  }

  /** The failure fallback: last pins successfully read for this path, in
    * this JVM, regardless of LRU eviction. */
  private def lastKnownPins(indexPath: String): Option[Pins] =
    Option(fallbackPins.get(indexPath)).flatten

  /** built.lance's current head version, or [[NoBuilt]] when the dataset
    * does not exist (legacy / plain-build index). Throws on a transient
    * store failure — callers must NOT conflate that with "legacy". */
  private def builtHeadVersion(spark: SparkSession, indexPath: String): Long = {
    import graft.sources.lance.LanceFormat
    val (fs, p) = LanceFormat.fileSystem(s"$indexPath/built.lance",
      spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) NoBuilt
    else LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
  }

  /** Pins from `built.lance` (None: an index built by the plain
    * [[buildIndex]] path — sidecar heads are read directly, the pre-pins
    * behavior). Every call stats the publish point's head version, so a
    * publish by ANOTHER process becomes visible at the next read here. A
    * transient store failure falls back to the last-known pins for THIS
    * read only and is never cached — the next call retries instead of
    * permanently downgrading the index to unpinned head reads. */
  private def pinsOf(spark: SparkSession, indexPath: String): Option[Pins] = {
    val headNow =
      try builtHeadVersion(spark, indexPath)
      catch { case _: Exception =>
        // stale-but-consistent beats unpinned-and-possibly-torn — served
        // from the non-evicting roster, so an LRU eviction can't downgrade
        return lastKnownPins(indexPath)
      }
    val cached = pinsCache.get(indexPath).orNull
    if (cached != null && cached._1 == headNow) return cached._2
    if (headNow == NoBuilt) {
      putPins(indexPath, NoBuilt, None)
      return None
    }
    try {
      // read pinned at the version just statted — a racing overwrite
      // between the stat and this read cannot tear the row
      val b = spark.read.format("lance").option("versionAsOf", headNow)
        .load(s"$indexPath/built.lance")
      val pins =
        if (b.columns.contains("postings_version")) {
          val r = b.head()
          val pv = r.getAs[Long]("postings_version")
          // NoBuilt sentinel = tombstone (plain rebuild retired the
          // publish point): sidecar heads are authoritative, no pins
          if (pv == NoBuilt) None
          else Some(Pins(pv, r.getAs[Long]("terms_version"),
                         r.getAs[Long]("stats_version")))
        } else None
      putPins(indexPath, headNow, pins)
      pins
    } catch { case _: Exception =>
      // stat succeeded but the read failed: transient — don't cache
      lastKnownPins(indexPath)
    }
  }

  private def pinsFromRow(r: org.apache.spark.sql.Row): Option[Pins] =
    if (r.length >= 6 && r.getLong(3) != NoBuilt)
      Some(Pins(r.getLong(3), r.getLong(4), r.getLong(5)))
    else None

  /** Reject a tombstoned publish point for operations that need the
    * lance-attached metadata (source version / column names): after a
    * plain-path rebuild those fields are retired, and e.g. an
    * incremental update or a combined search would CDC-scan from a
    * bogus source version. */
  private def requirePublished(r: org.apache.spark.sql.Row,
                               indexPath: String): Unit =
    require(r.length < 6 || r.getLong(3) != NoBuilt,
      s"$indexPath: publish point is a tombstone — the index was rebuilt " +
        "by the plain buildIndex path since its last lance-attached " +
        "publish; re-run buildIndexLance against the source dataset")

  /** A sidecar scan pinned at its PUBLISHED version — every reader goes
    * through here, so in-flight (unpublished) sidecar commits are
    * invisible exactly like uncommitted MVCC writes. */
  private def sidecar(spark: SparkSession, indexPath: String,
                      name: String): DataFrame = {
    val base = spark.read.format("lance")
    pinsOf(spark, indexPath) match {
      case Some(p) =>
        val v = name match {
          case "postings" => p.postingsV
          case "terms"    => p.termsV
          case _          => p.statsV
        }
        base.option("versionAsOf", v).load(s"$indexPath/$name.lance")
      case None => base.load(s"$indexPath/$name.lance")
    }
  }

  private def headVersion(conf: org.apache.hadoop.conf.Configuration,
                          path: String): Long = {
    import graft.sources.lance.LanceFormat
    val (fs, p) = LanceFormat.fileSystem(path, conf)
    LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, None)).version
  }

  /** Test hook: simulate a fresh session (forces the stats/pins re-read). */
  private[graft] def clearStatsCache(): Unit = {
    statsCache.clear()
    pinsCache.clear()
    fallbackPins.clear()
  }

  /** The fixed-point BM25 contribution of one posting row, as a long in
    * micro-units. Columns required: term, tf, dl, df; `nDocs`/`avgdl` are
    * corpus constants folded into the expression.
    *
    * Every constant is a plain decimal literal (`2.2`, `1.2`, `0.25`,
    * `0.75`) so the Spark expression and the DuckDB oracle parse the SAME
    * double — a computed `K1 + 1.0` could round differently from a parsed
    * `2.2`. The operation order mirrors the oracle SQL's parse tree
    * exactly; identical IEEE ops on identical inputs give identical bits.
    */
  private def contribMicro(nDocs: Long, avgdl: Double): org.apache.spark.sql.Column = {
    val idf8 = round(log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 8)
    val tfw = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
    floor(idf8 * tfw * lit(1e6) + lit(0.5)).cast(LongType)
  }

  /** Score `terms` against prepared postings+df frames (index-free path:
    * both derived from the raw table; index path: both lance scans with the
    * IN-list pushed). Returns `(doc_id, score)`, top `k` by score desc with
    * doc_id tie-break.
    */
  def bm25TopK(postings: DataFrame, termDf: DataFrame, nDocs: Long,
               totalLen: Long, terms: Seq[String], k: Int): DataFrame =
    bm25Scores(postings, termDf, nDocs, totalLen, terms)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Per-doc BM25 scores of `terms` (no ranking cut) — the shared interior
    * of [[bm25TopK]] and [[searchBoolean]]. */
  def bm25Scores(postings: DataFrame, termDf: DataFrame, nDocs: Long,
                 totalLen: Long, terms: Seq[String]): DataFrame = {
    val avgdl = totalLen.toDouble / nDocs
    postings.filter(col("term").isin(terms: _*))
      // left join + df->0: identical to inner when postings and vocabulary
      // derive from the same corpus (every posted term has a df row);
      // lets [[searchCombined]]'s tail-only terms score at the formula's
      // df->0 limit instead of vanishing
      .join(broadcast(termDf.filter(col("term").isin(terms: _*))),
            Seq("term"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .select(col("doc_id"), contribMicro(nDocs, avgdl).as("micro"))
      .groupBy("doc_id")
      .agg(round(sum(col("micro")) / lit(1e6), 6).as("score"))
  }

  /** Index-free BM25 (the oracle-shaped path): everything computed from the
    * raw table in one lineage. Used when no index exists — the full-corpus
    * tokenize is the price.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int): DataFrame = {
    val p  = postings(docs, idCol, textCol)
    val df = p.groupBy("term").agg(count(lit(1)).as("df"))
    val st = corpusStats(docs, idCol, textCol).head()
    bm25TopK(p, df, st.getLong(0), st.getLong(1), terms, k)
  }

  /** Search a persisted index: corpus stats from the (cached) one-row
    * sidecar; postings and vocabulary scans carry the term IN-list into the
    * lance source, so fragments outside the probed term ranges are never
    * opened.
    */
  def searchPersisted(spark: SparkSession, indexPath: String,
                      terms: Seq[String], k: Int): DataFrame = {
    val (nDocs, totalLen) = statsOf(spark, indexPath)
    searchWithStats(spark, indexPath, nDocs, totalLen, terms, k)
  }

  /** The probe plan with corpus stats supplied by the caller — shared by
    * [[searchPersisted]] and the declarative rewrite
    * ([[graft.plans.FtsTopKRewrite]], whose registry caches the stats at
    * registration so PLANNING never runs a job).
    */
  def searchWithStats(spark: SparkSession, indexPath: String, nDocs: Long,
                      totalLen: Long, terms: Seq[String], k: Int): DataFrame = {
    val p  = sidecar(spark, indexPath, "postings")
    val df = sidecar(spark, indexPath, "terms")
    bm25TopK(p, df, nDocs, totalLen, terms, k)
  }

  /** Delete-aware search of a persisted index (the ANN
    * `ivfSearchPersistedLive` contract applied to FTS): postings store a
    * COPY of the term statistics, so a document deleted from `sourcePath`
    * after the build would otherwise still rank. The probe over-fetches a
    * bounded candidate set, verifies liveness against the source with a
    * pushed id IN-list (zone-pruned point reads — O(k), never a corpus
    * scan), and returns the top `k` live survivors. Scores keep the
    * build-era statistics (the stale-FTS contract — tantivy segments
    * likewise score deleted-doc-free results with segment-era stats until
    * a merge).
    */
  def searchPersistedLive(spark: SparkSession, indexPath: String,
                          sourcePath: String, idCol: String,
                          terms: Seq[String], k: Int): DataFrame = {
    val over = math.max(4 * k, k + 64)
    val candsDf = searchPersisted(spark, indexPath, terms, over)
    liveTopK(spark, sourcePath, idCol, candsDf, k)
  }

  /** The liveness mask shared by [[searchPersistedLive]] and
    * [[searchCombinedLive]] (the ANN
    * [[graft.operators.Similarity.ivfSearchPersistedLive]] shape): the
    * source joins the broadcast candidate set `(doc_id, score)`, and the
    * lance scan's SupportsRuntimeV2Filtering receives the realized
    * candidate ids as an IN-list zone filter once the broadcast
    * materializes — bounded point reads, never a corpus scan, no
    * driver-side collect, and the probe's broadcast is shared with the
    * pruning subquery so it executes once. The result stays a lazy
    * distributed plan. The grouped first-win restores semi-join
    * semantics when the source holds duplicate ids (update-by-append) —
    * grouping on the id alone keeps the exchange keyed on ≤candidates
    * ids after map-side partial aggregation, cheaper than an
    * all-columns distinct. */
  private def liveTopK(spark: SparkSession, sourcePath: String,
                       idCol: String, candsDf: DataFrame, k: Int): DataFrame = {
    val cands = if (idCol == "doc_id") candsDf
                else candsDf.withColumnRenamed("doc_id", idCol)
    val src = spark.read.format("lance").load(sourcePath).select(col(idCol))
    src.join(broadcast(cands), Seq(idCol), "inner")
      .groupBy(col(idCol)).agg(max(col("score")).as("score"))
      .select(col(idCol).as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Fuzzy term search over a persisted index (tantivy `FuzzyTermQuery`
    * parity — lance FTS exposes `fuzziness` on match queries): each query
    * term expands to every VOCABULARY term within Levenshtein distance
    * `maxDist`, and the union of expanded terms scores through the normal
    * BM25 probe — each matched index term contributes with its OWN
    * document frequency (tantivy semantics: a fuzzy query is an OR over
    * the matched index terms, not a frequency merge).
    *
    * Scale shape: expansion is a scan of `terms.lance` (vocabulary-sized,
    * millions of rows at worst — orders of magnitude under the corpus)
    * with a codegen `levenshtein` filter; only the matched terms (a
    * handful, bounded by `maxExpansions` like tantivy's 50-state cap)
    * come back to the driver to become the probe's IN-list, which then
    * prunes postings fragments exactly like an exact-term search. The
    * collect is O(maxExpansions), never O(vocab).
    */
  def searchFuzzy(spark: SparkSession, indexPath: String,
                  terms: Seq[String], maxDist: Int, k: Int,
                  maxExpansions: Int = 50): DataFrame = {
    val vocab = sidecar(spark, indexPath, "terms")
    val matched = vocab
      .filter(terms.map(t => levenshtein(col("term"), lit(t)) <= maxDist)
                   .reduce(_ || _))
      // deterministic cap: most-frequent terms first (tantivy keeps the
      // automaton's first matches; a df-ordered cap is the analogous
      // bounded choice and is stable across runs)
      .orderBy(col("df").desc, col("term"))
      .limit(maxExpansions)
      .select("term").collect().map(_.getString(0)).toSeq
    val (nDocs, totalLen) = statsOf(spark, indexPath)
    if (matched.isEmpty)
      searchWithStats(spark, indexPath, nDocs, totalLen, Seq(" "), k)
    else searchWithStats(spark, indexPath, nDocs, totalLen, matched, k)
  }

  /** Build the index FOR a lance dataset, recording the source head
    * version and column names in the `built.lance` sidecar so
    * [[searchCombined]] can cover the append tail (the ANN/scalar
    * combined-search pattern applied to FTS) and [[attachIndex]] can
    * re-register in a fresh session. Also registers the index with
    * [[graft.plans.GraftFts]], enabling the declarative
    * `graft_bm25(...) ORDER BY ... LIMIT k` rewrite over `sourcePath`.
    */
  def buildIndexLance(spark: SparkSession, sourcePath: String, idCol: String,
                      textCol: String, indexPath: String,
                      writePartitions: Int = 8,
                      stagedPostings: Option[DataFrame] = None): Long = {
    import graft.sources.lance.LanceFormat
    val conf = spark.sessionState.newHadoopConf()
    // hold the maintenance lock across rebuild AND republish: without it
    // a concurrent updateIndex (or twin rebuild) could interleave between
    // the interior's tombstone and this publish, and cross-process
    // readers would head-read a mix of two writers' sidecars
    graft.sources.lance.MaintenanceLock.withLock(indexPath, conf) {
    val (fs, p) = LanceFormat.fileSystem(sourcePath, conf)
    val builtV = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
    // stagedPostings: a pre-tokenized [[postings]] frame of the SAME
    // corpus content as `sourcePath` at `builtV` (the caller's
    // responsibility) — lets N index flavors over one corpus tokenize it
    // once instead of once per flavor
    val tokenized = stagedPostings.getOrElse {
      postings(spark.read.format("lance")
        .option("versionAsOf", builtV).load(sourcePath), idCol, textCol)
    }
    // locked interior — the public wrapper's lock is NOT reentrant
    buildIndexFromPostingsLocked(spark, tokenized, indexPath, writePartitions)
    // publish: built.lance records the exact sidecar versions this build
    // produced — all readers pin on them (see [[Pins]])
    val pins = Pins(headVersion(conf, s"$indexPath/postings.lance"),
                    headVersion(conf, s"$indexPath/terms.lance"),
                    headVersion(conf, s"$indexPath/stats.lance"))
    spark.createDataFrame(
        Seq((builtV, idCol, textCol, pins.postingsV, pins.termsV, pins.statsV)))
      .toDF("built_version", "id_col", "text_col",
            "postings_version", "terms_version", "stats_version")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/built.lance")
    putPins(indexPath, builtHeadVersion(spark, indexPath), Some(pins))
    // fresh 1-row read, not the cache: the pre-publish entry could be
    // missing (transient statsHeadKey failure) or stale, and readStats
    // through the tombstoned pins resolves to the just-written head
    val (nDocs, totalLen) = readStats(spark, indexPath)
    statsCache.put(indexPath, (Some(pins), (nDocs, totalLen)))
    graft.plans.GraftFts.register(sourcePath, graft.plans.GraftFts.IndexInfo(
      indexPath, idCol, textCol, nDocs, totalLen, builtV))
    builtV
    } // withLock
  }

  /** Incrementally fold the post-build append tail into the persisted
    * index — the crate's `optimize_indices` analogue (tantivy adds a
    * segment; it does not re-tokenize old ones). Cost is O(tail), never
    * O(corpus):
    *
    *  - tail postings (a `fromVersion` CDC scan of only the new
    *    fragments) APPEND to `postings.lance` as new range-sorted
    *    fragments — old fragments are untouched, and term IN-list
    *    pruning keeps working per fragment;
    *  - the vocabulary merges tail dfs into `terms.lance` (vocabulary-
    *    sized rewrite — the one small non-incremental piece, same as a
    *    tantivy segment-metadata merge);
    *  - corpus stats advance by the tail's exact delta (no rescan).
    *
    * Appended doc_ids are NEW documents, so `df_new = df_old + df_tail`
    * and the merged statistics equal a from-scratch rebuild's EXACTLY —
    * [[searchPersisted]] after an update is bit-identical to a fresh
    * [[buildIndexLance]] at the head version (pinned by FtsSpec's
    * differential test). Returns the new covered version.
    */
  def updateIndex(spark: SparkSession, sourcePath: String, indexPath: String,
                  writePartitions: Int = 4): Long =
    graft.sources.lance.MaintenanceLock.withLockFenced(indexPath,
        spark.sessionState.newHadoopConf()) { fence =>
      updateIndexLocked(spark, sourcePath, indexPath, writePartitions, fence)
    }

  /** The update body; callers hold the maintenance lock — a racing twin
    * would double-merge the tail dfs into the vocabulary (silent BM25
    * corruption), which the lock turns into a loud refusal.
    *
    * Atomicity: the only PUBLISH is the final `built.lance` overwrite —
    * every sidecar commit before it lands at a version no reader is
    * pinned to ([[sidecar]]), so a fence abort (clock-skew usurper,
    * swept holder) or a crash ANYWHERE in the sequence leaves the
    * published index bit-identical to before the update. The next
    * updater first sweeps a predecessor's orphan postings tail
    * (restore to the pinned version — appends build on the head, unlike
    * the overwrite-mode sidecars whose pinned INPUTS make orphan
    * overwrites simply dead versions), then recomputes the same
    * builtV..headV tail against the pinned inputs: exactly-once
    * semantics without double-appended postings or double-merged dfs. */
  private def updateIndexLocked(spark: SparkSession, sourcePath: String,
                                indexPath: String, writePartitions: Int,
                                fence: graft.sources.lance.MaintenanceLock.Fence): Long = {
    import graft.sources.lance.LanceFormat
    val b = spark.read.format("lance").load(s"$indexPath/built.lance").head()
    requirePublished(b, indexPath)
    val (builtV, idCol, textCol) = (b.getLong(0), b.getString(1), b.getString(2))
    val pins = pinsFromRow(b)
    // refresh the JVM cache from the row JUST read under the lock: the
    // terms/stats merges below go through sidecar() -> pinsOf(), and a
    // stale cached entry (another process updated the index since this
    // JVM last read it) would merge the tail into an OLD terms version —
    // silent df corruption. The head can't move while we hold the lock.
    putPins(indexPath, builtHeadVersion(spark, indexPath), pins)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, sp) = LanceFormat.fileSystem(sourcePath, conf)
    val headV = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, sp, None)).version
    if (headV == builtV) return builtV
    // sweep an orphan postings tail left by a fence-aborted predecessor:
    // published readers never saw it (they pin), but our append would
    // otherwise stack on top of it and duplicate its rows
    pins.foreach { p =>
      if (headVersion(conf, s"$indexPath/postings.lance") != p.postingsV) {
        fence.check()
        graft.sources.lance.LanceMaintenance.restore(
          spark, s"$indexPath/postings.lance", p.postingsV)
      }
    }
    val tail = spark.read.format("lance")
      .option("fromVersion", builtV).option("versionAsOf", headV)
      .load(sourcePath)
    val tp = postings(tail, idCol, textCol)
    fence.check() // pre-commit fence: abort BEFORE publishing anything
    tp.repartitionByRange(writePartitions, col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.format("lance").mode("append").save(s"$indexPath/postings.lance")
    val postingsV2 = headVersion(conf, s"$indexPath/postings.lance")
    // terms.lance is both input and output; safe because lance is
    // versioned — the scan pins the PUBLISHED version (an orphan
    // overwrite from an aborted predecessor is skipped, not re-merged),
    // data files are immutable, and the overwrite commits a NEW version
    val mergedTerms = sidecar(spark, indexPath, "terms")
      .unionByName(tp.groupBy("term").agg(count(lit(1)).as("df")))
      .groupBy("term").agg(sum(col("df")).as("df"))
      .repartitionByRange(math.max(writePartitions / 4, 1), col("term"))
      .sortWithinPartitions("term")
    fence.check()
    mergedTerms
      .write.format("lance").mode("overwrite").save(s"$indexPath/terms.lance")
    val termsV2 = headVersion(conf, s"$indexPath/terms.lance")
    val ts = corpusStats(tail, idCol, textCol).head()
    // fresh read through the pins refreshed above — a stale cached stats
    // entry would double- or under-count another process's merged tail
    val (oldN, oldLen) = readStats(spark, indexPath)
    val (newN, newLen) = (oldN + ts.getLong(0), oldLen + ts.getLong(1))
    fence.check()
    spark.createDataFrame(Seq((newN, newLen))).toDF("n_docs", "total_len")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/stats.lance")
    val statsV2 = headVersion(conf, s"$indexPath/stats.lance")
    // built.lance is the PUBLISH point — nothing above is visible to any
    // reader until this commit, so this fence is the one that decides
    // which of two racing maintainers "commits"
    fence.check()
    spark.createDataFrame(Seq((headV, idCol, textCol, postingsV2, termsV2, statsV2)))
      .toDF("built_version", "id_col", "text_col",
            "postings_version", "terms_version", "stats_version")
      .coalesce(1).write.format("lance").mode("overwrite")
      .save(s"$indexPath/built.lance")
    val newPins = Some(Pins(postingsV2, termsV2, statsV2))
    putPins(indexPath, builtHeadVersion(spark, indexPath), newPins)
    statsCache.put(indexPath, (newPins, (newN, newLen)))
    graft.plans.GraftFts.register(sourcePath, graft.plans.GraftFts.IndexInfo(
      indexPath, idCol, textCol, newN, newLen, headV))
    headV
  }

  /** Re-attach a persisted index in a fresh session: corpus stats and
    * column names reload from the sidecars, and the rewrite registry is
    * repopulated — the FTS twin of re-registering an IVF index from its
    * centroid sidecar. */
  def attachIndex(spark: SparkSession, sourcePath: String,
                  indexPath: String): Unit = {
    val b = spark.read.format("lance").load(s"$indexPath/built.lance").head()
    requirePublished(b, indexPath)
    // re-attach = drop cached state and re-read the publish point —
    // including the failure-fallback roster: serving pre-attach pins
    // after an explicit re-attach could pin vacuumed sidecar versions
    pinsCache.remove(indexPath)
    statsCache.remove(indexPath)
    fallbackPins.remove(indexPath)
    val (nDocs, totalLen) = statsOf(spark, indexPath)
    graft.plans.GraftFts.register(sourcePath, graft.plans.GraftFts.IndexInfo(
      indexPath, b.getString(1), b.getString(2), nDocs, totalLen, b.getLong(0)))
  }

  /** Search covering rows appended to `sourcePath` after the index build:
    * the index probe unions with postings computed on the fly from ONLY
    * the post-build fragments (a `fromVersion` CDC scan — a sliver until
    * the next rebuild). Scores use the BUILD-ERA corpus statistics
    * (df/N/avgdl), the standard stale-FTS contract (tantivy segments
    * behave the same until a merge): rankings stay internally consistent,
    * drift is bounded by the tail's relative size, and a rebuild
    * refreshes. Tail-only terms (df = 0 in the vocabulary) are scored
    * with the maximal idf `ln(1 + (N + 0.5) / 0.5)`, matching the
    * formula's df -> 0 limit.
    */
  def searchCombined(spark: SparkSession, indexPath: String,
                     sourcePath: String, idCol: String, textCol: String,
                     terms: Seq[String], k: Int): DataFrame = {
    val br = spark.read.format("lance").load(s"$indexPath/built.lance").head()
    requirePublished(br, indexPath)
    val builtV = br.getLong(0)
    val (nDocs, totalLen) = statsOf(spark, indexPath)
    val idxPost = sidecar(spark, indexPath, "postings")
    val tailPost = postings(
      spark.read.format("lance").option("fromVersion", builtV).load(sourcePath),
      idCol, textCol)
    val termDf = sidecar(spark, indexPath, "terms")
    bm25TopK(idxPost.unionByName(tailPost), termDf, nDocs, totalLen, terms, k)
  }

  /** The full between-rebuilds search contract ([[searchCombined]] +
    * [[searchPersistedLive]] composed — the ANN
    * [[graft.operators.Similarity.ivfSearchCombinedLive]] twin): appended
    * docs rank via on-the-fly tail postings, and docs deleted from the
    * source since the build (indexed OR appended) drop from the final
    * ranked set through the same runtime-filter liveness join — the
    * realized over-fetch candidate ids reach the source scan as an
    * IN-list zone filter, O(k) point reads, no driver collect. Scores
    * keep build-era statistics (the stale-FTS contract).
    *
    * Documented limit: a doc DELETED and RE-APPENDED under the same id
    * scores as the union of its indexed and tail postings (tf merges —
    * [[searchCombined]]'s append contract cannot tell which indexed
    * rows the deletion masked, since postings key on doc_id, not row
    * address). A rebuild restores exact scoring; tantivy's
    * segment-level scoring has the analogous between-merge drift. */
  def searchCombinedLive(spark: SparkSession, indexPath: String,
                         sourcePath: String, idCol: String, textCol: String,
                         terms: Seq[String], k: Int): DataFrame = {
    val over = math.max(4 * k, k + 64)
    val candsDf = searchCombined(spark, indexPath, sourcePath, idCol,
      textCol, terms, over)
    liveTopK(spark, sourcePath, idCol, candsDf, k)
  }

  /** Phrase match (tantivy phrase-query analogue, positions recomputed
    * rather than index-stored): documents whose token stream contains
    * `phrase` as consecutive tokens. Position lists come from one
    * `posexplode`; each adjacent pair is verified with a self-join on
    * `(doc, pos+1)` — at scale both sides are term-filtered slivers of the
    * corpus, and the join key `(doc_id, pos)` is near-unique so the shuffle
    * is skinny and skew-free.
    */
  def phraseMatch(docs: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseMatch needs at least one token")
    val toks = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
              posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    phraseFrom(toks, phrase)
  }

  /** Boolean query over the persisted index (tantivy BooleanQuery parity:
    * must / should / must_not): scoring sums BM25 contributions of the
    * `must` and `should` terms; `must` terms gate candidacy (a doc must
    * post ALL of them), `mustNot` terms exclude. Every clause is answered
    * from term-pruned posting slivers — candidacy is a semi-join on the
    * skinny `(doc_id)` key, exclusion an anti-join; the corpus is never
    * scanned.
    */
  def searchBoolean(spark: SparkSession, indexPath: String,
                    must: Seq[String], should: Seq[String],
                    mustNot: Seq[String], k: Int): DataFrame = {
    require(must.nonEmpty || should.nonEmpty,
      "searchBoolean needs at least one scoring (must/should) term")
    val (nDocs, totalLen) = statsOf(spark, indexPath)
    val avgdl = totalLen.toDouble / nDocs
    val scoring = (must ++ should).distinct
    val allTerms = (scoring ++ mustNot).distinct
    val p  = sidecar(spark, indexPath, "postings")
    val df = sidecar(spark, indexPath, "terms")
    // ONE postings scan (the full clause IN-list still prunes by term zone
    // maps) and ONE per-doc aggregate answer all three clause kinds:
    // postings are unique per (doc, term), so must-coverage is a plain
    // conditional count — no countDistinct, no semi/anti joins (the r7
    // shape re-read the postings once per clause)
    val isScoring = col("term").isin(scoring: _*)
    val isMust    = col("term").isin(must.distinct: _*)
    val isBad     = col("term").isin(mustNot.distinct: _*)
    p.filter(col("term").isin(allTerms: _*))
      .join(broadcast(df.filter(col("term").isin(scoring: _*))),
            Seq("term"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy("doc_id")
      .agg(
        round(sum(when(isScoring, contribMicro(nDocs, avgdl)).otherwise(0L))
          / lit(1e6), 6).as("score"),
        sum(when(isMust, 1).otherwise(0)).as("_nm"),
        max(when(isBad, 1).otherwise(0)).as("_bad"))
      .filter(col("_nm") === must.distinct.size && col("_bad") === 0)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Phrase search over the PERSISTED index (tantivy phrase-query parity):
    * the stored position lists replace re-tokenization entirely — the
    * postings scan reads only the phrase terms' fragments (term IN-list →
    * zone maps) plus their `positions` column, and the adjacency joins run
    * over those slivers. At 100 TB the cost is the phrase terms' posting
    * lists, never the corpus.
    */
  def phrasePersisted(spark: SparkSession, indexPath: String,
                      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrasePersisted needs at least one token")
    val distinctTerms = phrase.distinct
    // ONE term-pruned postings scan, ONE per-doc aggregate, adjacency as
    // a codegen'd EXISTS over the STORED position arrays (`exists(p_0,
    // a -> a+i ∈ p_i ∀i)`) — no position explode, no per-pair self-join
    // shuffle, no final distinct. At 100 TB the cost is the phrase
    // terms' posting slivers and one skinny doc_id shuffle.
    // Column names are by distinct-term INDEX (hashCode collides:
    // "Aa"/"BB" share a hash — a collision would alias two terms'
    // position arrays to one ambiguous column).
    val termCol: Map[String, String] =
      distinctTerms.zipWithIndex.map { case (t, i) => t -> s"_p_$i" }.toMap
    val pcols = distinctTerms.map(t =>
      first(when(col("term") === t, col("positions")), ignoreNulls = true)
        .as(termCol(t)))
    val agged = sidecar(spark, indexPath, "postings")
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy("doc_id")
      .agg(pcols.head, pcols.tail: _*)
    val allPresent = distinctTerms.map(t => col(termCol(t)).isNotNull)
      .reduce(_ && _)
    val adjacency =
      if (phrase.size == 1) lit(true)
      else exists(col(termCol(phrase.head)), a =>
        phrase.zipWithIndex.drop(1).map { case (t, i) =>
          array_contains(col(termCol(t)), a + i)
        }.reduce(_ && _))
    agged.filter(allPresent && adjacency).select("doc_id")
  }

  /** Adjacency verification shared by the raw and persisted phrase paths:
    * each phrase token i must occur at `pos(first) + i` — a self-join per
    * adjacent pair on the near-unique skinny key `(doc_id, pos)`.
    */
  private def phraseFrom(toks: DataFrame, phrase: Seq[String]): DataFrame = {
    val first = toks.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.toSeq.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      val next = toks.filter(col("term") === t)
        .select(col("doc_id").as("d2"), (col("pos") - i).as("p2"))
      acc.join(next, col("doc_id") === col("d2") && col("pos") === col("p2"))
        .select(col("doc_id"), col("pos"))
    }.select("doc_id").distinct()
  }
}
