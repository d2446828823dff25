package graft.queries

import graft.Tables
import graft.operators.Fts
import org.apache.spark.sql.functions._

/** Full-text search queries (SURVEY §2 FTS parity — the reference's
  * tantivy-backed lance FTS index, re-expressed Spark-first; see
  * [[graft.operators.Fts]]).
  *
  * Scores are DuckDB-oracled end-to-end: the BM25 fixed-point contract
  * makes even the persisted-index path hash-comparable (an inverted index
  * is an EXACT structure — unlike IVF there is no approximation, so the
  * oracle recomputes the same ranking from the raw table).
  */
object Search {

  private lazy val workDir =
    QDef.tempWorkDir("graft-fts-q")

  /** ONE corpus tokenization per source dir (round 12): the [[Fts.postings]]
    * frame is staged to parquet once, and every index flavor over the same
    * corpus (plain fts / sql-rewrite lance twin / live twin) derives its
    * sidecars from the staged copy — three builds, one tokenize. At corpus
    * scale this is the standard pipeline shape: the tokenized dataset is a
    * first-class staged artifact, index flavors are cheap derivations. */
  private val stagedPostings =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private def ensurePostings(s: org.apache.spark.sql.SparkSession,
                             dir: String): String =
    stagedPostings.computeIfAbsent(dir, _ => {
      val t = Tables.register(s, dir)
      val path = s"$workDir/postings-${dir.replaceAll("[^A-Za-z0-9.]", "_")}.parquet"
      Fts.postings(t("documents"), "doc_id", "text")
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Build-once per session (the e06 memoization pattern): a solo run of
    * any index query still builds; a full Verify run builds once.
    */
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]
  private def ensureIndex(s: org.apache.spark.sql.SparkSession,
                          dir: String): String =
    built.computeIfAbsent(dir, _ => {
      // one index per source dir — a shared path would let a second scale
      // factor in the same JVM overwrite the first one's postings
      val ix = s"$workDir/fts-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      Fts.buildIndexFromPostings(s, s.read.parquet(ensurePostings(s, dir)), ix)
      ix
    })

  /** Lance round-trip of `documents` + persisted index + rewrite
    * registration, once per source dir (the ensureIndex pattern). */
  private val builtSql = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private def ensureSqlFts(s: org.apache.spark.sql.SparkSession,
                           dir: String): (String, String) =
    builtSql.computeIfAbsent(dir, _ => {
      val t = Tables.register(s, dir)
      val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = s"$workDir/docs-$key.lance"
      t("documents").select("doc_id", "text")
        .write.format("lance").mode("overwrite").save(docs)
      val ix = s"$workDir/ftsx-$key"
      // the lance copy is content-identical to the staged corpus at its
      // head version — reuse the staged tokenize instead of re-tokenizing
      Fts.buildIndexLance(s, docs, "doc_id", "text", ix,
        stagedPostings = Some(s.read.parquet(ensurePostings(s, dir))))
      (docs, ix)
    })

  /** A second lance copy for the delete-masking query: index built at the
    * full corpus, then docs with `doc_id % 7 = 0` deleted from the SOURCE
    * (the index keeps their postings — masking is query-time). */
  private val builtLive = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private def ensureLiveFts(s: org.apache.spark.sql.SparkSession,
                            dir: String): (String, String) =
    builtLive.computeIfAbsent(dir, _ => {
      val t = Tables.register(s, dir)
      val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = s"$workDir/livedocs-$key.lance"
      t("documents").select("doc_id", "text")
        .write.format("lance").mode("overwrite").save(docs)
      val ix = s"$workDir/liveix-$key"
      // built BEFORE the delete below, over the full corpus — exactly the
      // staged tokenize's content (the delete then masks at query time)
      Fts.buildIndexLance(s, docs, "doc_id", "text", ix,
        stagedPostings = Some(s.read.parquet(ensurePostings(s, dir))))
      graft.sources.lance.LanceMaintenance.deleteWhere(s, docs, "doc_id % 7 = 0")
      (docs, ix)
    })

  /** Fixture for the full between-rebuilds contract (f06b): an index
    * STALE in both directions — built over `doc_id % 13 <> 0` only (so
    * the %13 slice is the post-build append tail), then `doc_id % 7 = 0`
    * deleted from the live source AFTER the append (hitting indexed and
    * tail docs alike). The tail and indexed doc sets are disjoint, so the
    * documented tf-merge drift for delete-then-re-append never arises —
    * the query is exactly oracle-able. */
  private val builtComb = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private def ensureCombinedFts(s: org.apache.spark.sql.SparkSession,
                                dir: String): (String, String) =
    builtComb.computeIfAbsent(dir, _ => {
      val t = Tables.register(s, dir)
      val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = s"$workDir/combdocs-$key.lance"
      t("documents").select("doc_id", "text")
        .filter(col("doc_id") % 13 =!= 0)
        .write.format("lance").mode("overwrite").save(docs)
      val ix = s"$workDir/combix-$key"
      // the staged corpus tokenize restricted to the indexed slice IS the
      // postings of the lance copy at its build version
      Fts.buildIndexLance(s, docs, "doc_id", "text", ix,
        stagedPostings = Some(s.read.parquet(ensurePostings(s, dir))
          .filter(col("doc_id") % 13 =!= 0)))
      t("documents").select("doc_id", "text")
        .filter(col("doc_id") % 13 === 0)
        .write.format("lance").mode("append").save(docs)
      graft.sources.lance.LanceMaintenance.deleteWhere(s, docs, "doc_id % 7 = 0")
      (docs, ix)
    })

  /** The shared oracle text for a BM25 ranking over `documents` — the
    * DuckDB spelling of [[Fts.bm25TopK]]'s math, CTE by CTE. `terms` must
    * be plain words (quoted into an IN-list). `liveWhere` restricts the
    * FINAL ranked set only (corpus statistics stay build-era) — the
    * delete-masking contract of [[Fts.searchPersistedLive]].
    */
  private def bm25OracleSql(terms: Seq[String], k: Int,
                            liveWhere: String = "TRUE",
                            termPred: String = null): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pred = Option(termPred).getOrElse(s"tf.term IN ($inList)")
    s"""
      WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dfv AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
             FROM documents),
      scored AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                 ROUND(LN(1.0 + (CAST(st.n_docs AS DOUBLE) - dfv.df + 0.5) / (dfv.df + 0.5)), 8)
                 * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                     / (CAST(st.total_len AS DOUBLE) / st.n_docs))))
                 * 1e6 + 0.5) AS BIGINT) AS micro
        FROM tf JOIN dfv USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        WHERE $pred)
      SELECT doc_id, ROUND(SUM(micro) / 1e6, 6) AS score
      FROM scored WHERE $liveWhere GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT $k"""
  }

  val defs: Seq[QDef] = Seq(

    // --- BM25 ranking, index-free (the scoring math itself) --------------
    QDef("f01_bm25_rank", (s, dir) => {
      val t = Tables.register(s, dir)
      Fts.bm25(t("documents"), "doc_id", "text",
               Seq("merge", "window", "batch"), 15)
    }, Some(bm25OracleSql(Seq("merge", "window", "batch"), 15))),

    // --- index build, verified through the vocabulary sidecar ------------
    // (terms.lance df values against a from-scratch DuckDB recount: a
    // wrong tf grouping, lost posting, or mis-sorted range write that
    // dropped rows breaks the hash)
    QDef("f02_fts_build", (s, dir) => {
      // unconditional rebuild — the e06_build/e08_build convention: every
      // invocation measures the index build from the staged postings (the
      // one-time corpus tokenize is the shared offline artifact ALL index
      // flavors derive from — the l21/l23 "layout is the offline cost"
      // shape), so a min-of-N bench row never reports a warm memoized
      // pass as the build cost. The rebuild also primes `built` for the
      // probe rows (f03/f08/f09), which keep the existence-gated ensure
      // for standalone runs.
      val ix = s"$workDir/fts-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      Fts.buildIndexFromPostings(s, s.read.parquet(ensurePostings(s, dir)), ix)
      built.put(dir, ix)
      s.read.format("lance").load(s"$ix/terms.lance")
        .orderBy(col("df").desc, col("term")).limit(12)
    }, Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      SELECT term, COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY term
      ORDER BY df DESC, term LIMIT 12""")),

    // --- BM25 over the PERSISTED index: term IN-list pushed into the
    // lance postings scan (term-range fragments pruned via zone maps),
    // broadcast vocabulary join, fixed-point score, fused top-k. Exact
    // structure -> the oracle recomputes the identical ranking raw. ------
    QDef("f03_fts_search", (s, dir) => {
      val ix = ensureIndex(s, dir)
      Fts.searchPersisted(s, ix, Seq("customer", "stream", "query"), 15)
    }, Some(bm25OracleSql(Seq("customer", "stream", "query"), 15))),

    // --- DECLARATIVE SQL face: the FtsTopKRewrite scan substitution ------
    // (documents round-tripped to lance, index built over it; the SQL
    // below never touches the corpus text at execution — the optimizer
    // replaces the subtree with the postings/vocabulary probe. The oracle
    // recomputes the identical exact ranking from the raw table.)
    QDef("f05_fts_sql_rewrite", (s, dir) => {
      val (docs, _) = ensureSqlFts(s, dir)
      s.sql(s"SELECT doc_id, graft_bm25(text, 'merge customer index') AS score " +
            s"FROM lance.`$docs` ORDER BY score DESC, doc_id LIMIT 15")
    }, Some(bm25OracleSql(Seq("merge", "customer", "index"), 15))),

    // --- delete-masked search (crate semantics: deletions on the source
    // mask index hits; scores keep build-era statistics). Docs divisible
    // by 7 are deleted AFTER the build; the oracle scores the full corpus
    // and excludes them from the final ranked set only. ------------------
    QDef("f06_fts_live", (s, dir) => {
      val (docs, ix) = ensureLiveFts(s, dir)
      Fts.searchPersistedLive(s, ix, docs, "doc_id",
                              Seq("stream", "partition", "vector"), 12)
    }, Some(bm25OracleSql(Seq("stream", "partition", "vector"), 12,
                          liveWhere = "doc_id % 7 <> 0"))),

    // --- the FULL between-rebuilds contract, composed: appended docs
    // rank via on-the-fly tail postings, deleted docs (indexed or
    // appended) drop via the runtime-filter liveness join, scores keep
    // BUILD-ERA statistics (df/N/avgdl over the indexed slice only;
    // tail-only terms score at the formula's df->0 limit). The oracle
    // recomputes exactly that: tf over ALL docs, df/stats over the
    // indexed slice (LEFT JOIN, COALESCE df->0), deletions excluded from
    // the final ranked set only. -----------------------------------------
    QDef("f06b_fts_combined_live", (s, dir) => {
      val (docs, ix) = ensureCombinedFts(s, dir)
      Fts.searchCombinedLive(s, ix, docs, "doc_id", "text",
                             Seq("merge", "stream", "filter"), 12)
    }, Some {
      val inList = Seq("merge", "stream", "filter").map(t => s"'$t'").mkString(", ")
      s"""
      WITH idx AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0),
      dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      toks_idx AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM idx),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dfv AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
             FROM idx),
      scored AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                 ROUND(LN(1.0 + (CAST(st.n_docs AS DOUBLE) - COALESCE(dfv.df, 0) + 0.5)
                                / (COALESCE(dfv.df, 0) + 0.5)), 8)
                 * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                     / (CAST(st.total_len AS DOUBLE) / st.n_docs))))
                 * 1e6 + 0.5) AS BIGINT) AS micro
        FROM tf LEFT JOIN dfv USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        WHERE tf.term IN ($inList))
      SELECT doc_id, ROUND(SUM(micro) / 1e6, 6) AS score
      FROM scored WHERE doc_id % 7 <> 0 GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 12"""
    }),

    // --- phrase query (consecutive-token match) ---------------------------
    // single-space tokenization makes the position-join semantics exactly
    // LIKE-expressible, so the oracle is an independent formulation
    QDef("f04_fts_phrase", (s, dir) => {
      val t = Tables.register(s, dir)
      Fts.phraseMatch(t("documents"), "doc_id", "text",
                      Seq("part", "filter"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id FROM documents
      WHERE ' ' || text || ' ' LIKE '% part filter %'
      ORDER BY doc_id""")),

    // --- boolean query (tantivy BooleanQuery: must / should / must_not) --
    // scoring over must+should posting slivers; must gates candidacy
    // (all-terms semi-join), mustNot excludes (anti-join). The oracle
    // recomputes the identical ranking and gates with EXISTS/NOT EXISTS.
    QDef("f08_fts_boolean", (s, dir) => {
      val ix = ensureIndex(s, dir)
      Fts.searchBoolean(s, ix,
        must = Seq("stream"), should = Seq("merge", "window"),
        mustNot = Seq("error"), k = 15)
    }, Some {
      val inList = Seq("stream", "merge", "window").map(t => s"'$t'").mkString(", ")
      s"""
      WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dfv AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
             FROM documents),
      scored AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                 ROUND(LN(1.0 + (CAST(st.n_docs AS DOUBLE) - dfv.df + 0.5) / (dfv.df + 0.5)), 8)
                 * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                     / (CAST(st.total_len AS DOUBLE) / st.n_docs))))
                 * 1e6 + 0.5) AS BIGINT) AS micro
        FROM tf JOIN dfv USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        WHERE tf.term IN ($inList)),
      agg AS (SELECT doc_id, ROUND(SUM(micro) / 1e6, 6) AS score
              FROM scored GROUP BY doc_id)
      SELECT doc_id, score FROM agg
      WHERE EXISTS (SELECT 1 FROM tf m WHERE m.doc_id = agg.doc_id
                    AND m.term = 'stream')
        AND NOT EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = agg.doc_id
                        AND x.term = 'error')
      ORDER BY score DESC, doc_id LIMIT 15"""
    }),

    // --- fuzzy term query (tantivy FuzzyTermQuery / lance FTS fuzziness):
    // misspelled query terms expand against the vocabulary sidecar by
    // Levenshtein distance <= 1, each matched index term scoring with its
    // own df. The oracle recomputes the expansion with DuckDB's own
    // levenshtein() over the derived vocabulary — engine-independent
    // semantics of standard edit distance, same df-ordered expansion cap.
    QDef("f09_fts_fuzzy", (s, dir) => {
      val ix = ensureIndex(s, dir)
      Fts.searchFuzzy(s, ix, Seq("merg", "vectr"), maxDist = 1, k = 15)
    }, Some(bm25OracleSql(Nil, 15, termPred = """tf.term IN (
          SELECT term FROM dfv
          WHERE levenshtein(term, 'merg') <= 1 OR levenshtein(term, 'vectr') <= 1
          ORDER BY df DESC, term LIMIT 50)"""))),

    // --- phrase query over the PERSISTED index (tantivy with_position
    // parity): the stored per-(doc,term) position lists answer adjacency
    // without touching the corpus text — the probe reads two terms'
    // posting slivers. Oracle: the independent LIKE formulation. ---------
    QDef("f07_fts_phrase_indexed", (s, dir) => {
      val (_, ix) = ensureSqlFts(s, dir)
      Fts.phrasePersisted(s, ix, Seq("merge", "window"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id FROM documents
      WHERE ' ' || text || ' ' LIKE '% merge window %'
      ORDER BY doc_id"""))
  )
}
