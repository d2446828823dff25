package graft.plans

import graft.sources.lance.LanceDataSource
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Session extensions (SURVEY §2.6/§4.2): the Spark-native equivalent of
  * the reference's replacement scan (R5, `cpp/lance_replacement.cpp:11-34`,
  * which rewrites `FROM 'x.lance'` into `lance_scan('x.lance')` at bind
  * time). Here an analyzer rule resolves
  *   - `FROM lance.`/path/ds.lance``  (2-part identifier), and
  *   - `FROM `/path/ds.lance``        (any identifier ending ".lance")
  * into the Lance DSv2 relation.
  *
  * Register with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => ResolveLancePath)
    // ANN top-k fusion over persisted IVF indexes (SURVEY §4.2): runs in
    // the operator-optimization batch so its injected list_id filter still
    // reaches DSv2 scan pushdown
    e.injectOptimizerRule(_ => AnnTopKRewrite)
    // FTS scan substitution over persisted BM25 indexes: replaces the
    // canonical graft_bm25 ranking shape with a postings/vocabulary probe
    e.injectOptimizerRule(session => FtsTopKRewrite(session))
    // SQL-standard grand-total row for ROLLUP/CUBE over empty input
    // (fuzzer-found Spark-vs-DuckDB divergence; see the rule's scaladoc).
    // Post-hoc resolution, NOT optimizer: ConvertToLocalRelation folds a
    // statically-empty input away before optimizer rules would see the
    // Aggregate/Expand shape.
    e.injectPostHocResolutionRule(_ => StandardEmptyGroupingSets)
    // SQL names for the codegen kernels (usable from spark.sql)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    import graft.functions._
    def info(name: String) = new ExpressionInfo("graft", name)
    // a required literal-int argument: a non-foldable expression (column
    // reference) or a non-integral literal fails ANALYSIS with an error
    // naming the function — not an obscure eval-time NPE or a silent
    // Number.intValue truncation of a fractional literal
    def literalIntArg(fn: String, arg: String,
                      ex: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
      def fail(why: String): Nothing =
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" -> s"$fn: argument '$arg' must be $why"))
      if (!ex.foldable) fail("a literal integer, not a non-foldable expression")
      ex.eval(null) match {
        case null     => fail("a literal integer, not NULL")
        case i: Int   => i
        case l: Long if l.isValidInt => l.toInt
        case s: Short => s.toInt
        case b: Byte  => b.toInt
        case other    => fail(s"an integral literal (got '$other': ${ex.dataType.simpleString})")
      }
    }
    e.injectFunction((FunctionIdentifier("graft_cosine"), info("graft_cosine"),
      exprs => FloatCosine(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_long_dot"), info("graft_long_dot"),
      exprs => LongDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_minhash_est"), info("graft_minhash_est"),
      exprs => LongEqCount(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_intersect_count"), info("graft_intersect_count"),
      exprs => SortedLongIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_hyperplane_bucket"), info("graft_hyperplane_bucket"),
      exprs => HyperplaneBucket(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_stopword_hits"), info("graft_stopword_hits"),
      exprs => StopwordHits(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_bigram_shingles"), info("graft_bigram_shingles"),
      exprs => BigramShingleSummary(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_word_gram_stats"), info("graft_word_gram_stats"),
      exprs => WordGramStats(exprs(0),
        literalIntArg("graft_word_gram_stats", "n", exprs(1)))))
    e.injectFunction((FunctionIdentifier("graft_rolling_doc_hash"), info("graft_rolling_doc_hash"),
      exprs => RollingDocHash(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_pq_encode"), info("graft_pq_encode"),
      exprs => PqEncode(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_pq_adc"), info("graft_pq_adc"),
      exprs => PqAdcScore(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_nearest_centroid"), info("graft_nearest_centroid"),
      exprs => NearestCentroid(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_bm25"), info("graft_bm25"),
      exprs => Bm25Score(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"), info("graft_minhash_sig"),
      exprs => MinHashSig(exprs(0),
        literalIntArg("graft_minhash_sig", "p", exprs(1)))))
    e.injectFunction((FunctionIdentifier("graft_bigram_buckets"), info("graft_bigram_buckets"),
      exprs => BigramBucketCounts(exprs(0))))
  }
}

object ResolveLancePath extends Rule[LogicalPlan] {

  private def relationFor(path: String): LogicalPlan = {
    val provider = new LanceDataSource
    val options = new CaseInsensitiveStringMap(Map("path" -> path).asJava)
    val schema = provider.inferSchema(options)
    val table = provider.getTable(schema, Array.empty, options.asCaseSensitiveMap())
    DataSourceV2Relation.create(table, None, None, options)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
           u.multipartIdentifier.head.equalsIgnoreCase("lance") =>
      relationFor(u.multipartIdentifier(1))
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 1 &&
           u.multipartIdentifier.head.endsWith(".lance") =>
      relationFor(u.multipartIdentifier.head)
  }
}
