package graft.plans

import graft.functions.Bm25Score
import graft.sources.lance.LanceTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Registry of persisted FTS indexes: lance dataset path of the indexed
  * documents → index location + the corpus statistics the rewrite needs
  * driver-side (cached at registration so planning never runs a job —
  * the GraftAnn-centroids pattern). Filled by
  * [[graft.operators.Fts.buildIndexLance]] / `Fts.attachIndex`.
  */
object GraftFts {
  final case class IndexInfo(indexPath: String, idCol: String, textCol: String,
                             nDocs: Long, totalLen: Long, builtVersion: Long)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, IndexInfo]
  def register(docsPath: String, info: IndexInfo): Unit =
    registry.put(docsPath, info)
  def lookup(docsPath: String): Option[IndexInfo] = Option(registry.get(docsPath))
  def clear(): Unit = registry.clear()
}

/** The FTS scan-substitution rule — one step beyond [[AnnTopKRewrite]]'s
  * filter injection: the matched subtree is REPLACED by a probe of the
  * persisted inverted index (postings + vocabulary + cached stats), so the
  * corpus text is never re-tokenized and the postings scan reads only the
  * probed terms' fragments (term IN-list → string zone maps).
  *
  * Matches the canonical ranking shape over a REGISTERED documents dataset:
  *
  * {{{
  *   GlobalLimit k
  *     LocalLimit k
  *       Sort [s DESC (, <id> ASC)?] global
  *         Project [<id>, graft_bm25(<text>, 'w1 w2') AS s]
  *           lance relation of <docsPath>
  * }}}
  *
  * and substitutes the analyzed plan of `Fts.searchWithStats(...)` (ids +
  * fixed-point BM25 scores, already sorted/limited), re-aliased to the
  * original output attribute ids. Both rankings order by (score DESC, id) —
  * the index is an exact structure, so up to staleness (appends/deletes
  * after the build — the imperative `searchCombined`/`searchPersistedLive`
  * faces) the rewrite returns exactly what the index-free formulation
  * would. Plans that don't match are left untouched and fail loudly at
  * [[graft.functions.Bm25Score.eval]] instead of mis-ranking.
  *
  * Runs in the operator-optimization batch (fixed point): the substituted
  * plan is itself optimized by the remaining iterations, and the term
  * IN-list still reaches DSv2 pushdown afterwards.
  */
case class FtsTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case lim @ GlobalLimit(IntegerLiteral(k), LocalLimit(_, s: Sort)) =>
      rewriteSort(s, k).getOrElse(lim)
    // column pruning may interpose a narrowing Project between the limit
    // and the sort (e.g. under COUNT(*) nothing above needs the ranked
    // columns); rewrite the sort subtree and keep the pruning on top
    case lim @ GlobalLimit(IntegerLiteral(k),
                           LocalLimit(_, p @ Project(_, s: Sort)))
        if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      rewriteSort(s, k).map(r => p.copy(child = r)).getOrElse(lim)
  }

  private def rewriteSort(s: Sort, k: Int): Option[LogicalPlan] = s match {
    case Sort(SortOrder(sortExpr, Descending, _, _) +: rest, true,
              Project(projList, rel: DataSourceV2Relation), _) =>
      for {
        table <- Some(rel.table).collect { case t: LanceTable => t }
        info <- GraftFts.lookup(table.path)
        idAttr <- rel.output.find(_.name == info.idCol)
        // tie-breakers beyond the score must be the id column, ascending
        if rest.forall {
          case SortOrder(a: AttributeReference, Ascending, _, _) =>
            a.name == info.idCol
          case _ => false
        }
        bm <- resolveThroughAliases(sortExpr, projList)
        terms <- queryTerms(bm, info)
        // output must be exactly (id, score) — a wider projection would
        // need the corpus row, which the index does not store
        if projList.length == 2 && projList.exists {
          case a: AttributeReference => a.exprId == idAttr.exprId
          case _ => false
        }
      } yield substitute(projList, idAttr, info, terms, k)
    case _ => None
  }

  /** The sort key, resolved through the projection's aliases, must be the
    * `graft_bm25(<text attr>, <literal>)` marker over the relation's
    * registered text column. */
  private def resolveThroughAliases(
      sortExpr: Expression, projList: Seq[NamedExpression]): Option[Bm25Score] = {
    val resolved = sortExpr match {
      case a: AttributeReference =>
        projList.collectFirst { case al: Alias if al.exprId == a.exprId => al.child }
      case e => Some(e)
    }
    resolved.collect { case b: Bm25Score => b }
  }

  private def queryTerms(bm: Bm25Score, info: GraftFts.IndexInfo): Option[Seq[String]] =
    bm match {
      case Bm25Score(t: AttributeReference, Literal(q: UTF8String, StringType))
          if t.name == info.textCol =>
        val terms = q.toString.split(" ").toSeq.filter(_.nonEmpty)
        if (terms.nonEmpty) Some(terms) else None
      case _ => None
    }

  /** Build the index-probe plan and re-alias its two output columns to the
    * original projection's attribute ids, so parents keep resolving. */
  private def substitute(projList: Seq[NamedExpression], idAttr: Attribute,
                         info: GraftFts.IndexInfo, terms: Seq[String],
                         k: Int): LogicalPlan = {
    val probe = graft.operators.Fts.searchWithStats(
      spark, info.indexPath, info.nDocs, info.totalLen, terms, k)
    val inner = probe.queryExecution.analyzed
    val Seq(newId, newScore) = inner.output
    val out = projList.map {
      case a: AttributeReference =>
        Alias(Cast(newId, a.dataType), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(Cast(newScore, al.dataType), al.name)(exprId = al.exprId)
    }
    Project(out, inner)
  }
}
