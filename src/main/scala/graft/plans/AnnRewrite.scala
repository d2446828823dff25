package graft.plans

import graft.functions.FloatCosine
import graft.sources.lance.LanceTable
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Registry of persisted ANN indexes: lance dataset path of the indexed
  * vectors → (IVF centroids, probe width). Filled by
  * [[graft.operators.Similarity.ivfBuildPersist]] / `ivfSearchPersisted`;
  * consulted by [[AnnTopKRewrite]].
  */
object GraftAnn {
  final case class IndexInfo(centroids: Array[Array[Double]], nProbe: Int)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, IndexInfo]
  def register(vectorsPath: String, centroids: Array[Array[Double]], nProbe: Int): Unit =
    registry.put(vectorsPath, IndexInfo(centroids, nProbe))
  /** Enable the rewrite for a path WITHOUT mutating an existing
    * registration — the imperative probe path uses this so a
    * `ivfSearchPersisted(.., nProbe = 12)` call cannot silently widen
    * (or narrow) the probe width later SQL queries over the same index
    * rewrite to. The declarative width is a property of the registered
    * index: set at build/explicit-register time, order-independent. */
  def registerIfAbsent(vectorsPath: String, centroids: Array[Array[Double]],
                       nProbe: Int): Unit =
    registry.putIfAbsent(vectorsPath, IndexInfo(centroids, nProbe))
  def lookup(vectorsPath: String): Option[IndexInfo] = Option(registry.get(vectorsPath))
  def clear(): Unit = registry.clear()
}

/** SURVEY §4.2's ANN planner fusion, as a Catalyst optimizer rule (runs in
  * the operator-optimization batch, BEFORE DSv2 scan pushdown — the
  * injected `list_id IN (probes)` filter therefore reaches the lance scan
  * as a zone filter and prunes index fragments at the manifest level).
  *
  * Rewrites the canonical vector-search shape over a REGISTERED index
  * relation
  *
  *   SELECT id, graft_cosine(vec, <literal query>) AS cos
  *   FROM lance.`…/vectors.lance` ORDER BY cos DESC LIMIT k
  *
  * into the same plan over `WHERE list_id IN (<nProbe nearest lists>)` —
  * the probe lists picked driver-side from the cached centroids, exactly
  * what `ivfCosineTopK` does imperatively. Plans that don't match (no
  * registered index, non-literal query, ascending order, missing
  * `list_id`) are left untouched, so the rewrite is purely an
  * optimization: results equal the un-rewritten plan up to ANN recall.
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case lim @ GlobalLimit(_, ll @ LocalLimit(_, body)) =>
      // column pruning may slip a Project between the limit and the sort
      // (e.g. the user selects the id column off the top-k frame)
      val rewritten = body match {
        case s: Sort => rewriteSort(s).map(ns => ns: LogicalPlan)
        case p @ Project(_, s: Sort) => rewriteSort(s).map(ns => p.copy(child = ns))
        case _ => None
      }
      rewritten match {
        case Some(nb) => lim.copy(child = ll.copy(child = nb))
        case None => lim
      }
  }

  /** Global descending-cosine sort directly over Project(relation) → same
    * sort with the probe filter injected below the projection. The
    * filtered variant (lance's PREFILTER: `WHERE … ORDER BY cos DESC
    * LIMIT k` ranks only rows passing the predicate) keeps the user
    * filter and nests the probe filter beneath it; the `list_id` guard
    * keeps the rule from re-matching its own output in the fixed-point
    * batch. */
  private def rewriteSort(s: Sort): Option[Sort] = s match {
    // leading sort key decides the ranking; tie-breakers may follow
    case Sort(SortOrder(sortExpr, Descending, _, _) +: _, true,
              p @ Project(projList, rel: DataSourceV2Relation), _) =>
      rewrite(sortExpr, projList, rel).map(f => s.copy(child = p.copy(child = f)))
    case Sort(SortOrder(sortExpr, Descending, _, _) +: _, true,
              p @ Project(projList, f @ Filter(cond, rel: DataSourceV2Relation)), _)
        if !cond.references.exists(_.name == "list_id") =>
      rewrite(sortExpr, projList, rel)
        .map(pf => s.copy(child = p.copy(child = f.copy(child = pf))))
    case _ => None
  }

  /** The sort expression, resolved through the projection's aliases, must
    * be graft_cosine(<vector attr of rel>, <array<float> literal>). */
  private def resolveSort(sortExpr: Expression,
                          projList: Seq[NamedExpression]): Option[FloatCosine] = {
    val resolved = sortExpr match {
      case a: AttributeReference =>
        projList.collectFirst { case al: Alias if al.exprId == a.exprId => al.child }
      case e => Some(e)
    }
    resolved.collect {
      case fc @ FloatCosine(_: AttributeReference,
                            Literal(_, ArrayType(FloatType, _))) => fc
    }
  }

  private def rewrite(sortExpr: Expression, projList: Seq[NamedExpression],
                      rel: DataSourceV2Relation): Option[LogicalPlan] =
    for {
      table <- Some(rel.table).collect { case t: LanceTable => t }
      info <- GraftAnn.lookup(table.path)
      listAttr <- rel.output.find(_.name == "list_id")
      cos <- resolveSort(sortExpr, projList)
      query = cos.right.asInstanceOf[Literal].value
        .asInstanceOf[ArrayData].toFloatArray()
    } yield {
      def dist2(c: Array[Double]): Double = {
        var acc = 0.0
        var i = 0
        while (i < math.min(c.length, query.length)) {
          val d = c(i) - query(i); acc += d * d; i += 1
        }
        acc
      }
      val probes = info.centroids.zipWithIndex
        .sortBy(ci => dist2(ci._1)).take(info.nProbe).map(_._2)
      Filter(In(listAttr, probes.toIndexedSeq.map(i => Literal(i))), rel)
    }
}
