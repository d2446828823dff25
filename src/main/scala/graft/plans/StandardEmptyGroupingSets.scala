package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** SQL-standard semantics for the EMPTY grouping set over empty input.
  *
  * The standard (and DuckDB/PostgreSQL) computes each grouping set of a
  * ROLLUP/CUBE/GROUPING SETS independently; the empty set `()` is a
  * global aggregate, which on zero input rows still yields its one row
  * (COUNT 0, other aggregates at their empty-input defaults, all grouping
  * keys NULL, GROUPING() = 1). Spark plans grouping sets as one keyed
  * hash aggregate over an Expand — keyed aggregation over zero rows emits
  * nothing, so `GROUP BY ROLLUP(a, b)` over an empty relation returns 0
  * rows where the standard returns the grand-total row. (Found by the
  * round-7 differential fuzzer: every Spark-vs-DuckDB disagreement in the
  * ROLLUP shape was an empty filtered input.)
  *
  * Fix: rewrite `Agg_gsets(Expand(child))` to
  *
  *   Union(Agg_gsets(Expand(child)),
  *         Project(defaultRow,
  *                 Filter(cnt = 0, Agg_global(cnt <- COUNT(1),
  *                                            Agg_gsets(Expand(child))))))
  *
  * The probe aggregates the GROUPING-SETS OUTPUT (already tiny), not the
  * input, so the fact table is not rescanned — the probe's exchange
  * subtree is identical to branch 1's and AQE/ReuseExchange shares it; on
  * a statically-empty child, PropagateEmptyRelation constant-folds the
  * whole union down to the default row. One row is emitted per `()`
  * occurrence (GROUPING SETS may list it twice). Non-empty inputs are
  * unaffected: the rollup output then has >= 1 row and the filter kills
  * the extra branch.
  */
object StandardEmptyGroupingSets extends Rule[LogicalPlan] {

  private val Fixed = TreeNodeTag[Boolean]("graft.emptyGroupingSets.fixed")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a @ Aggregate(ge, _, e: Expand, _)
        if a.getTagValue(Fixed).isEmpty && ge.nonEmpty &&
           ge.forall(_.isInstanceOf[Attribute]) &&
           ge.exists { case at: Attribute => at.name == "spark_grouping_id" } =>
      a.setTagValue(Fixed, true)
      rewrite(a, e).getOrElse(a)
  }

  /** Synthetic grouping attributes the analyzer appends: the grouping-id
    * bitmask, plus a position disambiguator when duplicate grouping sets
    * are listed. Their per-set values live in the Expand projections. */
  private val SyntheticNames = Set("spark_grouping_id", "_gen_grouping_pos")

  private def rewrite(a: Aggregate, e: Expand): Option[LogicalPlan] = {
    val attrs = a.groupingExpressions.map(_.asInstanceOf[Attribute])
    val (synthetic, groupAttrs) = attrs.partition(at => SyntheticNames(at.name))
    if (groupAttrs.isEmpty) return None // GROUPING SETS (()) alone: exotic, skip
    val synthPos = synthetic.map(g => e.output.indexWhere(_.exprId == g.exprId))
    val groupPos = groupAttrs.map(g => e.output.indexWhere(_.exprId == g.exprId))
    if ((synthPos ++ groupPos).exists(_ < 0)) return None
    // the empty grouping set's projections: every grouping slot is a null
    // literal (excluded columns are nulled in Expand; `()` excludes all)
    val emptyProjs = e.projections.filter(p => groupPos.forall(p(_) match {
      case Literal(null, _) => true
      case _ => false
    }))
    if (emptyProjs.isEmpty) return None
    if (!emptyProjs.forall(p => synthPos.forall(p(_).isInstanceOf[Literal])))
      return None
    val groupIds = groupAttrs.map(_.exprId).toSet
    // one COUNT(1) probe over the grouping-sets output decides emptiness
    val cnt = Alias(Count(Literal(1)).toAggregateExpression(), "graft_gsets_probe")()
    val probe = Filter(EqualTo(cnt.toAttribute, Literal(0L)),
                       Aggregate(Nil, Seq(cnt), a))
    // the standard's empty-input row for the `()` set, one Union branch
    // per occurrence (fresh aliases each — Union children need distinct
    // ids; synthetic attrs take THAT occurrence's projection literals)
    val branches = emptyProjs.map { proj =>
      val synthValue = synthetic.zip(synthPos)
        .map { case (at, p) => at.exprId -> proj(p) }.toMap
      Project(a.aggregateExpressions.map { ne =>
        val t = ne.transformDown {
          case agg: AggregateExpression =>
            agg.aggregateFunction.defaultResult
              .getOrElse(Literal.create(null, agg.dataType))
          case at: Attribute if synthValue.contains(at.exprId) =>
            synthValue(at.exprId)
          case at: Attribute if groupIds.contains(at.exprId) =>
            Literal.create(null, at.dataType)
        }
        Alias(t, ne.name)()
      }, probe)
    }
    Some(Union(a +: branches))
  }
}
