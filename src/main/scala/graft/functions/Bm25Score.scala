package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Declarative BM25 ranking marker — the SQL face of the persisted FTS
  * index (the reference's tantivy-backed `table.search(...)`, reference
  * `Cargo.lock`: `lance-index` → `tantivy`).
  *
  * BM25 is a corpus-level ranking (df / N / avgdl are corpus statistics),
  * so a per-row scalar CANNOT compute it — exactly like Lucene's `score()`
  * pseudo-function, `graft_bm25(text, 'query terms')` is a marker that the
  * optimizer rule [[graft.plans.FtsTopKRewrite]] replaces: the canonical
  * shape
  *
  * {{{
  *   SELECT <id>, graft_bm25(<text>, 'w1 w2 ...') AS s
  *   FROM lance.`/docs.lance` ORDER BY s DESC [, <id>] LIMIT k
  * }}}
  *
  * over a table with a registered FTS index (built by
  * `Fts.buildIndexLance`, or re-attached with `Fts.attachIndex`) becomes a
  * probe of the persisted postings/vocabulary sidecars — the corpus text is
  * never re-tokenized. Outside that shape the marker FAILS LOUDLY at
  * execution rather than silently mis-ranking.
  */
case class Bm25Score(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bm25"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bm25 expects (string text, string query), got ($l, $r)")
    }

  override def eval(input: InternalRow): Any =
    throw new UnsupportedOperationException(
      "graft_bm25 is a declarative FTS ranking marker and only executes when " +
      "FtsTopKRewrite replaces the canonical shape: SELECT <id>, " +
      "graft_bm25(<text>, '<terms>') AS s FROM lance.`<docs>` ORDER BY s DESC " +
      "[, <id>] LIMIT k — over a dataset whose FTS index was registered via " +
      "Fts.buildIndexLance or Fts.attachIndex. Either register the index and " +
      "keep the query in that shape, or use Fts.bm25 for the index-free path.")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
