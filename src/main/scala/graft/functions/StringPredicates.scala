package graft.functions

import org.apache.spark.sql.Column

/** DuckDB's GLOB / SIMILAR TO predicates as Spark rewrites (SURVEY §2.2
  * predicates row; ref surface: DuckDB `expr GLOB pat`, `expr SIMILAR TO
  * pat`).
  *
  * Both rewrite to `rlike` over an ANCHORED Java regex — Spark's `rlike`
  * is find-anywhere, while GLOB and SIMILAR TO must match the ENTIRE
  * string (verified against DuckDB 1.0: `'red widget' SIMILAR TO 'red'`
  * is false, and `%`/`_` are NOT special in DuckDB's SIMILAR TO — the
  * pattern is a plain full-match regex, unlike PostgreSQL's).
  *
  * The translation happens at plan time on the literal pattern, so the
  * executed predicate is a codegen'd RLike over a constant regex — no
  * UDF, pushdown-eligible like any other rlike.
  */
object StringPredicates {

  /** Shell-glob → Java regex body (unanchored): `*` → `.*`, `?` → `.`,
    * `[...]`/`[!...]` character classes pass through (`!` → `^`), every
    * regex metacharacter outside a class is escaped. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < glob.length) {
      val c = glob.charAt(i)
      if (inClass) c match {
        case ']'  => sb.append(']'); inClass = false
        case '\\' => sb.append("\\\\")
        case ch   => sb.append(ch)
      } else c match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          inClass = true; sb.append('[')
          if (i + 1 < glob.length && glob.charAt(i + 1) == '!') {
            sb.append('^'); i += 1
          }
        case ch if "\\.(){}+^$|".indexOf(ch.toInt) >= 0 =>
          sb.append('\\').append(ch)
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  /** `c GLOB pattern` (full-string shell glob). */
  def glob(c: Column, pattern: String): Column =
    c.rlike("^" + globToRegex(pattern) + "$")

  /** `c SIMILAR TO pattern` (full-string regex match). */
  def similarTo(c: Column, pattern: String): Column =
    c.rlike("^(?:" + pattern + ")$")
}
