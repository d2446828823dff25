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
    * `[...]`/`[!...]` character classes translated (`!` → `^`), every
    * regex metacharacter outside a class is escaped.
    *
    * Class edge semantics pinned against DuckDB GLOB:
    *  - `]` as the FIRST member (after the optional `!`) is a literal;
    *  - an UNTERMINATED class (no closing `]` after the first member,
    *    including `[` and `[!]`) makes the whole pattern match NOTHING
    *    — translated to the match-nothing regex `(?!)`;
    *  - class members are individually escaped (`&` would otherwise form
    *    a Java `&&` class intersection; `[`/`]`/`\`/`^` likewise differ).
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    def classMember(ch: Char): String =
      if ("\\]^[&".indexOf(ch.toInt) >= 0) "\\" + ch else ch.toString
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*"); i += 1
        case '?' => sb.append('.'); i += 1
        case '[' =>
          var j = i + 1
          val neg = j < glob.length && glob.charAt(j) == '!'
          if (neg) j += 1
          val members = new StringBuilder
          var first = true
          while (j < glob.length && (first || glob.charAt(j) != ']')) {
            first = false
            if (j + 2 < glob.length && glob.charAt(j + 1) == '-' &&
                glob.charAt(j + 2) != ']') {
              // a REVERSED range ([z-a]) is an invalid Java regex; DuckDB
              // GLOB treats the pattern as matching nothing — pin that.
              if (glob.charAt(j) > glob.charAt(j + 2)) return "(?!)"
              members.append(classMember(glob.charAt(j))).append('-')
                .append(classMember(glob.charAt(j + 2)))
              j += 3
            } else {
              members.append(classMember(glob.charAt(j)))
              j += 1
            }
          }
          if (j >= glob.length || first) return "(?!)" // unterminated/empty
          sb.append('[')
          if (neg) sb.append('^')
          sb.append(members).append(']')
          i = j + 1 // skip ']'
        case ch if "\\.(){}+^$|".indexOf(ch.toInt) >= 0 =>
          sb.append('\\').append(ch); i += 1
        case ch => sb.append(ch); i += 1
      }
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
