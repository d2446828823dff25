package graft

import graft.functions.StringPredicates._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GLOB / SIMILAR TO rewrites: full-string anchoring, glob metacharacter
  * translation, regex-metachar escaping (semantics pinned against DuckDB
  * in q80's oracle; these tests pin the translation itself). */
class StringPredicatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def globHit(s: String, pat: String): Boolean =
    Seq(s).toDF("x").select(glob(col("x"), pat)).as[Boolean].head()
  private def simHit(s: String, pat: String): Boolean =
    Seq(s).toDF("x").select(similarTo(col("x"), pat)).as[Boolean].head()

  test("glob translation: * ? classes, negated classes, escaping") {
    assert(globToRegex("*red*") == ".*red.*")
    assert(globToRegex("r?d") == "r.d")
    assert(globToRegex("[rb]ed") == "[rb]ed")
    assert(globToRegex("[!a-m]*") == "[^a-m].*")
    assert(globToRegex("a.b(c)") == "a\\.b\\(c\\)")
  }

  test("glob matches are full-string (DuckDB GLOB semantics)") {
    assert(globHit("red widget", "*red*"))
    assert(globHit("red widget", "red*"))
    assert(!globHit("red widget", "red"))      // no trailing *, must cover all
    assert(globHit("red widget", "r?d*"))
    assert(globHit("red widget", "[rb]ed*"))
    assert(!globHit("abc", "[!a-m]*"))
    assert(globHit("xyz", "[!a-m]*"))
    assert(globHit("a.b(c)", "a.b(c)"))        // literal dot/parens, not regex
    assert(!globHit("axb(c)", "a.b(c)"))
  }

  test("SIMILAR TO is full-match regex; % is NOT special (DuckDB semantics)") {
    assert(simHit("red widget", "(red|blue).*"))
    assert(!simHit("red widget", "red"))       // partial match is not enough
    assert(!simHit("red widget", "(red|blue)%")) // % is a literal, no match
    assert(!simHit("xred widget", "(red|blue).*"))
  }
}
