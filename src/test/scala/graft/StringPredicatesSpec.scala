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

  /** Independent reference: a direct recursive glob matcher (no regex).
    * Same DuckDB-pinned edge semantics as the rewrite: `]` first in a
    * class is literal; an unterminated or empty class makes the whole
    * pattern match nothing. */
  private def globRef(s: String, p: String): Boolean = {
    // ([char matcher], next idx); None = unterminated/empty class
    def cls(pi: Int): Option[(Int => Boolean, Int)] = {
      var i = pi + 1
      val neg = i < p.length && p.charAt(i) == '!'
      if (neg) i += 1
      val items = scala.collection.mutable.ArrayBuffer.empty[(Char, Char)]
      var first = true
      while (i < p.length && (first || p.charAt(i) != ']')) {
        first = false
        if (i + 2 < p.length && p.charAt(i + 1) == '-' && p.charAt(i + 2) != ']') {
          items += ((p.charAt(i), p.charAt(i + 2))); i += 3
        } else { items += ((p.charAt(i), p.charAt(i))); i += 1 }
      }
      if (i >= p.length || items.isEmpty) None
      else {
        val in = (c: Int) => items.exists { case (a, b) => c >= a && c <= b }
        Some((c => in(c) != neg, i + 1)) // skip ']'
      }
    }
    def m(si: Int, pi: Int): Boolean =
      if (pi == p.length) si == s.length
      else p.charAt(pi) match {
        case '*' => (si to s.length).exists(k => m(k, pi + 1))
        case '?' => si < s.length && m(si + 1, pi + 1)
        case '[' => cls(pi) match {
          case None => false
          case Some((f, np)) =>
            si < s.length && f(s.charAt(si)) && m(si + 1, np)
        }
        case c => si < s.length && s.charAt(si) == c && m(si + 1, pi + 1)
      }
    m(0, 0)
  }

  test("glob class edges match DuckDB GLOB exactly") {
    // DuckDB-verified: unterminated '[' matches nothing (even a literal
    // '['), '[]]' is the class {']'}, '[!]' matches nothing, '&' inside
    // a class is a literal (never a Java && intersection)
    assert(!globHit("a[", "a["))
    assert(!globHit("[", "["))
    assert(globHit("]", "[]]"))
    assert(!globHit("a", "[]]"))
    assert(!globHit("x", "[!]"))
    assert(!globHit("!", "[!]"))
    assert(globHit("a", "[a&&b]"))
    assert(globHit("&", "[a&&b]"))
    assert(!globHit("c", "[a&&b]"))
    assert(!globHit("ab", "a[b"))
    // a REVERSED range ([z-a]) is an invalid Java regex; DuckDB GLOB
    // matches nothing — must not throw PatternSyntaxException
    assert(!globHit("a", "[z-a]"))
    assert(!globHit("m", "x[z-a]y"))
    assert(globHit("b", "[a-c]")) // well-ordered ranges unaffected
  }

  test("property: glob rewrite agrees with a direct glob matcher (seeded fuzz)") {
    // deterministic fuzz: seeded generators, no scalacheck runner state
    val rnd = new scala.util.Random(4242)
    val patChars = "ab*?.(cd"
    val classes = Seq("", "[ab]", "[!ab]", "[a-c]", "[", "[]]", "[!]", "[a&&b]", "[]ab]")
    def pat(): String = {
      val n = rnd.nextInt(9)
      val cs = Seq.fill(n)(patChars.charAt(rnd.nextInt(patChars.length)))
      val cls = classes(rnd.nextInt(classes.length))
      val pos = rnd.nextInt(n + 1)
      cs.take(pos).mkString + cls + cs.drop(pos).mkString
    }
    val strChars = "abcd.(*]&!"
    def str(): String =
      Seq.fill(rnd.nextInt(10))(strChars.charAt(rnd.nextInt(strChars.length))).mkString
    val pats = Seq.fill(40)(pat()).distinct
    val strs = Seq.fill(60)(str()).distinct
    pats.foreach { p =>
      // evaluate the rewrite IN SPARK (the shipped path) for all strings
      val got = strs.toDF("x")
        .select(col("x"), glob(col("x"), p).as("hit"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      strs.foreach { s0 =>
        assert(got(s0) == globRef(s0, p),
          s"glob mismatch: string='$s0' pattern='$p' rewrite=${got(s0)} ref=${globRef(s0, p)}")
      }
    }
  }
}
