package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass bigram-shingle summary of a document (SURVEY §2.5 n-gram
  * shingling; d14).
  *
  * Replaces the HOF pipeline `split → transform(sequence, concat) →
  * array_distinct → array_sort → array_join` — five array materializations
  * and a per-bigram concat allocation storm — with a single kernel that
  * tokenizes, builds bigram strings once, dedupes through a hash set,
  * sorts, and joins. Semantics match the HOF chain exactly (verified by
  * the d14 DuckDB oracle): split on single spaces keeping empty tokens,
  * bigram = `tok[i] + ' ' + tok[i+1]`, distinct in binary UTF-8 order.
  *
  * Output: struct(n_bigrams int, n_distinct int, joined string) — the
  * caller computes md5(joined) with the builtin.
  */
case class BigramShingleSummary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BigramShingleSummary.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bigram_shingles expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BigramShingleSummary.summary(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramShingleSummary.summary($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramShingleSummary =
    copy(child = newChild)
}

/** One-pass word n-gram statistics over a document (SURVEY §2.5
  * decontamination d15 / repetition filters d16).
  *
  * Tokenizes on single spaces (split-with-empties semantics), hashes each
  * token once (XXH64), forms rolling n-gram hashes by chaining the n
  * token hashes, and accumulates multiplicity in one hash map — replacing
  * an explode + two-stage aggregate (d16) or a gram join (d15) with a
  * MAP-ONLY pass: no per-gram string concat, no shuffle. Gram identity is
  * the 64-bit hash (collisions negligible — the d06 precedent; the DuckDB
  * oracles keep string grams).
  *
  * Output: struct(total, n_distinct, max_count: bigint,
  *                hashes: array<bigint> sorted distinct gram hashes).
  */
case class WordGramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")
  override def dataType: DataType = WordGramStats.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_word_gram_stats expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordGramStats.stats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramStats.stats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramStats =
    copy(child = newChild)
}

/** One-pass position-weighted polynomial document hash (SURVEY §2.5 doc
  * fingerprinting; d10).
  *
  * Computes, in a single fused loop, exactly what d10's two-level
  * posexplode + two-stage aggregate computes (the DuckDB oracle pins the
  * semantics): per word at 0-based wpos,
  * `whash = sum_cpos (codeunit % 128) * 8^min(cpos,15) mod 1e9+7`, and the
  * document hash is `sum_wpos (wpos * 1000003 + whash) mod 2^31-1`, all
  * bounded inside BIGINT (127 * 8^15 * 500 chars < 2^63). Character
  * identity is the UTF-16 code unit, matching `split(word, '')` + ascii()
  * on the ASCII corpus. Replaces a 1.5M-row double explode + window
  * re-aggregation with a MAP-ONLY pass.
  */
case class RollingDocHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_rolling_doc_hash expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    RollingDocHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingDocHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingDocHash =
    copy(child = newChild)
}

/** One-pass token quality statistics over a document (SURVEY §2.5 quality
  * scoring; d05).
  *
  * Replaces the `split → size + array_distinct + stopword kernel` stack —
  * which materialized the token array three times and rebuilt the stopword
  * list as a per-plan CreateArray of hundreds of literals (the round-6
  * 3.3× regression: giant codegen + per-row array construction) — with a
  * single tokenize pass. The stopword set is a constructor constant,
  * built ONCE and handed to generated code via `addReferenceObj`, so the
  * generated method body is one static call regardless of list size.
  *
  * Tokenization contract: split on single spaces keeping empty tokens
  * (DuckDB `string_split(text, ' ')` — the d05 oracle pins it).
  *
  * Output: struct(n_tok int, n_uniq int, stop_hits int).
  */
case class TokenQualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = TokenQualityStats.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_token_quality expects string, got $other")
    }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenQualityStats.stats(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenQualityStats.stats($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenQualityStats =
    copy(child = newChild)
}

object TokenQualityStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  /** Static helper the generated code calls directly. One byte-scan pass:
    * 0x20 never occurs inside a UTF-8 multibyte sequence, so token
    * boundaries are found without decoding. */
  def stats(text: UTF8String, stop: java.util.HashSet[UTF8String]): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val seen = new java.util.HashSet[UTF8String](16)
    var nTok = 0
    var hits = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        nTok += 1
        seen.add(tok)
        if (stop.contains(tok)) hits += 1
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, seen.size, hits))
  }
}

object RollingDocHash {
  private val Pow8 = Array.iterate(1L, 16)(_ * 8L)

  /** Static helper the generated code calls directly. */
  def hash(text: UTF8String): Long = {
    val s = text.toString
    var doc = 0L
    var wpos = 0L
    var i = 0
    val n = s.length
    while (i <= n) {
      // word = s[i, next space); the final word ends at n
      var whash = 0L
      var cpos = 0
      var j = i
      while (j < n && s.charAt(j) != ' ') {
        whash += (s.charAt(j).toLong % 128L) * Pow8(math.min(cpos, 15))
        cpos += 1
        j += 1
      }
      doc += (wpos * 1000003L + whash % 1000000007L) % 2147483647L
      wpos += 1
      i = j + 1
    }
    doc % 2147483647L
  }
}

object WordGramStats {
  val schema: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false), nullable = false)))

  private val Space = UTF8String.fromString(" ")
  private val Seed = 42L

  /** Static helper the generated code calls directly. */
  def stats(text: UTF8String, n: Int): InternalRow = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val toks = text.split(Space, -1)
    val total = math.max(toks.length - n + 1, 0)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    val counts = new java.util.HashMap[java.lang.Long, Integer](math.max(total * 2, 8))
    i = 0
    while (i < total) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      val prev = counts.get(h)
      counts.put(h, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var maxCount = 0L
    val hashes = new Array[Long](counts.size)
    var k = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.longValue > maxCount) maxCount = e.getValue.longValue
      hashes(k) = e.getKey.longValue
      k += 1
    }
    java.util.Arrays.sort(hashes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total.toLong, counts.size.toLong, maxCount,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hashes)))
  }
}

object BigramShingleSummary {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("joined", StringType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** Static helper the generated code calls directly. */
  def summary(text: UTF8String): InternalRow = {
    // split on ' ' keeping empty tokens (regex split with limit -1
    // semantics for a single-space pattern)
    val toks = text.split(Space, -1)
    val nBigrams = math.max(toks.length - 1, 0)
    val set = new java.util.HashSet[UTF8String](math.max(nBigrams * 2, 8))
    val distinct = new java.util.ArrayList[UTF8String](nBigrams)
    var i = 0
    while (i < nBigrams) {
      val bg = UTF8String.concat(toks(i), Space, toks(i + 1))
      if (set.add(bg)) distinct.add(bg)
      i += 1
    }
    val arr = distinct.toArray(new Array[UTF8String](distinct.size()))
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val joined = UTF8String.concatWs(Space, arr: _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nBigrams, arr.length, joined))
  }
}

/** One-pass-per-pattern PII count + redact (SURVEY §2.5 PII redaction;
  * d25).
  *
  * Replaces three `regexp_extract_all` (which MATERIALIZE every match
  * into an array only to take its size) plus a three-deep
  * `regexp_replace` chain — six regex scans and three intermediate
  * strings per document — with one kernel: the email pass counts and
  * redacts in a single matcher loop, the ip/phone passes count on the
  * ORIGINAL text (the declared semantics — counts are occurrences in
  * the source document, not the partially redacted one) and redact the
  * running result, and no match arrays are ever built. Same
  * java.util.regex engine, same patterns, same sequential
  * email → ip → phone replacement order, so the output is bit-identical
  * to the builtin chain (pinned by the d25 DuckDB oracle).
  *
  * Output: struct(n_email, n_phone, n_ip int, red string).
  */
case class PiiRedactSummary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiRedactSummary.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_pii_redact expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    PiiRedactSummary.summary(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PiiRedactSummary.summary($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiRedactSummary =
    copy(child = newChild)
}

object PiiRedactSummary {
  val schema: StructType = StructType(Seq(
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false),
    StructField("red", StringType, nullable = false)))

  // the exact patterns of the d25 contract (java.util.regex, as the
  // builtin regexp_* functions compile them). The hot path below runs
  // PiiScan's hand scanners instead — procedural transcriptions of the
  // JDK engine on these three patterns, differentially fuzz-pinned
  // against these very Patterns by PiiScanSpec; the Patterns stay here
  // as the executable statement of the contract (and the spec's
  // reference engine).
  val Email: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  val Phone: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "(\\(\\d{3}\\)\\s?)?\\d{3}-\\d{4}")
  val Ip: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Static helper the generated code calls directly. */
  def summary(text: UTF8String): InternalRow = {
    val str = text.toString
    // email: count + redact in ONE scan
    val (nEmail, red1) = PiiScan.countRedact(PiiScan.nextEmail, str, "<EMAIL>")
    // ip / phone: counts over the ORIGINAL text, redaction over the
    // running result (sequential email -> ip -> phone order)
    val nIp = PiiScan.count(PiiScan.nextIp, str)
    val red2 = PiiScan.redact(PiiScan.nextIp, red1, "<IP>")
    val nPhone = PiiScan.count(PiiScan.nextPhone, str)
    val red3 = PiiScan.redact(PiiScan.nextPhone, red2, "<PHONE>")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nEmail, nPhone, nIp, UTF8String.fromString(red3)))
  }

  /** The previous (java.util.regex) kernel, kept as the differential
    * reference for PiiScanSpec — NOT on any query path. */
  def summaryRegex(str: String): (Int, Int, Int, String) = {
    var nEmail = 0
    val sb = new java.lang.StringBuilder(str.length)
    val me = Email.matcher(str)
    while (me.find()) { nEmail += 1; me.appendReplacement(sb, "<EMAIL>") }
    me.appendTail(sb)
    var nIp = 0
    val mi = Ip.matcher(str)
    while (mi.find()) nIp += 1
    val red2 = Ip.matcher(sb).replaceAll("<IP>")
    var nPhone = 0
    val mp = Phone.matcher(str)
    while (mp.find()) nPhone += 1
    val red3 = Phone.matcher(red2).replaceAll("<PHONE>")
    (nEmail, nPhone, nIp, red3)
  }
}

/** One-pass portable-MinHash signature (SURVEY §2.5 near-dup dedup; the
  * shared signature stage of d28/d33/d34).
  *
  * Computes exactly `array((0 until p).map(q => array_min(transform(
  * array_distinct(split(text, ' ')), tk => substring(md5(concat(q + ":",
  * tk)), 1, 13)))))` — the PORTABLE construction whose DuckDB twin is
  * the family's hash oracle — but in ONE pass: tokenize (single-space
  * split keeping empties, the builtin's semantics), dedupe through a
  * hash set, and for each distinct token run p seeded md5s, tracking the
  * per-seed minimum as the digest's first 52 BITS in a long (13
  * lowercase-hex chars compare lexicographically exactly as their 52-bit
  * numeric value). The declarative chain materializes p transformed
  * arrays, p*|toks| 32-char hex strings and substrings per document;
  * this kernel allocates only the final 13-char strings, once per seed.
  * Values are bit-identical (differential spec + the d28/d33/d34 DuckDB
  * hash oracles at four scale factors).
  */
case class MinHashSig(child: Expression, p: Int) extends UnaryExpression {
  require(p >= 1 && p <= 64, "seed count must be in [1, 64]")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[UTF8String], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.sig($c, $p)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val Space = UTF8String.fromString(" ")
  private val HexChars = "0123456789abcdef".toCharArray
  // seed prefixes "q:" as UTF-8 bytes, q < 64 (covers every declared P)
  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(q => (q.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Bounded per-thread token → seeded-hash cache. Corpus vocabulary is
    * Zipf: the same tokens recur across documents thousands of times, and
    * MIN is duplicate-insensitive, so the p md5s per token can be memoized
    * without affecting values. Lossy single-probe open addressing
    * (replace-on-collision): a miss only costs the recompute, so the cap
    * holds memory at ~a few MB per task thread on an unbounded-vocabulary
    * corpus. Tokens are CLONED into the cache — the incoming UTF8String
    * may view a buffer the scan reuses for the next row.
    */
  private final class TokenCache {
    val mask: Int = (1 << 15) - 1
    val toks = new Array[UTF8String](mask + 1)
    val ps = new Array[Int](mask + 1)
    val vals = new Array[Array[Long]](mask + 1)
  }
  private val cacheLocal: ThreadLocal[TokenCache] =
    ThreadLocal.withInitial(() => new TokenCache)

  /** Static helper the generated code calls directly. */
  def sig(text: UTF8String, p: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.split(Space, -1)
    val mins = new Array[Long](p)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = mdLocal.get()
    val cache = cacheLocal.get()
    val buf = new Array[Byte](16)
    var i = 0
    while (i < toks.length) {
      val tk = toks(i)
      val slot = tk.hashCode & cache.mask
      var vs = cache.vals(slot)
      if (vs == null || cache.ps(slot) != p || !cache.toks(slot).equals(tk)) {
        vs = new Array[Long](p)
        val tb = tk.getBytes
        var q = 0
        while (q < p) {
          md.reset()
          md.update(Prefixes(q))
          md.update(tb)
          md.digest(buf, 0, 16)
          // first 13 hex chars = the digest's first 52 bits
          vs(q) = ((buf(0) & 0xffL) << 44) | ((buf(1) & 0xffL) << 36) |
                  ((buf(2) & 0xffL) << 28) | ((buf(3) & 0xffL) << 20) |
                  ((buf(4) & 0xffL) << 12) | ((buf(5) & 0xffL) << 4) |
                  ((buf(6) & 0xf0L) >>> 4)
          q += 1
        }
        cache.toks(slot) = tk.clone()
        cache.ps(slot) = p
        cache.vals(slot) = vs
      }
      var q = 0
      while (q < p) {
        if (vs(q) < mins(q)) mins(q) = vs(q)
        q += 1
      }
      i += 1
    }
    val out = new Array[Any](p)
    var q = 0
    while (q < p) {
      val chars = new Array[Char](13)
      var k = 0
      while (k < 13) {
        chars(k) = HexChars(((mins(q) >>> ((12 - k) * 4)) & 0xf).toInt)
        k += 1
      }
      out(q) = UTF8String.fromString(new String(chars))
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** One-pass bigram hash-bucket census (SURVEY §2.5 importance sampling;
  * d23's DSIR feature stage).
  *
  * Computes, per document, the multiset `{substring(md5(tok[i] || ' ' ||
  * tok[i+1]), 1, 4)}` of 16-bit bigram buckets as (bucket, count)
  * entries — exactly what d23's `explode(zip_with(...)) → md5 →
  * substring → groupBy(doc_id, b).count()` pipeline produces, with the
  * per-doc combine fused into the scan: the exploded stream shrinks from
  * one row per BIGRAM to one row per distinct (doc, bucket), and no
  * bigram string, 32-char hex, or substring is ever materialized (the
  * md5 is fed tokA/' '/tokB as three update() calls; the bucket is the
  * digest's first two bytes). The d23 DuckDB oracle pins value equality.
  */
case class BigramBucketCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BigramBucketCounts.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bigram_buckets expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BigramBucketCounts.buckets(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramBucketCounts.buckets($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramBucketCounts =
    copy(child = newChild)
}

object BigramBucketCounts {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("b", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  private val Space = UTF8String.fromString(" ")
  private val SpaceByte = Array(' '.toByte)
  private val HexChars = "0123456789abcdef".toCharArray
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Static helper the generated code calls directly. */
  def buckets(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.split(Space, -1)
    val nb = toks.length - 1
    if (nb <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val md = mdLocal.get()
    val buf = new Array[Byte](16)
    val codes = new Array[Int](nb)
    var i = 0
    while (i < nb) {
      md.reset()
      md.update(toks(i).getBytes)
      md.update(SpaceByte)
      md.update(toks(i + 1).getBytes)
      md.digest(buf, 0, 16)
      codes(i) = ((buf(0) & 0xff) << 8) | (buf(1) & 0xff)
      i += 1
    }
    java.util.Arrays.sort(codes)
    // run-length encode the sorted bucket codes
    var distinct = 1
    i = 1
    while (i < nb) { if (codes(i) != codes(i - 1)) distinct += 1; i += 1 }
    val out = new Array[Any](distinct)
    var o = 0
    i = 0
    while (i < nb) {
      var j = i
      while (j < nb && codes(j) == codes(i)) j += 1
      val chars = new Array[Char](4)
      chars(0) = HexChars((codes(i) >>> 12) & 0xf)
      chars(1) = HexChars((codes(i) >>> 8) & 0xf)
      chars(2) = HexChars((codes(i) >>> 4) & 0xf)
      chars(3) = HexChars(codes(i) & 0xf)
      out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(new String(chars)), (j - i).toLong))
      o += 1
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
