package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** PiiScan (hand scanners) vs java.util.regex (the d25 contract's
  * executable patterns, `PiiRedactSummary.summaryRegex`) — the full
  * kernel output (three counts + the sequentially redacted string) must
  * be BIT-IDENTICAL on everything the fuzzer can throw: the scanners
  * are transcriptions of the JDK engine's leftmost/greedy/backtracking
  * search, and any divergence is a scanner bug by definition.
  */
class PiiScanSpec extends AnyFunSuite {

  private def scanned(s: String): (Int, Int, Int, String) = {
    val (nE, r1) = PiiScan.countRedact(PiiScan.nextEmail, s, "<EMAIL>")
    val nI = PiiScan.count(PiiScan.nextIp, s)
    val r2 = PiiScan.redact(PiiScan.nextIp, r1, "<IP>")
    val nP = PiiScan.count(PiiScan.nextPhone, s)
    val r3 = PiiScan.redact(PiiScan.nextPhone, r2, "<PHONE>")
    (nE, nP, nI, r3)
  }

  private def check(s: String): Unit = {
    val got = scanned(s)
    val want = PiiRedactSummary.summaryRegex(s)
    assert(got == want, s"divergence on <<$s>>")
  }

  test("adversarial corner shapes match the regex engine exactly") {
    Seq(
      "", "@", "a@", "@a.co", "a@b", "a@b.c", "a@b.co", "a@b.co.",
      "a@b.co1", "a@b.coX@d.com", "a@b..com", "a@.co", "a@-.co",
      ".@a.co", "-a@b.org-", "x_%+-@y.z.ab9cd", "a@b.c.d.ee",
      "a@@b.co", "a@b@c.com", "user@mail3.example.com or u7@host.org",
      "1.2.3.4", "1.2.3.4.5", "1.2.3.4.5.6.7.8", "1234.5.6.7",
      "1.2345.6.7", "1.2.3.4567", "a1.2.3.4", "1.2.3.4a", "_1.2.3.4",
      "1.2.3.4_", "1..2.3.4", ".1.2.3.4.", "10.0.0.1, ip 10.255.7.91",
      "255.255.255.255", "1.2.3", "1.2.3.", "(1.2.3.4)", "v1.2.3.4000",
      "555-1234", "12345-67890", "1234-5678", "(123) 456-7890",
      "(123)456-7890", "(12) 345-6789", "(123)  456-7890",
      "(123)\t456-7890", "(123)\n456-7890", "(123) 456-789",
      "(123 456-7890", "123) 456-7890", "call 555-0042 or (212) 555-0126",
      "555-12345", "x555-1234", "555-1234x", "((123) 456-7890)",
      "(999)(123) 456-7890", "96555-1234",
      // interactions: email redaction creating/destroying ip/phone shapes
      "a@1.2.3.4.co 1.2.3.4", "5@6.co7.8.9.10", "a@b.co555-1234",
      "1@2.com(123) 456-7890", "e@f.gh 212-555-0126 9.9.9.9",
      // non-ascii neighbors: the JDK's default \b is UNICODE-aware
      // ('_' || Character.isLetterOrDigit on code points) even though
      // default \w is ASCII — letters like é/日/ип suppress the boundary
      "é1.2.3.4é", "日a@b.coé", "ип 1.2.3.4", "ип1.2.3.4",
      "1.2.3.4é", "é555-1234", "١1.2.3.4", "1.2.3.4١",
      // supplementary code points: 𝒜 is a LETTER (word for JDK \b),
      // 🙂 is not — the boundary check must read code points, not chars
      "𝒜1.2.3.4", "1.2.3.4𝒜", "🙂1.2.3.4", "1.2.3.4🙂",
      "a@b.co(123)456-7890"
    ).foreach(check)
  }

  test("differential fuzz: random PII-biased strings (seeded)") {
    val rnd = new scala.util.Random(20260815L)
    val alpha =
      "aAzZ059@@..--(()) __%%++\t,<>:xq*@.-()" + "abcdefgh" + "é\u000B𝒜🙂"
    (0 until 60000).foreach { _ =>
      val len = rnd.nextInt(40)
      val sb = new StringBuilder(len)
      (0 until len).foreach(_ => sb += alpha.charAt(rnd.nextInt(alpha.length)))
      check(sb.toString)
    }
  }

  test("differential fuzz: token-assembled documents (seeded)") {
    val rnd = new scala.util.Random(42L)
    val toks = Array(
      "user7@mail3.example.com", "u19@host.org", "a@b.co", "x@y",
      "10.31.224.91", "1.2.3.4", "1234.5.6.7", "1.2.3.4567",
      "555-0042", "(212) 555-0126", "(123)456-7890", "(12) 345-678",
      "contact", "or", "ip", "call", "tok3", "stem_2", "-", "@", ".",
      "(", ")", "9", "99", "999", "", "_")
    val seps = Array(" ", "", ", ", "\t", ".", "-")
    (0 until 8000).foreach { _ =>
      val nt = 1 + rnd.nextInt(14)
      val sb = new StringBuilder
      (0 until nt).foreach { _ =>
        sb ++= toks(rnd.nextInt(toks.length))
        sb ++= seps(rnd.nextInt(seps.length))
      }
      check(sb.toString)
    }
  }

  test("long document throughput shape: correct on a realistic aug doc") {
    // the d25 aug shape: body of plain tokens + the planted PII tail
    val body = (1 to 2000).map(i => s"tok${i % 97} stem_${i % 11}").mkString(" ")
    val doc = body + " contact user123@mail4.example.com or u123@host.org," +
      " call 555-0042 or (212) 555-0126, ip 10.31.224.91"
    check(doc)
    val (nE, nP, nI, _) = scanned(doc)
    assert(nE == 2 && nP == 2 && nI == 1)
  }
}
