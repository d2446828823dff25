package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property-based round-trip fuzz of the Lance writer/reader (SURVEY
  * §5.2-4): random rows over the supported type lattice, with nulls,
  * must survive write -> read exactly (explicitly covering the
  * reference's null-erasure bug class — SURVEY §1.3 landmine). */
case class LanceRec(id: Long, s: Option[String], d: Option[Double], i: Option[Int],
                    f: Option[Float], b: Option[Boolean], vec: Option[Seq[Float]],
                    cat: Option[String], dec: Option[BigDecimal])

class LancePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val recGen: Gen[LanceRec] = for {
    id <- Gen.long
    s <- Gen.option(Gen.asciiPrintableStr.map(_.take(30)))
    d <- Gen.option(Gen.chooseNum(-1e12, 1e12))
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    f <- Gen.option(Gen.chooseNum(-1e6f, 1e6f))
    b <- Gen.option(Gen.oneOf(true, false))
    vec <- Gen.option(Gen.listOfN(4, Gen.chooseNum(-10f, 10f)).map(_.toSeq))
    // low-cardinality -> the writer dictionary-encodes these pages
    cat <- Gen.option(Gen.oneOf("alpha", "beta", "gamma"))
    // decimal(38,18) via the default encoder; negatives exercise the
    // two's-complement 16-byte layout
    dec <- Gen.option(Gen.chooseNum(-1000000000L, 1000000000L)
      .map(n => BigDecimal(n, 4)))
  } yield LanceRec(id, s, d, i, f, b, vec, cat, dec)

  test("random rows with nulls round-trip through lance (5 seeded samples)") {
    import spark.implicits._
    (1L to 5L).foreach { seedN =>
      val seed = org.scalacheck.rng.Seed(seedN)
      val recs = Gen.listOfN(60, recGen)
        .pureApply(Gen.Parameters.default, seed)
      val ds = java.nio.file.Files.createTempDirectory("graft-prop").toString + "/p.lance"
      val src = recs.toDF()
      src.write.format("lance").mode("append").save(ds)
      val back = spark.read.format("lance").load(ds)
      assert(back.count() == recs.length, s"seed $seedN")
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty, s"seed $seedN")
    }
  }

  test("fixedSizeList option round-trips under fuzz (nullable fixed-dim vectors)") {
    import spark.implicits._
    (10L to 12L).foreach { seedN =>
      val seed = org.scalacheck.rng.Seed(seedN)
      val recs = Gen.listOfN(80, recGen)
        .pureApply(Gen.Parameters.default, seed)
      val ds = java.nio.file.Files.createTempDirectory("graft-prop-fsl").toString + "/p.lance"
      val src = recs.toDF()
      src.write.format("lance").option("fixedSizeList", "vec:4").mode("append").save(ds)
      val back = spark.read.format("lance").load(ds)
      assert(back.count() == recs.length, s"seed $seedN")
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty, s"seed $seedN")
    }
  }
}
