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

// one nesting level: struct-in-struct, list<struct>, map<string,double>
case class Inner(v: Option[Long], deep: Int)
case class Outer(s: Option[String], inner: Inner)
case class Pt(x: Double, tag: Option[String])
case class NestedRec(id: Long, outer: Outer, pts: Seq[Pt],
                     attrs: Map[String, Option[Double]])

// deep nesting: list<list<long>>, struct{ meta: struct{ tags: list<string>,
// depth3: struct{u} }, rows: list<struct{k, vals: list<double>}> },
// map<string, list<long>>
case class DeepLeaf(u: Option[Int])
case class DeepMeta(tags: Seq[String], depth3: DeepLeaf)
case class DeepRow(k: Option[String], vals: Seq[Double])
case class DeepBody(meta: DeepMeta, rows: Seq[DeepRow])
case class DeepRec(id: Long, grid: Seq[Seq[Long]], body: DeepBody,
                   index: Map[String, Seq[Long]])

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

  val nestedGen: Gen[NestedRec] = for {
    id <- Gen.long
    inS <- Gen.option(Gen.alphaNumStr.map(_.take(12)))
    inL <- Gen.option(Gen.chooseNum(-1000000L, 1000000L))
    deep <- Gen.chooseNum(-100, 100)
    pts <- Gen.listOfN(3, for {
      x <- Gen.chooseNum(-1e6, 1e6)
      tag <- Gen.option(Gen.oneOf("a", "b"))
    } yield Pt(x, tag)).map(_.toSeq)
    nPts <- Gen.chooseNum(0, 3)
    attrs <- Gen.mapOfN(3, Gen.zip(Gen.alphaNumStr.map(_.take(6)),
                                   Gen.option(Gen.chooseNum(-1e3, 1e3))))
  } yield NestedRec(id, Outer(inS, Inner(inL, deep)), pts.take(nPts), attrs)

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

  test("one nesting level round-trips under fuzz: struct-in-struct, list<struct>, map") {
    import spark.implicits._
    (20L to 22L).foreach { seedN =>
      val seed = org.scalacheck.rng.Seed(seedN)
      val recs = Gen.listOfN(50, nestedGen).pureApply(Gen.Parameters.default, seed)
      val ds = java.nio.file.Files.createTempDirectory("graft-prop-nest").toString + "/p.lance"
      val src = recs.toDF()
      src.write.format("lance").mode("append").save(ds)
      val back = spark.read.format("lance").load(ds)
      // nullability is widened on read (lance fields are all nullable);
      // names and types must survive exactly
      assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
             src.schema.map(f => (f.name, f.dataType.simpleString)),
        s"seed $seedN: schema mismatch")
      assert(back.count() == recs.length, s"seed $seedN")
      // set ops reject MAP columns: compare maps as sorted entry lists
      def cmp(df: org.apache.spark.sql.DataFrame) =
        df.selectExpr("id", "outer", "pts", "array_sort(map_entries(attrs)) AS attrs")
      assert(cmp(back).exceptAll(cmp(src)).isEmpty &&
             cmp(src).exceptAll(cmp(back)).isEmpty, s"seed $seedN")
    }
  }

  val deepGen: Gen[DeepRec] = for {
    id <- Gen.long
    grid <- Gen.listOfN(3, Gen.listOfN(2, Gen.chooseNum(-1000L, 1000L)).map(_.toSeq))
      .map(_.toSeq)
    nGrid <- Gen.chooseNum(0, 3)
    tags <- Gen.listOfN(2, Gen.oneOf("red", "green", "blue")).map(_.toSeq)
    u <- Gen.option(Gen.chooseNum(-50, 50))
    drows <- Gen.listOfN(3, for {
      k <- Gen.option(Gen.alphaNumStr.map(_.take(5)))
      vals <- Gen.listOfN(2, Gen.chooseNum(-1e3, 1e3)).map(_.toSeq)
      nVals <- Gen.chooseNum(0, 2)
    } yield DeepRow(k, vals.take(nVals))).map(_.toSeq)
    nRows <- Gen.chooseNum(0, 3)
    idx <- Gen.mapOfN(2, Gen.zip(Gen.alphaNumStr.map(_.take(4)),
      Gen.listOfN(2, Gen.chooseNum(0L, 99L)).map(_.toSeq)))
  } yield DeepRec(id, grid.take(nGrid), DeepBody(DeepMeta(tags, DeepLeaf(u)),
    drows.take(nRows)), idx)

  test("arbitrary-depth nesting round-trips: list<list>, struct^3, list<struct<list>>, map<_,list>") {
    import spark.implicits._
    (30L to 32L).foreach { seedN =>
      val seed = org.scalacheck.rng.Seed(seedN)
      val recs = Gen.listOfN(40, deepGen).pureApply(Gen.Parameters.default, seed)
      val ds = java.nio.file.Files.createTempDirectory("graft-prop-deep").toString + "/p.lance"
      val src = recs.toDF()
      src.write.format("lance").mode("append").save(ds)
      val back = spark.read.format("lance").load(ds)
      assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
             src.schema.map(f => (f.name, f.dataType.simpleString)),
        s"seed $seedN: schema mismatch")
      assert(back.count() == recs.length, s"seed $seedN")
      def cmp(df: org.apache.spark.sql.DataFrame) =
        df.selectExpr("id", "grid", "body", "array_sort(map_entries(index)) AS index")
      assert(cmp(back).exceptAll(cmp(src)).isEmpty &&
             cmp(src).exceptAll(cmp(back)).isEmpty, s"seed $seedN")
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
