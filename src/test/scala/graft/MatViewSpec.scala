package graft

import graft.operators.MatView
import graft.sources.lance.{LanceFormat, LanceMaintenance}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized views: refresh via the change feed must equal
  * a full recompute bit-for-bit, touch only affected groups, drop groups
  * whose count reaches zero, and refuse inconsistent metadata. */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def srcRows(ks: Seq[(Long, String, Double)]): DataFrame =
    ks.toDF("id", "grp", "amt")

  private def writeSrc(path: String, df: DataFrame): Unit =
    df.repartition(3).write.format("lance")
      .option("stableRowIds", "true").mode("overwrite").save(path)

  /** Full recompute with the same exact interiors the MV uses
    * (including the per-sum non-null count `cntnn_<c>`). */
  private def recompute(src: String): DataFrame =
    spark.read.format("lance").load(src)
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col("amt").cast("decimal(38,6)")),
          lit(BigDecimal(0)).cast("decimal(38,6)")).as("sum_amt"),
        count(col("amt")).as("cntnn_amt"))

  private def sorted(df: DataFrame): Seq[String] =
    df.orderBy("grp").collect().map(_.mkString("|")).toSeq

  test("refresh after append+delete equals full recompute exactly") {
    val dir = tmp("mv_basic")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows((1L to 40L).map(i =>
      (i, s"g${i % 5}", i * 1.25 + 0.001))))
    MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    // churn: delete some rows, append rows into existing + new groups
    LanceMaintenance.deleteWhere(spark, src, "id % 4 = 0")
    srcRows(Seq((100L, "g1", 7.5), (101L, "g9", 2.25), (102L, "g9", -1.0)))
      .write.format("lance").mode("append").save(src)
    MatView.refresh(spark, mv)
    assert(sorted(MatView.read(spark, mv)) == sorted(recompute(src)))
  }

  test("group reaching zero count is dropped from the view") {
    val dir = tmp("mv_zero")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows(Seq(
      (1L, "keep", 1.0), (2L, "keep", 2.0), (3L, "gone", 9.0))))
    MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    LanceMaintenance.deleteWhere(spark, src, "grp = 'gone'")
    MatView.refresh(spark, mv)
    val grps = MatView.read(spark, mv).select("grp").as[String].collect().toSet
    assert(grps == Set("keep"))
    assert(sorted(MatView.read(spark, mv)) == sorted(recompute(src)))
  }

  test("refresh is delta-driven: unaffected groups' rows are not rewritten") {
    val dir = tmp("mv_delta")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows((1L to 30L).map(i => (i, s"g${i % 10}", 1.0))))
    MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    // touch ONLY group g3
    srcRows(Seq((200L, "g3", 5.0))).write.format("lance")
      .mode("append").save(src)
    MatView.refresh(spark, mv)
    // the upsert deleted exactly the affected group's single row
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(mv, conf)
    val m = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None))
    val deleted = m.fragments.flatMap(_.deletion).map(_.numDeleted).sum
    assert(deleted == 1L, s"expected 1 tombstoned group row, got $deleted")
    assert(sorted(MatView.read(spark, mv)) == sorted(recompute(src)))
  }

  test("racing refreshes never double-apply a delta") {
    val dir = tmp("mv_race")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows((1L to 60L).map(i => (i, s"g${i % 6}", i * 0.5))))
    MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    LanceMaintenance.deleteWhere(spark, src, "id % 4 = 1")
    srcRows(Seq((200L, "g1", 9.0), (201L, "g9", 4.0)))
      .write.format("lance").mode("append").save(src)
    // two refreshes race: the commit protocol must let exactly one delta
    // land — the loser either conflicts loudly or arrives after the
    // winner's spec advance and sees an empty interval (no-op). A silent
    // double-apply would double the g1/g9 deltas and break the
    // recompute equality below.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map(_ => new Thread(() => {
      try MatView.refresh(spark, mv)
      catch { case e: Throwable => errs.add(e) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    errs.forEach { e =>
      val ok = e.isInstanceOf[graft.sources.lance.LanceCommitConflict] ||
        Option(e.getMessage).exists(m =>
          m.contains("recompute") || m.contains("re-create") ||
          m.contains("concurrent"))
      assert(ok, s"unexpected racing-refresh failure: $e")
    }
    // a retry after the race must converge (no-op if already at head)
    MatView.refresh(spark, mv)
    assert(sorted(MatView.read(spark, mv)) == sorted(recompute(src)))

    // INSERT-ONLY racing delta (a brand-new group, no tombstones): this
    // is the case the expected-version CAS exists for — without it both
    // twins pass the lenient rebase check (no shared fragments touched)
    // and the delta double-applies as duplicate group rows
    srcRows(Seq((300L, "gNEW", 1.5), (301L, "gNEW", 2.5)))
      .write.format("lance").mode("append").save(src)
    val errs2 = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads2 = (1 to 2).map(_ => new Thread(() => {
      try MatView.refresh(spark, mv)
      catch { case e: Throwable => errs2.add(e) }
    }))
    threads2.foreach(_.start()); threads2.foreach(_.join())
    errs2.forEach { e =>
      val ok = e.isInstanceOf[graft.sources.lance.LanceCommitConflict] ||
        Option(e.getMessage).exists(m =>
          m.contains("recompute") || m.contains("re-create") ||
          m.contains("concurrent"))
      assert(ok, s"unexpected insert-only racing failure: $e")
    }
    MatView.refresh(spark, mv)
    val newRows = MatView.read(spark, mv).filter($"grp" === "gNEW").collect()
    assert(newRows.length == 1,
      s"racing insert-only refresh double-applied: ${newRows.toSeq}")
    assert(sorted(MatView.read(spark, mv)) == sorted(recompute(src)))
  }

  test("no-op refresh when source did not advance; compaction-only is empty delta") {
    val dir = tmp("mv_noop")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows((1L to 12L).map(i => (i, s"g${i % 3}", 0.5))))
    val v0 = MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    assert(MatView.refresh(spark, mv) == v0) // head unchanged → same version
    // compaction advances the version but moves rows without changing them
    LanceMaintenance.compactStable(spark, src, targetFragments = 1)
    MatView.refresh(spark, mv)
    assert(sorted(MatView.read(spark, mv)) == sorted(recompute(src)))
  }

  test("integral sum column stays a long sum") {
    val dir = tmp("mv_long")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("id", "grp", "n")
      .write.format("lance").option("stableRowIds", "true")
      .mode("overwrite").save(src)
    MatView.create(spark, src, mv, Seq("grp"), Seq("n"))
    val schema = MatView.read(spark, mv).schema
    assert(schema("sum_n").dataType.simpleString == "bigint")
    Seq((4L, "b", 7L)).toDF("id", "grp", "n")
      .write.format("lance").mode("append").save(src)
    MatView.refresh(spark, mv)
    val b = MatView.read(spark, mv).filter($"grp" === "b")
      .select("cnt", "sum_n").as[(Long, Long)].collect().head
    assert(b == ((2L, 12L)))
  }

  test("min/max maintenance: inserts merge, deletes recompute the touched group") {
    val dir = tmp("mv_minmax")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows((1L to 30L).map(i =>
      (i, s"g${i % 3}", i.toDouble))))
    MatView.create(spark, src, mv, Seq("grp"), Seq("amt"), Seq("amt"))
    def recomputeMm(): Seq[String] =
      spark.read.format("lance").load(src).groupBy("grp")
        .agg(count(lit(1)).as("cnt"),
          coalesce(sum(col("amt").cast("decimal(38,6)")),
            lit(BigDecimal(0)).cast("decimal(38,6)")).as("sum_amt"),
          count(col("amt")).as("cntnn_amt"),
          min("amt").as("min_amt"), max("amt").as("max_amt"))
        .orderBy("grp").collect().map(_.mkString("|")).toSeq
    def mvRows(): Seq[String] = MatView.read(spark, mv)
      .orderBy("grp").collect().map(_.mkString("|")).toSeq
    assert(mvRows() == recomputeMm())
    // insert-only path: new max in g1, brand-new group g7
    srcRows(Seq((100L, "g1", 999.0), (101L, "g7", -5.0)))
      .write.format("lance").mode("append").save(src)
    MatView.refresh(spark, mv)
    assert(mvRows() == recomputeMm())
    // delete the maximum of g1 → group must recompute, not keep 999
    LanceMaintenance.deleteWhere(spark, src, "amt = 999.0")
    MatView.refresh(spark, mv)
    assert(mvRows() == recomputeMm())
    assert(MatView.read(spark, mv).filter($"grp" === "g1")
      .select("max_amt").as[Double].head() < 999.0)
    // delete an entire group → dropped
    LanceMaintenance.deleteWhere(spark, src, "grp = 'g7'")
    MatView.refresh(spark, mv)
    assert(mvRows() == recomputeMm())
    assert(!MatView.read(spark, mv).select("grp").as[String]
      .collect().contains("g7"))
  }

  test("joined (star-rollup) view: delta maintenance through a broadcast dim") {
    val dir = tmp("mv_join")
    val src = s"$dir/fact.lance"; val dimP = s"$dir/dim.lance"
    val mv = s"$dir/mv.lance"
    writeSrc(src, (1L to 40L).map(i => (i, s"c${i % 8}", i * 0.5)).toSeq
      .toDF("id", "ck", "amt"))
    (0 until 8).map(i => (s"c$i", s"seg${i % 3}")).toDF("dk", "seg")
      .write.format("lance").mode("overwrite").save(dimP)
    MatView.create(spark, src, mv, Seq("seg"), Seq("amt"),
      dims = Seq((dimP, "ck", "dk")))
    def recomputeJ(): Seq[String] = {
      val f = spark.read.format("lance").load(src)
      val d = spark.read.format("lance").load(dimP)
      f.join(d, f("ck") === d("dk")).groupBy("seg")
        .agg(count(lit(1)).as("cnt"),
          coalesce(sum(col("amt").cast("decimal(38,6)")),
            lit(BigDecimal(0)).cast("decimal(38,6)")).as("sum_amt"),
          count(col("amt")).as("cntnn_amt"))
        .orderBy("seg").collect().map(_.mkString("|")).toSeq
    }
    def mvRows(): Seq[String] = MatView.read(spark, mv)
      .orderBy("seg").collect().map(_.mkString("|")).toSeq
    assert(mvRows() == recomputeJ())
    // churn the fact: delete + append (incl. a key with no dim match —
    // contributes nothing, identically on both paths)
    LanceMaintenance.deleteWhere(spark, src, "id % 5 = 0")
    Seq((100L, "c1", 9.0), (101L, "zz", 1.0)).toDF("id", "ck", "amt")
      .write.format("lance").mode("append").save(src)
    MatView.refresh(spark, mv)
    assert(mvRows() == recomputeJ())
    // dim advance → refresh refuses
    Seq(("c9", "seg0")).toDF("dk", "seg")
      .write.format("lance").mode("append").save(dimP)
    Seq((102L, "c2", 3.0)).toDF("id", "ck", "amt")
      .write.format("lance").mode("append").save(src)
    val e = intercept[IllegalArgumentException] {
      MatView.refresh(spark, mv)
    }
    assert(e.getMessage.contains("dimension"))
  }

  test("snowflake view: two chained dims, the second joins a column the first contributed") {
    val dir = tmp("mv_snow")
    val src = s"$dir/fact.lance"
    val d1 = s"$dir/city.lance"; val d2 = s"$dir/country.lance"
    val mv = s"$dir/mv.lance"
    writeSrc(src, (1L to 24L).map(i => (i, s"city${i % 4}", i * 1.0)).toSeq
      .toDF("id", "ck", "amt"))
    (0 until 4).map(i => (s"city$i", s"cc${i % 2}")).toDF("city", "ccode")
      .write.format("lance").mode("overwrite").save(d1)
    (0 until 2).map(i => (s"cc$i", s"Country $i")).toDF("code", "cname")
      .write.format("lance").mode("overwrite").save(d2)
    MatView.create(spark, src, mv, Seq("cname"), Seq("amt"),
      dims = Seq((d1, "ck", "city"), (d2, "ccode", "code")))
    def recomputeS(): Seq[String] = {
      val f = spark.read.format("lance").load(src)
      val c1 = spark.read.format("lance").load(d1)
      val c2 = spark.read.format("lance").load(d2)
      f.join(c1, f("ck") === c1("city")).join(c2, col("ccode") === c2("code"))
        .groupBy("cname")
        .agg(count(lit(1)).as("cnt"),
          coalesce(sum(col("amt").cast("decimal(38,6)")),
            lit(BigDecimal(0)).cast("decimal(38,6)")).as("sum_amt"),
          count(col("amt")).as("cntnn_amt"))
        .orderBy("cname").collect().map(_.mkString("|")).toSeq
    }
    def mvRows(): Seq[String] = MatView.read(spark, mv)
      .orderBy("cname").collect().map(_.mkString("|")).toSeq
    assert(mvRows() == recomputeS())
    LanceMaintenance.deleteWhere(spark, src, "id % 3 = 0")
    Seq((50L, "city2", 4.5)).toDF("id", "ck", "amt")
      .write.format("lance").mode("append").save(src)
    MatView.refresh(spark, mv)
    assert(mvRows() == recomputeS())
  }

  test("NULL group keys are refused at create") {
    val dir = tmp("mv_nullkey")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    Seq((1L, Some("a"), 1.0), (2L, None, 2.0)).toDF("id", "grp", "amt")
      .write.format("lance").option("stableRowIds", "true")
      .mode("overwrite").save(src)
    val e = intercept[IllegalArgumentException] {
      MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    }
    assert(e.getMessage.contains("NULL group key"))
  }

  test("view modified outside MatView is refused at refresh") {
    val dir = tmp("mv_tamper")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows(Seq((1L, "a", 1.0))))
    MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    // an out-of-band append bumps the view's version past its metadata
    MatView.read(spark, mv).limit(1).write.format("lance")
      .mode("append").save(mv)
    val e = intercept[IllegalArgumentException] {
      MatView.refresh(spark, mv)
    }
    assert(e.getMessage.contains("no metadata for head version"))
  }

  test("source without stable row ids is refused at create") {
    val dir = tmp("mv_nostable")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    srcRows(Seq((1L, "a", 1.0))).write.format("lance")
      .mode("overwrite").save(src)
    val e = intercept[IllegalArgumentException] {
      MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    }
    assert(e.getMessage.contains("stable row ids"))
  }

  test("pre-cntnn stored layout is refused with a clear format message") {
    val dir = tmp("mv_fmt")
    val src = s"$dir/src.lance"; val mv = s"$dir/mv.lance"
    writeSrc(src, srcRows(Seq((1L, "a", 1.0), (2L, "b", 2.0))))
    MatView.create(spark, src, mv, Seq("grp"), Seq("amt"))
    // forge the pre-cntnn on-disk layout: rewrite the view table without
    // the cntnn_amt column and carry the spec props to the new head
    val old = MatView.read(spark, mv).drop("cntnn_amt").collect()
    val oldSchema = MatView.read(spark, mv).drop("cntnn_amt").schema
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(mv, conf)
    val headBefore = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
    spark.createDataFrame(java.util.Arrays.asList(old: _*), oldSchema)
      .write.format("lance").mode("overwrite").save(mv)
    val headAfter = LanceFormat.readManifest(fs,
      LanceFormat.latestManifestPath(fs, p, None)).version
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(p, s"_matview/$headBefore.props"), fs,
      new org.apache.hadoop.fs.Path(p, s"_matview/$headAfter.props"),
      false, conf)
    srcRows(Seq((3L, "c", 3.0))).write.format("lance").mode("append").save(src)
    val e = intercept[IllegalArgumentException] { MatView.refresh(spark, mv) }
    assert(e.getMessage.contains("view format changed") ||
      e.getMessage.contains("cntnn"), e.getMessage)
    assert(e.getMessage.contains("re-create"))
  }

  test("quiet-path refresh is bit-identical to main-session refresh (both delta sizes, both sides of the min/max boundary)") {
    // two identical source/view pairs; one refreshes through the auto
    // (quiet sibling) path, the other pinned to the caller's session via
    // graft.matview.quiet=off — results must match bit-for-bit
    def runPair(minMax: Seq[String], bigDelta: Boolean): Unit = {
      val dir = tmp(s"mv_quiet_${minMax.nonEmpty}_$bigDelta")
      val rows = (1L to 60L).map(i => (i, s"g${i % 7}", i * 0.5 + 0.001))
      val churnDel = "id % 3 = 0"
      val churnAdd = srcRows((200L to (if (bigDelta) 260L else 206L)).map(i =>
        (i, s"g${i % 9}", i * 1.5)))
      val made = Seq("a", "b").map { side =>
        val src = s"$dir/src_$side.lance"; val mv = s"$dir/mv_$side.lance"
        writeSrc(src, srcRows(rows))
        MatView.create(spark, src, mv, Seq("grp"), Seq("amt"), minMax)
        LanceMaintenance.deleteWhere(spark, src, churnDel)
        churnAdd.write.format("lance").mode("append").save(src)
        mv
      }
      spark.conf.set("graft.matview.quiet", "auto")
      MatView.refresh(spark, made.head)
      spark.conf.set("graft.matview.quiet", "off")
      try MatView.refresh(spark, made(1))
      finally spark.conf.unset("graft.matview.quiet")
      val (qa, qb) = (MatView.read(spark, made.head), MatView.read(spark, made(1)))
      assert(qa.schema == qb.schema)
      assert(sortedAny(qa) == sortedAny(qb))
    }
    runPair(Nil, bigDelta = false)  // quiet path vs main
    runPair(Nil, bigDelta = true)
    runPair(Seq("amt"), bigDelta = false) // min/max: auto == main by design
  }

  private def sortedAny(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect().map(_.mkString("|")).toSeq
}
