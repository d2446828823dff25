package graft.sources.lance

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based randomized testing of the table surface: a random sequence
  * of append / deleteWhere / updateWhere / mergeInsert / addColumn /
  * renameColumn / dropColumn / compact is applied BOTH to a lance dataset
  * and to an in-memory reference model; after every op the full dataset
  * contents must equal the model. This is where interaction bugs live
  * (evolution over deletion vectors, merges after renames, appends after
  * drops) — single-feature specs can't reach those orderings.
  */
class LanceModelSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def tmpDs(): String = {
    val f = java.nio.file.Files.createTempDirectory("lance_model").toFile
    f.delete()
    f.getAbsolutePath + "/ds.lance"
  }

  /** The reference model: ordered columns + rows as column-name maps. */
  private final class Model {
    var cols: Vector[(String, DataType)] =
      Vector("id" -> LongType, "v" -> DoubleType, "tag" -> StringType)
    val rows = mutable.ArrayBuffer.empty[mutable.Map[String, Any]]
    private var nextColId = 0

    def freshColName(): String = { nextColId += 1; s"c$nextColId" }

    def toDf: DataFrame = {
      val schema = StructType(cols.map { case (n, t) => StructField(n, t) })
      val data = rows.map(r => Row.fromSeq(cols.map(c => r.getOrElse(c._1, null)))).toSeq
      spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
    }
  }

  private def canon(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING) AS `$c`"): _*)
      .collect()
      .map(r => (0 until r.length).map(i => if (r.isNullAt(i)) "\\N" else r.getString(i)).mkString("|"))
      .sorted.toSeq

  private def check(ds: String, m: Model, step: String): Unit = try {
    doCheck(ds, m, step)
  } catch {
    case e: Throwable =>
      throw new AssertionError(s"[$step] cols=${m.cols.map(_._1)}: ${e.getMessage}", e)
  }

  private def doCheck(ds: String, m: Model, step: String): Unit = {
    val back = spark.read.format("lance").load(ds)
    assert(back.schema.fieldNames.toSeq == m.cols.map(_._1),
      s"[$step] schema ${back.schema.fieldNames.toSeq} != ${m.cols.map(_._1)}")
    val names = m.cols.map(_._1)
    val got = canon(back, names)
    val want = canon(m.toDf, names)
    assert(got.length == want.length,
      s"[$step] ${got.length} rows, expected ${want.length}")
    assert(got == want, {
      val missing = want.diff(got).take(3)
      val extra = got.diff(want).take(3)
      s"[$step] content mismatch; missing=$missing extra=$extra"
    })
  }

  private def runSequence(seed: Long, nOps: Int,
                          stable: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val ds = tmpDs()
    val m = new Model
    var nextId = 0L

    def freshRows(n: Int): Seq[mutable.Map[String, Any]] = (0 until n).map { _ =>
      val r = mutable.Map[String, Any]("id" -> nextId)
      m.cols.foreach {
        case ("id", _) => ()
        case (c, DoubleType) => r(c) = nextId * 1.5 + c.length
        case (c, LongType) => r(c) = nextId * 7 + c.length
        case (c, StringType) => r(c) = s"${c}_${nextId % 4}"
        case (c, t) => throw new IllegalStateException(s"$c: $t")
      }
      nextId += 1
      r
    }

    def dfOf(rws: Seq[mutable.Map[String, Any]]): DataFrame = {
      val schema = StructType(m.cols.map { case (n, t) => StructField(n, t) })
      spark.createDataFrame(
        spark.sparkContext.parallelize(rws.map(r =>
          Row.fromSeq(m.cols.map(c => r.getOrElse(c._1, null)))), 2), schema)
    }

    // seed the dataset
    val first = freshRows(30)
    m.rows ++= first
    dfOf(first).write.format("lance").mode("append")
      .option("stableRowIds", stable.toString).save(ds)
    check(ds, m, "seed")

    // stable mode: the (logical id -> _rowid) mapping, asserted after
    // every op — untouched rows must keep their id, all ids stay unique
    def rowIdMap(): Map[Long, Long] =
      if (!stable) Map.empty
      else spark.read.format("lance").load(ds).select("id", "_rowid")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ridSnapshots = mutable.Map.empty[Long, Map[Long, Long]]
    def checkStable(before: Map[Long, Long], touched: Set[Long],
                    label: String): Map[Long, Long] = {
      val after = rowIdMap()
      if (stable) {
        assert(after.values.toSet.size == after.size,
          s"[$label] duplicate _rowid values")
        val common = (before.keySet & after.keySet) -- touched
        val moved = common.filter(id => before(id) != after(id))
        assert(moved.isEmpty,
          s"[$label] untouched rows changed _rowid: ${moved.take(5)}")
        // rewritten rows are re-inserts: they must take FRESH ids, never
        // one that was live before the op
        val preIds = before.values.toSet
        touched.foreach { id =>
          after.get(id).foreach(rid => assert(!preIds.contains(rid),
            s"[$label] rewritten row $id reused live _rowid $rid"))
        }
      }
      after
    }

    // version-keyed model snapshots back the restore op: restoring to a
    // committed version must roll the model to what it held right after
    // the op that committed it
    val snapshots = mutable.Map.empty[Long, (Vector[(String, DataType)],
                                             Seq[Map[String, Any]])]
    def headVersion(): Long = {
      val conf = spark.sessionState.newHadoopConf()
      val (fs, p) = LanceFormat.fileSystem(ds, conf)
      LanceFormat.readManifest(fs,
        LanceFormat.latestManifestPath(fs, p, None)).version
    }
    def snap(): Unit = {
      val v = headVersion()
      snapshots(v) = (m.cols, m.rows.map(_.toMap).toSeq)
      if (stable) ridSnapshots(v) = rowIdMap()
    }
    snap()

    (1 to nOps).foreach { step =>
      val op = rnd.nextInt(10)
      val label = s"seed=$seed step=$step op=$op"
      val ridsBefore = rowIdMap()
      var touched = Set.empty[Long]
      var restoredTo = -1L
      op match {
        case 0 => // append
          val rws = freshRows(5 + rnd.nextInt(10))
          m.rows ++= rws
          dfOf(rws).write.format("lance").mode("append").save(ds)
        case 1 => // deleteWhere on an id residue
          val k = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(k)
          LanceMaintenance.deleteWhere(spark, ds, s"id % $k = $r")
          val dead = m.rows.filter(x => x("id").asInstanceOf[Long] % k == r)
          dead.foreach(m.rows -= _)
        case 2 => // updateWhere bumping a double column (if one exists)
          m.cols.find(_._2 == DoubleType) match {
            case Some((c, _)) =>
              val k = 2 + rnd.nextInt(4)
              LanceMaintenance.updateWhere(spark, ds, s"id % $k = 0",
                Map(c -> s"`$c` + 1000"))
              touched = m.rows.map(_("id").asInstanceOf[Long])
                .filter(_ % k == 0).toSet
              m.rows.foreach { x =>
                if (x("id").asInstanceOf[Long] % k == 0)
                  x(c) = (x.getOrElse(c, null) match {
                    case null => null
                    case d: Double => d + 1000
                  })
              }
            case None => ()
          }
        case 3 => // mergeInsert: update half the recent rows + insert new
          val updates = m.rows.takeRight(6).map(_.clone())
          m.cols.find(_._2 == StringType).foreach { case (c, _) =>
            updates.foreach(u => u(c) = "merged")
          }
          val inserts = freshRows(4)
          if (updates.nonEmpty || inserts.nonEmpty) {
            LanceMaintenance.mergeInsert(spark, ds,
              dfOf(updates.toSeq ++ inserts), Seq("id"))
            val updIds = updates.map(_("id")).toSet
            touched = updIds.map(_.asInstanceOf[Long])
            val replaced = m.rows.filter(r => updIds.contains(r("id")))
            replaced.foreach(m.rows -= _)
            m.rows ++= updates
            m.rows ++= inserts
          }
        case 4 => // addColumn (nulls for existing rows)
          val c = m.freshColName()
          val t = if (rnd.nextBoolean()) DoubleType else StringType
          LanceMaintenance.addColumn(spark, ds, c, t)
          m.cols = m.cols :+ (c -> t)
        case 5 => // renameColumn (never id)
          val candidates = m.cols.filter(_._1 != "id")
          if (candidates.nonEmpty) {
            val (old, t) = candidates(rnd.nextInt(candidates.length))
            val nu = m.freshColName()
            LanceMaintenance.renameColumn(spark, ds, old, nu)
            m.cols = m.cols.map { case (n, ty) => if (n == old) (nu, ty) else (n, ty) }
            m.rows.foreach { r => if (r.contains(old)) { r(nu) = r(old); r -= old } }
            val _ = t
          }
        case 6 => // dropColumn (never id; keep at least 2 columns)
          val candidates = m.cols.filter(_._1 != "id")
          if (candidates.length >= 2) {
            val (c, _) = candidates(rnd.nextInt(candidates.length))
            LanceMaintenance.dropColumn(spark, ds, c)
            m.cols = m.cols.filterNot(_._1 == c)
            m.rows.foreach(_ -= c)
          }
        case 7 => // compact (materializes deletes, rewrites layout)
          LanceMaintenance.compact(spark, ds, targetFragments = 1 + rnd.nextInt(3))
        case 8 => // restore to a random earlier version
          val vs = snapshots.keys.toSeq.sorted
          val v = vs(rnd.nextInt(vs.length))
          LanceMaintenance.restore(spark, ds, v)
          val (c, r) = snapshots(v)
          m.cols = c
          m.rows.clear()
          m.rows ++= r.map(x => mutable.Map(x.toSeq: _*))
          restoredTo = v
        case 9 => // mergeColumns: keyed right frame covering an id residue
          val k = 2 + rnd.nextInt(3)
          val ids = m.rows.map(_("id").asInstanceOf[Long])
            .filter(_ % k == 0).distinct.toSeq
          if (ids.nonEmpty) {
            val c = m.freshColName()
            val right = spark.createDataFrame(
              spark.sparkContext.parallelize(
                ids.map(i => Row(i, i * 11.0 + 5)), 2),
              StructType(Seq(StructField("rid", LongType),
                             StructField(c, DoubleType))))
            LanceMaintenance.mergeColumns(spark, ds, right, "id", "rid")
            m.cols = m.cols :+ (c -> DoubleType)
            m.rows.foreach { r =>
              val i = r("id").asInstanceOf[Long]
              if (i % k == 0) r(c) = i * 11.0 + 5
            }
          }
      }
      if (stable) {
        if (restoredTo >= 0) {
          // restore must bring back EXACTLY that version's id assignment
          val expect = ridSnapshots(restoredTo)
          val got = rowIdMap()
          assert(got == expect,
            s"[$label] restore to v$restoredTo: id map diverged " +
              s"(missing=${(expect.keySet -- got.keySet).take(3)}, " +
              s"extra=${(got.keySet -- expect.keySet).take(3)})")
        } else checkStable(ridsBefore, touched, label)
      }
      snap()
      check(ds, m, label)
    }
  }

  test("random op sequences match the reference model (3 seeds x 12 ops)") {
    Seq(101L, 202L, 303L).foreach(runSequence(_, 12))
  }

  test("stable-row-id mode: ids persist through the same op soup (2 seeds x 12 ops)") {
    Seq(404L, 505L).foreach(runSequence(_, 12, stable = true))
  }

  /** Nested-evolution fuzz: a struct column whose LEAVES evolve (add /
    * rename / drop sub-fields) interleaved with appends, deletes, merges,
    * and compaction. The model stores leaves flat under dotted keys; the
    * dataset stores them as a real struct — the comparison flattens both.
    */
  private def runNestedSequence(seed: Long, nOps: Int): Unit = {
    val rnd = new Random(seed)
    val ds = tmpDs()
    var leaves: Vector[(String, DataType)] =
      Vector("a" -> DoubleType, "b" -> StringType)
    val rows = mutable.ArrayBuffer.empty[mutable.Map[String, Any]]
    var nextId = 0L
    var nextLeaf = 0

    def freshRows(n: Int): Seq[mutable.Map[String, Any]] = (0 until n).map { _ =>
      val r = mutable.Map[String, Any]("id" -> nextId)
      leaves.foreach {
        case (c, DoubleType) => r(s"meta.$c") = nextId * 1.5 + c.length
        case (c, StringType) => r(s"meta.$c") = s"${c}_${nextId % 4}"
        case (c, t) => throw new IllegalStateException(s"$c: $t")
      }
      nextId += 1
      r
    }

    def dfOf(rws: Seq[mutable.Map[String, Any]]): DataFrame = {
      val flat = StructType(StructField("id", LongType) +:
        leaves.map { case (n, t) => StructField(s"f_$n", t) })
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rws.map(r => Row.fromSeq(
          r("id") +: leaves.map(c => r.getOrElse(s"meta.${c._1}", null)))), 2), flat)
      df.selectExpr("id",
        s"named_struct(${leaves.map(c => s"'${c._1}', `f_${c._1}`").mkString(", ")}) AS meta")
    }

    def checkNested(step: String): Unit = {
      val names = "id" +: leaves.map(c => s"meta.${c._1}")
      val back = spark.read.format("lance").load(ds)
      assert(back.schema("meta").dataType.asInstanceOf[StructType]
        .fieldNames.toSeq == leaves.map(_._1), s"[$step] struct fields")
      def flatCanon(df: DataFrame): Seq[String] =
        df.selectExpr(names.map(c => s"CAST($c AS STRING)"): _*)
          .collect()
          .map(r => (0 until r.length).map(i =>
            if (r.isNullAt(i)) "\\N" else r.getString(i)).mkString("|"))
          .sorted.toSeq
      val got = flatCanon(back)
      val want = flatCanon(dfOf(rows.toSeq))
      assert(got == want, s"[$step] mismatch; missing=${want.diff(got).take(3)} " +
        s"extra=${got.diff(want).take(3)}")
    }

    val first = freshRows(25)
    rows ++= first
    dfOf(first).write.format("lance").mode("append").save(ds)
    checkNested("seed")

    (1 to nOps).foreach { step =>
      val op = rnd.nextInt(6)
      val label = s"nested seed=$seed step=$step op=$op"
      op match {
        case 0 => // append with the current leaf set
          val rws = freshRows(4 + rnd.nextInt(8))
          rows ++= rws
          dfOf(rws).write.format("lance").mode("append").save(ds)
        case 1 => // delete
          val k = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(k)
          LanceMaintenance.deleteWhere(spark, ds, s"id % $k = $r")
          rows.filter(x => x("id").asInstanceOf[Long] % k == r)
            .foreach(rows -= _)
        case 2 => // add a struct sub-field (null for existing rows)
          nextLeaf += 1
          val c = s"n$nextLeaf"
          val t = if (rnd.nextBoolean()) DoubleType else StringType
          LanceMaintenance.addColumn(spark, ds, s"meta.$c", t)
          leaves = leaves :+ (c -> t)
        case 3 => // rename a sub-field
          val (old, _) = leaves(rnd.nextInt(leaves.length))
          nextLeaf += 1
          val nu = s"n$nextLeaf"
          LanceMaintenance.renameColumn(spark, ds, s"meta.$old", nu)
          leaves = leaves.map { case (n, ty) => if (n == old) (nu, ty) else (n, ty) }
          rows.foreach { r =>
            if (r.contains(s"meta.$old")) { r(s"meta.$nu") = r(s"meta.$old"); r -= s"meta.$old" }
          }
        case 4 => // drop a sub-field (keep at least one)
          if (leaves.length >= 2) {
            val (c, _) = leaves(rnd.nextInt(leaves.length))
            LanceMaintenance.dropColumn(spark, ds, s"meta.$c")
            leaves = leaves.filterNot(_._1 == c)
            rows.foreach(_ -= s"meta.$c")
          }
        case 5 => // compact
          LanceMaintenance.compact(spark, ds, targetFragments = 1 + rnd.nextInt(2))
      }
      checkNested(label)
    }
  }

  test("nested-evolution op sequences match the model (2 seeds x 10 ops)") {
    Seq(404L, 505L).foreach(runNestedSequence(_, 10))
  }
}
