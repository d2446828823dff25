package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query executes and returns rows at sf0.001; spot checks
  * pin known-correct values. Full value-level oracle checking is done by
  * scripts/selfcheck.py against DuckDB (see .claude/skills/verify). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  SparkEntry.allDefs.foreach { d =>
    test(s"${d.name} runs and returns rows") {
      val out = d.fn(spark, dir)
      assert(out.count() > 0, s"${d.name} returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("native stats aggs agree with the exact-decimal oracle twins") {
    def byFlag(name: String, cols: Seq[String]): Map[String, Seq[Double]] =
      SparkEntry.queries(name)(spark, dir).collect().map { r =>
        r.getString(0) -> cols.map(c => r.getAs[Any](c) match {
          case d: java.lang.Double => d.doubleValue()
          case n: Number => n.doubleValue()
        })
      }.toMap
    val exact = byFlag("q22_stats_agg", Seq("stddev_qty", "varpop_qty", "corr_qty_price"))
    val native = byFlag("q22p_stats_native", Seq("stddev_qty", "varpop_qty", "corr_qty_price"))
    assert(exact.keySet == native.keySet)
    exact.foreach { case (k, e) =>
      e.zip(native(k)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(a)),
          s"q22p diverges on $k: $a vs $b")
      }
    }
    val exactM = byFlag("q22c_higher_moments", Seq("skew_qty", "kurt_qty"))
    val nativeM = byFlag("q22cp_moments_native", Seq("skew_qty", "kurt_qty"))
    exactM.foreach { case (k, e) =>
      e.zip(nativeM(k)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-5 * math.max(1.0, math.abs(a)),
          s"q22cp diverges on $k: $a vs $b")
      }
    }
  }

  test("d18 boilerplate fractions are consistent") {
    val rows = SparkEntry.queries("d18_boilerplate_ngrams")(spark, dir).collect()
    rows.foreach { r =>
      val nGrams = r.getAs[Long]("n_grams")
      val nCommon = r.getAs[Long]("n_common")
      val frac = r.getAs[Double]("boilerplate_frac")
      val keep = r.getAs[Boolean]("keep")
      assert(nCommon <= nGrams, s"doc ${r.get(0)}: common > distinct grams")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(keep == (frac <= 0.5))
    }
    // the synthetic corpus is near-dup dense at every sf: the census must
    // actually find shared grams somewhere, or the query degenerated
    assert(rows.exists(_.getAs[Long]("n_common") > 0), "no common grams found")
  }

  test("d19 LM buckets are threshold-consistent and reward the reference slice") {
    val rows = SparkEntry.queries("d19_lm_quality")(spark, dir).collect()
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      val b = r.getAs[String]("quality_bucket")
      assert(nll > 0.0)
      assert(b == (if (nll <= 3.40) "head" else if (nll <= 3.43) "middle" else "tail"))
    }
    // every in-vocabulary token scores below the OOV floor ln(N+V)
    assert(rows.forall(_.getAs[Double]("avg_nll") <= math.log(1e9)))
  }

  test("q37 recursive cte computes fibonacci") {
    val rows = SparkEntry.queries("q37_recursive_cte")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.take(6).toSeq == Seq(1 -> 1L, 2 -> 1L, 3 -> 2L, 4 -> 3L, 5 -> 5L, 6 -> 8L))
    assert(rows.length == 30)
  }

  test("q19 cross join has |region| x |nation| rows") {
    assert(SparkEntry.queries("q19_cross_join")(spark, dir).count() == 125)
  }

  test("q40 topk is sorted descending") {
    val prices = SparkEntry.queries("q40_topk")(spark, dir)
      .collect().map(_.getDouble(1))
    assert(prices.length == 15 && prices.sameElements(prices.sorted.reverse))
  }
}
