package graft

import org.apache.spark.sql.functions._

import graft.queries.Profiling

/** Bounds the approx scale-twins in Profiling against their exact
  * verification forms, and pins the scale property itself: neither twin
  * may contain a window operator (the exact forms' global ntile /
  * per-group percentile buffer is exactly what these replace).
  */
class ProfilingApproxSpec extends SparkSpec {

  test("q_hist_equidepth_approx: balanced depths, exact total, ordered bounds") {
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val rows = Profiling.qHistEquidepthApprox(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // sketch rank error at accuracy=10000 is ≤ total/10000 rows per
    // bound; allow 5% relative skew per bucket (realized skew is far
    // smaller at this SF)
    val target = total.toDouble / 10
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      assert(math.abs(n - target) / target <= 0.05,
        s"bucket ${r.getAs[Long]("bucket")} depth $n vs target $target")
    }
    // bucket value ranges must be disjoint and increasing
    rows.sortBy(_.getAs[Long]("bucket")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
  }

  test("q_hist_equidepth_approx: no window operator in the plan") {
    val plan = Profiling.qHistEquidepthApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"single-task window survived:\n$plan")
  }

  test("q_winsorize_approx: bounds and trimmed sum track the exact twin") {
    val exact = Profiling.qWinsorize(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val approx = Profiling.qWinsorizeApprox(spark, sf).collect()
    assert(approx.map(_.getAs[String]("l_returnflag")).toSet == exact.keySet)
    approx.foreach { a =>
      val e = exact(a.getAs[String]("l_returnflag"))
      assert(a.getAs[Long]("n") == e.getAs[Long]("n"))
      // approx bounds move only rows within the sketch's rank error of
      // the cut points: the trimmed sum may differ by a sliver
      val es = e.getAs[Double]("trimmed_sum")
      val as = a.getAs[Double]("trimmed_sum")
      assert(math.abs(as - es) / es <= 0.01,
        s"${a.getAs[String]("l_returnflag")}: trimmed_sum $as vs exact $es")
      // each side's clip count stays within 1% of the population
      val n = a.getAs[Long]("n").toDouble
      assert(math.abs(a.getAs[Long]("n_below") - e.getAs[Long]("n_below")) <= n * 0.01)
      assert(math.abs(a.getAs[Long]("n_above") - e.getAs[Long]("n_above")) <= n * 0.01)
    }
  }

  test("q_winsorize_approx: no per-group percentile buffer in the plan") {
    val plan = Profiling.qWinsorizeApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!"(?<!approx_)percentile\\(".r.findFirstIn(plan).isDefined,
      s"exact percentile survived:\n$plan")
    assert(plan.contains("approx_percentile"))
  }
}
