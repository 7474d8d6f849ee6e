package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Repair

class RepairSpec extends AnyFunSuite {
  private val NaN = Double.NaN

  // ---------------------------------------------------------------------
  // Reference-published fixtures: every expected value below is copied
  // verbatim from the reference's own slt output
  // (query_server/sqllogicaltests/cases/function/data_repair.slt), so
  // these specs assert graft against cnosdb's printed numbers, not
  // against values graft computed for itself.
  // ---------------------------------------------------------------------

  // data_repair.slt:193 v_fill_repair — 15 samples at t = 2,3,4,6,8,10,
  // 14,15,16,18,20,22,26,28,30 ns with NaN (acos(3)) at t = 2,14,20,22.
  private val sltTimes = Array[Long](2, 3, 4, 6, 8, 10, 14, 15, 16, 18, 20, 22, 26, 28, 30)
  private val sltValues = Array[Double](NaN, 101.0, 102.0, 104.0, 126.0, 108.0, NaN,
    113.0, 114.0, 116.0, NaN, NaN, 124.0, 126.0, 128.0)

  private def assertSeries(got: Array[Double], want: Seq[Double], tol: Double = 1e-9): Unit = {
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      if (w.isNaN) assert(g.isNaN, s"idx $i: expected NaN, got $g")
      else assert(math.abs(g - w) < tol, s"idx $i: expected $w, got $g")
    }
  }

  test("value_fill linear matches data_repair.slt:253-269 (and the default, :196-212)") {
    assertSeries(Repair.fillSeries(sltValues, "linear"), Seq(
      101.0, 101.0, 102.0, 104.0, 126.0, 108.0, 110.5, 113.0, 114.0, 116.0,
      118.66666666666667, 121.33333333333333, 124.0, 126.0, 128.0))
  }

  test("value_fill mean matches data_repair.slt:215-231") {
    assertSeries(Repair.fillSeries(sltValues, "mean"), Seq(
      114.72727272727273, 101.0, 102.0, 104.0, 126.0, 108.0, 114.72727272727273,
      113.0, 114.0, 116.0, 114.72727272727273, 114.72727272727273, 124.0, 126.0, 128.0))
  }

  test("value_fill previous matches data_repair.slt:234-250") {
    assertSeries(Repair.fillSeries(sltValues, "previous"), Seq(
      NaN, 101.0, 102.0, 104.0, 126.0, 108.0, 108.0, 113.0, 114.0, 116.0,
      116.0, 116.0, 124.0, 126.0, 128.0))
  }

  test("value_fill AR matches data_repair.slt:272-288") {
    assertSeries(Repair.fillSeries(sltValues, "ar"), Seq(
      114.72727272727273, 101.0, 102.0, 104.0, 126.0, 108.0, 110.81413693465396,
      113.0, 114.0, 116.0, 117.33359859078759, 118.42039170045177, 124.0, 126.0, 128.0))
  }

  test("value_fill MA matches data_repair.slt:291-307") {
    assertSeries(Repair.fillSeries(sltValues, "ma"), Seq(
      102.33333333333333, 101.0, 102.0, 104.0, 126.0, 108.0, 108.2,
      113.0, 114.0, 116.0, 110.5, 110.5, 124.0, 126.0, 128.0))
  }

  test("value_fill rejects an unknown method like data_repair.slt:309-310") {
    intercept[IllegalArgumentException] { Repair.fillSeries(sltValues, "nan") }
  }

  test("value_repair SCREEN matches data_repair.slt:322-338 (default, =screen, =lsgreedy)") {
    // The reference prints the same fully-repaired line v = t + 98 for
    // value_repair with no args, method=screen and method=lsgreedy
    // (slt:322,341,360 — e.g. t=2 → 100.0, t=30 → 128.0): the spike at
    // t=8 and all NaNs land back on the unit-speed line.
    assertSeries(Repair.screen(sltTimes, sltValues),
      sltTimes.map(t => 98.0 + t).toSeq)
  }

  test("timestamp_repair matches data_repair.slt:11-23 (11-slot grid, trailing NaN)") {
    // ts_repair fixture: samples at 0,10,19,30,40,50,61,71,81,91 s
    // (ms precision), values 1..10. The reference prints an 11-slot
    // 10 s grid 00:00:00..00:01:40 with values 1..10 and NaN at the
    // final inserted slot.
    val tsMs = Array[Long](0, 10000, 19000, 30000, 40000, 50000, 61000, 71000, 81000, 91000)
    val vs = Array.tabulate(10)(i => (i + 1).toDouble)
    val (t2, v2) = Repair.timestampRepair(tsMs, vs)
    assert(t2.toSeq == (0 to 10).map(_ * 10000L))
    assertSeries(v2, (1 to 10).map(_.toDouble) :+ NaN)
    // interval=10000 given explicitly prints the same table (slt:88-101)
    val (t3, v3) = Repair.timestampRepair(tsMs, vs, intervalOpt = Some(10000L))
    assert(t3.sameElements(t2) && v3.zip(v2).forall { case (a, b) => a.isNaN == b.isNaN && (a.isNaN || a == b) })
  }

  test("timestamp_repair on the value<8 prefix matches data_repair.slt:172-183") {
    val tsMs = Array[Long](0, 10000, 19000, 30000, 40000, 50000, 61000)
    val vs = Array.tabulate(7)(i => (i + 1).toDouble)
    val (t2, v2) = Repair.timestampRepair(tsMs, vs)
    assert(t2.toSeq == (0 to 7).map(_ * 10000L))
    assertSeries(v2, (1 to 7).map(_.toDouble) :+ NaN)
  }

  test("fillSeries linear interpolates and clamps edges") {
    val got = Repair.fillSeries(Array(NaN, 2.0, NaN, NaN, 8.0, NaN), "linear")
    assert(got.toSeq == Seq(2.0, 2.0, 4.0, 6.0, 8.0, 8.0))
  }

  test("fillSeries mean uses mean of finite values") {
    val got = Repair.fillSeries(Array(1.0, NaN, 3.0), "mean")
    assert(got.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("fillSeries previous carries forward") {
    val got = Repair.fillSeries(Array(NaN, 1.0, NaN, 5.0, NaN), "previous")
    assert(got(0).isNaN && got.drop(1).toSeq == Seq(1.0, 1.0, 5.0, 5.0))
  }

  test("screen keeps in-band series unchanged") {
    val ts = Array(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val vs = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val got = Repair.screen(ts, vs)
    assert(got.zip(vs).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("screen clamps a spike toward the speed band") {
    val ts = Array(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    val vs = Array(1.0, 2.0, 3.0, 100.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0)
    val got = Repair.screen(ts, vs)
    assert(math.abs(got(3) - 4.0) < 1.0, s"spike should be repaired, got ${got(3)}")
  }

  test("fillSeries ar matches the reference AR(1) fit hand-computed") {
    // series [1, NaN, 3, 4]: acf=12, factor=10 → theta=1.2;
    // eps over (3,4): 4 − 1.2·3 = 0.4; fill: 1.2·1 + 0.4 = 1.6
    val out = Repair.fillSeries(Array(1.0, Double.NaN, 3.0, 4.0), "ar")
    assert(out(0) == 1.0 && out(2) == 3.0 && out(3) == 4.0)
    assert(math.abs(out(1) - 1.6) < 1e-12)
    // leading NaN takes the finite mean
    val lead = Repair.fillSeries(Array(Double.NaN, 2.0, 2.0, 2.0), "ar")
    assert(math.abs(lead(0) - 2.0) < 1e-12)
  }

  test("fillSeries ma reproduces the reference accumulator exactly") {
    // [NaN,1,2,NaN,4,5,6,NaN], window 5: warm-up sum over idx 0..3 = 3/2;
    // i=3 fills 1.5 then absorbs idx4; i=7 fills the accumulated 12/4 = 3
    val out = Repair.fillSeries(
      Array(Double.NaN, 1.0, 2.0, Double.NaN, 4.0, 5.0, 6.0, Double.NaN), "ma")
    assert(out.toSeq == Seq(1.5, 1.0, 2.0, 1.5, 4.0, 5.0, 6.0, 3.0))
  }

  test("timestampRepair produces a regular grid covering the range") {
    val ts = Array(0L, 10L, 21L, 30L, 39L, 50L, 60L)
    val vs = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val (t2, _) = Repair.timestampRepair(ts, vs)
    val step = t2(1) - t2(0)
    assert(step == 10L)
    assert(t2.sliding(2).forall(p => p(1) - p(0) == step))
    assert(t2.head <= ts.head && t2.last >= ts.last - step)
  }

  test("timestampRepair DP keeps every sample where greedy nearest-slot would drop one") {
    // interval estimate 95 (reference's median indexing), grid 0,95,190,285:
    // the optimal alignment assigns ALL four samples (cost 170) instead of
    // discarding one to a shared nearest slot
    val (t2, v2) = Repair.timestampRepair(
      Array(0L, 100L, 110L, 200L), Array(1.0, 2.0, 3.0, 4.0))
    assert(t2.toSeq == Seq(0L, 95L, 190L, 285L))
    assert(v2.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("timestampRepair DP inserts NaN for a genuinely missing grid slot") {
    val (t2, v2) = Repair.timestampRepair(
      Array(0L, 100L, 200L, 400L, 500L), Array(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(t2.toSeq == Seq(0L, 100L, 200L, 300L, 400L, 500L))
    assert(v2(3).isNaN)
    assert(Seq(v2(0), v2(1), v2(2), v2(4), v2(5)) == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }
}
