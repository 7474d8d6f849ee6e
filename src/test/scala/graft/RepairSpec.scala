package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Repair

class RepairSpec extends AnyFunSuite {
  private val NaN = Double.NaN

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
