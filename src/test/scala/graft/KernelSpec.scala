package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ta.Ta._

/** Hand-computed micro-checks of the REC kernels on tiny frames. */
class KernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tiny = {
    import spark.implicits._
    Seq(
      ("A", 1L, 10.0, 12.0, 9.0, 11.0, 100.0),
      ("A", 2L, 11.0, 13.0, 10.0, 12.0, 90.0),
      ("A", 3L, 12.0, 14.0, 11.0, 13.0, 110.0)
    ).toDF("series_id", "ts", "open", "high", "low", "close", "volume")
  }

  test("heikin-ashi recursion matches hand computation") {
    val r = tiny.ta.ha.orderBy("ts").collect()
    // row0: ha_close = (10+12+9+11)/4 = 10.5 ; ha_open = (10+11)/2 = 10.5
    assert(math.abs(r(0).getAs[Double]("ha_close") - 10.5) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("ha_open") - 10.5) < 1e-12)
    // row1: ha_close = (11+13+10+12)/4 = 11.5 ; ha_open = (10.5+10.5)/2 = 10.5
    assert(math.abs(r(1).getAs[Double]("ha_close") - 11.5) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("ha_open") - 10.5) < 1e-12)
    // row2: ha_open = (10.5+11.5)/2 = 11.0
    assert(math.abs(r(2).getAs[Double]("ha_open") - 11.0) < 1e-12)
  }

  test("mcgd seeds at first value and moves toward price") {
    val r = tiny.ta.mcgd(10).orderBy("ts").collect()
    assert(math.abs(r(0).getAs[Double]("mcgd_10") - 11.0) < 1e-12)
    // y1 = 11 + (12-11)/(10*(12/11)^4) = 11 + 1/(10*1.4161...) ≈ 11.0706
    val expected = 11.0 + 1.0 / (10.0 * math.pow(12.0 / 11.0, 4))
    assert(math.abs(r(1).getAs[Double]("mcgd_10") - expected) < 1e-12)
  }

  test("nvi/pvi compound only on the matching volume side") {
    val r = tiny.ta.nvi().ta.pvi().orderBy("ts").collect()
    // row0: both 1000. row1: volume down (90 < 100) → nvi *= (1 + 12/11-1); pvi unchanged
    assert(math.abs(r(0).getAs[Double]("nvi") - 1000.0) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("nvi") - 1000.0 * (12.0 / 11.0)) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("pvi") - 1000.0) < 1e-9)
    // row2: volume up (110 > 90) → pvi *= 13/12; nvi unchanged
    assert(math.abs(r(2).getAs[Double]("nvi") - 1000.0 * (12.0 / 11.0)) < 1e-9)
    assert(math.abs(r(2).getAs[Double]("pvi") - 1000.0 * (13.0 / 12.0)) < 1e-9)
  }

  test("decay closed form equals sequential definition") {
    import spark.implicits._
    val xs = Seq(5.0, 1.0, 1.0, 1.0, 8.0, 2.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("A", i.toLong, v) }.toDF("series_id", "ts", "close")
    val got = df.ta.decay(5).orderBy("ts").collect().map(_.getAs[Double]("decay_5"))
    val exp = xs.scanLeft(Double.NegativeInfinity) { (prev, x) =>
      math.max(math.max(x, prev - 1.0 / 5), 0.0)
    }.tail
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9, s"$g vs $e") }
  }

  test("kalman seeds at z0 and follows the predict/gain/update recursion") {
    import spark.implicits._
    val df = Seq(10.0, 12.0, 11.0).zipWithIndex
      .map { case (v, i) => ("A", i.toLong, v) }
      .toDF("series_id", "ts", "close")
    val r = df.ta.kalman(q = 0.01, r = 1.0).orderBy("ts").collect()
    assert(r(0).getAs[Double]("kf") == 10.0 && r(0).isNullAt(r(0).fieldIndex("kf_gain")))
    val k1 = 1.01 / 2.01
    val x1 = 10.0 + k1 * 2.0
    val p1 = (1.0 - k1) * 1.01
    assert(math.abs(r(1).getAs[Double]("kf") - x1) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("kf_gain") - k1) < 1e-12)
    val pp2 = p1 + 0.01
    val k2 = pp2 / (pp2 + 1.0)
    val x2 = x1 + k2 * (11.0 - x1)
    assert(math.abs(r(2).getAs[Double]("kf") - x2) < 1e-12)
    assert(math.abs(r(2).getAs[Double]("kf_gain") - k2) < 1e-12)
  }

  test("cusum fixed-reference mode: alarm fires above h and resets both statistics") {
    import spark.implicits._
    val df = Seq(3.0, 3.0, -1.0, 0.0).zipWithIndex
      .map { case (v, i) => ("A", i.toLong, v) }
      .toDF("series_id", "ts", "close")
    val r = df.ta
      .cusum(k = 0.5, h = 2.0, mu = Some(0.0), sd = Some(1.0))
      .orderBy("ts")
      .collect()
    def row(i: Int) = (
      r(i).getAs[Double]("cusum_pos"),
      r(i).getAs[Double]("cusum_neg"),
      r(i).getAs[Long]("cusum_alarm")
    )
    // z=3: sp = max(0, 0+3−0.5) = 2.5 > h → alarm, state resets
    assert(row(0) == ((2.5, 0.0, 1L)))
    // reset state, same input → identical statistic again
    assert(row(1) == ((2.5, 0.0, 1L)))
    // z=−1: sp = 0, sn = max(0, 1−0.5) = 0.5, no alarm
    assert(row(2) == ((0.0, 0.5, 0L)))
    // z=0: sn decays by k → 0
    assert(row(3) == ((0.0, 0.0, 0L)))
  }

  test("cusum retrospective mode standardizes by the 6dp-rounded per-series stats") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("A", i.toLong, v) }.toDF("series_id", "ts", "close")
    val r = df.ta.cusum(k = 0.5, h = 5.0).orderBy("ts").collect()
    val mu = math.rint(xs.sum / xs.size * 1e6) / 1e6
    val n = xs.size
    val sd0 = math.sqrt(xs.map(x => (x - xs.sum / n) * (x - xs.sum / n)).sum / (n - 1))
    val sd = math.rint(sd0 * 1e6) / 1e6
    var sp = 0.0; var sn = 0.0
    xs.zipWithIndex.foreach { case (x, i) =>
      val z = (x - mu) / sd
      sp = math.max(0.0, sp + z - 0.5); sn = math.max(0.0, sn - z - 0.5)
      assert(math.abs(r(i).getAs[Double]("cusum_pos") - sp) < 1e-12, s"sp row $i")
      assert(math.abs(r(i).getAs[Double]("cusum_neg") - sn) < 1e-12, s"sn row $i")
      if (sp > 5.0 || sn > 5.0) { sp = 0.0; sn = 0.0 }
    }
  }
}
