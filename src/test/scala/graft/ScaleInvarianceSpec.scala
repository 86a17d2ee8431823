package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ta.Ta._

/** SURVEY §5.2(4): results must be identical under repartition(1) vs
  * repartition(32) — catches order-dependence bugs in REC kernels, the
  * LinRecur window function, and window count-gating.
  */
class ScaleInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def normalized(df: DataFrame, keys: Seq[String], outs: Seq[String]): Seq[Seq[Any]] =
    df.select(keys.map(col) ++ outs.map(n => graft.ta.prim.normd(col(n).cast("double")).as(n)): _*)
      .orderBy(keys.map(col): _*)
      .collect()
      .toSeq
      .map(_.toSeq)

  private def invariant(build: DataFrame => DataFrame, outs: Seq[String]): Unit = {
    val base = Graft.userSeries(spark, TestSpark.sfDir)
    val keys = Seq("series_id", "ts")
    val one = normalized(build(base.repartition(1)), keys, outs)
    val many = normalized(build(base.repartition(32)), keys, outs)
    assert(one == many, s"partitioning changed results for $outs")
  }

  test("kama_10 scale-invariant") { invariant(_.ta.kama(10), Seq("kama_10")) }
  test("vidya_10 scale-invariant") { invariant(_.ta.vidya(10), Seq("vidya_10")) }
  test("decay_5 scale-invariant") { invariant(_.ta.decay(5), Seq("decay_5")) }
  test("mcgd_10 scale-invariant") { invariant(_.ta.mcgd(10), Seq("mcgd_10")) }
  test("ssf_10 scale-invariant") { invariant(_.ta.ssf(10), Seq("ssf_10")) }
  test("hwma scale-invariant") { invariant(_.ta.hwma(), Seq("hwma")) }
  test("ema_10 scale-invariant") {
    invariant(df => graft.ta.stage.ema(df, "close", "ema_10", 10), Seq("ema_10"))
  }

  test("rsx_10 scale-invariant") { invariant(_.ta.rsx(10), Seq("rsx_10")) }
  test("ebsw scale-invariant") { invariant(_.ta.ebsw(20, 10), Seq("ebsw_20")) }
  test("hwc scale-invariant") { invariant(_.ta.hwc(), Seq("hwc_mid", "hwc_upper")) }
  test("jma scale-invariant") { invariant(_.ta.jma(7), Seq("jma_7")) }

  test("cusum scale-invariant (both standardization modes)") {
    invariant(_.ta.cusum(), Seq("cusum_pos", "cusum_neg"))
    invariant(_.ta.cusum(mu = Some(100.0), sd = Some(10.0)), Seq("cusum_pos", "cusum_neg"))
  }

  test("psar/supertrend/ha scale-invariant on bars") {
    val base = Graft.bars(spark, TestSpark.sfDir)
    def run(df: DataFrame) =
      normalized(
        df.ta.psar().ta.supertrend(7, 3.0).ta.ha,
        Seq("series_id", "ts"),
        Seq("psar_af", "supert_7", "ha_close")
      )
    assert(run(base.repartition(1)) == run(base.repartition(8)))
  }
}
