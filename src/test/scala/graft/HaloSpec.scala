package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.Halo
import graft.ta.Ta._

/** SURVEY §4.3: chunked (halo / segmented-scan) computation must equal the
  * global single-partition window bit-for-bit. */
class HaloSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def collect6(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
    df.select((Seq("series_id", "ts").map(col) ++ cols.map(c => graft.ta.prim.normd(col(c)).as(c))): _*)
      .orderBy("series_id", "ts")
      .collect()
      .toSeq
      .map(_.toSeq)

  test("halo-chunked rolling equals global window (sma/std/min/max, multi-key)") {
    val ser = Graft.userSeries(spark, TestSpark.sfDir)
    def build(df: org.apache.spark.sql.DataFrame) =
      df.ta.sma(10).ta.stdev(10).ta.midpoint(10).ta.mom(10)
    val outs = Seq("sma_10", "stdev_10", "midpoint_10", "mom_10")
    val global = collect6(build(ser), outs)
    val chunked = collect6(Halo.chunked(ser, 11, 8)(build), outs)
    assert(chunked == global)
  }

  test("halo-chunked handles a single giant series") {
    val one = Graft
      .userSeries(spark, TestSpark.sfDir)
      .withColumn("series_id", lit("ONE"))
      .orderBy("ts")
      .where(col("ts").isNotNull)
    def build(df: org.apache.spark.sql.DataFrame) = df.ta.sma(10)
    val global = collect6(build(one), Seq("sma_10"))
    val chunked = collect6(Halo.chunked(one, 10, 16)(build), Seq("sma_10"))
    assert(chunked == global)
  }

  test("segmented-scan ewm equals the LinRecur window ewm") {
    val ser = Graft.userSeries(spark, TestSpark.sfDir)
    val alpha = 2.0 / 11
    val global = collect6(
      ser.withColumn("e", graft.ta.prim.ewm(col("close"), alpha)),
      Seq("e")
    )
    val scanned = collect6(Halo.chunkedEwm(ser, "close", "e", alpha, 8), Seq("e"))
    assert(scanned == global)
  }

  test("segmented-scan ewm on one giant series across 16 chunks") {
    val one = Graft.userSeries(spark, TestSpark.sfDir).withColumn("series_id", lit("ONE"))
    val alpha = 1.0 / 10
    val global = collect6(
      one.withColumn("e", graft.ta.prim.ewm(col("close"), alpha)),
      Seq("e")
    )
    val scanned = collect6(Halo.chunkedEwm(one, "close", "e", alpha, 16), Seq("e"))
    assert(scanned == global)
  }

  test("segmented-scan SEEDED ema equals the fold (multi-key + one giant series)") {
    // round-10: stage.ema's positional seed (rows 1..n−1 null, row n =
    // nulls-skipped first-n mean, then the recursion) through
    // chunkedEmaSeeded — chunk boundaries land both inside and after the
    // seed window across the two shapes
    val ser = Graft.userSeries(spark, TestSpark.sfDir)
    val globalM = collect6(graft.ta.stage.ema(ser, "close", "e", 10), Seq("e"))
    val scannedM = collect6(Halo.chunkedEmaSeeded(ser, "close", "e", 10, 8), Seq("e"))
    assert(scannedM == globalM)

    val one = Graft.userSeries(spark, TestSpark.sfDir).withColumn("series_id", lit("ONE"))
    val globalO = collect6(graft.ta.stage.ema(one, "close", "e", 10), Seq("e"))
    val scannedO = collect6(Halo.chunkedEmaSeeded(one, "close", "e", 10, 16), Seq("e"))
    assert(scannedO == globalO)
    // a seed window WIDER than a chunk (n=40 over tiny chunks): the seed
    // must still assemble across chunk boundaries
    val globalW = collect6(graft.ta.stage.ema(one, "close", "e", 40), Seq("e"))
    val scannedW = collect6(Halo.chunkedEmaSeeded(one, "close", "e", 40, 16), Seq("e"))
    assert(scannedW == globalW)
  }

  test("autoEmaSeeded routes the 1-series frame; auto=false pins the fold") {
    val one = Graft
      .userSeries(spark, TestSpark.sfDir)
      .withColumn("series_id", lit("ONE"))
      .where(col("ts").isNotNull)
    try {
      spark.conf.set(Halo.AutoMinRowsKey, "200")
      val routed = one.ta.ema(10)
      assert(
        routed.queryExecution.executedPlan.toString.contains("MapPartitions"),
        "ta.ema did not route through the seeded segmented scan"
      )
      spark.conf.set(Halo.AutoKey, "false")
      val plain = one.ta.ema(10)
      assert(
        !plain.queryExecution.executedPlan.toString.contains("MapPartitions"),
        "auto=false must pin the fold path"
      )
      spark.conf.set(Halo.AutoKey, "true")
      assert(collect6(routed, Seq("ema_10")) == collect6(plain, Seq("ema_10")))
    } finally {
      spark.conf.unset(Halo.AutoMinRowsKey)
      spark.conf.unset(Halo.AutoKey)
    }
  }

  test("auto-dispatch routes a long 1-series frame through halo chunks") {
    // round-5 usability fix: df.ta.sma on a low-cardinality/long-series
    // frame must lower through Halo.chunked WITHOUT the caller knowing
    // the §4.3 API. Floor lowered so the test stays small.
    val one = Graft
      .userSeries(spark, TestSpark.sfDir)
      .withColumn("series_id", lit("ONE"))
      .where(col("ts").isNotNull)
    try {
      spark.conf.set(Halo.AutoMinRowsKey, "200")
      val routed = one.ta.sma(10)
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("MapPartitions"), s"sma did not route through halo chunks:\n$plan")
      spark.conf.set(Halo.AutoKey, "false")
      val plain = one.ta.sma(10)
      assert(
        !plain.queryExecution.executedPlan.toString.contains("MapPartitions"),
        "auto=false must pin the plain window path"
      )
      spark.conf.set(Halo.AutoKey, "true")
      // bitwise equality: every ≤n frame sees exactly the global rows
      assert(collect6(routed, Seq("sma_10")) == collect6(plain, Seq("sma_10")))
    } finally {
      spark.conf.unset(Halo.AutoMinRowsKey)
      spark.conf.unset(Halo.AutoKey)
    }
  }

  test("auto-dispatch leaves the multi-series fixture on the plain path") {
    // 15 series × ~667 rows: below the per-series minRows floor — the
    // dispatch must not add halo machinery where it cannot win
    val ser = Graft.userSeries(spark, TestSpark.sfDir)
    val plan = ser.ta.sma(10).queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"), s"fixture unexpectedly routed:\n$plan")
  }

  test("autoEwm routes the 1-series frame and matches the sequential fold at 6 dp") {
    val one = Graft
      .userSeries(spark, TestSpark.sfDir)
      .withColumn("series_id", lit("ONE"))
      .where(col("ts").isNotNull)
    val alpha = 2.0 / 11
    try {
      spark.conf.set(Halo.AutoMinRowsKey, "200")
      val routed = Halo.autoEwm(one, "close", "e", alpha)
      assert(
        routed.queryExecution.executedPlan.toString.contains("MapPartitions"),
        "autoEwm did not route through the segmented scan"
      )
      val global = collect6(one.withColumn("e", graft.ta.prim.ewm(col("close"), alpha)), Seq("e"))
      assert(collect6(routed, Seq("e")) == global)
    } finally spark.conf.unset(Halo.AutoMinRowsKey)
  }
}
