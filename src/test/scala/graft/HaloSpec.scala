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
}
