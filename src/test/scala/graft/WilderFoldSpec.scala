package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ta.Ta._

/** SQL surface phase 3: the Wilder/rma-seeded composite folds
  * (SeededComposites.AtrFold/TrixFold/TsiFold/AdxFold) and the unrolled
  * stoch/bbands struct builders must equal the STAGED Ta accessor
  * spellings ROW-FOR-ROW at full double precision. Non-tautological:
  * the accessors still run the staged multi-projection chains — only
  * the SQL surface routes through these folds.
  */
class WilderFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** OHLC bars over three series (the RecFoldSpec shape). */
  private def bars = {
    import spark.implicits._
    val rows = for {
      (sid, phase) <- Seq(("A", 0.0), ("B", 1.3), ("C", 2.6))
      t <- 1 to 90
    } yield {
      val base = 100.0 + 15.0 * math.sin(t / 6.0 + phase) + (t % 11) - 5.0
      val hi = base + 1.0 + math.abs(math.cos(t / 3.0 + phase)) * 2.0
      val lo = base - 1.0 - math.abs(math.sin(t / 4.0 + phase)) * 2.0
      val cl = lo + (hi - lo) * (0.2 + 0.6 * ((t * 7 % 10) / 10.0))
      (sid, t.toLong, (hi + lo) / 2.0, hi, lo, cl, 1000.0 + t)
    }
    rows.toDF("series_id", "ts", "open", "high", "low", "close", "volume")
  }

  /** Close-only frame with leading/seed-row/interior nulls (the
    * SeededCompositeSpec null-threading fixture). */
  private def nullFrame = {
    import spark.implicits._
    val a = (1 to 80).map(t => ("A", t.toLong, Some(100.0 + 10 * math.sin(t / 5.0) + (t % 7))))
    val b = (1 to 80).map { t =>
      val v =
        if (t <= 3 || t == 10 || t == 25 || t == 40) None
        else Some(50.0 + 5 * math.cos(t / 3.0) + (t % 5))
      ("B", t.toLong, v)
    }
    (a ++ b).toDF("series_id", "ts", "close")
  }

  private def collectCols(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Seq[Seq[Option[Any]]] =
    df.orderBy("series_id", "ts")
      .select(cols.map(col): _*)
      .collect()
      .toSeq
      .map(r => cols.indices.map(i => if (r.isNullAt(i)) None else Some(r.get(i))))

  private def assertSame(
      staged: Seq[Seq[Option[Any]]], fold: Seq[Seq[Option[Any]]], cols: Seq[String]): Unit = {
    assert(staged.size == fold.size)
    staged.zip(fold).zipWithIndex.foreach { case ((s, f), i) =>
      cols.indices.foreach { j =>
        assert(s(j) == f(j), s"row $i col ${cols(j)}: staged ${s(j)} != fold ${f(j)} (exact compare)")
      }
    }
  }

  test("graft_atr / graft_natr == staged Ta.natr chain, bit-exact") {
    Graft.init(spark)
    bars.createOrReplaceTempView("wf_bars")
    val fold = spark.sql(
      """SELECT series_id, ts, graft_atr(high, low, close, 10) AS atr_10,
        |  graft_natr(high, low, close, 10) AS natr_10 FROM wf_bars""".stripMargin)
    val staged = bars.ta.natr(10).select("series_id", "ts", "atr_10", "natr_10")
    val cols = Seq("atr_10", "natr_10")
    assertSame(collectCols(staged, cols), collectCols(fold, cols), cols)
  }

  test("graft_stoch == staged Ta.stoch, bit-exact, both struct fields") {
    Graft.init(spark)
    bars.createOrReplaceTempView("wf_bars")
    val fold = spark.sql(
      """SELECT series_id, ts, s.stoch_k AS stoch_k, s.stoch_d AS stoch_d
        |FROM (SELECT series_id, ts, graft_stoch(high, low, close, 10, 3, 3) AS s FROM wf_bars)""".stripMargin)
    val staged = bars.ta.stoch(10, 3, 3).select("series_id", "ts", "stoch_k", "stoch_d")
    val cols = Seq("stoch_k", "stoch_d")
    assertSame(collectCols(staged, cols), collectCols(fold, cols), cols)
  }

  test("graft_bbands == staged Ta.bbands, bit-exact, all five struct fields") {
    Graft.init(spark)
    bars.createOrReplaceTempView("wf_bars")
    val fold = spark.sql(
      """SELECT series_id, ts, b.bbm, b.bbl, b.bbu, b.bbb, b.bbp
        |FROM (SELECT series_id, ts, graft_bbands(close, 5, 2.0) AS b FROM wf_bars)""".stripMargin)
    val staged = bars.ta.bbands(5, 2.0)
      .select(col("series_id"), col("ts"), col("bbm_5_2").as("bbm"), col("bbl_5_2").as("bbl"),
        col("bbu_5_2").as("bbu"), col("bbb_5_2").as("bbb"), col("bbp_5_2").as("bbp"))
    val cols = Seq("bbm", "bbl", "bbu", "bbb", "bbp")
    assertSame(collectCols(staged, cols), collectCols(fold, cols), cols)
  }

  // Since the accessors route through the folds too (round 9), the
  // trix/tsi/adx references below are the PRE-fold staged spellings
  // rebuilt inline from prim/emaStaged — the emaStaged pattern: the
  // retained reference keeps the proof non-tautological.

  test("graft_trix == staged ema-chain reference, bit-exact, nulls included") {
    import graft.ta.{prim => P, stage}
    Graft.init(spark)
    nullFrame.createOrReplaceTempView("wf_nulls")
    val fold = spark.sql("SELECT series_id, ts, graft_trix(close, 10) AS trix_10 FROM wf_nulls")
    val e3 = stage.emaStaged(
      stage.emaStaged(stage.emaStaged(nullFrame, "close", "e1", 10), "e1", "e2", 10), "e2", "e3", 10)
    val staged = e3
      .withColumn("trix_10", lit(100.0) * P.pctChange(col("e3"), 1))
      .select("series_id", "ts", "trix_10")
    assertSame(collectCols(staged, Seq("trix_10")), collectCols(fold, Seq("trix_10")), Seq("trix_10"))
  }

  test("graft_tsi == staged ema-chain reference, bit-exact, nulls included") {
    import graft.ta.{prim => P, stage}
    Graft.init(spark)
    nullFrame.createOrReplaceTempView("wf_nulls")
    val fold = spark.sql("SELECT series_id, ts, graft_tsi(close, 13, 25) AS tsi_13_25 FROM wf_nulls")
    val tmp = nullFrame
      .withColumn("d0", P.diff(col("close")))
      .withColumn("ad", abs(P.diff(col("close"))))
    val e1 = stage.emaStaged(stage.emaStaged(tmp, "d0", "ds", 25), "ds", "dss", 13)
    val e2 = stage.emaStaged(stage.emaStaged(e1, "ad", "as0", 25), "as0", "ass", 13)
    val staged = e2
      .withColumn("tsi_13_25", lit(100.0) * P.sdiv(col("dss"), col("ass")))
      .select("series_id", "ts", "tsi_13_25")
    assertSame(
      collectCols(staged, Seq("tsi_13_25")), collectCols(fold, Seq("tsi_13_25")), Seq("tsi_13_25"))
  }

  test("graft_kc == staged emaStaged-chain reference, bit-exact, all three struct fields") {
    import graft.ta.{prim => P, stage}
    Graft.init(spark)
    bars.createOrReplaceTempView("wf_bars")
    val fold = spark.sql(
      """SELECT series_id, ts, k.kcb, k.kcl, k.kcu
        |FROM (SELECT series_id, ts, graft_kc(high, low, close, 20, 2.0) AS k FROM wf_bars)""".stripMargin)
    // pre-round-9 Ta.kc chain over emaStaged (the retained reference)
    val pc = P.shift(col("close"), 1)
    val tr = when(pc.isNull, lit(null))
      .otherwise(greatest(col("high") - col("low"), abs(col("high") - pc), abs(col("low") - pc)))
    val d0 = stage.emaStaged(bars.withColumn("true_range", tr), "close", "basis", 20)
    val d1 = stage.emaStaged(d0, "true_range", "band", 20)
    val staged = d1
      .withColumn("kcb", col("basis"))
      .withColumn("kcl", col("basis") - lit(2.0) * col("band"))
      .withColumn("kcu", col("basis") + lit(2.0) * col("band"))
      .select("series_id", "ts", "kcb", "kcl", "kcu")
    val cols = Seq("kcb", "kcl", "kcu")
    assertSame(collectCols(staged, cols), collectCols(fold, cols), cols)
  }

  test("graft_adx == staged rmaOf-chain reference, bit-exact, all five struct fields") {
    import graft.ta.{prim => P}
    Graft.init(spark)
    bars.createOrReplaceTempView("wf_bars")
    val fold = spark.sql(
      """SELECT series_id, ts, a.dmp, a.dmn, a.dip, a.dim, a.adx
        |FROM (SELECT series_id, ts, graft_adx(high, low, close, 14, 14) AS a FROM wf_bars)""".stripMargin)
    // the pre-round-9 Ta.adx chain, verbatim
    val up = P.diff(col("high"))
    val dn = -P.diff(col("low"))
    val pdm = when(up > dn && up > 0, up).otherwise(when(up.isNull || dn.isNull, lit(null)).otherwise(0.0))
    val mdm = when(dn > up && dn > 0, dn).otherwise(when(up.isNull || dn.isNull, lit(null)).otherwise(0.0))
    val pc = P.shift(col("close"), 1)
    val tr = when(pc.isNull, lit(null))
      .otherwise(greatest(col("high") - col("low"), abs(col("high") - pc), abs(col("low") - pc)))
    val d0 = bars
      .withColumn("dmp", P.rmaOf(pdm, 14))
      .withColumn("dmn", P.rmaOf(mdm, 14))
      .withColumn("xatr", P.rmaOf(tr, 14))
      .withColumn("dip", lit(100.0) * P.sdiv(col("dmp"), col("xatr")))
      .withColumn("dim", lit(100.0) * P.sdiv(col("dmn"), col("xatr")))
    val staged = d0
      .withColumn("dx", lit(100.0) * P.sdiv(abs(col("dip") - col("dim")), col("dip") + col("dim")))
      .withColumn("adx", P.rmaOf(col("dx"), 14))
      .select("series_id", "ts", "dmp", "dmn", "dip", "dim", "adx")
    val cols = Seq("dmp", "dmn", "dip", "dim", "adx")
    assertSame(collectCols(staged, cols), collectCols(fold, cols), cols)
  }
}
