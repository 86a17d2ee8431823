package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ta.Ta._

/** SQL surface phase 2: the single-expression composite kernels
  * (functions.SeededComposites) must equal the staged Scala spellings
  * ROW-FOR-ROW at full double precision — including the null edge cases
  * the fold state must thread correctly (leading nulls before the seed,
  * interior nulls after it, a null landing exactly on the seed row).
  */
class SeededCompositeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Two series: A = clean sine-ish walk; B = leading nulls, a null on
    * the would-be seed row, and interior nulls after seeding. */
  private def frame = {
    import spark.implicits._
    val a = (1 to 60).map(t => ("A", t.toLong, Some(100.0 + 10 * math.sin(t / 5.0) + (t % 7))))
    val b = (1 to 60).map { t =>
      val v =
        if (t <= 3 || t == 10 || t == 25 || t == 40) None
        else Some(50.0 + 5 * math.cos(t / 3.0) + (t % 5))
      ("B", t.toLong, v)
    }
    (a ++ b).toDF("series_id", "ts", "close")
  }

  private def collectCol(df: org.apache.spark.sql.DataFrame, c: String): Seq[Option[Double]] =
    df.orderBy("series_id", "ts").select(c).collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  private def assertSame(staged: Seq[Option[Double]], fold: Seq[Option[Double]], what: String): Unit =
    staged.zip(fold).zipWithIndex.foreach { case ((s, f), i) =>
      (s, f) match {
        case (None, None)       => ()
        case (Some(x), Some(y)) => assert(x == y, s"$what row $i: staged $x != fold $y (exact compare)")
        case _                  => fail(s"$what row $i: staged $s vs fold $f")
      }
    }

  // The staged multi-projection spellings are the REFERENCE the folds
  // are proven against. Since round 8 the accessor itself runs the
  // folds, so the references here are stage.emaStaged and inline prim
  // spellings — NOT Ta methods (comparing Ta to the SQL fold would be
  // tautological).

  test("graft_ema fold == staged reference, bit-exact, nulls included") {
    Graft.init(spark)
    frame.createOrReplaceTempView("sc_frame")
    val fold = spark.sql("SELECT series_id, ts, graft_ema(close, 10) AS e FROM sc_frame")
    val staged = graft.ta.stage.emaStaged(frame, "close", "e", 10)
    assertSame(collectCol(staged, "e"), collectCol(fold, "e"), "ema")
  }

  /** Staged rsi reference: diff → up/dn gains → two Wilder rmas →
    * 100·sdiv (the pre-round-8 Ta.rsiAs spelling, verbatim). */
  private def rsiStaged(d0: org.apache.spark.sql.DataFrame, src: String, out: String, n: Int) = {
    import graft.ta.{prim => P}
    val dd = P.diff(col(src))
    d0.withColumn("__rup", when(dd.isNull, lit(null)).when(dd > 0, dd).otherwise(lit(0.0)))
      .withColumn("__rdn", when(dd.isNull, lit(null)).when(dd < 0, -dd).otherwise(lit(0.0)))
      .withColumn(
        out,
        lit(100.0) * P.sdiv(P.rmaOf(col("__rup"), n), P.rmaOf(col("__rup"), n) + P.rmaOf(col("__rdn"), n))
      )
      .drop("__rup", "__rdn")
  }

  test("graft_rsi fold == staged reference, bit-exact, nulls included") {
    Graft.init(spark)
    frame.createOrReplaceTempView("sc_frame")
    val fold = spark.sql("SELECT series_id, ts, graft_rsi(close, 14) AS r FROM sc_frame")
    val staged = rsiStaged(frame, "close", "r", 14)
    assertSame(collectCol(staged, "r"), collectCol(fold, "r"), "rsi")
  }

  test("graft_macd fold == staged reference, bit-exact, nulls included") {
    import graft.ta.{prim => P}
    Graft.init(spark)
    frame.createOrReplaceTempView("sc_frame")
    val fold = spark.sql(
      "SELECT series_id, ts, m.macd AS macd, m.macds AS macds, m.macdh AS macdh " +
        "FROM (SELECT series_id, ts, graft_macd(close, 12, 26, 9) AS m FROM sc_frame)"
    )
    // pre-round-8 Ta.macd spelling, verbatim
    val staged = frame
      .withColumn("__mf", P.ewm(col("close"), 2.0 / 13))
      .withColumn("__ms", P.ewm(col("close"), 2.0 / 27))
      .withColumn("macd", col("__mf") - col("__ms"))
      .withColumn("macds", P.ewm(col("macd"), 2.0 / 10))
      .withColumn("macdh", col("macd") - col("macds"))
    Seq("macd", "macds", "macdh").foreach { c =>
      assertSame(collectCol(staged, c), collectCol(fold, c), c)
    }
  }

  test("graft_dema/graft_tema cascaded folds == staged ema chains, bit-exact, nulls included") {
    Graft.init(spark)
    frame.createOrReplaceTempView("sc_frame")
    val fold = spark.sql(
      "SELECT series_id, ts, graft_dema(close, 10) AS d, graft_tema(close, 10) AS t FROM sc_frame"
    )
    val e1 = graft.ta.stage.emaStaged(frame, "close", "e1", 10)
    val e2 = graft.ta.stage.emaStaged(e1, "e1", "e2", 10)
    val e3 = graft.ta.stage.emaStaged(e2, "e2", "e3", 10)
    val staged = e3
      .withColumn("d", lit(2.0) * col("e1") - col("e2"))
      .withColumn("t", lit(3.0) * col("e1") - lit(3.0) * col("e2") + col("e3"))
    assertSame(collectCol(staged, "d"), collectCol(fold, "d"), "dema")
    assertSame(collectCol(staged, "t"), collectCol(fold, "t"), "tema")
  }

  test("SQL wrappers reject wrong arity with an argument-count error") {
    Graft.init(spark)
    frame.createOrReplaceTempView("sc_frame")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ema(close) FROM sc_frame").collect()
    }
    // the arity require, not an IndexOutOfBoundsException from es(i)
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(
      chain(e).exists(c => Option(c.getMessage).exists(_.contains("expects 2 arguments"))),
      s"wanted the arity message, got: ${e.getMessage}"
    )
  }
}
