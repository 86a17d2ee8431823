package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField}
import graft.ta.{rec, Ta}
import graft.ta.Ta._

/** Round-9 REC fold lowering: the struct window folds
  * (functions.RecFolds) must equal the mapPartitions kernel spellings
  * (rec.Psar, rec.Supertrend) ROW-FOR-ROW at full double precision,
  * across series boundaries (kernel reset ≡ window partition) and
  * through both reversal branches. The kernels are the retained spec
  * references — this proof is what lets the accessor and the strategy
  * compiler run the folds (one Exchange shared with the W class)
  * while streaming keeps the kernels.
  */
class RecFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Three series of jagged OHLC bars engineered to flip the psar trend
    * and the supertrend direction repeatedly (sin/cos walks with
    * different phases per series + a sawtooth kicker). */
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

  private def dbl(name: String) = StructField(name, DoubleType, nullable = true)
  private def intF(name: String) = StructField(name, IntegerType, nullable = true)

  private def collectCols(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Seq[Seq[Option[Any]]] =
    df.orderBy("series_id", "ts")
      .select(cols.map(col): _*)
      .collect()
      .toSeq
      .map(r => cols.indices.map(i => if (r.isNullAt(i)) None else Some(r.get(i))))

  private def assertSame(
      kernel: Seq[Seq[Option[Any]]], fold: Seq[Seq[Option[Any]]], cols: Seq[String]): Unit = {
    assert(kernel.size == fold.size)
    kernel.zip(fold).zipWithIndex.foreach { case ((k, f), i) =>
      cols.indices.foreach { j =>
        assert(k(j) == f(j), s"row $i col ${cols(j)}: kernel ${k(j)} != fold ${f(j)} (exact compare)")
      }
    }
  }

  test("psar fold == rec.Psar kernel, bit-exact, all four outputs, multi-series") {
    Graft.init(spark)
    val cols = Seq("psar_long", "psar_short", "psar_af", "psar_reversal")
    val kernel = rec.perSeries(
      bars,
      Seq(dbl("psar_long"), dbl("psar_short"), dbl("psar_af"), intF("psar_reversal"))
    )(() => new rec.Psar(0.02, 0.02, 0.2))
    val fold = bars.ta.psar()
    assertSame(collectCols(kernel, cols), collectCols(fold, cols), cols)
    // sanity: the fixture actually exercises reversals in every series
    val revs = fold.groupBy("series_id").agg(sum("psar_reversal").as("r"))
      .collect().map(r => r.getAs[Long]("r"))
    assert(revs.forall(_ >= 3), s"fixture too tame: reversals per series = ${revs.mkString(",")}")
  }

  test("supertrend fold == rec.Supertrend kernel, bit-exact, all four outputs, multi-series") {
    Graft.init(spark)
    val n = 7
    val cols = Seq(s"supert_$n", s"supertd_$n", s"supertl_$n", s"superts_$n")
    val kernel = rec.perSeries(
      bars,
      Seq(dbl(s"supert_$n"), intF(s"supertd_$n"), dbl(s"supertl_$n"), dbl(s"superts_$n"))
    )(() => new rec.Supertrend(n, 3.0))
    val fold = bars.ta.supertrend(n, 3.0)
    assertSame(collectCols(kernel, cols), collectCols(fold, cols), cols)
    // both directions must occur
    val dirs = fold.select(s"supertd_$n").where(col(s"supertd_$n").isNotNull)
      .distinct().collect().map(_.getInt(0)).toSet
    assert(dirs == Set(1, -1), s"fixture too tame: directions seen = $dirs")
  }

  test("SQL surface: graft_psar / graft_supertrend callable from pure SQL text") {
    Graft.init(spark)
    bars.createOrReplaceTempView("rf_bars")
    val out = spark.sql(
      """SELECT series_id, ts,
        |  graft_psar(high, low, close, 0.02, 0.02, 0.2).long AS psar_long,
        |  graft_supertrend(high, low, close, 7, 3.0).st AS supert_7
        |FROM rf_bars""".stripMargin)
    val viaTa = bars.ta.psar().ta.supertrend(7, 3.0)
      .select("series_id", "ts", "psar_long", "supert_7")
    val cols = Seq("psar_long", "supert_7")
    assertSame(collectCols(viaTa, cols), collectCols(out, cols), cols)
  }
}
