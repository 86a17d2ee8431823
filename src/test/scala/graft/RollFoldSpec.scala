package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TaSqlSurface2 => S2}
import graft.ta.{prim => P}

/** Round-16 optimization gate: the ring-fold kernels (RollFolds) must be
  * BIT-IDENTICAL to the lag-unrolled spellings they replaced on the SQL
  * surface. The unrolled trees are reconstructed from the retained
  * private[graft] helpers (gatedSumU / trAt / rmaxShift / lagW — the
  * executable spec of the old expansion) and compared value-for-value
  * (raw double bits, so ±0.0 and NaN patterns count) on the real bars
  * corpus AND a null-bearing short-series edge fixture.
  */
class RollFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bars: DataFrame = {
    Graft.init(spark)
    Graft.bars(spark, TestSpark.sfDir)
  }

  /** Edge fixture: nulls mid-series, a series shorter than every window,
    * and equal-value runs (zero denominators for the sdiv gates). */
  private def edge: DataFrame = {
    import spark.implicits._
    Graft.init(spark)
    val rows =
      (1 to 40).map(i => ("a", i.toLong, 10.0 + math.sin(i * 0.7) * 3, 8.0 + math.cos(i * 0.9), 9.0 + (i % 7) * 0.3, 100.0 + i)) ++
        Seq(
          ("b", 1L, 5.0, 4.0, 4.5, 10.0),
          ("b", 2L, 5.0, 4.0, 4.5, 10.0), // flat: zero ranges/diffs
          ("b", 3L, 5.0, 4.0, 4.5, 10.0)
        ) ++
        (1 to 35).map { i =>
          val cl: java.lang.Double = if (i % 9 == 0) null else 20.0 + (i % 5)
          ("c", i.toLong, 22.0 + (i % 3), 19.0 - (i % 2) * 0.5, if (cl == null) Double.NaN else cl.doubleValue, 50.0)
        }
    val df = rows
      .toDF("series_id", "ts", "high", "low", "close", "volume")
      .withColumn("close", when(isnan(col("close")), lit(null)).otherwise(col("close")))
      .withColumn("open", col("close") * 0.99)
    df
  }

  private def bits(v: Any): Any = v match {
    case null => null
    case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d)
    case r: org.apache.spark.sql.Row => r.toSeq.map(bits)
    case other => other
  }

  /** Assert old spelling == new spelling bit-for-bit on both frames. */
  private def check(name: String, oldCol: Column, newCol: Column): Unit =
    Seq("bars" -> bars, "edge" -> edge).foreach { case (tag, df) =>
      val out = df
        .select(col("series_id"), col("ts"), oldCol.as("o"), newCol.as("n"))
        .collect()
      assert(out.nonEmpty, s"$name/$tag: empty frame")
      out.foreach { r =>
        assert(
          bits(r.get(2)) == bits(r.get(3)),
          s"$name/$tag diverged at (${r.get(0)}, ${r.get(1)}): old=${r.get(2)} new=${r.get(3)}"
        )
      }
    }

  private def fn(n0: String, args: Column*): Column = call_function(n0, args: _*)

  private val h = col("high").cast("double")
  private val l = col("low").cast("double")
  private val cl = col("close").cast("double")
  private val o = col("open").cast("double")

  test("cmo fold == unrolled") {
    val n = 10
    def dd(j: Int) = S2.lagW(cl, j) - S2.lagW(cl, j + 1)
    def upT(j: Int) = when(dd(j).isNull, lit(null)).when(dd(j) > 0, dd(j)).otherwise(lit(0.0))
    def dnT(j: Int) = when(dd(j).isNull, lit(null)).when(dd(j) < 0, -dd(j)).otherwise(lit(0.0))
    val su = S2.gatedSumU(n)(upT); val sd = S2.gatedSumU(n)(dnT)
    check("cmo", lit(100.0) * P.sdiv(su - sd, su + sd), fn("graft_cmo", cl, lit(n)))
  }

  test("er + vhf folds == unrolled") {
    val n = 10
    val adS = S2.gatedSumU(n)(j => abs(S2.lagW(cl, j) - S2.lagW(cl, j + 1)))
    check("er", P.sdiv(abs(cl - S2.lagW(cl, n)), adS), fn("graft_er", cl, lit(n)))
    check(
      "vhf",
      P.sdiv(abs(P.rmax(cl, n) - P.rmin(cl, n)), adS),
      fn("graft_vhf", cl, lit(n))
    )
  }

  test("psl fold == unrolled") {
    val n = 10
    def gt(j: Int) = when(S2.lagW(cl, j) - S2.lagW(cl, j + 1) > 0, 1.0).otherwise(0.0)
    val s0 = when(P.rn >= n, ((n - 1) to 0 by -1).map(gt).reduce(_ + _))
    check("psl", lit(100.0) * s0 / n.toDouble, fn("graft_psl", cl, lit(n)))
  }

  test("cg fold == unrolled (gated wdot)") {
    val n = 10
    val num = P.wdot(cl, (1 to n).map(_.toDouble))
    check(
      "cg",
      -P.sdiv(when(count(cl).over(P.f(n)) >= n, num), P.rsum(cl, n)),
      fn("graft_cg", cl, lit(n))
    )
  }

  test("chop + vortex folds == unrolled") {
    val n = 10
    val trS = S2.gatedSumU(n)(S2.trAt(h, l, cl, _))
    val ratio = P.sdiv(trS, P.rmax(h, n) - P.rmin(l, n))
    check(
      "chop",
      lit(100.0) * P.sln(ratio) / lit(math.log(n.toDouble)),
      fn("graft_chop", h, l, cl, lit(n))
    )
    def vmp(j: Int) =
      when(S2.lagW(l, j + 1).isNull, lit(null)).otherwise(abs(S2.lagW(h, j) - S2.lagW(l, j + 1)))
    def vmm(j: Int) =
      when(S2.lagW(h, j + 1).isNull, lit(null)).otherwise(abs(S2.lagW(l, j) - S2.lagW(h, j + 1)))
    check(
      "vortex",
      struct(
        P.sdiv(S2.gatedSumU(n)(vmp), trS).as("vtxp"),
        P.sdiv(S2.gatedSumU(n)(vmm), trS).as("vtxm")
      ),
      fn("graft_vortex", h, l, cl, lit(n))
    )
  }

  test("ui fold == unrolled (shifted-frame max)") {
    val n = 10
    def d2(j: Int) = {
      val hh = S2.rmaxShift(cl, n, j)
      val dpct = lit(100.0) * P.sdiv(S2.lagW(cl, j) - hh, hh)
      dpct * dpct
    }
    val m = S2.gatedSumU(n)(d2) / n.toDouble
    check("ui", when(m >= 0.0, sqrt(m)), fn("graft_ui", cl, lit(n)))
  }

  test("uo fold == unrolled (three horizons)") {
    val (f0, m0, s0) = (7, 14, 28)
    def bp(j: Int) = {
      val pc = S2.lagW(cl, j + 1)
      when(pc.isNull, lit(null)).otherwise(S2.lagW(cl, j) - least(S2.lagW(l, j), pc))
    }
    def trn(j: Int) = {
      val pc = S2.lagW(cl, j + 1)
      when(pc.isNull, lit(null)).otherwise(greatest(S2.lagW(h, j), pc) - least(S2.lagW(l, j), pc))
    }
    def avgN(k: Int) = P.sdiv(S2.gatedSumU(k)(bp), S2.gatedSumU(k)(trn))
    check(
      "uo",
      lit(100.0) * (lit(4.0) * avgN(f0) + lit(2.0) * avgN(m0) + avgN(s0)) / 7.0,
      fn("graft_uo", h, l, cl, lit(f0), lit(m0), lit(s0))
    )
  }

  test("brar fold == unrolled") {
    val n = 26
    def hcy(j: Int) = {
      val pc = S2.lagW(cl, j + 1)
      when(pc.isNull, lit(null)).otherwise(greatest(lit(0.0), S2.lagW(h, j) - pc))
    }
    def cyl(j: Int) = {
      val pc = S2.lagW(cl, j + 1)
      when(pc.isNull, lit(null)).otherwise(greatest(lit(0.0), pc - S2.lagW(l, j)))
    }
    check(
      "brar",
      struct(
        (lit(100.0) * P.sdiv(P.rsum(h - o, n), P.rsum(o - l, n))).as("ar"),
        (lit(100.0) * P.sdiv(S2.gatedSumU(n)(hcy), S2.gatedSumU(n)(cyl))).as("br")
      ),
      fn("graft_brar", o, h, l, cl, lit(n))
    )
  }

  test("coppock fold == unrolled (weighted roc sums)") {
    val (n, fast, slow) = (10, 11, 14)
    def rsum2(j: Int) =
      lit(100.0) * (P.sdiv(S2.lagW(cl, j), S2.lagW(cl, j + fast)) - 1.0) +
        lit(100.0) * (P.sdiv(S2.lagW(cl, j), S2.lagW(cl, j + slow)) - 1.0)
    val ws = (1 to n).map(_.toDouble)
    val denom = ws.sum
    val lagWts = ws.reverse.map(_ / denom)
    check(
      "coppock",
      lagWts.zipWithIndex.map { case (wi, j) => rsum2(j) * lit(wi) }.reduce(_ + _),
      fn("graft_coppock", cl, lit(n), lit(fast), lit(slow))
    )
  }

  test("linreg closed forms ride the gated wdot fold unchanged") {
    val n = 10
    // old sxy spelling (count-gated lag-unrolled dot) vs the fold the
    // macro now embeds — compared through the full linreg struct
    val nn = n.toDouble
    val sx = (0 until n).map(_.toDouble).sum
    val sxx = (0 until n).map(i => i.toDouble * i).sum
    val dx = nn * sxx - sx * sx
    val g = count(cl).over(P.f(n)) >= n
    val sxy = when(g, P.wdot(cl, (0 until n).map(j => (n - 1 - j).toDouble)))
    val sy = when(g, sum(cl).over(P.f(n)))
    val syy = when(g, sum(cl * cl).over(P.f(n)))
    val slope = (lit(nn) * sxy - lit(sx) * sy) / lit(dx)
    val intercept = (sy - slope * lit(sx)) / lit(nn)
    val tsf = intercept + slope * lit(nn - 1.0)
    val den2 = (lit(nn) * syy - sy * sy) * lit(dx)
    val r = P.sdiv(lit(nn) * sxy - lit(sx) * sy, when(den2 > 0.0, sqrt(den2)))
    check(
      "linreg",
      struct(slope.as("slope"), intercept.as("intercept"), tsf.as("tsf"), r.as("r")),
      fn("graft_linreg", cl, lit(n))
    )
  }

  test("weighted-MA family and wma/hma ride the wdot fold unchanged") {
    // alma: gated normalized weights (wdotMaE's exact construction)
    val n = 9; val sigma = 6.0; val offset = 0.85
    val m = offset * (n - 1); val sg = n / sigma
    val wRaw = (0 until n).map(i => math.exp(-(i - m) * (i - m) / (2 * sg * sg)))
    val s = wRaw.sum
    check(
      "alma",
      P.gated(cl, n)(P.wdot(cl, wRaw.reverse.map(_ / s))),
      fn("graft_alma", cl, lit(n), lit(sigma), lit(offset))
    )
    // wma: ungated P.wma
    check("wma", P.wma(cl, 10), fn("graft_wma", cl, lit(10)))
    // hma: shifted ungated folds composed exactly like the unrolled tree
    val hn = 10; val half = hn / 2; val sq = math.sqrt(hn.toDouble).toInt
    def wmaNorm(len: Int): Seq[Double] = {
      val ws = (1 to len).map(_.toDouble); val d0 = ws.sum; ws.reverse.map(_ / d0)
    }
    def wdotShift(wts: Seq[Double], off: Int): Column =
      wts.zipWithIndex.map { case (wi, j) => S2.lagW(cl, off + j) * lit(wi) }.reduce(_ + _)
    check(
      "hma",
      wmaNorm(sq).zipWithIndex.map { case (wi, i) =>
        (lit(2.0) * wdotShift(wmaNorm(half), i) - wdotShift(wmaNorm(hn), i)) * lit(wi)
      }.reduce(_ + _),
      fn("graft_hma", cl, lit(hn))
    )
    // kama_sc: the shared abs-diff-sum fold inside the staged coefficient
    val (kn, kf, ks) = (10, 2, 30)
    val fsc = 2.0 / (kf + 1); val ssc = 2.0 / (ks + 1)
    val sumd = S2.gatedSumU(kn)(j => abs(S2.lagW(cl, j) - S2.lagW(cl, j + 1)))
    val er = P.sdiv(abs(cl - S2.lagW(cl, kn)), sumd)
    check(
      "kama_sc",
      pow(er * (fsc - ssc) + ssc, 2.0),
      fn("graft_kama_sc", cl, lit(kn), lit(kf), lit(ks))
    )
  }

  // ---- wave 3: the remaining lag-unrolled macros, folded ---------------

  test("stoch fold == unrolled (shifted-frame min/max, k/d smoothing)") {
    import graft.functions.{TaSqlSurface => S1}
    val (n, k, d) = (10, 3, 3)
    check(
      "stoch",
      S1.stochStruct(h, l, cl, n, k, d),
      fn("graft_stoch", h, l, cl, lit(n), lit(k), lit(d))
    )
    // asymmetric smoothing exercises the cap arithmetic (n+k+d−2)
    check(
      "stoch_5_4_2",
      S1.stochStruct(h, l, cl, 5, 4, 2),
      fn("graft_stoch", h, l, cl, lit(5), lit(4), lit(2))
    )
  }

  test("trima fold == unrolled (shifted gated frame means)") {
    import graft.functions.{TaSqlSurface => S1}
    check("trima10", S1.trimaUnrolled(cl, 10), fn("graft_trima", cl, lit(10)))
    check("trima7", S1.trimaUnrolled(cl, 7), fn("graft_trima", cl, lit(7)))
  }

  test("entropy fold == unrolled (shifted-frame share sums)") {
    import graft.functions.{TaSqlSurface => S1}
    check("entropy", S1.entropyUnrolled(cl, 10, 2.0), fn("graft_entropy", cl, lit(10), lit(2.0)))
  }

  test("eom + mfi folds == unrolled (volume flows)") {
    import graft.functions.{TaSqlSurface => S1}
    val v = col("volume").cast("double")
    check("eom", S1.eomUnrolled(h, l, v, 14, 1e8), fn("graft_eom", h, l, v, lit(14), lit(1e8)))
    check("mfi", S1.mfiUnrolled(h, l, cl, v, 10), fn("graft_mfi", h, l, cl, v, lit(10)))
  }

  test("vidya_al fold == unrolled (rn-gated cmo alpha)") {
    import graft.functions.{TaSqlSurface => S1}
    check("vidya_al", S1.vidyaAlUnrolled(cl, 10), fn("graft_vidya_al", cl, lit(10)))
  }
}
