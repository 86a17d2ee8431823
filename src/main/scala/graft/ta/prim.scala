package graft.ta

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Primitive layer (SURVEY.md §2.A): the eight classes every indicator
  * decomposes into, expressed as Catalyst window/column expressions over
  * the single shared window spec `PARTITION BY series_id ORDER BY ts`.
  *
  * Design rules:
  *  - ONE window spec for everything → a 50-indicator batch compiles to a
  *    single Exchange + Sort (plan-shape gate, SURVEY §3.2).
  *  - pandas `min_periods = n` ≡ count-gate: emit only when the frame holds
  *    n non-null observations (also replicates pandas NaN-poisoning of
  *    windows, since count() skips nulls).
  *  - All divisions zero-guarded (`sdiv`): Spark's double x/0 = Inf, but
  *    the DuckDB oracle yields NULL — sdiv pins NULL on both sides.
  */
object prim {

  /** The one shared window spec. */
  val w: WindowSpec = Window.partitionBy("series_id").orderBy("ts")

  /** Fixed row frame of the last n rows (pandas rolling(n)). */
  def f(n: Int): WindowSpec = w.rowsBetween(-(n - 1), 0)

  /** Running frame (pandas expanding / cumulative). */
  val cum: WindowSpec = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** 1-based position within the series. */
  def rn: Column = row_number().over(w)

  // ---- guards ----------------------------------------------------------
  /** a/b with NULL (not Inf/NaN) when b = 0 — DuckDB division semantics. */
  def sdiv(a: Column, b: Column): Column = a / when(b =!= 0.0, b)

  /** ln with NULL for non-positive input on both engines. */
  def sln(x: Column): Column = when(x > 0.0, log(x))

  /** min_periods gate: value only when n non-null xs are in the frame. */
  def gated(x: Column, n: Int)(v: Column): Column =
    when(count(x).over(f(n)) >= n, v)

  // ---- W class: fixed rolling aggregates -------------------------------
  def rsum(x: Column, n: Int): Column = gated(x, n)(sum(x).over(f(n)))
  def rmean(x: Column, n: Int): Column = gated(x, n)(avg(x).over(f(n)))
  def rmin(x: Column, n: Int): Column = gated(x, n)(min(x).over(f(n)))
  def rmax(x: Column, n: Int): Column = gated(x, n)(max(x).over(f(n)))
  def rstd(x: Column, n: Int): Column = gated(x, n)(stddev_samp(x).over(f(n)))
  def rvar(x: Column, n: Int): Column = gated(x, n)(var_samp(x).over(f(n)))
  def rquantile(x: Column, q: Double, n: Int): Column =
    gated(x, n)(percentile(x, lit(q)).over(f(n)))
  def rmedian(x: Column, n: Int): Column = rquantile(x, 0.5, n)

  /** Rolling mean absolute deviation about the window mean (two-pass via
    * HOF over the frame's values — O(n) per row, n is small and fixed). */
  def rmad(x: Column, n: Int): Column = {
    val xs = collect_list(x).over(f(n))
    val m = avg(x).over(f(n))
    gated(x, n)(
      aggregate(xs, lit(0.0), (acc, v) => acc + abs(v - m)) / size(xs)
    )
  }

  // ---- SHIFT class -----------------------------------------------------
  def shift(x: Column, k: Int): Column =
    if (k >= 0) lag(x, k).over(w) else lead(x, -k).over(w)
  def diff(x: Column, k: Int = 1): Column = x - lag(x, k).over(w)
  def pctChange(x: Column, k: Int = 1): Column =
    sdiv(x, lag(x, k).over(w)) - 1.0

  // ---- CUM class -------------------------------------------------------
  def cumsum(x: Column): Column = sum(x).over(cum)
  def cummax(x: Column): Column = max(x).over(cum)
  def cummin(x: Column): Column = min(x).over(cum)
  def cumcount(x: Column): Column = count(x).over(cum)

  // ---- WW class: weighted fixed windows (weights are plan-time Scala) --
  /** Σ weights(i)·x_{t-i} for i = 0..n-1 (i=0 newest), unrolled to lags —
    * pure codegen'd arithmetic, no buffering. Null (gate) until the series
    * has n rows AND all lags non-null (mirrors pandas rolling.apply). */
  def wdot(x: Column, weights: Seq[Double]): Column =
    weights.zipWithIndex.map { case (wi, i) =>
      lag(x, i).over(w) * lit(wi)
    }.reduce(_ + _)

  def wma(x: Column, n: Int): Column = {
    // weights 1..n, newest = n
    val ws = (1 to n).map(_.toDouble)
    val denom = ws.sum
    wdot(x, ws.reverse.map(_ / denom))
  }

  // ---- EW class --------------------------------------------------------
  /** pandas ewm(alpha, adjust=False).mean(): seeds at first non-null.
    * Applied over the explicit ROWS running frame — AggregateWindowFunction
    * mandates it, and the classic API would otherwise default to RANGE. */
  def ewm(x: Column, alpha: Double): Column =
    graft.functions.wf.ewmNoAdjust(x, lit(alpha)).over(cum)

  /** Wilder's smoothing: ewm(alpha=1/n) masked until n observations. */
  def rmaOf(x: Column, n: Int): Column =
    when(cumcount(x) >= n, ewm(x, 1.0 / n))

  /** pandas ewm(alpha, adjust=True).mean() — Σ(1−α)ⁱx / Σ(1−α)ⁱ. Uses
    * Spark's internal EWM window function (≡ pandas, verified). */
  def ewmAdjust(x: Column, alpha: Double): Column =
    org.apache.spark.sql.functions
      .call_function("graft_ewm_adjust", x.cast("double"), lit(alpha))
      .over(cum)

  // ---- moment-formula rolling skew/kurt (pandas bias-corrected) --------
  private def moments(x: Column, n: Int): (Column, Column, Column, Column) = {
    val s1 = sum(x).over(f(n))
    val s2 = sum(x * x).over(f(n))
    val s3 = sum(x * x * x).over(f(n))
    val s4 = sum(x * x * x * x).over(f(n))
    (s1, s2, s3, s4)
  }

  /** pandas rolling.skew: G1 = √(n(n-1))/(n-2) · m3/m2^{3/2}. */
  def rskew(x: Column, n: Int): Column = {
    val (s1, s2, s3, _) = moments(x, n)
    val nn = lit(n.toDouble)
    val m = s1 / nn
    val m2 = s2 / nn - m * m
    val m3 = s3 / nn - lit(3.0) * m * (s2 / nn) + lit(2.0) * m * m * m
    val g1 = sdiv(m3, sqrt(m2 * m2 * m2))
    gated(x, n)(when(m2 > 0.0, g1 * sqrt(nn * (nn - 1.0)) / (nn - 2.0)))
  }

  /** pandas rolling.kurt: G2 = ((n+1)·(m4/m2²−3) + 6)·(n−1)/((n−2)(n−3)). */
  def rkurt(x: Column, n: Int): Column = {
    val (s1, s2, s3, s4) = moments(x, n)
    val nn = lit(n.toDouble)
    val m = s1 / nn
    val m2 = s2 / nn - m * m
    val m4 = s4 / nn - lit(4.0) * m * (s3 / nn) +
      lit(6.0) * m * m * (s2 / nn) - lit(3.0) * m * m * m * m
    val g2 = sdiv(m4, m2 * m2) - 3.0
    gated(x, n)(
      when(m2 > 0.0, ((nn + 1.0) * g2 + 6.0) * (nn - 1.0) / ((nn - 2.0) * (nn - 3.0)))
    )
  }

  // ---- output normalization (shared contract FIXTURES.md §4) -----------
  /** NaN/±Inf → NULL, round 6 — applied to every double output column.
    *
    * Rounding runs in DOUBLE (×1e6, round-half-away, ÷1e6) to mirror
    * DuckDB's round(DOUBLE, k) bit-for-bit. Spark's round(col, 6) goes
    * through BigDecimal on the shortest decimal representation, which
    * disagrees with the double-multiply path exactly at representable
    * .xxxxxx5 boundaries (e.g. 8.0046875 → 8.004688 vs 8.004687; hit at
    * sf0.1). Both half-away conventions agree elsewhere. */
  def normd(c: Column): Column = {
    val v = when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity, lit(null))
      .otherwise(c)
    round(v * 1e6, 0) / 1e6
  }
}
