package graft.ta

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** REC-class kernels (SURVEY.md §2.A REC / §4.3 tier 4): non-linear or
  * branching per-series recursions that no window aggregate expresses.
  *
  * Execution shape: `repartition(series_id)` + `sortWithinPartitions
  * (series_id, ts)` + `mapPartitions` — ONE shuffle (same key as every
  * window indicator, so Catalyst reuses the exchange when composed), then
  * a single streaming pass per partition with O(1) state per key. At
  * 100 TB this is I/O-bound sequential scan per series; the inherently
  * serial dependency chain is documented in SURVEY §4.3 (psar-class
  * recursions cannot be prefix-scanned).
  *
  * Kernels read input fields by index resolved once per partition
  * (`init`), emit a fixed-arity Array[Any] per row, and are reset at every
  * series boundary. Nulls: kernels receive rows as-is; a null input field
  * generally emits null outputs and leaves state unchanged (pandas NaN
  * semantics), handled per kernel.
  */
object rec {

  trait Kernel extends Serializable {
    /** Resolve input column indexes once per partition. */
    def init(schema: StructType): Unit
    /** New series: clear all state. */
    def reset(): Unit
    /** One row, in ts order; returns exactly `outFields.size` values. */
    def update(row: Row): Array[Any]
  }

  /** Append `outs` columns produced by a per-series sequential kernel. */
  def perSeries(df: DataFrame, outs: Seq[StructField])(make: () => Kernel): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ outs)
    val keyIdx = inSchema.fieldIndex("series_id")
    val enc = Encoders.row(outSchema)
    df.repartition(col("series_id"))
      .sortWithinPartitions("series_id", "ts")
      .mapPartitions { it =>
        var kernel: Kernel = null
        var curKey: Any = null
        var started = false
        it.map { row =>
          val k = row.get(keyIdx)
          if (!started || k != curKey) {
            kernel = make()
            kernel.init(inSchema)
            kernel.reset()
            curKey = k
            started = true
          }
          Row.fromSeq(row.toSeq ++ kernel.update(row))
        }
      }(enc)
  }

  private def d(row: Row, i: Int): Double = row.getDouble(i)
  private def isN(row: Row, i: Int): Boolean = row.isNullAt(i)

  // ===================================================================
  // Kernels. Reference paths cite the canonical upstream layout
  // (SURVEY.md §0 — checkout empty; §2.B declared specs are the contract).
  // ===================================================================

  /** Parabolic SAR (reference: pandas_ta/trend/psar.py, declared spec
    * SURVEY §2.B). Row 0 emits nulls (initialization row). Initial trend:
    * rising iff close₁ ≥ close₀; rising seed sar = low₀, ep = max(high₀,
    * high₁); falling seed sar = high₀, ep = min(low₀, low₁).
    * Step: sar += af·(ep − sar), clamped to the prior two lows (rising) /
    * highs (falling); new extreme bumps af by af0 up to maxAf; price
    * crossing sar reverses (sar := ep, af := af0).
    * Outputs: psar_long (sar while rising), psar_short (sar while
    * falling), psar_af, psar_reversal (0/1). */
  final class Psar(af0: Double = 0.02, afStep: Double = 0.02, maxAf: Double = 0.2)
      extends Kernel {
    private var iH, iL, iC = 0
    private var n = 0
    private var rising = false
    private var sar, ep, af = 0.0
    private var h0, l0, c0 = 0.0
    private var prevLo1, prevLo2, prevHi1, prevHi2 = 0.0

    def init(schema: StructType): Unit = {
      iH = schema.fieldIndex("high"); iL = schema.fieldIndex("low")
      iC = schema.fieldIndex("close")
    }
    def reset(): Unit = { n = 0 }

    def update(row: Row): Array[Any] = {
      val h = d(row, iH); val l = d(row, iL); val c = d(row, iC)
      n += 1
      if (n == 1) {
        h0 = h; l0 = l; c0 = c
        prevHi1 = h; prevLo1 = l; prevHi2 = h; prevLo2 = l
        return Array(null, null, null, null)
      }
      if (n == 2) {
        rising = c >= c0
        if (rising) { sar = l0; ep = math.max(h0, h) }
        else { sar = h0; ep = math.min(l0, l) }
        af = af0
      } else {
        sar = sar + af * (ep - sar)
        if (rising) sar = math.min(sar, math.min(prevLo1, prevLo2))
        else sar = math.max(sar, math.max(prevHi1, prevHi2))
        if (rising) {
          if (h > ep) { ep = h; af = math.min(af + afStep, maxAf) }
        } else {
          if (l < ep) { ep = l; af = math.min(af + afStep, maxAf) }
        }
      }
      var rev = 0
      if (rising && l < sar) {
        rising = false; rev = 1; sar = ep; ep = l; af = af0
      } else if (!rising && h > sar) {
        rising = true; rev = 1; sar = ep; ep = h; af = af0
      }
      prevLo2 = prevLo1; prevLo1 = l; prevHi2 = prevHi1; prevHi1 = h
      Array(
        if (rising) sar else null,
        if (!rising) sar else null,
        af,
        rev
      )
    }
  }

  /** Supertrend (reference: pandas_ta/overlap/supertrend.py, declared
    * spec). ATR = Wilder rma of true range computed in-kernel with the
    * exact rmaOf semantics (seed tr₁, mask until n TRs seen). Bands:
    * ub/lb = hl2 ± mult·atr with monotone carry; direction flips when
    * close crosses the carried band. Outputs: st (trend line), st_dir
    * (±1), st_long, st_short — null until atr is defined. */
  final class Supertrend(n: Int = 7, mult: Double = 3.0) extends Kernel {
    private var iH, iL, iC = 0
    private var rows = 0
    private var trCount = 0
    private var atr = 0.0
    private var prevClose = 0.0
    private var haveBands = false
    private var ub, lb = 0.0
    private var dir = 1

    def init(schema: StructType): Unit = {
      iH = schema.fieldIndex("high"); iL = schema.fieldIndex("low")
      iC = schema.fieldIndex("close")
    }
    def reset(): Unit = { rows = 0; trCount = 0; haveBands = false; dir = 1 }

    def update(row: Row): Array[Any] = {
      val h = d(row, iH); val l = d(row, iL); val c = d(row, iC)
      rows += 1
      if (rows == 1) { prevClose = c; return Array(null, null, null, null) }
      val tr = math.max(h - l, math.max(math.abs(h - prevClose), math.abs(l - prevClose)))
      trCount += 1
      atr = if (trCount == 1) tr else (1.0 - 1.0 / n) * atr + tr / n
      val pc = prevClose
      prevClose = c
      if (trCount < n) return Array(null, null, null, null)
      val hl2 = (h + l) / 2.0
      var nub = hl2 + mult * atr
      var nlb = hl2 - mult * atr
      if (haveBands) {
        // carry: bands only ratchet while price stays inside
        if (nlb < lb && pc > lb) nlb = lb
        if (nub > ub && pc < ub) nub = ub
        if (c > ub) dir = 1 else if (c < lb) dir = -1
      } else {
        dir = 1
        haveBands = true
      }
      ub = nub; lb = nlb
      val st = if (dir == 1) lb else ub
      Array(st, dir, if (dir == 1) lb else null, if (dir == -1) ub else null)
    }
  }

  /** Heikin-Ashi (reference: pandas_ta/candles/ha.py). ha_close =
    * ohlc4; ha_open₀ = (o₀+c₀)/2 then (ha_open'+ha_close')/2;
    * ha_high/low = max/min against h/l. */
  final class HeikinAshi extends Kernel {
    private var iO, iH, iL, iC = 0
    private var first = true
    private var prevHaOpen, prevHaClose = 0.0
    def init(schema: StructType): Unit = {
      iO = schema.fieldIndex("open"); iH = schema.fieldIndex("high")
      iL = schema.fieldIndex("low"); iC = schema.fieldIndex("close")
    }
    def reset(): Unit = { first = true }
    def update(row: Row): Array[Any] = {
      val o = d(row, iO); val h = d(row, iH); val l = d(row, iL); val c = d(row, iC)
      val haClose = (o + h + l + c) / 4.0
      val haOpen = if (first) (o + c) / 2.0 else (prevHaOpen + prevHaClose) / 2.0
      first = false
      prevHaOpen = haOpen; prevHaClose = haClose
      val haHigh = math.max(h, math.max(haOpen, haClose))
      val haLow = math.min(l, math.min(haOpen, haClose))
      Array(haOpen, haHigh, haLow, haClose)
    }
  }

  /** McGinley Dynamic (reference: pandas_ta/overlap/mcgd.py):
    * y₀ = x₀; y = y' + (x − y')/(n·(x/y')⁴), guarding y' = 0. */
  final class Mcgd(n: Int = 10, src: String = "close") extends Kernel {
    private var iX = 0
    private var first = true
    private var y = 0.0
    def init(schema: StructType): Unit = { iX = schema.fieldIndex(src) }
    def reset(): Unit = { first = true }
    def update(row: Row): Array[Any] = {
      if (isN(row, iX)) return Array(if (first) null else y)
      val x = d(row, iX)
      if (first) { y = x; first = false }
      else if (y != 0.0) {
        val r = x / y
        y = y + (x - y) / (n * r * r * r * r)
      }
      Array(y)
    }
  }

  /** Fisher transform recursion (reference: pandas_ta/momentum/fisher.py).
    * Consumes a pre-computed `__pos` column (2·((hl2 − LL)/(HH − LL) − ½)
    * over the rolling window, null during warm-up): v = 0.66·pos +
    * 0.67·v', clamped ±0.999; fisher = 0.5·ln((1+v)/(1−v)) + 0.5·fisher';
    * signal = previous fisher. */
  final class Fisher extends Kernel {
    private var iP = 0
    private var v, fish = 0.0
    private var have = false
    def init(schema: StructType): Unit = { iP = schema.fieldIndex("__pos") }
    def reset(): Unit = { v = 0.0; fish = 0.0; have = false }
    def update(row: Row): Array[Any] = {
      if (isN(row, iP)) return Array(null, null)
      val pos = d(row, iP)
      var nv = 0.66 * pos + 0.67 * v
      if (nv > 0.999) nv = 0.999 else if (nv < -0.999) nv = -0.999
      val prevFish = fish
      val nf = 0.5 * math.log((1.0 + nv) / (1.0 - nv)) + 0.5 * fish
      v = nv; fish = nf
      val sig: Any = if (have) prevFish else null
      have = true
      Array(nf, sig)
    }
  }

  /** Ehlers 2-pole super smoother (reference: pandas_ta/overlap/ssf.py):
    * y = c1·x + c2·y' + c3·y'' with a = exp(−√2·π/n),
    * b = 2a·cos(√2·π/n), c2 = b, c3 = −a², c1 = 1 − c2 − c3.
    * Seeds: y₀ = x₀, y₁ = x₁. */
  final class Ssf(n: Int = 10, src: String = "close") extends Kernel {
    private var iX = 0
    private val a = math.exp(-math.sqrt(2.0) * math.Pi / n)
    private val b = 2.0 * a * math.cos(math.sqrt(2.0) * math.Pi / n)
    private val c2 = b
    private val c3 = -a * a
    private val c1 = 1.0 - c2 - c3
    private var y1, y2 = 0.0
    private var count = 0
    def init(schema: StructType): Unit = { iX = schema.fieldIndex(src) }
    def reset(): Unit = { count = 0 }
    def update(row: Row): Array[Any] = {
      if (isN(row, iX)) return Array(if (count == 0) null else y1)
      val x = d(row, iX)
      count += 1
      val y = if (count <= 2) x else c1 * x + c2 * y1 + c3 * y2
      y2 = y1; y1 = y
      Array(y)
    }
  }

  /** Holt-Winter MA (reference: pandas_ta/overlap/hwma.py), defaults
    * na=0.2 nb=0.1 nc=0.1; state F/V/A seeded F₀=x₀, V₀=A₀=0:
    * F = (1−na)(F'+V'+½A') + na·x; V = (1−nb)(V'+A') + nb(F−F');
    * A = (1−nc)A' + nc(V−V'); hwma = F + V + ½A. */
  final class Hwma(na: Double = 0.2, nb: Double = 0.1, nc: Double = 0.1, src: String = "close")
      extends Kernel {
    private var iX = 0
    private var first = true
    private var fS, vS, aS = 0.0
    def init(schema: StructType): Unit = { iX = schema.fieldIndex(src) }
    def reset(): Unit = { first = true; fS = 0.0; vS = 0.0; aS = 0.0 }
    def update(row: Row): Array[Any] = {
      if (isN(row, iX)) return Array(if (first) null else fS + vS + 0.5 * aS)
      val x = d(row, iX)
      if (first) { fS = x; vS = 0.0; aS = 0.0; first = false }
      else {
        val pf = fS; val pv = vS; val pa = aS
        fS = (1.0 - na) * (pf + pv + 0.5 * pa) + na * x
        vS = (1.0 - nb) * (pv + pa) + nb * (fS - pf)
        aS = (1.0 - nc) * pa + nc * (vS - pv)
      }
      Array(fS + vS + 0.5 * aS)
    }
  }

  /** Gann HiLo activator state (reference: pandas_ta/overlap/hilo.py).
    * Consumes pre-computed `__mh` = sma(high, 13), `__ml` = sma(low, 21)
    * columns; trend flips when close crosses the PREVIOUS row's band:
    * close > mh' → 1, close < ml' → −1, else carry. hilo = ml when trend
    * is 1 else mh. Null until both prior MAs exist. */
  final class Hilo extends Kernel {
    private var iC, iMh, iMl = 0
    private var trend = 0
    private var pmh, pml = Double.NaN
    def init(schema: StructType): Unit = {
      iC = schema.fieldIndex("close")
      iMh = schema.fieldIndex("__mh"); iMl = schema.fieldIndex("__ml")
    }
    def reset(): Unit = { trend = 0; pmh = Double.NaN; pml = Double.NaN }
    def update(row: Row): Array[Any] = {
      val c = d(row, iC)
      val mh = if (isN(row, iMh)) Double.NaN else d(row, iMh)
      val ml = if (isN(row, iMl)) Double.NaN else d(row, iMl)
      val out: Array[Any] =
        if (pmh.isNaN || pml.isNaN) Array(null, null, null)
        else {
          if (c > pmh) trend = 1 else if (c < pml) trend = -1
          if (trend == 0) Array(null, null, null)
          else if (trend == 1) Array(ml, ml, null)
          else Array(mh, null, mh)
        }
      pmh = mh; pml = ml
      out
    }
  }
}
