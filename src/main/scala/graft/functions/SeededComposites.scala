package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Single-expression spellings of the seeded-EW composite indicators
  * (SQL surface phase 2, SURVEY.md §2.C).
  *
  * The staged Scala builders (stage.ema, Ta.rsi, Ta.macd) stack
  * projections because window expressions can't nest inside one
  * projection — ema is `ewm` over a column that itself needs `row_number`
  * and a rolling mean. That exclusion made the composites unreachable
  * from pure SQL (TaSqlSurface round-7 stopped at the primitive
  * families). The resolution here is not an analyzer rewrite but a
  * collapse of each composite into ONE running-frame window aggregate:
  * every stage of the composite is a per-row state update, so the whole
  * pipeline is a single O(1)-state fold over the canonical
  * (series_id, ts) frame — the same AggregateWindowFunction shape as
  * [[LinRecur]], with a few more buffer slots.
  *
  * Arithmetic is REPLICATED OPERATION-FOR-OPERATION from the staged
  * spellings (same If trees, same literal alphas, same add/multiply
  * order), so the single-expression results are bit-identical to the
  * staged columns and pass the same DuckDB oracles. Each class is a
  * DeclarativeAggregate — pure expression updates, no custom buffer
  * boxing — and the one window spec keeps a multi-composite SQL batch
  * on a single Exchange + Sort (PlanShapeSpec gate).
  */
object SeededComposites {

  private val nullD = Literal.create(null, DoubleType)

  /** The `ewm(adjust=False)` per-row update, LinRecur's exact If tree
    * specialized to a constant alpha: seed at first non-null, skip null
    * inputs, else y := (1-α)·y + α·v. */
  private def ewmStep(acc: Expression, v: Expression, alpha: Double): Expression =
    If(
      IsNull(acc),
      v,
      If(
        IsNull(v),
        acc,
        Add(Multiply(Literal(1.0 - alpha), acc), Multiply(Literal(alpha), v))
      )
    )

  /** pandas-ta ema(src, n) with sma seeding, as ONE window aggregate —
    * the fold form of stage.ema (stage.scala:19): positions 0..n-2 emit
    * null, position n-1 seeds with the nulls-skipped mean of the first n
    * inputs, then the adjust=False recurrence. Buffer: row position,
    * seed sum/count (accumulated with Sum/Average's exact coalesce
    * arithmetic), and the EW accumulator. */
  case class EmaSeeded(x: Expression, n: Int) extends AggregateWindowFunction {
    private val alpha = 2.0 / (n + 1)
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_ema_k"

    private lazy val pos = AttributeReference("emaPos", LongType, nullable = false)()
    private lazy val s = AttributeReference("emaSeedSum", DoubleType, nullable = true)()
    private lazy val c = AttributeReference("emaSeedCnt", LongType, nullable = false)()
    private lazy val y = AttributeReference("emaAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pos, s, c, y)
    override val initialValues: Seq[Expression] =
      Seq(Literal(0L), nullD, Literal(0L), nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val nL = Literal(n.toLong)
      val posN = Add(pos, Literal(1L))
      // Sum's update spelling (coalesce(coalesce(s,0)+x, s)) over the
      // first n rows only — matches avg(x) OVER (first-n frame) at row n
      val sN = If(LessThan(pos, nL), Coalesce(Seq(Add(Coalesce(Seq(s, Literal(0.0))), x), s)), s)
      val cN = If(And(LessThan(pos, nL), IsNotNull(x)), Add(c, Literal(1L)), c)
      val sd = Divide(sN, Cast(cN, DoubleType))
      val z = If(LessThan(posN, nL), nullD, If(EqualTo(posN, nL), sd, x))
      Seq(posN, sN, cN, ewmStep(y, z, alpha))
    }
    override lazy val evaluateExpression: Expression = y
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): EmaSeeded =
      copy(x = c0(0))
  }

  /** pandas-ta rsi(src, n), as ONE window aggregate — the fold form of
    * Ta.rsiAs (Ta.scala:393): dd = diff(src) via a prev-value buffer
    * slot, up/dn gains via the same If trees, two Wilder accumulators
    * (ewm alpha=1/n) masked until n non-null diffs, then
    * 100·sdiv(ru, ru+rd) with sdiv's null-on-zero-denominator. */
  case class RsiSeeded(x: Expression, n: Int) extends AggregateWindowFunction {
    private val alpha = 1.0 / n
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_rsi_k"

    private lazy val prevX = AttributeReference("rsiPrev", DoubleType, nullable = true)()
    private lazy val cnt = AttributeReference("rsiCnt", LongType, nullable = false)()
    private lazy val yUp = AttributeReference("rsiUpAcc", DoubleType, nullable = true)()
    private lazy val yDn = AttributeReference("rsiDnAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(prevX, cnt, yUp, yDn)
    override val initialValues: Seq[Expression] =
      Seq(nullD, Literal(0L), nullD, nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val dd = Subtract(x, prevX) // null on first row / null neighbor — diff semantics
      val up = If(IsNull(dd), nullD, If(GreaterThan(dd, Literal(0.0)), dd, Literal(0.0)))
      val dn = If(IsNull(dd), nullD, If(LessThan(dd, Literal(0.0)), UnaryMinus(dd), Literal(0.0)))
      Seq(
        x, // prev := current, null or not (lag(x,1) keeps nulls)
        If(IsNotNull(dd), Add(cnt, Literal(1L)), cnt),
        ewmStep(yUp, up, alpha),
        ewmStep(yDn, dn, alpha)
      )
    }
    override lazy val evaluateExpression: Expression = {
      // rmaOf's cumcount-gate: up/dn are null together, one counter covers both
      val gate = GreaterThanOrEqual(cnt, Literal(n.toLong))
      val ru = If(gate, yUp, nullD)
      val rd = If(gate, yDn, nullD)
      val den = Add(ru, rd)
      Multiply(Literal(100.0), Divide(ru, If(Not(EqualTo(den, Literal(0.0))), den, nullD)))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): RsiSeeded =
      copy(x = c0(0))
  }

  /** Shared machinery for CASCADED seeded emas (dema/tema): level i+1
    * runs the full sma-seeded ema fold over level i's output, exactly as
    * the staged spelling chains stage.ema calls (each level re-derives
    * the positional gate from the same row numbering and seeds on the
    * nulls-skipped mean of the previous level's first n values — for
    * level ≥ 2 that is effectively the single value the previous level
    * emits at the seed row). Buffer: one position plus (sum, count, acc)
    * per level. */
  sealed abstract class EmaCascade(levels: Int) extends AggregateWindowFunction {
    def x: Expression
    def n: Int
    private lazy val alpha = 2.0 / (n + 1)
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    protected lazy val pos = AttributeReference("casPos", LongType, nullable = false)()
    protected lazy val ss =
      (1 to levels).map(i => AttributeReference(s"casSum$i", DoubleType, nullable = true)())
    protected lazy val cs =
      (1 to levels).map(i => AttributeReference(s"casCnt$i", LongType, nullable = false)())
    protected lazy val ys =
      (1 to levels).map(i => AttributeReference(s"casAcc$i", DoubleType, nullable = true)())
    override def aggBufferAttributes: Seq[AttributeReference] =
      pos +: (0 until levels).flatMap(i => Seq(ss(i), cs(i), ys(i)))
    override val initialValues: Seq[Expression] =
      Literal(0L) +: (1 to levels).flatMap(_ => Seq(nullD, Literal(0L), nullD))
    override lazy val updateExpressions: Seq[Expression] = {
      val nL = Literal(n.toLong)
      val posN = Add(pos, Literal(1L))
      var input: Expression = x
      val per = (0 until levels).flatMap { i =>
        val sN =
          If(LessThan(pos, nL), Coalesce(Seq(Add(Coalesce(Seq(ss(i), Literal(0.0))), input), ss(i))), ss(i))
        val cN = If(And(LessThan(pos, nL), IsNotNull(input)), Add(cs(i), Literal(1L)), cs(i))
        val sd = Divide(sN, Cast(cN, DoubleType))
        val z = If(LessThan(posN, nL), nullD, If(EqualTo(posN, nL), sd, input))
        val yN = ewmStep(ys(i), z, alpha)
        input = yN // next level folds over this level's post-update output
        Seq(sN, cN, yN)
      }
      posN +: per
    }
  }

  /** pandas-ta dema(src, n) = 2·ema − ema(ema) as one cascaded fold —
    * mirror of the staged qDema chain (2e0·e1 − e2). */
  case class DemaSeeded(x: Expression, n: Int) extends EmaCascade(2) {
    override def prettyName: String = "graft_dema_k"
    override lazy val evaluateExpression: Expression =
      Subtract(Multiply(Literal(2.0), ys(0)), ys(1))
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): DemaSeeded =
      copy(x = c0(0))
  }

  /** pandas-ta tema(src, n) = 3·e1 − 3·e2 + e3, same cascade one level
    * deeper — mirror of the staged qTema chain. */
  case class TemaSeeded(x: Expression, n: Int) extends EmaCascade(3) {
    override def prettyName: String = "graft_tema_k"
    override lazy val evaluateExpression: Expression =
      Add(Subtract(Multiply(Literal(3.0), ys(0)), Multiply(Literal(3.0), ys(1))), ys(2))
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): TemaSeeded =
      copy(x = c0(0))
  }

  /** pandas-ta macd(src, fast, slow, sig) as ONE window aggregate
    * emitting STRUCT(macd, macds, macdh) — the fold form of Ta.macd
    * (Ta.scala:1179): two unseeded adjust=False ewms of the source, the
    * line as their difference, and a third ewm of the line, all updated
    * per row. The struct output means one window expression serves all
    * three columns; SQL callers project `.macd` / `.macds` / `.macdh`. */
  case class MacdSeeded(x: Expression, fast: Int, slow: Int, sig: Int)
      extends AggregateWindowFunction {
    private val aF = 2.0 / (fast + 1)
    private val aS = 2.0 / (slow + 1)
    private val aG = 2.0 / (sig + 1)
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = StructType(
      Seq(
        StructField("macd", DoubleType),
        StructField("macds", DoubleType),
        StructField("macdh", DoubleType)
      )
    )
    override def nullable: Boolean = false
    override def prettyName: String = "graft_macd_k"

    private lazy val yF = AttributeReference("macdFastAcc", DoubleType, nullable = true)()
    private lazy val yS = AttributeReference("macdSlowAcc", DoubleType, nullable = true)()
    private lazy val yG = AttributeReference("macdSigAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(yF, yS, yG)
    override val initialValues: Seq[Expression] = Seq(nullD, nullD, nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val yFN = ewmStep(yF, x, aF)
      val ySN = ewmStep(yS, x, aS)
      val line = Subtract(yFN, ySN) // staged: macd = e12 - e26, then macds = ewm(macd)
      Seq(yFN, ySN, ewmStep(yG, line, aG))
    }
    override lazy val evaluateExpression: Expression = {
      val line = Subtract(yF, yS)
      CreateNamedStruct(
        Seq(
          Literal("macd"), line,
          Literal("macds"), yG,
          Literal("macdh"), Subtract(line, yG)
        )
      )
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): MacdSeeded =
      copy(x = c0(0))
  }

  // ==================================================================
  // Phase 3 (round 9): the Wilder/rma-seeded composites. Same collapse
  // — every stage is an O(1) per-row state update — with the Wilder
  // accumulator's rmaOf gating (seed at first non-null, mask until n
  // observations) carried by a (count, acc) buffer pair per smoothing.
  // Arithmetic replicates the staged Ta spellings operation-for-
  // operation (WilderFoldSpec proves bit-identity).
  // ==================================================================

  /** One sma-seeded ema level's buffer updates (the EmaSeeded/EmaCascade
    * update, factored so chains with PER-LEVEL lengths — tsi's slow-then-
    * fast — can reuse it): returns the (sum, cnt, acc) update expressions
    * and the post-update accumulator for the next level's input. */
  private def seededLevel(
      pos: Expression, posN: Expression, n: Int,
      s: Expression, cn: Expression, y: Expression, input: Expression
  ): (Seq[Expression], Expression) = {
    val alpha = 2.0 / (n + 1)
    val nL = Literal(n.toLong)
    val sN = If(LessThan(pos, nL), Coalesce(Seq(Add(Coalesce(Seq(s, Literal(0.0))), input), s)), s)
    val cN = If(And(LessThan(pos, nL), IsNotNull(input)), Add(cn, Literal(1L)), cn)
    val sd = Divide(sN, Cast(cN, DoubleType))
    val z = If(LessThan(posN, nL), nullD, If(EqualTo(posN, nL), sd, input))
    val yN = ewmStep(y, z, alpha)
    (Seq(sN, cN, yN), yN)
  }

  /** Wilder rma stage: ewm(alpha=1/n) + a non-null observation count for
    * the rmaOf mask (cumcount(x) ≥ n). Returns (cnt', acc') updates. */
  private def wilderStep(cn: Expression, y: Expression, v: Expression, n: Int): Seq[Expression] =
    Seq(
      If(IsNotNull(v), Add(cn, Literal(1L)), cn),
      ewmStep(y, v, 1.0 / n)
    )

  /** max(h−l, |h−pc|, |l−pc|), null while pc is (mirror Ta.trueRange). */
  private def trOf(h: Expression, l: Expression, pc: Expression): Expression =
    If(
      IsNull(pc),
      nullD,
      Greatest(Seq(Subtract(h, l), Abs(Subtract(h, pc)), Abs(Subtract(l, pc))))
    )

  /** sdiv's exact null-on-zero/null denominator (a / when(b =!= 0, b)). */
  private def sdivE(a: Expression, b: Expression): Expression =
    Divide(a, If(Not(EqualTo(b, Literal(0.0))), b, nullD))

  /** pandas-ta atr(n) = Wilder rma of true range, as ONE fold — the
    * staged Ta.atr spelling (trueRange column + rmaOf) with the prev-
    * close diff carried in a buffer slot. */
  case class AtrFold(h: Expression, l: Expression, c: Expression, n: Int)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_atr_k"

    private lazy val pc = AttributeReference("atrPc", DoubleType, nullable = true)()
    private lazy val cnt = AttributeReference("atrCnt", LongType, nullable = false)()
    private lazy val y = AttributeReference("atrAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pc, cnt, y)
    override val initialValues: Seq[Expression] = Seq(nullD, Literal(0L), nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val tr = trOf(h, l, pc)
      Seq(c) ++ wilderStep(cnt, y, tr, n)
    }
    override lazy val evaluateExpression: Expression =
      If(GreaterThanOrEqual(cnt, Literal(n.toLong)), y, nullD)
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): AtrFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** pandas-ta trix(n) = 100·pctChange(ema³(src, n)) as one fold: the
    * EmaCascade(3) machinery plus a previous-e3 buffer slot standing in
    * for lag(e3, 1). */
  case class TrixFold(x: Expression, n: Int) extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_trix_k"

    private lazy val pos = AttributeReference("trixPos", LongType, nullable = false)()
    private lazy val ss =
      (1 to 3).map(i => AttributeReference(s"trixSum$i", DoubleType, nullable = true)())
    private lazy val cs =
      (1 to 3).map(i => AttributeReference(s"trixCnt$i", LongType, nullable = false)())
    private lazy val ys =
      (1 to 3).map(i => AttributeReference(s"trixAcc$i", DoubleType, nullable = true)())
    private lazy val p3 = AttributeReference("trixPrev", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] =
      pos +: (0 until 3).flatMap(i => Seq(ss(i), cs(i), ys(i))) :+ p3
    override val initialValues: Seq[Expression] =
      (Literal(0L): Expression) +: (1 to 3).flatMap(_ => Seq(nullD, Literal(0L), nullD)) :+ nullD
    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      var input: Expression = x
      val per = (0 until 3).flatMap { i =>
        val (ups, yN) = seededLevel(pos, posN, n, ss(i), cs(i), ys(i), input)
        input = yN
        ups
      }
      // p3 := previous row's e3 (the old accumulator) ≡ lag(e3, 1)
      (posN +: per) :+ ys(2)
    }
    override lazy val evaluateExpression: Expression =
      Multiply(Literal(100.0), Subtract(sdivE(ys(2), p3), Literal(1.0)))
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): TrixFold =
      copy(x = c0(0))
  }

  /** pandas-ta tsi(fast, slow) = 100·ema(ema(Δc,slow),fast) /
    * ema(ema(|Δc|,slow),fast) on sma-seeded chains (Ta.tsi) — one fold:
    * diff via a prev-value slot, then two 2-level seeded-ema chains
    * with PER-LEVEL lengths (slow then fast, the seededLevel reuse). */
  case class TsiFold(x: Expression, fast: Int, slow: Int)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_tsi_k"

    private lazy val pos = AttributeReference("tsiPos", LongType, nullable = false)()
    private lazy val prevX = AttributeReference("tsiPrev", DoubleType, nullable = true)()
    private lazy val ss =
      (1 to 4).map(i => AttributeReference(s"tsiSum$i", DoubleType, nullable = true)())
    private lazy val cs =
      (1 to 4).map(i => AttributeReference(s"tsiCnt$i", LongType, nullable = false)())
    private lazy val ys =
      (1 to 4).map(i => AttributeReference(s"tsiAcc$i", DoubleType, nullable = true)())
    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(pos, prevX) ++ (0 until 4).flatMap(i => Seq(ss(i), cs(i), ys(i)))
    override val initialValues: Seq[Expression] =
      Seq(Literal(0L), nullD) ++ (1 to 4).flatMap(_ => Seq(nullD, Literal(0L), nullD))
    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val dd = Subtract(x, prevX)
      val ad = Abs(Subtract(x, prevX))
      // chain 1: ds = ema(dd, slow) → dss = ema(ds, fast)
      val (u0, y0) = seededLevel(pos, posN, slow, ss(0), cs(0), ys(0), dd)
      val (u1, _) = seededLevel(pos, posN, fast, ss(1), cs(1), ys(1), y0)
      // chain 2: as = ema(|dd|, slow) → ass = ema(as, fast)
      val (u2, y2) = seededLevel(pos, posN, slow, ss(2), cs(2), ys(2), ad)
      val (u3, _) = seededLevel(pos, posN, fast, ss(3), cs(3), ys(3), y2)
      Seq(posN, x) ++ u0 ++ u1 ++ u2 ++ u3
    }
    override lazy val evaluateExpression: Expression =
      Multiply(Literal(100.0), sdivE(ys(1), ys(3)))
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): TsiFold =
      copy(x = c0(0))
  }

  /** pandas-ta adx(n, lensig) as ONE fold emitting STRUCT(dmp, dmn, dip,
    * dim, adx): ±DM and true range feed three Wilder accumulators, DX is
    * computed per row from the freshly-updated (and rmaOf-masked)
    * values, and a fourth Wilder accumulator smooths DX — the staged
    * Ta.adx chain (dm → trueRange → three rmaOf → dx → rmaOf) collapsed
    * into eleven buffer slots. */
  case class AdxFold(h: Expression, l: Expression, c: Expression, n: Int, lensig: Int)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = StructType(Seq(
      StructField("dmp", DoubleType),
      StructField("dmn", DoubleType),
      StructField("dip", DoubleType),
      StructField("dim", DoubleType),
      StructField("adx", DoubleType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_adx_k"

    private lazy val ph = AttributeReference("adxPh", DoubleType, nullable = true)()
    private lazy val pl = AttributeReference("adxPl", DoubleType, nullable = true)()
    private lazy val pc = AttributeReference("adxPc", DoubleType, nullable = true)()
    private lazy val cp = AttributeReference("adxCp", LongType, nullable = false)()
    private lazy val yp = AttributeReference("adxYp", DoubleType, nullable = true)()
    private lazy val cm = AttributeReference("adxCm", LongType, nullable = false)()
    private lazy val ym = AttributeReference("adxYm", DoubleType, nullable = true)()
    private lazy val ct = AttributeReference("adxCt", LongType, nullable = false)()
    private lazy val yt = AttributeReference("adxYt", DoubleType, nullable = true)()
    private lazy val c4 = AttributeReference("adxC4", LongType, nullable = false)()
    private lazy val y4 = AttributeReference("adxY4", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(ph, pl, pc, cp, yp, cm, ym, ct, yt, c4, y4)
    override val initialValues: Seq[Expression] = Seq(
      nullD, nullD, nullD,
      Literal(0L), nullD, Literal(0L), nullD, Literal(0L), nullD, Literal(0L), nullD
    )

    /** rmaOf mask + dip/dim/dx from a given set of (cnt, acc) values —
      * shared between the update (fresh values) and evaluate (buffers). */
    private def dxParts(
        cpE: Expression, ypE: Expression, cmE: Expression, ymE: Expression,
        ctE: Expression, ytE: Expression
    ): (Expression, Expression, Expression, Expression, Expression, Expression) = {
      val nL = Literal(n.toLong)
      val dmp = If(GreaterThanOrEqual(cpE, nL), ypE, nullD)
      val dmn = If(GreaterThanOrEqual(cmE, nL), ymE, nullD)
      val atr = If(GreaterThanOrEqual(ctE, nL), ytE, nullD)
      val dip = Multiply(Literal(100.0), sdivE(dmp, atr))
      val dim = Multiply(Literal(100.0), sdivE(dmn, atr))
      val dx = Multiply(Literal(100.0), sdivE(Abs(Subtract(dip, dim)), Add(dip, dim)))
      (dmp, dmn, dip, dim, atr, dx)
    }

    override lazy val updateExpressions: Seq[Expression] = {
      val up = Subtract(h, ph)
      val dn = UnaryMinus(Subtract(l, pl))
      val nullEither = Or(IsNull(up), IsNull(dn))
      val pdm = If(And(GreaterThan(up, dn), GreaterThan(up, Literal(0.0))), up,
        If(nullEither, nullD, Literal(0.0)))
      val mdm = If(And(GreaterThan(dn, up), GreaterThan(dn, Literal(0.0))), dn,
        If(nullEither, nullD, Literal(0.0)))
      val tr = trOf(h, l, pc)
      val Seq(cpN, ypN) = wilderStep(cp, yp, pdm, n)
      val Seq(cmN, ymN) = wilderStep(cm, ym, mdm, n)
      val Seq(ctN, ytN) = wilderStep(ct, yt, tr, n)
      val (_, _, _, _, _, dx) = dxParts(cpN, ypN, cmN, ymN, ctN, ytN)
      val Seq(c4N, y4N) = wilderStep(c4, y4, dx, lensig)
      Seq(h, l, c, cpN, ypN, cmN, ymN, ctN, ytN, c4N, y4N)
    }

    override lazy val evaluateExpression: Expression = {
      val (dmp, dmn, dip, dim, _, _) = dxParts(cp, yp, cm, ym, ct, yt)
      val adx = If(GreaterThanOrEqual(c4, Literal(lensig.toLong)), y4, nullD)
      CreateNamedStruct(Seq(
        Literal("dmp"), dmp,
        Literal("dmn"), dmn,
        Literal("dip"), dip,
        Literal("dim"), dim,
        Literal("adx"), adx
      ))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): AdxFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  // ==================================================================
  // Phase 5 (round 10): the cumulative volume composites whose staged
  // spellings put a window expression (diff / pctChange) INSIDE cumsum —
  // the same window-in-window exclusion the seeded composites had. Each
  // collapses into one fold with a prev-close buffer slot; arithmetic
  // replicates the Ta accessor operation-for-operation, including Sum's
  // exact coalesce update for the running total.
  // ==================================================================

  /** Sum's window-aggregate update: acc := coalesce(coalesce(acc,0)+v, acc)
    * — accumulates non-null v, stays null until the first one. */
  private def sumStep(acc: Expression, v: Expression): Expression =
    Coalesce(Seq(Add(Coalesce(Seq(acc, Literal(0.0))), v), acc))

  /** pandas-ta obv = cumsum(sign(Δclose)·volume), first row +volume —
    * Ta.obv's when-chain (null Δ counts 0) over a prev-close slot. */
  case class ObvFold(c: Expression, v: Expression) extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(c, v)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_obv_k"

    private lazy val pos = AttributeReference("obvPos", LongType, nullable = false)()
    private lazy val pc = AttributeReference("obvPc", DoubleType, nullable = true)()
    private lazy val acc = AttributeReference("obvAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pos, pc, acc)
    override val initialValues: Seq[Expression] = Seq(Literal(0L), nullD, nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val dc = Subtract(c, pc)
      val sgn = If(
        EqualTo(pos, Literal(0L)),
        Literal(1.0),
        If(GreaterThan(dc, Literal(0.0)), Literal(1.0),
          If(LessThan(dc, Literal(0.0)), Literal(-1.0), Literal(0.0)))
      )
      Seq(Add(pos, Literal(1L)), c, sumStep(acc, Multiply(sgn, v)))
    }
    override lazy val evaluateExpression: Expression = acc
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): ObvFold =
      copy(c = c0(0), v = c0(1))
  }

  /** pandas-ta pvt = cumsum(coalesce(pctChange(close)·volume, 0)) —
    * Ta.pvt with the 1-lag carried in a buffer slot. */
  case class PvtFold(c: Expression, v: Expression) extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(c, v)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_pvt_k"

    private lazy val pc = AttributeReference("pvtPc", DoubleType, nullable = true)()
    private lazy val acc = AttributeReference("pvtAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pc, acc)
    override val initialValues: Seq[Expression] = Seq(nullD, nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val pct = Subtract(sdivE(c, pc), Literal(1.0))
      val r = Coalesce(Seq(Multiply(pct, v), Literal(0.0)))
      Seq(c, sumStep(acc, r))
    }
    override lazy val evaluateExpression: Expression = acc
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): PvtFold =
      copy(c = c0(0), v = c0(1))
  }

  /** pandas-ta efi(n) = sma-seeded ema of Δclose·volume — Ta.efi's
    * staged chain (diff column + stage.ema) as one fold: a prev-close
    * slot feeds the EmaSeeded machinery. */
  case class EfiFold(c: Expression, v: Expression, n: Int) extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(c, v)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_efi_k"

    private lazy val pc = AttributeReference("efiPc", DoubleType, nullable = true)()
    private lazy val pos = AttributeReference("efiPos", LongType, nullable = false)()
    private lazy val s = AttributeReference("efiSeedSum", DoubleType, nullable = true)()
    private lazy val cn = AttributeReference("efiSeedCnt", LongType, nullable = false)()
    private lazy val y = AttributeReference("efiAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pc, pos, s, cn, y)
    override val initialValues: Seq[Expression] =
      Seq(nullD, Literal(0L), nullD, Literal(0L), nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val f = Multiply(Subtract(c, pc), v)
      val (ups, _) = seededLevel(pos, posN, n, s, cn, y, f)
      Seq(c, posN) ++ ups
    }
    override lazy val evaluateExpression: Expression = y
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): EfiFold =
      copy(c = c0(0), v = c0(1))
  }

  // ==================================================================
  // Phase 6 (round 10): the remaining window-in-window composites —
  // Wilder DM, the decay recursion, NVI/PVI log-compounding, the
  // seeded-ema-of-derived-series family (true-range ema for pgo, A/D
  // oscillator, T3's six-level cascade, PVO). Same replication
  // discipline: If trees and literal orders mirror the Ta accessors.
  // ==================================================================

  /** Ta.dm: ±DM Wilder-smoothed (rmaOf gate at n non-null observations),
    * STRUCT(dmp, dmn) — AdxFold's first two accumulators standalone. */
  case class DmFold(h: Expression, l: Expression, n: Int) extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l)
    override def dataType: DataType = StructType(Seq(
      StructField("dmp", DoubleType),
      StructField("dmn", DoubleType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_dm_k"

    private lazy val ph = AttributeReference("dmPh", DoubleType, nullable = true)()
    private lazy val pl = AttributeReference("dmPl", DoubleType, nullable = true)()
    private lazy val cp = AttributeReference("dmCp", LongType, nullable = false)()
    private lazy val yp = AttributeReference("dmYp", DoubleType, nullable = true)()
    private lazy val cm = AttributeReference("dmCm", LongType, nullable = false)()
    private lazy val ym = AttributeReference("dmYm", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(ph, pl, cp, yp, cm, ym)
    override val initialValues: Seq[Expression] =
      Seq(nullD, nullD, Literal(0L), nullD, Literal(0L), nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val up = Subtract(h, ph)
      val dn = UnaryMinus(Subtract(l, pl))
      val nullEither = Or(IsNull(up), IsNull(dn))
      val pdm = If(And(GreaterThan(up, dn), GreaterThan(up, Literal(0.0))), up,
        If(nullEither, nullD, Literal(0.0)))
      val mdm = If(And(GreaterThan(dn, up), GreaterThan(dn, Literal(0.0))), dn,
        If(nullEither, nullD, Literal(0.0)))
      Seq(h, l) ++ wilderStep(cp, yp, pdm, n) ++ wilderStep(cm, ym, mdm, n)
    }
    override lazy val evaluateExpression: Expression = {
      val nL = Literal(n.toLong)
      CreateNamedStruct(Seq(
        Literal("dmp"), If(GreaterThanOrEqual(cp, nL), yp, nullD),
        Literal("dmn"), If(GreaterThanOrEqual(cm, nL), ym, nullD)
      ))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): DmFold =
      copy(h = c0(0), l = c0(1))
  }

  /** Ta.decay's recursion y = max(x, y'−1/n, 0) as a direct fold (the
    * accessor uses the associative closed form — equal values, FP order
    * differs within the 6 dp contract; Greatest's null-skip reproduces
    * the closed form's null handling: leading null x emits 0). */
  case class DecayFold(x: Expression, n: Int) extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_decay_k"

    private lazy val y = AttributeReference("decayAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(y)
    override val initialValues: Seq[Expression] = Seq(nullD)
    override lazy val updateExpressions: Seq[Expression] =
      Seq(Greatest(Seq(x, Subtract(y, Literal(1.0 / n)), Literal(0.0))))
    override lazy val evaluateExpression: Expression = y
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): DecayFold =
      copy(x = c0(0))
  }

  /** Ta.nvi/pvi: initial·exp(Σ log1p(pctChange(close)·1{Δvolume ≶ 0})) —
    * the lag-bearing term folds over prev-close/prev-volume slots. */
  case class NviFold(c: Expression, v: Expression, onDown: Boolean, initial: Double)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(c, v)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = if (onDown) "graft_nvi_k" else "graft_pvi_k"

    private lazy val pc = AttributeReference("nviPc", DoubleType, nullable = true)()
    private lazy val pv = AttributeReference("nviPv", DoubleType, nullable = true)()
    private lazy val acc = AttributeReference("nviAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pc, pv, acc)
    override val initialValues: Seq[Expression] = Seq(nullD, nullD, nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val ret = Subtract(sdivE(c, pc), Literal(1.0))
      val dv = Subtract(v, pv)
      val gate =
        if (onDown) LessThan(dv, Literal(0.0)) else GreaterThan(dv, Literal(0.0))
      val term = If(
        And(gate, IsNotNull(ret)),
        Log(Add(Literal(1.0), ret)),
        Literal(0.0)
      )
      Seq(c, v, sumStep(acc, term))
    }
    override lazy val evaluateExpression: Expression =
      Multiply(Literal(initial), Exp(acc))
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): NviFold =
      copy(c = c0(0), v = c0(1))
  }

  /** sma-seeded ema of the TRUE RANGE (pgo's denominator, Ta.pgo's
    * stage.ema over the trueRange column) as one fold. */
  case class EtrFold(h: Expression, l: Expression, c: Expression, n: Int)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_etr_k"

    private lazy val pc = AttributeReference("etrPc", DoubleType, nullable = true)()
    private lazy val pos = AttributeReference("etrPos", LongType, nullable = false)()
    private lazy val s = AttributeReference("etrSum", DoubleType, nullable = true)()
    private lazy val cn = AttributeReference("etrCnt", LongType, nullable = false)()
    private lazy val y = AttributeReference("etrAcc", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pc, pos, s, cn, y)
    override val initialValues: Seq[Expression] =
      Seq(nullD, Literal(0L), nullD, Literal(0L), nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val (ups, _) = seededLevel(pos, posN, n, s, cn, y, trOf(h, l, pc))
      Seq(c, posN) ++ ups
    }
    override lazy val evaluateExpression: Expression = y
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): EtrFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** Ta.adosc: ema(ad, fast) − ema(ad, slow) over the running A/D line —
    * the cumulative ad accumulator feeds two seeded-ema levels in the
    * same buffer. */
  case class AdoscFold(h: Expression, l: Expression, c: Expression, v: Expression,
      fast: Int, slow: Int) extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l, c, v)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_adosc_k"

    private lazy val pos = AttributeReference("adoPos", LongType, nullable = false)()
    private lazy val ad = AttributeReference("adoAd", DoubleType, nullable = true)()
    private lazy val sF = AttributeReference("adoSumF", DoubleType, nullable = true)()
    private lazy val cF = AttributeReference("adoCntF", LongType, nullable = false)()
    private lazy val yF = AttributeReference("adoAccF", DoubleType, nullable = true)()
    private lazy val sS = AttributeReference("adoSumS", DoubleType, nullable = true)()
    private lazy val cS = AttributeReference("adoCntS", LongType, nullable = false)()
    private lazy val yS = AttributeReference("adoAccS", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(pos, ad, sF, cF, yF, sS, cS, yS)
    override val initialValues: Seq[Expression] =
      Seq(Literal(0L), nullD, nullD, Literal(0L), nullD, nullD, Literal(0L), nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val clv = If(
        Not(EqualTo(h, l)),
        Divide(Subtract(Subtract(c, l), Subtract(h, c)), Subtract(h, l)),
        Literal(0.0)
      )
      val adN = sumStep(ad, Multiply(clv, v))
      val (uF, _) = seededLevel(pos, posN, fast, sF, cF, yF, adN)
      val (uS, _) = seededLevel(pos, posN, slow, sS, cS, yS, adN)
      Seq(posN, adN) ++ uF ++ uS
    }
    override lazy val evaluateExpression: Expression = Subtract(yF, yS)
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): AdoscFold =
      copy(h = c0(0), l = c0(1), c = c0(2), v = c0(3))
  }

  /** Ta.t3: six chained sma-seeded emas with the Tillson coefficients on
    * e3..e6.
    *
    * NOT EmaCascade(6): the cascade's per-level update embeds the
    * previous level's full tree ~7× (seed sum + count + z + ewmStep
    * references), so six levels explode to ~7⁶ nodes — subexpression
    * elimination then hangs hashing the tree (measured: a 30-row query
    * never finished). The SHARED-n cascade admits a flat spelling:
    * every level's input is null until row n and equals sd₁ (the x seed
    * mean) AT row n — level i ≥ 2's seed sum therefore holds exactly one
    * value, sd₁, so sdᵢ = sd₁/1 = sd₁ bit-exactly and the per-level
    * (sum, cnt) buffers are redundant. One (s, c) pair for x plus the
    * shared z-gate keeps each level's tree referencing the previous
    * level ~3× on a SMALL z node — ~3⁶ small copies, evaluable.
    * Bit-equality vs the staged six-ema chain is spec-gated
    * (WilderFoldSpec / x_sql_surface11's qT3 oracle). */
  case class T3Fold(x: Expression, n: Int, a: Double) extends AggregateWindowFunction {
    private val alpha = 2.0 / (n + 1)
    override def children: Seq[Expression] = Seq(x)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_t3_k"

    private lazy val pos = AttributeReference("t3Pos", LongType, nullable = false)()
    private lazy val s = AttributeReference("t3SeedSum", DoubleType, nullable = true)()
    private lazy val cn = AttributeReference("t3SeedCnt", LongType, nullable = false)()
    private lazy val ys =
      (1 to 6).map(i => AttributeReference(s"t3Acc$i", DoubleType, nullable = true)())
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(pos, s, cn) ++ ys
    override val initialValues: Seq[Expression] =
      Seq(Literal(0L), nullD, Literal(0L)) ++ (1 to 6).map(_ => nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val nL = Literal(n.toLong)
      val posN = Add(pos, Literal(1L))
      val sN = If(LessThan(pos, nL), Coalesce(Seq(Add(Coalesce(Seq(s, Literal(0.0))), x), s)), s)
      val cN = If(And(LessThan(pos, nL), IsNotNull(x)), Add(cn, Literal(1L)), cn)
      val sd = Divide(sN, Cast(cN, DoubleType))
      def zOf(input: Expression): Expression =
        If(LessThan(posN, nL), nullD, If(EqualTo(posN, nL), sd, input))
      var input: Expression = x
      val yNs = (0 until 6).map { i =>
        val yN = ewmStep(ys(i), zOf(input))
        input = yN
        yN
      }
      Seq(posN, sN, cN) ++ yNs
    }
    private def ewmStep(acc: Expression, z: Expression): Expression =
      If(
        IsNull(acc),
        z,
        If(
          IsNull(z),
          acc,
          Add(Multiply(Literal(1.0 - alpha), acc), Multiply(Literal(alpha), z))
        )
      )
    override lazy val evaluateExpression: Expression = {
      val c1 = -a * a * a
      val c2 = 3.0 * a * a + 3.0 * a * a * a
      val c3 = -6.0 * a * a - 3.0 * a - 3.0 * a * a * a
      val c4 = 1.0 + 3.0 * a + a * a * a + 3.0 * a * a
      Add(
        Add(
          Add(Multiply(Literal(c1), ys(5)), Multiply(Literal(c2), ys(4))),
          Multiply(Literal(c3), ys(3))
        ),
        Multiply(Literal(c4), ys(2))
      )
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): T3Fold =
      copy(x = c0(0))
  }

  /** Ta.pvo: sma-seeded emas over volume, the oscillator, and a third
    * seeded ema of the oscillator — STRUCT(pvo, pvos, pvoh). */
  case class PvoFold(v: Expression, fast: Int, slow: Int, sig: Int)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(v)
    override def dataType: DataType = StructType(Seq(
      StructField("pvo", DoubleType),
      StructField("pvos", DoubleType),
      StructField("pvoh", DoubleType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_pvo_k"

    private lazy val pos = AttributeReference("pvoPos", LongType, nullable = false)()
    private lazy val sF = AttributeReference("pvoSumF", DoubleType, nullable = true)()
    private lazy val cF = AttributeReference("pvoCntF", LongType, nullable = false)()
    private lazy val yF = AttributeReference("pvoAccF", DoubleType, nullable = true)()
    private lazy val sS = AttributeReference("pvoSumS", DoubleType, nullable = true)()
    private lazy val cS = AttributeReference("pvoCntS", LongType, nullable = false)()
    private lazy val yS = AttributeReference("pvoAccS", DoubleType, nullable = true)()
    private lazy val sG = AttributeReference("pvoSumG", DoubleType, nullable = true)()
    private lazy val cG = AttributeReference("pvoCntG", LongType, nullable = false)()
    private lazy val yG = AttributeReference("pvoAccG", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(pos, sF, cF, yF, sS, cS, yS, sG, cG, yG)
    override val initialValues: Seq[Expression] =
      Seq(Literal(0L)) ++ (1 to 3).flatMap(_ => Seq(nullD, Literal(0L), nullD))
    private def pvoOf(f: Expression, s0: Expression): Expression =
      Multiply(Literal(100.0), sdivE(Subtract(f, s0), s0))
    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val (uF, yFN) = seededLevel(pos, posN, fast, sF, cF, yF, v)
      val (uS, ySN) = seededLevel(pos, posN, slow, sS, cS, yS, v)
      val (uG, _) = seededLevel(pos, posN, sig, sG, cG, yG, pvoOf(yFN, ySN))
      Seq(posN) ++ uF ++ uS ++ uG
    }
    override lazy val evaluateExpression: Expression = {
      val p = pvoOf(yF, yS)
      CreateNamedStruct(Seq(
        Literal("pvo"), p,
        Literal("pvos"), yG,
        Literal("pvoh"), Subtract(p, yG)
      ))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): PvoFold =
      copy(v = c0(0))
  }

  /** Keltner channel (Ta.kc: sma-seeded ema basis over close + sma-seeded
    * ema band over the true range) as ONE fold emitting STRUCT(kcb, kcl,
    * kcu) — the true range derives from a prev-close slot, so the whole
    * two-chain composite needs no staged columns. */
  case class KcFold(h: Expression, l: Expression, c: Expression, n: Int, scalar: Double)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = StructType(Seq(
      StructField("kcb", DoubleType),
      StructField("kcl", DoubleType),
      StructField("kcu", DoubleType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kc_k"

    private lazy val pos = AttributeReference("kcPos", LongType, nullable = false)()
    private lazy val pc = AttributeReference("kcPc", DoubleType, nullable = true)()
    private lazy val s1 = AttributeReference("kcSum1", DoubleType, nullable = true)()
    private lazy val c1 = AttributeReference("kcCnt1", LongType, nullable = false)()
    private lazy val y1 = AttributeReference("kcAcc1", DoubleType, nullable = true)()
    private lazy val s2 = AttributeReference("kcSum2", DoubleType, nullable = true)()
    private lazy val c2 = AttributeReference("kcCnt2", LongType, nullable = false)()
    private lazy val y2 = AttributeReference("kcAcc2", DoubleType, nullable = true)()
    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(pos, pc, s1, c1, y1, s2, c2, y2)
    override val initialValues: Seq[Expression] =
      Seq(Literal(0L), nullD, nullD, Literal(0L), nullD, nullD, Literal(0L), nullD)
    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val tr = trOf(h, l, pc)
      val (u1, _) = seededLevel(pos, posN, n, s1, c1, y1, c)
      val (u2, _) = seededLevel(pos, posN, n, s2, c2, y2, tr)
      Seq(posN, c) ++ u1 ++ u2
    }
    override lazy val evaluateExpression: Expression =
      CreateNamedStruct(Seq(
        Literal("kcb"), y1,
        Literal("kcl"), Subtract(y1, Multiply(Literal(scalar), y2)),
        Literal("kcu"), Add(y1, Multiply(Literal(scalar), y2))
      ))
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): KcFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }
}
