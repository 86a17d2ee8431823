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
}
