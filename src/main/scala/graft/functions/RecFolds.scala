package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Round-9 extension of the SeededComposites fold layer to the
  * BRANCHING per-row state machines (SURVEY.md §2.A REC class): psar and
  * supertrend, previously only reachable through rec.Psar/rec.Supertrend
  * mapPartitions kernels (graft.ta.rec). Both have O(1) state whose
  * update is a pure If-tree over the previous state — exactly the shape
  * a DeclarativeAggregate window buffer expresses — so each collapses
  * into ONE AggregateWindowFunction over the canonical
  * (series_id, ts) running frame.
  *
  * Why fold instead of mapPartitions (round-8 verdict #1):
  *  - a mixed W+REC Strategy batch stops paying a second Exchange —
  *    rec.perSeriesBatch re-`repartition(series_id)`s what the WindowExec
  *    already partitioned (PlanShapeSpec gate: sma+psar = one Exchange);
  *  - the canonical hard cases become SQL-callable (`graft_psar`,
  *    `graft_supertrend`);
  *  - the fold stays inside Tungsten rows (no Row boxing per row).
  *
  * Arithmetic is REPLICATED OPERATION-FOR-OPERATION from the kernel
  * spellings (rec.scala:112 Psar, rec.scala:172 Supertrend), which stay
  * as the spec references RecFoldSpec proves bit-identity against —
  * same If trees, same add/multiply order, same Least/Greatest nesting.
  * Contract shared with the kernels: non-null high/low/close (bars
  * schema); ring-buffer kernels (jma, rsx) stay on mapPartitions —
  * their state is not O(1) expression slots.
  */
object RecFolds {

  private val nullD = Literal.create(null, DoubleType)
  private val nullI = Literal.create(null, IntegerType)

  /** Parabolic SAR (reference: pandas_ta/trend/psar.py, declared spec
    * SURVEY §2.B) as ONE window fold emitting STRUCT(long, short, af,
    * rev). State machine = rec.Psar verbatim: row 1 records the seed
    * bars and emits nulls; row 2 picks the trend from close₁ ≥ close₀
    * and seeds sar/ep; row ≥ 3 steps sar += af·(ep − sar) clamped to
    * the prior two lows (rising) / highs (falling) and bumps af on a
    * new extreme; every row ≥ 2 then runs the shared reversal stage
    * (price crossing sar flips the trend, sar := ep, af := af0). */
  case class PsarFold(h: Expression, l: Expression, c: Expression,
      af0: Double, afStep: Double, maxAf: Double)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = StructType(Seq(
      StructField("long", DoubleType),
      StructField("short", DoubleType),
      StructField("af", DoubleType),
      StructField("rev", IntegerType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_psar_k"

    private lazy val pos = AttributeReference("psarPos", LongType, nullable = false)()
    private lazy val rising = AttributeReference("psarRising", BooleanType, nullable = false)()
    private lazy val sar = AttributeReference("psarSar", DoubleType, nullable = false)()
    private lazy val ep = AttributeReference("psarEp", DoubleType, nullable = false)()
    private lazy val af = AttributeReference("psarAf", DoubleType, nullable = false)()
    private lazy val ph1 = AttributeReference("psarPh1", DoubleType, nullable = false)()
    private lazy val ph2 = AttributeReference("psarPh2", DoubleType, nullable = false)()
    private lazy val pl1 = AttributeReference("psarPl1", DoubleType, nullable = false)()
    private lazy val pl2 = AttributeReference("psarPl2", DoubleType, nullable = false)()
    private lazy val pc = AttributeReference("psarPc", DoubleType, nullable = false)()
    private lazy val rev = AttributeReference("psarRev", IntegerType, nullable = false)()
    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(pos, rising, sar, ep, af, ph1, ph2, pl1, pl2, pc, rev)
    override val initialValues: Seq[Expression] = Seq(
      Literal(0L), Literal(false), Literal(0.0), Literal(0.0), Literal(0.0),
      Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0), Literal(0)
    )

    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val isRow1 = EqualTo(posN, Literal(1L))
      val isRow2 = EqualTo(posN, Literal(2L))
      // stage A: row-2 seed or row-≥3 step (kernel lines n==2 / else)
      val seedRising = GreaterThanOrEqual(c, pc) // close ≥ close₀ (pc = row-1 close)
      val risingA = If(isRow2, seedRising, rising)
      val sarStep = Add(sar, Multiply(af, Subtract(ep, sar)))
      val sarClamped = If(rising,
        Least(Seq(sarStep, Least(Seq(pl1, pl2)))),
        Greatest(Seq(sarStep, Greatest(Seq(ph1, ph2)))))
      val sarA = If(isRow2, If(seedRising, pl1, ph1), sarClamped) // seed: l₀ / h₀
      val newExtreme = If(rising, GreaterThan(h, ep), LessThan(l, ep))
      val epA = If(isRow2,
        If(seedRising, Greatest(Seq(ph1, h)), Least(Seq(pl1, l))), // max(h₀,h) / min(l₀,l)
        If(newExtreme, If(rising, h, l), ep))
      val afA = If(isRow2, Literal(af0),
        If(newExtreme, Least(Seq(Add(af, Literal(afStep)), Literal(maxAf))), af))
      // stage B: shared reversal (kernel: rising && l < sar → flip, etc.)
      val revB = Or(And(risingA, LessThan(l, sarA)), And(Not(risingA), GreaterThan(h, sarA)))
      val risingN = If(revB, Not(risingA), risingA)
      val sarN = If(revB, epA, sarA)
      val epN = If(revB, If(risingA, l, h), epA)
      val afN = If(revB, Literal(af0), afA)
      Seq(
        posN,
        If(isRow1, Literal(false), risingN),
        If(isRow1, Literal(0.0), sarN),
        If(isRow1, Literal(0.0), epN),
        If(isRow1, Literal(0.0), afN),
        h, // ph1 := h always (kernel: prevHi1 = h)
        If(isRow1, h, ph1), // row 1 seeds prevHi2 = h, later rows carry old ph1
        l,
        If(isRow1, l, pl1),
        c,
        If(isRow1, Literal(0), If(revB, Literal(1), Literal(0)))
      )
    }

    override lazy val evaluateExpression: Expression = {
      val live = GreaterThanOrEqual(pos, Literal(2L)) // row 1 emits nulls
      CreateNamedStruct(Seq(
        Literal("long"), If(And(live, rising), sar, nullD),
        Literal("short"), If(And(live, Not(rising)), sar, nullD),
        Literal("af"), If(live, af, nullD),
        Literal("rev"), If(live, rev, nullI)
      ))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): PsarFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** Supertrend (reference: pandas_ta/overlap/supertrend.py, declared
    * spec) as ONE window fold emitting STRUCT(st, dir, long, short).
    * State machine = rec.Supertrend verbatim: in-fold Wilder ATR over
    * the true range (seed tr₁, recurrence (1−1/n)·atr + tr/n), bands
    * ub/lb = hl2 ± mult·atr with the monotone carry gated on the prior
    * close, direction flip when close crosses the carried band. Null
    * until n true ranges are seen (row n+1). haveBands is positional
    * (pos ≥ n+1), so no boolean slot is needed. */
  case class SupertrendFold(h: Expression, l: Expression, c: Expression,
      n: Int, mult: Double)
      extends AggregateWindowFunction {
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = StructType(Seq(
      StructField("st", DoubleType),
      StructField("dir", IntegerType),
      StructField("long", DoubleType),
      StructField("short", DoubleType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_supertrend_k"

    private lazy val pos = AttributeReference("stPos", LongType, nullable = false)()
    private lazy val atr = AttributeReference("stAtr", DoubleType, nullable = false)()
    private lazy val pc = AttributeReference("stPc", DoubleType, nullable = false)()
    private lazy val ub = AttributeReference("stUb", DoubleType, nullable = false)()
    private lazy val lb = AttributeReference("stLb", DoubleType, nullable = false)()
    private lazy val dir = AttributeReference("stDir", IntegerType, nullable = false)()
    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(pos, atr, pc, ub, lb, dir)
    override val initialValues: Seq[Expression] = Seq(
      Literal(0L), Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0), Literal(1)
    )

    override lazy val updateExpressions: Seq[Expression] = {
      val posN = Add(pos, Literal(1L))
      val isRow1 = EqualTo(posN, Literal(1L))
      val nL = Literal((n + 1).toLong) // first band row
      // tr/atr from row 2 (kernel: trCount == 1 seeds atr = tr)
      val tr = Greatest(Seq(Subtract(h, l),
        Greatest(Seq(Abs(Subtract(h, pc)), Abs(Subtract(l, pc))))))
      val atrN = If(EqualTo(posN, Literal(2L)), tr,
        Add(Multiply(Literal(1.0 - 1.0 / n), atr), Divide(tr, Literal(n.toDouble))))
      // bands from row n+1; carry gated on prior close vs PRIOR bands
      val hl2 = Divide(Add(h, l), Literal(2.0))
      val nub0 = Add(hl2, Multiply(Literal(mult), atrN))
      val nlb0 = Subtract(hl2, Multiply(Literal(mult), atrN))
      val haveB = GreaterThanOrEqual(pos, nL) // bands existed before this row
      val nlb = If(And(haveB, And(LessThan(nlb0, lb), GreaterThan(pc, lb))), lb, nlb0)
      val nub = If(And(haveB, And(GreaterThan(nub0, ub), LessThan(pc, ub))), ub, nub0)
      val dirN = If(haveB,
        If(GreaterThan(c, ub), Literal(1), If(LessThan(c, lb), Literal(-1), dir)),
        Literal(1))
      val inBand = GreaterThanOrEqual(posN, nL)
      Seq(
        posN,
        If(isRow1, atr, atrN),
        c,
        If(inBand, nub, ub),
        If(inBand, nlb, lb),
        If(inBand, dirN, dir)
      )
    }

    override lazy val evaluateExpression: Expression = {
      val live = GreaterThanOrEqual(pos, Literal((n + 1).toLong))
      val isUp = EqualTo(dir, Literal(1))
      CreateNamedStruct(Seq(
        Literal("st"), If(live, If(isUp, lb, ub), nullD),
        Literal("dir"), If(live, dir, nullI),
        Literal("long"), If(And(live, isUp), lb, nullD),
        Literal("short"), If(And(live, Not(isUp)), ub, nullD)
      ))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): SupertrendFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }
}
