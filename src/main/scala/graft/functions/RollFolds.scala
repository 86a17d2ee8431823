package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Ring-buffer window folds for the SQL surface's LAG-UNROLLED rolling
  * composites (optimization round 16, guide §4).
  *
  * The scalar-macro SQL surface cannot stage columns, so a rolling
  * aggregate whose argument is itself lag-bearing historically flattened
  * into n shifted copies summed in the frame's fold order (gatedSumU /
  * stochStruct, TaSqlSurface2). That spelling is value-exact but its
  * TREE is O(n) window expressions — `graft_uo(…,7,14,28)` alone carries
  * ~300 of them, and x_sql_surface10 measured 1.17 s of PER-REP driver
  * analysis (ProfileQueries `rebuild`), with each distinct lag offset
  * also paying its own frame processor inside WindowExec.
  *
  * Each class here collapses one composite into ONE running-frame window
  * aggregate (the SeededComposites shape): the buffer keeps the last
  * `cap` input values in a fixed-length ring PRE-FILLED WITH NULLS, so
  * `at(buf, j)` — the value lag-j rows back — is a constant-index
  * `element_at` that is null exactly when `lag(x, j)` would be (missing
  * history and data nulls alike; indexes never leave [1, cap], so ANSI
  * mode cannot throw). The evaluate tree then REPLICATES the unrolled
  * spelling's arithmetic NODE-FOR-NODE — same CaseWhen gates, same
  * oldest-first `Add` left-reduce (`sumDesc` ≡ gatedSumU's
  * `((n−1) to 0 by −1).map(term).reduce(_ + _)`), same sdiv spelling —
  * so results are bit-identical; only the plan shape changes
  * (n offset frames → 1 running-frame fold). Equality is gated by the
  * x_sql_surface* DuckDB oracles and RollFoldSpec.
  */
object RollFolds {

  private[functions] val nullD: Expression = Literal.create(null, DoubleType)

  /** Shared ring-buffer machinery. */
  abstract class RingFold extends AggregateWindowFunction {
    /** Ring length: 1 + the deepest lag the evaluate tree reads. */
    protected def cap: Int

    protected final def ringType: DataType = ArrayType(DoubleType, containsNull = true)
    protected final def ringInit: Expression =
      Literal.create(Seq.fill[Any](cap)(null), ArrayType(DoubleType, containsNull = true))
    /** Drop the oldest slot, append this row's value — length stays cap. */
    protected final def ringUpd(buf: AttributeReference, v: Expression): Expression =
      Concat(Seq(Slice(buf, Literal(2), Literal(cap - 1)), CreateArray(Seq(v))))
    /** lag-j element AFTER this row's update (j = 0 is the current row). */
    protected final def at(buf: AttributeReference, j: Int): Expression = {
      require(j >= 0 && j < cap, s"ring lag $j outside cap $cap")
      ElementAt(buf, Literal(cap - j))
    }
    /** The last n values as they stood j rows back (oldest..newest) — the
      * shifted-frame slice rmaxShift/rminShift read. */
    protected final def win(buf: AttributeReference, n: Int, j: Int): Expression = {
      require(n + j <= cap, s"shifted window n=$n j=$j outside cap $cap")
      Slice(buf, Literal(cap - j - n + 1), Literal(n))
    }
    /** count(x) over the shifted frame — non-null count of the n slots
      * lag j..j+n−1. Spelled as a fixed If-chain (ArrayCompact/HOFs are
      * RuntimeReplaceable and cannot evaluate inside an aggregate's
      * expression tree, which the optimizer never rewrites). */
    protected final def winCount(buf: AttributeReference, n: Int, j: Int): Expression =
      ((j + n - 1) to j by -1)
        .map(k => If(IsNull(at(buf, k)), Literal(0), Literal(1)): Expression)
        .reduce(Add(_, _))

    // ---- exact replicas of the Column-level spellings ------------------
    /** P.sdiv: a / when(b =!= 0.0, b). */
    protected final def sdivE(a: Expression, b: Expression): Expression =
      Divide(a, CaseWhen(Seq((Not(EqualTo(b, Literal(0.0))), b)), None))
    /** when(c, v) with no otherwise (else null). */
    protected final def whenE(c: Expression, v: Expression): Expression =
      CaseWhen(Seq((c, v)), None)
    /** gatedSumU: Σ_{j=n−1..0} term(j), Sum's oldest-first left-reduce. */
    protected final def sumDesc(n: Int)(term: Int => Expression): Expression =
      ((n - 1) to 0 by -1).map(term).reduce(Add(_, _))
    /** sum(x)/avg(x)-sum OVER a full gated frame: the aggregate's
      * accumulator starts at 0.0 and adds oldest-first, so the first
      * term rides an extra `0.0 +` (visible only in ±0.0 bit patterns —
      * which the RollFoldSpec bit-equality gate checks). Callers gate on
      * winCount ≥ n, under which no slot is null and the seeded fold is
      * exactly the frame aggregate's arithmetic. */
    protected final def sumSeeded(buf: AttributeReference, n: Int, j: Int): Expression =
      ((j + n - 1) to j by -1).foldLeft(Literal(0.0): Expression)((acc, k) => Add(acc, at(buf, k)))

    protected final def buf(name: String): AttributeReference =
      AttributeReference(name, ArrayType(DoubleType, containsNull = true), nullable = false)()

    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
  }

  /** CMO's gated up/down rolling sums → 100·sdiv(su−sd, su+sd)
    * (TaSqlSurface2 graft_cmo's unrolled tree, fold form). */
  case class CmoFold(x: Expression, n: Int) extends RingFold {
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_cmo_k"
    private lazy val bx = buf("cmoRing")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit)
    override lazy val updateExpressions: Seq[Expression] = Seq(ringUpd(bx, x))
    override lazy val evaluateExpression: Expression = {
      def dd(j: Int) = Subtract(at(bx, j), at(bx, j + 1))
      def upT(j: Int) =
        CaseWhen(Seq((IsNull(dd(j)), nullD), (GreaterThan(dd(j), Literal(0.0)), dd(j))), Some(Literal(0.0)))
      def dnT(j: Int) =
        CaseWhen(Seq((IsNull(dd(j)), nullD), (LessThan(dd(j), Literal(0.0)), UnaryMinus(dd(j)))), Some(Literal(0.0)))
      val su = sumDesc(n)(upT)
      val sd = sumDesc(n)(dnT)
      Multiply(Literal(100.0), sdivE(Subtract(su, sd), Add(su, sd)))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): CmoFold =
      copy(x = c0(0))
  }

  /** Σ_{j=n−1..0} |x_{t−j} − x_{t−j−1}| — the rolling abs-diff sum shared
    * by graft_er / graft_vhf / graft_kama_sc (null until n+1 rows via
    * term null-propagation, exactly the unrolled adS). */
  case class AbsDiffSumFold(x: Expression, n: Int) extends RingFold {
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_adiffsum_k"
    private lazy val bx = buf("adsRing")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit)
    override lazy val updateExpressions: Seq[Expression] = Seq(ringUpd(bx, x))
    override lazy val evaluateExpression: Expression =
      sumDesc(n)(j => Abs(Subtract(at(bx, j), at(bx, j + 1))))
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): AbsDiffSumFold =
      copy(x = c0(0))
  }

  /** PSL: 100·(count of positive diffs in the last n)/n, gated on
    * row_number ≥ n (diff terms contribute 0 when undefined — the
    * unrolled when(dd > 0, 1).otherwise(0) spelling). */
  case class PslFold(x: Expression, n: Int) extends RingFold {
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_psl_k"
    private lazy val bx = buf("pslRing")
    private lazy val pos = AttributeReference("pslPos", LongType, nullable = false)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx, pos)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, Literal(0L))
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bx, x), Add(pos, Literal(1L)))
    override lazy val evaluateExpression: Expression = {
      def gt(j: Int) =
        CaseWhen(
          Seq((GreaterThan(Subtract(at(bx, j), at(bx, j + 1)), Literal(0.0)), Literal(1.0))),
          Some(Literal(0.0))
        )
      val s0 = whenE(GreaterThanOrEqual(pos, Literal(n.toLong)), sumDesc(n)(gt))
      Divide(Multiply(Literal(100.0), s0), Literal(n.toDouble))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): PslFold =
      copy(x = c0(0))
  }

  /** true_range at lag j from (h, l, close) rings — Ta.trueRange's exact
    * CASE, shared by the chop/vortex folds. */
  sealed trait TrRing extends RingFold {
    protected def bh: AttributeReference
    protected def bl: AttributeReference
    protected def bc: AttributeReference
    protected final def trAt(j: Int): Expression = {
      val pc = at(bc, j + 1)
      CaseWhen(
        Seq((IsNull(pc), nullD)),
        Some(Greatest(Seq(
          Subtract(at(bh, j), at(bl, j)),
          Abs(Subtract(at(bh, j), pc)),
          Abs(Subtract(at(bl, j), pc))
        )))
      )
    }
  }

  /** Σ_{j=n−1..0} true_range(t−j) — graft_chop's rolling TR sum. */
  case class TrSumFold(h: Expression, l: Expression, c: Expression, n: Int) extends TrRing {
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(h, l, c)
    override def prettyName: String = "graft_trsum_k"
    protected lazy val bh = buf("trsH")
    protected lazy val bl = buf("trsL")
    protected lazy val bc = buf("trsC")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bh, bl, bc)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, ringInit, ringInit)
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bh, h), ringUpd(bl, l), ringUpd(bc, c))
    override lazy val evaluateExpression: Expression = sumDesc(n)(trAt)
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): TrSumFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** Vortex: struct(vtxp, vtxm) = sdiv(Σvm±, ΣTR) over the last n —
    * graft_vortex's complete unrolled tree as one fold. */
  case class VortexFold(h: Expression, l: Expression, c: Expression, n: Int) extends TrRing {
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = StructType(Seq(
      StructField("vtxp", DoubleType),
      StructField("vtxm", DoubleType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_vortex_k"
    protected lazy val bh = buf("vtxH")
    protected lazy val bl = buf("vtxL")
    protected lazy val bc = buf("vtxC")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bh, bl, bc)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, ringInit, ringInit)
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bh, h), ringUpd(bl, l), ringUpd(bc, c))
    override lazy val evaluateExpression: Expression = {
      def vmp(j: Int) =
        CaseWhen(Seq((IsNull(at(bl, j + 1)), nullD)), Some(Abs(Subtract(at(bh, j), at(bl, j + 1)))))
      def vmm(j: Int) =
        CaseWhen(Seq((IsNull(at(bh, j + 1)), nullD)), Some(Abs(Subtract(at(bl, j), at(bh, j + 1)))))
      val trS = sumDesc(n)(trAt)
      CreateNamedStruct(Seq(
        Literal("vtxp"), sdivE(sumDesc(n)(vmp), trS),
        Literal("vtxm"), sdivE(sumDesc(n)(vmm), trS)
      ))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): VortexFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** Ulcer index: √(Σ_{j=n−1..0} dpct(j)² / n) with dpct against the
    * n-row rolling max as it stood j rows back (rmaxShift's gated max,
    * here a compact-count-gated array_max over the ring slice). */
  case class UiFold(c: Expression, n: Int) extends RingFold {
    protected val cap: Int = 2 * n - 1
    override def children: Seq[Expression] = Seq(c)
    override def prettyName: String = "graft_ui_k"
    private lazy val bc = buf("uiRing")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bc)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit)
    override lazy val updateExpressions: Seq[Expression] = Seq(ringUpd(bc, c))
    override lazy val evaluateExpression: Expression = {
      def hh(j: Int) =
        whenE(GreaterThanOrEqual(winCount(bc, n, j), Literal(n)), ArrayMax(win(bc, n, j)))
      def d2(j: Int) = {
        val hhj = hh(j)
        val dpct = Multiply(Literal(100.0), sdivE(Subtract(at(bc, j), hhj), hhj))
        Multiply(dpct, dpct)
      }
      val m = Divide(sumDesc(n)(d2), Literal(n.toDouble))
      whenE(GreaterThanOrEqual(m, Literal(0.0)), Sqrt(m))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): UiFold =
      copy(c = c0(0))
  }

  /** Ultimate oscillator: 100·(4·avg_f + 2·avg_m + avg_s)/7 with
    * avg_k = sdiv(Σ_k bp, Σ_k tr) — graft_uo's three lag-unrolled
    * horizon sums (the surface's largest tree, ~300 window expressions
    * at (7,14,28)) as one fold. */
  case class UoFold(h: Expression, l: Expression, c: Expression, f: Int, m: Int, s: Int)
      extends RingFold {
    require(s >= m && m >= f && f >= 1, s"graft_uo expects f <= m <= s, got ($f, $m, $s)")
    protected val cap: Int = s + 1
    override def children: Seq[Expression] = Seq(h, l, c)
    override def prettyName: String = "graft_uo_k"
    private lazy val bh = buf("uoH")
    private lazy val bl = buf("uoL")
    private lazy val bc = buf("uoC")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bh, bl, bc)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, ringInit, ringInit)
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bh, h), ringUpd(bl, l), ringUpd(bc, c))
    override lazy val evaluateExpression: Expression = {
      def bp(j: Int) = {
        val pc = at(bc, j + 1)
        CaseWhen(Seq((IsNull(pc), nullD)), Some(Subtract(at(bc, j), Least(Seq(at(bl, j), pc)))))
      }
      def trn(j: Int) = {
        val pc = at(bc, j + 1)
        CaseWhen(
          Seq((IsNull(pc), nullD)),
          Some(Subtract(Greatest(Seq(at(bh, j), pc)), Least(Seq(at(bl, j), pc))))
        )
      }
      def avgN(k: Int) = sdivE(sumDesc(k)(bp), sumDesc(k)(trn))
      Divide(
        Multiply(
          Literal(100.0),
          Add(Add(Multiply(Literal(4.0), avgN(f)), Multiply(Literal(2.0), avgN(m))), avgN(s))
        ),
        Literal(7.0)
      )
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): UoFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** BRAR's BR half: 100·sdiv(Σ max(0, h−pc), Σ max(0, pc−l)) over the
    * last n (the AR half is plain gated rolling sums and stays in the
    * macro). */
  case class BrFold(h: Expression, l: Expression, c: Expression, n: Int) extends RingFold {
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(h, l, c)
    override def prettyName: String = "graft_br_k"
    private lazy val bh = buf("brH")
    private lazy val bl = buf("brL")
    private lazy val bc = buf("brC")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bh, bl, bc)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, ringInit, ringInit)
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bh, h), ringUpd(bl, l), ringUpd(bc, c))
    override lazy val evaluateExpression: Expression = {
      def hcy(j: Int) = {
        val pc = at(bc, j + 1)
        CaseWhen(Seq((IsNull(pc), nullD)), Some(Greatest(Seq(Literal(0.0), Subtract(at(bh, j), pc)))))
      }
      def cyl(j: Int) = {
        val pc = at(bc, j + 1)
        CaseWhen(Seq((IsNull(pc), nullD)), Some(Greatest(Seq(Literal(0.0), Subtract(pc, at(bl, j))))))
      }
      Multiply(Literal(100.0), sdivE(sumDesc(n)(hcy), sumDesc(n)(cyl)))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): BrFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** Coppock: WMA(n) of (ROC_fast + ROC_slow), weights newest-heavy,
    * summed in the unrolled spelling's j-ascending map order. */
  case class CoppockFold(x: Expression, n: Int, fast: Int, slow: Int) extends RingFold {
    require(slow >= fast && fast >= 1, s"graft_coppock expects fast <= slow, got ($fast, $slow)")
    protected val cap: Int = n + slow
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_coppock_k"
    private lazy val bx = buf("copRing")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit)
    override lazy val updateExpressions: Seq[Expression] = Seq(ringUpd(bx, x))
    override lazy val evaluateExpression: Expression = {
      def rsum2(j: Int) =
        Add(
          Multiply(Literal(100.0), Subtract(sdivE(at(bx, j), at(bx, j + fast)), Literal(1.0))),
          Multiply(Literal(100.0), Subtract(sdivE(at(bx, j), at(bx, j + slow)), Literal(1.0)))
        )
      val ws = (1 to n).map(_.toDouble)
      val denom = ws.sum
      val lagWts = ws.reverse.map(_ / denom)
      lagWts.zipWithIndex
        .map { case (wi, j) => Multiply(rsum2(j), Literal(wi)): Expression }
        .reduce(Add(_, _))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): CoppockFold =
      copy(x = c0(0))
  }

  /** P.wdot as a fold: Σ_i weights(i)·x_{t−offset−i} in wdot's
    * i-ascending reduce order; `gated` wraps the count(x) ≥ n
    * min_periods gate (P.gated / linregParts' g). Serves graft_cg,
    * the linreg closed forms, and the weighted-MA family. */
  case class WdotFold(x: Expression, weights: Seq[Double], gated: Boolean, offset: Int)
      extends RingFold {
    require(weights.nonEmpty && offset >= 0)
    private val n = weights.size
    protected val cap: Int = offset + n
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_wdot_k"
    private lazy val bx = buf("wdotRing")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit)
    override lazy val updateExpressions: Seq[Expression] = Seq(ringUpd(bx, x))
    override lazy val evaluateExpression: Expression = {
      val num = weights.zipWithIndex
        .map { case (wi, i) => Multiply(at(bx, offset + i), Literal(wi)): Expression }
        .reduce(Add(_, _))
      if (gated) whenE(GreaterThanOrEqual(winCount(bx, n, offset), Literal(n)), num)
      else num
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): WdotFold =
      copy(x = c0(0))
  }

  // ---- wave 3 (same round): the remaining lag-unrolled macros ----------

  /** stoch(n, k, d) as one fold: fast %K at shift j reads the n-row
    * min/max as they stood j rows back (stochStruct's shifted frames →
    * count-gated ArrayMin/ArrayMax over ring slices, the UiFold
    * technique), the k- and d-means sum shifted copies oldest-first /
    * literal length. Struct(stoch_k, stoch_d), replicating
    * TaSqlSurface.stochStruct node-for-node. */
  case class StochFold(h: Expression, l: Expression, c: Expression, n: Int, k: Int, dN: Int)
      extends RingFold {
    require(n >= 1 && k >= 1 && dN >= 1, s"graft_stoch expects positive (n, k, d), got ($n, $k, $dN)")
    protected val cap: Int = n + k + dN - 2
    override def children: Seq[Expression] = Seq(h, l, c)
    override def dataType: DataType = StructType(Seq(
      StructField("stoch_k", DoubleType),
      StructField("stoch_d", DoubleType)
    ))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_stoch_k"
    private lazy val bh = buf("stochH")
    private lazy val bl = buf("stochL")
    private lazy val bc = buf("stochC")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bh, bl, bc)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, ringInit, ringInit)
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bh, h), ringUpd(bl, l), ringUpd(bc, c))
    override lazy val evaluateExpression: Expression = {
      def fastk(j: Int): Expression = {
        val ll = whenE(GreaterThanOrEqual(winCount(bl, n, j), Literal(n)), ArrayMin(win(bl, n, j)))
        val hh = whenE(GreaterThanOrEqual(winCount(bh, n, j), Literal(n)), ArrayMax(win(bh, n, j)))
        Multiply(Literal(100.0), sdivE(Subtract(at(bc, j), ll), Subtract(hh, ll)))
      }
      def kAt(i: Int): Expression =
        Divide(((i + k - 1) to i by -1).map(fastk).reduce(Add(_, _)), Literal(k.toDouble))
      val sk = kAt(0)
      val sd = Divide(((dN - 1) to 0 by -1).map(kAt).reduce(Add(_, _)), Literal(dN.toDouble))
      CreateNamedStruct(Seq(Literal("stoch_k"), sk, Literal("stoch_d"), sd))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): StochFold =
      copy(h = c0(0), l = c0(1), c = c0(2))
  }

  /** trima(n) = sma(sma(x, half), second): the outer mean's `second`
    * shifted copies of the inner count-gated frame mean, summed
    * oldest-first / second — each inner avg replicated as the seeded
    * oldest-first sum / half (Average's exact arithmetic under the
    * count ≥ half gate). */
  case class TrimaFold(x: Expression, n: Int) extends RingFold {
    require(n >= 1, s"graft_trima expects positive n, got $n")
    private val half = (n + 1) / 2 + (if ((n + 1) % 2 == 0) 0 else 1)
    private val second = n / 2 + 1
    protected val cap: Int = half + second - 1
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_trima_k"
    private lazy val bx = buf("trimaRing")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit)
    override lazy val updateExpressions: Seq[Expression] = Seq(ringUpd(bx, x))
    override lazy val evaluateExpression: Expression = {
      def meanShift(j: Int): Expression =
        whenE(
          GreaterThanOrEqual(winCount(bx, half, j), Literal(half)),
          Divide(sumSeeded(bx, half, j), Literal(half.toDouble))
        )
      Divide(sumDesc(second)(meanShift), Literal(second.toDouble))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): TrimaFold =
      copy(x = c0(0))
  }

  /** entropy(n, base) = Σ_{j=n−1..0} −p·log(p)/ln(base) with the share
    * p = x_{t−j} / Σₙx as it stood j rows back (shifted count-gated
    * frame sum → seeded ring-slice sum, Sum's exact arithmetic under
    * the gate). */
  case class EntropyFold(x: Expression, n: Int, base: Double) extends RingFold {
    require(n >= 1, s"graft_entropy expects positive n, got $n")
    protected val cap: Int = 2 * n - 1
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_entropy_k"
    private lazy val bx = buf("entRing")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit)
    override lazy val updateExpressions: Seq[Expression] = Seq(ringUpd(bx, x))
    override lazy val evaluateExpression: Expression = {
      val lnB = math.log(base)
      def etAt(j: Int): Expression = {
        val rs = whenE(GreaterThanOrEqual(winCount(bx, n, j), Literal(n)), sumSeeded(bx, n, j))
        val p = sdivE(at(bx, j), rs)
        whenE(GreaterThan(p, Literal(0.0)), Divide(Multiply(UnaryMinus(p), Log(p)), Literal(lnB)))
      }
      sumDesc(n)(etAt)
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): EntropyFold =
      copy(x = c0(0))
  }

  /** eom(n, divisor) = rmean(divisor·Δhl2·sdiv(h−l, v), n) — the
    * lag-bearing raw term's shifted copies summed oldest-first / n. */
  case class EomFold(h: Expression, l: Expression, v: Expression, n: Int, divisor: Double)
      extends RingFold {
    require(n >= 1, s"graft_eom expects positive n, got $n")
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(h, l, v)
    override def prettyName: String = "graft_eom_k"
    private lazy val bh = buf("eomH")
    private lazy val bl = buf("eomL")
    private lazy val bv = buf("eomV")
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bh, bl, bv)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, ringInit, ringInit)
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bh, h), ringUpd(bl, l), ringUpd(bv, v))
    override lazy val evaluateExpression: Expression = {
      def hl2(j: Int) = Divide(Add(at(bh, j), at(bl, j)), Literal(2.0))
      def rawAt(j: Int): Expression =
        Multiply(
          Multiply(Literal(divisor), Subtract(hl2(j), hl2(j + 1))),
          sdivE(Subtract(at(bh, j), at(bl, j)), at(bv, j))
        )
      Divide(sumDesc(n)(rawAt), Literal(n.toDouble))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): EomFold =
      copy(h = c0(0), l = c0(1), v = c0(2))
  }

  /** mfi(n) = 100·sdiv(Σpos, Σpos+Σneg) over typical-price flows; flows
    * are never null (null Δtp counts 0), so the min_periods gate is
    * row_number ≥ n (PslFold's position counter). tp is evaluated once
    * per row into its own ring — exactly lag(tp, j) on the staged
    * column. */
  case class MfiFold(h: Expression, l: Expression, c: Expression, v: Expression, n: Int)
      extends RingFold {
    require(n >= 1, s"graft_mfi expects positive n, got $n")
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(h, l, c, v)
    override def prettyName: String = "graft_mfi_k"
    private lazy val btp = buf("mfiTp")
    private lazy val bv = buf("mfiV")
    private lazy val pos = AttributeReference("mfiPos", LongType, nullable = false)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(btp, bv, pos)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, ringInit, Literal(0L))
    override lazy val updateExpressions: Seq[Expression] = Seq(
      ringUpd(btp, Divide(Add(Add(h, l), c), Literal(3.0))),
      ringUpd(bv, v),
      Add(pos, Literal(1L))
    )
    override lazy val evaluateExpression: Expression = {
      def dtp(j: Int) = Subtract(at(btp, j), at(btp, j + 1))
      def posT(j: Int) =
        CaseWhen(
          Seq((GreaterThan(dtp(j), Literal(0.0)), Multiply(at(btp, j), at(bv, j)))),
          Some(Literal(0.0))
        )
      def negT(j: Int) =
        CaseWhen(
          Seq((LessThan(dtp(j), Literal(0.0)), Multiply(at(btp, j), at(bv, j)))),
          Some(Literal(0.0))
        )
      val g = GreaterThanOrEqual(pos, Literal(n.toLong))
      val sp = whenE(g, sumDesc(n)(posT))
      val sn = whenE(g, sumDesc(n)(negT))
      Multiply(Literal(100.0), sdivE(sp, Add(sp, sn)))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): MfiFold =
      copy(h = c0(0), l = c0(1), c = c0(2), v = c0(3))
  }

  /** vidya's staged alpha: |CMOₙ|/100 · 2/(n+1) with CMO in rolling-sum
    * mode; up/dn are never null, so the gate is row_number ≥ n. */
  case class VidyaAlFold(x: Expression, n: Int) extends RingFold {
    require(n >= 1, s"graft_vidya_al expects positive n, got $n")
    protected val cap: Int = n + 1
    override def children: Seq[Expression] = Seq(x)
    override def prettyName: String = "graft_vidya_al_k"
    private lazy val bx = buf("vidyaRing")
    private lazy val pos = AttributeReference("vidyaPos", LongType, nullable = false)()
    override def aggBufferAttributes: Seq[AttributeReference] = Seq(bx, pos)
    override lazy val initialValues: Seq[Expression] = Seq(ringInit, Literal(0L))
    override lazy val updateExpressions: Seq[Expression] =
      Seq(ringUpd(bx, x), Add(pos, Literal(1L)))
    override lazy val evaluateExpression: Expression = {
      def d1(j: Int) = Subtract(at(bx, j), at(bx, j + 1))
      def upT(j: Int) =
        CaseWhen(Seq((GreaterThan(d1(j), Literal(0.0)), d1(j))), Some(Literal(0.0)))
      def dnT(j: Int) =
        CaseWhen(Seq((LessThan(d1(j), Literal(0.0)), UnaryMinus(d1(j)))), Some(Literal(0.0)))
      val g = GreaterThanOrEqual(pos, Literal(n.toLong))
      val su = whenE(g, sumDesc(n)(upT))
      val sd = whenE(g, sumDesc(n)(dnT))
      val cmoAbs = sdivE(Abs(Subtract(su, sd)), Add(su, sd))
      Multiply(cmoAbs, Literal(2.0 / (n + 1)))
    }
    override protected def withNewChildrenInternal(c0: IndexedSeq[Expression]): VidyaAlFold =
      copy(x = c0(0))
  }
}
