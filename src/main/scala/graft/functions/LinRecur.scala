package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast => CCast, _}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** First-order linear recurrence as a window function:
  *
  *   acc == null          -> acc := seed          (start of the series)
  *   a IS NULL or b NULL  -> acc unchanged        (skip row, emit previous)
  *   else                 -> acc := a*acc + b
  *
  * Runs over the mandatory running frame (UNBOUNDED PRECEDING..CURRENT ROW)
  * of AggregateWindowFunction: O(1) state per key, one pass, no buffering —
  * the scale-safe shape for 100 TB per-key histories.
  *
  * Covers every "linear REC" op in SURVEY.md §2.A:
  *   ewm(adjust=False):  a = 1-alpha, b = alpha*x, seed = x
  *   seeded EMA:         same over the SMA-seeded input column
  *   rma (Wilder):       alpha = 1/n
  *   kama/vidya:         per-row alpha column (a, b vary by row)
  *   heikin-ashi open:   a = 0.5, b = 0.5*lag(ha_close), seed = (o0+c0)/2
  *
  * DeclarativeAggregate (pure expressions) so updates run through the
  * expression interpreter without per-row JVM boxing of a custom buffer.
  */
case class LinRecur(a: Expression, b: Expression, seed: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(a, b, seed)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_linrec"

  private lazy val acc = AttributeReference("linrecAcc", DoubleType, nullable = true)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override val initialValues: Seq[Expression] = Seq(Literal.create(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(
      IsNull(acc),
      seed,
      If(Or(IsNull(a), IsNull(b)), acc, Add(Multiply(a, acc), b))
    )
  )
  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LinRecur =
    copy(a = c(0), b = c(1), seed = c(2))
}

object Registry {
  @volatile private var done = Set.empty[String]

  /** Register graft SQL functions on this session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val key = spark.sessionState.toString
    if (!done.contains(key)) synchronized {
      if (!done.contains(key)) {
        val reg = spark.sessionState.functionRegistry
        def dbl(e: Expression): Expression =
          if (e.dataType == DoubleType) e else CCast(e, DoubleType)
        reg.createOrReplaceTempFunction(
          "graft_linrec",
          exprs => LinRecur(dbl(exprs(0)), dbl(exprs(1)), dbl(exprs(2))),
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_ewm",
          // ewm(adjust=False): y = (1-alpha)*y' + alpha*x, seeded with x.
          exprs => {
            val x = dbl(exprs(0)); val alpha = dbl(exprs(1))
            LinRecur(
              Subtract(Literal(1.0), alpha),
              Multiply(alpha, x),
              x
            )
          },
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_dot",
          exprs => ArrayDot(exprs(0), exprs(1)),
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_normsq",
          exprs => ArrayNormSq(exprs(0)),
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_polyhash",
          exprs => PolyHash(exprs(0)),
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_cdc_bounds",
          exprs => {
            def intLit(e: Expression, what: String): Long = e match {
              case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v.toLong
              case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
              case other =>
                throw new IllegalArgumentException(s"graft_cdc_bounds $what must be an integer literal, got $other")
            }
            CdcBoundaries(exprs(0), intLit(exprs(1), "win").toInt, intLit(exprs(2), "modBase"))
          },
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_kmv",
          exprs => KmvSketch.fromExprs(exprs),
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_bpe_segment",
          exprs => {
            val spec = exprs(1) match {
              case Literal(s: org.apache.spark.unsafe.types.UTF8String, org.apache.spark.sql.types.StringType) =>
                if (s == null) "" else s.toString
              case other =>
                throw new IllegalArgumentException(
                  s"graft_bpe_segment merge spec must be a string literal, got $other"
                )
            }
            BpeSegment(exprs(0), spec)
          },
          "built-in"
        )
        reg.createOrReplaceTempFunction(
          "graft_ewm_adjust",
          // pandas ewm(adjust=True): Spark's internal EWM implements it
          // exactly (verified numerically, SURVEY §0 environment table).
          // EWM is private[sql] at the Scala level (public bytecode), so
          // construct reflectively.
          exprs => {
            val alpha = exprs(1) match {
              case Literal(v: Double, DoubleType) => v
              case other =>
                throw new IllegalArgumentException(s"graft_ewm_adjust alpha must be a double literal, got $other")
            }
            val cls = Class.forName("org.apache.spark.sql.catalyst.expressions.EWM")
            cls
              .getConstructor(classOf[Expression], java.lang.Double.TYPE, java.lang.Boolean.TYPE)
              .newInstance(dbl(exprs(0)), java.lang.Double.valueOf(alpha), java.lang.Boolean.TRUE)
              .asInstanceOf[Expression]
          },
          "built-in"
        )
        // indicator-family SQL wrappers (shared list with GraftExtensions)
        TaSqlSurface.builders.foreach { case (name, b) =>
          reg.createOrReplaceTempFunction(name, b, "built-in")
        }
        done += key
      }
    }
  }
}

/** Column-level entry points. Resolution goes through the session function
  * registry (Registry.register / Graft.init must have run): Columns built
  * directly from internal Expressions trip CheckAnalysis for window
  * functions, while registry-resolved ones analyze cleanly. */
object wf {
  import org.apache.spark.sql.functions.call_function

  /** y_t = a_t*y_{t-1} + b_t (seed at first row). Apply `.over(prim.cum)`. */
  def linrec(a: Column, b: Column, seed: Column): Column =
    call_function("graft_linrec", a.cast("double"), b.cast("double"), seed.cast("double"))

  /** pandas ewm(alpha, adjust=False).mean() with null-skip. Apply `.over(prim.cum)`. */
  def ewmNoAdjust(x: Column, alpha: Column): Column =
    linrec(
      org.apache.spark.sql.functions.lit(1.0) - alpha,
      alpha * x.cast("double"),
      x.cast("double")
    )
}
