package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd array kernels for the similarity/dedup extensions.
  *
  * The HOF spelling (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) evaluates
  * one interpreted lambda call per element; on an O(n²) candidate join at
  * 64 dims that is ~10⁹ boxed calls. This expression compiles to a tight
  * primitive loop inside whole-stage codegen — same left-to-right
  * accumulation order, so results stay bit-identical to the HOF and to the
  * DuckDB oracle's list_reduce.
  *
  * Null contract: null input array → null; null ELEMENTS are not expected
  * (embedding vectors are dense) and are read as 0.0 — same as the oracle
  * corpus which contains none.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  private def elemGetter(t: DataType): (String, String) = t match {
    case ArrayType(FloatType, _) => ("getFloat", "(double)")
    case ArrayType(DoubleType, _) => ("getDouble", "")
    case other => throw new IllegalArgumentException(s"graft_dot: unsupported $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lg, lc) = elemGetter(left.dataType)
    val (rg, rc) = elemGetter(right.dataType)
    // freshName: two instances can land in ONE codegen method (cosine =
    // dot + two normsq) where nullSafeExec emits no brace scope for
    // non-nullable children — fixed names would collide and janino-fail.
    val n = ctx.freshName("gad_n")
    val s = ctx.freshName("gad_s")
    val i = ctx.freshName("gad_i")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $lc$a.$lg($i) * $rc$b.$rg($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** Codegen'd squared-L2-norm companion (‖a‖² left-to-right). */
case class ArrayNormSq(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_normsq expects array<float|double>, got $other")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (g, c) = child.dataType match {
      case ArrayType(FloatType, _) => ("getFloat", "(double)")
      case ArrayType(DoubleType, _) => ("getDouble", "")
      case other => throw new IllegalArgumentException(s"graft_normsq: unsupported $other")
    }
    val n = ctx.freshName("gan_n")
    val s = ctx.freshName("gan_s")
    val i = ctx.freshName("gan_i")
    val v = ctx.freshName("gan_v")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |int $n = $a.numElements();
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) { double $v = $c$a.$g($i); $s += $v * $v; }
        |${ev.value} = $s;
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): ArrayNormSq = copy(child = c)
}
