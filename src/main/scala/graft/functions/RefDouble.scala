package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** A double scalar delivered through the codegen REFERENCES array instead
  * of an inlined source literal. `Literal(double)` pastes the value into
  * the generated Java text, so a loop that re-plans with a new scalar
  * each iteration (PageRank's dangling mass) defeats the codegen cache
  * and pays a fresh Janino compile per round — measured ~0.7 s/round,
  * the dominant cost of the whole operator. RefDouble keeps the source
  * byte-identical across rounds (the value rides `references`), so every
  * round after the first reuses the compiled class.
  *
  * Deliberately NON-foldable: ConstantFolding would otherwise evaluate
  * it back into an inline literal. Evaluates to exactly `value` — bit
  * parity with the literal spelling the oracles replay. */
case class RefDouble(value: Double) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRefD", java.lang.Double.valueOf(value), "java.lang.Double")
    ev.copy(
      code = code"final double ${ev.value} = $ref.doubleValue();",
      isNull = FalseLiteral
    )
  }

  // stable node name; equality carries the value (correct plan identity)
  override def prettyName: String = "graft_refd"
}
