package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string, base 31 mod 1e9+7, over BYTES —
  * identical to the HOF spelling `aggregate(transform(split(s, ''), c ->
  * ascii(c)), 0, (acc, x) -> (acc*31 + x) % P)` on ASCII input (byte ==
  * code point; the corpus is ASCII — FIXTURES.md), and to the DuckDB
  * oracle's list_reduce over unicode(c).
  *
  * The HOF version runs ~40 interpreted lambda evaluations per 20-char
  * shingle; this compiles to a tight byte loop inside whole-stage codegen
  * — the hot inner op of the dedup/minhash pipelines.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_polyhash expects STRING, got $other"
        )
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: with a non-nullable child nullSafeExec emits no brace
    // scope, so two PolyHash instances in one codegen'd method would
    // collide on fixed local names (janino failure → interpreted fallback).
    val b = ctx.freshName("gph_b")
    val acc = ctx.freshName("gph_acc")
    val i = ctx.freshName("gph_i")
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"""
        |byte[] $b = $s.getBytes();
        |long $acc = 0L;
        |for (int $i = 0; $i < $b.length; $i++) {
        |  $acc = ($acc * 31L + ($b[$i] & 0xffL)) % 1000000007L;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}
