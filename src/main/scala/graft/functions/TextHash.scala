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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"""
        |byte[] gph_b = $s.getBytes();
        |long gph_acc = 0L;
        |for (int gph_i = 0; gph_i < gph_b.length; gph_i++) {
        |  gph_acc = (gph_acc * 31L + (gph_b[gph_i] & 0xffL)) % 1000000007L;
        |}
        |${ev.value} = gph_acc;
      """.stripMargin
    )

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}
