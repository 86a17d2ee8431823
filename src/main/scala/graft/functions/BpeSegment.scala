package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared imperative BPE segmentation kernel — one JIT'd loop per word,
  * callable from both interpreted eval and generated code (the Spark
  * built-in StaticInvoke idiom). Greedy left-to-right application of the
  * trained merge list IN RANK ORDER, exactly the reference BPE apply
  * (Sennrich et al., ACL 2016) and exactly the HOF `aggregate` fold
  * spelling in Bpe.applyMerge (cross-validated in BpeSpec).
  *
  * Why an Expression and not the HOF stack: each `aggregate` fold level
  * references its input 3×, so nesting `rounds` levels inlines into a
  * 3^rounds expression tree — Catalyst ANALYSIS of 12 rounds hangs before
  * a single row is read, and even attribute-threaded stacked projections
  * blow up when `functionsForEval` rebinds the nested lambdas per task
  * (observed: 13 GB heap, minutes of per-task CPU at sf0.01). This kernel
  * is O(rounds × |word|) per row with zero tree growth.
  */
object BpeSegmentHelper {
  /** merges: flat [l0, r0, l1, r1, ...] (rank order). */
  def segment(word: UTF8String, merges: Array[String]): ArrayData = {
    val w = word.toString
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      // per code point (corpus symbols are [a-z]+, but stay general)
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < merges.length) {
      val l = merges(m); val r = merges(m + 1); val lr = l + r
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (!out.isEmpty && out.get(out.size - 1) == l && syms.get(j) == r)
          out.set(out.size - 1, lr) // greedy: merged symbol never re-matches as `l` in-pass
        else out.add(syms.get(j))
        j += 1
      }
      syms = out
      m += 2
    }
    val res = new Array[Any](syms.size)
    var k = 0
    while (k < res.length) { res(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(res)
  }
}

/** `graft_bpe_segment(word, 'l r,l r,…')` → ARRAY<STRING>: the word's BPE
  * symbolization under the (foldable, rank-ordered) merge list. Registered
  * in Registry.register; constructed via Bpe.segmentCol. */
case class BpeSegment(child: Expression, mergesSpec: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_bpe_segment expects STRING, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_segment"

  private lazy val mergesFlat: Array[String] =
    if (mergesSpec.isEmpty) Array.empty
    else
      mergesSpec.split(",", -1).flatMap { p =>
        val lr = p.split(" ", -1)
        require(lr.length == 2, s"bad merge spec entry '$p'")
        lr
      }

  override def nullSafeEval(v: Any): Any =
    BpeSegmentHelper.segment(v.asInstanceOf[UTF8String], mergesFlat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ms = ctx.addReferenceObj("bpeMerges", mergesFlat, "java.lang.String[]")
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"${ev.value} = graft.functions.BpeSegmentHelper.segment($s, $ms);"
    )
  }

  override protected def withNewChildInternal(c: Expression): BpeSegment = copy(child = c)
}
