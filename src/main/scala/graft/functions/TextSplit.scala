package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization as ONE native codegen'd expression —
  * value-identical to the HOF spelling
  * `filter(split(text, " "), t -> t <> "")` (TextOps.tokensHof, equality
  * spec-asserted): split on single spaces (0x20 only — never appears
  * inside a multi-byte UTF-8 sequence, so the byte loop is
  * encoding-safe), empty fields dropped.
  *
  * Why (optimization round 16, guide §4): ArrayFilter is CodegenFallback,
  * so every evaluation of the HOF spelling interprets the whole
  * split+filter subtree per row — and tokenization is the inner op of
  * every text-pipeline query (BM25/RM3/perplexity/quality/dedup staging).
  * This compiles to a tight byte scan inside whole-stage codegen, the
  * PolyHash/CdcBoundaries precedent applied to the tokenizer.
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft tokens expects STRING, got $other"
        )
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    Tokens.split(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"${ev.value} = graft.functions.Tokens$$.MODULE$$.split($s);"
    )

  override protected def withNewChildInternal(c: Expression): Tokens = copy(child = c)
}

object Tokens {
  /** Non-empty runs between 0x20 bytes, as UTF8String slices. */
  def split(u: UTF8String): GenericArrayData = {
    val b = u.getBytes
    val n = b.length
    var cnt = 0
    var in = false
    var i = 0
    while (i < n) {
      if (b(i) == 32) in = false
      else if (!in) { in = true; cnt += 1 }
      i += 1
    }
    val arr = new Array[AnyRef](cnt)
    var k = 0
    var start = -1
    i = 0
    while (i <= n) {
      val sp = i == n || b(i) == 32
      if (!sp && start < 0) start = i
      else if (sp && start >= 0) {
        arr(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
        start = -1
      }
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** k-token shingles from a tokens array as ONE native expression —
  * value-identical to the HOF spelling (TextOps.shinglesFromTokensHof,
  * equality spec-asserted):
  * `when(size(toks) >= k, transform(sequence(1, size(toks)-k+1),
  *    i -> concat_ws(" ", toks[i], ..., toks[i+k-1]))).otherwise(array())`
  * — i.e. shingle_i joins k consecutive tokens with single spaces; fewer
  * than k tokens yields an EMPTY array (the HOF's when-branch), while a
  * null tokens array stays null.
  *
  * The HOF spelling runs k interpreted element_at calls + a concat_ws
  * per shingle per row (no codegen CSE under lambdas); this is one
  * byte-copy loop. Shingling is the unit op of the whole dedup family
  * (minhash/LSH, winnowing, Jaccard index, containment, dup-spans).
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft shingles expects ARRAY<STRING>, got $other"
        )
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    Shingles.build(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"${ev.value} = graft.functions.Shingles$$.MODULE$$.build($s, $k);"
    )

  override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
}

object Shingles {
  def build(toks: org.apache.spark.sql.catalyst.util.ArrayData, k: Int): GenericArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[AnyRef])
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ts(i) = toks.getUTF8String(i); i += 1 }
    val out = new Array[AnyRef](n - k + 1)
    i = 0
    while (i <= n - k) {
      // concat_ws(" ", ts(i), ..., ts(i+k-1))
      var len = k - 1
      var j = 0
      while (j < k) { len += ts(i + j).numBytes(); j += 1 }
      val b = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < k) {
        if (j > 0) { b(off) = 32; off += 1 }
        val t = ts(i + j)
        t.writeToMemory(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        j += 1
      }
      out(i) = UTF8String.fromBytes(b)
      i += 1
    }
    new GenericArrayData(out)
  }
}
