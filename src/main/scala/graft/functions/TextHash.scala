package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string or binary value, base 31 mod
  * 1e9+7, over BYTES — identical to the HOF spelling
  * `aggregate(transform(split(s, ''), c -> ascii(c)), 0,
  * (acc, x) -> (acc*31 + x) % P)` on ASCII input (byte == code point;
  * the corpus is ASCII — FIXTURES.md), and to the DuckDB oracle's
  * list_reduce over unicode(c). On BINARY input it hashes the raw
  * octets — the media-payload path, where there is no character domain
  * at all.
  *
  * The HOF version runs ~40 interpreted lambda evaluations per 20-char
  * shingle; this compiles to a tight byte loop inside whole-stage codegen
  * — the hot inner op of the dedup/minhash pipelines.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_polyhash expects STRING or BINARY, got $other"
        )
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case u: UTF8String  => u.getBytes
      case b: Array[Byte] => b
    }
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
    // BINARY children arrive as byte[] already; STRING as UTF8String
    val toBytes: String => String =
      if (child.dataType == BinaryType) identity else s => s"$s.getBytes()"
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"""
        |byte[] $b = ${toBytes(s)};
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

/** Content-defined-chunking boundary positions: the 1-based END positions
  * i (win ≤ i ≤ len) where PolyHash(bytes[i−win, i)) ≡ 0 (mod modBase) —
  * value-identical to `filter(sequence(win, len), i →
  * graft_polyhash(substr(s, i−win+1, win)) % modBase = 0)` on ASCII
  * input, but computed as ONE rolling pass: the window hash updates in
  * O(1) via modular removal of the oldest byte (b·31^(win−1) mod P),
  * instead of re-hashing win bytes at every position through an
  * interpreted HOF lambda (measured ~6× on the x_media_cdc gate).
  *
  * Positions are BYTE offsets. On BINARY input (the media-payload path)
  * that is the only domain there is; on STRING input the caller must
  * slice with a byte-domain substr too — Media.cdcChunkStats therefore
  * runs entirely on the binary payload, so multi-byte UTF-8 content
  * cannot shear the boundary offsets against a character-based slice. */
case class CdcBoundaries(child: Expression, win: Int, modBase: Long) extends UnaryExpression {
  require(win >= 1 && modBase >= 1)

  private val P = 1000000007L
  /** 31^(win−1) mod P — the removal coefficient. */
  private val poww: Long = {
    var r = 1L; var i = 1
    while (i < win) { r = r * 31L % P; i += 1 }
    r
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cdc_bounds expects STRING or BINARY, got $other"
        )
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val b = v match {
      case u: UTF8String   => u.getBytes
      case bb: Array[Byte] => bb
    }
    val n = b.length
    if (n < win) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Int])
    val tmp = new Array[Int](n - win + 1)
    var cnt = 0
    var h = 0L
    var j = 0
    while (j < win) { h = (h * 31L + (b(j) & 0xffL)) % P; j += 1 }
    if (h % modBase == 0L) { tmp(cnt) = win; cnt += 1 }
    var i = win
    while (i < n) {
      h = (h - (b(i - win) & 0xffL) * poww % P + P) % P
      h = (h * 31L + (b(i) & 0xffL)) % P
      if (h % modBase == 0L) { tmp(cnt) = i + 1; cnt += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(java.util.Arrays.copyOf(tmp, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.freshName("cdc_b"); val n = ctx.freshName("cdc_n")
    val tmp = ctx.freshName("cdc_tmp"); val cnt = ctx.freshName("cdc_cnt")
    val h = ctx.freshName("cdc_h"); val j = ctx.freshName("cdc_j"); val i = ctx.freshName("cdc_i")
    val toBytes: String => String =
      if (child.dataType == BinaryType) identity else s => s"$s.getBytes()"
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"""
        |byte[] $b = ${toBytes(s)};
        |int $n = $b.length;
        |int $cnt = 0;
        |int[] $tmp = new int[$n >= $win ? $n - $win + 1 : 0];
        |if ($n >= $win) {
        |  long $h = 0L;
        |  for (int $j = 0; $j < $win; $j++) { $h = ($h * 31L + ($b[$j] & 0xffL)) % ${P}L; }
        |  if ($h % ${modBase}L == 0L) { $tmp[$cnt++] = $win; }
        |  for (int $i = $win; $i < $n; $i++) {
        |    $h = ($h - ($b[$i - $win] & 0xffL) * ${poww}L % ${P}L + ${P}L) % ${P}L;
        |    $h = ($h * 31L + ($b[$i] & 0xffL)) % ${P}L;
        |    if ($h % ${modBase}L == 0L) { $tmp[$cnt++] = $i + 1; }
        |  }
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
        |  java.util.Arrays.copyOf($tmp, $cnt));
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): CdcBoundaries = copy(child = c)
}
