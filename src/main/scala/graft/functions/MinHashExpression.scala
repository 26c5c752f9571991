package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over a token array.
  *
  * Semantics are EXACTLY the composable pipeline it replaces (oracle
  * compatibility): word-3-gram shingles (tokens joined by spaces; when
  * fewer than 3 tokens, one shingle = all tokens joined), md5 per shingle,
  * and for window j ∈ [0, numWindows) the minimum of the j-th 8-hex-char
  * window across shingles. Lowercase-hex lexicographic minimum ==
  * unsigned-int minimum of the digest's 4-byte window, so the hot loop
  * compares ints and hex-encodes only the final minima. One traversal, one
  * md5 per shingle, no per-lambda allocation — vs 1 + numWindows
  * interpreted HOF passes (higher-order functions don't participate in
  * codegen).
  */
case class MinHashBands(child: Expression, numWindows: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val md5Local =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val md = md5Local.get()
    val minima = Array.fill(numWindows)(0xffffffffL + 1)

    def digestShingle(from: Int, len: Int): Unit = {
      md.reset()
      var i = 0
      while (i < len) {
        if (i > 0) md.update(' '.toByte)
        md.update(tokens.getUTF8String(from + i).getBytes)
        i += 1
      }
      val dig = md.digest()
      var w = 0
      while (w < numWindows) {
        val v = ((dig(4 * w) & 0xffL) << 24) | ((dig(4 * w + 1) & 0xffL) << 16) |
          ((dig(4 * w + 2) & 0xffL) << 8) | (dig(4 * w + 3) & 0xffL)
        if (v < minima(w)) minima(w) = v
        w += 1
      }
    }

    if (n < 3) digestShingle(0, n)
    else {
      var i = 0
      while (i <= n - 3) { digestShingle(i, 3); i += 1 }
    }

    val out = new Array[Any](numWindows)
    var w = 0
    while (w < numWindows) {
      out(w) = UTF8String.fromString(f"${minima(w) & 0xffffffffL}%08x")
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
