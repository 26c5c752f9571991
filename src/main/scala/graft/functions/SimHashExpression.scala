package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash signature of a token array, one pass per row.
  *
  * Bit j is the sign of Σ over DISTINCT tokens of ±1, +1 iff the j-th hex
  * nibble of md5(token) has its high bit set (nibble >= 8) — exactly the
  * dd03 pipeline (explode distinct tokens → md5 → 32 CASE-sums → sign
  * concat), which shuffles one row per (doc, token); this computes the
  * signature before any exchange, so only (doc, sig) rows ever move.
  * Output: 32-char '0'/'1' string, identical to the SQL oracle's.
  */
case class SimHashBits(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"

  @transient private lazy val md5Local =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val md = md5Local.get()
    val seen = new java.util.HashSet[UTF8String]()
    val sums = new Array[Int](32)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (seen.add(t)) {
        md.reset()
        val dig = md.digest(t.getBytes)
        var j = 0
        while (j < 16) {
          val b = dig(j) & 0xff
          // high nibble is hex char 2j, low nibble is hex char 2j+1
          sums(2 * j) += (if ((b & 0x80) != 0) 1 else -1)
          sums(2 * j + 1) += (if ((b & 0x08) != 0) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val chars = new Array[Byte](32)
    var j = 0
    while (j < 32) {
      chars(j) = if (sums(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(chars)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
