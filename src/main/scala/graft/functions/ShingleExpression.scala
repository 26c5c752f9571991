package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a token array, in one pass.
  *
  * Replaces the interpreted HOF chain
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, 3))))` (4 lambda-interpreted operators and an
  * intermediate array per row) with a single eval that builds each shingle
  * string once and dedups via a hash set, preserving first-occurrence
  * order (array_distinct semantics). Fewer-than-3-token inputs yield one
  * shingle = all tokens joined — identical to the fallback branch of the
  * HOF pipeline (rejoining a single-space split reproduces the original
  * text exactly, including empty tokens from runs of spaces).
  */
case class ShingleArray(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_shingles expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n < 3) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = tokens.getUTF8String(i); i += 1 }
      seen.add(UTF8String.concatWs(space, all: _*))
    } else {
      var i = 0
      while (i <= n - 3) {
        seen.add(UTF8String.concatWs(space,
          tokens.getUTF8String(i), tokens.getUTF8String(i + 1), tokens.getUTF8String(i + 2)))
        i += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].map(_.asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
