package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of N long dimensions — the clustering key
  * behind multi-dimensional data skipping ([[graft.operators.Layout]]).
  *
  * Bit j of dimension d lands at output bit `j*N + d`, so the low bits of
  * ALL dimensions vary fastest: rows close in every dimension get close
  * keys, and a range-partition + within-partition sort on the key yields
  * files whose per-column min/max envelopes are tight in EVERY clustered
  * column — the property linear sorting only gives the leading column.
  * Inputs are the caller's responsibility to scale into [0, 2^bits)
  * (Layout does linear min-max scaling); `bits * N` must fit a positive
  * long. Null in any dimension nulls the key (degenerate rows sort
  * together; layout, not correctness).
  *
  * Native expression (not a HOF chain or UDF) so the key computation
  * stays inside whole-stage codegen — it runs once per row over the full
  * table being clustered, the definition of a hot path.
  */
case class ZOrderLong(bits: Int, dims: Seq[Expression]) extends Expression {

  override def children: Seq[Expression] = dims
  override def dataType: DataType = LongType
  override def nullable: Boolean = dims.exists(_.nullable)
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    if (dims.size < 2)
      TypeCheckResult.TypeCheckFailure("graft_zorder needs at least 2 dimensions")
    else if (bits < 1 || bits * dims.size > 63)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder: bits($bits) * dims(${dims.size}) must be in [1, 63]")
    else dims.find(_.dataType != LongType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder dimensions must be BIGINT, got ${bad.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val n = dims.size
    val vals = new Array[Long](n)
    var d = 0
    while (d < n) {
      val v = dims(d).eval(input)
      if (v == null) return null
      vals(d) = v.asInstanceOf[Long]
      d += 1
    }
    var acc = 0L
    var j = 0
    while (j < bits) {
      d = 0
      while (d < n) {
        acc |= ((vals(d) >>> j) & 1L) << (j * n + d)
        d += 1
      }
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = dims.map(_.genCode(ctx))
    val n = dims.size
    val acc = ctx.freshName("zacc")
    val j = ctx.freshName("zj")
    // inner dimension loop unrolled (n is 2-4 in practice): one shift-or
    // pair per dimension per bit, no array indirection
    val interleave = dims.indices.map { d =>
      s"$acc |= ((${evals(d).value} >>> $j) & 1L) << ($j * $n + $d);"
    }.mkString("\n")
    val anyNull =
      if (nullable) evals.map(_.isNull).mkString("(", " || ", ")") else "false"
    ev.copy(code =
      code"""
        ${evals.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          long $acc = 0L;
          for (int $j = 0; $j < $bits; $j++) {
            $interleave
          }
          ${ev.value} = $acc;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(dims = newChildren)
}
