package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (no UDF, no driver-side collect). Floats are
  * widened to double BEFORE multiplying and the fold is a sequential
  * left-to-right double accumulation — bit-identical to the DuckDB oracle
  * expression in [[duckDot]].
  */
object VectorOps {

  /** Exact sequential dot product of two float-array columns, as double.
    * Resolves to the codegen'd [[graft.functions.FloatDotProduct]]
    * expression (register via [[graft.functions.GraftFunctions.register]];
    * all graft query entry points do). Numerically identical to the
    * HOF form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` it replaced.
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Cosine similarity (deterministic: dot + sqrt on doubles). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-bit LSH bucket from the first `nBits` dimensions: a crude but
    * deterministic random-hyperplane sketch (axis-aligned planes). At scale
    * this is the shuffle key that keeps candidate generation linear.
    */
  def signBucket(v: Column, nBits: Int = 8): Column =
    (0 until nBits).map { i =>
      (element_at(v, i + 1) > lit(0f)).cast("int") * lit(1 << i)
    }.reduce(_ + _)

  // ---- DuckDB oracle SQL fragments (kept adjacent so the two stay in sync)

  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"

  def duckCosine(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  def duckSignBucket(v: String, nBits: Int = 8): String =
    (0 until nBits).map { i =>
      s"(CASE WHEN $v[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
