package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The convergence-loop half of the graph family: the gates unroll two
  * iterations so DuckDB can replay them; production runs
  * [[Graph.pageRankConverged]] to a fixed point. This spec pins (a) the
  * loop genuinely converges on the trade graph in a handful of damped
  * iterations, (b) its two-iteration prefix is EXACTLY the unrolled,
  * oracle-checked gate — same fixed-point arithmetic, so the gate's
  * hash transitively covers the loop's step function — and (c) the
  * fixed point is stable: one more step moves nothing beyond tolerance.
  */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("pageRankConverged reaches a fixed point in a few damped iterations") {
    import spark.implicits._
    val edges = Graph.tradeEdges(spark, dir)
    // deltas decay at the damping rate (measured: max|Δ| 1.2e7 → 5.5e5
    // over 20 iterations, ×0.85 per step), so the tolerance is sized in
    // those units — a converged run still takes ~20 damped iterations
    val (ranks, it) = Graph.pageRankConverged(edges, tolE6 = 500000,
      maxIter = 30, checkpointEvery = 3)
    assert(it < 30, s"did not converge within 30 iterations")
    assert(it >= 3, s"converged suspiciously fast ($it iterations) — " +
      "tolerance no longer exercises the loop")
    val nNodes = edges.select($"src").distinct().count()
    assert(ranks.count() === nNodes)
    // determinism: a fresh run takes the same path to the same fixed point
    val (again, extra) = Graph.pageRankConverged(edges, tolE6 = 500000,
      maxIter = it + 5, checkpointEvery = 3)
    assert(extra === it, "re-run from scratch took a different iteration " +
      "count — the loop is not deterministic")
    assert(again.orderBy($"node").collect().toSeq ===
      ranks.orderBy($"node").collect().toSeq)
  }

  test("seeded loop's two-iteration prefix equals the graph04 gate") {
    import spark.implicits._
    val seeds = graft.core.Tables.customer(spark, dir).toDF()
      .filter($"c_nationkey" < 5)
      .select(($"c_custkey" * 2).as("node"))
    val (r2, it) = Graph.pageRankConverged(Graph.tradeEdges(spark, dir),
      tolE6 = -1, maxIter = 2, checkpointEvery = 10, seeds = Some(seeds))
    assert(it === 2)
    val loop = r2.select(($"node" % 2).as("node_kind"),
        expr("node div 2").as("node_key"), $"r".as("rank_e6"))
      .orderBy($"node_kind", $"node_key").collect().toSeq
    val gate = Graph.graph04PersonalizedPr(spark, dir).collect().toSeq
    assert(loop === gate)
  }

  test("two-iteration prefix equals the unrolled oracle-checked gate") {
    import spark.implicits._
    // tolE6 = -1 can never be met (max |delta| >= 0), so exactly maxIter run
    val (r2, it) = Graph.pageRankConverged(Graph.tradeEdges(spark, dir),
      tolE6 = -1, maxIter = 2, checkpointEvery = 10)
    assert(it === 2)
    val loop = r2.select(($"node" % 2).as("node_kind"),
        expr("node div 2").as("node_key"), $"r".as("rank_e6"))
      .orderBy($"node_kind", $"node_key").collect().toSeq
    val gate = Graph.graph01PageRank(spark, dir).collect().toSeq
    assert(loop === gate)
  }
}
