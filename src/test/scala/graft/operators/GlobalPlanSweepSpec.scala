package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Anti-pattern sweep over EVERY registered gate's physical plan: any
  * future gate that plans a non-broadcast cartesian product fails here by
  * name before it melts a cluster. (Broadcast-of-one-row / broadcast-LUT
  * crossJoins plan as BroadcastNestedLoopJoin, which is the accepted
  * bounded pattern; `CartesianProduct` is the unbounded product Spark
  * only emits when both sides are non-broadcast — never acceptable.)
  *
  * Gates that EXECUTE work on invocation (streaming jobs, index builds,
  * bounded-rerank collects) are excluded: their plan properties are
  * pinned individually (`PlanShapeSpec`, `BatchKnnSpec`, …) and running
  * them here would re-run half the engine per suite.
  */
class GlobalPlanSweepSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  // invoking these RUNS a streaming query / builds a persisted index /
  // executes a bounded driver-side fold — plan-pinned in their own specs
  private val executesOnCall = Set(
    "st01_sliding_window", "st02_stream_dedup", "st03_stream_enrich",
    "st04_session_window", "st05_running_state", "st06_stream_join",
    "cdcm1_materialized_table", "cdcm2_incremental_agg",
    "cdcm3_incremental_join",
    "sim13_mmr_rerank",
    "q33_basket_lift", // persists + counts the basket frame up front
    "dd06b_via_index", "sim03b_via_index", "sim05b_via_index",
    "sim07b_via_index", "sim09b_hybrid_indexed", "sim11b_range_via_index",
    "txt18_index_lifecycle", "sim08_ivf_pq", // probes the PERSISTED index — building it is the execution
    "sim10_ivfpq_knn_join", "sim10b_knn_shuffle",
    "dd12_fuzzy_join", // localCheckpoints (cache-release contract); lazy twin pinned in PlanShapeSpec
    "dd06_incremental_dedup", "dd10_semantic_dedup", "dd09_dup_clusters",
    "mm09_media_canonical", // connected-components loop executes rounds
    "txt19_heavy_hitters")  // token total aggregates up front

  test("no gate plans a non-broadcast cartesian product") {
    graft.functions.GraftFunctions.register(spark)
    val offenders = graft.SparkEntry.queries.toSeq
      .filterNot { case (name, _) => executesOnCall(name) }
      .sortBy(_._1)
      .flatMap { case (name, fn) =>
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"gates planning CartesianProduct: ${offenders.mkString(", ")}")
  }
}
