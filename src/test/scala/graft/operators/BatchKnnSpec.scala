package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Batch k-NN join over the persisted IVF-PQ index
  * ([[Similarity.sim10IvfPqKnnJoin]]). Pinned:
  *  - per-query shape: exactly 3 ranked rows per query, ranks 1..3, no
  *    self-matches;
  *  - single-query agreement: qid 0's top-3 equals the head of sim08's
  *    top-10 for the same query through the same index (identical probe
  *    geometry — the batch path must not change any per-query result);
  *  - every shuffle carries slim rows (no embedding, LUT, or code
  *    payloads in an exchange).
  */
class BatchKnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  test("per-query shape: 3 ranked rows each, no self-matches") {
    import spark.implicits._
    val rows = Similarity.sim10IvfPqKnnJoin(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L)), s"qid $qid")
      assert(!rs.exists(_.getLong(2) == qid), s"self-match for qid $qid")
    }
  }

  test("qid 0 agrees with sim08 through the same index") {
    val batch = Similarity.sim10IvfPqKnnJoin(spark, d).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
      .map(r => (r.getLong(2), r.getDouble(4)))
    val single = Similarity.sim08IvfPq(spark, d).collect().take(3)
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(batch.sameElements(single),
      s"batch=${batch.mkString(",")} single=${single.mkString(",")}")
  }

  test("every exchange is slim — no embedding/LUT/code payloads shuffle") {
    val p = Similarity.sim10IvfPqKnnJoin(spark, d)
    val physical = p.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case x => x
    }
    val exchanges = physical.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name.toLowerCase)
      assert(!cols.exists(c => c.contains("embedding") || c.contains("lut") ||
        c.contains("codes") || c == "qv"),
        "heavy payload in a sim10 shuffle: " + cols.mkString(","))
    }
  }

  test("oversized batch takes the shuffle-join fallback with identical results") {
    // cap of 1 forces the no-broadcast-hint path for the same query batch;
    // the contract is IDENTITY of results — only the join strategy moves
    val viaBroadcast = Similarity.sim10IvfPqKnnJoin(spark, d).collect().map(_.toString)
    val viaShuffle = Similarity.sim10IvfPqKnnJoin(spark, d, maxBroadcastBatch = 1L)
      .collect().map(_.toString)
    assert(viaShuffle.sameElements(viaBroadcast))
    // and the fallback's per-query structures really are un-hinted: with
    // stats-based auto-broadcast off (the corpus-scale condition — a big
    // batch's stats blow the threshold), the fallback must plan shuffle
    // joins while the capped path still broadcasts via its hints
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def initial(df: org.apache.spark.sql.DataFrame) =
        (df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
          case x => x
        }).toString
      val fb = initial(Similarity.sim10IvfPqKnnJoin(spark, d, maxBroadcastBatch = 1L))
      assert(fb.contains("SortMergeJoin") || fb.contains("ShuffledHashJoin"),
        "fallback path still plans broadcast-only joins: " + fb.take(1500))
      val hinted = initial(Similarity.sim10IvfPqKnnJoin(spark, d))
      assert(hinted.contains("BroadcastHashJoin"),
        "capped path lost its broadcast hints: " + hinted.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
