package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Runtime (bloom) filter injection — the 100 TB scan-reduction path for
  * selective dimension joins that broadcast alone doesn't give you.
  *
  * When a fact table shuffle-joins a dimension carrying a selective
  * predicate, Spark's `InjectRuntimeFilter` builds a bloom filter over
  * the dimension's join keys and applies `might_contain` on the fact
  * side BEFORE its shuffle, cutting the shuffled volume to roughly the
  * matching fraction. The engine leans on this instead of hand-rolled
  * semi-join prefilters. The knobs are scale-gated by design:
  *
  *   spark.sql.optimizer.runtime.bloomFilter.enabled (default true)
  *   ...creationSideThreshold   (default 10 MB — dim aggregate must be small)
  *   ...applicationSideScanSizeThreshold (default 10 GB — only worth it
  *      when the fact scan is big; at 100 TB this is always met)
  *
  * Local test tables sit far below 10 GB, so the spec lowers the
  * application-side threshold to 0 to make injection observable, pins
  * the `might_contain` filter in the optimized plan, and hash-compares
  * results with the filter on and off — the filter must be a pure
  * scan-reducer, never a semantics change. Production guidance: leave
  * the defaults; they inject exactly in the big-scan + small-dim shape
  * this spec reconstructs in miniature.
  */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  private def withConfs[T](confs: (String, String)*)(f: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def factJoin() = {
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, d).toDF()
    val p = graft.core.Tables.part(spark, d).toDF()
      .filter($"p_size" === 1) // the selective dim predicate
    li.join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(38,10)")).as("sum_qty"))
      .orderBy($"p_brand")
  }

  test("selective dim join injects might_contain on the fact side (shuffle join shape)") {
    val injected = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join shape the rule targets (a broadcast join
      // already carries its own pruning economics)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      factJoin().queryExecution.optimizedPlan.toString
    }
    assert(injected.contains("might_contain"),
      s"expected a bloom runtime filter on the fact side, plan:\n$injected")
  }

  test("the runtime filter is a pure scan-reducer: identical results on and off") {
    val off = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      factJoin().collect().map(_.toString).toSeq
    }
    val on = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      factJoin().collect().map(_.toString).toSeq
    }
    assert(on.nonEmpty && on === off)
  }
}
