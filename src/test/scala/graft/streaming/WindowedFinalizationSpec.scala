package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The durable finalization path for windowed streaming aggregations
  * (update-mode foreachBatch → batch-addressed partitions → latest-wins
  * fold): proves the folded read equals the complete-mode gate result on
  * the staged events stream, that a replayed batch is a no-op
  * (idempotence by addressing), and that compaction preserves the view
  * while dropping the update partitions.
  */
class WindowedFinalizationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("folded read equals the complete-mode gate result on the staged events stream") {
    val dir = "/root/testdata/sf0.001"
    val complete = StreamOps.st01SlidingWindow(spark, dir)
      .collect().map(_.toString).toSeq
    val durable = StreamOps.st01bDurableWindow(spark, dir)
      .collect().map(_.toString).toSeq
    assert(durable.nonEmpty)
    assert(durable === complete)
  }

  test("multi-batch updates fold latest-wins; a replayed batch is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val work = Files.createTempDirectory("graft-winfin")
    val view = work.resolve("view").toString
    val mem = MemoryStream[(String, Timestamp, Double)]
    val agg = mem.toDF().toDF("k", "ts", "v")
      .groupBy(window($"ts", "1 hour").as("w"), $"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("ws"),
        $"k", $"n", $"s")
    val q = StreamOps.maintainWindowedAgg(agg, view,
      work.resolve("ckpt").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // batch 0: two groups open
      mem.addData(("a", ts("2024-01-01 10:05:00"), 1.0),
        ("b", ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // batch 1: group (10:00, a) updated AGAIN (cross-batch window), one new
      mem.addData(("a", ts("2024-01-01 10:40:00"), 4.0),
        ("c", ts("2024-01-01 11:05:00"), 8.0))
      q.processAllAvailable()
    } finally q.stop()

    def folded = StreamOps.readWindowedAgg(spark, view, Seq("ws", "k"))
      .orderBy("ws", "k").collect().map(_.toString).toSeq
    val expected = Seq(
      "[2024-01-01 10:00:00,a,2,5.0]", // latest update wins: n=2, s=5
      "[2024-01-01 10:00:00,b,1,2.0]",
      "[2024-01-01 11:00:00,c,1,8.0]")
    assert(folded === expected)

    // replayed batch (at-least-once foreachBatch): rewriting batch 1's own
    // partition with the same rows changes nothing — idempotence by
    // addressing, not by sink transactionality
    // detach (eager localCheckpoint) — the overwrite below deletes the
    // very files a lazy plan would re-read
    val replay = spark.read.parquet(s"$view/updates/batch=1").localCheckpoint(true)
    StreamOps.writeWindowedUpdates(replay, view, 1L)
    assert(folded === expected)

    // compaction: view unchanged, update partitions gone, base present
    StreamOps.compactWindowedAgg(spark, view, Seq("ws", "k"))
    assert(folded === expected)
    assert(!Files.exists(java.nio.file.Paths.get(view, "updates")))
    assert(Files.exists(java.nio.file.Paths.get(view, "base")))

    // post-compaction updates fold OVER the base (base is batch -1)
    val late = Seq(("2024-01-01 10:00:00", "a", 3L, 9.0)).toDF("ws", "k", "n", "s")
    StreamOps.writeWindowedUpdates(late, view, 2L)
    assert(folded === Seq(
      "[2024-01-01 10:00:00,a,3,9.0]",
      "[2024-01-01 10:00:00,b,1,2.0]",
      "[2024-01-01 11:00:00,c,1,8.0]"))
  }
}
