package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the contract of [[StreamOps.eventsStreamWithSentinel]] — the
  * watermark-flush staging that lets finite replays drain append-mode
  * state (st04b's sessions, st07's outer-join null side):
  *
  *  1. admission is MULTI-BATCH and time-ordered: `nFiles` data batches
  *     (range-split by event time) then the sentinel batch — not one
  *     collapsed batch, which would make the cross-batch claims of the
  *     durable gates vacuous;
  *  2. NO row is ever dropped as late, at a file count (3) beyond the
  *     one-batch lag of the engine's late-event filter (Spark filters
  *     late rows with the PREVIOUS batch's watermark; a random split
  *     survives 2 files by that lag alone and silently loses data at 3);
  *  3. emission under a watermark is INCREMENTAL — at least two distinct
  *     data batches finalize rows, proving the watermark advances
  *     between batches rather than only at the sentinel;
  *  4. the closing no-data batch runs and the final watermark stands
  *     past every real event (sentinel − delay), which is what flushes
  *     the stream tail that plain AvailableNow would hold forever.
  */
class SentinelStagingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("sentinel staging: time-ordered multi-batch admission, no late drops, incremental finalization") {
    import spark.implicits._
    val agg = StreamOps.eventsStreamWithSentinel(spark, dir, 3)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros($"sw.start").as("sess_start_us"), $"user_id",
        $"n_events")
    // per batch: (batchId, session rows, events covered by those sessions)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = agg.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val r = b.agg(count(lit(1)), coalesce(sum("n_events"), lit(0L))).head()
        emitted += ((id, r.getLong(0), r.getLong(1))); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.toSeq

    // 1. nFiles data batches + 1 sentinel batch + closing no-data batch
    val dataBatches = progress.filter(_.numInputRows > 0)
    assert(dataBatches.size === 4, // 3 range files + sentinel file
      s"expected 4 input batches, got ${progress.map(_.numInputRows).toList}")
    assert(progress.exists(_.numInputRows == 0),
      "no closing no-data batch ran — nothing would flush the stream tail")
    // admission is time-ordered: per-batch max event time strictly rises
    val maxes = dataBatches.flatMap(p => Option(p.eventTime.get("max")))
    assert(maxes.size === dataBatches.size && maxes == maxes.sorted,
      s"per-batch max event times not ascending: $maxes")

    // 2. zero late drops across every stateful operator of every batch
    val lateDrops = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsDroppedByWatermark).sum
    assert(lateDrops === 0, s"$lateDrops rows dropped as late")

    // 3. incremental finalization: >=2 distinct data batches emitted rows
    assert(emitted.count(_._2 > 0) >= 2,
      s"emission not incremental: $emitted — watermark only advanced at the end")

    // 4. final watermark stands past every real event (sentinel - delay)
    val realMax = graft.core.Tables.events(spark, dir).toDF()
      .agg(max("ts")).head().getTimestamp(0)
    val finalWm = java.time.Instant.parse(
      progress.last.eventTime.get("watermark"))
    assert(finalWm.isAfter(realMax.toInstant),
      s"final watermark $finalWm does not clear the real data max $realMax")

    // and the rows reconcile: the finalized sessions cover every real
    // event exactly once (the sentinel's own session never finalizes —
    // its end exceeds the final watermark — so nothing sentinel-borne is
    // in the output to subtract)
    val realEvents = graft.core.Tables.events(spark, dir).toDF().count()
    assert(emitted.map(_._3).sum === realEvents,
      s"finalized sessions cover ${emitted.map(_._3).sum} events, " +
        s"table has $realEvents")
  }
}
