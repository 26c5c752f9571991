package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the bounded-state contract of the streaming dedup (st02's engine).
  *
  * Plain `dropDuplicates("k")` with the event-time column OUTSIDE the key
  * set never evicts state — the watermark is inert for it, so the store
  * grows with every key ever seen (unbounded on an infinite stream).
  * `dropDuplicatesWithinWatermark("k")` keys state the same way but
  * expires each entry once the watermark passes its event time + delay.
  *
  * The observable difference, and what this spec asserts: after the
  * watermark has advanced far past a key's expiry, a RE-ARRIVAL of that
  * key is re-emitted — proof the entry was dropped from the store rather
  * than retained forever. Under plain dropDuplicates the same re-arrival
  * is suppressed (state retained), which is exactly the unbounded-state
  * failure mode; the companion test documents that behavior so the two
  * APIs can't be silently swapped back.
  */
class StreamingStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Runs three micro-batches through a dedup transform and returns the
    * total emitted row count:
    *   batch 0: k1 + k2 at 10:00            (both novel -> 2 rows)
    *   batch 1: k3 at 12:00                  (novel -> 1 row; advances the
    *            watermark to 11:50, far past k1's 10:10 expiry)
    *   batch 2: k1 again at 12:00            (evicted -> re-emitted, or
    *            retained -> suppressed: the discriminating arrival)
    */
  private def emittedRows(dedup: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                          sink: String): Long = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = dedup(
      mem.toDF().toDF("k", "ts").withWatermark("ts", "10 minutes"))
    val q = deduped.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      mem.addData("k1" -> ts("2024-01-01 10:00:00"), "k2" -> ts("2024-01-01 10:00:00"))
      q.processAllAvailable()
      mem.addData("k3" -> ts("2024-01-01 12:00:00"))
      q.processAllAvailable()
      mem.addData("k1" -> ts("2024-01-01 12:00:00"))
      q.processAllAvailable()
      spark.table(sink).count()
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark evicts state: expired key re-emits on re-arrival") {
    assert(emittedRows(_.dropDuplicatesWithinWatermark("k"), "graft_state_evict") === 4L)
  }

  test("plain dropDuplicates with event-time outside the keys retains state forever (the bug st02 had)") {
    assert(emittedRows(_.dropDuplicates("k"), "graft_state_retain") === 3L)
  }
}
