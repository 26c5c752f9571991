package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming exact dedup: state-store dropDuplicates over a stream
  * carrying duplicates (the streaming arm of the dedup family — at scale,
  * watermarked state eviction bounds the store).
  */
class StreamDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("dropDuplicatesWithinWatermark on a duplicated stream yields each event once") {
    val dir = "/root/testdata/sf0.001"
    val s1 = StreamOps.eventsStream(spark, dir)
    val s2 = StreamOps.eventsStream(spark, dir)
    val doubled = s1.union(s2) // every event twice (identical ts, 0 s apart)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = doubled.writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val n = spark.sql("select count(*), count(distinct event_id) from deduped").head
    val batch = graft.core.Tables.events(spark, dir).count()
    assert(n.getLong(0) === batch)
    assert(n.getLong(1) === batch)
  }
}
