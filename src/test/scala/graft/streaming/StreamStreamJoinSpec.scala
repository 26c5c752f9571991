package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stream-stream interval join with watermarks (SURVEY §2.4's event
  * correlation): purchases joined to the same user's clicks within the
  * preceding hour — both sides streaming, state bounded by the watermark
  * and the join's time range. Checked against the identical batch join.
  */
class StreamStreamJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("purchases ⋈ prior-hour clicks: streaming equals batch") {
    val dir = "/root/testdata/sf0.001"

    def prep(df: org.apache.spark.sql.DataFrame) = {
      val p = df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val c = df.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      (p, c)
    }
    val cond = col("p_user") === col("c_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") && col("c_ts") <= col("p_ts")

    val (ps, cs) = prep(StreamOps.eventsStream(spark, dir))
    val joined = ps.withWatermark("p_ts", "2 hours")
      .join(cs.withWatermark("c_ts", "2 hours"), cond)
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql("select count(*) from ssjoin").head.getLong(0)

    val (pb, cb) = prep(graft.core.Tables.events(spark, dir))
    val batch = pb.join(cb, cond).count()
    assert(streamed === batch)
    assert(batch > 0)
  }
}
