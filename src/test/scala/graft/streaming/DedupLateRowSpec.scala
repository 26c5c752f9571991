package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the late-row semantics st08's backfill-union seam dedup relies
  * on: `dropDuplicatesWithinWatermark` DROPS input rows whose event time
  * is older than the (previous batch's) watermark — or it does not; st08
  * is only safe under one of the two, so this spec measures the engine's
  * actual behavior and fails if it ever changes. Setup: two single-row
  * files; the first carries ts=10:00 (so the watermark after batch 1 is
  * 09:50 under a 10-minute delay), the second — admitted in batch 2 by
  * mtime order — carries ts=09:00, one hour LATE against that watermark.
  * If the late row survives, st08's small seam-sized delay is sound
  * under ANY admission interleaving (no row can ever be lost to
  * lateness, only deduplicated); if it is dropped, st08 must size its
  * delay to the full replay horizon instead. KEY context from the
  * sentinel work: stateful operators filter late input with the
  * PREVIOUS batch's watermark (eviction uses the current one), which is
  * why the second file, not the first, probes the filter.
  */
class DedupLateRowSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("dropDuplicatesWithinWatermark: measure late-row fate behind st08") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-wmdedup")
    val dir = base.resolve("src"); java.nio.file.Files.createDirectories(dir)
    def writeOne(id: Long, t: String, name: String, mtime: Long): Unit = {
      val tmp = base.resolve(name + ".tmp")
      Seq((id, t)).toDF("id", "t")
        .select($"id", to_timestamp($"t").as("ts"))
        .coalesce(1).write.parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir.toFile, name)
      assert(part.renameTo(dst)); dst.setLastModified(mtime)
    }
    writeOne(1L, "2024-01-01 10:00:00", "f1.parquet", 1700000000000L)
    writeOne(2L, "2024-01-01 09:00:00", "f2.parquet", 1700000100000L)
    val schema = spark.read.parquet(dir.resolve("f1.parquet").toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("parquet")
      .option("path", base.resolve("out").toString)
      .option("checkpointLocation", base.resolve("ck").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val survivors = spark.read.parquet(base.resolve("out").toString)
      .select($"id").as[Long].collect().sorted.toSeq
    // the pinned fact (measured, 4.1.2): the late row SURVIVES — unlike
    // windowed aggregation, the dedup operator never drops late input,
    // so a union-of-streams can never LOSE rows to watermark skew
    // between its sources; the only failure mode left is state eviction
    // re-admitting a duplicate, which st08 excludes by sizing the delay
    // to the bounded replay's full horizon. If this ever flips to
    // dropping, st08's no-loss argument is void — hence equality, not a
    // one-sided bound.
    assert(survivors == Seq(1L, 2L),
      s"late-row fate changed: survivors=$survivors — re-derive st08's " +
        "watermark-delay sizing against the new semantics")
  }
}
