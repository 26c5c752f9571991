package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The CDC-maintained index's exactly-once story END-TO-END: the cdcm4
  * pipeline killed mid-stream and resumed from the same checkpoint must
  * probe identically to an uninterrupted run. Segment idempotence
  * (batch-id-addressed overwrites) is what makes the replayed batch
  * harmless; this spec measures the whole contract instead of asserting
  * it — checkpointed binlog offsets + idempotent segment rewrites +
  * merge-on-read liveness, through a real kill.
  */
class CdcIndexRestartSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("cdcm4 pipeline: kill mid-stream, resume, probe == uninterrupted run") {
    import graft.operators.{CdcBinlog, TextAnalysis}
    graft.functions.GraftFunctions.register(spark)

    // reference: the gate's own uninterrupted run
    val want = CdcBinlog.cdcm4IndexFreshness(spark, dir)
      .collect().map(_.toString).toSeq

    val fix = CdcBinlog.fixtureDir(dir)
    val totalBytes = new java.io.File(fix).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("binlog.0"))
      .map(_.length).sum
    // small admission cap -> many micro-batches -> a kill can land
    val cap = math.max(totalBytes / 8, 1L)

    def stream(work: java.nio.file.Path, idx: String, trigger: Trigger) =
      spark.readStream.format("mysql-binlog")
        .option("payloadDdl", CdcBinlog.payloadDdl)
        .option("maxBytesPerTrigger", cap.toString)
        .load(fix)
        .writeStream
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val imgs = CdcBinlog.cdcm4BatchImages(batch, batchId).persist()
          try {
            if (!imgs.isEmpty)
              TextAnalysis.appendCdcTextSegment(imgs, idx, f"b$batchId%06d",
                nBuckets = 16)
          } finally imgs.unpersist()
          ()
        }
        .trigger(trigger)
        .start()

    // phase 1 — kill after the first committed batch, before the drain;
    // racy by nature, so retry with a fresh work dir a bounded number
    // of times (the StreamRestartSpec protocol)
    var work: java.nio.file.Path = null
    var idx: String = null
    var landed = false
    var attempt = 0
    while (!landed && attempt < 5) {
      attempt += 1
      work = java.nio.file.Files.createTempDirectory("graft-cdcm4-restart")
      idx = work.resolve("index").toString
      val firstCommit = new java.util.concurrent.CountDownLatch(1)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) firstCommit.countDown()
      }
      spark.streams.addListener(listener)
      try {
        val q1 = stream(work, idx, Trigger.ProcessingTime(0))
        assert(firstCommit.await(120, java.util.concurrent.TimeUnit.SECONDS))
        q1.stop(); q1.awaitTermination()
      } finally spark.streams.removeListener(listener)
      val segs = Option(new java.io.File(s"$idx/doclog").listFiles())
        .map(_.count(_.getName.startsWith("seg="))).getOrElse(0)
      // at cap/8 the full drain is ~9 segments; landed = partial
      landed = segs >= 1 && segs < 8
      if (!landed) {
        val tw = java.nio.file.Files.walk(work)
        try tw.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally tw.close()
      }
    }
    assert(landed, "kill never landed mid-stream in 5 attempts")

    // phase 2 — resume from the SAME checkpoint + index dir and drain
    val segsBefore = new java.io.File(s"$idx/doclog").listFiles()
      .count(_.getName.startsWith("seg="))
    val q2 = stream(work, idx, Trigger.AvailableNow())
    q2.awaitTermination()
    val segsAfter = new java.io.File(s"$idx/doclog").listFiles()
      .count(_.getName.startsWith("seg="))
    info(s"segments: $segsBefore before resume, $segsAfter after; " +
      s"q2 progress batches=${q2.recentProgress.length} " +
      s"rows=${q2.recentProgress.map(_.numInputRows).sum}")

    val got = TextAnalysis
      .bm25TopKViaCdcIndex(spark, idx, CdcBinlog.cdcm4Terms, 100, nBuckets = 16)
      .orderBy("r_sparse").collect().map(_.toString).toSeq
    assert(got === want,
      "resumed CDC index probe differs from the uninterrupted run — " +
        "a batch seam dropped or duplicated index state")

    val tw = java.nio.file.Files.walk(work)
    try tw.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally tw.close()
  }
}
