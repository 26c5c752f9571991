package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Kill-and-resume proof for the durable append path (st04b's shape):
  * the query is STOPPED mid-stream — after at least one committed batch,
  * before the staging is drained — and restarted against the same
  * checkpoint and sink. The parquet file sink's `_spark_metadata` commit
  * log plus the checkpointed source offsets make the resumed run
  * exactly-once: the final sink contents must equal the uninterrupted
  * complete-mode result row for row — no session lost at the kill point,
  * none double-appended by the resume. This is the restart half of the
  * durability story the gates can't exercise (a gate runs to completion
  * by construction); DedupIngestSpec covers the foreachBatch-replay
  * half, this covers the native-sink half.
  */
class StreamRestartSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def sessionAgg() = {
    import spark.implicits._
    StreamOps.eventsStreamWithSentinel(spark, dir, 3)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros($"sw.start").as("sess_start_us"), $"user_id",
        $"n_events")
  }

  test("file-sink session pipeline survives a mid-stream kill exactly-once") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-restart")
    val out = work.resolve("sessions").toString
    val ckpt = work.resolve("ckpt").toString

    // phase 1: start, let the FIRST data batch commit, then kill. stop()
    // from the listener thread deadlocks on the stream execution lock, so
    // the listener only flips a latch and the test thread stops the query.
    val firstCommit = new java.util.concurrent.CountDownLatch(1)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) firstCommit.countDown()
    }
    spark.streams.addListener(listener)
    try {
      val q1 = sessionAgg().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(0)) // keep running until killed
        .start()
      assert(firstCommit.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "no data batch committed within 120 s")
      q1.stop() // the kill: offsets + sink log persist, staging not drained
      q1.awaitTermination()
    } finally spark.streams.removeListener(listener)

    // the kill landed mid-stream: some batches committed, not all five
    // (3 data + sentinel + closing no-data). If the stream outran the
    // test thread the restart would have nothing to prove — fail loudly
    // rather than pass vacuously.
    val committed = spark.read.parquet(out).count()
    val expected = StreamOps.st04SessionWindow(spark, dir)
    val expectedRows = expected.collect().map(_.toString).toSeq
    assert(committed < expectedRows.size,
      s"kill landed after the stream drained ($committed rows committed) — " +
        "nothing left for the restart to prove")

    // phase 2: resume from the same checkpoint + sink, drain to the end
    val q2 = sessionAgg().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    val resumed = spark.read.parquet(out).filter($"user_id" =!= -1L)
      .orderBy($"user_id", $"sess_start_us")
      .collect().map(_.toString).toSeq
    assert(resumed === expectedRows,
      "resumed sink does not equal the uninterrupted result")

    // cleanup
    val tw = java.nio.file.Files.walk(work)
    try tw.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally tw.close()
  }

  test("union + seam-dedup pipeline survives a mid-stream kill exactly-once") {
    // st08's state shape: DEDUP state spanning two sources. The part the
    // gate can't prove: a seam row whose first copy committed BEFORE the
    // kill and whose second copy arrives AFTER the resume must still
    // dedup — i.e. the dedup state store is recovered from the
    // checkpoint, not rebuilt empty (an empty rebuild would double every
    // seam row straddling the kill; a lost sink commit would drop rows).
    import spark.implicits._
    def pipeline() = StreamOps.st08Deduped(spark, dir, filesPerSide = 4)

    val expected = graft.core.Tables.events(spark, dir).toDF()
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round($"value" * 100).cast("long")).as("total_e2"))
      .orderBy($"user_id").collect().map(_.toString).toSeq
    val totalRows = graft.core.Tables.events(spark, dir).count()

    // Phase 1 — kill mid-stream. The kill is inherently racy: with
    // ProcessingTime(0) on a small SF the stream can drain every batch
    // between the first-commit latch firing and stop() landing. A
    // drained run proves nothing (not a failure of the engine), so
    // retry with a fresh work dir a bounded number of times and only
    // fail if the kill NEVER lands mid-stream.
    var work: java.nio.file.Path = null
    var out: String = null
    var ckpt: String = null
    var landed = false
    val maxAttempts = 5
    var attempt = 0
    while (!landed && attempt < maxAttempts) {
      attempt += 1
      work = java.nio.file.Files.createTempDirectory("graft-restart-union")
      out = work.resolve("rows").toString
      ckpt = work.resolve("ckpt").toString
      val firstCommit = new java.util.concurrent.CountDownLatch(1)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) firstCommit.countDown()
      }
      spark.streams.addListener(listener)
      try {
        val q1 = pipeline().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.ProcessingTime(0))
          .start()
        assert(firstCommit.await(120, java.util.concurrent.TimeUnit.SECONDS),
          "no data batch committed within 120 s")
        q1.stop()
        q1.awaitTermination()
      } finally spark.streams.removeListener(listener)
      val committed = spark.read.parquet(out).count()
      landed = committed < totalRows
      if (!landed) {
        val tw = java.nio.file.Files.walk(work)
        try tw.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally tw.close()
      }
    }
    assert(landed,
      s"kill landed after the stream drained in all $maxAttempts attempts — " +
        "nothing left for the restart to prove")

    val q2 = pipeline().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    val resumed = spark.read.parquet(out)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"v100").as("total_e2"))
      .orderBy($"user_id").collect().map(_.toString).toSeq
    assert(resumed === expected,
      "resumed union+dedup sink does not equal the whole undivided log — " +
        "a seam duplicate survived the restart or a commit was lost")

    val tw = java.nio.file.Files.walk(work)
    try tw.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally tw.close()
  }
}
