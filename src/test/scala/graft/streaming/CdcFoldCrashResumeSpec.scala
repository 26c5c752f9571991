package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The one maintenance crash CdcIndexRestartSpec doesn't reach: the
  * FOLD ITSELF dying inside publishDir's two-rename swap while the
  * ingest pipeline holds a live checkpoint. PublishRecoverySpec pins
  * recoverPublish on fabricated static directories; here each crash
  * state is reconstructed with REAL content from a real cdcm4 run —
  * the old multi-segment index (snapshotted before the fold) and the
  * genuinely folded result — and recovery must hand the RESUMED stream
  * a state it can keep appending to, with the final probe matching the
  * cdcm4 gate's oracle-checked answer.
  *
  * Two crash states, two recovery routes:
  *  - between the renames (old under `.trash-*`, fold under
  *    `.compact-*`, live gone) → the OLD state restores, and the
  *    `_folded_through` fence — which travelled with the dropped
  *    staging dir — must NOT survive into live (a stale fence over an
  *    UNFOLDED index would silently drop legitimate replays);
  *  - after the old state was consumed (only `.compact-*` left) → the
  *    FOLDED state publishes, fence intact, and the resumed stream's
  *    replayed batch must respect it against seg=base.
  */
class CdcFoldCrashResumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def rmTree(work: java.nio.file.Path): Unit = {
    val tw = java.nio.file.Files.walk(work)
    try tw.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally tw.close()
  }

  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    val tw = java.nio.file.Files.walk(from)
    try tw.forEach { p =>
      val t = to.resolve(from.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    } finally tw.close()
  }

  private lazy val cap = {
    val fix = graft.operators.CdcBinlog.fixtureDir(dir)
    val totalBytes = new java.io.File(fix).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("binlog.0"))
      .map(_.length).sum
    math.max(totalBytes / 8, 1L)
  }

  private def changeStream = {
    import graft.operators.CdcBinlog
    spark.readStream.format("mysql-binlog")
      .option("payloadDdl", CdcBinlog.payloadDdl)
      .option("maxBytesPerTrigger", cap.toString)
      .load(CdcBinlog.fixtureDir(dir))
  }

  private def start(work: java.nio.file.Path, trigger: Trigger): StreamingQuery = {
    import graft.operators.{CdcBinlog, TextAnalysis}
    val idx = work.resolve("index").toString
    changeStream.writeStream
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
  }

  private def segDirs(path: java.nio.file.Path): Int =
    Option(path.toFile.listFiles())
      .map(_.count(_.getName.startsWith("seg="))).getOrElse(0)

  private def probe(work: java.nio.file.Path): Seq[String] = {
    import graft.operators.{CdcBinlog, TextAnalysis}
    TextAnalysis.bm25TopKViaCdcIndex(spark, work.resolve("index").toString,
        CdcBinlog.cdcm4Terms, 100, nBuckets = 16)
      .orderBy("r_sparse").collect().map(_.toString).toSeq
  }

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run the pipeline, kill it mid-stream (1 ≤ segments < 8, retried),
    * fold the index for real, snapshot-reconstruct the requested crash
    * state, and return the work dir — live gone, residues in place.
    */
  private def crashedFold(keepTrash: Boolean): java.nio.file.Path = {
    import graft.operators.TextAnalysis
    var work: java.nio.file.Path = null
    var landed = false
    var attempt = 0
    while (!landed && attempt < 5) {
      attempt += 1
      work = java.nio.file.Files.createTempDirectory("graft-foldcrash")
      val firstCommit = new java.util.concurrent.CountDownLatch(1)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) firstCommit.countDown()
      }
      spark.streams.addListener(listener)
      try {
        val q1 = start(work, Trigger.ProcessingTime(0))
        assert(firstCommit.await(120, java.util.concurrent.TimeUnit.SECONDS))
        q1.stop(); q1.awaitTermination()
      } finally spark.streams.removeListener(listener)
      val segs = segDirs(work.resolve("index").resolve("doclog"))
      landed = segs >= 1 && segs < 8
      if (!landed) rmTree(work)
    }
    assert(landed, "kill never landed mid-stream in 5 attempts")

    val live = work.resolve("index")
    val old = work.resolve("old-snapshot")
    copyTree(live, old)
    TextAnalysis.compactCdcTextIndex(spark, live.toString, nBuckets = 16)
    // live now holds exactly what the fold staged; rewind the swap to
    // the requested crash point with the real artifacts
    java.nio.file.Files.move(live, work.resolve("index.compact-999"))
    if (keepTrash) java.nio.file.Files.move(old, work.resolve("index.trash-999"))
    else rmTree(old)
    work
  }

  test("fold crash between renames: rollback drops the fence, resume + re-fold match the gate") {
    import graft.operators.{CdcBinlog, Layout, TextAnalysis}
    graft.functions.GraftFunctions.register(spark)
    val want = CdcBinlog.cdcm4IndexFreshness(spark, dir)
      .collect().map(_.toString).toSeq

    val work = crashedFold(keepTrash = true)
    val live = new org.apache.hadoop.fs.Path(work.resolve("index").toString)
    val report = Layout.recoverPublish(fs, live)
    info(s"recoverPublish: $report")
    assert(report.startsWith("restored"), s"expected the OLD state back, got: $report")
    assert(Layout.foldedThrough(fs, live).isEmpty,
      "the staged fold's replay fence leaked into the restored UNFOLDED " +
        "index — a resume would silently drop legitimate replays")
    assert(segDirs(work.resolve("index").resolve("doclog")) >= 1)

    val q2 = start(work, Trigger.AvailableNow())
    q2.awaitTermination()
    TextAnalysis.compactCdcTextIndex(spark, work.resolve("index").toString,
      nBuckets = 16)
    assert(probe(work) === want,
      "rollback + resume + re-fold diverged from the uninterrupted gate")
    rmTree(work)
  }

  test("fold crash after the old state was consumed: the fold publishes, resume respects the fence") {
    import graft.operators.{CdcBinlog, Layout}
    graft.functions.GraftFunctions.register(spark)
    val want = CdcBinlog.cdcm4IndexFreshness(spark, dir)
      .collect().map(_.toString).toSeq

    val work = crashedFold(keepTrash = false)
    val live = new org.apache.hadoop.fs.Path(work.resolve("index").toString)
    val report = Layout.recoverPublish(fs, live)
    info(s"recoverPublish: $report")
    assert(report.startsWith("published"), s"expected the FOLDED state in, got: $report")
    assert(Layout.foldedThrough(fs, live).isDefined,
      "the published fold lost its replay fence — a replayed batch " +
        "would double rows against seg=base")

    val q2 = start(work, Trigger.AvailableNow())
    q2.awaitTermination()
    assert(probe(work) === want,
      "publish-forward + resume diverged from the uninterrupted gate — " +
        "a replayed folded batch doubled rows against seg=base")
    rmTree(work)
  }

  // ---- the ANN twin: quantizer through crash recovery ------------------

  private def startAnn(work: java.nio.file.Path, trigger: Trigger): StreamingQuery = {
    import graft.operators.{CdcBinlog, Similarity}
    val idx = work.resolve("annindex").toString
    changeStream.writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val imgs = CdcBinlog.cdcm5BatchImages(batch, batchId).persist()
        try {
          if (!imgs.isEmpty)
            Similarity.appendCdcAnnSegment(imgs, idx, f"b$batchId%06d")
        } finally imgs.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
  }

  private def centroids(work: java.nio.file.Path): Seq[(Int, Seq[Double])] =
    spark.read.parquet(work.resolve("annindex").resolve("centroids").toString)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq

  private def annProbe(work: java.nio.file.Path): Seq[String] = {
    import org.apache.spark.sql.functions.{max, struct}
    import spark.implicits._
    val idx = work.resolve("annindex").toString
    val live = spark.read.parquet(s"$idx/doclog").groupBy($"vec_id")
      .agg(max(struct($"ver", $"deleted")).as("m"))
      .select($"vec_id", $"m.ver".as("ver"), $"m.deleted".as("deleted"))
      .filter(!$"deleted")
    val probeVec = spark.read.parquet(s"$idx/cells")
      .join(live.select($"vec_id", $"ver"), Seq("vec_id", "ver"))
      .orderBy($"vec_id").select($"embedding")
      .head().getSeq[Long](0)
    graft.operators.Similarity.mipsTopKViaCdcAnnIndex(spark, idx, probeVec, 100)
      .orderBy("r_dense").collect().map(_.toString).toSeq
  }

  /** The ANN compactor shares the text twin's publish protocol, but its
    * fold carries one artifact the text index doesn't have: the coarse
    * quantizer, staged as a COPY beside the folded cells. A crash
    * between the renames must roll the OLD centroids back byte-exactly
    * (publishing the staged copy instead would be invisible today —
    * they're equal — but the invariant is what keeps a future fold that
    * REBUILDS the quantizer from silently re-clustering a rolled-back
    * index), and the resumed stream plus a re-fold must match an
    * uninterrupted same-cap run on both the probe AND the quantizer.
    */
  test("ANN fold crash between renames: old quantizer restores byte-exactly; resume + re-fold match") {
    import graft.operators.{Layout, Similarity}
    graft.functions.GraftFunctions.register(spark)

    // uninterrupted same-cap reference (same admission → same batch 0 →
    // value-identical quantizer, the cdcm5 restart leg's contract)
    val ref = java.nio.file.Files.createTempDirectory("graft-annfold-ref")
    val qRef = startAnn(ref, Trigger.AvailableNow())
    qRef.awaitTermination()
    assert(segDirs(ref.resolve("annindex").resolve("doclog")) >= 3)
    Similarity.compactCdcAnnIndex(spark, ref.resolve("annindex").toString)
    val wantCent = centroids(ref)
    val wantProbe = annProbe(ref)

    // run, kill mid-stream, fold for real, rewind the swap to
    // between-the-renames with the real artifacts
    var work: java.nio.file.Path = null
    var landed = false
    var attempt = 0
    while (!landed && attempt < 5) {
      attempt += 1
      work = java.nio.file.Files.createTempDirectory("graft-annfold")
      val firstCommit = new java.util.concurrent.CountDownLatch(1)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) firstCommit.countDown()
      }
      spark.streams.addListener(listener)
      try {
        val q1 = startAnn(work, Trigger.ProcessingTime(0))
        assert(firstCommit.await(120, java.util.concurrent.TimeUnit.SECONDS))
        q1.stop(); q1.awaitTermination()
      } finally spark.streams.removeListener(listener)
      val segs = segDirs(work.resolve("annindex").resolve("doclog"))
      landed = segs >= 1 && segs < 8
      if (!landed) rmTree(work)
    }
    assert(landed, "kill never landed mid-stream in 5 attempts")
    val live = work.resolve("annindex")
    val preFoldCent = centroids(work)
    assert(preFoldCent === wantCent,
      "same-cap admission produced a different quantizer — the reference " +
        "run is not comparable and the test premise broke")
    val old = work.resolve("old-snapshot")
    copyTree(live, old)
    Similarity.compactCdcAnnIndex(spark, live.toString)
    java.nio.file.Files.move(live, work.resolve("annindex.compact-999"))
    java.nio.file.Files.move(old, work.resolve("annindex.trash-999"))

    val liveP = new org.apache.hadoop.fs.Path(live.toString)
    val report = Layout.recoverPublish(fs, liveP)
    info(s"recoverPublish: $report")
    assert(report.startsWith("restored"), s"expected the OLD state back, got: $report")
    assert(Layout.foldedThrough(fs, liveP).isEmpty,
      "the staged fold's replay fence leaked into the restored UNFOLDED index")
    assert(centroids(work) === preFoldCent,
      "rollback did not restore the pre-fold quantizer byte-exactly")

    val q2 = startAnn(work, Trigger.AvailableNow())
    q2.awaitTermination()
    Similarity.compactCdcAnnIndex(spark, live.toString)
    assert(centroids(work) === wantCent,
      "the re-fold after recovery changed the quantizer")
    assert(annProbe(work) === wantProbe,
      "rollback + resume + re-fold diverged from the uninterrupted run")
    rmTree(ref); rmTree(work)
  }

  /** The requantize twin: unlike a compact, the staged artifact carries
    * a REBUILT quantizer, so the two crash states diverge in what they
    * must preserve — a between-renames crash rolls the FIRST-BATCH
    * centroids back byte-exactly (publishing the rebuilt ones with the
    * OLD unfolded cells would mis-prune every probe: assignments and
    * quantizer must always travel together), while an after-consume
    * crash publishes the NEW quantizer with its matching re-assigned
    * base. Either way the resumed stream's replayed batch sits at or
    * below the published fence and must be skipped, and the exact probe
    * — partition-invariant by construction — must match an
    * uninterrupted same-cap run that never requantized at all.
    */
  test("requantize crash: between-renames restores the old quantizer; after-consume publishes the new one; resume respects the fence") {
    import graft.operators.{Layout, Similarity}
    graft.functions.GraftFunctions.register(spark)

    // uninterrupted same-cap reference, NO requantize: the exact probe
    // is invariant to the cell partition, so this is also the
    // post-requantize ground truth
    val ref = java.nio.file.Files.createTempDirectory("graft-annrq-ref")
    val qRef = startAnn(ref, Trigger.AvailableNow())
    qRef.awaitTermination()
    assert(segDirs(ref.resolve("annindex").resolve("doclog")) >= 3)
    val wantProbe = annProbe(ref)

    // run, kill mid-stream (>= 2 segments so the requantize has real
    // multi-batch state to consume, < 8 so batches remain to resume)
    var work: java.nio.file.Path = null
    var landed = false
    var attempt = 0
    while (!landed && attempt < 5) {
      attempt += 1
      work = java.nio.file.Files.createTempDirectory("graft-annrq")
      val secondCommit = new java.util.concurrent.CountDownLatch(2)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) secondCommit.countDown()
      }
      spark.streams.addListener(listener)
      try {
        val q1 = startAnn(work, Trigger.ProcessingTime(0))
        assert(secondCommit.await(120, java.util.concurrent.TimeUnit.SECONDS))
        q1.stop(); q1.awaitTermination()
      } finally spark.streams.removeListener(listener)
      val segs = segDirs(work.resolve("annindex").resolve("doclog"))
      landed = segs >= 2 && segs < 8
      if (!landed) rmTree(work)
    }
    assert(landed, "kill never landed mid-stream in 5 attempts")

    val live = work.resolve("annindex")
    val liveP = new org.apache.hadoop.fs.Path(live.toString)
    val preCent = centroids(work) // the first batch's quantizer
    val old = work.resolve("old-snapshot")
    copyTree(live, old)
    Similarity.requantizeCdcAnnIndex(spark, live.toString)
    val reqCent = centroids(work) // the rebuilt quantizer
    assert(reqCent !== preCent, "the rebuild kept the first-batch quantizer")
    val reqFence = Layout.foldedThrough(fs, liveP)
    assert(reqFence.isDefined)

    // crash state A: between the renames — old under `.trash-*`, the
    // requantized tree under `.optimize-*`, live gone
    java.nio.file.Files.move(live, work.resolve("annindex.optimize-999"))
    java.nio.file.Files.move(old, work.resolve("annindex.trash-999"))
    val reportA = Layout.recoverPublish(fs, liveP)
    info(s"recoverPublish A: $reportA")
    assert(reportA.startsWith("restored"), s"expected the OLD state back, got: $reportA")
    assert(Layout.foldedThrough(fs, liveP).isEmpty,
      "the staged requantize's fence leaked into the restored UNFOLDED index")
    assert(centroids(work) === preCent,
      "rollback did not restore the first-batch quantizer byte-exactly")

    // the re-run rebuilds the SAME quantizer over the same consumed
    // state (the re-cluster is deterministic: seeded by the k smallest
    // live ids, exact decimal means, deterministic argmax tie-breaks)
    Similarity.requantizeCdcAnnIndex(spark, live.toString)
    assert(centroids(work) === reqCent,
      "re-running the requantize over the same corpus rebuilt a different quantizer")
    assert(Layout.foldedThrough(fs, liveP) === reqFence)

    // crash state B: after the old state was consumed — only the staged
    // requantize left; recovery must publish it, quantizer and fence intact
    java.nio.file.Files.move(live, work.resolve("annindex.optimize-998"))
    val reportB = Layout.recoverPublish(fs, liveP)
    info(s"recoverPublish B: $reportB")
    assert(reportB.startsWith("published"), s"expected the staged state in, got: $reportB")
    assert(centroids(work) === reqCent,
      "publish-forward lost the rebuilt quantizer")
    assert(Layout.foldedThrough(fs, liveP) === reqFence,
      "publish-forward lost the replay fence")

    // resume from the SAME checkpoint: the replayed batch is at or
    // below the fence (skipped — its rows live in the rebuilt base);
    // the remaining batches append under the NEW quantizer
    val q2 = startAnn(work, Trigger.AvailableNow())
    q2.awaitTermination()
    assert(centroids(work) === reqCent,
      "resumed ingest replaced the rebuilt quantizer — appends must never touch it")
    assert(segDirs(work.resolve("annindex").resolve("doclog")) > 1,
      "the resumed stream appended nothing — the fence swallowed live batches")
    assert(annProbe(work) === wantProbe,
      "requantize + crash recovery + resume diverged from the uninterrupted run")
    rmTree(ref); rmTree(work)
  }

  // ---- the band-log twin: near-dup state through crash recovery --------

  private def startBand(work: java.nio.file.Path, trigger: Trigger): StreamingQuery = {
    import graft.operators.CdcBinlog
    val log = work.resolve("bandlog").toString
    changeStream.writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val imgs = CdcBinlog.cdcm15BandImages(
          CdcBinlog.cdcm4BatchImages(batch, batchId)).persist()
        try {
          if (!imgs.isEmpty)
            CdcBinlog.appendCdcFpSegment(imgs, log, f"b$batchId%06d")
          ()
        } finally imgs.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
  }

  private def bandReport(work: java.nio.file.Path): Seq[String] =
    graft.operators.CdcBinlog
      .cdcNearDupPairs(spark, work.resolve("bandlog").toString)
      .collect().map(_.toString).toSeq

  /** [[crashedFold]] for the band log: kill mid-stream, fold for real,
    * rewind publishDir's swap to the requested crash point.
    */
  private def crashedBandFold(keepTrash: Boolean): java.nio.file.Path = {
    import graft.operators.CdcBinlog
    var work: java.nio.file.Path = null
    var landed = false
    var attempt = 0
    while (!landed && attempt < 5) {
      attempt += 1
      work = java.nio.file.Files.createTempDirectory("graft-bandfoldcrash")
      val firstCommit = new java.util.concurrent.CountDownLatch(1)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) firstCommit.countDown()
      }
      spark.streams.addListener(listener)
      try {
        val q1 = startBand(work, Trigger.ProcessingTime(0))
        assert(firstCommit.await(120, java.util.concurrent.TimeUnit.SECONDS))
        q1.stop(); q1.awaitTermination()
      } finally spark.streams.removeListener(listener)
      val segs = segDirs(work.resolve("bandlog"))
      landed = segs >= 1 && segs < 8
      if (!landed) rmTree(work)
    }
    assert(landed, "kill never landed mid-stream in 5 attempts")

    val live = work.resolve("bandlog")
    val old = work.resolve("old-snapshot")
    copyTree(live, old)
    CdcBinlog.compactCdcBandLog(spark, live.toString)
    java.nio.file.Files.move(live, work.resolve("bandlog.compact-999"))
    if (keepTrash) java.nio.file.Files.move(old, work.resolve("bandlog.trash-999"))
    else rmTree(old)
    work
  }

  test("band-log fold crash between renames: rollback drops the fence, resume + re-fold match the gate") {
    import graft.operators.{CdcBinlog, Layout}
    graft.functions.GraftFunctions.register(spark)
    // the gate's own answer is admission-invariant (the report depends
    // only on final latest images), so it is the ground truth for a
    // differently-capped crash run too
    val want = CdcBinlog.cdcm15NearDupFreshness(spark, dir)
      .collect().map(_.toString).toSeq
    assert(want.nonEmpty)

    val work = crashedBandFold(keepTrash = true)
    val live = new org.apache.hadoop.fs.Path(work.resolve("bandlog").toString)
    val report = Layout.recoverPublish(fs, live)
    info(s"recoverPublish: $report")
    assert(report.startsWith("restored"), s"expected the OLD state back, got: $report")
    assert(Layout.foldedThrough(fs, live).isEmpty,
      "the staged fold's replay fence leaked into the restored UNFOLDED " +
        "band log — a resume would silently drop legitimate replays")
    assert(segDirs(work.resolve("bandlog")) >= 1)

    val q2 = startBand(work, Trigger.AvailableNow())
    q2.awaitTermination()
    CdcBinlog.compactCdcBandLog(spark, work.resolve("bandlog").toString)
    assert(bandReport(work) === want,
      "band-log rollback + resume + re-fold diverged from the gate")
    rmTree(work)
  }

  test("band-log fold crash after the old state was consumed: the fold publishes, resume respects the fence") {
    import graft.operators.{CdcBinlog, Layout}
    graft.functions.GraftFunctions.register(spark)
    val want = CdcBinlog.cdcm15NearDupFreshness(spark, dir)
      .collect().map(_.toString).toSeq
    assert(want.nonEmpty)

    val work = crashedBandFold(keepTrash = false)
    val live = new org.apache.hadoop.fs.Path(work.resolve("bandlog").toString)
    val report = Layout.recoverPublish(fs, live)
    info(s"recoverPublish: $report")
    assert(report.startsWith("published"), s"expected the FOLDED state in, got: $report")
    assert(Layout.foldedThrough(fs, live).isDefined,
      "the published band-log fold lost its replay fence — a replayed " +
        "batch would double band rows against seg=base")

    val q2 = startBand(work, Trigger.AvailableNow())
    q2.awaitTermination()
    assert(bandReport(work) === want,
      "band-log publish-forward + resume diverged from the gate — a " +
        "replayed folded batch doubled rows against seg=base")
    rmTree(work)
  }
}
