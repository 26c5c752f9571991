package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The probe-vs-publish race under REAL concurrency: a maintenance
  * thread repeatedly folds a CDC text index (each fold churns the
  * directory through publishDir's two-rename swap — content constant,
  * physical layout replaced) while the main thread probes continuously
  * through [[Layout.retryOnceOnMissing]]. Every completed probe must
  * equal the reference result: the swap's complete-directory invariant
  * plus one rebuild-and-retry makes a silent version mix impossible —
  * RetryOnceOnMissingSpec pins the guard's mechanics on simulated
  * windows; this drives it against live swaps.
  */
class CdcProbeCompactRaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def textImages(rows: (Int, String, Int, Boolean)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "ver", "deleted")
      .select($"doc_id".cast("long").as("doc_id"), $"text",
        $"ver".cast("long").as("ver"), $"deleted")
  }

  test("continuous probes stay correct while a maintenance thread folds the index") {
    graft.functions.GraftFunctions.register(spark)
    val work = java.nio.file.Files.createTempDirectory("graft-race")
    val idx = work.resolve("index").toString
    (0 until 4).foreach { b =>
      assert(TextAnalysis.appendCdcTextSegment(
        textImages((1 + 2 * b, s"alpha doc$b", b, false),
          (2 + 2 * b, s"alpha beta doc$b", b, false)),
        idx, f"b$b%06d", nBuckets = 4))
    }
    def probe(): Seq[String] = Layout.retryOnceOnMissing {
      TextAnalysis.bm25TopKViaCdcIndex(spark, idx, Seq("alpha", "beta"), 10,
          nBuckets = 4)
        .orderBy("r_sparse").collect()
    }.map(_.toString).toSeq
    val want = probe()
    assert(want.size === 8)

    val folds = 5
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintenance = new Thread(() => {
      try {
        (1 to folds).foreach { _ =>
          Thread.sleep(1000)
          TextAnalysis.compactCdcTextIndex(spark, idx, nBuckets = 4)
        }
      } catch { case t: Throwable => failure.set(t) }
      finally done.set(true)
    }, "graft-race-maintenance")
    maintenance.start()

    var probes = 0
    try {
      while (!done.get()) {
        assert(probe() === want,
          s"probe $probes observed a mixed or wrong version during a fold")
        probes += 1
      }
    } finally maintenance.join()
    assert(failure.get() === null, s"maintenance thread failed: ${failure.get()}")
    assert(probes >= 3, s"only $probes probes completed — the race never ran")
    info(s"$probes probes raced $folds folds, all correct")
    assert(probe() === want)
  }
}
