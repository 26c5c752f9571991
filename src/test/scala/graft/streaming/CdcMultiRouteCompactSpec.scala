package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The routing × maintenance matrix cell: BOTH of cdcm10's routed
  * indexes fold mid-stream, inside the same serialized foreachBatch
  * pass that keeps appending to them — each route keeps its own fold
  * schedule (d1 after its 2nd append, d2 after its 3rd, deliberately
  * staggered), and the final union probe must equal the
  * never-compacted gate. What this adds over cdcm7 (one index, one
  * fold) and IndexCompactionSpec (static folds): the folds interleave
  * with appends to the OTHER index in the same driver pass, so any
  * cross-route state bleed in the compactor (a shared staging name, a
  * fence read from the wrong root) shows up as a probe mismatch.
  */
class CdcMultiRouteCompactSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("both routed indexes fold mid-stream on staggered schedules; probe matches the gate") {
    import graft.operators.{CdcBinlog, TextAnalysis}
    graft.functions.GraftFunctions.register(spark)
    val want = CdcBinlog.cdcm10MultiIndexRouting(spark, dir)
      .collect().map(_.toString).toSeq

    val fix = java.nio.file.Paths.get(CdcBinlog.fixtureDir(dir), "multi").toString
    val cap = {
      val totalBytes = new java.io.File(fix).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("binlog.0"))
        .map(_.length).sum
      math.max(totalBytes / 6, 1L)
    }
    val tables = Seq("d1", "d2")
    val foldAfter = Map("d1" -> 2, "d2" -> 3)
    val appends = scala.collection.mutable.Map("d1" -> 0, "d2" -> 0)
    val folded = scala.collection.mutable.Map("d1" -> 0, "d2" -> 0)
    val work = java.nio.file.Files.createTempDirectory("graft-mrc")
    def idxOf(tbl: String) = work.resolve(s"idx_$tbl").toString

    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", CdcBinlog.payloadDdl)
      .option("maxBytesPerTrigger", cap.toString)
      .load(fix)
      .writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try tables.foreach { tbl =>
          val imgs = CdcBinlog.cdcm4BatchImages(
            b.filter(b("table") === tbl), batchId).persist()
          try {
            if (!imgs.isEmpty &&
                TextAnalysis.appendCdcTextSegment(imgs, idxOf(tbl),
                  f"b$batchId%06d", nBuckets = 8)) {
              appends(tbl) += 1
              if (appends(tbl) == foldAfter(tbl)) {
                TextAnalysis.compactCdcTextIndex(spark, idxOf(tbl), nBuckets = 8)
                folded(tbl) += 1
              }
            }
          } finally imgs.unpersist()
        } finally b.unpersist()
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    tables.foreach { tbl =>
      assert(folded(tbl) === 1, s"$tbl never reached its fold point " +
        s"(${appends(tbl)} appends) — thin batching, raise the cap divisor")
      val segs = new java.io.File(s"${idxOf(tbl)}/doclog").listFiles()
        .map(_.getName).filter(_.startsWith("seg=")).toSet
      assert(segs.contains("seg=base") &&
        segs.size == appends(tbl) - foldAfter(tbl) + 1,
        s"$tbl: expected seg=base + ${appends(tbl) - foldAfter(tbl)} " +
          s"post-fold segments, got $segs")
    }
    val got = tables.map { tbl =>
      import org.apache.spark.sql.functions.{col, lit}
      TextAnalysis.bm25TopKViaCdcIndex(spark, idxOf(tbl),
          CdcBinlog.cdcm4Terms, 50, nBuckets = 8)
        .select(lit(tbl).as("tbl"), col("doc_id"), col("bm25"), col("r_sparse"))
    }.reduce(_.unionAll(_)).orderBy("tbl", "r_sparse")
      .collect().map(_.toString).toSeq
    assert(got === want,
      "staggered per-route folds diverged from the never-compacted gate — " +
        "cross-route state bled through the compactor")
    rmTree(work)
  }
}
