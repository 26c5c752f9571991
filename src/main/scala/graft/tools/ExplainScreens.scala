package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: print the batched ingest-screening probes' formatted
  * plans over a small planted fp/band log — the committable evidence for
  * plan-shape claims about [[graft.operators.CdcBinlog.cdcFpProbeBatch]]
  * / [[graft.operators.CdcBinlog.cdcNearDupProbeBatch]] (their gate,
  * cdcm21, detaches results through localCheckpoint, so the gate's own
  * explain shows only scans of checkpointed RDDs). Usage:
  *   sbt "runMain graft.tools.ExplainScreens"
  */
object ExplainScreens {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftConf.local("graft-explain-screens", 8)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-explain-screens")
    val fpLog = dir.resolve("fplog").toString
    val bandLog = dir.resolve("bandlog").toString
    try {
      // plant two tiny committed segments through the real appenders so
      // the probes read the exact layout the gates maintain
      val imgs = (0L until 40L).map { i =>
        (i, 0L, false, s"word_${i % 7}",
          s"alpha beta gamma delta_${i % 5} epsilon zeta eta theta")
      }.toDF("doc_id", "ver", "deleted", "word", "text")
      val fp = imgs.withColumn("fp",
          md5(graft.operators.TextAnalysis.normalize($"word")))
        .select($"doc_id", $"ver", $"deleted", $"fp").coalesce(1)
      graft.operators.CdcBinlog.appendCdcFpSegment(fp, fpLog, "b000000")
      val band = graft.operators.CdcBinlog.cdcm15BandImages(imgs).coalesce(1)
      graft.operators.CdcBinlog.appendCdcFpSegment(band, bandLog, "b000000")
      val probes = imgs.filter($"doc_id" % 7 === 0).select($"doc_id")

      println("===== cdcFpProbeBatch (batched exact-dup screen) =====")
      graft.operators.CdcBinlog.cdcFpProbeBatch(spark, fpLog, probes)
        .explain("formatted")
      println("===== cdcNearDupProbeBatch (batched near-dup screen) =====")
      graft.operators.CdcBinlog.cdcNearDupProbeBatch(spark, bandLog, probes)
        .explain("formatted")
    } finally {
      spark.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
