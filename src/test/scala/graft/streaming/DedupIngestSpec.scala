package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming dedup-at-the-door over the persistent corpus index: batches
  * admit only novel documents, admitted docs extend the index, and later
  * batches (including post-restart ones) dedup against everything admitted
  * so far — without ever rescanning corpus text.
  */
class DedupIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("a fresh pipeline bootstraps its own index from batch 0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dedup-ingest-boot")
    val idx = dir.resolve("index").toString      // does not exist yet
    val accepted = dir.resolve("accepted").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamOps.dedupIngest(mem.toDF().toDF("doc_id", "text"), idx, accepted,
      dir.resolve("ckpt").toString)
    try {
      mem.addData(1L -> "first ever document", 2L -> "first ever document",
        3L -> "a different one")
      q.processAllAvailable()
      assert(spark.read.parquet(accepted).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
      // batch 2 dedups against the index batch 0 created
      mem.addData(10L -> "a different one", 11L -> "genuinely new again")
      q.processAllAvailable()
      assert(spark.read.parquet(accepted).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 11L))
    } finally q.stop()
  }

  test("micro-batches dedup against the growing index; accepted docs extend it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dedup-ingest")
    val idx = dir.resolve("index").toString
    val accepted = dir.resolve("accepted").toString
    val ckpt = dir.resolve("ckpt").toString

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely unrelated corpus text about distributed query engines"),
      (3L, "a third corpus document that talks about parquet column pruning"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.buildDedupIndex(corpus, idx)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.dedupIngest(mem.toDF().toDF("doc_id", "text"), idx, accepted, ckpt)
    try {
      // batch 1: corpus dup (rejected), in-batch dup pair (one survives),
      // novel doc (accepted)
      mem.addData(
        100L -> "the quick brown fox jumps over the lazy dog near the river bank",
        110L -> "a brand new document about watermark semantics in streaming",
        111L -> "a brand new document about watermark semantics in streaming",
        120L -> "novel words describing embedding quantization tradeoffs")
      q.processAllAvailable()
      val after1 = spark.read.parquet(accepted).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(after1 === Seq(110L, 120L))

      // batch 2: dup of a batch-1-accepted doc (rejected via the APPENDED
      // index), plus one novel doc
      mem.addData(
        200L -> "a brand new document about watermark semantics in streaming",
        210L -> "yet another genuinely new text that should be admitted")
      q.processAllAvailable()
      val after2 = spark.read.parquet(accepted).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(after2 === Seq(110L, 120L, 210L))
    } finally q.stop()
  }
}
