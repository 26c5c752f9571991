package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The production incremental-dedup shape: the corpus's fingerprint set,
  * band buckets and shingle sets persist as a parquet index, batches probe
  * the index, accepted docs append to it — corpus text is scanned exactly
  * once, at index build. This spec pins: (1) index path == recompute path
  * on identical inputs; (2) the index path's plan contains NO corpus text
  * scan; (3) append keeps the second batch's result equal to recomputing
  * against corpus + accepted batch 1.
  */
class DedupIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dd02 xxhash64 bench twin finds the same near-dup pairs on a seeded corpus") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dd02xx")
    // filler docs share NO vocabulary (every token is doc-unique), so the
    // only true pairs are the two seeded duplicates — which any hash
    // family must band identically (identical shingle set -> identical
    // signature), making the assertion deterministic, not recall-dependent
    val rows = (0L until 30L).map(i =>
      (i, (0 until 8).map(k => s"w${i}x$k").mkString(" "))) ++ Seq(
      (100L, "the quick brown fox jumps over the lazy dog by the river"),
      (101L, "the quick brown fox jumps over the lazy dog by the river"),
      (200L, "spark partitions shuffle data between executors during wide transformations"),
      (201L, "spark partitions shuffle data between executors during wide transformations"))
    rows.toDF("doc_id", "text").write.parquet(dir.resolve("documents.parquet").toString)
    def pairs(f: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) =
      f(spark, dir.toString).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((100L, 101L), (200L, 201L))
    assert(pairs(Dedup.dd02MinhashLsh) === expected)
    assert(pairs(Dedup.dd02MinhashLshXx) === expected)
  }

  test("index path matches recompute; no corpus scan; append stays consistent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dedup-idx")
    val corpusPath = dir.resolve("corpus.parquet").toString
    val idx = dir.resolve("index").toString

    val corpusRows = (0L until 40L).map { i =>
      (i, s"corpus document number $i with some shared words " +
        (if (i % 7 == 0) "license header boilerplate text common to many docs" else s"unique tail $i"))
    }
    docs(corpusRows: _*).write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    Dedup.buildDedupIndex(corpus, idx)

    // batch 1: one exact dup of corpus doc 3, one near-dup of doc 7, two fresh
    val batch1 = docs(
      100L -> corpusRows(3)._2,                                  // exact dup
      101L -> (corpusRows(7)._2 + " extra"),                     // near-dup candidate
      102L -> "entirely new content about spark partitioning strategies",
      103L -> "another genuinely novel document with original words")

    val viaIndex = Dedup.dd06ViaIndex(spark, batch1, idx)
    val recompute = Dedup.incrementalDedup(batch1, corpus)
    assert(viaIndex.collect().toSeq === recompute.collect().toSeq)

    // the exact dup must be gone in both
    assert(!viaIndex.collect().map(_.getLong(0)).contains(100L))

    // plan assertion: the index path never touches corpus text — no scan
    // of corpus.parquet anywhere in the executed plan (the recompute path
    // has it, proving the assertion bites)
    val idxPlan = viaIndex.queryExecution.executedPlan.toString
    val recPlan = recompute.queryExecution.executedPlan.toString
    assert(!idxPlan.contains("corpus.parquet"), "index path rescanned corpus text")
    assert(recPlan.contains("corpus.parquet"))

    // accept batch 1's survivors into the index (append mode), then batch 2
    val accepted1 = batch1.join(viaIndex, "doc_id").select($"doc_id", $"text")
    Dedup.buildDedupIndex(accepted1, idx, segment = "b1")
    val batch2 = docs(
      200L -> "entirely new content about spark partitioning strategies", // dup of accepted 102
      201L -> "completely different text that survives everything")
    val viaIndex2 = Dedup.dd06ViaIndex(spark, batch2, idx)
    val recompute2 = Dedup.incrementalDedup(batch2, corpus.union(accepted1))
    assert(viaIndex2.collect().toSeq === recompute2.collect().toSeq)
    assert(viaIndex2.collect().map(_.getLong(0)).toSeq === Seq(201L))
  }
}
