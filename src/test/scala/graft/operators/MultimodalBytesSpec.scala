package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Byte-vs-character semantics of the multimodal byte accounting.
  *
  * The media payload is the text's UTF-8 BYTES, so every published size
  * (mm01 `n_bytes`, mm06 `total_payload_bytes`) must count bytes. The gate
  * corpus is pure ASCII, where bytes == characters — a char-counting
  * regression (on either the Spark side or an oracle using DuckDB's
  * character `LENGTH`) would stay green there. This fixture makes the two
  * quantities differ (accented Latin, CJK, an astral-plane emoji) and pins
  * the byte answer end to end through the real query entry points.
  */
class MultimodalBytesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // >= 30 space-separated tokens each (mm06's caption quality gate), with
  // multi-byte characters sprinkled through
  private val texts = Seq(
    ("héllo wörld " * 15).trim,                    // 2-byte accented latin
    (("数据 引擎 " * 16).trim),                      // 3-byte CJK
    (("raw 🚀 pair " * 11).trim))                   // 4-byte astral emoji

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mm-bytes-sf").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, "xx", t) }
      .toDF("doc_id", "lang", "text")
      .write.parquet(s"$d/documents.parquet")
    texts.indices.map(i => (i.toLong, 1, Array.fill(4)(0.5f)))
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("fixture really separates bytes from characters") {
    texts.foreach { t =>
      assert(t.getBytes("UTF-8").length > t.length,
        s"fixture text must be non-ASCII: '$t'")
    }
  }

  test("mm01: n_bytes counts UTF-8 bytes, not characters") {
    val byId = Multimodal.mm01MediaMeta(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(byId(i.toLong) == t.getBytes("UTF-8").length.toLong,
        s"doc $i: expected byte length of '$t'")
    }
  }

  test("mm06: total_payload_bytes counts UTF-8 bytes, not characters") {
    val total = Multimodal.mm06PairManifest(spark, dir).collect()
      .map(_.getAs[Long]("total_payload_bytes")).sum
    val expected = texts.map(_.getBytes("UTF-8").length.toLong).sum
    val charTotal = texts.map(_.length.toLong).sum
    assert(total == expected, s"expected $expected bytes, got $total")
    assert(expected != charTotal, "fixture lost its non-ASCII teeth")
  }
}
