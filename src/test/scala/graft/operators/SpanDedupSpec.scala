package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[Dedup.spanDedup]] semantics on a hand-built corpus: the first
  * occurrence of a span (smallest (doc_id, chunk)) survives, later copies
  * drop — across documents AND within one document — and a document whose
  * every span was seen earlier collapses to the empty string rather than
  * disappearing from the output.
  */
class SpanDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("first occurrence wins; later spans drop; emptied docs stay") {
    import spark.implicits._
    // w = 2: doc 0 = [a b][c d], doc 1 repeats [a b] then adds [e f] and
    // repeats its own [e f]; doc 2 is entirely spans seen before.
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b e f e f"),
      (2L, "c d a b")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, 2).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out === Array(
      (0L, "a b c d", 2L, 0L),
      (1L, "e f", 1L, 2L),
      (2L, "", 0L, 2L)))
  }

  test("a trailing short span is its own chunk, not merged or lost") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "x y c")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, 2).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // doc 0 = [a b][c]; doc 1 = [x y][c] — the 1-word tail "c" was already
    // seen as doc 0's tail chunk, so doc 1 keeps only "x y"
    assert(out === Array((0L, "a b c", 2L, 0L), (1L, "x y", 1L, 1L)))
  }
}
