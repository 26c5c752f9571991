package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[Dedup.connectedComponents]]: hash-to-min label propagation over a
  * pair graph. Pinned: a CHAIN (needs multiple propagation rounds — a
  * one-round implementation returns wrong labels), a triangle with a
  * redundant edge, an isolated pair, and the loud non-convergence guard.
  */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("chain, triangle, and isolated pair resolve to min-id components") {
    import spark.implicits._
    // chain 10-11-12-13-14 (diameter 4), triangle 20-21-22 (+redundant
    // edge), pair 30-31
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(cc(_) == 10L), cc.toString)
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L), cc.toString)
    assert(Seq(30L, 31L).forall(cc(_) == 30L), cc.toString)
    assert(cc.size == 10)
  }

  test("reliableCheckpointDir: rounds checkpoint to files, same components") {
    import spark.implicits._
    val ckptDir = java.nio.file.Files.createTempDirectory("cc-ckpt")
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (30L, 31L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs,
        reliableCheckpointDir = Some(ckptDir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(cc(_) == 10L), cc.toString)
    assert(Seq(30L, 31L).forall(cc(_) == 30L), cc.toString)
    // the rounds really went through the reliable dir (files on disk, not
    // executor blocks) — this is the cluster fault-tolerance contract
    val wrote = java.nio.file.Files.walk(ckptDir)
    try assert(wrote.filter(p => java.nio.file.Files.isRegularFile(p)).count() > 0)
    finally wrote.close()
  }

  test("non-convergence fails loudly instead of spinning") {
    import spark.implicits._
    // a 6-node chain has diameter 5: maxIter = 2 cannot converge
    val chain = (0 until 5).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](
      Dedup.connectedComponents(chain, maxIter = 2).collect())
    assert(e.getMessage.contains("did not converge"))
  }
}
