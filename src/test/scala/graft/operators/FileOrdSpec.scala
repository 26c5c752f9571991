package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The latest-image windows' file-ordering key ([[CdcBinlog.fileOrd]]):
  * numeric-extension order must survive MySQL's 999999 -> 1000000
  * extension rollover, where lexicographic DESC ranks the OLD file first
  * — the same rule as `CdcMaterializer.fileSeq` / `BinlogReader
  * .fileOrdinal`, pinned here at the query layer the gate fixtures
  * (binlog.000001-4) cannot reach.
  */
class FileOrdSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("rollover files order numerically; non-numeric extensions order first") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("binlog.999999", "binlog.1000000", "binlog.000001", "no-ext")
      .toDF("log_file")
    val ordered = df
      .orderBy(CdcBinlog.fileOrd($"log_file").desc, $"log_file".desc)
      .collect().map(_.getString(0)).toSeq
    assert(ordered == Seq("binlog.1000000", "binlog.999999", "binlog.000001", "no-ext"),
      ordered.toString)
  }

  test("latest-image window picks the post-rollover image") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // key 1: inserted in binlog.999999 (high pos), updated in
    // binlog.1000000 (low pos) — lexicographic file DESC would resurrect
    // the stale pre-rollover image
    val changes = Seq(
      (1L, "binlog.999999", 9000L, 0, "stale"),
      (1L, "binlog.1000000", 500L, 0, "fresh")
    ).toDF("id", "log_file", "log_pos", "log_seq", "word")
    val w = Window.partitionBy($"id")
      .orderBy(CdcBinlog.fileOrd($"log_file").desc, $"log_file".desc,
        $"log_pos".desc, $"log_seq".desc)
    val latest = changes.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"word").collect().head.getString(0)
    assert(latest == "fresh")
  }
}
