package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Small-file compaction: bin-packs a fragmented parquet directory to the
  * target file count, preserves content exactly, leaves no staging
  * residue, and is a near-no-op when the table is already packed.
  */
class CompactFilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def dataFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("fragmented table packs to the computed count with content intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    spark.range(10000).select($"id", ($"id" % 97).as("v"))
      .repartition(32).write.parquet(dir) // 32 tiny files
    assert(dataFiles(dir).length === 32)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted

    val total = dataFiles(dir).map(_.length).sum
    val n = Layout.compactFiles(spark, dir, targetBytes = total / 4 + 1)
    assert(n === 4)
    assert(dataFiles(dir).length === 4)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.sameElements(before))
    // staged+swap left no residue beside the table
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("compact-")),
      s"staging residue: ${parent.mkString(", ")}")
  }

  test("an already-packed table stays at one file and keeps its content") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact1").resolve("t").toString
    spark.range(100).toDF("id").repartition(1).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted
    val n = Layout.compactFiles(spark, dir, targetBytes = Long.MaxValue / 2)
    assert(n === 1)
    assert(dataFiles(dir).length === 1)
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted
      .sameElements(before))
  }
}
