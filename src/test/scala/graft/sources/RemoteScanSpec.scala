package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.{BinlogReader, BinlogWriter}
import BinlogWriter._

/** The remote-storage read path (SURVEY §2.1 S2): a binlog path carrying
  * a URI scheme resolves and reads through Hadoop FileSystem buffered
  * reads instead of local NIO mmap. `file://` exercises the code path via
  * Hadoop's LocalFileSystem (no remote store exists in this environment);
  * the branch is scheme-generic, so an `s3a://`/`hdfs://` URI takes the
  * identical route with that store's FileSystem implementation.
  */
class RemoteScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int)

  private def fixture(): java.nio.file.Path = {
    val dir = Files.createTempDirectory("remote-scan")
    val w1 = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
    for (i <- 0 until 5)
      w1.writeQuery("d", "BEGIN", ts = 1000)
        .writeTableMap(5, "d", "t", cols, ts = 1000)
        .writeInsert(5, cols, Seq(Seq[Any](i)), ts = 1000)
        .writeXid(100L + i, ts = 1000)
    w1.writeRotate("binlog.000002", ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val w2 = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
    for (i <- 5 until 9)
      w2.writeQuery("d", "BEGIN", ts = 1000)
        .writeTableMap(5, "d", "t", cols, ts = 1000)
        .writeInsert(5, cols, Seq(Seq[Any](i)), ts = 1000)
        .writeXid(100L + i, ts = 1000)
    w2.save(dir.resolve("binlog.000002").toString)
    dir
  }

  private def readIds(path: String): Seq[Int] = {
    import org.apache.spark.sql.functions.col
    spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT")
      .load(path)
      .orderBy(col("log_file"), col("log_pos")).select("id")
      .collect().map(_.getInt(0)).toSeq
  }

  test("file:// directory scan equals the local-path twin") {
    val dir = fixture()
    val local = readIds(dir.toString)
    val remote = readIds(s"file://$dir")
    assert(local === (0 until 9))
    assert(remote === local)
  }

  test("mapFile through a scheme'd path yields byte-identical events, incl. offset reads") {
    val dir = fixture()
    val f = dir.resolve("binlog.000001").toString
    val viaMmap = BinlogReader.eventIterator(BinlogReader.mapFile(f), 4L)
      .map(e => (e.header.eventType, e.header.offset, e.header.eventLen)).toVector
    val viaHadoop = BinlogReader.eventIterator(BinlogReader.mapFile(s"file://$f"), 4L)
      .map(e => (e.header.eventType, e.header.offset, e.header.eventLen)).toVector
    assert(viaHadoop === viaMmap)
    // suffix read from a mid-file offset: both paths map FROM the offset
    val mid = viaMmap(3)._2
    val a = BinlogReader.mapFile(f, mid)
    val b = BinlogReader.mapFile(s"file://$f", mid)
    assert(a.remaining() === b.remaining())
    val aa = new Array[Byte](a.remaining()); a.duplicate().get(aa)
    val bb = new Array[Byte](b.remaining()); b.duplicate().get(bb)
    assert(java.util.Arrays.equals(aa, bb))
  }

  test("encrypted magic behind file:// fails by name, never 'not a binlog'") {
    val dir = Files.createTempDirectory("remote-enc")
    val enc = dir.resolve("binlog.000001")
    Files.write(enc, BinlogReader.EncryptedMagic ++ Array.fill[Byte](64)(9))
    val e1 = intercept[IllegalStateException](
      BinlogReader.mapFile(s"file://$enc"))
    assert(e1.getMessage.contains("encrypted"))
    val e2 = intercept[IllegalStateException](
      BinlogSchemas.resolveFiles(s"file://$dir"))
    assert(e2.getMessage.contains("encrypted"))
  }

  test("streaming micro-batch discovers and reads through a file:// directory") {
    val dir = fixture()
    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", "id INT")
      .load(s"file://$dir")
      .writeStream.format("memory").queryName("remote_stream_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("remote_stream_mem").select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(got === (0 until 9))
    } finally q.stop()
  }

  test("index file behind file:// resolves entries against the index's filesystem") {
    val dir = fixture()
    val idx = dir.resolve("binlog.index")
    Files.write(idx, "binlog.000001\nbinlog.000002\n".getBytes("UTF-8"))
    val files = BinlogSchemas.resolveFiles(s"file://$idx")
    assert(files.size === 2)
    assert(files.forall(BinlogReader.hasUriScheme), files.toString)
    assert(readIds(s"file://$idx") === (0 until 9))
  }
}
