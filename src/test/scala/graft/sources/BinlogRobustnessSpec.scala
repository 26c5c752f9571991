package graft.sources

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.BinlogWriter._

/** Real-world binlog hardening through the DSv2 source: CRC32-checksummed
  * logs (every MySQL >= 5.6.6), DDL schema-change detection, schema-driven
  * unsigned decode, oversized-transaction emission order, and
  * budget-bounded partitions that stop at endPos instead of scanning to
  * EOF.
  */
class BinlogRobustnessSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(50))
  private val ddl = "id INT, val DECIMAL(12,4), word STRING"

  private def rootCauseChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq

  test("checksummed binlog: batch decode strips + verifies CRC32 trailers") {
    val dir = Files.createTempDirectory("crc-src")
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1000)
      .writeQuery("bench", "BEGIN", ts = 1000)
      .writeTableMap(42, "bench", "big", cols, ts = 1000)
      .writeInsert(42, cols, Seq(Seq(1, new JBigDecimal("12345678.9999"), "alpha")), ts = 1000)
      .writeUpdate(42, cols, Seq(
        (Seq(1, new JBigDecimal("12345678.9999"), "alpha"),
         Seq(1, new JBigDecimal("1.5000"), "omega"))), ts = 1000)
      .writeXid(9, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val rows = spark.read.format("mysql-binlog").option("payloadDdl", ddl)
      .load(dir.toString).orderBy("log_pos", "log_seq").collect()
    assert(rows.map(_.getAs[String]("_delta_type")).toSeq ===
      Seq("insert", "update-before", "update"))
    assert(rows.head.getAs[JBigDecimal]("val").compareTo(new JBigDecimal("12345678.9999")) === 0)
    assert(rows.last.getAs[String]("word") === "omega") // varchar tail, trailer-free
    assert(rows.forall(_.getAs[Long]("xid") === 9L))
  }

  test("checksummed binlog: streaming offset walk sees BEGIN through the trailer") {
    val dir = Files.createTempDirectory("crc-stream")
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1000)
      .writeQuery("bench", "BEGIN", ts = 1000)
      .writeTableMap(42, "bench", "big", cols, ts = 1000)
      .writeInsert(42, cols, Seq(Seq(1, new JBigDecimal("2.0000"), "a"),
        Seq(2, new JBigDecimal("3.0000"), "b")), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val outDir = Files.createTempDirectory("crc-sink").toString
    val q = spark.readStream.format("mysql-binlog").option("payloadDdl", ddl)
      .load(dir.toString)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", Files.createTempDirectory("crc-ckpt").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() === 2L)
  }

  test("ALTER TABLE against a decoded table fails loudly; ignore opt-out; other tables unaffected") {
    val dir = Files.createTempDirectory("ddl")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, new JBigDecimal("1.0000"), "a")), ts = 1000)
      .writeXid(1, ts = 1000)
      .writeQuery("foo", "ALTER TABLE `auto` ADD COLUMN extra INT", ts = 1001)
      .writeQuery("foo", "BEGIN", ts = 1002)
      .writeTableMap(23, "foo", "auto", cols, ts = 1002)
      .writeInsert(23, cols, Seq(Seq(2, new JBigDecimal("2.0000"), "b")), ts = 1002)
      .writeXid(2, ts = 1002)
      .save(dir.resolve("binlog.000001").toString)

    def read(opts: Map[String, String]) = {
      var r = spark.read.format("mysql-binlog").option("payloadDdl", ddl)
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(dir.toString)
    }
    // default: the decode stops with a schema-change error, not garbage rows
    val e = intercept[Exception] {
      read(Map("database" -> "foo", "table" -> "auto")).collect()
    }
    assert(rootCauseChain(e).exists(m => m != null && m.contains("schema change")),
      rootCauseChain(e).mkString(" | "))
    // explicit opt-out decodes everything (the fixture's DDL is additive-only)
    assert(read(Map("database" -> "foo", "table" -> "auto",
      "onSchemaChange" -> "ignore")).count() === 2)
    // DDL on a table this scan doesn't decode is not a failure
    assert(read(Map("database" -> "bar", "table" -> "other")).count() === 0)
  }

  test("mid-log TABLE_MAP schema change: positional mode follows it, typed mode fails loudly") {
    val dir = Files.createTempDirectory("midlog-schema")
    val colsWide = cols :+ ColSpec.int // ADD COLUMN extra INT, already applied
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, new JBigDecimal("1.0000"), "a")), ts = 1000)
      .writeXid(1, ts = 1000)
      // schema changed OUTSIDE this log (no QUERY/ALTER event for the DDL
      // guard to catch): the next TABLE_MAP simply declares 4 columns
      .writeQuery("foo", "BEGIN", ts = 1002)
      .writeTableMap(23, "foo", "auto", colsWide, ts = 1002)
      .writeInsert(23, colsWide,
        Seq(Seq(2, new JBigDecimal("2.0000"), "b", 7)), ts = 1002)
      .writeXid(2, ts = 1002)
      .save(dir.resolve("binlog.000001").toString)

    // positional (no payloadDdl) mode: each event decodes per ITS table
    // map — the row arrays simply grow a column at the boundary
    val rows = spark.read.format("mysql-binlog")
      .load(dir.toString)
      .orderBy("log_pos")
      .select("row").collect()
      .map(_.getSeq[String](0).toList)
    assert(rows === List(List("1", "1.0000", "a"), List("2", "2.0000", "b", "7")))

    // typed payloadDdl mode: the 4-column image cannot fit the 3-column
    // DDL — a loud error naming both counts, never a truncated row
    val e = intercept[Exception] {
      spark.read.format("mysql-binlog").option("payloadDdl", ddl)
        .load(dir.toString).collect()
    }
    assert(rootCauseChain(e).exists(m => m != null &&
      m.contains("4 column(s)") && m.contains("declares 3")),
      rootCauseChain(e).mkString(" | "))
  }

  test("unsigned columns widen instead of sign-extending (mysql_binlog.clj:548 TODO)") {
    val ucols = Seq(ColSpec.tiny, ColSpec.int, ColSpec.bigint)
    val dir = Files.createTempDirectory("unsigned")
    new Writer()
      .writeFormatDescription()
      .writeTableMap(7, "d", "t", ucols)
      // bit patterns: 0xFF, 0xFFFFFFF0, 0xFFFFFFFFFFFFFFFF
      .writeInsert(7, ucols, Seq(Seq[Any](-1, -16, -1L)))
      .writeXid(1)
      .save(dir.resolve("binlog.000001").toString)

    val u = spark.read.format("mysql-binlog")
      .option("payloadDdl", "t INT, i BIGINT, b DECIMAL(20,0)")
      .option("unsignedColumns", "t, i, b")
      .load(dir.toString).head()
    assert(u.getAs[Int]("t") === 255)
    assert(u.getAs[Long]("i") === 4294967280L)
    assert(u.getAs[JBigDecimal]("b").compareTo(new JBigDecimal("18446744073709551615")) === 0)

    // without the option the same bytes stay signed (reference behavior)
    val s = spark.read.format("mysql-binlog")
      .option("payloadDdl", "t INT, i INT, b BIGINT")
      .load(dir.toString).head()
    assert(s.getAs[Int]("t") === -1)
    assert(s.getAs[Int]("i") === -16)
    assert(s.getAs[Long]("b") === -1L)
  }

  test("oversized txn: emission stays (log_pos, log_seq)-monotonic, xid degrades to null") {
    val dir = Files.createTempDirectory("txn-overflow")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, new JBigDecimal("1.0000"), "a")), ts = 1000)
      .writeXid(1, ts = 1000)
      // txn 2 exceeds maxTxnRows=3 across two events: A (2 rows) buffers,
      // B (3 rows) overflows — A must flush BEFORE B streams
      .writeTableMap(23, "foo", "auto", cols, ts = 1001)
      .writeInsert(23, cols, Seq(Seq(10, new JBigDecimal("1.0000"), "A0"),
        Seq(11, new JBigDecimal("1.0000"), "A1")), ts = 1001)
      .writeInsert(23, cols, Seq(Seq(12, new JBigDecimal("1.0000"), "B0"),
        Seq(13, new JBigDecimal("1.0000"), "B1"),
        Seq(14, new JBigDecimal("1.0000"), "B2")), ts = 1001)
      .writeXid(2, ts = 1001)
      .writeTableMap(23, "foo", "auto", cols, ts = 1002)
      .writeInsert(23, cols, Seq(Seq(3, new JBigDecimal("3.0000"), "c")), ts = 1002)
      .writeXid(3, ts = 1002)
      .save(dir.resolve("binlog.000001").toString)

    // NO order-restoring sort: assert on raw iterator emission order
    val rows = spark.read.format("mysql-binlog")
      .option("payloadDdl", ddl).option("maxTxnRows", "3")
      .load(dir.toString).collect()
    val posSeq = rows.map(r => (r.getAs[Long]("log_pos"), r.getAs[Int]("log_seq"))).toSeq
    assert(posSeq === posSeq.sorted, s"emission order not monotonic: $posSeq")
    assert(rows.map(_.getAs[String]("word")).toSeq ===
      Seq("a", "A0", "A1", "B0", "B1", "B2", "c"))
    val xids = rows.map(r => Option(r.getAs[java.lang.Long]("xid")).map(_.toLong))
    // txn 1 and 3 keep their xids; the whole oversized txn degrades to null
    assert(xids === Seq(Some(1L), None, None, None, None, None, Some(3L)))
  }

  test("partition reader stops at endPos instead of decoding the remaining file") {
    val dir = Files.createTempDirectory("endpos")
    val w = new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, new JBigDecimal("1.0000"), "a")), ts = 1000)
      .writeXid(1, ts = 1000)
    val endPos = w.position
    // beyond endPos: a rows event whose TABLE_MAP is missing — decoding it
    // (as the old to-EOF loop did) throws; a range-respecting reader never
    // touches it
    w.writeInsert(99, cols, Seq(Seq(666, new JBigDecimal("6.0000"), "x")), ts = 1001)
    val f1 = dir.resolve("binlog.000001").toString
    w.save(f1)

    val opts = Map("payloadddl" -> ddl)
    val schema = BinlogSchemas.forOptions(opts)
    val factory = new BinlogReaderFactory(schema, opts, None, None, None)
    def readRange(endPosArg: Long): Vector[Long] = {
      val r = factory.createReader(BinlogInputPartition(f1, 4L, endPosArg))
      Iterator.continually(if (r.next()) Some(r.get().getLong(6)) else None)
        .takeWhile(_.isDefined).flatten.toVector
    }
    assert(readRange(endPos).length === 1) // clean stop at the batch boundary
    val e = intercept[IllegalStateException] { readRange(Long.MaxValue) }
    assert(e.getMessage.contains("No TABLE_MAP"))
  }

  test("MySQL encrypted binlog (FD magic) fails by name, not as not-a-binlog") {
    val dir = Files.createTempDirectory("enc-magic")
    val f = dir.resolve("binlog.000001")
    // binlog_encryption=ON rewrites the magic to FD 62 69 6E; the rest of
    // the file is ciphertext a decoder must never touch
    Files.write(f, graft.binlog.BinlogReader.EncryptedMagic ++ Array.fill[Byte](64)(0x5a))
    val ex = intercept[Exception] {
      spark.read.format("mysql-binlog").option("payloadDdl", ddl)
        .load(dir.toString).count()
    }
    assert(rootCauseChain(ex).exists(_.contains("encrypted")))
    // direct single-file path too (would otherwise fall through to the
    // index-file parse)
    val ex2 = intercept[Exception] {
      spark.read.format("mysql-binlog").option("payloadDdl", ddl)
        .load(f.toString).count()
    }
    assert(rootCauseChain(ex2).exists(_.contains("encrypted")))
  }

  test("tailer: an encrypted binlog appearing in the directory kills the tail by name") {
    val dir = Files.createTempDirectory("enc-tailer")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(23, "bench", "t", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, new JBigDecimal("1.0000"), "a")), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val seen = new java.util.concurrent.atomic.AtomicInteger
    val t = graft.binlog.BinlogTailer.start(dir.toString, _ => seen.incrementAndGet(),
      pollMs = 20)
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (seen.get() == 0 && System.nanoTime() < deadline) Thread.sleep(5)
      assert(seen.get() == 1 && t.isAlive)
      // the server turns binlog_encryption on and rotates: the new file
      // carries the FD magic — silently skipping it would leave the tailer
      // "alive" while missing every change in it
      Files.write(dir.resolve("binlog.000002"),
        graft.binlog.BinlogReader.EncryptedMagic ++ Array.fill[Byte](32)(0x5a))
      while (t.isAlive && System.nanoTime() < deadline) Thread.sleep(10)
      assert(!t.isAlive, "tailer must die on an encrypted file, not ignore it")
      assert(t.failure.exists(_.getMessage.contains("encrypted")), t.failure.toString)
    } finally t.close()
  }

  test("MariaDB START_ENCRYPTION event fails the scan by name") {
    val dir = Files.createTempDirectory("enc-start")
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000, serverVersion = "10.6.14-MariaDB-log")
      .writeStartEncryption(ts = 1000)
    // everything after this point would be ciphertext on a real server
    w.writeQuery("bench", "BEGIN", ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val ex = intercept[Exception] {
      spark.read.format("mysql-binlog").option("payloadDdl", ddl)
        .load(dir.toString).count()
    }
    assert(rootCauseChain(ex).exists(m =>
      m.contains("encrypted") && m.contains("START_ENCRYPTION")))
  }
}
