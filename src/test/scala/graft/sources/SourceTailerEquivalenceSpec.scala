package graft.sources

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.{BinlogTailer, BinlogWriter}
import BinlogWriter._

/** The DSv2 source and [[BinlogTailer]] implement the change-stream
  * semantics (delta expansion + seq numbering, committed-only xid
  * stitching, rotation) independently — this spec pins them to each other:
  * the same log must produce the SAME ordered change sequence through
  * both, so a semantic fix applied to one cannot silently drift from the
  * other.
  */
class SourceTailerEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(20))

  test("batch source and live tailer emit identical change sequences") {
    val dir = Files.createTempDirectory("equiv")
    // two rotated files, inserts/updates/deletes, a second table to filter,
    // CRC32 checksums on — every semantic axis at once
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(
        Seq(1, new JBigDecimal("1.5000"), "a"),
        Seq(2, new JBigDecimal("2.5000"), "b")), ts = 1000)
      .writeXid(11, ts = 1000)
      .writeTableMap(24, "bar", "other", cols, ts = 1001)
      .writeInsert(24, cols, Seq(Seq(9, new JBigDecimal("9.0000"), "noise")), ts = 1001)
      .writeXid(12, ts = 1001)
      .writeRotate("binlog.000002", ts = 1001)
      .save(dir.resolve("binlog.000001").toString)
    new Writer(checksum = true)
      .writeFormatDescription(ts = 2000)
      .writeTableMap(23, "foo", "auto", cols, ts = 2000)
      .writeUpdate(23, cols, Seq(
        (Seq(1, new JBigDecimal("1.5000"), "a"),
         Seq(1, new JBigDecimal("7.7500"), "A"))), ts = 2000)
      .writeDelete(23, cols, Seq(Seq(2, new JBigDecimal("2.5000"), "b")), ts = 2000)
      .writeXid(21, ts = 2000)
      // non-XID transaction (non-transactional engine): QUERY(COMMIT) ends
      // it — rows must flush with no xid, not inherit the next txn's
      .writeQuery("foo", "BEGIN", ts = 2001)
      .writeTableMap(23, "foo", "auto", cols, ts = 2001)
      .writeInsert(23, cols, Seq(Seq(3, new JBigDecimal("3.0000"), "c")), ts = 2001)
      .writeQuery("foo", "COMMIT", ts = 2001)
      // SAVEPOINT inside a txn is NOT a boundary: both rows share xid 22
      .writeQuery("foo", "BEGIN", ts = 2002)
      .writeTableMap(23, "foo", "auto", cols, ts = 2002)
      .writeInsert(23, cols, Seq(Seq(4, new JBigDecimal("4.0000"), "d")), ts = 2002)
      .writeQuery("foo", "SAVEPOINT s1", ts = 2002)
      .writeInsert(23, cols, Seq(Seq(5, new JBigDecimal("5.0000"), "e")), ts = 2002)
      .writeXid(22, ts = 2002)
      .save(dir.resolve("binlog.000002").toString)

    // canonical shape: (file, pos, seq, delta, id, val-string, word, xid)
    type Sig = (String, Long, Int, String, Int, String, String, Option[Long])

    val viaSource: Seq[Sig] = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .option("database", "foo").option("table", "auto")
      .load(dir.toString)
      .orderBy("log_file", "log_pos", "log_seq")
      .collect().toSeq.map { r =>
        (r.getAs[String]("log_file"), r.getAs[Long]("log_pos"), r.getAs[Int]("log_seq"),
          r.getAs[String]("_delta_type"), r.getAs[Int]("id"),
          r.getAs[JBigDecimal]("val").toPlainString, r.getAs[String]("word"),
          Option(r.getAs[java.lang.Long]("xid")).map(_.toLong))
      }

    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add,
      db = Some("foo"), table = Some("auto"), pollMs = 50)
    val viaTailer: Seq[Sig] =
      try {
        val deadline = System.nanoTime() + 15000000000L
        while (got.size < viaSource.length && System.nanoTime() < deadline) Thread.sleep(5)
        got.toArray.toSeq.map { c0 =>
          val c = c0.asInstanceOf[BinlogTailer.Change]
          (c.logFile, c.logPos, c.logSeq, c.deltaType,
            c.row(0).asInstanceOf[Int],
            c.row(1).asInstanceOf[JBigDecimal].toPlainString,
            c.row(2).asInstanceOf[String], c.xid)
        }
      } finally t.close()

    assert(viaTailer === viaSource)
    // ground-truth xid attribution, not just cross-implementation equality:
    // COMMIT-terminated txn has no xid; SAVEPOINT doesn't split xid 22
    val byId = viaSource.map(s => s._5 -> s._8).toMap
    assert(byId(3) === None)
    assert(byId(4) === Some(22L) && byId(5) === Some(22L))
  }

  test("equivalence holds on a modern-shape log (ROWS_EVENT v2 + CRC32 + GTID)") {
    val dir = Files.createTempDirectory("equiv-v2")
    new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
      .writePreviousGtids(0, ts = 1000)
      .writeGtid(1, ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(
        Seq(1, new JBigDecimal("1.5000"), "a"),
        Seq(2, new JBigDecimal("2.5000"), "b")), ts = 1000)
      .writeXid(11, ts = 1000)
      .writeGtid(2, ts = 1001)
      .writeQuery("foo", "BEGIN", ts = 1001)
      .writeTableMap(23, "foo", "auto", cols, ts = 1001)
      .writeUpdate(23, cols, Seq(
        (Seq(1, new JBigDecimal("1.5000"), "a"),
         Seq(1, new JBigDecimal("7.7500"), "A"))), ts = 1001)
      .writeDelete(23, cols, Seq(Seq(2, new JBigDecimal("2.5000"), "b")), ts = 1001)
      .writeXid(21, ts = 1001)
      .save(dir.resolve("binlog.000001").toString)

    type Sig = (String, Long, Int, String, Int, String, String, Option[Long])
    val viaSource: Seq[Sig] = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .option("database", "foo").option("table", "auto")
      .load(dir.toString)
      .orderBy("log_file", "log_pos", "log_seq")
      .collect().toSeq.map { r =>
        (r.getAs[String]("log_file"), r.getAs[Long]("log_pos"), r.getAs[Int]("log_seq"),
          r.getAs[String]("_delta_type"), r.getAs[Int]("id"),
          r.getAs[JBigDecimal]("val").toPlainString, r.getAs[String]("word"),
          Option(r.getAs[java.lang.Long]("xid")).map(_.toLong))
      }
    assert(viaSource.map(s => (s._4, s._5, s._6, s._7, s._8)) === Seq(
      ("insert", 1, "1.5000", "a", Some(11L)),
      ("insert", 2, "2.5000", "b", Some(11L)),
      ("update-before", 1, "1.5000", "a", Some(21L)),
      ("update", 1, "7.7500", "A", Some(21L)),
      ("delete", 2, "2.5000", "b", Some(21L))))

    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add,
      db = Some("foo"), table = Some("auto"), pollMs = 50)
    val viaTailer: Seq[Sig] =
      try {
        val deadline = System.nanoTime() + 15000000000L
        while (got.size < viaSource.length && System.nanoTime() < deadline) Thread.sleep(5)
        got.toArray.toSeq.map { c0 =>
          val c = c0.asInstanceOf[BinlogTailer.Change]
          (c.logFile, c.logPos, c.logSeq, c.deltaType,
            c.row(0).asInstanceOf[Int],
            c.row(1).asInstanceOf[JBigDecimal].toPlainString,
            c.row(2).asInstanceOf[String], c.xid)
        }
      } finally t.close()
    assert(viaTailer === viaSource)
  }
}
