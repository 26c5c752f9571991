package graft.binlog

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** XA_PREPARE (event 38, MySQL >= 5.7.7): a prepared XA branch's rows are
  * fully logged AT the prepare; the XA COMMIT arrives later as its own
  * transaction (possibly in another file). The prepare must therefore
  * flush the buffered rows (xid null — not yet committed-by-xid) in both
  * the DSv2 source and the tailer; without the flush the branch's rows
  * would be stamped with the NEXT transaction's xid (mis-attribution).
  */
class XaPrepareSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.varchar(10))

  private def log(): String = {
    val dir = Files.createTempDirectory("xa")
    new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1)
      // XA branch: rows land at prepare, commit comes later
      .writeQuery("d", "XA START X'787831',X'',1", ts = 2)
      .writeTableMap(9, "d", "t", cols, ts = 2)
      .writeInsert(9, cols, Seq(Seq(1, "xa-row")), ts = 2)
      .writeQuery("d", "XA END X'787831',X'',1", ts = 2)
      .writeXaPrepare("xx1", ts = 2)
      // a normal transaction follows — its xid must NOT leak backward
      .writeQuery("d", "BEGIN", ts = 3)
      .writeTableMap(9, "d", "t", cols, ts = 3)
      .writeInsert(9, cols, Seq(Seq(2, "plain")), ts = 3)
      .writeXid(55, ts = 3)
      // the XA branch commits here (no rows of its own)
      .writeQuery("d", "XA COMMIT X'787831',X'',1", ts = 4)
      .save(dir.resolve("binlog.000001").toString)
    dir.toString
  }

  test("DSv2: prepared-branch rows flush at XA_PREPARE with null xid") {
    val rows = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, word STRING")
      .load(log())
      .selectExpr("id", "word", "xid").collect()
      .map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1, "xa-row", -1L), (2, "plain", 55L)), rows.toString)
  }

  test("events mode names the event") {
    val names = spark.read.format("mysql-binlog").option("mode", "events")
      .load(log()).selectExpr("event_type").collect().map(_.getString(0)).toSet
    assert(names.contains("XA_PREPARE_LOG_EVENT"))
  }

  test("startAfterGtid skips a GTID-framed XA transaction whole") {
    // previously any non-BEGIN QUERY counted as an implicit commit, so
    // "XA START" resolved the resume point INSIDE the target transaction
    // and its rows were re-delivered
    val dir = Files.createTempDirectory("xa-gtid")
    new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1)
      .writePreviousGtids(0, ts = 1)
      .writeGtid(1, ts = 2)
      .writeQuery("d", "XA START X'787831',X'',1", ts = 2)
      .writeTableMap(9, "d", "t", cols, ts = 2)
      .writeInsert(9, cols, Seq(Seq(1, "xa-row")), ts = 2)
      .writeQuery("d", "XA END X'787831',X'',1", ts = 2)
      .writeXaPrepare("xx1", ts = 2)
      .writeGtid(2, ts = 3)
      .writeQuery("d", "BEGIN", ts = 3)
      .writeTableMap(9, "d", "t", cols, ts = 3)
      .writeInsert(9, cols, Seq(Seq(2, "plain")), ts = 3)
      .writeXid(55, ts = 3)
      .save(dir.resolve("binlog.000001").toString)
    val hex = BinlogReader.toHex(BinlogWriter.FixtureUuid)
    val uuid = s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
    val ids = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, word STRING")
      .option("startAfterGtid", s"$uuid:1")
      .load(dir.toString)
      .selectExpr("id").collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(2), s"XA txn rows re-delivered: $ids")
  }

  test("tailer: same flush rule") {
    val d = log()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Any, Long)]()
    val t = BinlogTailer.start(d, ch => got.add((ch.row(0), ch.xid.getOrElse(-1L))))
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (got.size < 2 && t.failure.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(5)
      assert(t.failure.isEmpty, s"tailer died: ${t.failure}")
      val seq = got.toArray(new Array[(Any, Long)](0)).toSeq
      assert(seq == Seq((1, -1L), (2, 55L)), seq.toString)
    } finally t.close()
  }
}
