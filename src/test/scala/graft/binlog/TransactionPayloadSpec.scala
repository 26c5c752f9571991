package graft.binlog

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** TRANSACTION_PAYLOAD (type 40, `binlog_transaction_compression=ON`,
  * MySQL >= 8.0.20): zstd- or un-compressed transactions decode by
  * re-entering the event loop over the inner stream. Pinned here:
  * both compression modes; inner TABLE_MAP/XID stitching; log positions
  * rebound to the envelope (the atomic-transaction resume contract);
  * equality with an uncompressed twin through the DSv2 source; tailer
  * equivalence; and safe-resume boundaries parking after the envelope.
  */
class TransactionPayloadSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(20))

  /** One txn as an inner stream: BEGIN, TABLE_MAP, events, XID. */
  private def innerTxn(xid: Long, build: Writer => Unit): Array[Byte] = {
    val tw = new Writer(rowsV2 = true, nested = true)
    tw.writeQuery("foo", "BEGIN", ts = xid)
    tw.writeTableMap(23, "foo", "auto", cols, ts = xid)
    build(tw)
    tw.writeXid(xid, ts = xid)
    tw.toBytes
  }

  /** Two-transaction compressed log (one zstd, one uncompressed) + its
    * logically-identical uncompressed twin.
    */
  private def twinLogs(): (String, String) = {
    val dir = Files.createTempDirectory("ctp")
    val ctp = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000)
      .writeGtid(1, ts = 1000)
      .writeTransactionPayload(innerTxn(11, _.writeInsert(23, cols, Seq(
        Seq(1, new JBigDecimal("1.5000"), "a"),
        Seq(2, new JBigDecimal("2.5000"), "b")), ts = 11)), compress = true, ts = 1000)
      .writeGtid(2, ts = 1001)
      .writeTransactionPayload(innerTxn(12, { tw =>
        tw.writeUpdate(23, cols, Seq(
          (Seq(1, new JBigDecimal("1.5000"), "a"),
           Seq(1, new JBigDecimal("7.7500"), "A"))), ts = 12)
        tw.writeDelete(23, cols, Seq(Seq(2, new JBigDecimal("2.5000"), "b")), ts = 12)
      }), compress = false, ts = 1001)
      .save(dir.resolve("binlog.000001").toString)
    val plainDir = Files.createTempDirectory("ctp-plain")
    val plain = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000)
      .writeGtid(1, ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 11)
      .writeTableMap(23, "foo", "auto", cols, ts = 11)
      .writeInsert(23, cols, Seq(
        Seq(1, new JBigDecimal("1.5000"), "a"),
        Seq(2, new JBigDecimal("2.5000"), "b")), ts = 11)
      .writeXid(11, ts = 11)
      .writeGtid(2, ts = 1001)
      .writeQuery("foo", "BEGIN", ts = 12)
      .writeTableMap(23, "foo", "auto", cols, ts = 12)
      .writeUpdate(23, cols, Seq(
        (Seq(1, new JBigDecimal("1.5000"), "a"),
         Seq(1, new JBigDecimal("7.7500"), "A"))), ts = 12)
      .writeDelete(23, cols, Seq(Seq(2, new JBigDecimal("2.5000"), "b")), ts = 12)
      .writeXid(12, ts = 12)
      .save(plainDir.resolve("binlog.000001").toString)
    (ctp, plain)
  }

  test("decoder: inner events surface in order, positions rebound to the envelope") {
    val (ctp, _) = twinLogs()
    val events = BinlogReader.readBinlog(ctp).events
    val types = events.map(e => EventType.name(e.header.eventType))
    assert(types == Vector(
      "FORMAT_DESCRIPTION_EVENT", "GTID_LOG_EVENT",
      "QUERY_EVENT", "TABLE_MAP_EVENT", "WRITE_ROWS_EVENT_V2", "XID_EVENT",
      "GTID_LOG_EVENT",
      "QUERY_EVENT", "TABLE_MAP_EVENT", "UPDATE_ROWS_EVENT_V2",
      "DELETE_ROWS_EVENT_V2", "XID_EVENT"))
    // all 4 events of txn 1 share the first envelope's offset; the envelope
    // offsets themselves strictly increase
    val txn1Offsets = events.slice(2, 6).map(_.header.offset).distinct
    val txn2Offsets = events.slice(7, 12).map(_.header.offset).distinct
    assert(txn1Offsets.size == 1 && txn2Offsets.size == 1)
    assert(txn1Offsets.head < txn2Offsets.head)
    // content decoded through the zstd payload
    val rows = events.collectFirst { case r: RowsEvent => r }.get
    assert(rows.rows.map(_(0)) == Vector(1, 2))
  }

  test("DSv2 source: compressed log == uncompressed twin (content + xid stitching)") {
    val (ctp, plain) = twinLogs()
    def scan(p: String) = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .load(p)
      .selectExpr("_delta_type", "xid", "id", "CAST(val AS STRING) AS val", "word")
      .collect().map(_.toSeq).toSeq
    val a = scan(ctp)
    val b = scan(plain)
    assert(a == b, s"compressed scan drifted from uncompressed twin:\n$a\nvs\n$b")
    assert(a.map(_(1)).distinct.sorted(Ordering.by((x: Any) => x.toString)) == Seq(11L, 12L))
  }

  test("inner rows events of one envelope get DISTINCT (log_pos, log_seq) keys") {
    // txn 2 holds an UPDATE event (2 images) and a DELETE event in ONE
    // envelope — all three change rows share log_pos, so seq must
    // CONTINUE across the events (0,1,2), not restart per event
    val (ctp, _) = twinLogs()
    val keys = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .load(ctp)
      .filter("xid = 12")
      .selectExpr("log_pos", "log_seq", "_delta_type")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(keys.map(k => (k._1, k._2)).distinct.size == keys.size,
      s"colliding (log_pos, log_seq): $keys")
    assert(keys.map(_._2).sorted == Seq(0, 1, 2), keys.toString)
  }

  test("events mode: inner stream visible, envelope not double-counted") {
    val (ctp, _) = twinLogs()
    val counts = spark.read.format("mysql-binlog").option("mode", "events")
      .load(ctp)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("WRITE_ROWS_EVENT_V2") == 1L)
    assert(counts("XID_EVENT") == 2L)
    assert(!counts.contains("TRANSACTION_PAYLOAD_EVENT"))
  }

  test("tailer: live compressed appends arrive committed, same as the source") {
    val dir = Files.createTempDirectory("ctp-tail")
    val f = dir.resolve("binlog.000001").toString
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000)
      .writeGtid(1, ts = 1000)
      .writeTransactionPayload(innerTxn(11, _.writeInsert(23, cols,
        Seq(Seq(1, new JBigDecimal("1.0000"), "seed")), ts = 11)), compress = true, ts = 1000)
    w.save(f)
    val got = new ConcurrentLinkedQueue[(String, Long, Any)]()
    val t = BinlogTailer.start(dir.toString,
      ch => got.add((ch.deltaType, ch.xid.getOrElse(-1L), ch.row(0))), pollMs = 25)
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (got.size < 1 && System.nanoTime() < deadline) Thread.sleep(5)
      // live append of another compressed txn
      w.writeGtid(2, ts = 1001)
        .writeTransactionPayload(innerTxn(12, _.writeInsert(23, cols,
          Seq(Seq(2, new JBigDecimal("2.0000"), "live")), ts = 12)), compress = true, ts = 1001)
        .save(f)
      while (got.size < 2 && t.failure.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(5)
      assert(t.failure.isEmpty, s"tailer died: ${t.failure.map(_.toString)}")
      val seq = got.toArray(new Array[(String, Long, Any)](0)).toSeq
      assert(seq == Seq(("insert", 11L, 1), ("insert", 12L, 2)), seq.toString)
    } finally t.close()
  }

  test("GTID-addressed resume: startAfterGtid works on compressed transactions") {
    val (ctp, _) = twinLogs()
    val uuid = BinlogReader.toHex(BinlogWriter.FixtureUuid).grouped(4).toVector match {
      case _ => // canonical uuid text of the fixture sid
        val hex = BinlogReader.toHex(BinlogWriter.FixtureUuid)
        s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
          s"${hex.substring(16, 20)}-${hex.substring(20)}"
    }
    def scanAfter(gno: Long) = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .option("startAfterGtid", s"$uuid:$gno")
      .load(ctp)
      .selectExpr("_delta_type", "id").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    // after txn 1: only txn 2's update+delete rows
    assert(scanAfter(1L) ==
      Seq(("update-before", 1), ("update", 1), ("delete", 2)))
    // after the LAST transaction — its commit lives INSIDE the payload
    // envelope, so the envelope end must resolve as the boundary
    assert(scanAfter(2L) == Seq.empty)
  }

  test("micro-batch resume: batch boundaries park after whole envelopes") {
    // stream the compressed log with a tiny byte budget: every batch must
    // carry only whole transactions (no uncommitted/xid-less rows)
    val (ctp, _) = twinLogs()
    val dir = new java.io.File(ctp).getParent
    val seen = new ConcurrentLinkedQueue[(Long, Int)]()
    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .option("maxBytesPerTrigger", "1") // one envelope per batch at most
      .load(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.selectExpr("xid", "id").collect().foreach(r => seen.add((r.getLong(0), r.getInt(1))))
      }
      .start()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (seen.size < 5 && System.nanoTime() < deadline) Thread.sleep(20)
      val xs = seen.toArray(new Array[(Long, Int)](0)).toSeq
      assert(xs.size == 5, xs.toString)
      assert(xs.forall(_._1 > 0), s"uncommitted/xid-less rows leaked: $xs")
    } finally q.stop()
  }
}
