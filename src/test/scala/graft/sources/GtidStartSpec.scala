package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.{BinlogReader, BinlogWriter}
import BinlogWriter._

/** `startAfterGtid` — resuming the scan just after a named transaction,
  * the addressing scheme MySQL replication users actually hold. File
  * selection goes through each file's PREVIOUS_GTIDS head (O(files));
  * only the one candidate file is header-walked.
  */
class GtidStartSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val uuid = "03142536-4758-697a-8b9c-adbecfe0f102"
  private val cols = Seq(ColSpec.int)

  private def txn(w: Writer, gno: Long, id: Int): Writer = {
    w.writeGtid(gno, ts = 1000)
      .writeQuery("d", "BEGIN", ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](id)), ts = 1000)
      .writeXid(gno, ts = 1000)
    w
  }

  private def fixture(): java.nio.file.Path = {
    val dir = Files.createTempDirectory("gtid-start")
    val w1 = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
      .writePreviousGtids(0, ts = 1000)
    txn(w1, 1, 1); txn(w1, 2, 2)
    w1.writeRotate("binlog.000002", ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val w2 = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
      .writePreviousGtids(2, ts = 1000)
    txn(w2, 3, 3); txn(w2, 4, 4)
    w2.save(dir.resolve("binlog.000002").toString)
    dir
  }

  private def ids(dir: java.nio.file.Path, spec: String): Seq[Int] = {
    import org.apache.spark.sql.functions.col
    spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT")
      .option("startAfterGtid", spec)
      .load(dir.toString)
      .orderBy(col("log_file"), col("log_pos")).select("id")
      .collect().map(_.getInt(0)).toSeq
  }

  test("start after a GTID mid-file and across files") {
    val dir = fixture()
    assert(ids(dir, s"$uuid:1") === Seq(2, 3, 4))
    assert(ids(dir, s"$uuid:2") === Seq(3, 4)) // commits at end of file 1
    assert(ids(dir, s"$uuid:3") === Seq(4))    // file 1 skipped via PREVIOUS_GTIDS
    assert(ids(dir, s"$uuid:4") === Seq.empty)
  }

  test("PREVIOUS_GTIDS routes the walk to the right file") {
    val dir = fixture()
    assert(BinlogReader.previousGtidsOf(dir.resolve("binlog.000002").toString)
      === Some(s"$uuid:1-2"))
    // gno 3 committed in file 2: file 1 has no match, file 2 resolves
    assert(BinlogReader.positionAfterGtid(dir.resolve("binlog.000001").toString, uuid, 3).isEmpty)
    assert(BinlogReader.positionAfterGtid(dir.resolve("binlog.000002").toString, uuid, 3).isDefined)
  }

  test("DDL-committed target: following anonymous txn is preserved; EOF resolves") {
    val dir = Files.createTempDirectory("gtid-ddl")
    val w = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
      .writePreviousGtids(0, ts = 1000)
    txn(w, 1, 1)
    // gno 2 commits via DDL (implicit commit, no XID)
    w.writeGtid(2, ts = 1000)
      .writeQuery("d", "CREATE TABLE d.other (x INT)", ts = 1000)
    // an ANONYMOUS transaction follows — it must NOT be skipped
    w.writeGtid(3, anonymous = true, ts = 1000)
      .writeQuery("d", "BEGIN", ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](30)), ts = 1000)
      .writeXid(30, ts = 1000)
    // gno 4 commits via DDL as the LAST event of the file
    w.writeGtid(4, ts = 1000)
      .writeQuery("d", "CREATE INDEX ix ON d.other (x)", ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    // resuming after the DDL-committed gno 2 keeps the anonymous txn's row
    assert(ids(dir, s"$uuid:2") === Seq(30))
    // a DDL-committed target at end-of-file resolves (empty, not an error)
    assert(ids(dir, s"$uuid:4") === Seq.empty)
  }

  test("a GTID the logs do not contain fails loudly") {
    val dir = fixture()
    val ex = intercept[Exception](ids(dir, s"$uuid:99"))
    assert(ex.getMessage.contains("not found"))
    val ex2 = intercept[Exception](ids(dir, "not-a-gtid"))
    assert(ex2.getMessage.contains("uuid:gno"))
  }

  // ---- MariaDB: domain-server-seq addressing over GTID_LIST-routed logs

  /** One MariaDB transaction: GTID frame REPLACES BEGIN (no QUERY opens
    * the group), XID commits.
    */
  private def mariaTxn(w: Writer, seq: Long, id: Int): Writer = {
    w.writeMariaGtid(0L, seq, ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](id)), ts = 1000)
      .writeXid(seq, ts = 1000)
    w
  }

  private def mariaFixture(): java.nio.file.Path = {
    val dir = Files.createTempDirectory("maria-gtid-start")
    val w1 = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000, serverVersion = "10.6.14-MariaDB-log")
      .writeMariaGtidList(Nil, ts = 1000)
    mariaTxn(w1, 1, 1); mariaTxn(w1, 2, 2)
    w1.writeRotate("binlog.000002", ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val w2 = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000, serverVersion = "10.6.14-MariaDB-log")
      .writeMariaGtidList(Seq((0L, 1L, 2L)), ts = 1000)
    mariaTxn(w2, 3, 3); mariaTxn(w2, 4, 4)
    w2.save(dir.resolve("binlog.000002").toString)
    dir
  }

  test("MariaDB: start after a domain-server-seq GTID mid-file and across files") {
    val dir = mariaFixture()
    assert(ids(dir, "0-1-1") === Seq(2, 3, 4))
    assert(ids(dir, "0-1-2") === Seq(3, 4)) // commits at end of file 1
    assert(ids(dir, "0-1-3") === Seq(4))    // file 1 skipped via GTID_LIST
    assert(ids(dir, "0-1-4") === Seq.empty)
  }

  test("MariaDB: GTID_LIST routes the walk to the right file") {
    val dir = mariaFixture()
    assert(BinlogReader.mariaGtidListOf(dir.resolve("binlog.000002").toString)
      === Some(Vector((0L, 1L, 2L))))
    assert(BinlogReader.positionAfterMariaGtid(
      dir.resolve("binlog.000001").toString, 0L, 1L, 3L).isEmpty)
    assert(BinlogReader.positionAfterMariaGtid(
      dir.resolve("binlog.000002").toString, 0L, 1L, 3L).isDefined)
  }

  test("MariaDB: interleaved domains — positional resume, domain-aware routing") {
    val dir = Files.createTempDirectory("maria-gtid-domains")
    // two replication domains interleaved in one file set (MariaDB's
    // multi-source shape); per-domain seqs advance independently
    val w1 = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000, serverVersion = "10.6.14-MariaDB-log")
      .writeMariaGtidList(Nil, ts = 1000)
    w1.writeMariaGtid(0L, 1L, ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](1)), ts = 1000)
      .writeXid(1, ts = 1000)
    w1.writeMariaGtid(1L, 1L, ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](101)), ts = 1000)
      .writeXid(2, ts = 1000)
    w1.writeMariaGtid(0L, 2L, ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](2)), ts = 1000)
      .writeXid(3, ts = 1000)
      .writeRotate("binlog.000002", ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val w2 = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000, serverVersion = "10.6.14-MariaDB-log")
      .writeMariaGtidList(Seq((0L, 1L, 2L), (1L, 1L, 1L)), ts = 1000)
    w2.writeMariaGtid(1L, 2L, ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](102)), ts = 1000)
      .writeXid(4, ts = 1000)
      .save(dir.resolve("binlog.000002").toString)
    // resume is POSITIONAL (the reference's offset contract): everything
    // after the named txn's commit follows, regardless of domain
    assert(ids(dir, "1-1-1") === Seq(2, 102))
    assert(ids(dir, "0-1-2") === Seq(102))
    // domain 1's seq 2 lives in file 2; the GTID_LIST must route there
    // even though domain 0's entry (seq 2) is numerically equal
    assert(ids(dir, "1-1-2") === Seq.empty)
    assert(graft.binlog.BinlogReader.mariaListContains(
      Vector((0L, 1L, 2L), (1L, 1L, 1L)), 1L, 2L) === false)
    assert(graft.binlog.BinlogReader.mariaListContains(
      Vector((0L, 1L, 2L), (1L, 1L, 1L)), 1L, 1L) === true)
  }

  test("MariaDB: standalone (DDL) target; wrong domain/server fails loudly") {
    val dir = Files.createTempDirectory("maria-gtid-ddl")
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000, serverVersion = "10.6.14-MariaDB-log")
      .writeMariaGtidList(Nil, ts = 1000)
    mariaTxn(w, 1, 1)
    // seq 2 is a standalone group: one implicitly-committing DDL QUERY
    w.writeMariaGtid(0L, 2L, standalone = true, ts = 1000)
      .writeQuery("d", "CREATE TABLE d.other (x INT)", ts = 1000)
    mariaTxn(w, 3, 30)
    w.save(dir.resolve("binlog.000001").toString)
    // resuming after the standalone DDL keeps the following txn's row
    assert(ids(dir, "0-1-2") === Seq(30))
    // domain/server are part of the identity, not decoration
    assert(intercept[Exception](ids(dir, "7-1-1")).getMessage.contains("not found"))
    assert(intercept[Exception](ids(dir, "0-9-1")).getMessage.contains("not found"))
  }

  test("MariaDB: non-standalone LOAD DATA group resumes after XID, standalone at execute") {
    val dir = Files.createTempDirectory("maria-gtid-load")
    val sql = "LOAD DATA INFILE '/d/a.csv' INTO TABLE t"
    val s = sql.indexOf('\''); val e = sql.indexOf('\'', s + 1) + 1
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1000, serverVersion = "10.6.14-MariaDB-log")
      .writeMariaGtidList(Nil, ts = 1000)
      // seq 1: transactional (InnoDB) load — the GTID frame REPLACES
      // BEGIN (FL_STANDALONE clear, no QUERY opens the group), so the
      // group must end at its XID, NOT at EXECUTE_LOAD_QUERY
      .writeMariaGtid(0L, 1L, ts = 1000)
      .writeBeginLoadQuery(4, Array.fill(8)('a'.toByte), ts = 1000)
      .writeExecuteLoadQuery("d", sql, 4, s, e, ts = 1000)
      .writeXid(11, ts = 1000)
      // seq 2: statement-format standalone load — ends at the execute
      .writeMariaGtid(0L, 2L, standalone = true, ts = 1000)
      .writeBeginLoadQuery(5, Array.fill(8)('b'.toByte), ts = 1000)
      .writeExecuteLoadQuery("d", sql, 5, s, e, ts = 1000)
    mariaTxn(w, 3, 30)
    w.save(dir.resolve("binlog.000001").toString)
    val f = dir.resolve("binlog.000001").toString
    val events = spark.read.format("mysql-binlog").option("mode", "events")
      .load(dir.toString).selectExpr("event_type", "next_pos")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def nextPosOf(n: Int, tpe: String): Long = events.filter(_._1 == tpe)(n)._2
    assert(BinlogReader.positionAfterMariaGtid(f, 0L, 1L, 1L) ==
      Some(nextPosOf(0, "XID_EVENT")))
    assert(BinlogReader.positionAfterMariaGtid(f, 0L, 1L, 2L) ==
      Some(nextPosOf(1, "EXECUTE_LOAD_QUERY_EVENT")))
    // end-to-end: resuming after seq 1 must not re-enter the group
    // between execute and XID (both later groups' content follows)
    assert(ids(dir, "0-1-2") === Seq(30))
  }

  test("MariaDB micro-batch: GTID-framed loads never split from their XID") {
    val dir = Files.createTempDirectory("maria-load-stream")
    val sql = "LOAD DATA INFILE '/d/b.csv' INTO TABLE other"
    val s = sql.indexOf('\''); val e = sql.indexOf('\'', s + 1) + 1
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1, serverVersion = "10.6.14-MariaDB-log")
    for (i <- 0 until 12) {
      // non-standalone GTID frame + load + XID (no BEGIN QUERY — the
      // frame opens the txn), interleaved with row txns; the tiny byte
      // budget forces batch boundaries among these shapes
      w.writeMariaGtid(0L, 3L * i + 1, ts = i)
        .writeBeginLoadQuery(100 + i, Array.fill(32)('x'.toByte), ts = i)
        .writeExecuteLoadQuery("d", sql, 100 + i, s, e, ts = i)
        .writeXid(1000 + i, ts = i)
      w.writeMariaGtid(0L, 3L * i + 2, ts = i)
        .writeTableMap(7, "d", "t", cols, ts = i)
        .writeInsert(7, cols, Seq(Seq[Any](i)), ts = i)
        .writeXid(2000 + i, ts = i)
      w.writeMariaGtid(0L, 3L * i + 3, standalone = true, ts = i)
        .writeBeginLoadQuery(200 + i, Array.fill(16)('y'.toByte), ts = i)
        .writeExecuteLoadQuery("d", sql, 200 + i, s, e, ts = i)
    }
    w.save(dir.resolve("binlog.000001").toString)
    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", "id INT")
      .option("maxBytesPerTrigger", "400")
      .load(dir.toString)
      .writeStream.format("memory").queryName("maria_load_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("maria_load_mem").selectExpr("id", "xid").collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      // every row txn arrives exactly once with ITS OWN xid — a safe
      // position parked between an execute and its XID would strip or
      // misattribute one
      assert(rows.toSet == (0 until 12).map(i => (i, 2000L + i)).toSet)
    } finally q.stop()
  }

  private def taggedTxn(w: Writer, gno: Long, tag: String, id: Int): Writer = {
    w.writeGtidTagged(gno, tag, ts = 1000)
      .writeQuery("d", "BEGIN", ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](id)), ts = 1000)
      .writeXid(gno + 500, ts = 1000)
    w
  }

  test("tagged GTIDs: events-mode gtid column carries uuid:tag:gno") {
    val dir = Files.createTempDirectory("gtid-tagged-events")
    val w = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.4.0-graft-fixture")
      .writePreviousGtids(0, ts = 1000)
    taggedTxn(w, 1, "patch", 10)
    txn(w, 1, 11) // untagged gno 1 is a DIFFERENT transaction
    w.save(dir.resolve("binlog.000001").toString)
    val got = spark.read.format("mysql-binlog").option("mode", "events")
      .load(dir.toString)
      .selectExpr("event_type", "gtid")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.contains(("GTID_TAGGED_LOG_EVENT", s"$uuid:patch:1")), got.mkString(", "))
    assert(got.contains(("GTID_LOG_EVENT", s"$uuid:1")), got.mkString(", "))
  }

  test("tagged GTIDs: tagged and untagged GNO sequences never cross-match") {
    val dir = Files.createTempDirectory("gtid-tagged-iso")
    val w = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.4.0-graft-fixture")
      .writePreviousGtids(0, ts = 1000)
    taggedTxn(w, 1, "patch", 10)
    txn(w, 1, 11)
    taggedTxn(w, 2, "patch", 12)
    taggedTxn(w, 1, "other", 13) // same gno, different tag: also distinct
    w.save(dir.resolve("binlog.000001").toString)
    val f = dir.resolve("binlog.000001").toString
    // a tag-less spec must never resolve against the tagged frame
    val posUntagged = BinlogReader.positionAfterGtid(f, uuid, 1)
    val posTagged = BinlogReader.positionAfterGtid(f, uuid, 1, tag = "patch")
    assert(posUntagged.isDefined && posTagged.isDefined && posUntagged != posTagged)
    assert(ids(dir, s"$uuid:patch:1") === Seq(11, 12, 13))
    assert(ids(dir, s"$uuid:1") === Seq(12, 13))
    assert(ids(dir, s"$uuid:patch:2") === Seq(13))
    assert(ids(dir, s"$uuid:other:1") === Seq.empty)
    // a tagged GTID the logs don't contain stays a loud error
    assert(intercept[Exception](ids(dir, s"$uuid:patch:9")).getMessage
      .contains("not found"))
  }

  test("tagged GTIDs: resume across a rotated set (newest-first candidate scan)") {
    val dir = Files.createTempDirectory("gtid-tagged-rotate")
    val w1 = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.4.0-graft-fixture")
      .writePreviousGtids(0, ts = 1000)
    taggedTxn(w1, 1, "patch", 1)
    taggedTxn(w1, 2, "patch", 2)
    w1.writeRotate("binlog.000002", ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val w2 = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.4.0-graft-fixture")
      .writePreviousGtids(0, ts = 1000)
    taggedTxn(w2, 3, "patch", 3)
    taggedTxn(w2, 4, "patch", 4)
    w2.save(dir.resolve("binlog.000002").toString)
    assert(ids(dir, s"$uuid:patch:1") === Seq(2, 3, 4)) // mid file 1
    assert(ids(dir, s"$uuid:patch:2") === Seq(3, 4))    // end of file 1
    assert(ids(dir, s"$uuid:patch:3") === Seq(4))       // mid file 2
    assert(ids(dir, s"$uuid:patch:4") === Seq.empty)
  }

  test("tagged GTIDs: micro-batch never splits the frame from its transaction") {
    val dir = Files.createTempDirectory("gtid-tagged-stream")
    val w = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1, serverVersion = "8.4.0-graft-fixture")
      .writePreviousGtids(0, ts = 1)
    for (i <- 0 until 12) taggedTxn(w, i + 1L, "bulk", i)
    w.save(dir.resolve("binlog.000001").toString)
    // a tiny byte budget forces batch boundaries between transactions;
    // a boundary between a tagged frame and its BEGIN would misattribute
    // or drop a transaction on restart
    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", "id INT")
      .option("maxBytesPerTrigger", "300")
      .load(dir.toString)
      .writeStream.format("memory").queryName("tagged_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tagged_mem").selectExpr("id", "xid").collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      assert(rows.toSet === (0 until 12).map(i => (i, i + 501L)).toSet)
    } finally q.stop()
  }

  test("prefix-varint roundtrip across every byte-length boundary") {
    val values = Seq(0L, 1L, 127L, 128L, 16383L, 16384L,
      (1L << 21) - 1, 1L << 21, (1L << 28) - 1, 1L << 28,
      (1L << 35) - 1, (1L << 42) - 1, (1L << 49) - 1,
      (1L << 56) - 1, 1L << 56, Long.MaxValue, -1L) // -1 = max unsigned
    // roundtrip through the writer/reader pair: a tagged event whose gno
    // takes each encoding width
    for (v <- values) {
      val dir = Files.createTempDirectory("varint-rt")
      val w = new Writer(checksum = true)
        .writeFormatDescription(ts = 1, serverVersion = "8.4.0-graft-fixture")
        .writeGtidTagged(v, "t", ts = 1)
      w.save(dir.resolve("binlog.000001").toString)
      val buf = BinlogReader.mapFile(dir.resolve("binlog.000001").toString)
      val evs = BinlogReader.eventIterator(buf, 4L).toVector
      val g = evs.collectFirst { case g: graft.binlog.GtidEvent => g }.get
      assert(g.gno === v, s"gno $v did not roundtrip")
      assert(g.tag === "t")
    }
  }

  test("streaming initial offset honors startAfterGtid") {
    val dir = fixture()
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("gtid-stream-out").toString
    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", "id INT")
      .option("startAfterGtid", s"$uuid:2")
      .load(dir.toString)
      .writeStream.format("memory").queryName("gtid_start_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gtid_start_mem").select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(got === Seq(3, 4))
    } finally q.stop()
  }
}
