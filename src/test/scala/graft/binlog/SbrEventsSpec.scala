package graft.binlog

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** Statement-based-replication context events (INTVAR/RAND/USER_VAR) and
  * the INCIDENT gap marker: bodies decode (mysqlbinlog-style renderings in
  * the events-mode `sql` column), and a change scan REFUSES to read past an
  * INCIDENT unless told to — the server itself flagged the log as possibly
  * incomplete.
  */
class SbrEventsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.varchar(20))

  private def sbrLog(): String = {
    val dir = Files.createTempDirectory("sbr")
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1)
      .writeQuery("shop", "BEGIN", ts = 2)
      .writeIntvar(2, 42L, ts = 2) // INSERT_ID=42
      .writeRand(7L, 9L, ts = 2)
      .writeUserVar("greeting", "hi 'there'".getBytes("UTF-8"), valType = 0,
        charsetId = 33, ts = 2)
      .writeUserVar("big", leLong(-1L), valType = 2, charsetId = 63,
        unsigned = true, ts = 2)
      .writeUserVar("missing", null, ts = 2)
      .writeTableMap(7, "shop", "t", cols, ts = 2)
      .writeInsert(7, cols, Seq(Seq[Any](1, "a")), ts = 2)
      .writeXid(11, ts = 2)
      .writeIncident(1, "disk full on master", ts = 3)
      .writeQuery("shop", "BEGIN", ts = 4)
      .writeTableMap(7, "shop", "t", cols, ts = 4)
      .writeInsert(7, cols, Seq(Seq[Any](2, "b")), ts = 4)
      .writeXid(12, ts = 4)
      .save(dir.resolve("binlog.000001").toString)
    dir.toString
  }

  test("events mode renders SBR context bodies and the incident message") {
    val rows = spark.read.format("mysql-binlog").option("mode", "events")
      .load(sbrLog()).selectExpr("event_type", "sql").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byType("INTVAR_EVENT") == Seq("SET INSERT_ID=42"))
    assert(byType("RAND_EVENT") == Seq("SET @@RAND_SEED1=7, @@RAND_SEED2=9"))
    assert(byType("USER_VAR_EVENT").toSet == Set(
      "SET @`greeting`:='hi ''there'''", // string: quotes escaped
      "SET @`big`:=18446744073709551615", // unsigned INT: full 64-bit render
      "SET @`missing`:=NULL"))
    // incident NUMBER stays legible even for the common empty-message shape
    assert(byType("INCIDENT_EVENT") == Seq("#Incident: LOST_EVENTS: disk full on master"))
  }

  test("change scan fails loudly at an INCIDENT; onIncident=ignore reads on") {
    val d = sbrLog()
    val read = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, word STRING")
    val err = intercept[org.apache.spark.SparkException] {
      read.load(d).collect()
    }
    val msg = err.getCause match { case c if c != null => c.getMessage; case _ => err.getMessage }
    assert(msg.contains("INCIDENT") && msg.contains("replication gap") &&
      msg.contains("onIncident=ignore"), msg)
    val rows = read.option("onIncident", "ignore").load(d)
      .selectExpr("id", "xid").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.toSet == Set((1, 11L), (2, 12L)))
  }

  test("resume past an acknowledged incident does not re-trip on it") {
    val d = sbrLog()
    val events = spark.read.format("mysql-binlog").option("mode", "events")
      .load(d).selectExpr("event_type", "log_pos", "next_pos").collect()
    val afterIncident = events
      .find(_.getString(0) == "INCIDENT_EVENT").get.getLong(2)
    // the incident sits in the replay-from-4 prefix now — the same
    // contract as the DDL guard: only in-range events can kill the scan
    val rows = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, word STRING")
      .option("startOffset", afterIncident.toString)
      .load(d).selectExpr("id", "xid").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.toSet == Set((2, 12L)))
  }

  test("undersized INTVAR body fails by name, not by decoding a neighbor") {
    val dir = Files.createTempDirectory("sbr-short")
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1)
      .writeOpaque(EventType.Intvar, Array[Byte](2, 42), ts = 2) // 2 of 9 bytes
      .writeQuery("shop", "BEGIN", ts = 3)
      .save(dir.resolve("binlog.000001").toString)
    val err = intercept[Exception] {
      spark.read.format("mysql-binlog").option("mode", "events")
        .load(dir.toString).collect()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("INTVAR") && msgs.contains("body needs 9"), msgs)
  }

  test("DECIMAL user-var values render via the packed-decimal codec") {
    val dec = new java.math.BigDecimal("-1234.5678")
    val body = Array[Byte](10, 4) ++ MySqlDecimal.encode(dec, 10, 4)
    val e = UserVarEvent(EventHeader(0L, EventType.UserVar, 1L, 0L, 0L, 0, 0L),
      "d", isNull = false, valType = 4, charsetId = 63, value = body,
      unsigned = false)
    assert(e.rendered == "SET @`d`:=-1234.5678")
  }

  test("empty-message incident renders the number alone, no trailing colon") {
    val e = IncidentEvent(
      EventHeader(0L, EventType.Incident, 1L, 0L, 0L, 0, 0L), 1, "")
    assert(e.rendered == "#Incident: LOST_EVENTS")
    assert(IncidentEvent(e.header, 7, "").rendered == "#Incident: INCIDENT(7)")
  }

  // ---- LOAD DATA INFILE under statement-based replication (events 17/9/11/18)

  private def loadDataLog(): String = {
    val dir = Files.createTempDirectory("sbr-load")
    val sql7 = "LOAD DATA INFILE '/data/in7.csv' REPLACE INTO TABLE t"
    val s7 = sql7.indexOf('\''); val e7 = sql7.indexOf('\'', s7 + 1) + 1
    val sql8 = "LOAD DATA INFILE '/data/in8.csv' IGNORE INTO TABLE t"
    val s8 = sql8.indexOf('\''); val e8 = sql8.indexOf('\'', s8 + 1) + 1
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1)
      // BEGIN-wrapped (InnoDB/mixed): transfer + execute inside BEGIN..XID
      .writeQuery("shop", "BEGIN", ts = 2)
      .writeBeginLoadQuery(7, Array.fill(48)('x'.toByte), ts = 2)
      .writeAppendBlock(7, Array.fill(16)('y'.toByte), ts = 2)
      .writeExecuteLoadQuery("shop", sql7, 7, s7, e7, dupHandling = 2, ts = 2)
      .writeXid(21, ts = 2)
      // standalone autocommit (statement format): no BEGIN/XID
      .writeBeginLoadQuery(8, Array.fill(24)('z'.toByte), ts = 3)
      .writeExecuteLoadQuery("shop", sql8, 8, s8, e8, dupHandling = 1, ts = 3)
      // aborted transfer
      .writeBeginLoadQuery(9, Array.fill(8)('q'.toByte), ts = 4)
      .writeDeleteFile(9, ts = 4)
      .save(dir.resolve("binlog.000001").toString)
    dir.toString
  }

  test("events mode renders the LOAD DATA family with fn_pos substitution") {
    val rows = spark.read.format("mysql-binlog").option("mode", "events")
      .load(loadDataLog()).selectExpr("event_type", "sql", "db").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val byType = rows.groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    assert(byType("BEGIN_LOAD_QUERY_EVENT").map(_._1) == Seq(
      "#Begin_load_query: file_id=7 block_len=48",
      "#Begin_load_query: file_id=8 block_len=24",
      "#Begin_load_query: file_id=9 block_len=8"))
    assert(byType("APPEND_BLOCK_EVENT").map(_._1) == Seq(
      "#Append_block: file_id=7 block_len=16"))
    assert(byType("DELETE_FILE_EVENT").map(_._1) == Seq("#Delete_file: file_id=9"))
    // the filename literal (quotes included) is swapped for the transfer
    // handle; db travels like QUERY's
    assert(byType("EXECUTE_LOAD_QUERY_EVENT") == Seq(
      ("LOAD DATA INFILE <file_id:7> REPLACE INTO TABLE t", "shop"),
      ("LOAD DATA INFILE <file_id:8> IGNORE INTO TABLE t", "shop")))
  }

  test("out-of-range fn_pos falls back to the raw statement") {
    val h = EventHeader(0L, EventType.ExecuteLoadQuery, 1L, 0L, 0L, 0, 0L)
    val e = ExecuteLoadQueryEvent(h, 1L, 0L, 0, "shop",
      "LOAD DATA INFILE 'x' INTO TABLE t", 3, 900, 905, 0)
    assert(e.rendered == "LOAD DATA INFILE 'x' INTO TABLE t")
    assert(e.dupName == "ERROR")
  }

  test("undersized LOAD DATA bodies fail by name") {
    for ((t, name) <- Seq(EventType.BeginLoadQuery -> "BEGIN_LOAD_QUERY",
                          EventType.DeleteFile -> "DELETE_FILE",
                          EventType.ExecuteLoadQuery -> "EXECUTE_LOAD_QUERY")) {
      val dir = Files.createTempDirectory("sbr-load-short")
      new Writer(checksum = true)
        .writeFormatDescription(ts = 1)
        .writeOpaque(t, Array[Byte](1, 2), ts = 2) // far under any body minimum
        .save(dir.resolve("binlog.000001").toString)
      val err = intercept[Exception] {
        spark.read.format("mysql-binlog").option("mode", "events")
          .load(dir.toString).collect()
      }
      val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains(name) && msgs.contains("body needs"), s"$name: $msgs")
    }
  }

  test("GTID resume: standalone LOAD group ends at the execute, BEGIN-wrapped at XID") {
    val dir = Files.createTempDirectory("sbr-load-gtid")
    val uuid = "03142536-4758-697a-8b9c-adbecfe0f102" // FixtureUuid bytes
    val sql = "LOAD DATA INFILE '/d/a.csv' INTO TABLE t"
    val s = sql.indexOf('\''); val e = sql.indexOf('\'', s + 1) + 1
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1)
      // gno 1: statement-format standalone load — group ends at execute
      .writeGtid(1, ts = 2)
      .writeBeginLoadQuery(4, Array.fill(8)('a'.toByte), ts = 2)
      .writeExecuteLoadQuery("shop", sql, 4, s, e, ts = 2)
      // gno 2: BEGIN-wrapped load — group ends at its XID, NOT the execute
      .writeGtid(2, ts = 3)
      .writeQuery("shop", "BEGIN", ts = 3)
      .writeBeginLoadQuery(5, Array.fill(8)('b'.toByte), ts = 3)
      .writeExecuteLoadQuery("shop", sql, 5, s, e, ts = 3)
      .writeXid(31, ts = 3)
      // gno 3: ordinary row txn (a resume target to measure against)
      .writeGtid(3, ts = 4)
      .writeQuery("shop", "BEGIN", ts = 4)
      .writeTableMap(7, "shop", "t", cols, ts = 4)
      .writeInsert(7, cols, Seq(Seq[Any](1, "a")), ts = 4)
      .writeXid(32, ts = 4)
      .save(dir.resolve("binlog.000001").toString)
    val f = dir.resolve("binlog.000001").toString
    val events = spark.read.format("mysql-binlog").option("mode", "events")
      .load(dir.toString).selectExpr("event_type", "log_pos", "next_pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def nextPosOf(n: Int, tpe: String): Long =
      events.filter(_._1 == tpe)(n)._3
    // standalone: resume lands after EXECUTE_LOAD_QUERY (gno 1's end)
    assert(BinlogReader.positionAfterGtid(f, uuid, 1L) ==
      Some(nextPosOf(0, "EXECUTE_LOAD_QUERY_EVENT")))
    // BEGIN-wrapped: resume waits for the XID, not the execute
    assert(BinlogReader.positionAfterGtid(f, uuid, 2L) ==
      Some(nextPosOf(0, "XID_EVENT")))
  }

  test("micro-batch stream crosses LOAD DATA statements without splitting txns") {
    val dir = Files.createTempDirectory("sbr-load-stream")
    val sql = "LOAD DATA INFILE '/d/b.csv' INTO TABLE other"
    val s = sql.indexOf('\''); val e = sql.indexOf('\'', s + 1) + 1
    val w = new Writer(checksum = true).writeFormatDescription(ts = 1)
    for (i <- 0 until 20) {
      // interleave row txns with BEGIN-wrapped and standalone loads so the
      // tiny byte budget forces batch boundaries among the new event types
      w.writeQuery("shop", "BEGIN", ts = i)
        .writeBeginLoadQuery(100 + i, Array.fill(32)('x'.toByte), ts = i)
        .writeExecuteLoadQuery("shop", sql, 100 + i, s, e, ts = i)
        .writeXid(1000 + i, ts = i)
      w.writeQuery("shop", "BEGIN", ts = i)
        .writeTableMap(7, "shop", "t", cols, ts = i)
        .writeInsert(7, cols, Seq(Seq[Any](i, "r")), ts = i)
        .writeXid(2000 + i, ts = i)
      w.writeBeginLoadQuery(200 + i, Array.fill(16)('y'.toByte), ts = i)
        .writeExecuteLoadQuery("shop", sql, 200 + i, s, e, ts = i)
    }
    w.save(dir.resolve("binlog.000001").toString)
    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", "id INT, word STRING")
      .option("maxBytesPerTrigger", "400")
      .load(dir.toString)
      .writeStream.format("memory").queryName("sbr_load_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sbr_load_mem").selectExpr("id", "xid").collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      // every row txn arrives exactly once, each with ITS OWN xid — a
      // batch boundary parked mid-txn would strip or misattribute one
      assert(rows.toSet == (0 until 20).map(i => (i, 2000L + i)).toSet)
    } finally q.stop()
  }
}
