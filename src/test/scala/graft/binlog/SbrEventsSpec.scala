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
}
