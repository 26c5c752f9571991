package graft.binlog

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** MariaDB-shaped logs: rows events share MySQL's v1 ids so row decode is
  * unchanged; the MariaDB-specific block (160-163) must be legible —
  * ANNOTATE_ROWS (their ROWS_QUERY) feeds `attachRowsQuery`, the GTID
  * framing events pass through NAMED (never as EVENT_<n>, and never
  * mistaken for rows-carrying formats that must fail).
  */
class MariaDbShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(20))

  private def mariaLog(): String = {
    val dir = Files.createTempDirectory("maria")
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1, serverVersion = "10.6.16-MariaDB-log")
      .writeMariaGtidList(Nil, ts = 1)
      .writeBinlogCheckpoint("binlog.000001", ts = 1)
      // group-commit-id variant: the optional 8-byte commit id must be
      // consumed without disturbing the events that follow
      .writeMariaGtid(0L, 5L, commitId = 42L, ts = 2)
      .writeQuery("shop", "BEGIN", ts = 2)
      .writeAnnotateRows("INSERT INTO shop.orders VALUES (1, 10.5, 'ok')", ts = 2)
      .writeTableMap(11, "shop", "orders", cols, ts = 2)
      .writeInsert(11, cols, Seq(Seq(1, new JBigDecimal("10.5000"), "ok")), ts = 2)
      .writeXid(77, ts = 2)
      .save(dir.resolve("binlog.000001").toString)
    dir.toString
  }

  test("rows decode + ANNOTATE_ROWS statement attach on a MariaDB-shaped log") {
    val rows = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .option("attachRowsQuery", "true")
      .load(mariaLog())
      .selectExpr("_delta_type", "xid", "rows_query", "id", "word").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "insert" && rows.head.getLong(1) == 77L)
    assert(rows.head.getString(2) == "INSERT INTO shop.orders VALUES (1, 10.5, 'ok')")
    assert(rows.head.getInt(3) == 1 && rows.head.getString(4) == "ok")
  }

  test("events mode names the MariaDB block and decodes its GTID bodies") {
    val rows = spark.read.format("mysql-binlog").option("mode", "events")
      .load(mariaLog()).selectExpr("event_type", "sql", "gtid", "next_file").collect()
    val names = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names.contains("GTID_EVENT_MARIADB"))
    assert(names.contains("BINLOG_CHECKPOINT_EVENT"))
    assert(names.contains("GTID_LIST_EVENT_MARIADB"))
    assert(names("ANNOTATE_ROWS_EVENT") ==
      "INSERT INTO shop.orders VALUES (1, 10.5, 'ok')")
    val gtids = rows.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(gtids("GTID_EVENT_MARIADB") == "0-1-5") // domain-server-seq
    assert(gtids("GTID_LIST_EVENT_MARIADB") == "") // empty state
    val files = rows.map(r => r.getString(0) -> r.getString(3)).toMap
    assert(files("BINLOG_CHECKPOINT_EVENT") == "binlog.000001") // body decode
  }
}
