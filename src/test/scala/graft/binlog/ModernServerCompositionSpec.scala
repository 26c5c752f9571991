package graft.binlog

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._
import MySqlJsonAst._

/** The round-6 features COMPOSED — the byte stream a stock MySQL >= 8.0.20
  * writes with every modern option on at once: CRC32 checksums, GTID
  * framing, `binlog_transaction_compression=ON` (each txn one zstd
  * TRANSACTION_PAYLOAD), `binlog_row_metadata=FULL` (self-describing
  * TABLE_MAPs inside the payloads: names, signedness, ENUM literals),
  * `binlog_rows_query_log_events=ON`, and
  * `binlog_row_value_options=PARTIAL_JSON` diff updates.
  *
  * One scan, NO user-supplied schema: `useMetadataNames=true` must pull
  * the payload schema out of a TABLE_MAP that itself sits inside a
  * compressed envelope; unsigned widening, ENUM labels and the applied
  * JSON diff all come from the log alone.
  */
class ModernServerCompositionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.enum(3), ColSpec.json)
  private val meta = TableMeta(
    names = Seq("uid", "state", "doc"),
    unsigned = Set(0), // uid is UNSIGNED INT -> LongType, widened values
    defaultCharset = 255,
    enumValues = Seq(Seq("new", "active", "gone")))
  private val doc1 = JObj(Vector(
    "k" -> JInt(1), "tags" -> JArr(Vector(JStr("a")))))

  private def buildLog(): String = {
    val dir = Files.createTempDirectory("modern-all")

    // txn 1: insert (uid near 2^32 proves metadata-driven unsigned decode)
    val t1 = new Writer(rowsV2 = true, nested = true)
    t1.writeQuery("app", "BEGIN", ts = 10)
    t1.writeRowsQuery("INSERT INTO app.items VALUES (...)", ts = 10)
    t1.writeTableMap(7, "app", "items", cols, ts = 10, optMeta = meta)
    t1.writeInsert(7, cols, Seq(Seq[Any](-2 /* 0xFFFFFFFE = 4294967294 */, 2,
      encode(doc1))), ts = 10)
    t1.writeXid(100, ts = 10)

    // txn 2: PARTIAL_JSON update of the same row's doc
    val t2 = new Writer(rowsV2 = true, nested = true)
    t2.writeQuery("app", "BEGIN", ts = 11)
    t2.writeRowsQuery("UPDATE app.items SET doc = JSON_SET(...)", ts = 11)
    t2.writeTableMap(7, "app", "items", cols, ts = 11, optMeta = meta)
    t2.writePartialUpdate(7, cols, Seq(
      (Seq[Any](-2, 2, encode(doc1)),
       Seq[Any](-2, 3, PartialJson(Seq(
         JsonDiff(DiffOp.Replace, "$.k", Some(JInt(2))),
         JsonDiff(DiffOp.Insert, "$.tags[1]", Some(JStr("b")))))))), ts = 11)
    t2.writeXid(101, ts = 11)

    new Writer(checksum = true)
      .writeFormatDescription(ts = 9, serverVersion = "8.0.36-graft-fixture")
      .writePreviousGtids(0, ts = 9)
      .writeGtid(1, ts = 10)
      .writeTransactionPayload(t1.toBytes, compress = true, ts = 10)
      .writeGtid(2, ts = 11)
      .writeTransactionPayload(t2.toBytes, compress = true, ts = 11)
      .save(dir.resolve("binlog.000001").toString)
    dir.toString
  }

  test("one self-describing scan: schema, unsigned, enum labels, applied JSON diff, rows_query") {
    val d = buildLog()
    val df = spark.read.format("mysql-binlog")
      .option("useMetadataNames", "true")
      .option("attachRowsQuery", "true")
      .option("database", "app").option("table", "items")
      .load(d)
    // schema out of the (compressed) log: names + types
    val payload = df.schema.fields.drop(10) // envelope + rows_query
    assert(payload.map(_.name).toSeq == Seq("uid", "state", "doc"))
    assert(payload(0).dataType.typeName == "long") // unsigned INT widens
    assert(payload(1).dataType.typeName == "string") // ENUM w/ literals
    assert(payload(2).dataType.typeName == "string") // JSON -> text

    val rows = df.selectExpr("_delta_type", "xid", "rows_query", "uid", "state", "doc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(rows.map(_._1) == Seq("insert", "update-before", "update"))
    assert(rows.map(_._2) == Seq(100L, 101L, 101L)) // inner XIDs stitched
    assert(rows.head._3.startsWith("INSERT INTO app.items"))
    assert(rows(2)._3.startsWith("UPDATE app.items"))
    assert(rows.forall(_._4 == 4294967294L)) // metadata signedness
    assert(rows.map(_._5) == Seq("active", "active", "gone")) // enum literals
    assert(rows.head._6 == """{"k":1,"tags":["a"]}""")
    assert(rows(2)._6 == """{"k":2,"tags":["a","b"]}""") // diff applied
  }

  test("the same log through the live tailer: committed rows, decoded images") {
    val d = buildLog()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val t = BinlogTailer.start(d, ch => got.add((ch.deltaType, ch.xid.getOrElse(-1L))))
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (got.size < 3 && t.failure.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(5)
      assert(t.failure.isEmpty, s"tailer died: ${t.failure}")
      val seq = got.toArray(new Array[(String, Long)](0)).toSeq
      assert(seq == Seq(("insert", 100L), ("update-before", 101L), ("update", 101L)))
    } finally t.close()
  }
}
