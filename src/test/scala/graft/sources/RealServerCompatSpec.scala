package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog._
import graft.binlog.BinlogWriter._

/** Real-server compatibility fixes from the round-3 source audit: STRING
  * metadata byte order, zero dates, zero-filled tails, events-mode filter
  * semantics, DDL-guard scope, blob stringification, tailer crash
  * rotation.
  */
class RealServerCompatSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("STRING metadata is big-endian on the wire (Field_string layout)") {
    // CHAR(20) must serialize its TABLE_MAP metadata as [0xfe, 0x14] —
    // real_type first — NOT little-endian [0x14, 0xfe]
    val dir = Files.createTempDirectory("char-meta")
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(5, "d", "t", Seq(ColSpec.char(20)))
      .save(dir.resolve("binlog.000001").toString)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // locate the metadata: ... colCount=1, types=[0xfe], metaLen=2, META0, META1
    val i = bytes.sliding(4).indexWhere(w =>
      (w(0) & 0xff) == 1 && (w(1) & 0xff) == 0xfe && (w(2) & 0xff) == 2)
    assert(i >= 0, "table-map layout not found")
    assert((bytes(i + 3) & 0xff) === 0xfe, "metadata byte 0 must be the real type")
    // and the reader decodes it back through the CHAR dance
    val tm = BinlogReader.readBinlog(path).events
      .collectFirst { case t: TableMapEvent => t }.get
    assert(tm.columnMeta(0) === 0xfe14)
  }

  test("CHAR round-trips through the danced metadata, incl. lengths > 255") {
    val cols = Seq(ColSpec.char(20), ColSpec.char(320)) // 320 needs the len-bits fold
    val dir = Files.createTempDirectory("char-rt")
    val long = "x" * 300
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(5, "d", "t", cols)
      .writeInsert(5, cols, Seq(Seq[Any]("hello", long)))
      .save(dir.resolve("binlog.000001").toString)
    val img = BinlogReader.readBinlog(path).events
      .collectFirst { case r: RowsEvent => r.rows.head }.get
    assert(img(0) === "hello")
    assert(img(1) === long)
  }

  test("zero dates decode as null instead of aborting the scan") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.charset.StandardCharsets.ISO_8859_1
    def buf(bytes: Int*) =
      ByteBuffer.wrap(bytes.map(_.toByte).toArray).order(ByteOrder.LITTLE_ENDIAN)
    assert(BinlogReader.readType(buf(0, 0, 0), ColType.Date, 0, ISO_8859_1) == null)
    assert(BinlogReader.readType(buf(0, 0, 0), ColType.NewDate, 0, ISO_8859_1) == null)
    assert(BinlogReader.readType(buf(0, 0, 0, 0, 0, 0, 0, 0), ColType.Datetime, 0, ISO_8859_1) == null)
    // DATETIME2 zero: stored = 0x8000000000
    assert(BinlogReader.readType(buf(0x80, 0, 0, 0, 0), ColType.Datetime2, 0, ISO_8859_1) == null)
    // '2024-00-05' (month 0 under permissive sql_mode) is also null
    val partial = (5L | (0L << 5) | (2024L << 9))
    assert(BinlogReader.readType(
      buf((partial & 0xff).toInt, ((partial >> 8) & 0xff).toInt, ((partial >> 16) & 0xff).toInt),
      ColType.Date, 0, ISO_8859_1) == null)
  }

  test("a zero-filled tail stops the scan instead of looping forever") {
    val dir = Files.createTempDirectory("zero-tail")
    val path = new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "d", "t", Seq(ColSpec.int), ts = 1000)
      .writeInsert(5, Seq(ColSpec.int), Seq(Seq[Any](1)), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    // simulate a crashed server's partial IO_CACHE flush: zero-filled tail
    val f = new java.io.FileOutputStream(path, true)
    try f.write(new Array[Byte](256)) finally f.close()
    val events = BinlogReader.readBinlog(path).events // must terminate
    assert(events.collectFirst { case r: RowsEvent => r.rows }.get === Vector(Vector(1)))
  }

  test("events mode: db filters are applied (by Spark), not silently dropped") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("ev-filter")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "a", "t1", Seq(ColSpec.int), ts = 1000)
      .writeInsert(5, Seq(ColSpec.int), Seq(Seq[Any](1)), ts = 1000)
      .writeTableMap(6, "b", "t2", Seq(ColSpec.int), ts = 1000)
      .writeInsert(6, Seq(ColSpec.int), Seq(Seq[Any](2)), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val filtered = spark.read.format("mysql-binlog").option("mode", "events")
      .load(dir.toString)
      .filter(col("db") === "a")
    assert(filtered.collect().map(_.getAs[String]("db")).toSet === Set("a"))
  }

  test("DDL guard: inert in dynamic mode and in the replay prefix before startOffset") {
    val dir = Files.createTempDirectory("ddl-scope")
    val w = new Writer()
      .writeFormatDescription(ts = 1000)
      .writeQuery("d", "ALTER TABLE d.t ADD COLUMN y INT", ts = 1000)
    val afterDdl = w.position
    w.writeTableMap(5, "d", "t", Seq(ColSpec.int), ts = 1001)
      .writeInsert(5, Seq(ColSpec.int), Seq(Seq[Any](7)), ts = 1001)
      .writeXid(1, ts = 1001)
      .save(dir.resolve("binlog.000001").toString)
    // dynamic (array<string>) mode: TABLE_MAP-driven, DDL cannot invalidate
    val dyn = spark.read.format("mysql-binlog").load(dir.toString).collect()
    assert(dyn.length === 1)
    // typed mode starting AFTER the DDL: the prefix replay must not abort
    val typed = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT")
      .option("startOffset", afterDdl.toString)
      .load(dir.resolve("binlog.000001").toString).collect()
    assert(typed.length === 1)
    // typed mode from the start still fails loudly on the DDL
    val ex = intercept[Exception] {
      spark.read.format("mysql-binlog")
        .option("payloadDdl", "id INT")
        .load(dir.toString).collect()
    }
    assert(ex.getMessage.contains("schema change") ||
      ex.getCause != null && ex.getCause.getMessage.contains("schema change"))
  }

  test("dynamic mode decodes BOTH schema generations across a mid-log ALTER") {
    // a table's column count changes mid-log (ALTER TABLE ADD COLUMN): in
    // dynamic (positional array<string>) mode every rows event decodes
    // against its OWN TABLE_MAP, so the scan returns the narrow rows
    // before the ALTER and the wide rows after it — the self-describing
    // path a user is told to use when payloadDdl no longer applies
    val dir = Files.createTempDirectory("schema-drift")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "d", "t", Seq(ColSpec.int), ts = 1000)
      .writeInsert(5, Seq(ColSpec.int), Seq(Seq[Any](7)), ts = 1000)
      .writeXid(1, ts = 1000)
      .writeQuery("d", "ALTER TABLE d.t ADD COLUMN y INT", ts = 1001)
      .writeTableMap(6, "d", "t", Seq(ColSpec.int, ColSpec.int), ts = 1002)
      .writeInsert(6, Seq(ColSpec.int, ColSpec.int), Seq(Seq[Any](8, 80)), ts = 1002)
      .writeXid(2, ts = 1002)
      .save(dir.resolve("binlog.000001").toString)
    val rows = spark.read.format("mysql-binlog").load(dir.toString)
      .orderBy("log_seq").collect()
    assert(rows.length === 2)
    val imgs = rows.map(_.getAs[scala.collection.Seq[String]]("row"))
    assert(imgs(0).toSeq === Seq("7"), "pre-ALTER generation must keep its width")
    assert(imgs(1).toSeq === Seq("8", "80"), "post-ALTER generation must widen")
  }

  test("dynamic mode stringifies binary values as hex, not JVM identity") {
    val cols = Seq(ColSpec.int, ColSpec.blob(2))
    val dir = Files.createTempDirectory("blob-hex")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](1, Array[Byte](0x0a, 0x00, -1))), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val row = spark.read.format("mysql-binlog").load(dir.toString)
      .head().getAs[scala.collection.Seq[String]]("row")
    assert(row(1) === "0a00ff")
  }

  test("tailer crosses a crash rotation (new file, no ROTATE in the old one)") {
    val dir = Files.createTempDirectory("crash-rotate")
    val cols = Seq(ColSpec.int)
    // file 1 ends WITHOUT a rotate event — the crash shape
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](1)), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val t = BinlogTailer.start(dir.toString,
      ch => got.add(ch.row(0).asInstanceOf[Int]), pollMs = 50)
    try {
      val deadline = System.nanoTime() + 15000000000L
      while (got.size < 1 && System.nanoTime() < deadline) Thread.sleep(5)
      assert(got.toArray.toSeq === Seq(1))
      // restart wrote a NEW file; the old one never got its ROTATE
      new Writer()
        .writeFormatDescription(ts = 2000)
        .writeTableMap(5, "d", "t", cols, ts = 2000)
        .writeInsert(5, cols, Seq(Seq[Any](2)), ts = 2000)
        .writeXid(2, ts = 2000)
        .save(dir.resolve("binlog.000002").toString)
      while (got.size < 2 && System.nanoTime() < deadline) Thread.sleep(5)
      assert(got.toArray.toSeq === Seq(1, 2), "tailer stalled on the crash-rotated file")
    } finally t.close()
  }

  test("crash rotation drops the crash-torn transaction (InnoDB rolls it back)") {
    val dir = Files.createTempDirectory("crash-phantom")
    val cols = Seq(ColSpec.int)
    // file 1: one COMMITTED txn, then a txn whose XID never made it to disk
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](1)), ts = 1000)
      .writeXid(1, ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1001)
      .writeInsert(5, cols, Seq(Seq[Any](99)), ts = 1001) // crash-torn: no XID
      .save(dir.resolve("binlog.000001").toString)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val t = BinlogTailer.start(dir.toString,
      ch => got.add(ch.row(0).asInstanceOf[Int]), pollMs = 50)
    try {
      val deadline = System.nanoTime() + 15000000000L
      while (got.size < 1 && System.nanoTime() < deadline) Thread.sleep(5)
      // restart opened file 2: recovery rolled back the torn txn, so row 99
      // must NEVER surface — only the committed rows on either side
      new Writer()
        .writeFormatDescription(ts = 2000)
        .writeTableMap(5, "d", "t", cols, ts = 2000)
        .writeInsert(5, cols, Seq(Seq[Any](2)), ts = 2000)
        .writeXid(2, ts = 2000)
        .save(dir.resolve("binlog.000002").toString)
      while (got.size < 2 && System.nanoTime() < deadline) Thread.sleep(5)
      assert(got.toArray.toSeq === Seq(1, 2),
        "crash-torn transaction leaked phantom rows (or tailer stalled)")
    } finally t.close()
  }

  test("tailer fails loudly when its current file is purged") {
    val dir = Files.createTempDirectory("purged-tail")
    val cols = Seq(ColSpec.int)
    val f1 = dir.resolve("binlog.000001")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, Seq(Seq[Any](1)), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(f1.toString)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val t = BinlogTailer.start(dir.toString,
      ch => got.add(ch.row(0).asInstanceOf[Int]), pollMs = 50)
    try {
      val deadline = System.nanoTime() + 15000000000L
      while (got.size < 1 && System.nanoTime() < deadline) Thread.sleep(5)
      assert(got.toArray.toSeq === Seq(1))
      Files.delete(f1) // PURGE BINARY LOGS under a live tail
      while (t.failure.isEmpty && System.nanoTime() < deadline) Thread.sleep(5)
      assert(t.failure.isDefined, "purged current file must surface an error, not stall")
      assert(t.failure.get.getMessage.contains("binlog.000001"))
      assert(!t.isAlive)
    } finally t.close()
  }
}
