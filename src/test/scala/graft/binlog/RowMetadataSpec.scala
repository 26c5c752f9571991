package graft.binlog

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** TABLE_MAP optional metadata (`binlog_row_metadata`, MySQL 8.0 WL#4618):
  * the TLV block that makes the log self-describing — column NAMES,
  * signedness and per-column charsets, the exact schema information the
  * reference laments is absent from the log (`mysql_binlog.clj:505-508`).
  *
  * Pinned here: TLV round-trip through writer+reader; metadata OVERRIDES
  * reader-side defaults (scan charset, `unsignedColumns`) — the server
  * that wrote the log is authoritative; ENUM literals decode without user
  * dictionaries; the DSv2 `useMetadataNames` mode derives the payload
  * schema (names + types) from the log alone.
  */
class RowMetadataSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpLog(): java.nio.file.Path =
    Files.createTempDirectory("row-meta").resolve("binlog.000001")

  test("TLV round-trip: names, signedness, default charset + overrides, enum/set literals, pk") {
    val cols = Seq(ColSpec.int, ColSpec.varchar(40), ColSpec.varchar(40),
      ColSpec.enum(3), ColSpec.set(2), ColSpec.decimal(10, 2))
    val meta = TableMeta(
      names = Seq("uid", "name_latin1", "name_utf8", "state", "flags", "amount"),
      unsigned = Set(0),
      defaultCharset = 8, // latin1_swedish_ci
      charsetOverrides = Map(2 -> 255), // name_utf8 -> utf8mb4_0900_ai_ci
      enumValues = Seq(Seq("new", "active", "gone")),
      setValues = Seq(Seq("a", "b")),
      primaryKey = Seq(0))
    val p = tmpLog()
    new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols, optMeta = meta)
      .save(p.toString)
    val tm = BinlogReader.readBinlog(p.toString).events
      .collectFirst { case t: TableMapEvent => t }.get
    val om = tm.optionalMeta.getOrElse(fail("optional metadata absent"))
    assert(om.names.toSeq == meta.names)
    assert(om.signedness.toSeq == Seq(true, false, false, false, false, false))
    // charsets re-indexed to FULL column position; non-character cols stay 0
    assert(om.charsets.toSeq == Seq(0, 8, 255, 0, 0, 0))
    assert(om.enumSetValues(3).toSeq == Seq("new", "active", "gone"))
    assert(om.enumSetValues(4).toSeq == Seq("a", "b"))
    assert(om.primaryKey.toSeq == Seq(0))
  }

  test("a TABLE_MAP without the TLV block still decodes (optionalMeta = None)") {
    // writer emits the real-server layout (null bitmap, no TLV)
    val cols = Seq(ColSpec.int, ColSpec.varchar(10))
    val p = tmpLog()
    new Writer()
      .writeFormatDescription()
      .writeTableMap(5, "d", "t", cols)
      .writeInsert(5, cols, Seq(Seq(7, "x")))
      .save(p.toString)
    val sr = BinlogReader.readBinlog(p.toString)
    val tm = sr.events.collectFirst { case t: TableMapEvent => t }.get
    assert(tm.optionalMeta.isEmpty)
    assert(sr.events.collectFirst { case r: RowsEvent => r }.get.rows.head(0) == 7)
  }

  test("reference-era TABLE_MAP (nothing after the metadata array) still decodes") {
    // the 2010 layout the reference reads (`mysql_binlog.clj:500-523`):
    // event body ENDS at the metadata block — no null bitmap, no TLV.
    // Hand-assembled so the writer (which now emits the modern layout)
    // is not in the loop.
    val body = new java.io.ByteArrayOutputStream()
    def le(n: Int, v: Long): Unit =
      (0 until n).foreach(i => body.write(((v >> (i * 8)) & 0xff).toInt))
    le(6, 5) // table id
    le(2, 0) // flags
    body.write(1); body.write('d'.toInt); body.write(0) // db "d" + NUL
    body.write(1); body.write('t'.toInt); body.write(0) // table "t" + NUL
    body.write(2) // packed column count
    body.write(ColType.Long); body.write(ColType.Varchar) // types
    body.write(2) // packed metadata length
    le(2, 20) // VARCHAR(20) max-len metadata (LE)
    // ... and nothing else: reference-era end of event
    val hdr = new java.io.ByteArrayOutputStream()
    val evLen = 19L + body.size()
    def hle(n: Int, v: Long): Unit =
      (0 until n).foreach(i => hdr.write(((v >> (i * 8)) & 0xff).toInt))
    hle(4, 1000); hdr.write(EventType.TableMap); hle(4, 1)
    hle(4, evLen); hle(4, 4 + evLen); hle(2, 0)
    val h = BinlogReader.readEventHeader(
      java.nio.ByteBuffer.wrap(hdr.toByteArray ++ body.toByteArray ++ new Array[Byte](4))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).position(0).asInstanceOf[java.nio.ByteBuffer],
      0L).get
    val buf = java.nio.ByteBuffer.wrap(hdr.toByteArray ++ body.toByteArray)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val tm = BinlogReader.readTableMap(buf, h, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(tm.dbName == "d" && tm.tableName == "t")
    assert(tm.columnTypes.toSeq == Seq(ColType.Long, ColType.Varchar))
    assert(tm.columnMeta.toSeq == Seq(0, 20))
    assert(tm.optionalMeta.isEmpty)
  }

  test("signedness metadata overrides the unsignedColumns option (metadata wins)") {
    val cols = Seq(ColSpec.int, ColSpec.int)
    val p = tmpLog()
    new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols,
        optMeta = TableMeta(names = Seq("a", "b"), unsigned = Set(1)))
      .writeInsert(9, cols, Seq(Seq(-1, -1)))
      .save(p.toString)
    // unsignedColumns claims BOTH columns unsigned; the log's SIGNEDNESS
    // says only b is — the log wins on both columns
    val rows = spark.read.format("mysql-binlog")
      .option("payloadDdl", "a INT, b LONG")
      .option("unsignedColumns", "a,b")
      .load(p.toString)
      .selectExpr("a", "b").collect()
    assert(rows.head.getInt(0) == -1) // a: signed per metadata
    assert(rows.head.getLong(1) == 4294967295L) // b: unsigned per metadata
  }

  test("per-column charset from metadata overrides the scan charset") {
    // 'café' in latin1 (byte e9) in col 1; '数据' in utf8mb4 in col 2 —
    // one row can only decode correctly with PER-COLUMN charsets. The scan
    // charset is deliberately wrong (utf8) for the latin1 column.
    val latin1Bytes = "café".getBytes(StandardCharsets.ISO_8859_1)
    val utf8Bytes = "数据".getBytes(StandardCharsets.UTF_8)
    val cols = Seq(ColSpec.varchar(20), ColSpec.varchar(20))
    val p = tmpLog()
    // write raw bytes: use latin1 writer charset so bytes pass through
    // for col 1; col 2's utf8 bytes round-trip via latin1 byte-identity
    new Writer(charset = StandardCharsets.ISO_8859_1)
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols,
        optMeta = TableMeta(names = Seq("l1", "u8"), defaultCharset = 8,
          charsetOverrides = Map(1 -> 255)))
      .writeInsert(9, cols, Seq(Seq(
        new String(latin1Bytes, StandardCharsets.ISO_8859_1),
        new String(utf8Bytes, StandardCharsets.ISO_8859_1))))
      .save(p.toString)
    val row = spark.read.format("mysql-binlog")
      .option("payloadDdl", "l1 STRING, u8 STRING")
      .option("charset", "UTF-8") // wrong for l1; metadata must rescue it
      .load(p.toString)
      .selectExpr("l1", "u8").collect().head
    assert(row.getString(0) == "café")
    assert(row.getString(1) == "数据")
  }

  test("columnCharsets option covers metadata-less logs; metadata still wins when present") {
    val latin1Bytes = "café".getBytes(StandardCharsets.ISO_8859_1)
    val cols = Seq(ColSpec.varchar(20), ColSpec.varchar(20))
    val p = tmpLog()
    new Writer(charset = StandardCharsets.ISO_8859_1)
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols) // NO optional metadata
      .writeInsert(9, cols, Seq(Seq(
        new String(latin1Bytes, StandardCharsets.ISO_8859_1),
        new String("数据".getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1))))
      .save(p.toString)
    val row = spark.read.format("mysql-binlog")
      .option("payloadDdl", "l1 STRING, u8 STRING")
      .option("columnCharsets", "l1:ISO-8859-1;u8:UTF-8")
      .load(p.toString)
      .selectExpr("l1", "u8").collect().head
    assert(row.getString(0) == "café")
    assert(row.getString(1) == "数据")
  }

  test("ENUM/SET literals from metadata decode without user dictionaries") {
    val cols = Seq(ColSpec.int, ColSpec.enum(3), ColSpec.set(3))
    val p = tmpLog()
    new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols,
        optMeta = TableMeta(names = Seq("id", "state", "flags"),
          enumValues = Seq(Seq("new", "active", "gone")),
          setValues = Seq(Seq("x", "y", "z"))))
      .writeInsert(9, cols, Seq(Seq(1, 2, 5L))) // enum ordinal 2; set bits 101
      .save(p.toString)
    val row = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, state STRING, flags ARRAY<STRING>")
      .load(p.toString)
      .selectExpr("state", "flags").collect().head
    assert(row.getString(0) == "active")
    assert(row.getSeq[String](1) == Seq("x", "z"))
  }

  test("useMetadataNames: schema (names + types) comes from the log alone") {
    val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(50))
    val p = tmpLog()
    new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "bench", "big", cols,
        optMeta = TableMeta(names = Seq("id", "val", "word"), unsigned = Set(0),
          defaultCharset = 8))
      .writeInsert(9, cols, Seq(Seq(1, new java.math.BigDecimal("12.5000"), "w")))
      .writeXid(77)
      .save(p.toString)
    val df = spark.read.format("mysql-binlog")
      .option("useMetadataNames", "true")
      .option("database", "bench").option("table", "big")
      .load(p.toString)
    val payload = df.schema.fields.drop(9) // after the fixed envelope
    assert(payload.map(_.name).toSeq == Seq("id", "val", "word"))
    assert(payload(0).dataType.typeName == "long") // unsigned INT widens
    assert(payload(1).dataType.typeName == "decimal(12,4)")
    assert(payload(2).dataType.typeName == "string")
    val r = df.selectExpr("id", "CAST(val AS STRING)", "word").collect().head
    assert(r.getLong(0) == 1L && r.getString(1) == "12.5000" && r.getString(2) == "w")
  }

  test("useMetadataNames streams too: micro-batch source with the log-derived schema") {
    val cols = Seq(ColSpec.int, ColSpec.varchar(20))
    val dir = Files.createTempDirectory("row-meta-stream")
    val f = dir.resolve("binlog.000001").toString
    val w = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription()
      .writeQuery("d", "BEGIN")
      .writeTableMap(9, "d", "t", cols,
        optMeta = TableMeta(names = Seq("k", "v"), defaultCharset = 8))
      .writeInsert(9, cols, Seq(Seq(1, "seed")))
      .writeXid(5)
    w.save(f)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val q = spark.readStream.format("mysql-binlog")
      .option("useMetadataNames", "true")
      .load(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // select BY METADATA NAME — fails analysis if the schema drifted
        b.selectExpr("k", "v").collect().foreach(r => got.add((r.getInt(0), r.getString(1))))
      }
      .start()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (got.size < 1 && System.nanoTime() < deadline) Thread.sleep(10)
      // live append decodes through the same metadata-driven policy
      w.writeQuery("d", "BEGIN")
        .writeTableMap(9, "d", "t", cols,
          optMeta = TableMeta(names = Seq("k", "v"), defaultCharset = 8))
        .writeInsert(9, cols, Seq(Seq(2, "live")))
        .writeXid(6)
        .save(f)
      while (got.size < 2 && System.nanoTime() < deadline) Thread.sleep(10)
      val seq = got.toArray(new Array[(Int, String)](0)).toSeq.sortBy(_._1)
      assert(seq == Seq((1, "seed"), (2, "live")), seq.toString)
    } finally q.stop()
  }

  test("useMetadataNames on a metadata-less log fails loudly") {
    val cols = Seq(ColSpec.int)
    val p = tmpLog()
    new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols)
      .writeInsert(9, cols, Seq(Seq(1)))
      .save(p.toString)
    val e = intercept[Exception] {
      spark.read.format("mysql-binlog")
        .option("useMetadataNames", "true")
        .load(p.toString).collect()
    }
    assert(e.getMessage.contains("binlog_row_metadata"), e.getMessage)
  }

  test("events mode surfaces the log's own column names on TABLE_MAP rows") {
    val cols = Seq(ColSpec.int, ColSpec.varchar(10))
    val p = tmpLog()
    new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols,
        optMeta = TableMeta(names = Seq("k", "v"), defaultCharset = 8))
      .writeInsert(9, cols, Seq(Seq(1, "x")))
      .writeTableMap(10, "d", "bare", cols) // no metadata: col_names null
      .writeInsert(10, cols, Seq(Seq(2, "y")))
      .save(p.toString)
    val tms = spark.read.format("mysql-binlog").option("mode", "events")
      .load(p.toString)
      .filter("event_type = 'TABLE_MAP_EVENT'")
      .selectExpr("`table`", "col_names").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tms("t") == "k,v")
    assert(tms("bare") == null)
  }

  test("checksummed log: TLV block decodes cleanly past the CRC trailer") {
    val cols = Seq(ColSpec.int, ColSpec.varchar(10))
    val p = tmpLog()
    new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols,
        optMeta = TableMeta(names = Seq("a", "b"), defaultCharset = 8))
      .writeInsert(9, cols, Seq(Seq(3, "ok")))
      .writeXid(5)
      .save(p.toString)
    val tm = BinlogReader.readBinlog(p.toString).events
      .collectFirst { case t: TableMapEvent => t }.get
    assert(tm.optionalMeta.get.names.toSeq == Seq("a", "b"))
    val rows = spark.read.format("mysql-binlog")
      .option("useMetadataNames", "true")
      .load(p.toString).selectExpr("a", "b").collect()
    assert(rows.head.getInt(0) == 3 && rows.head.getString(1) == "ok")
  }
}
