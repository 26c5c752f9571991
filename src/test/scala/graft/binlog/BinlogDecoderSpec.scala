package graft.binlog

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MySqlDecimalSpec extends AnyFunSuite {

  test("binSize matches the reference dig2bytes table") {
    // decimalBinSize(12,4) = 6+... used in the reference's data-size
    // accounting (`mysql_bench.clj:116-124`): intg=8 -> 4+0? compute:
    assert(MySqlDecimal.binSize(12, 4) === 6)
    assert(MySqlDecimal.binSize(14, 4) === 7)
    assert(MySqlDecimal.binSize(9, 0) === 4)
    assert(MySqlDecimal.binSize(10, 0) === 5)
    assert(MySqlDecimal.binSize(18, 9) === 8)
  }

  test("golden: DECIMAL(14,4) 1234567890.1234 <-> 81 0D FB 38 D2 04 D2") {
    // Documented example from the MySQL internals manual for the packed
    // decimal format (same format the reference ports).
    val bytes = Array(0x81, 0x0D, 0xFB, 0x38, 0xD2, 0x04, 0xD2).map(_.toByte)
    val d = MySqlDecimal.decode(bytes, 0, 14, 4)
    assert(d === new JBigDecimal("1234567890.1234"))
    assert(MySqlDecimal.encode(new JBigDecimal("1234567890.1234"), 14, 4).toSeq === bytes.toSeq)
  }

  test("golden: negative is byte-complement") {
    val pos = MySqlDecimal.encode(new JBigDecimal("1234567890.1234"), 14, 4)
    val neg = MySqlDecimal.encode(new JBigDecimal("-1234567890.1234"), 14, 4)
    // negative = complement of all bytes of the positive encoding
    assert(neg.toSeq === pos.map(b => (~b).toByte).toSeq)
    assert(MySqlDecimal.decode(neg, 0, 14, 4) === new JBigDecimal("-1234567890.1234"))
  }

  test("zero and small values") {
    for (s <- Seq("0.0000", "0.0001", "-0.0001", "1.0000", "-1.0000", "99999999.9999")) {
      val d = new JBigDecimal(s)
      assert(MySqlDecimal.decode(MySqlDecimal.encode(d, 12, 4), 0, 12, 4) === d, s)
    }
  }

  test("property: encode/decode round-trip across precisions (500 seeded cases)") {
    val cases = for {
      precision <- Gen.choose(1, 30)
      scale <- Gen.choose(0, precision)
      unscaled <- Gen.choose(0L, math.min(Long.MaxValue, math.pow(10, math.min(precision, 17)).toLong - 1))
      neg <- Gen.oneOf(true, false)
    } yield (precision, scale, if (neg) -unscaled else unscaled)
    var seed = Seed(42L)
    var checked = 0
    var i = 0
    while (i < 500) {
      cases.apply(Gen.Parameters.default, seed).foreach { case (p, s, u) =>
        val d = new JBigDecimal(java.math.BigInteger.valueOf(u), s)
        if (d.precision - d.scale <= p - s) {
          val rt = MySqlDecimal.decode(MySqlDecimal.encode(d, p, s), 0, p, s)
          assert(rt.compareTo(d) === 0, s"$d (p=$p s=$s) -> $rt")
          checked += 1
        }
      }
      seed = seed.next
      i += 1
    }
    assert(checked > 200) // most sampled cases must actually fit and round-trip
  }
}

class BinlogDecoderSpec extends AnyFunSuite {
  import BinlogWriter._

  private val fooAutoCols = Seq(ColSpec.int, ColSpec.varchar(50))
  private val benchBigCols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(50))

  private def tmp(name: String): String =
    Files.createTempDirectory("binlog-spec").resolve(name).toString

  private def insertFixture: Writer =
    new Writer()
      .writeFormatDescription(ts = 100)
      .writeQuery("foo", "BEGIN", ts = 100)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 100)
      .writeInsert(23, fooAutoCols, Seq(Seq(1, "hello"), Seq(2, "in ordnung"), Seq(3, null)), ts = 100)
      .writeXid(777, ts = 101)

  test("insert fixture decodes: FDE, QUERY, TABLE_MAP, WRITE_ROWS, XID") {
    val path = insertFixture.save(tmp("insert_only.bin"))
    assert(BinlogReader.isBinlogFile(path))
    val res = BinlogReader.readBinlog(path)
    val types = res.events.map(_.header.eventType)
    assert(types === Vector(EventType.FormatDescription, EventType.Query,
      EventType.TableMap, EventType.WriteRows, EventType.Xid))
    val q = res.events(1).asInstanceOf[QueryEvent]
    assert(q.sql === "BEGIN" && q.defaultDb === "foo")
    val tm = res.events(2).asInstanceOf[TableMapEvent]
    assert(tm.dbName === "foo" && tm.tableName === "auto" && tm.tableId === 23)
    assert(tm.columnTypes.toSeq === Seq(ColType.Long, ColType.Varchar))
    val rows = res.events(3).asInstanceOf[RowsEvent]
    assert(rows.rows === Vector(Vector(1, "hello"), Vector(2, "in ordnung"), Vector(3, null)))
    assert(res.events(4).asInstanceOf[XidEvent].xid === 777)
    assert(res.rotate.isEmpty)
  }

  test("update decodes before/after pairs; delete single image (bench.big types)") {
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(42, "bench", "big", benchBigCols)
      .writeUpdate(42, benchBigCols, Seq(
        (Seq(1, new JBigDecimal("12345678.9999"), "before"),
         Seq(1, new JBigDecimal("-0.0001"), "after"))))
      .writeDelete(42, benchBigCols, Seq(Seq(2, new JBigDecimal("1.0000"), "gone")))
      .writeXid(1)
      .save(tmp("update_delete.bin"))
    val res = BinlogReader.readBinlog(path)
    val upd = res.events(2).asInstanceOf[RowsEvent]
    assert(upd.isUpdate)
    assert(upd.rows.head === Vector(1, new JBigDecimal("12345678.9999"), "before"))
    assert(upd.afterRows.head === Vector(1, new JBigDecimal("-0.0001"), "after"))
    val del = res.events(3).asInstanceOf[RowsEvent]
    assert(del.rows.head === Vector(2, new JBigDecimal("1.0000"), "gone"))
    assert(del.afterRows.isEmpty)
  }

  test("the 4-event single-row-update invariant (mysql_bench.clj:247-257)") {
    // one single-row update = QUERY, TABLE_MAP, UPDATE_ROWS, XID
    val path = new Writer()
      .writeFormatDescription()
      .writeQuery("bench", "BEGIN")
      .writeTableMap(42, "bench", "big", benchBigCols)
      .writeUpdate(42, benchBigCols, Seq((Seq(1, new JBigDecimal("1.0000"), "x"),
        Seq(1, new JBigDecimal("2.0000"), "y"))))
      .writeXid(99)
      .save(tmp("single_update.bin"))
    val res = BinlogReader.readBinlog(path)
    val delta = res.events.drop(1) // skip FDE
    assert(delta.map(e => EventType.name(e.header.eventType)) ===
      Vector("QUERY_EVENT", "TABLE_MAP_EVENT", "UPDATE_ROWS_EVENT", "XID_EVENT"))
  }

  test("torn tail: incomplete final event is not emitted; complete file re-emits it") {
    val w = insertFixture
    val full = w.save(tmp("full.bin"))
    val torn = w.saveTruncated(tmp("torn.bin"), 5)
    val fullRes = BinlogReader.readBinlog(full)
    val tornRes = BinlogReader.readBinlog(torn)
    assert(fullRes.events.length === 5)
    assert(tornRes.events.length === 4) // XID dropped: incomplete on disk
    // offset semantics: resume from the last complete event's end re-reads
    // only the now-complete event
    val resumeAt = tornRes.events.last.header.offset + tornRes.events.last.header.eventLen
    val resumed = BinlogReader.readBinlog(full, resumeAt, tornRes.tableMaps)
    assert(resumed.events.map(_.header.eventType) === Vector(EventType.Xid))
  }

  test("rotation: scan stops at ROTATE and reports next file") {
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(23, "foo", "auto", fooAutoCols)
      .writeInsert(23, fooAutoCols, Seq(Seq(1, "a")))
      .writeXid(1)
      .writeRotate("binlog.000002")
      .save(tmp("rotate.bin"))
    val res = BinlogReader.readBinlog(path)
    assert(res.rotate.map(_.nextFile) === Some("binlog.000002"))
  }

  test("null bitmap and unused columns") {
    // row with null in a middle column
    val cols = Seq(ColSpec.int, ColSpec.varchar(20), ColSpec.decimal(10, 2))
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(7, "d", "t", cols)
      .writeInsert(7, cols, Seq(Seq(5, null, new JBigDecimal("3.14")), Seq(null, "x", null)))
      .save(tmp("nulls.bin"))
    val rows = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent].rows
    assert(rows(0) === Vector(5, null, new JBigDecimal("3.14")))
    assert(rows(1) === Vector(null, "x", null))
  }

  test("partial row images: unused columns yield the Unused placeholder") {
    // binlog_row_image=MINIMAL shape: image carries only columns 0 and 2
    val cols = Seq(ColSpec.int, ColSpec.varchar(20), ColSpec.decimal(10, 2))
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(7, "d", "t", cols)
      .writeInsertMasked(7, cols, Seq(true, false, true),
        Seq(Seq(5, new JBigDecimal("3.14")), Seq(null, null)))
      .save(tmp("partial.bin"))
    val rows = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent].rows
    assert(rows(0) === Vector(5, RowImage.Unused, new JBigDecimal("3.14")))
    assert(rows(1) === Vector(null, RowImage.Unused, null))
  }

  test("MINIMAL-image update: distinct before/after masks decode independently") {
    // real binlog_row_image=MINIMAL updates log the PK in the before image
    // and only the CHANGED columns in the after image — the two bitmaps
    // differ and each image's null bitmap covers its own used count
    val cols = Seq(ColSpec.int, ColSpec.varchar(20), ColSpec.decimal(10, 2))
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(7, "d", "t", cols)
      .writeUpdateMasked(7, cols,
        beforeMask = Seq(true, false, false), // PK only
        afterMask = Seq(false, true, true),   // the changed columns
        rows = Seq((Seq(42), Seq("renamed", new JBigDecimal("9.50"))),
                   (Seq(43), Seq(null, null)))) // changed-to-NULL
      .save(tmp("minimal-update.bin"))
    val re = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent]
    assert(re.isUpdate)
    assert(re.rows(0) === Vector(42, RowImage.Unused, RowImage.Unused))
    assert(re.afterRows(0) === Vector(RowImage.Unused, "renamed", new JBigDecimal("9.50")))
    assert(re.rows(1) === Vector(43, RowImage.Unused, RowImage.Unused))
    assert(re.afterRows(1) === Vector(RowImage.Unused, null, null))
  }

  test("wide table (300 columns): packed-int column count + wide bitmaps") {
    // column-count > 250 forces the 252/2-byte packed integer encoding
    // (`mysql_binlog.clj:193-211`) and 38-byte used/null bitfields
    val cols = Seq.tabulate(300)(i => if (i % 2 == 0) ColSpec.int else ColSpec.varchar(10))
    val row: Seq[Any] = Seq.tabulate(300)(i =>
      if (i % 3 == 2) null else if (i % 2 == 0) i else s"v$i")
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "wide", "t", cols)
      .writeInsert(9, cols, Seq(row))
      .save(tmp("wide.bin"))
    val res = BinlogReader.readBinlog(path)
    val tm = res.events(1).asInstanceOf[TableMapEvent]
    assert(tm.columnTypes.length === 300)
    val img = res.events(2).asInstanceOf[RowsEvent].rows.head
    assert(img.length === 300)
    (0 until 300).foreach { i =>
      val expected = if (i % 3 == 2) null else if (i % 2 == 0) i else s"v$i"
      assert(img(i) === expected, s"col $i")
    }
  }

  test("packed int boundaries") {
    import java.nio.ByteBuffer
    def buf(bytes: Int*) = {
      val b = ByteBuffer.wrap(bytes.map(_.toByte).toArray)
      b.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    }
    assert(BinlogReader.packedInt(buf(0)) === 0L)
    assert(BinlogReader.packedInt(buf(250)) === 250L)
    assert(BinlogReader.packedInt(buf(252, 0xff, 0xff)) === 65535L)
    assert(BinlogReader.packedInt(buf(253, 1, 0, 1)) === 65537L)
    assert(BinlogReader.packedInt(buf(254, 1, 0, 0, 0, 0, 0, 0, 0)) === 1L)
    intercept[IllegalArgumentException](BinlogReader.packedInt(buf(251)))
  }

  test("latin1 charset default preserves high bytes (mysql_binlog.clj:537-544)") {
    val cols = Seq(ColSpec.varchar(10))
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(1, "d", "t", cols)
      .writeInsert(1, cols, Seq(Seq("für"))) // ü is latin1 0xFC
      .save(tmp("latin1.bin"))
    val rows = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent].rows
    assert(rows.head.head === "für")
  }

  test("index file: last line is active log (mysql_binlog.clj:813-817)") {
    val dir = Files.createTempDirectory("idx")
    val idx = dir.resolve("binlog-files.index")
    Files.writeString(idx, "binlog.000001\nbinlog.000002\nbinlog.000003\n")
    val files = BinlogReader.binlogFilesFromIndex(idx.toString)
    assert(files.last === "binlog.000003" && files.length === 3)
  }

  test("file ordering survives the 999999 -> 1000000 extension rollover") {
    import BinlogReader.fileOrdinal
    assert(fileOrdinal("binlog.000001") === 1L)
    assert(fileOrdinal("/a/b/binlog.999999") === 999999L)
    assert(fileOrdinal("binlog.1000000") === 1000000L)
    assert(fileOrdinal("binlog.index") === -1L)
    // directory discovery orders numerically, not lexicographically
    val dir = Files.createTempDirectory("rollover")
    for (n <- Seq("binlog.999999", "binlog.1000000"))
      Files.write(dir.resolve(n), BinlogReader.Magic)
    val resolved = graft.sources.BinlogSchemas.resolveFiles(dir.toString)
      .map(p => new java.io.File(p).getName)
    assert(resolved === Vector("binlog.999999", "binlog.1000000"))
  }

  test("TxnBoundary classifies QUERY statements (one shared definition)") {
    import TxnBoundary._
    assert(classify("BEGIN") === Begin)
    assert(classify("begin") === Begin)
    assert(classify("XA START 'x1'") === Begin)
    assert(classify("COMMIT") === Commit)
    assert(classify(" commit ") === Commit)
    assert(classify("ROLLBACK") === Commit) // mixed-engine: logged rows applied
    assert(classify("XA COMMIT 'x1'") === Commit)
    assert(classify("XA ROLLBACK 'x1'") === Commit)
    assert(classify("SAVEPOINT s1") === IntraTxn)
    assert(classify("savepoint `s1`") === IntraTxn)
    assert(classify("ROLLBACK TO SAVEPOINT s1") === IntraTxn)
    assert(classify("RELEASE SAVEPOINT s1") === IntraTxn)
    assert(classify("XA END 'x1'") === IntraTxn)
    assert(classify("XA PREPARE 'x1'") === IntraTxn)
    assert(classify("CREATE TABLE t (i INT)") === ImplicitCommit)
    assert(classify("ALTER TABLE t ADD c INT") === ImplicitCommit)
    assert(!closes("BEGIN") && !closes("SAVEPOINT a"))
    assert(closes("COMMIT") && closes("DROP TABLE t"))
  }
}
