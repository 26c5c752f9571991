package graft.binlog

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import BinlogWriter._

/** ROWS_EVENT v2 (ids 30-32 — what every server >= 5.6.2 writes) and the
  * GTID framing (33/34/35) of a modern binlog, plus the loud-failure guard
  * for rows-carrying formats with no decode path.
  */
class V2RowsAndGtidSpec extends AnyFunSuite {

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(20))
  private val rows = Seq(
    Seq[Any](1, new JBigDecimal("1.5000"), "a"),
    Seq[Any](2, new JBigDecimal("2.5000"), "b"))

  private def writeLog(v2: Boolean, checksum: Boolean): String = {
    val dir = Files.createTempDirectory(s"v2rows-$v2-$checksum")
    new Writer(checksum = checksum, rowsV2 = v2)
      .writeFormatDescription(ts = 1000,
        serverVersion = if (v2 || checksum) "8.0.36-graft-fixture" else "")
      .writeQuery("d", "BEGIN", ts = 1000)
      .writeTableMap(5, "d", "t", cols, ts = 1000)
      .writeInsert(5, cols, rows, ts = 1000)
      .writeUpdate(5, cols, Seq(
        (Seq[Any](1, new JBigDecimal("1.5000"), "a"),
         Seq[Any](1, new JBigDecimal("9.2500"), "z"))), ts = 1000)
      .writeDelete(5, cols, Seq(Seq[Any](2, new JBigDecimal("2.5000"), "b")), ts = 1000)
      .writeXid(77, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
  }

  private def images(path: String): Seq[(String, Seq[Any], Seq[Any])] =
    BinlogReader.readBinlog(path).events.collect {
      case re: RowsEvent =>
        (EventType.name(re.header.eventType).replace("_V2", ""),
          re.rows.map(_.toSeq), re.afterRows.map(_.toSeq))
    }.map { case (n, r, a) => (n, r.flatten, a.flatten) }

  test("v2 rows events decode to the same images as v1 (plain and CRC32)") {
    assert(images(writeLog(v2 = true, checksum = false)) ===
      images(writeLog(v2 = false, checksum = false)))
    assert(images(writeLog(v2 = true, checksum = true)) ===
      images(writeLog(v2 = false, checksum = false)))
  }

  test("v2 extra-data bytes beyond the length field are skipped") {
    // hand-assembled WRITE_ROWS_EVENT_V2 with extra_data_len = 5 (3 payload
    // bytes of NDB-style extra info) — the writer never emits this shape
    val dir = Files.createTempDirectory("v2extra")
    val pre = new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(5, "d", "t", Seq(ColSpec.int), ts = 1000)
    val body = new ByteArrayOutputStream()
    def le(n: Int, v: Long): Unit =
      (0 until n).foreach(i => body.write(((v >> (i * 8)) & 0xff).toInt))
    le(6, 5)       // table id
    le(2, 0)       // flags
    le(2, 5)       // extra_data_len (self-inclusive)
    body.write(0xAA); body.write(0xBB); body.write(0xCC) // extra payload
    body.write(1)    // packed col count
    body.write(0x01) // used-columns bitmap
    body.write(0x00) // null bitmap
    le(4, 42)        // the int value
    val b = body.toByteArray
    val header = new ByteArrayOutputStream()
    def hle(n: Int, v: Long): Unit =
      (0 until n).foreach(i => header.write(((v >> (i * 8)) & 0xff).toInt))
    hle(4, 1000)                         // timestamp
    header.write(EventType.WriteRowsV2)  // type 30
    hle(4, 1)                            // server id
    hle(4, 19L + b.length)               // event len
    hle(4, pre.position + 19L + b.length) // next pos
    hle(2, 0)                            // flags
    val path = dir.resolve("binlog.000001").toString
    val f = new FileOutputStream(path)
    try { f.write(pre.toBytes); f.write(header.toByteArray); f.write(b) }
    finally f.close()
    val re = BinlogReader.readBinlog(path).events.collectFirst { case r: RowsEvent => r }.get
    assert(re.rows === Vector(Vector(42)))
  }

  test("GTID framing decodes: named events, gtid text, PREVIOUS_GTIDS set") {
    val dir = Files.createTempDirectory("gtid")
    val path = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
      .writePreviousGtids(41, ts = 1000)
      .writeGtid(42, ts = 1000)
      .writeQuery("d", "BEGIN", ts = 1000)
      .writeTableMap(5, "d", "t", Seq(ColSpec.int), ts = 1000)
      .writeInsert(5, Seq(ColSpec.int), Seq(Seq[Any](7)), ts = 1000)
      .writeXid(1, ts = 1000)
      .writeGtid(43, anonymous = true, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val evs = BinlogReader.readBinlog(path).events
    val prev = evs.collectFirst { case p: PreviousGtidsEvent => p }.get
    val uuid = "03142536-4758-697a-8b9c-adbecfe0f102" // FixtureUuid bytes
    assert(prev.gtidSet === s"$uuid:1-41")
    val gtids = evs.collect { case g: GtidEvent => g }
    assert(gtids.map(_.gtid) === Vector(s"$uuid:42", "ANONYMOUS"))
    assert(gtids.map(g => EventType.name(g.header.eventType)) ===
      Vector("GTID_LOG_EVENT", "ANONYMOUS_GTID_LOG_EVENT"))
    // change rows still decode around the framing
    assert(evs.collectFirst { case r: RowsEvent => r.rows }.get === Vector(Vector(7)))
  }

  test("ROWS_QUERY (id 29) carries the originating SQL text") {
    val dir = Files.createTempDirectory("rows-query")
    val sql = "INSERT INTO d.t VALUES (7) /* original statement */"
    val path = new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription(ts = 1000, serverVersion = "8.0.36-graft-fixture")
      .writeQuery("d", "BEGIN", ts = 1000)
      .writeTableMap(5, "d", "t", Seq(ColSpec.int), ts = 1000)
      .writeRowsQuery(sql, ts = 1000)
      .writeInsert(5, Seq(ColSpec.int), Seq(Seq[Any](7)), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val evs = BinlogReader.readBinlog(path).events
    assert(evs.collectFirst { case r: RowsQueryEvent => r.query } === Some(sql))
    // rows still decode around it; the txn stitches normally
    assert(evs.collectFirst { case r: RowsEvent => r.rows } === Some(Vector(Vector(7))))
  }

  test("gtidSetContains parses canonical interval sets") {
    import BinlogReader.gtidSetContains
    val u = "03142536-4758-697a-8b9c-adbecfe0f102"
    assert(gtidSetContains(s"$u:1-41", u, 41))
    assert(gtidSetContains(s"$u:1-41", u, 1))
    assert(!gtidSetContains(s"$u:1-41", u, 42))
    assert(gtidSetContains(s"$u:5", u, 5))
    assert(gtidSetContains(s"other:1-3,$u:7-9", u, 8))
    assert(!gtidSetContains(s"$u:1-41", "ffffffff-0000-0000-0000-000000000000", 3))
  }

  test("unsupported rows-class events fail loudly instead of emitting zero rows") {
    // a log whose rows arrive as PRE_GA (v0, id 21) must error with the
    // event name — not scan to an empty result. (PARTIAL_UPDATE (39) and
    // TRANSACTION_PAYLOAD (40) left this list in round 6: both decode now —
    // PartialUpdateRowsSpec / TransactionPayloadSpec cover them.)
    for (badType <- Seq(EventType.PreGaUpdateRows)) {
      val dir = Files.createTempDirectory(s"badrows-$badType")
      val pre = new Writer().writeFormatDescription(ts = 1000)
      val header = new ByteArrayOutputStream()
      def hle(n: Int, v: Long): Unit =
        (0 until n).foreach(i => header.write(((v >> (i * 8)) & 0xff).toInt))
      hle(4, 1000)
      header.write(badType)
      hle(4, 1)
      hle(4, 19L + 8)
      hle(4, pre.position + 19L + 8)
      hle(2, 0)
      val path = dir.resolve("binlog.000001").toString
      val f = new FileOutputStream(path)
      try { f.write(pre.toBytes); f.write(header.toByteArray); f.write(new Array[Byte](8)) }
      finally f.close()
      val ex = intercept[IllegalStateException](BinlogReader.readBinlog(path))
      assert(ex.getMessage.contains(EventType.name(badType)))
      assert(ex.getMessage.contains(badType.toString))
    }
  }
}
