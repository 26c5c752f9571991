package graft.binlog

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import BinlogWriter._

/** CRC32 checksum support (MySQL >= 5.6.6 writes `binlog_checksum=CRC32`
  * by default): the FDE declares the algorithm, every event carries a
  * 4-byte trailer counted in event_len. Without stripping, every
  * variable-length tail (QUERY sql, ROTATE name, last row image) decodes
  * 4 garbage bytes. The reference predates checksums entirely
  * (`mysql_binlog.clj:330-353` parses the FDE with no checksum notion).
  */
class ChecksumSpec extends AnyFunSuite {

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(50))

  private def fixture(checksum: Boolean): Array[Byte] =
    new Writer(checksum = checksum)
      .writeFormatDescription(ts = 1000)
      .writeQuery("bench", "BEGIN", ts = 1000)
      .writeTableMap(42, "bench", "big", cols, ts = 1000)
      .writeInsert(42, cols, Seq(
        Seq(1, new JBigDecimal("12345678.9999"), "alpha"),
        Seq(2, new JBigDecimal("-0.0001"), "beta")), ts = 1000)
      .writeUpdate(42, cols, Seq(
        (Seq(1, new JBigDecimal("12345678.9999"), "alpha"),
         Seq(1, new JBigDecimal("1.5000"), "gamma"))), ts = 1001)
      .writeXid(77, ts = 1001)
      .writeRotate("binlog.000002", ts = 1001)
      .toBytes

  private def events(bytes: Array[Byte]): Vector[BinlogEvent] = {
    val dir = Files.createTempDirectory("crc")
    val p = dir.resolve("binlog.000001")
    Files.write(p, bytes)
    val buf = BinlogReader.mapFile(p.toString)
    BinlogReader.eventIterator(buf, 4L).toVector
  }

  test("FDE declares CRC32; checksumLen detects it; plain logs report 0") {
    val dir = Files.createTempDirectory("crc-det")
    val pc = dir.resolve("c.bin"); Files.write(pc, fixture(checksum = true))
    val pp = dir.resolve("p.bin"); Files.write(pp, fixture(checksum = false))
    assert(BinlogReader.checksumLen(BinlogReader.mapFile(pc.toString)) === 4)
    assert(BinlogReader.checksumLen(BinlogReader.mapFile(pp.toString)) === 0)
    val fde = events(fixture(checksum = true)).head.asInstanceOf[FormatDescriptionEvent]
    assert(fde.checksumAlg === 1)
    assert(fde.serverVersion.startsWith("5.6"))
  }

  test("checksummed log decodes to the same event stream as its plain twin") {
    val plain = events(fixture(checksum = false))
    val checked = events(fixture(checksum = true))
    assert(checked.length === plain.length)
    // the trailer-sensitive tails: QUERY sql, ROTATE next file, last row image
    val q = checked.collect { case e: QueryEvent => e }.head
    assert(q.sql === "BEGIN") // would be "BEGIN" + 4 garbage bytes unstripped
    val r = checked.collect { case e: RotateEvent => e }.head
    assert(r.nextFile === "binlog.000002")
    val ins = checked.collect { case e: RowsEvent if e.header.eventType == EventType.WriteRows => e }.head
    val insPlain = plain.collect { case e: RowsEvent if e.header.eventType == EventType.WriteRows => e }.head
    assert(ins.rows === insPlain.rows)
    assert(ins.rows(1)(2) === "beta")
    val upd = checked.collect { case e: RowsEvent if e.isUpdate => e }.head
    assert(upd.afterRows.head(2) === "gamma")
    assert(checked.collect { case e: XidEvent => e.xid } === Vector(77L))
  }

  test("a flipped byte fails CRC verification loudly") {
    val bytes = fixture(checksum = true)
    // corrupt one byte inside the WRITE_ROWS payload (well past the FDE)
    val mid = bytes.length / 2
    bytes(mid) = (bytes(mid) ^ 0x5a).toByte
    val ex = intercept[IllegalStateException] { events(bytes) }
    assert(ex.getMessage.contains("CRC32 mismatch"))
  }

  test("partial row image where used-count and column-count straddle a byte boundary") {
    // 9 columns, 8 used: the used-columns bitfield spans 2 bytes but each
    // image's null bitmap must span only ceil(8/8) = 1 byte — sizing it by
    // total column count would shift every subsequent read by one byte
    val nine = (1 to 9).map(_ => ColSpec.int)
    val mask = Seq(true, true, true, true, true, true, true, true, false)
    val dir = Files.createTempDirectory("straddle")
    val p = dir.resolve("binlog.000001")
    new Writer()
      .writeFormatDescription()
      .writeTableMap(5, "d", "t", nine)
      .writeInsertMasked(5, nine, mask, Seq(
        Seq[Any](10, 20, null, 40, 50, 60, 70, 80),
        Seq[Any](11, 21, 31, 41, 51, 61, 71, 81)))
      .writeXid(1)
      .save(p.toString)
    val evs = BinlogReader.eventIterator(BinlogReader.mapFile(p.toString), 4L).toVector
    val rows = evs.collect { case e: RowsEvent => e }.head.rows
    assert(rows(0) === Vector(10, 20, null, 40, 50, 60, 70, 80, RowImage.Unused))
    assert(rows(1) === Vector(11, 21, 31, 41, 51, 61, 71, 81, RowImage.Unused))
  }
}
