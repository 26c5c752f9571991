package graft.binlog

/** Event model for the MySQL v4 row-based binary log.
  *
  * Semantics follow the reference decoder (`/root/reference/src/cdc/
  * mysql_binlog.clj:222-682`); representation is idiomatic Scala. Only the
  * event types the reference handles get typed decodes; everything else
  * passes through as [[OpaqueEvent]] (reference behavior: unparsed map,
  * `mysql_binlog.clj:750-752`).
  */
object EventType {
  val Query = 2
  val Stop = 3
  val Rotate = 4
  val FormatDescription = 15
  val Xid = 16
  val TableMap = 19
  val WriteRows = 23
  val UpdateRows = 24
  val DeleteRows = 25

  /** Symbolic names per `mysql_binlog.clj:222-259`. */
  def name(t: Int): String = t match {
    case Query => "QUERY_EVENT"
    case Stop => "STOP_EVENT"
    case Rotate => "ROTATE_EVENT"
    case FormatDescription => "FORMAT_DESCRIPTION_EVENT"
    case Xid => "XID_EVENT"
    case TableMap => "TABLE_MAP_EVENT"
    case WriteRows => "WRITE_ROWS_EVENT"
    case UpdateRows => "UPDATE_ROWS_EVENT"
    case DeleteRows => "DELETE_ROWS_EVENT"
    case other => s"EVENT_$other"
  }
}

/** MySQL column type ids (`mysql_binlog.clj:401-428`). */
object ColType {
  val Decimal = 0
  val Tiny = 1
  val Short = 2
  val Long = 3
  val Float = 4
  val Double = 5
  val Null = 6
  val Timestamp = 7
  val LongLong = 8
  val Int24 = 9
  val Date = 10
  val Time = 11
  val Datetime = 12
  val Year = 13
  val NewDate = 14
  val Varchar = 15
  val Bit = 16
  // 5.6+ fractional-second temporals (what any modern server writes for
  // new tables; the reference's id table predates them)
  val Timestamp2 = 17
  val Datetime2 = 18
  val Time2 = 19
  val Json = 245
  val NewDecimal = 246
  val Enum = 247
  val Set = 248
  val Blob = 252
  val VarString = 253
  val String = 254
  val Geometry = 255

  /** Per-type metadata byte counts (`mysql_binlog.clj:462-485`, extended
    * with the 5.6+ temporals — 1 byte fsp each — and NEWDATE/JSON).
    */
  val metadataLengths: Map[Int, Int] = Map(
    0x0 -> 0, 0x1 -> 0, 0x2 -> 0, 0x3 -> 0, 0x4 -> 1, 0x5 -> 1, 0x6 -> 0,
    0x7 -> 0, 0x8 -> 0, 0x9 -> 0, 0xa -> 0, 0xb -> 0, 0xc -> 0, 0xd -> 0,
    0xe -> 0, 0x11 -> 1, 0x12 -> 1, 0x13 -> 1,
    0xf -> 2, 0x10 -> 2, 0xf5 -> 1, 0xf6 -> 2, 0xfc -> 1, 0xfd -> 2,
    0xfe -> 2, 0xff -> 1)
}

/** 19-byte v4 event header (`mysql_binlog.clj:290-328`). */
final case class EventHeader(
    timestamp: Long,      // seconds since epoch, UTC
    eventType: Int,
    serverId: Long,
    eventLen: Long,
    nextPos: Long,
    flags: Int,
    offset: Long)

/** One decoded value: `null` = SQL NULL; [[RowImage.Unused]] marks columns
  * absent from the image (`mysql_binlog.clj:593-608`).
  */
object RowImage {
  case object Unused {
    override def toString = "_"
  }
  type Image = IndexedSeq[Any]
}

sealed trait BinlogEvent { def header: EventHeader }

/** `checksumAlg`: BINLOG_CHECKSUM_ALG of every following event — 0 = off,
  * 1 = CRC32 (4 trailing bytes per event, included in event_len). Present
  * in the FDE only for server versions >= 5.6.1; older logs (the
  * reference's 2010-era target) have no checksum notion.
  */
final case class FormatDescriptionEvent(
    header: EventHeader, binlogVersion: Int, serverVersion: String,
    headerLen: Int, checksumAlg: Int = 0) extends BinlogEvent

final case class QueryEvent(
    header: EventHeader, threadId: Long, execTime: Long, errorCode: Int,
    defaultDb: String, sql: String) extends BinlogEvent

final case class RotateEvent(header: EventHeader, nextFile: String)
  extends BinlogEvent

final case class XidEvent(header: EventHeader, xid: Long) extends BinlogEvent

final case class TableMapEvent(
    header: EventHeader, tableId: Long, dbName: String, tableName: String,
    columnTypes: Array[Int], columnMeta: Array[Int]) extends BinlogEvent

/** WRITE/DELETE rows carry one image per row; UPDATE carries before/after
  * pairs (`mysql_binlog.clj:666-677`).
  */
final case class RowsEvent(
    header: EventHeader, tableId: Long, dbName: String, tableName: String,
    rows: Vector[RowImage.Image],
    afterRows: Vector[RowImage.Image]) extends BinlogEvent {
  def isUpdate: Boolean = header.eventType == EventType.UpdateRows
}

/** Recognized-but-undecoded event (passthrough, like the reference). */
final case class OpaqueEvent(header: EventHeader) extends BinlogEvent
