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
  val Intvar = 5
  // LOAD DATA INFILE under statement-based replication (the 5.0+ wire
  // protocol): the client file travels inside the log as BEGIN_LOAD_QUERY
  // + APPEND_BLOCK* blocks keyed by file_id; EXECUTE_LOAD_QUERY (a QUERY
  // variant with file_id + filename-span post-header fields) runs the
  // statement against the reassembled file; DELETE_FILE aborts a transfer
  val AppendBlock = 9
  val DeleteFile = 11
  val BeginLoadQuery = 17
  val ExecuteLoadQuery = 18
  val Rand = 13
  val UserVar = 14
  val FormatDescription = 15
  val Xid = 16
  val TableMap = 19
  // pre-GA (5.1.0-5.1.17) v0 rows events — unsupported, decode fails loudly
  val PreGaWriteRows = 20
  val PreGaUpdateRows = 21
  val PreGaDeleteRows = 22
  // v1 rows events (5.1.18 - 5.6.x; the 2010 reference's ids,
  // `mysql_binlog.clj:401-428`)
  val WriteRows = 23
  val UpdateRows = 24
  val DeleteRows = 25
  val Heartbeat = 27
  // the original SQL statement accompanying row events when the server
  // runs with binlog_rows_query_log_events=ON
  val RowsQuery = 29
  // v2 rows events — what every server >= 5.6.2 writes: identical body
  // after a 2-byte extra-data-length post-header field
  val WriteRowsV2 = 30
  val UpdateRowsV2 = 31
  val DeleteRowsV2 = 32
  val Incident = 26
  val Ignorable = 28
  // GTID framing every >= 5.6 binlog interleaves with transactions
  val Gtid = 33
  val AnonymousGtid = 34
  val PreviousGtids = 35
  val TransactionContext = 36
  val ViewChange = 37
  // XA branch prepared (MySQL >= 5.7.7): the branch's rows are fully
  // logged at this point; XA COMMIT arrives later as its own QUERY-framed
  // transaction (possibly in another file) — so this event is a FLUSH
  // boundary (rows surface with xid null, like other non-XID commits)
  val XaPrepare = 38
  val HeartbeatV2 = 41
  // MySQL >= 8.3 (GA in 8.4): a transaction committed under
  // `gtid_next = 'uuid:tag:gno'` is framed by this event instead of
  // GTID_LOG_EVENT (33). The body is a mysql::serialization message
  // (prefix-varint fields) rather than 33's fixed layout; decodes to the
  // same [[GtidEvent]] with a non-empty `tag`
  val GtidTagged = 42
  // MariaDB's event block (>= 5.3): rows events share MySQL's v1 ids
  // (23-25) so row decode works unchanged; ANNOTATE_ROWS is MariaDB's
  // ROWS_QUERY (statement text before its rows events) and feeds
  // `attachRowsQuery`; GTID (162) / GTID_LIST (163) bodies decode to
  // [[MariaGtidEvent]] / [[MariaGtidListEvent]] (domain-server-seq)
  val MariaAnnotateRows = 160
  val MariaBinlogCheckpoint = 161
  val MariaGtid = 162
  val MariaGtidList = 163
  // MariaDB encrypted-binlog marker (`binlog_encryption=ON`, >= 10.1.7):
  // every event after this one is encrypted — detected to fail with a
  // NAMED error instead of a garbage-decode mid-scan
  val MariaStartEncryption = 164
  // MariaDB `log_bin_compress=ON` (>= 10.2): per-event zlib compression.
  // QUERY_COMPRESSED wraps the SQL text; the rows variants (v1-family —
  // MariaDB never had v2 ids) compress the body after the plain
  // (table_id, flags) post-header
  val MariaQueryCompressed = 165
  val MariaWriteRowsCompressedV1 = 166
  val MariaUpdateRowsCompressedV1 = 167
  val MariaDeleteRowsCompressedV1 = 168
  // binlog_row_value_options=PARTIAL_JSON (MySQL >= 8.0.3): UPDATE whose
  // after-image may carry JSON columns as a DIFF sequence instead of the
  // full value; the decoder applies the diffs to the before-image so the
  // surfaced after-image is always the full document
  val PartialUpdateRows = 39
  // binlog_transaction_compression=ON (MySQL >= 8.0.20): the whole
  // transaction's event stream, zstd-compressed (or uncompressed) inside
  // one envelope event — decoded by re-entering the event loop over the
  // inner byte stream
  val TransactionPayload = 40

  def isWriteRows(t: Int): Boolean =
    t == WriteRows || t == WriteRowsV2 || t == MariaWriteRowsCompressedV1
  def isUpdateRows(t: Int): Boolean =
    t == UpdateRows || t == UpdateRowsV2 || t == PartialUpdateRows ||
      t == MariaUpdateRowsCompressedV1
  def isDeleteRows(t: Int): Boolean =
    t == DeleteRows || t == DeleteRowsV2 || t == MariaDeleteRowsCompressedV1
  def isRows(t: Int): Boolean =
    (t >= WriteRows && t <= DeleteRows) ||
      (t >= WriteRowsV2 && t <= DeleteRowsV2) || t == PartialUpdateRows ||
      isMariaCompressedRows(t)

  /** MariaDB per-event-compressed rows family (zlib body). */
  def isMariaCompressedRows(t: Int): Boolean =
    t >= MariaWriteRowsCompressedV1 && t <= MariaDeleteRowsCompressedV1
  /** v2-family post-header (2-byte extra-data length) — PARTIAL_UPDATE
    * shares it. */
  def isRowsV2(t: Int): Boolean =
    (t >= WriteRowsV2 && t <= DeleteRowsV2) || t == PartialUpdateRows

  /** Row-carrying event formats with no decode path. Passing these through
    * as [[OpaqueEvent]] would make a scan of such a log return zero change
    * rows with no error — the silent-garbage class the CRC32 verification
    * exists to kill, one layer up.
    */
  def isUnsupportedRows(t: Int): Boolean =
    t >= PreGaWriteRows && t <= PreGaDeleteRows

  /** Symbolic names per `mysql_binlog.clj:222-259` + the >= 5.6 additions. */
  def name(t: Int): String = t match {
    case Query => "QUERY_EVENT"
    case Stop => "STOP_EVENT"
    case Rotate => "ROTATE_EVENT"
    case Intvar => "INTVAR_EVENT"
    case AppendBlock => "APPEND_BLOCK_EVENT"
    case DeleteFile => "DELETE_FILE_EVENT"
    case BeginLoadQuery => "BEGIN_LOAD_QUERY_EVENT"
    case ExecuteLoadQuery => "EXECUTE_LOAD_QUERY_EVENT"
    case Rand => "RAND_EVENT"
    case UserVar => "USER_VAR_EVENT"
    case Incident => "INCIDENT_EVENT"
    case Ignorable => "IGNORABLE_LOG_EVENT"
    case TransactionContext => "TRANSACTION_CONTEXT_EVENT"
    case ViewChange => "VIEW_CHANGE_EVENT"
    case XaPrepare => "XA_PREPARE_LOG_EVENT"
    case HeartbeatV2 => "HEARTBEAT_LOG_EVENT_V2"
    case GtidTagged => "GTID_TAGGED_LOG_EVENT"
    case MariaAnnotateRows => "ANNOTATE_ROWS_EVENT"
    case MariaBinlogCheckpoint => "BINLOG_CHECKPOINT_EVENT"
    case MariaGtid => "GTID_EVENT_MARIADB"
    case MariaGtidList => "GTID_LIST_EVENT_MARIADB"
    case MariaStartEncryption => "START_ENCRYPTION_EVENT"
    case MariaQueryCompressed => "QUERY_COMPRESSED_EVENT"
    case MariaWriteRowsCompressedV1 => "WRITE_ROWS_COMPRESSED_EVENT_V1"
    case MariaUpdateRowsCompressedV1 => "UPDATE_ROWS_COMPRESSED_EVENT_V1"
    case MariaDeleteRowsCompressedV1 => "DELETE_ROWS_COMPRESSED_EVENT_V1"
    case FormatDescription => "FORMAT_DESCRIPTION_EVENT"
    case Xid => "XID_EVENT"
    case TableMap => "TABLE_MAP_EVENT"
    case PreGaWriteRows => "PRE_GA_WRITE_ROWS_EVENT"
    case PreGaUpdateRows => "PRE_GA_UPDATE_ROWS_EVENT"
    case PreGaDeleteRows => "PRE_GA_DELETE_ROWS_EVENT"
    case WriteRows => "WRITE_ROWS_EVENT"
    case UpdateRows => "UPDATE_ROWS_EVENT"
    case DeleteRows => "DELETE_ROWS_EVENT"
    case Heartbeat => "HEARTBEAT_LOG_EVENT"
    case RowsQuery => "ROWS_QUERY_LOG_EVENT"
    case WriteRowsV2 => "WRITE_ROWS_EVENT_V2"
    case UpdateRowsV2 => "UPDATE_ROWS_EVENT_V2"
    case DeleteRowsV2 => "DELETE_ROWS_EVENT_V2"
    case Gtid => "GTID_LOG_EVENT"
    case AnonymousGtid => "ANONYMOUS_GTID_LOG_EVENT"
    case PreviousGtids => "PREVIOUS_GTIDS_LOG_EVENT"
    case PartialUpdateRows => "PARTIAL_UPDATE_ROWS_EVENT"
    case TransactionPayload => "TRANSACTION_PAYLOAD_EVENT"
    case other => s"EVENT_$other"
  }
}

/** Transaction-boundary classification of a QUERY event's SQL — the ONE
  * definition shared by the DSv2 reader's flush, the micro-batch stream's
  * `lastSafePos` walk, and the tailer. A row-format binlog logs these
  * statement shapes as QUERY events:
  *  - `BEGIN` / `XA START ...` open a transaction;
  *  - `COMMIT` / `ROLLBACK` / `XA COMMIT|ROLLBACK ...` close one (mixed-
  *    engine ROLLBACK still commits the *logged* non-transactional rows);
  *  - `SAVEPOINT` / `ROLLBACK TO` / `RELEASE SAVEPOINT` / `XA END|PREPARE`
  *    occur INSIDE a transaction and are not boundaries;
  *  - anything else (DDL, statement-logged writes) implicitly commits.
  */
object TxnBoundary {
  sealed trait Kind
  case object Begin extends Kind
  case object Commit extends Kind          // explicit txn end
  case object IntraTxn extends Kind        // inside an open txn
  case object ImplicitCommit extends Kind  // DDL etc: auto-committing

  private def startsWith(s: String, p: String): Boolean =
    s.length >= p.length && s.regionMatches(true, 0, p, 0, p.length)

  def classify(sql: String): Kind = {
    val s = sql.trim
    if (s.equalsIgnoreCase("BEGIN")) Begin
    else if (startsWith(s, "XA START")) Begin
    else if (s.equalsIgnoreCase("COMMIT") || s.equalsIgnoreCase("ROLLBACK")) Commit
    else if (startsWith(s, "XA COMMIT") || startsWith(s, "XA ROLLBACK")) Commit
    else if (startsWith(s, "SAVEPOINT") || startsWith(s, "ROLLBACK TO") ||
             startsWith(s, "RELEASE SAVEPOINT") ||
             startsWith(s, "XA END") || startsWith(s, "XA PREPARE")) IntraTxn
    else ImplicitCommit
  }

  /** True when this QUERY ends any open transaction (flush point). */
  def closes(sql: String): Boolean = classify(sql) match {
    case Commit | ImplicitCommit => true
    case _ => false
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

  /** The real column type behind the TABLE_MAP's declared byte: CHAR, ENUM
    * and SET all travel as STRING(254) with the real type danced into the
    * metadata high byte (`mysql_binlog.clj:560-580`); CHAR lengths above
    * 255 additionally fold two length bits into it.
    */
  def realType(typeId: Int, meta: Int): Int =
    if (typeId == String && meta >= 256) {
      val byte0 = (meta >> 8) & 0xff
      if ((byte0 & 0x30) != 0x30) byte0 | 0x30 else byte0
    } else typeId

  /** Numeric for the SIGNEDNESS optional-metadata bitmap (the set the
    * server's `is_numeric_type` covers — one bit per such column).
    */
  def isNumeric(t: Int): Boolean = t match {
    case Decimal | Tiny | Short | Long | Float | Double | LongLong | Int24 |
         NewDecimal => true
    case _ => false
  }

  /** Character-typed for the DEFAULT_CHARSET / COLUMN_CHARSET optional
    * metadata (the server's `is_character_type`: VARCHAR, the STRING
    * family, BLOB/TEXT) — ENUM/SET have their own charset TLVs.
    */
  def isCharacter(typeId: Int, meta: Int): Boolean = realType(typeId, meta) match {
    case Varchar | VarString | String | Blob => true
    case _ => false
  }
}

/** MySQL 8.0 `binlog_row_metadata` TLV block decoded from a TABLE_MAP
  * event — the in-log answer to the reference's hardest limitation
  * ("column names are absent from the log", `mysql_binlog.clj:505-508`).
  * `binlog_row_metadata=MINIMAL` carries signedness + charsets;
  * `FULL` adds column names, ENUM/SET literals and primary-key info.
  *
  * All arrays are indexed by FULL column position (length = column count);
  * absent information is null / 0 so a consumer can fall back to its own
  * configuration per column.
  */
final case class TableOptionalMeta(
    /** per-column UNSIGNED flag (numeric columns; false elsewhere), or
      * null when the SIGNEDNESS field is absent */
    signedness: Array[Boolean],
    /** per-column collation id (character columns; 0 elsewhere/absent) */
    charsets: Array[Int],
    /** per-column name, or null when COLUMN_NAME is absent (MINIMAL) */
    names: Array[String],
    /** per-column ENUM/SET literal dictionaries (null for other columns) */
    enumSetValues: Array[Array[String]],
    /** full-column indexes of the primary key (empty when absent) */
    primaryKey: Array[Int])

/** log_seq numbering for change rows — the ONE definition shared by the
  * DSv2 partition reader and the tailer (like [[TxnBoundary]]): images
  * number sequentially within a log position, CONTINUING across rows
  * events that share one (TRANSACTION_PAYLOAD inner events all carry the
  * envelope's offset) and resetting when the position moves. Counted over
  * ALL rows events so a row's seq is a property of the log, not of a
  * scan's pushed filters. [[reset]] on every file change — positions
  * restart per file, and an offset coincidence across files must not
  * continue the old numbering.
  */
final class ChangeSeqCounter {
  private var pos = -1L
  private var base = 0
  def reset(): Unit = { pos = -1L; base = 0 }
  /** Advance past `re`; returns the base its images number from. */
  def advance(re: RowsEvent): Int = {
    if (re.header.offset != pos) { pos = re.header.offset; base = 0 }
    val b = base
    base += (if (re.isUpdate) 2 * re.rows.length else re.rows.length)
    b
  }
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
    columnTypes: Array[Int], columnMeta: Array[Int],
    optionalMeta: Option[TableOptionalMeta] = None) extends BinlogEvent

/** WRITE/DELETE rows carry one image per row; UPDATE carries before/after
  * pairs (`mysql_binlog.clj:666-677`).
  */
final case class RowsEvent(
    header: EventHeader, tableId: Long, dbName: String, tableName: String,
    rows: Vector[RowImage.Image],
    afterRows: Vector[RowImage.Image]) extends BinlogEvent {
  def isUpdate: Boolean = EventType.isUpdateRows(header.eventType)
}

/** GTID_LOG_EVENT / ANONYMOUS_GTID_LOG_EVENT (ids 33/34) and
  * GTID_TAGGED_LOG_EVENT (id 42, MySQL >= 8.3): the transaction identity
  * frame preceding every BEGIN on a >= 5.6 server. `gtid` is the
  * canonical `source_uuid:gno` text ("ANONYMOUS" for id 34;
  * `source_uuid:tag:gno` when the transaction committed under a tagged
  * `gtid_next`).
  */
final case class GtidEvent(header: EventHeader, commitFlag: Int,
    sourceUuid: String, gno: Long, tag: String = "") extends BinlogEvent {
  def isAnonymous: Boolean = header.eventType == EventType.AnonymousGtid
  def gtid: String =
    if (isAnonymous) "ANONYMOUS"
    else if (tag.isEmpty) s"$sourceUuid:$gno"
    else s"$sourceUuid:$tag:$gno"
}

/** PREVIOUS_GTIDS_LOG_EVENT (id 35): the GTID set executed before this
  * file, in canonical `uuid:a-b[:c-d...]` text.
  */
final case class PreviousGtidsEvent(header: EventHeader, gtidSet: String)
  extends BinlogEvent

/** MariaDB GTID_EVENT (id 162, >= 10.0): the transaction frame a MariaDB
  * server writes where MySQL writes GTID + BEGIN — no BEGIN QUERY follows
  * (the frame itself opens the event group). The server half of the
  * canonical `domain-server-seq` GTID is the event header's server id.
  * `standalone` (FL_STANDALONE) marks a single-event group (DDL etc.)
  * that is its own commit; `commitId` is present only under
  * FL_GROUP_COMMIT_ID (-1 otherwise).
  */
final case class MariaGtidEvent(header: EventHeader, domainId: Long, seq: Long,
    flags2: Int, commitId: Long = -1L) extends BinlogEvent {
  def standalone: Boolean = (flags2 & 1) != 0
  def gtid: String = s"$domainId-${header.serverId}-$seq"
}

/** MariaDB GTID_LIST_EVENT (id 163): the binlog state at file start —
  * the last GTID logged per (domain, server) before this file (MariaDB's
  * PREVIOUS_GTIDS analogue). Entries are (domainId, serverId, seq).
  */
final case class MariaGtidListEvent(header: EventHeader,
    gtids: Vector[(Long, Long, Long)]) extends BinlogEvent {
  def gtidList: String = gtids.map { case (d, s, q) => s"$d-$s-$q" }.mkString(",")
}

/** MariaDB BINLOG_CHECKPOINT_EVENT (id 161): names the oldest binlog file
  * still needed for crash recovery — replication observability, surfaced
  * through the events-mode `next_file` column.
  */
final case class MariaBinlogCheckpointEvent(header: EventHeader,
    fileName: String) extends BinlogEvent

/** INTVAR_EVENT (id 5): statement-based-replication context — the
  * LAST_INSERT_ID / INSERT_ID value the NEXT statement must evaluate with.
  * Row-format scans never see these; they surface for events-mode
  * observability of mixed/statement logs.
  */
final case class IntvarEvent(header: EventHeader, varType: Int,
    value: Long) extends BinlogEvent {
  def varName: String = varType match {
    case 1 => "LAST_INSERT_ID"
    case 2 => "INSERT_ID"
    case t => s"INTVAR_TYPE($t)"
  }
  def rendered: String = s"SET $varName=$value"
}

/** RAND_EVENT (id 13): the RNG seeds the next statement's RAND() calls
  * must replay with (statement-based-replication context).
  */
final case class RandEvent(header: EventHeader, seed1: Long,
    seed2: Long) extends BinlogEvent {
  def rendered: String = s"SET @@RAND_SEED1=$seed1, @@RAND_SEED2=$seed2"
}

/** USER_VAR_EVENT (id 14): a `@var` binding the next statement reads.
  * `value` is the raw bytes; [[rendered]] is the mysqlbinlog-style
  * best-effort text (typed decode for INT/REAL/DECIMAL/STRING).
  */
final case class UserVarEvent(header: EventHeader, name: String,
    isNull: Boolean, valType: Int, charsetId: Int, value: Array[Byte],
    unsigned: Boolean) extends BinlogEvent {
  def rendered: String = s"SET @`$name`:=${UserVarEvent.renderValue(this)}"
}

object UserVarEvent {
  // Item_result codes (public enum): STRING=0 REAL=1 INT=2 ROW=3 DECIMAL=4
  def renderValue(e: UserVarEvent): String =
    if (e.isNull) "NULL"
    else e.valType match {
      case 0 =>
        val cs = BinlogReader.collationCharset(e.charsetId)
        val s = new String(e.value,
          if (cs != null) cs else java.nio.charset.StandardCharsets.ISO_8859_1)
        "'" + s.replace("'", "''") + "'"
      case 1 =>
        java.lang.Double.toString(java.lang.Double.longBitsToDouble(
          java.nio.ByteBuffer.wrap(e.value)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong))
      case 2 =>
        val v = java.nio.ByteBuffer.wrap(e.value)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
        if (e.unsigned) java.lang.Long.toUnsignedString(v) else v.toString
      case 4 =>
        val prec = e.value(0) & 0xff
        val scale = e.value(1) & 0xff
        MySqlDecimal.decode(e.value, 2, prec, scale).toPlainString
      case t => s"<type $t, ${e.value.length} bytes>"
    }
}

/** INCIDENT_EVENT (id 26): the server recorded that it may have written an
  * incomplete set of changes — a possible REPLICATION GAP. Change scans
  * fail loudly on it by default (`onIncident=ignore` to override): rows
  * decoded past an incident can silently misrepresent the table.
  */
final case class IncidentEvent(header: EventHeader, incidentType: Int,
    message: String) extends BinlogEvent {
  def typeName: String = incidentType match {
    case 1 => "LOST_EVENTS"
    case t => s"INCIDENT($t)"
  }
  /** mysqlbinlog-style rendering: keeps the incident NUMBER legible even
    * when the server logged no message (the common LOST_EVENTS shape).
    */
  def rendered: String =
    s"#Incident: $typeName" + (if (message.nonEmpty) s": $message" else "")
}

/** ROWS_QUERY_LOG_EVENT (id 29): the original SQL that produced the rows
  * events that follow (`binlog_rows_query_log_events=ON`) — possibly
  * truncated by the server.
  */
final case class RowsQueryEvent(header: EventHeader, query: String)
  extends BinlogEvent

/** BEGIN_LOAD_QUERY_EVENT (id 17): first block of a LOAD DATA INFILE file
  * transfer under statement-based replication, keyed by `fileId`. Block
  * BYTES are not retained — reassembling the file is a statement applier's
  * job; the scan surfaces transfer progress (file id, block length) for
  * events-mode observability of mixed/statement logs.
  */
final case class BeginLoadQueryEvent(header: EventHeader, fileId: Long,
    blockLen: Int) extends BinlogEvent {
  def rendered: String = s"#Begin_load_query: file_id=$fileId block_len=$blockLen"
}

/** APPEND_BLOCK_EVENT (id 9): a continuation block of an in-flight LOAD
  * DATA file transfer (same body layout as BEGIN_LOAD_QUERY).
  */
final case class AppendBlockEvent(header: EventHeader, fileId: Long,
    blockLen: Int) extends BinlogEvent {
  def rendered: String = s"#Append_block: file_id=$fileId block_len=$blockLen"
}

/** DELETE_FILE_EVENT (id 11): the server aborted an in-flight LOAD DATA
  * transfer — discard the named file; no EXECUTE_LOAD_QUERY will follow.
  */
final case class DeleteFileEvent(header: EventHeader, fileId: Long)
    extends BinlogEvent {
  def rendered: String = s"#Delete_file: file_id=$fileId"
}

/** EXECUTE_LOAD_QUERY_EVENT (id 18): the QUERY variant that executes a
  * completed LOAD DATA transfer. Post-header extends QUERY's with
  * `fileId` + the byte span [`fnPosStart`, `fnPosEnd`) of the filename
  * literal inside `query` (the applier substitutes its reassembled temp
  * file there) + the duplicate-handling mode of the statement.
  */
final case class ExecuteLoadQueryEvent(header: EventHeader, threadId: Long,
    execTime: Long, errorCode: Int, defaultDb: String, query: String,
    fileId: Long, fnPosStart: Long, fnPosEnd: Long,
    dupHandling: Int) extends BinlogEvent {
  def dupName: String = dupHandling match {
    case 0 => "ERROR"
    case 1 => "IGNORE"
    case 2 => "REPLACE"
    case t => s"DUP($t)"
  }
  /** mysqlbinlog-style rendering: the statement with the original filename
    * span replaced by the transfer handle (the applier's substitution
    * point). A span the query text can't contain — a server would never
    * write one — falls back to the raw statement rather than throwing.
    */
  def rendered: String = {
    val s = fnPosStart.toInt; val e = fnPosEnd.toInt
    if (s >= 0 && e >= s && e <= query.length)
      query.substring(0, s) + s"<file_id:$fileId>" + query.substring(e)
    else query
  }
}

/** Recognized-but-undecoded event (passthrough, like the reference). */
final case class OpaqueEvent(header: EventHeader) extends BinlogEvent
