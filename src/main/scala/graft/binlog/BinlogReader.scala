package graft.binlog

import java.io.FileInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.charset.{Charset, StandardCharsets}

/** Decoder for the MySQL v4 row-based binlog.
  *
  * Pure Scala (no Spark dependency) so it unit-tests in isolation and runs
  * inside a DataSource V2 `PartitionReader` on executors. Semantics mirror
  * the reference (`/root/reference/src/cdc/mysql_binlog.clj`):
  *
  *  - 19-byte event headers with the torn-tail guard — an event whose bytes
  *    are not fully on disk yet is NOT emitted (`mysql_binlog.clj:316-328`);
  *  - TABLE_MAP state threaded through the scan; rows events decode against
  *    the table-id registry, hard error if absent (`mysql_binlog.clj:715-729`)
  *    — this order dependence makes a file the unit of sequential decode
  *    (SURVEY §3.3); we key by table-id (a map) rather than keeping only the
  *    last TABLE_MAP, which is strictly more permissive;
  *  - scan stops at ROTATE (`mysql_binlog.clj:744-747`);
  *  - strings decode with a configurable charset, latin1 by default for
  *    reference parity (`mysql_binlog.clj:537-544`).
  */
object BinlogReader {

  val HeaderLen = 19
  val Magic: Array[Byte] = Array(0xfe, 'b', 'i', 'n').map(_.toByte)

  /** MySQL 8.0 `binlog_encryption=ON` rewrites the file magic to FD 62 69
    * 6E (rpl_log_encryption ENCRYPTION_MAGIC) — an encrypted log must fail
    * with a NAMED error at open, not a bare "not a binlog" rejection a
    * user can't tell from corruption.
    */
  val EncryptedMagic: Array[Byte] = Array(0xfd, 'b', 'i', 'n').map(_.toByte)

  /** Numeric binlog extension for file ORDERING: "binlog.999999" must sort
    * before "binlog.1000000", which plain string ordering breaks at
    * MySQL's 6→7 digit extension rollover. -1 when the extension is not
    * numeric (such files order first, name as tiebreak).
    */
  def fileOrdinal(path: String): Long = {
    val base = new java.io.File(path).getName
    val i = base.lastIndexOf('.')
    val ext = if (i >= 0) base.substring(i + 1) else ""
    if (ext.nonEmpty && ext.length <= 18 && ext.forall(_.isDigit)) ext.toLong else -1L
  }

  /** True when `path` carries a URI scheme (`s3a://`, `hdfs://`,
    * `file://`, ...): such paths route through Hadoop FileSystem buffered
    * reads — the remote-storage read path of SURVEY §2.1 S2, for clusters
    * whose binlog directory lives on object storage / NFS exported as a
    * Hadoop URI. Plain paths keep the local NIO mmap fast path. `file://`
    * resolves through Hadoop's LocalFileSystem, which is what the spec
    * exercises (no remote store in the test environment) — the code path
    * is scheme-generic.
    */
  def hasUriScheme(path: String): Boolean = {
    val i = path.indexOf(":/")
    // Hadoop renders no-authority URIs as `file:/tmp/x` (single slash), so
    // accept both `scheme://` and `scheme:/`; scheme length >= 2 keeps
    // Windows-style drive letters out
    i >= 2 && path.charAt(0).isLetter &&
      path.substring(0, i).forall(c => c.isLetterOrDigit || c == '+' || c == '.' || c == '-')
  }

  /** Hadoop configuration for remote reads: the active/default Spark
    * session's (so `spark.hadoop.*` credentials and endpoints — s3a keys,
    * custom endpoints — reach the FileSystem, same as Spark's own file
    * sources) with a bare `Configuration` fallback where no session
    * exists (plain-JVM tools, executors on real clusters where
    * core-site.xml carries the credentials). The binlog codec stays
    * usable without Spark: the session lookup is a soft dependency
    * guarded against any linkage error.
    */
  private[graft] def hadoopConfiguration(): org.apache.hadoop.conf.Configuration =
    try {
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
    } catch { case _: Throwable => new org.apache.hadoop.conf.Configuration() }

  private def hadoopPathFs(path: String): (org.apache.hadoop.fs.Path, org.apache.hadoop.fs.FileSystem) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p, p.getFileSystem(hadoopConfiguration()))
  }

  // Append-aware remote-file cache: polling callers (the micro-batch
  // safe-position walk runs per trigger) re-map the same file with
  // offset 0 — without this, every poll re-downloads the whole file.
  // Binlogs are append-only by protocol (rotation creates NEW files), so
  // an unchanged size reuses the cached bytes (zero transfer) and a
  // grown file fetches ONLY the [cachedSize, size) suffix — the same
  // O(delta) contract the local incremental read keeps (SURVEY S15).
  // Bounded to 2 entries (a poll loop touches one growing file; batch
  // scan files pass through transiently) — at most 2 × 2 GiB held.
  private val remoteCache =
    new java.util.LinkedHashMap[String, (Long, Array[Byte])](4, 0.75f, true)

  /** Whole-file (or suffix-from-`offset`) buffered read via Hadoop FS for
    * scheme'd paths — binlogs are bounded by the same 2 GiB contract as
    * the mmap path, so one heap buffer per file is the scale-correct
    * shape (executors each read only the files their partition owns).
    * The encrypted-magic check runs against the file HEAD regardless of
    * `offset`, mirroring [[mapFile]].
    */
  private def readViaHadoop(path: String, offset: Long): ByteBuffer = {
    val (p, fs) = hadoopPathFs(path)
    val size = fs.getFileStatus(p).getLen
    require(size <= Int.MaxValue,
      s"binlog file '$path' is $size bytes — beyond the 2 GiB window " +
        "this decoder supports; split the transaction or rotate more often")
    // the local path throws from FileChannel.map on a negative length —
    // a truncated/replaced remote file must fail as loudly, not read as
    // a silent empty scan that a stream would poll past forever
    require(offset <= size,
      s"binlog '$path' is $size bytes but offset $offset was requested — " +
        "the file was truncated or replaced under the reader")
    val full = remoteCache.synchronized {
      val arr = remoteCache.get(path) match {
        case (csize, carr) if csize == size => carr
        case (csize, carr) if csize < size =>
          // append-only growth: fetch just the new suffix
          val grown = java.util.Arrays.copyOf(carr, size.toInt)
          val in = fs.open(p)
          try in.readFully(csize, grown, csize.toInt, (size - csize).toInt)
          finally in.close()
          grown
        case _ => // first read, or the file shrank (replaced): full fetch
          val arr = new Array[Byte](size.toInt)
          val in = fs.open(p)
          try { if (arr.length > 0) in.readFully(0L, arr, 0, arr.length) }
          finally in.close()
          arr
      }
      remoteCache.put(path, (size, arr))
      val it = remoteCache.entrySet().iterator()
      while (remoteCache.size() > 2 && it.hasNext) { it.next(); it.remove() }
      arr
    }
    if (size >= 4 &&
      java.util.Arrays.equals(java.util.Arrays.copyOfRange(full, 0, 4), EncryptedMagic))
      encryptedFileError(path)
    ByteBuffer.wrap(full, offset.toInt, (size - offset).toInt)
      .slice().asReadOnlyBuffer().order(ByteOrder.LITTLE_ENDIAN)
  }

  /** First 4 bytes of `path`, or None when shorter — ONE open serves both
    * magic classifications (directory resolution checks normal-vs-encrypted
    * per file; two separate helpers would double the opens). Scheme'd
    * paths read through Hadoop FS like [[mapFile]].
    */
  def fileMagic(path: String): Option[Array[Byte]] = {
    if (hasUriScheme(path)) {
      val (p, fs) = hadoopPathFs(path)
      if (fs.getFileStatus(p).getLen < 4) None
      else {
        val in = fs.open(p)
        try {
          val b = new Array[Byte](4)
          in.readFully(0L, b, 0, 4)
          Some(b)
        } finally in.close()
      }
    } else {
      val in = new FileInputStream(path)
      try {
        val b = new Array[Byte](4)
        // loop to 4 bytes or EOF — a single read() may return SHORT on
        // NFS/FUSE (same concern as mapFile's positional-read loop), and a
        // short read here would classify an encrypted file as "not a
        // binlog" and silently skip it
        var off = 0
        var n = 0
        while (off < 4 && n >= 0) {
          n = in.read(b, off, 4 - off)
          if (n > 0) off += n
        }
        if (off == 4) Some(b) else None
      } finally in.close()
    }
  }

  /** Magic-number check (`mysql_binlog.clj:47-53`). */
  def isBinlogFile(path: String): Boolean =
    fileMagic(path).exists(java.util.Arrays.equals(_, Magic))

  /** MySQL 8.0 encrypted-binlog magic check (see [[EncryptedMagic]]). */
  def isEncryptedBinlogFile(path: String): Boolean =
    fileMagic(path).exists(java.util.Arrays.equals(_, EncryptedMagic))

  private def encryptedFileError(path: String): Nothing =
    throw new IllegalStateException(
      s"binlog '$path' is encrypted (binlog_encryption=ON file magic) — " +
        "this engine reads unencrypted logs only; disable binlog_encryption " +
        "or decrypt the log before scanning")

  /** Thrown wherever a header walk meets MariaDB START_ENCRYPTION (164):
    * everything past it is ciphertext, and walking on would decode garbage
    * a user can't tell from corruption. eventIterator AND the standalone
    * walks (GTID location/resume, lastSafePos) all route here.
    */
  def startEncryptionError(offset: Long): Nothing =
    throw new IllegalStateException(
      s"binlog is encrypted (START_ENCRYPTION event at offset $offset) — " +
        "this engine reads unencrypted logs only; disable binlog_encryption " +
        "or decrypt the log before scanning")

  /** mmap a binlog read-only from `offset`, little-endian
    * (`mysql_binlog.clj:696-705`). Encrypted logs (MySQL
    * `binlog_encryption=ON` magic) fail HERE by name — this is the one
    * choke point every scan, GTID walk and tailer passes through. The
    * magic peek shares the single open (hot paths call this per poll /
    * per batch; a separate open would double the syscalls). Scheme'd
    * paths (`s3a://`, `hdfs://`, `file://`) take a Hadoop FS buffered
    * read instead — same buffer contract, same named errors.
    */
  def mapFile(path: String, offset: Long = 0L): ByteBuffer = {
    if (hasUriScheme(path)) return readViaHadoop(path, offset)
    val in = new FileInputStream(path)
    try {
      if (in.getChannel.size() >= 4) {
        val m = ByteBuffer.allocate(4)
        // positional reads leave the channel cursor unmoved but may return
        // SHORT (NFS/FUSE) — a partial buffer would zero-pad past the
        // comparison and silently skip encryption detection
        var p = 0L
        while (m.hasRemaining) {
          val k = in.getChannel.read(m, p)
          require(k > 0, s"short read of binlog magic from '$path'")
          p += k
        }
        if (java.util.Arrays.equals(m.array(), EncryptedMagic))
          encryptedFileError(path)
      }
      val ch = in.getChannel
      val len = ch.size() - offset
      // one bulk-load transaction can push a file past max_binlog_size;
      // fail with the real reason instead of a bare mmap size error
      require(len <= Int.MaxValue,
        s"binlog file '$path' is ${ch.size()} bytes — beyond the 2 GiB mmap " +
          "window this decoder supports; split the transaction or rotate more often")
      ch.map(FileChannel.MapMode.READ_ONLY, offset, len)
        .order(ByteOrder.LITTLE_ENDIAN)
    } finally in.close()
  }

  // unsigned reads (`mysql_binlog.clj:146-173`)
  private def ubyte(b: ByteBuffer): Int = b.get() & 0xff
  private def ushort(b: ByteBuffer): Int = b.getShort() & 0xffff
  private def uint(b: ByteBuffer, o: Int): Long = b.getInt(o) & 0xffffffffL
  private def bytes(b: ByteBuffer, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); b.get(a); a
  }

  /** n-byte little-endian unsigned → long (`mysql_binlog.clj:101-108`). */
  def nUint(a: Array[Byte]): Long = {
    var res = 0L
    var i = 0
    while (i < a.length) { res |= (a(i) & 0xffL) << (i * 8); i += 1 }
    res
  }

  /** n-byte BIG-endian unsigned → long. The 5.6+ temporal types
    * (TIMESTAMP2/DATETIME2/TIME2) are stored big-endian so the packed
    * values sort bytewise — unlike everything else in the log.
    */
  def nUintBE(a: Array[Byte]): Long = {
    var res = 0L
    var i = 0
    while (i < a.length) { res = (res << 8) | (a(i) & 0xffL); i += 1 }
    res
  }

  /** Fractional-seconds tail: n = ceil(fsp/2) big-endian bytes. The stored
    * unit is determined by the BYTE count, not fsp (my_time.cc
    * my_datetime_packed_from_binary): 1 byte = micros/10000, 2 bytes =
    * micros/100, 3 bytes = micros — i.e. scale = 100^(3-n). (Odd fsp only
    * narrows the value range the server writes, not the storage unit.)
    * Returns microseconds.
    */
  private def readFracMicros(b: ByteBuffer, fsp: Int): Int = {
    val n = (fsp + 1) / 2
    if (n == 0) 0
    else {
      val stored = nUintBE(bytes(b, n))
      var scale = 1L
      var i = n
      while (i < 3) { scale *= 100; i += 1 }
      (stored * scale).toInt
    }
  }

  /** MySQL packed integer (`mysql_binlog.clj:193-211`). */
  def packedInt(b: ByteBuffer): Long = {
    val x = ubyte(b)
    if (x <= 250) x.toLong
    else if (x == 252) ushort(b).toLong
    else if (x == 253) nUint(bytes(b, 3))
    else if (x == 254) b.getLong()
    else throw new IllegalArgumentException(s"invalid packed integer first byte: $x")
  }

  private def cstring(a: Array[Byte], cs: Charset): String =
    if (a.nonEmpty && a(a.length - 1) == 0) new String(a, 0, a.length - 1, cs)
    else new String(a, cs)

  /** 1-byte-length-prefixed string + trailing NUL (`mysql_binlog.clj:175-186`). */
  private def lengthHintedString(b: ByteBuffer, cs: Charset): String = {
    val len = ubyte(b)
    val s = if (len > 0) new String(bytes(b, len), cs) else ""
    b.get() // trailing 0
    s
  }

  /** LSB-first bit extraction across a byte array (`mysql_binlog.clj:127-133`). */
  def nthBit(a: Array[Byte], n: Int): Int = (a(n / 8) >> (n % 8)) & 1

  def countBits(a: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i < a.length) { c += Integer.bitCount(a(i) & 0xff); i += 1 }
    c
  }

  private def bitfield(b: ByteBuffer, bits: Int): Array[Byte] =
    bytes(b, (bits + 7) / 8)

  /** Decode the 19-byte header at `off`; None when the header or the event
    * body is not fully on disk (torn-tail guard, `mysql_binlog.clj:316-328`).
    */
  def readEventHeader(b: ByteBuffer, off: Long): Option[EventHeader] = {
    if (off + HeaderLen > b.capacity()) None
    else {
      val o = off.toInt
      val h = EventHeader(
        timestamp = uint(b, o),
        eventType = b.get(o + 4) & 0xff,
        serverId = uint(b, o + 5),
        eventLen = uint(b, o + 9),
        nextPos = uint(b, o + 13),
        flags = b.getShort(o + 17) & 0xffff,
        offset = off)
      // eventLen below the header size is structurally impossible — a
      // zero-filled tail (crashed server's partial IO_CACHE flush) parses
      // as eventLen=0 and would loop the iterator at one offset forever;
      // treat it as the torn tail it is
      if (h.eventLen >= HeaderLen && off + h.eventLen <= b.capacity()) Some(h) else None
    }
  }

  def readFormatDescription(b: ByteBuffer, h: EventHeader): FormatDescriptionEvent = {
    val o = h.offset.toInt
    val sv = new Array[Byte](50)
    var i = 0
    while (i < 50) { sv(i) = b.get(o + 21 + i); i += 1 }
    val nul = sv.indexOf(0: Byte)
    val version = new String(sv, 0, if (nul < 0) 50 else nul, StandardCharsets.UTF_8)
    // servers >= 5.6.1 append checksum_alg (1 byte) + the FDE's own CRC32
    // (4 bytes) after the post-header-length table; the alg byte sits at
    // event_len - 5. Older v4 logs (the reference's target) have neither.
    val alg =
      if (versionAtLeast(version, 5, 6, 1) && h.eventLen >= 80)
        b.get(o + (h.eventLen - 5).toInt) & 0xff
      else 0
    FormatDescriptionEvent(h,
      binlogVersion = b.getShort(o + 19) & 0xffff,
      serverVersion = version,
      headerLen = b.get(o + 75) & 0xff,
      checksumAlg = alg)
  }

  private def versionAtLeast(v: String, maj: Int, min: Int, patch: Int): Boolean = {
    val parts = v.takeWhile(c => c.isDigit || c == '.').split('.')
    def p(i: Int): Int = if (i < parts.length && parts(i).nonEmpty) parts(i).toInt else 0
    val (a, b, c) = (p(0), p(1), p(2))
    a > maj || (a == maj && (b > min || (b == min && c >= patch)))
  }

  /** Bytes of CRC trailer per event in this log: peeks the FDE at offset 4.
    * 4 when the FDE declares BINLOG_CHECKSUM_ALG_CRC32, else 0.
    */
  def checksumLen(buf: ByteBuffer): Int =
    readEventHeader(buf, 4L) match {
      case Some(h) if h.eventType == EventType.FormatDescription =>
        if (readFormatDescription(buf, h).checksumAlg == 1) 4 else 0
      case _ => 0
    }

  /** Verify the CRC32 trailer of the event at `h`; throws on mismatch —
    * a corrupt event must fail loudly, not decode to garbage rows.
    */
  def verifyCrc32(buf: ByteBuffer, h: EventHeader): Unit = {
    val crc = new java.util.zip.CRC32()
    val dup = buf.duplicate()
    dup.position(h.offset.toInt)
    dup.limit((h.offset + h.eventLen - 4).toInt)
    crc.update(dup)
    val stored = uint(buf, (h.offset + h.eventLen - 4).toInt)
    if (crc.getValue != stored)
      throw new IllegalStateException(
        f"binlog CRC32 mismatch at offset ${h.offset}: computed 0x${crc.getValue}%08x, stored 0x$stored%08x")
  }

  def readQuery(b: ByteBuffer, h: EventHeader, cs: Charset): QueryEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val threadId = uint(b, b.position()); b.position(b.position() + 4)
    val execTime = uint(b, b.position()); b.position(b.position() + 4)
    val dbNameLen = ubyte(b) + 1 // + nullbyte (`mysql_binlog.clj:368`)
    val errorCode = ushort(b)
    val statusLen = ushort(b)
    bytes(b, statusLen) // status vars, skipped
    val db = cstring(bytes(b, dbNameLen), cs)
    val sql = cstring(bytes(b, (h.offset + h.eventLen - b.position()).toInt), cs)
    QueryEvent(h, threadId, execTime, errorCode, db, sql)
  }

  def readRotate(b: ByteBuffer, h: EventHeader, cs: Charset): RotateEvent = {
    b.position(h.offset.toInt + 27) // skip 8-byte next-position (always 4)
    RotateEvent(h, cstring(bytes(b, (h.eventLen - 27).toInt), cs))
  }

  def readXid(b: ByteBuffer, h: EventHeader): XidEvent =
    XidEvent(h, b.getLong(h.offset.toInt + HeaderLen))

  /** ROWS_QUERY (id 29): 1-byte stored-length (ignored — the server may
    * truncate and the event length is authoritative) + the SQL text.
    */
  def readRowsQuery(b: ByteBuffer, h: EventHeader, cs: Charset): RowsQueryEvent = {
    b.position(h.offset.toInt + HeaderLen)
    ubyte(b) // length byte
    RowsQueryEvent(h, new String(
      bytes(b, (h.offset + h.eventLen - b.position()).toInt), cs))
  }

  /** BEGIN_LOAD_QUERY (17) / APPEND_BLOCK (9): 4-byte LE file_id, then the
    * raw file-block bytes (not retained — see [[BeginLoadQueryEvent]]).
    */
  def readBeginLoadQuery(b: ByteBuffer, h: EventHeader): BeginLoadQueryEvent = {
    if (h.eventLen < HeaderLen + 4) throw new IllegalArgumentException(
      s"BEGIN_LOAD_QUERY at offset ${h.offset} is ${h.eventLen} bytes — body needs at least 4")
    b.position(h.offset.toInt + HeaderLen)
    BeginLoadQueryEvent(h, uint(b, b.position()),
      (h.eventLen - HeaderLen - 4).toInt)
  }

  def readAppendBlock(b: ByteBuffer, h: EventHeader): AppendBlockEvent = {
    if (h.eventLen < HeaderLen + 4) throw new IllegalArgumentException(
      s"APPEND_BLOCK at offset ${h.offset} is ${h.eventLen} bytes — body needs at least 4")
    b.position(h.offset.toInt + HeaderLen)
    AppendBlockEvent(h, uint(b, b.position()),
      (h.eventLen - HeaderLen - 4).toInt)
  }

  /** DELETE_FILE (11): 4-byte LE file_id of the aborted transfer. */
  def readDeleteFile(b: ByteBuffer, h: EventHeader): DeleteFileEvent = {
    if (h.eventLen < HeaderLen + 4) throw new IllegalArgumentException(
      s"DELETE_FILE at offset ${h.offset} is ${h.eventLen} bytes — body needs 4")
    DeleteFileEvent(h, uint(b, h.offset.toInt + HeaderLen))
  }

  /** EXECUTE_LOAD_QUERY (18): QUERY's 13-byte post-header + 13 more bytes
    * (file_id, fn_pos_start, fn_pos_end, dup_handling), then status vars,
    * db and the statement text — layout per the public binary-log format
    * (libbinlogevents `load_data_events.h`).
    */
  def readExecuteLoadQuery(b: ByteBuffer, h: EventHeader,
                           cs: Charset): ExecuteLoadQueryEvent = {
    if (h.eventLen < HeaderLen + 27) throw new IllegalArgumentException(
      s"EXECUTE_LOAD_QUERY at offset ${h.offset} is ${h.eventLen} bytes — " +
        "body needs at least 27 (26-byte post-header plus the db terminator)")
    b.position(h.offset.toInt + HeaderLen)
    val threadId = uint(b, b.position()); b.position(b.position() + 4)
    val execTime = uint(b, b.position()); b.position(b.position() + 4)
    val dbNameLen = ubyte(b) + 1 // + nullbyte, as in readQuery
    val errorCode = ushort(b)
    val statusLen = ushort(b)
    val fileId = uint(b, b.position()); b.position(b.position() + 4)
    val fnPosStart = uint(b, b.position()); b.position(b.position() + 4)
    val fnPosEnd = uint(b, b.position()); b.position(b.position() + 4)
    val dup = ubyte(b)
    bytes(b, statusLen) // status vars, skipped (as in readQuery)
    val db = cstring(bytes(b, dbNameLen), cs)
    val sql = cstring(bytes(b, (h.offset + h.eventLen - b.position()).toInt), cs)
    ExecuteLoadQueryEvent(h, threadId, execTime, errorCode, db, sql,
      fileId, fnPosStart, fnPosEnd, dup)
  }

  /** MariaDB ANNOTATE_ROWS (160): the statement text, bare (no stored-
    * length byte) — their ROWS_QUERY; surfaces through the same
    * [[RowsQueryEvent]] so `attachRowsQuery` works on MariaDB logs.
    */
  def readAnnotateRows(b: ByteBuffer, h: EventHeader, cs: Charset): RowsQueryEvent = {
    b.position(h.offset.toInt + HeaderLen)
    RowsQueryEvent(h, new String(
      bytes(b, (h.offset + h.eventLen - b.position()).toInt), cs))
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Fast lowercase hex (char-table, no String.format) — shared by GTID
    * uuid rendering and the dynamic-mode blob stringifier.
    */
  def toHex(a: Array[Byte]): String = {
    val out = new Array[Char](a.length * 2)
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      out(2 * i) = HexChars(x >> 4)
      out(2 * i + 1) = HexChars(x & 0xf)
      i += 1
    }
    new String(out)
  }

  private def uuidStr(a: Array[Byte]): String = {
    val hex = toHex(a)
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** GTID / ANONYMOUS_GTID (ids 33/34): 1-byte commit flag, 16-byte source
    * UUID, 8-byte LE GNO. Later servers append logical timestamps — ignored
    * (event_len covers them).
    */
  def readGtid(b: ByteBuffer, h: EventHeader): GtidEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val flag = ubyte(b)
    val sid = bytes(b, 16)
    val gno = b.getLong()
    GtidEvent(h, flag, uuidStr(sid), gno)
  }

  /** One prefix-varint from MySQL's `mysql::serialization` wire format
    * (libs/mysql/serialization, >= 8.2 — the encoding under
    * GTID_TAGGED_LOG_EVENT): the count of trailing one-bits in the first
    * byte is the number of EXTRA bytes; the remaining high bits of the
    * first byte are the value's low bits, extra bytes follow
    * little-endian. A first byte of 0xFF means 8 raw LE bytes follow.
    */
  private[binlog] def readPrefixVarint(b: ByteBuffer): Long = {
    val first = ubyte(b)
    if (first == 0xff) b.getLong()
    else {
      val extra = Integer.numberOfTrailingZeros(~first) // trailing ones
      val m = extra + 1 // total bytes
      var v = (first >>> m).toLong
      var i = 0
      while (i < extra) {
        v |= ubyte(b).toLong << (8 - m + 8 * i)
        i += 1
      }
      v
    }
  }

  /** GTID_TAGGED_LOG_EVENT (id 42, MySQL >= 8.3, GA in 8.4): the frame a
    * server writes for a transaction committed under
    * `gtid_next = 'uuid:tag:gno'`. Unlike 33's fixed layout the body is a
    * mysql::serialization message: a two-varint message header, then
    * (field_id, value) pairs in ascending field order — field 0
    * gtid_flags (varint), 1 source UUID (16 raw bytes), 2 gno (varint),
    * 3 tag (varint length + ASCII). Later fields (logical timestamps,
    * transaction length, server versions) are ignored, same as the
    * trailing optional fields of 33. Decodes to [[GtidEvent]] with a
    * non-empty `tag` so the events-mode `gtid` column, `startAfterGtid`,
    * and safe-position framing see tagged transactions.
    */
  def readGtidTagged(b: ByteBuffer, h: EventHeader): GtidEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val end = h.offset + h.eventLen
    readPrefixVarint(b) // message byte size
    readPrefixVarint(b) // last non-ignorable field id
    var flag = 0
    var uuid = ""
    var gno = 0L
    var sawGno = false
    var tag = ""
    var done = false
    while (!done && b.position() < end) {
      val fieldId = readPrefixVarint(b)
      fieldId match {
        case 0 => flag = readPrefixVarint(b).toInt
        case 1 => uuid = uuidStr(bytes(b, 16))
        case 2 => gno = readPrefixVarint(b); sawGno = true
        case 3 =>
          val len = readPrefixVarint(b).toInt
          require(len >= 0 && b.position() + len <= end,
            s"GTID_TAGGED at offset ${h.offset}: corrupt tag length $len")
          tag = new String(bytes(b, len), StandardCharsets.US_ASCII)
          done = true // everything after the tag is ignorable here
        case _ => done = true
      }
    }
    require(uuid.nonEmpty && sawGno,
      s"GTID_TAGGED at offset ${h.offset}: missing uuid/gno fields")
    GtidEvent(h, flag, uuid, gno, tag)
  }

  /** PREVIOUS_GTIDS (id 35): 8-byte LE sid count, then per sid a 16-byte
    * UUID + 8-byte interval count + (start, end) 8-byte pairs with
    * exclusive end — rendered in canonical `uuid:a-b` text.
    */
  def readPreviousGtids(b: ByteBuffer, h: EventHeader): PreviousGtidsEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val nSids = b.getLong()
    val parts = (0L until nSids).map { _ =>
      val uuid = uuidStr(bytes(b, 16))
      val nIv = b.getLong()
      val ivs = (0L until nIv).map { _ =>
        val start = b.getLong()
        val endEx = b.getLong()
        if (endEx - 1 == start) s"$start" else s"$start-${endEx - 1}"
      }
      s"$uuid:${ivs.mkString(":")}"
    }
    PreviousGtidsEvent(h, parts.mkString(","))
  }

  /** MariaDB GTID_EVENT (162, >= 10.0): 8-byte LE seq_no, 4-byte LE
    * domain_id, 1-byte flags2; FL_GROUP_COMMIT_ID (2) appends an 8-byte
    * commit id (later servers append more optional fields — event_len
    * covers them). The server half of the GTID is the header's server id.
    */
  def readMariaGtid(b: ByteBuffer, h: EventHeader): MariaGtidEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val seq = b.getLong()
    val domain = b.getInt() & 0xffffffffL
    val flags2 = ubyte(b)
    val cid = if ((flags2 & 2) != 0) b.getLong() else -1L
    MariaGtidEvent(h, domain, seq, flags2, cid)
  }

  /** MariaDB GTID_LIST_EVENT (163): 4-byte LE count (low 28 bits; high 4
    * bits are flags), then count × (domain 4 LE, server 4 LE, seq 8 LE).
    */
  def readMariaGtidList(b: ByteBuffer, h: EventHeader): MariaGtidListEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val n = (b.getInt() & 0x0fffffff)
    // bound the declared count by the event's own length — a corrupt count
    // would otherwise march past the event swallowing neighbors' bytes as
    // GTID entries (silently wrong file routing) or die in a raw
    // BufferUnderflowException (this walk can run before CRC verification)
    require(HeaderLen + 4 + 16L * n <= h.eventLen,
      s"GTID_LIST at offset ${h.offset} declares $n entries but the event " +
        s"is only ${h.eventLen} bytes — corrupt count")
    val entries = Vector.newBuilder[(Long, Long, Long)]
    var i = 0
    while (i < n) {
      val d = b.getInt() & 0xffffffffL
      val s = b.getInt() & 0xffffffffL
      val q = b.getLong()
      entries += ((d, s, q))
      i += 1
    }
    MariaGtidListEvent(h, entries.result())
  }

  /** MariaDB BINLOG_CHECKPOINT (161): 4-byte LE name length + file name. */
  def readMariaBinlogCheckpoint(b: ByteBuffer, h: EventHeader,
                                cs: Charset): MariaBinlogCheckpointEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val n = b.getInt()
    require(n >= 0 && HeaderLen + 4L + n <= h.eventLen,
      s"BINLOG_CHECKPOINT at offset ${h.offset} declares a $n-byte name " +
        s"but the event is only ${h.eventLen} bytes")
    MariaBinlogCheckpointEvent(h, new String(bytes(b, n), cs))
  }

  /** INTVAR (5): 1-byte type + 8-byte LE value (no post-header). */
  def readIntvar(b: ByteBuffer, h: EventHeader): IntvarEvent = {
    require(h.eventLen >= HeaderLen + 9,
      s"INTVAR at offset ${h.offset} is ${h.eventLen} bytes — body needs 9")
    b.position(h.offset.toInt + HeaderLen)
    IntvarEvent(h, ubyte(b), b.getLong())
  }

  /** RAND (13): two 8-byte LE seeds. */
  def readRand(b: ByteBuffer, h: EventHeader): RandEvent = {
    require(h.eventLen >= HeaderLen + 16,
      s"RAND at offset ${h.offset} is ${h.eventLen} bytes — body needs 16")
    b.position(h.offset.toInt + HeaderLen)
    RandEvent(h, b.getLong(), b.getLong())
  }

  /** USER_VAR (14): 4-byte LE name length + name + 1-byte is-null, then
    * (when not null) 1-byte Item_result type, 4-byte LE collation id,
    * 4-byte LE value length + value, and — servers 5.6.4+ — a trailing
    * flags byte whose bit 0 marks an INT value unsigned.
    */
  def readUserVar(b: ByteBuffer, h: EventHeader, cs: Charset): UserVarEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val end = (h.offset + h.eventLen).toInt
    val nameLen = b.getInt()
    require(nameLen >= 0 && b.position() + nameLen <= end,
      s"USER_VAR at offset ${h.offset} declares a $nameLen-byte name " +
        s"but the event is only ${h.eventLen} bytes")
    val name = new String(bytes(b, nameLen), cs)
    if (ubyte(b) != 0)
      UserVarEvent(h, name, isNull = true, -1, 0, Array.emptyByteArray,
        unsigned = false)
    else {
      val t = ubyte(b)
      val charsetId = b.getInt()
      val valLen = b.getInt()
      require(valLen >= 0 && b.position() + valLen <= end,
        s"USER_VAR at offset ${h.offset} declares a $valLen-byte value " +
          s"but the event is only ${h.eventLen} bytes")
      val v = bytes(b, valLen)
      val unsigned = b.position() < end && (ubyte(b) & 1) != 0
      UserVarEvent(h, name, isNull = false, t, charsetId, v, unsigned)
    }
  }

  /** INCIDENT (26): 2-byte LE incident number + 1-byte message length +
    * message — the server's "possible replication gap" marker.
    */
  def readIncident(b: ByteBuffer, h: EventHeader, cs: Charset): IncidentEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val num = ushort(b)
    val mlen = ubyte(b)
    require(b.position() + mlen <= h.offset + h.eventLen,
      s"INCIDENT at offset ${h.offset} declares a $mlen-byte message " +
        s"but the event is only ${h.eventLen} bytes")
    IncidentEvent(h, num, new String(bytes(b, mlen), cs))
  }

  /** One MariaDB `log_bin_compress` record (public on-disk layout,
    * log_event.cc `binlog_buf_compress`): control byte `0x80 | lenlen`
    * (bits 4-6 = algorithm, only 0 = zlib exists; bits 0-2 = byte count
    * of the original length), `lenlen` BIG-endian bytes of uncompressed
    * length, then the zlib (deflate) stream running to `end`.
    */
  def mariaUncompress(b: ByteBuffer, end: Long): Array[Byte] = {
    val ctrl = ubyte(b)
    if ((ctrl & 0x80) == 0)
      throw new IllegalStateException(
        f"MariaDB compressed record: bad control byte 0x$ctrl%02x (bit 7 must be set)")
    // algorithm lives in bits 4-6 (ctrl = 0x80 | alg << 4 | lenlen) — a
    // 0xe0-style mask would let alg = 1 (0x9X) through to the inflater
    // and fail as "corrupt zlib" instead of naming the real problem
    val alg = (ctrl >> 4) & 0x7
    if (alg != 0)
      throw new IllegalStateException(
        s"MariaDB compressed record: unknown compression algorithm $alg (only 0 = zlib exists)")
    val lenlen = ctrl & 0x07
    require(lenlen >= 1 && lenlen <= 4,
      s"MariaDB compressed record: invalid length width $lenlen")
    var len = 0L
    var i = 0
    while (i < lenlen) { len = (len << 8) | ubyte(b); i += 1 }
    val comp = bytes(b, (end - b.position()).toInt)
    // bound the declared length BEFORE allocating: a corrupt 4-byte BE
    // length otherwise permits a ~4 GB allocation from one bad record
    // (and >= 2^31 overflows toInt to a NegativeArraySizeException
    // instead of a named corrupt-record error). DEFLATE expands at most
    // ~1032:1, so anything past that multiple of the compressed payload
    // is provably corrupt, not merely large.
    if (len < 0 || len > 1032L * comp.length + 64)
      throw new IllegalStateException(
        s"MariaDB compressed record: corrupt uncompressed-length $len " +
          s"(compressed payload is ${comp.length} bytes)")
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      val outArr = new Array[Byte](len.toInt)
      var off = 0
      while (off < outArr.length && !inf.finished()) {
        val k = inf.inflate(outArr, off, outArr.length - off)
        // zero progress with input remaining: truncated stream, or a
        // preset-dictionary (FDICT) header — inflate() then returns 0 with
        // needsInput() false forever, so both must break the loop loudly
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new IllegalStateException(
            "MariaDB compressed record: truncated or dictionary-requiring zlib stream")
        off += k
      }
      require(off == len.toInt,
        s"MariaDB compressed record: inflated $off of $len declared bytes")
      outArr
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalStateException(
          s"MariaDB compressed record: corrupt zlib stream — $e")
    } finally inf.end()
  }

  /** MariaDB QUERY_COMPRESSED (165, `log_bin_compress=ON`): QUERY layout
    * with the SQL text replaced by one compressed record.
    */
  def readQueryCompressed(b: ByteBuffer, h: EventHeader, cs: Charset): QueryEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val threadId = uint(b, b.position()); b.position(b.position() + 4)
    val execTime = uint(b, b.position()); b.position(b.position() + 4)
    val dbNameLen = ubyte(b) + 1
    val errorCode = ushort(b)
    val statusLen = ushort(b)
    bytes(b, statusLen)
    val db = cstring(bytes(b, dbNameLen), cs)
    val sql = new String(mariaUncompress(b, h.offset + h.eventLen), cs)
    QueryEvent(h, threadId, execTime, errorCode, db, sql)
  }

  def readTableMap(b: ByteBuffer, h: EventHeader, cs: Charset): TableMapEvent = {
    b.position(h.offset.toInt + HeaderLen)
    val tableId = nUint(bytes(b, 6))
    ushort(b) // flags
    val db = lengthHintedString(b, cs)
    val table = lengthHintedString(b, cs)
    val colCount = packedInt(b).toInt
    val types = bytes(b, colCount).map(_ & 0xff)
    packedInt(b) // metadata section length
    val meta = new Array[Int](colCount)
    var i = 0
    while (i < colCount) {
      ColType.metadataLengths.getOrElse(types(i),
        throw new IllegalArgumentException(s"unknown column type ${types(i)}")) match {
        case 0 =>
        case 1 => meta(i) = ubyte(b)
        case 2 =>
          // STRING metadata is written [real_type ^ len-bits, length] — a
          // BIG-endian pair (Field_string::do_save_field_metadata; carries
          // the danced CHAR/ENUM/SET real type in the FIRST byte). The
          // other 2-byte metadata (VARCHAR max-len, BIT, NEWDECIMAL
          // precision/scale) is little-endian.
          if (types(i) == ColType.String) {
            val b0 = ubyte(b); val b1 = ubyte(b)
            meta(i) = (b0 << 8) | b1
          } else meta(i) = ushort(b)
      }
      i += 1
    }
    // After the metadata array comes the null-default bitmap, then (MySQL
    // 8.0, binlog_row_metadata=MINIMAL|FULL) the optional-metadata TLV
    // block. The reference's 2010 layout ends at the metadata array — for
    // such events the remainder is empty and both steps are no-ops. NOTE:
    // `h.eventLen` must already exclude any CRC32 trailer (eventIterator
    // strips it) or the trailer bytes would parse as TLV garbage.
    val end = (h.offset + h.eventLen).toInt
    val nullBytes = (colCount + 7) / 8
    val opt =
      if (end - b.position() >= nullBytes) {
        bytes(b, nullBytes) // null-default bitmap (unused for decode)
        if (b.position() < end) Some(readOptionalMeta(b, end, types, meta))
        else None
      } else None
    TableMapEvent(h, tableId, db, table, types, meta, opt)
  }

  // Optional-metadata field type codes (public MySQL 8.0 on-disk format,
  // WL#4618 / rows_event.h Table_map_event::Optional_metadata_field_type).
  private object OptMetaField {
    val Signedness = 1
    val DefaultCharset = 2
    val ColumnCharset = 3
    val ColumnName = 4
    val SetStrValue = 5
    val EnumStrValue = 6
    val GeometryType = 7
    val SimplePrimaryKey = 8
    val PrimaryKeyWithPrefix = 9
    val EnumAndSetDefaultCharset = 10
    val EnumAndSetColumnCharset = 11
    val ColumnVisibility = 12
  }

  /** Parse the TABLE_MAP optional-metadata TLV block (`[type, packed-int
    * length, value]*` until event end). Indexing conventions of the wire
    * format: SIGNEDNESS is an MSB-first bitmap over NUMERIC columns only;
    * DEFAULT_CHARSET pairs and COLUMN_CHARSET entries index/enumerate
    * CHARACTER columns only (ENUM/SET have their own charset fields, 10/11);
    * COLUMN_NAME lists every column. Everything re-indexes to full column
    * position here so consumers never repeat the filtered-column dance.
    */
  private def readOptionalMeta(b: ByteBuffer, end: Int, types: Array[Int],
                               meta: Array[Int]): TableOptionalMeta = {
    val n = types.length
    val numericIdx = (0 until n).filter(i => ColType.isNumeric(ColType.realType(types(i), meta(i))))
    val charIdx = (0 until n).filter(i => ColType.isCharacter(types(i), meta(i)))
    val enumIdx = (0 until n).filter(i => ColType.realType(types(i), meta(i)) == ColType.Enum)
    val setIdx = (0 until n).filter(i => ColType.realType(types(i), meta(i)) == ColType.Set)
    var signedness: Array[Boolean] = null
    val charsets = new Array[Int](n)
    var names: Array[String] = null
    var enumSet: Array[Array[String]] = null
    val pk = Vector.newBuilder[Int]
    def packedStr(): String = {
      val len = packedInt(b).toInt
      new String(bytes(b, len), StandardCharsets.UTF_8)
    }
    while (b.position() < end) {
      val fieldType = ubyte(b)
      val len = packedInt(b).toInt
      val fieldEnd = b.position() + len
      if (fieldEnd > end)
        throw new IllegalStateException(
          s"TABLE_MAP optional metadata field $fieldType overruns the event " +
            s"(${fieldEnd - end} byte(s) past the end) — corrupt TLV block")
      fieldType match {
        case OptMetaField.Signedness =>
          val bits = bytes(b, len)
          signedness = new Array[Boolean](n)
          numericIdx.zipWithIndex.foreach { case (col, k) =>
            // MSB-first within bytes (server Bit_writer order)
            if (k / 8 < bits.length && ((bits(k / 8) >> (7 - k % 8)) & 1) == 1)
              signedness(col) = true
          }
        case OptMetaField.DefaultCharset =>
          val default = packedInt(b).toInt
          charIdx.foreach(col => if (charsets(col) == 0) charsets(col) = default)
          while (b.position() < fieldEnd) {
            val k = packedInt(b).toInt // index among character columns
            val coll = packedInt(b).toInt
            if (k < charIdx.length) charsets(charIdx(k)) = coll
          }
        case OptMetaField.ColumnCharset =>
          var k = 0
          while (b.position() < fieldEnd) {
            val coll = packedInt(b).toInt
            if (k < charIdx.length) charsets(charIdx(k)) = coll
            k += 1
          }
        case OptMetaField.ColumnName =>
          names = new Array[String](n)
          var k = 0
          while (b.position() < fieldEnd && k < n) { names(k) = packedStr(); k += 1 }
        case OptMetaField.EnumStrValue | OptMetaField.SetStrValue =>
          if (enumSet == null) enumSet = new Array[Array[String]](n)
          val idx = if (fieldType == OptMetaField.EnumStrValue) enumIdx else setIdx
          var k = 0
          while (b.position() < fieldEnd && k < idx.length) {
            val nVals = packedInt(b).toInt
            enumSet(idx(k)) = Array.fill(nVals)(packedStr())
            k += 1
          }
        case OptMetaField.SimplePrimaryKey =>
          while (b.position() < fieldEnd) pk += packedInt(b).toInt
        case OptMetaField.EnumAndSetDefaultCharset =>
          val default = packedInt(b).toInt
          val esIdx = (enumIdx ++ setIdx).sorted
          esIdx.foreach(col => if (charsets(col) == 0) charsets(col) = default)
          while (b.position() < fieldEnd) {
            val k = packedInt(b).toInt
            val coll = packedInt(b).toInt
            if (k < esIdx.length) charsets(esIdx(k)) = coll
          }
        case OptMetaField.EnumAndSetColumnCharset =>
          val esIdx = (enumIdx ++ setIdx).sorted
          var k = 0
          while (b.position() < fieldEnd) {
            val coll = packedInt(b).toInt
            if (k < esIdx.length) charsets(esIdx(k)) = coll
            k += 1
          }
        case OptMetaField.GeometryType | OptMetaField.PrimaryKeyWithPrefix |
             OptMetaField.ColumnVisibility =>
          b.position(fieldEnd) // recognized, not consumed by this engine
        case other =>
          // an unknown field id is a format we don't understand — skipping
          // it silently is safe (TLV framing delimits it), newer servers
          // may append fields
          b.position(fieldEnd)
      }
      // tolerate fields whose inner parse stopped early (defensive)
      if (b.position() < fieldEnd) b.position(fieldEnd)
    }
    TableOptionalMeta(signedness, charsets, names, enumSet, pk.result().toArray)
  }

  /** MySQL collation id → JVM charset for string decode; null when unknown
    * (callers fall back to the scan charset). Covers the families a
    * 5.x/8.x server actually writes: latin1, ascii, binary (byte-
    * preserving), utf8mb3, utf8mb4 (incl. the 8.0 0900 block), utf16/32.
    */
  def collationCharset(id: Int): Charset = id match {
    case 5 | 8 | 15 | 31 | 47 | 48 | 49 | 94 => StandardCharsets.ISO_8859_1 // latin1_*
    case 11 | 65 => StandardCharsets.US_ASCII
    case 63 => StandardCharsets.ISO_8859_1 // binary: byte-preserving decode
    case 33 | 76 | 83 => StandardCharsets.UTF_8 // utf8mb3 general/tolower/bin
    case i if i >= 192 && i <= 223 => StandardCharsets.UTF_8 // utf8mb3_unicode_*
    case 45 | 46 => StandardCharsets.UTF_8 // utf8mb4_general/bin
    case i if i >= 224 && i <= 247 => StandardCharsets.UTF_8 // utf8mb4_unicode_*
    case i if i >= 255 && i <= 323 => StandardCharsets.UTF_8 // utf8mb4_0900_* block
    case 54 | 55 | 101 | 102 => StandardCharsets.UTF_16BE // utf16
    case 35 | 90 => StandardCharsets.UTF_16BE // ucs2 (BMP subset of UTF-16BE)
    case _ => null
  }

  /** Decode one field value (`read-type`, `mysql_binlog.clj:528-558`, plus
    * the natural numeric extensions flagged in SURVEY §1.2).
    *
    * `unsigned` resolves the reference's acknowledged TODO
    * (`mysql_binlog.clj:548`: "LONG decodes signed regardless of column
    * signedness" — signedness lives in the table DDL, not the log): integer
    * types widen instead of sign-extending. UNSIGNED BIGINT values above
    * Long.MaxValue surface as java.math.BigDecimal (declare DECIMAL(20,0)
    * in `payloadDdl`).
    */
  def readType(b: ByteBuffer, typeId: Int, meta: Int, cs: Charset,
               unsigned: Boolean = false): Any = if (unsigned) typeId match {
    case ColType.Tiny => ubyte(b)
    case ColType.Short => ushort(b)
    case ColType.Int24 =>
      val a = bytes(b, 3)
      (a(0) & 0xff) | ((a(1) & 0xff) << 8) | ((a(2) & 0xff) << 16)
    case ColType.Long => b.getInt() & 0xffffffffL
    case ColType.LongLong =>
      val v = b.getLong()
      if (v >= 0) v else new java.math.BigDecimal(java.lang.Long.toUnsignedString(v))
    case other => readType(b, other, meta, cs)
  } else typeId match {
    case ColType.Set => bytes(b, meta)
    case ColType.Enum =>
      if (meta == 1) ubyte(b)
      else if (meta == 2) ushort(b)
      else throw new IllegalArgumentException(s"invalid enum len: $meta")
    case ColType.String | ColType.VarString | ColType.Varchar =>
      val len = if (meta < 256) ubyte(b) else ushort(b)
      new String(bytes(b, len), cs)
    case ColType.Long => b.getInt()
    case ColType.NewDecimal =>
      val precision = meta & 0xff
      val scale = meta >> 8
      val size = MySqlDecimal.binSize(precision, scale)
      val a = bytes(b, size)
      MySqlDecimal.decode(a, 0, precision, scale)
    // extensions beyond the reference's declared VARCHAR/INT/DECIMAL set
    // (ids enumerated but decode throws in the reference, `mysql_binlog.clj:558`)
    case ColType.Tiny => b.get().toInt
    case ColType.Short => b.getShort().toInt
    case ColType.Int24 =>
      val a = bytes(b, 3)
      val v = (a(0) & 0xff) | ((a(1) & 0xff) << 8) | ((a(2) & 0xff) << 16)
      if ((v & 0x800000) != 0) v | 0xff000000 else v
    case ColType.LongLong => b.getLong()
    case ColType.Float => b.getFloat()
    case ColType.Double => b.getDouble()
    case ColType.Year => 1900 + ubyte(b)
    case ColType.Timestamp =>
      // epoch 0 can only be the zero timestamp ('0000-00-00 00:00:00'):
      // TIMESTAMP's valid range starts at 1970-01-01 00:00:01
      val v = b.getInt() & 0xffffffffL
      if (v == 0L) null else v
    case ColType.Date =>
      // 3-byte LE: day | month<<5 | year<<9. MySQL's zero dates
      // ('0000-00-00', or day/month 0 under permissive sql_mode) have no
      // java.time representation — they surface as SQL NULL rather than
      // aborting the scan.
      val v = nUint(bytes(b, 3))
      val (m, dd) = (((v >> 5) & 0xf).toInt, (v & 0x1f).toInt)
      if (m == 0 || dd == 0) null
      else java.time.LocalDate.of((v >> 9).toInt, m, dd)
    case ColType.Time =>
      // 3-byte LE packed decimal HHMMSS
      val v = nUint(bytes(b, 3))
      java.time.LocalTime.of((v / 10000).toInt, ((v / 100) % 100).toInt, (v % 100).toInt)
    case ColType.Datetime =>
      // 8-byte LE packed decimal YYYYMMDDHHMMSS; zero dates -> null
      val v = b.getLong()
      val date = v / 1000000L
      val time = v % 1000000L
      val (m, dd) = (((date / 100L) % 100L).toInt, (date % 100L).toInt)
      if (m == 0 || dd == 0) null
      else java.time.LocalDateTime.of(
        (date / 10000L).toInt, m, dd,
        (time / 10000L).toInt, ((time / 100L) % 100L).toInt, (time % 100L).toInt)
    // 5.6+ big-endian packed temporals with fractional seconds (meta = fsp).
    // Layouts are the public MySQL on-disk formats (my_time semantics):
    // DATETIME2: 5 BE bytes = 0x8000000000 + (((y*13+m) << 22) | (d << 17)
    //            | (H << 12) | (M << 6) | S), then the frac tail.
    case ColType.Datetime2 =>
      val v = nUintBE(bytes(b, 5)) - 0x8000000000L
      val usec = readFracMicros(b, meta)
      val ym = ((v >> 22) & 0x1ffff).toInt
      val dd = ((v >> 17) & 0x1f).toInt
      if (ym % 13 == 0 || dd == 0) null // zero date
      else java.time.LocalDateTime.of(ym / 13, ym % 13, dd,
        ((v >> 12) & 0x1f).toInt, ((v >> 6) & 0x3f).toInt, (v & 0x3f).toInt,
        usec * 1000)
    // TIMESTAMP2: 4 BE bytes epoch seconds + frac tail (always UTC);
    // all-zero = the zero timestamp -> SQL NULL (range starts at epoch 1)
    case ColType.Timestamp2 =>
      val sec = nUintBE(bytes(b, 4))
      val usec = readFracMicros(b, meta)
      if (sec == 0L && usec == 0) null
      else java.time.LocalDateTime.ofEpochSecond(sec, usec * 1000, java.time.ZoneOffset.UTC)
    // TIME2: the on-disk value is ONE signed packed quantity
    // ((H<<12|M<<6|S) << 24) + microseconds (my_time.cc
    // my_time_packed_from_binary) — NOT an offset-binary int part plus an
    // unsigned frac tail. fsp 0: 3 BE bytes offset 0x800000, shifted.
    // fsp 1-4: 3 BE offset bytes + a frac tail that is NEGATIVE-adjusted
    // when the int part is negative. fsp 5-6: all 6 bytes are one
    // offset-binary quantity (offset 0x800000000000). MySQL TIME is a
    // duration in ±838:59:59 — values ≥ 24 h or negative cannot be a
    // LocalTime and surface as java.time.Duration.
    case ColType.Time2 =>
      val nFrac = (meta + 1) / 2
      val packed: Long = nFrac match {
        case 0 => (nUintBE(bytes(b, 3)) - 0x800000L) << 24
        case 1 =>
          var intpart = nUintBE(bytes(b, 3)) - 0x800000L
          var frac = ubyte(b).toLong
          if (intpart < 0 && frac != 0) { intpart += 1; frac -= 0x100 }
          (intpart << 24) + frac * 10000L
        case 2 =>
          var intpart = nUintBE(bytes(b, 3)) - 0x800000L
          var frac = nUintBE(bytes(b, 2))
          if (intpart < 0 && frac != 0) { intpart += 1; frac -= 0x10000 }
          (intpart << 24) + frac * 100L
        case _ => nUintBE(bytes(b, 6)) - 0x800000000000L
      }
      val a = math.abs(packed)
      val usec = (a & 0xffffffL).toInt
      val hms = a >> 24
      val (hh, mm, ss) = (((hms >> 12) & 0x3ff).toInt, ((hms >> 6) & 0x3f).toInt, (hms & 0x3f).toInt)
      if (packed >= 0 && hh < 24)
        java.time.LocalTime.of(hh, mm, ss, usec * 1000)
      else {
        val d = java.time.Duration.ofSeconds(hh * 3600L + mm * 60L + ss, usec * 1000L)
        if (packed < 0) d.negated() else d
      }
    case ColType.NewDate =>
      // same 3-byte day|month<<5|year<<9 packing as DATE (zero -> null)
      val v = nUint(bytes(b, 3))
      val (m, dd) = (((v >> 5) & 0xf).toInt, (v & 0x1f).toInt)
      if (m == 0 || dd == 0) null
      else java.time.LocalDate.of((v >> 9).toInt, m, dd)
    case ColType.Blob | ColType.Geometry | ColType.Json =>
      // meta = number of length-prefix bytes (1, 2, 3 or 4). GEOMETRY is
      // WKB-with-SRID-prefix, JSON is the server's binary JSON — both
      // surface as raw bytes (parse downstream; the envelope stays typed)
      val len = nUint(bytes(b, meta)).toInt
      bytes(b, len)
    case ColType.Bit =>
      // meta: low byte = bits, high byte = byte count; value is big-endian
      val nb = meta >> 8
      val a = bytes(b, nb)
      var v = 0L
      var i = 0
      while (i < nb) { v = (v << 8) | (a(i) & 0xffL); i += 1 }
      v
    case other => throw new IllegalArgumentException(s"Cannot read type $other")
  }

  /** `read-field` incl. the CHAR-stored-as-STRING metadata dance
    * (`mysql_binlog.clj:560-580`).
    */
  def readField(b: ByteBuffer, meta: Int, typeId: Int, cs: Charset,
                unsigned: Boolean = false): Any = {
    if (typeId == ColType.String && meta >= 256) {
      val byte0 = (meta >> 8) & 0xff
      val byte1 = meta & 0xff
      if ((byte0 & 0x30) != 0x30) {
        val len = byte1 | (((byte0 & 0x30) ^ 0x30) << 4)
        readType(b, byte0 | 0x30, len, cs)
      } else if (byte0 == ColType.String || byte0 == ColType.Set || byte0 == ColType.Enum)
        readType(b, byte0, byte1, cs)
      else throw new IllegalArgumentException(s"cannot handle column type $byte0")
    } else readType(b, typeId, meta, cs, unsigned)
  }

  /** Effective per-column decode policy for one table: log metadata wins
    * when present (the server that WROTE the log is authoritative on its
    * own columns' signedness and charsets), then the caller's per-column
    * options (`unsignedColumns` / `columnCharsets`), then the scan-wide
    * charset default. Computed once per rows event, not per field.
    */
  def colPolicy(tm: TableMapEvent, cs: Charset, unsignedCols: Array[Boolean],
                colCharsets: Array[Charset]): (Array[Charset], Array[Boolean]) = {
    val n = tm.columnTypes.length
    val css = new Array[Charset](n)
    val uns = new Array[Boolean](n)
    val om = tm.optionalMeta.orNull
    var i = 0
    while (i < n) {
      val metaCs = if (om != null && om.charsets(i) != 0) collationCharset(om.charsets(i)) else null
      css(i) =
        if (metaCs != null) metaCs
        else if (colCharsets != null && i < colCharsets.length && colCharsets(i) != null) colCharsets(i)
        else cs
      uns(i) =
        if (om != null && om.signedness != null) om.signedness(i)
        else unsignedCols != null && i < unsignedCols.length && unsignedCols(i)
      i += 1
    }
    (css, uns)
  }

  /** Decode one row image (`read-row`, `mysql_binlog.clj:582-609`): null
    * bitmap covers only the used columns; unused columns yield
    * [[RowImage.Unused]]. `css`/`uns` are the per-column charset and
    * signedness from [[colPolicy]].
    */
  def readRow(b: ByteBuffer, tm: TableMapEvent, usedCols: Array[Byte],
              css: Array[Charset], uns: Array[Boolean]): RowImage.Image = {
    val nulls = bitfield(b, countBits(usedCols))
    val out = new Array[Any](tm.columnTypes.length)
    var colIdx = 0
    var nullIdx = 0
    while (colIdx < tm.columnTypes.length) {
      if (nthBit(usedCols, colIdx) != 0) {
        out(colIdx) =
          if (nthBit(nulls, nullIdx) == 0)
            readField(b, tm.columnMeta(colIdx), tm.columnTypes(colIdx), css(colIdx),
              uns(colIdx))
          else null
        nullIdx += 1
      } else out(colIdx) = RowImage.Unused
      colIdx += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** WRITE/UPDATE/DELETE rows event, v1 and v2 (`read-wud-rows`,
    * `mysql_binlog.clj:611-682`, which predates v2); UPDATE decodes
    * before/after pairs. v2 (ids 30-32, every server >= 5.6.2) prepends a
    * 2-byte extra-data length (self-inclusive) to the otherwise-identical
    * body; the extra data itself (NDB info etc.) is skipped. MariaDB
    * compressed rows events (166-168, `log_bin_compress=ON`) keep the
    * (table_id, flags) post-header plain and zlib-compress the v1-shaped
    * body after it — decode inflates once, then shares the row loop.
    */
  def readWudRows(b0: ByteBuffer, h: EventHeader, tableMaps: Map[Long, TableMapEvent],
                  cs: Charset, unsignedCols: Array[Boolean] = null,
                  colCharsets: Array[Charset] = null): RowsEvent = {
    b0.position(h.offset.toInt + HeaderLen)
    val tableId = nUint(bytes(b0, 6))
    b0.getShort() // flags
    val (b, end) =
      if (EventType.isMariaCompressedRows(h.eventType)) {
        val body = mariaUncompress(b0, h.offset + h.eventLen)
        (ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN), body.length.toLong)
      } else {
        if (EventType.isRowsV2(h.eventType)) {
          val extraLen = ushort(b0) // includes its own 2 bytes
          if (extraLen > 2) bytes(b0, extraLen - 2)
        }
        (b0, h.offset + h.eventLen)
      }
    val tm = tableMaps.getOrElse(tableId,
      throw new IllegalStateException(s"No TABLE_MAP event for table id $tableId"))
    val colCount = packedInt(b).toInt
    val usedCols = bitfield(b, colCount)
    val usedUpdateCols =
      if (EventType.isUpdateRows(h.eventType)) bitfield(b, colCount) else null
    val (css, uns) = colPolicy(tm, cs, unsignedCols, colCharsets)
    val isPartial = h.eventType == EventType.PartialUpdateRows
    // JSON-column geometry for partial decode: `jsonCols` = full-column
    // indexes (partial_bits has one bit per JSON column, LSB-first);
    // `jsonOrd` = the inverse map, full column -> json ordinal or -1 —
    // precomputed once per event so the per-row loop never scans
    val jsonCols: Array[Int] =
      if (isPartial) tm.columnTypes.indices.filter(i =>
        ColType.realType(tm.columnTypes(i), tm.columnMeta(i)) == ColType.Json).toArray
      else null
    val jsonOrd: Array[Int] =
      if (isPartial) {
        val a = Array.fill(tm.columnTypes.length)(-1)
        jsonCols.zipWithIndex.foreach { case (col, k) => a(col) = k }
        a
      } else null
    val rows = Vector.newBuilder[RowImage.Image]
    val after = Vector.newBuilder[RowImage.Image]
    while (b.position() < end) {
      val before = readRow(b, tm, usedCols, css, uns)
      rows += before
      if (usedUpdateCols != null)
        after += (if (isPartial)
          readPartialAfterRow(b, tm, usedUpdateCols, css, uns, before, jsonCols, jsonOrd)
        else readRow(b, tm, usedUpdateCols, css, uns))
    }
    RowsEvent(h, tableId, tm.dbName, tm.tableName, rows.result(), after.result())
  }

  /** PARTIAL_UPDATE_ROWS after-image (`binlog_row_value_options=
    * PARTIAL_JSON`): a packed `value_options` precedes each after-image;
    * when its PARTIAL_JSON bit is set, a `partial_bits` bitmap (one bit
    * per JSON column in the table) flags which JSON values arrive as a
    * DIFF SEQUENCE instead of a full document. Flagged values decode as
    * [length (meta-width), then per diff: op byte (0 replace / 1 insert /
    * 2 remove), packed path, packed binary-JSON value (absent for
    * remove)] and are applied to the BEFORE-image value — the surfaced
    * after-image is always the full document, byte-compatible with the
    * non-partial path.
    */
  private def readPartialAfterRow(b: ByteBuffer, tm: TableMapEvent,
      usedCols: Array[Byte], css: Array[Charset], uns: Array[Boolean],
      before: RowImage.Image, jsonCols: Array[Int],
      jsonOrd: Array[Int]): RowImage.Image = {
    val valueOptions = packedInt(b).toInt
    if ((valueOptions & 1) == 0) return readRow(b, tm, usedCols, css, uns)
    val partialBits = bitfield(b, jsonCols.length)
    val nulls = bitfield(b, countBits(usedCols))
    val out = new Array[Any](tm.columnTypes.length)
    var colIdx = 0
    var nullIdx = 0
    while (colIdx < tm.columnTypes.length) {
      if (nthBit(usedCols, colIdx) != 0) {
        out(colIdx) =
          if (nthBit(nulls, nullIdx) != 0) null
          else {
            val ord = jsonOrd(colIdx)
            if (ord >= 0 && nthBit(partialBits, ord) != 0)
              applyPartialJson(b, tm.columnMeta(colIdx), before(colIdx),
                tm.dbName + "." + tm.tableName, colIdx)
            else readField(b, tm.columnMeta(colIdx), tm.columnTypes(colIdx),
              css(colIdx), uns(colIdx))
          }
        nullIdx += 1
      } else out(colIdx) = RowImage.Unused
      colIdx += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  private def applyPartialJson(b: ByteBuffer, meta: Int, beforeVal: Any,
                               table: String, colIdx: Int): Array[Byte] = {
    import MySqlJsonAst._
    val total = nUint(bytes(b, meta)).toInt
    val diffEnd = b.position() + total
    val diffs = Vector.newBuilder[JsonDiff]
    while (b.position() < diffEnd) {
      val op = ubyte(b)
      val path = new String(bytes(b, packedInt(b).toInt), StandardCharsets.UTF_8)
      val value =
        if (op != DiffOp.Remove) Some(decode(bytes(b, packedInt(b).toInt)))
        else None
      diffs += JsonDiff(op, path, value)
    }
    val beforeBytes = beforeVal match {
      case a: Array[Byte] => a
      case other => throw new IllegalStateException(
        s"partial JSON update for $table column $colIdx needs the before-image " +
          s"JSON value (binlog_row_image=FULL); before image holds $other")
    }
    encode(applyDiffs(decode(beforeBytes), diffs.result()))
  }

  /** TRANSACTION_PAYLOAD (type 40, `binlog_transaction_compression=ON`,
    * MySQL >= 8.0.20): the transaction's entire event stream wrapped in one
    * envelope. Body is a TLV sequence — 1 END_MARK(0) terminated — of
    * [field-type, packed length, value]: SIZE(1) = payload byte count,
    * COMPRESSION_TYPE(2) = 0 (zstd) | 255 (none), UNCOMPRESSED_SIZE(3);
    * the (possibly compressed) inner event bytes follow the END_MARK.
    * Returns the UNCOMPRESSED inner event stream (19-byte headers, no
    * magic, no per-event checksums — the server writes inner events
    * un-checksummed regardless of binlog_checksum).
    */
  def readTransactionPayload(b: ByteBuffer, h: EventHeader): ByteBuffer = {
    b.position(h.offset.toInt + HeaderLen)
    val end = (h.offset + h.eventLen).toInt
    var compression = 255 // uncompressed unless declared
    var uncompressedSize = -1L
    var payloadSize = -1L
    var done = false
    while (!done) {
      val t = packedInt(b).toInt
      if (t == 0) done = true // OTW_PAYLOAD_HEADER_END_MARK
      else {
        val len = packedInt(b).toInt
        val fieldEnd = b.position() + len
        t match {
          case 1 => payloadSize = packedInt(b)
          case 2 => compression = packedInt(b).toInt
          case 3 => uncompressedSize = packedInt(b)
          case _ => // unknown TLV field: skip by framing
        }
        b.position(fieldEnd)
      }
    }
    val n = if (payloadSize >= 0) payloadSize.toInt else end - b.position()
    val payload = bytes(b, n)
    val inner = compression match {
      case 255 => payload
      case 0 =>
        require(uncompressedSize >= 0,
          s"TRANSACTION_PAYLOAD at offset ${h.offset}: zstd payload without UNCOMPRESSED_SIZE")
        com.github.luben.zstd.Zstd.decompress(payload, uncompressedSize.toInt)
      case other => throw new IllegalStateException(
        s"TRANSACTION_PAYLOAD at offset ${h.offset}: unknown compression type $other " +
          "(0 = zstd, 255 = none)")
    }
    ByteBuffer.wrap(inner).order(ByteOrder.LITTLE_ENDIAN)
  }

  /** Copy `e` with its header's (offset, eventLen, nextPos) rebound to the
    * OUTER envelope event — inner events of a TRANSACTION_PAYLOAD must
    * carry resumable log positions (the payload's own; a transaction is
    * atomic, so resuming replays it whole). eventLen is rebound TOO so the
    * `offset + event_len == next_pos` on-disk invariant keeps holding —
    * consumers advance their cursor by either expression, and an inner
    * length would park the cursor MID-envelope (where the next header read
    * sees compressed garbage: a stall at best, misdecode at worst). Event
    * type, timestamp and server id stay the inner event's own.
    */
  private def rebind(e: BinlogEvent, outer: EventHeader): BinlogEvent = {
    val h2 = e.header.copy(offset = outer.offset, eventLen = outer.eventLen,
      nextPos = outer.nextPos)
    e match {
      case x: FormatDescriptionEvent => x.copy(header = h2)
      case x: QueryEvent => x.copy(header = h2)
      case x: RotateEvent => x.copy(header = h2)
      case x: XidEvent => x.copy(header = h2)
      case x: TableMapEvent => x.copy(header = h2)
      case x: RowsEvent => x.copy(header = h2)
      case x: GtidEvent => x.copy(header = h2)
      case x: PreviousGtidsEvent => x.copy(header = h2)
      case x: MariaGtidEvent => x.copy(header = h2)
      case x: MariaGtidListEvent => x.copy(header = h2)
      case x: MariaBinlogCheckpointEvent => x.copy(header = h2)
      case x: IntvarEvent => x.copy(header = h2)
      case x: RandEvent => x.copy(header = h2)
      case x: UserVarEvent => x.copy(header = h2)
      case x: IncidentEvent => x.copy(header = h2)
      case x: RowsQueryEvent => x.copy(header = h2)
      case x: BeginLoadQueryEvent => x.copy(header = h2)
      case x: AppendBlockEvent => x.copy(header = h2)
      case x: DeleteFileEvent => x.copy(header = h2)
      case x: ExecuteLoadQueryEvent => x.copy(header = h2)
      case x: OpaqueEvent => x.copy(header = h2)
    }
  }

  /** Result of one scan pass (`read-binlog`, `mysql_binlog.clj:707-752`). */
  final case class ScanResult(
      events: Vector[BinlogEvent],
      rotate: Option[RotateEvent],
      tableMaps: Map[Long, TableMapEvent])

  /** Iterator over decoded events from `startOffset`, stopping at ROTATE or
    * at the first incomplete event (whichever comes first). Threads the
    * table-map registry like the reference's scan loop.
    *
    * Checksums: the FDE at offset 4 is peeked once; when it declares CRC32,
    * every event's trailer is verified (hard error on mismatch) and body
    * decode sees event_len minus the 4 trailer bytes — without this, a
    * modern (>= 5.6.6) binlog silently decodes 4 garbage bytes into every
    * variable-length tail (QUERY sql, ROTATE file name, the last row image).
    */
  /** `decodeRowImages = false` is events-mode projection pushdown: rows
    * events resolve their (db, table) through the TABLE_MAP registry but
    * skip per-row image decode entirely — an event-level consumer never
    * reads the images, so decoding them is pure waste.
    */
  /** `forceChecksumLen` >= 0 skips the FDE peek — the TRANSACTION_PAYLOAD
    * inner stream has no magic/FDE at offset 4 and its events are never
    * checksummed, so the nested decode passes 0 explicitly.
    */
  def eventIterator(buf: ByteBuffer, startOffset: Long,
                    initialTableMaps: Map[Long, TableMapEvent] = Map.empty,
                    charset: Charset = StandardCharsets.ISO_8859_1,
                    unsignedCols: Array[Boolean] = null,
                    endOffset: Long = Long.MaxValue,
                    decodeRowImages: Boolean = true,
                    colCharsets: Array[Charset] = null,
                    forceChecksumLen: Int = -1,
                    failOnTornTail: Boolean = false): Iterator[BinlogEvent] =
    new Iterator[BinlogEvent] {
      private var tableMaps = initialTableMaps
      private var off = startOffset
      private var done = false
      private var nextEvent: BinlogEvent = _
      private val csLen = if (forceChecksumLen >= 0) forceChecksumLen else checksumLen(buf)
      // inner event stream of the TRANSACTION_PAYLOAD currently being
      // drained; its TABLE_MAPs also update THIS scan's registry
      private var inner: Iterator[BinlogEvent] = Iterator.empty

      private def fetch(): Unit = {
        while (nextEvent == null && !done) {
          if (inner.hasNext) {
            val e = inner.next()
            e match {
              case tm: TableMapEvent => tableMaps = tableMaps.updated(tm.tableId, tm)
              case _ =>
            }
            nextEvent = e
          } else readEventHeader(buf, off) match {
            case None =>
              // A torn tail — header or claimed body overruns the mapped
              // bytes — is NORMAL for a live last file or a crash-rotated
              // one, so the default is a clean stop at the last complete
              // event. `failOnTornTail` is the audit contract for logs
              // known to be closed: there a torn event can only mean
              // corruption (e.g. a flipped length field would otherwise
              // silently truncate the scan at this offset), so fail by
              // name instead of returning a prefix. Coordinate invariant:
              // `off`/`startOffset` are REGION-relative (index 0 = the
              // mapping base mapFile was given), so buf.capacity() is the
              // region's end in the same coordinates whatever the base —
              // a caller mixing file-absolute offsets with a non-zero
              // mapping base is wrong long before this EOF test.
              if (failOnTornTail && off != buf.capacity())
                throw new IllegalStateException(
                  s"torn or overrunning event at offset $off of a " +
                    s"${buf.capacity()}-byte binlog (onTornTail=fail): the log " +
                    "is declared complete, so this is corruption, not a live tail")
              done = true
            // events at/past endOffset are never DECODED (not merely
            // dropped) — a budget-bounded micro-batch costs O(batch delta)
            case Some(h0) if h0.offset >= endOffset => done = true
            case Some(h0) =>
              if (csLen > 0) verifyCrc32(buf, h0)
              // body readers see the trailer-free length; `off` advances by
              // the on-disk length so next_position stays consistent
              val h = if (csLen > 0) h0.copy(eventLen = h0.eventLen - csLen) else h0
              val e: BinlogEvent = h.eventType match {
                case EventType.FormatDescription => readFormatDescription(buf, h0)
                case EventType.Query => readQuery(buf, h, charset)
                case EventType.Rotate => readRotate(buf, h, charset)
                case EventType.Xid => readXid(buf, h)
                case EventType.TableMap =>
                  val tm = readTableMap(buf, h, charset)
                  tableMaps = tableMaps.updated(tm.tableId, tm)
                  tm
                case EventType.WriteRows | EventType.UpdateRows | EventType.DeleteRows |
                     EventType.WriteRowsV2 | EventType.UpdateRowsV2 | EventType.DeleteRowsV2 |
                     EventType.PartialUpdateRows | EventType.MariaWriteRowsCompressedV1 |
                     EventType.MariaUpdateRowsCompressedV1 |
                     EventType.MariaDeleteRowsCompressedV1 =>
                  if (decodeRowImages) readWudRows(buf, h, tableMaps, charset, unsignedCols, colCharsets)
                  else {
                    // table id leads the post-header in both v1 and v2
                    buf.position(h.offset.toInt + HeaderLen)
                    val tableId = nUint(bytes(buf, 6))
                    val tm = tableMaps.getOrElse(tableId,
                      throw new IllegalStateException(s"No TABLE_MAP event for table id $tableId"))
                    RowsEvent(h, tableId, tm.dbName, tm.tableName, Vector.empty, Vector.empty)
                  }
                case EventType.Gtid | EventType.AnonymousGtid => readGtid(buf, h)
                case EventType.GtidTagged => readGtidTagged(buf, h)
                case EventType.PreviousGtids => readPreviousGtids(buf, h)
                case EventType.RowsQuery => readRowsQuery(buf, h, charset)
                case EventType.BeginLoadQuery => readBeginLoadQuery(buf, h)
                case EventType.AppendBlock => readAppendBlock(buf, h)
                case EventType.DeleteFile => readDeleteFile(buf, h)
                case EventType.ExecuteLoadQuery => readExecuteLoadQuery(buf, h, charset)
                case EventType.MariaAnnotateRows => readAnnotateRows(buf, h, charset)
                case EventType.MariaGtid => readMariaGtid(buf, h)
                case EventType.MariaGtidList => readMariaGtidList(buf, h)
                case EventType.MariaBinlogCheckpoint =>
                  readMariaBinlogCheckpoint(buf, h, charset)
                case EventType.Intvar => readIntvar(buf, h)
                case EventType.Rand => readRand(buf, h)
                case EventType.UserVar => readUserVar(buf, h, charset)
                case EventType.Incident => readIncident(buf, h, charset)
                case EventType.MariaQueryCompressed => readQueryCompressed(buf, h, charset)
                case EventType.MariaStartEncryption => startEncryptionError(h.offset)
                case EventType.TransactionPayload =>
                  // decompress and re-enter the event loop over the inner
                  // stream; inner events surface with their log position
                  // rebound to the envelope's (offset, next_pos) — the
                  // transaction is atomic, so that is the resume contract.
                  // The envelope itself is not emitted: the inner events
                  // ARE its content (so a compressed log's event stats
                  // match its uncompressed twin's).
                  inner = eventIterator(readTransactionPayload(buf, h), 0L,
                    tableMaps, charset, unsignedCols,
                    decodeRowImages = decodeRowImages, colCharsets = colCharsets,
                    forceChecksumLen = 0)
                    .map(rebind(_, h0))
                  null
                case other =>
                  // a rows-carrying format with no decode path must fail
                  // loudly — opaque-skipping it would turn the scan into
                  // "zero change rows, no error" on a log full of data
                  if (EventType.isUnsupportedRows(other))
                    throw new IllegalStateException(
                      s"unsupported rows event ${EventType.name(other)} (type id $other) at " +
                        s"offset ${h.offset} — this decoder handles ROWS_EVENT v1 (23-25), " +
                        "v2 (30-32), PARTIAL_UPDATE (39) and TRANSACTION_PAYLOAD (40); " +
                        "pre-GA (v0) logs are not supported")
                  else OpaqueEvent(h)
              }
              off = h0.offset + h0.eventLen
              if (e != null) {
                if (e.isInstanceOf[RotateEvent]) done = true
                nextEvent = e
              }
          }
        }
      }

      def hasNext: Boolean = { fetch(); nextEvent != null }
      def next(): BinlogEvent = {
        fetch()
        val e = nextEvent; nextEvent = null
        if (e == null) throw new NoSuchElementException
        e
      }
    }

  /** Batch scan of one file (`read-binlog`): decode from `startOffset`,
    * stop at rotate/torn tail, return events + rotate + final table maps.
    */
  def readBinlog(fname: String, startOffset: Long = 4L,
                 tableMaps: Map[Long, TableMapEvent] = Map.empty,
                 charset: Charset = StandardCharsets.ISO_8859_1): ScanResult = {
    require(isBinlogFile(fname), s"'$fname' is not a mysql-binlog file!")
    val buf = mapFile(fname)
    var tms = tableMaps
    val events = Vector.newBuilder[BinlogEvent]
    var rotate: Option[RotateEvent] = None
    eventIterator(buf, startOffset, tableMaps, charset).foreach {
      case r: RotateEvent => rotate = Some(r); events += r
      case tm: TableMapEvent => tms = tms.updated(tm.tableId, tm); events += tm
      case e => events += e
    }
    ScanResult(events.result(), rotate, tms)
  }

  /** Does a canonical GTID-set string (`uuid:a-b[:c-d...][,uuid2:...]`)
    * contain `uuid:gno`?
    */
  def gtidSetContains(set: String, uuid: String, gno: Long): Boolean =
    set.split(",").iterator.filter(_.nonEmpty).exists { part =>
      val segs = part.split(":")
      segs.head.equalsIgnoreCase(uuid) && segs.tail.exists { iv =>
        iv.split("-") match {
          case Array(a, b) => gno >= a.toLong && gno <= b.toLong
          case Array(a) => gno == a.toLong
          case _ => false
        }
      }
    }

  /** The PREVIOUS_GTIDS set at the head of `path` (the GTIDs committed
    * BEFORE this file), or None for a pre-GTID log. Header-walk of the
    * first non-transactional events only — this is what makes locating a
    * GTID across a rotated set O(files) instead of O(bytes).
    */
  def previousGtidsOf(path: String): Option[String] = {
    val buf = mapFile(path)
    var pos = 4L
    var res: Option[String] = None
    var done = false
    while (!done) {
      readEventHeader(buf, pos) match {
        case Some(h) =>
          h.eventType match {
            case EventType.PreviousGtids =>
              res = Some(readPreviousGtids(buf, h).gtidSet); done = true
            case EventType.MariaStartEncryption => startEncryptionError(h.offset)
            case EventType.FormatDescription | EventType.Rotate | EventType.Stop =>
            case _ => done = true // txn content started: no PREVIOUS_GTIDS here
          }
          pos = h.offset + h.eventLen
        case None => done = true
      }
    }
    res
  }

  /** Byte position just after the commit of the transaction framed by GTID
    * `uuid:gno` in `path`, or None if that GTID does not COMMIT in this
    * file. Header walk + GTID/XID/QUERY decode only — row bodies are never
    * touched. Commit boundaries recognized once the target frame is found:
    * its XID; a DDL QUERY (implicit commit — anything but BEGIN, which
    * covers DDL-committed targets even as the last event of the file); or
    * the next GTID / ANONYMOUS_GTID frame (so a following anonymous
    * transaction is never skipped). Found-but-uncommitted at ROTATE/EOF is
    * deliberately None: that state only arises from a torn or mid-write
    * tail, and resolving it would resume INSIDE the target transaction.
    */
  def positionAfterGtid(path: String, uuid: String, gno: Long,
                        cs: Charset = StandardCharsets.ISO_8859_1,
                        tag: String = ""): Option[Long] = {
    val buf = mapFile(path)
    val csLen = checksumLen(buf)
    var pos = 4L
    var found = false
    var inBegin = false
    var result: Option[Long] = None
    var done = false
    while (!done) {
      readEventHeader(buf, pos) match {
        case Some(h) =>
          h.eventType match {
            case EventType.Gtid | EventType.AnonymousGtid | EventType.GtidTagged =>
              if (found) { result = Some(h.offset); done = true } // DDL-committed txn
              else if (h.eventType == EventType.Gtid) {
                val g = readGtid(buf, h)
                if (tag.isEmpty && g.sourceUuid.equalsIgnoreCase(uuid) &&
                  g.gno == gno) found = true
              } else if (h.eventType == EventType.GtidTagged) {
                // tagged and untagged GNOs are independent sequences: a
                // tag-less spec must never match a tagged frame (and vice
                // versa) — `uuid:1` and `uuid:patch:1` are different txns
                val g = readGtidTagged(buf, h)
                if (g.sourceUuid.equalsIgnoreCase(uuid) && g.gno == gno &&
                  g.tag.equalsIgnoreCase(tag) && tag.nonEmpty) found = true
              }
            case EventType.Xid if found =>
              result = Some(h.offset + h.eventLen); done = true
            case EventType.Query if found =>
              val q = readQuery(buf,
                if (csLen > 0) h.copy(eventLen = h.eventLen - csLen) else h, cs)
              // the SHARED boundary classifier, not a bare BEGIN check: an
              // XA transaction opens with "XA START ..." and stays open
              // through "XA END ..." — treating those as implicit commits
              // would resume INSIDE the transaction being skipped
              TxnBoundary.classify(q.sql) match {
                case TxnBoundary.Commit | TxnBoundary.ImplicitCommit =>
                  result = Some(h.offset + h.eventLen); done = true
                case TxnBoundary.Begin => inBegin = true
                case TxnBoundary.IntraTxn => // still inside
              }
            case EventType.ExecuteLoadQuery if found && !inBegin =>
              // a statement-format LOAD DATA group (GTID; BEGIN_LOAD_QUERY;
              // blocks; EXECUTE_LOAD_QUERY) commits at the execute — but a
              // BEGIN-wrapped one stays open until its XID/COMMIT
              result = Some(h.offset + h.eventLen); done = true
            case EventType.MariaStartEncryption => startEncryptionError(h.offset)
            case EventType.XaPrepare if found =>
              // the prepare ENDS this GTID's transaction in the log (the
              // XA COMMIT gets its own GTID later)
              result = Some(h.offset + h.eventLen); done = true
            case EventType.TransactionPayload if found =>
              // compressed transaction: the whole BEGIN..XID lives inside
              // this one envelope, so the envelope's end IS the commit
              // boundary — without this, a GTID committing as the last
              // transaction of a compressed log would resolve to None
              result = Some(h.offset + h.eventLen); done = true
            case EventType.Rotate => done = true
            case _ =>
          }
          pos = h.offset + h.eventLen
        case None => done = true
      }
    }
    // found-but-never-committed means the walk hit a torn/mid-write tail
    // inside the target transaction (healthy commits always resolve via
    // XID, a DDL QUERY, or the next GTID frame above) — returning a
    // position here would resume INSIDE the transaction the caller asked
    // to skip; None keeps resolveGtidStart's loud-error contract
    result
  }

  /** The GTID_LIST at the head of `path` (MariaDB's PREVIOUS_GTIDS
    * analogue: last GTID per (domain, server) logged before this file),
    * or None for a non-MariaDB / pre-GTID log. Header walk of the head
    * events only — same O(files) location contract as
    * [[previousGtidsOf]].
    */
  def mariaGtidListOf(path: String): Option[Vector[(Long, Long, Long)]] = {
    val buf = mapFile(path)
    var pos = 4L
    var res: Option[Vector[(Long, Long, Long)]] = None
    var done = false
    while (!done) {
      readEventHeader(buf, pos) match {
        case Some(h) =>
          h.eventType match {
            case EventType.MariaGtidList =>
              res = Some(readMariaGtidList(buf, h).gtids); done = true
            case EventType.MariaStartEncryption => startEncryptionError(h.offset)
            case EventType.FormatDescription | EventType.Rotate | EventType.Stop |
                 EventType.MariaBinlogCheckpoint =>
            case _ => done = true // txn content started: no GTID_LIST here
          }
          pos = h.offset + h.eventLen
        case None => done = true
      }
    }
    res
  }

  /** Is `domain`'s seq `seq` already executed per a GTID_LIST? Within a
    * domain MariaDB seq_nos are totally ordered regardless of which
    * server wrote them, so containment is "some entry of this domain has
    * reached seq".
    */
  def mariaListContains(list: Vector[(Long, Long, Long)], domain: Long,
                        seq: Long): Boolean =
    list.exists { case (d, _, q) => d == domain && q >= seq }

  /** MariaDB analogue of [[positionAfterGtid]]: byte position just after
    * the commit of the transaction framed by GTID `domain-server-seq` in
    * `path`, or None if that GTID does not commit in this file. Same
    * walk + boundary rules; the next MariaDB GTID frame also closes a
    * standalone (DDL) group whose QUERY was the file's last event.
    */
  def positionAfterMariaGtid(path: String, domain: Long, server: Long, seq: Long,
                             cs: Charset = StandardCharsets.ISO_8859_1): Option[Long] = {
    val buf = mapFile(path)
    val csLen = checksumLen(buf)
    var pos = 4L
    var found = false
    var inBegin = false
    var result: Option[Long] = None
    var done = false
    while (!done) {
      readEventHeader(buf, pos) match {
        case Some(h) =>
          val hs = if (csLen > 0) h.copy(eventLen = h.eventLen - csLen) else h
          h.eventType match {
            case EventType.MariaGtid =>
              if (found) { result = Some(h.offset); done = true }
              else {
                val g = readMariaGtid(buf, h)
                if (g.domainId == domain && g.header.serverId == server &&
                  g.seq == seq) {
                  found = true
                  // the GTID frame REPLACES BEGIN in MariaDB logs: a
                  // non-standalone frame opens a transaction, so an
                  // EXECUTE_LOAD_QUERY inside it must wait for the XID —
                  // only standalone (statement-format) groups end there
                  inBegin = !g.standalone
                }
              }
            case EventType.Gtid | EventType.AnonymousGtid | EventType.GtidTagged
                if found =>
              result = Some(h.offset); done = true
            case EventType.Xid if found =>
              result = Some(h.offset + h.eventLen); done = true
            case EventType.Query if found =>
              TxnBoundary.classify(readQuery(buf, hs, cs).sql) match {
                case TxnBoundary.Commit | TxnBoundary.ImplicitCommit =>
                  result = Some(h.offset + h.eventLen); done = true
                case TxnBoundary.Begin => inBegin = true
                case _ => // intra-txn: still inside
              }
            case EventType.MariaQueryCompressed if found =>
              TxnBoundary.classify(readQueryCompressed(buf, hs, cs).sql) match {
                case TxnBoundary.Commit | TxnBoundary.ImplicitCommit =>
                  result = Some(h.offset + h.eventLen); done = true
                case TxnBoundary.Begin => inBegin = true
                case _ =>
              }
            case EventType.ExecuteLoadQuery if found && !inBegin =>
              // statement-format LOAD DATA commits at the execute (see
              // positionAfterGtid); BEGIN-wrapped loads wait for XID
              result = Some(h.offset + h.eventLen); done = true
            case EventType.XaPrepare if found =>
              result = Some(h.offset + h.eventLen); done = true
            case EventType.MariaStartEncryption => startEncryptionError(h.offset)
            case EventType.Rotate => done = true
            case _ =>
          }
          pos = h.offset + h.eventLen
        case None => done = true
      }
    }
    result
  }

  /** Read the binlog index file; last line is the active log
    * (`most-recent-binlog`, `mysql_binlog.clj:813-817`).
    */
  def binlogFilesFromIndex(indexFile: String): Vector[String] = {
    if (hasUriScheme(indexFile)) {
      val (p, fs) = hadoopPathFs(indexFile)
      val in = fs.open(p)
      val text =
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toString("UTF-8")
        } finally in.close()
      text.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    } else {
      val src = scala.io.Source.fromFile(indexFile)
      try src.getLines().map(_.trim).filter(_.nonEmpty).toVector
      finally src.close()
    }
  }
}
