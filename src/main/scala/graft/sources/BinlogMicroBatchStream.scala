package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.binlog.{BinlogReader, EventType, TableMapEvent, TxnBoundary}

/** Streaming offset: (binlog file name, byte position of the next unread
  * event). Files order lexicographically (MySQL's `binlog.NNNNNN` naming),
  * so offsets are totally ordered as (file, pos) — the stream's implicit
  * ordering in the reference (SURVEY §2.6).
  */
case class BinlogOffset(file: String, pos: Long) extends Offset {
  override def json(): String =
    s"""{"file":"${file.replace("\\", "\\\\").replace("\"", "\\\"")}","pos":$pos}"""
}

object BinlogOffset {
  private val Pattern = """\{"file":"(.*)","pos":(\d+)\}""".r
  def fromJson(json: String): BinlogOffset = json match {
    case Pattern(f, p) => BinlogOffset(f.replace("\\\"", "\"").replace("\\\\", "\\"), p.toLong)
    case other => throw new IllegalArgumentException(s"bad binlog offset: $other")
  }
}

/** Micro-batch CDC stream over a growing/rotating set of binlog files.
  *
  * Replaces the reference's inotify + debounced re-read machinery
  * (`mysql_binlog.clj:765-799, 833-857`) with Structured Streaming's
  * trigger/offset model, upgrading its at-least-once delivery
  * (`mysql_binlog.clj:895-901`) to exactly-once per micro-batch via
  * checkpointed offsets:
  *
  *  - `latestOffset` walks complete event headers only — the torn-tail
  *    guard (`mysql_binlog.clj:316-328`) becomes "the offset never points
  *    into a half-written event";
  *  - rotation (`cdc-log-rotation`, `mysql_binlog.clj:888-905`): when a
  *    later file exists, the offset crosses to (nextFile, 4);
  *  - `maxBytesPerTrigger` bounds a batch — admission control in place of
  *    the reference's blocking bounded queue (`jdbc.clj:41-48`).
  */
class BinlogMicroBatchStream(schema: StructType, options: Map[String, String],
                             dbFilter: Option[String], tableFilter: Option[String],
                             deltaFilter: Option[String],
                             checkpointLocation: Option[String] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val path = options("path")
  private val maxBytes = options.get("maxbytespertrigger").map(_.toLong)

  /** Native Trigger.AvailableNow: the run processes exactly the log
    * present when the trigger started, in admission-bounded batches,
    * then terminates. Without this interface Spark's DEFAULT fallback
    * for admission-controlled sources is Trigger.Once semantics — ONE
    * batch — which silently under-drains any AvailableNow run that has
    * `maxBytesPerTrigger` set (found by CdcIndexRestartSpec: a resumed
    * cdcm4 pipeline stopped after one batch and probed a prefix of the
    * corpus). The capture is the last file's torn-tail-safe end; data
    * appended after the capture is left for the next run, which is the
    * AvailableNow contract and also what makes the clamp a guaranteed
    * termination bound.
    */
  @volatile private var availableNowEnd: Option[BinlogOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val fs = files()
    require(fs.nonEmpty, s"no binlog files under $path")
    availableNowEnd =
      Some(BinlogOffset(fs.last, lastSafePos(fs.last, 4L, Long.MaxValue)))
  }

  /** `a` at or before `b` in the rotation-ordered (file, pos) log order.
    * Both files must still be in the current listing: `indexOf` returns
    * -1 for an absent file, which would silently misorder the compare
    * and let the AvailableNow clamp hand out an offset into a missing
    * file instead of failing fast (log pruning between the capture and
    * a later `latestOffset` call is the realistic way to get here). */
  private def atOrBefore(a: BinlogOffset, b: BinlogOffset,
                         fs: Vector[String]): Boolean = {
    val ia = fs.indexOf(a.file)
    val ib = fs.indexOf(b.file)
    require(ia >= 0 && ib >= 0,
      s"binlog file rotated away under AvailableNow capture: " +
        s"${if (ia < 0) a.file else b.file} is no longer in the log listing")
    ia < ib || (ia == ib && a.pos <= b.pos)
  }

  /** Table-map snapshots learned by the offset walk: (file, pos) -> state
    * valid when decoding resumes at pos. Driver-side only; bounded by one
    * entry per latestOffset call per file (entries for stale offsets are
    * dropped on commit). The snapshot at each committed offset also
    * persists under the streaming checkpoint, so a restarted driver
    * resumes with O(batch delta) decode instead of replaying the current
    * file from offset 4 to rebuild TABLE_MAP state.
    */
  private[sources] val tableMapCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Map[Long, TableMapEvent]]

  /** Snapshot IO goes through Hadoop FileSystem resolved from the
    * checkpoint path itself, so hdfs:// / s3a:// / file: / bare local
    * checkpoints all persist next to the real checkpoint data — a
    * string-prefix strip would silently turn a remote URI into a bogus
    * CWD-relative local path (wrong place AND shareable across unrelated
    * driver runs).
    */
  private def snapshotPath: Option[org.apache.hadoop.fs.Path] =
    checkpointLocation.map(c =>
      new org.apache.hadoop.fs.Path(c, "graft-tablemap-snapshot.bin"))

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    scala.util.Try(org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  // restart path: reload the snapshot persisted at the last commit
  snapshotPath.foreach { p =>
    try {
      val fs = p.getFileSystem(hadoopConf)
      if (fs.exists(p)) {
        val in = new java.io.ObjectInputStream(fs.open(p))
        try {
          val (key, tms) = in.readObject()
            .asInstanceOf[((String, Long), Map[Long, TableMapEvent])]
          tableMapCache.update(key, tms)
        } finally in.close()
      }
    } catch {
      case _: Exception => // unreadable snapshot: fall back to replay-from-4
    }
  }

  private def persistSnapshot(key: (String, Long),
                              tms: Map[Long, TableMapEvent]): Unit =
    snapshotPath.foreach { p =>
      try {
        val fs = p.getFileSystem(hadoopConf)
        fs.mkdirs(p.getParent)
        val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".tmp")
        val out = new java.io.ObjectOutputStream(fs.create(tmp, true))
        try out.writeObject((key, tms)) finally out.close()
        // rename is atomic on HDFS/local; on object stores it's copy+delete,
        // which is fine — the read path tolerates a torn snapshot (replay)
        fs.delete(p, false)
        if (!fs.rename(tmp, p)) fs.delete(tmp, false)
      } catch {
        case _: Exception => // persistence is best-effort; restart replays
      }
    }

  private def files(): Vector[String] = BinlogSchemas.resolveFiles(path)

  /** Last *transaction-safe* byte position in `file` at or after `from`:
    * every event before it is fully on disk AND no transaction is open
    * across it. Rows events are written before their commit XID, so
    * stopping mid-transaction would emit uncommitted rows (with no xid);
    * instead the offset parks at the last commit/DDL/rotate boundary.
    * Header-only walk — QUERY events get a light decode to distinguish
    * BEGIN (opens txn) from DDL (its own implicit commit); no row decode.
    *
    * `byteBudget` bounds batch size but an open transaction is always
    * completed (otherwise a txn larger than the budget would stall the
    * stream forever).
    */
  private def lastSafePos(file: String, from: Long, byteBudget: Long): Long = {
    val buf = BinlogReader.mapFile(file)
    val charset = java.nio.charset.Charset.forName(options.getOrElse("charset", "ISO-8859-1"))
    // CRC32-era log: strip the 4 trailer bytes before reading QUERY sql —
    // otherwise "BEGIN" + trailer fails the BEGIN check and a mid-txn
    // position gets marked safe
    val cs = BinlogReader.checksumLen(buf)
    var pos = math.max(from, 4L)
    var lastSafe = pos
    // resume table-map tracking from a prior snapshot when available
    var tms = tableMapCache.getOrElse((file, pos), Map.empty[Long, TableMapEvent])
    var tmsAtSafe = tms
    var txnOpen = false
    // an explicit BEGIN/XA START is open (narrower than txnOpen, which a
    // LOAD DATA transfer or statement-context event also sets): decides
    // whether EXECUTE_LOAD_QUERY ends the transaction or sits inside one
    var beginOpen = false
    var done = false
    while (!done) {
      BinlogReader.readEventHeader(buf, pos) match {
        case Some(h) =>
          h.eventType match {
            case EventType.Query | EventType.MariaQueryCompressed =>
              // MariaDB QUERY_COMPRESSED (165) classifies like QUERY after
              // one inflate — falling to the default here would mark the
              // position after a compressed BEGIN as a safe boundary and
              // split the open transaction across micro-batches
              val hs = if (cs > 0) h.copy(eventLen = h.eventLen - cs) else h
              val q =
                if (h.eventType == EventType.Query) BinlogReader.readQuery(buf, hs, charset)
                else BinlogReader.readQueryCompressed(buf, hs, charset)
              TxnBoundary.classify(q.sql) match {
                case TxnBoundary.Begin => txnOpen = true; beginOpen = true
                case TxnBoundary.IntraTxn => // SAVEPOINT etc: stays inside
                                             // any open txn — NOT a safe
                                             // boundary to park on
                case _ => // COMMIT/ROLLBACK/DDL close it
                  txnOpen = false; beginOpen = false
              }
            case EventType.TableMap =>
              // trailer-stripped, like QUERY above: readTableMap now parses
              // the optional-metadata TLV block to the event END, so a CRC32
              // trailer left in eventLen would decode as TLV garbage
              val tm = BinlogReader.readTableMap(buf,
                if (cs > 0) h.copy(eventLen = h.eventLen - cs) else h, charset)
              tms = tms.updated(tm.tableId, tm)
              txnOpen = true
            case t if EventType.isRows(t) || t == EventType.RowsQuery ||
                      t == EventType.MariaAnnotateRows =>
              // ROWS_QUERY / MariaDB ANNOTATE_ROWS sit between BEGIN and
              // their rows events — inside the transaction, not a safe
              // boundary
              txnOpen = true
            case EventType.Gtid | EventType.AnonymousGtid | EventType.GtidTagged =>
              // the GTID frame PRECEDES its BEGIN: binding it to the txn
              // keeps frame + transaction atomic within one micro-batch
              // (an events-mode consumer attributing "complete through
              // uuid:n" per batch must never see them split); the tagged
              // frame (42, MySQL >= 8.3) plays the identical role
              txnOpen = true
            case EventType.MariaGtid =>
              // MariaDB's frame (162) plays the same role, but it also
              // REPLACES BEGIN for transactional groups: a non-standalone
              // frame must open beginOpen too, or an EXECUTE_LOAD_QUERY
              // inside the group would read as a statement end and park
              // the safe position between the execute and its XID
              txnOpen = true
              beginOpen = !BinlogReader.readMariaGtid(buf, h).standalone
            case EventType.Intvar | EventType.Rand | EventType.UserVar =>
              // statement-based-replication context binds to the NEXT
              // statement — parking between a SET INSERT_ID and the
              // statement it seeds would split them across batches
              txnOpen = true
            case EventType.BeginLoadQuery | EventType.AppendBlock =>
              // an in-flight LOAD DATA file transfer: the EXECUTE /
              // DELETE_FILE that completes it is the statement end
              txnOpen = true
            case EventType.ExecuteLoadQuery | EventType.DeleteFile =>
              // statement done — safe, unless an explicit BEGIN wraps the
              // load (then the transaction stays open until XID/COMMIT)
              txnOpen = beginOpen
            case EventType.MariaStartEncryption =>
              BinlogReader.startEncryptionError(h.offset)
            case _ => // XID, ROTATE, FDE, STOP... close/stay outside a txn
              txnOpen = false; beginOpen = false
          }
          pos = h.offset + h.eventLen
          if (!txnOpen) { lastSafe = pos; tmsAtSafe = tms }
          if (pos - from >= byteBudget && !txnOpen) done = true
        case None => done = true
      }
    }
    // snapshot for the NEXT batch starting at lastSafe: only trustworthy if
    // this walk itself started from complete state (pos 4 or a cached point)
    if (from <= 4L || tableMapCache.contains((file, from)))
      tableMapCache.update((file, lastSafe), tmsAtSafe)
    lastSafe
  }

  override def initialOffset(): Offset = {
    val fs = files()
    require(fs.nonEmpty, s"no binlog files under $path")
    options.get("startaftergtid") match {
      case Some(spec) => // GTID-addressed resume (only consulted when no checkpoint exists)
        val (f, p) = BinlogSchemas.resolveGtidStart(fs, spec)
        BinlogOffset(f, p)
      case None =>
        BinlogOffset(fs.head, 4L) // offset 4 skips the magic (`mysql_binlog.clj:925-927`)
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  /** A checkpointed file that disappeared means the logs were purged past
    * the checkpoint — silently applying the old byte position to a
    * DIFFERENT file would skip that file's prefix without any error.
    */
  private def fileIndexOrFail(fs: Vector[String], file: String): Int = {
    require(fs.nonEmpty, s"no binlog files under $path")
    val i = fs.indexOf(file)
    if (i < 0) throw new IllegalStateException(
      s"checkpointed binlog file '$file' is no longer present under $path — " +
        "logs were purged past the checkpoint; clear the checkpoint (optionally " +
        "with startAfterGtid to re-anchor) instead of silently skipping data")
    i
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BinlogOffset]
    val fs = files()
    val idx = fileIndexOrFail(fs, s.file)
    val budget = maxBytes.getOrElse(Long.MaxValue)
    // advance within the current file first
    val newPos = lastSafePos(fs(idx), s.pos, budget)
    val consumed = newPos - s.pos
    if (idx + 1 < fs.length && consumed < budget) {
      // rotation: later file(s) exist; advance into the last one within budget
      var i = idx + 1
      var off = BinlogOffset(fs(idx), newPos)
      var remaining = budget - consumed
      while (i < fs.length && remaining > 0) {
        val p = lastSafePos(fs(i), 4L, remaining)
        if (p > 4L || i == fs.length - 1) off = BinlogOffset(fs(i), p)
        remaining -= (p - 4L)
        i += 1
      }
      clampToAvailableNow(off, fs)
    } else clampToAvailableNow(BinlogOffset(fs(idx), newPos), fs)
  }

  /** Under Trigger.AvailableNow, never admit past the captured end. */
  private def clampToAvailableNow(cand: BinlogOffset,
                                  fs: Vector[String]): BinlogOffset =
    availableNowEnd match {
      case Some(end) => if (atOrBefore(cand, end, fs)) cand else end
      case None => cand
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BinlogOffset]
    val e = end.asInstanceOf[BinlogOffset]
    val fs = files()
    val si = fileIndexOrFail(fs, s.file)
    val ei = fileIndexOrFail(fs, e.file)
    (si to ei).flatMap { i =>
      val startPos = if (i == si) s.pos else 4L
      val endPos = if (i == ei) e.pos else Long.MaxValue
      if (endPos > startPos) {
        val snapshot =
          if (startPos > 4L) tableMapCache.getOrElse((fs(i), startPos), Map.empty[Long, TableMapEvent])
          else Map.empty[Long, TableMapEvent]
        Some(BinlogInputPartition(fs(i), startPos, endPos, snapshot))
      } else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BinlogReaderFactory(schema, options, dbFilter, tableFilter, deltaFilter)

  override def deserializeOffset(json: String): Offset = BinlogOffset.fromJson(json)

  /** Batches up to `end` are durable in the checkpoint: drop snapshots for
    * positions strictly before it (keeping the one AT `end` — the next
    * batch resumes there). Keeps the cache O(live files) for the lifetime
    * of the stream instead of one entry per trigger.
    */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[BinlogOffset]
    tableMapCache.keys.foreach { case k @ (f, p) =>
      if (f < e.file || (f == e.file && p < e.pos)) tableMapCache.remove(k)
    }
    // durable fast-path for restarts: the snapshot valid at the committed
    // offset rides along with the checkpoint
    tableMapCache.get((e.file, e.pos)).foreach { tms =>
      if (tms.nonEmpty) persistSnapshot((e.file, e.pos), tms)
    }
  }

  override def stop(): Unit = ()
}
