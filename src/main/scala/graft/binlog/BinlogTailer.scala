package graft.binlog

import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{FileSystems, Files, Path, Paths, StandardWatchEventKinds, WatchService}
import java.util.concurrent.TimeUnit

/** Millisecond-reactivity CDC tail over a growing/rotating binlog directory
  * — the engine's counterpart of the reference's inotify watcher + live
  * re-read machinery (`mysql_binlog.clj:833-857` watcher, `888-905`
  * rotation). Where the micro-batch source trades latency for exactly-once
  * batch semantics (poll-bound: trigger/2 + batch overhead), the tailer is
  * armed by a filesystem `WatchService`: append → wake → incremental decode
  * from the last complete event → callback, typically single-digit ms.
  *
  * Semantics match the DSv2 changes mode: committed rows only (buffered
  * until their XID, like the reference's txn stitching), torn tails held
  * back (the resume offset never points into a half-written event),
  * rotation followed automatically, CRC32 logs verified+stripped by the
  * shared [[BinlogReader.eventIterator]].
  *
  * Driver-side by design: tailing a local binlog is inherently a
  * single-process activity (so is the reference's watcher); the scale-out
  * path is the DSv2/streaming source. Pure JVM — no Spark dependency.
  */
object BinlogTailer {
  /** One committed change row. `row` holds decoded payload values in
    * table-map column order ([[RowImage.Unused]] for absent columns).
    */
  final case class Change(logFile: String, logPos: Long, logSeq: Int,
                          xid: Option[Long], db: String, table: String,
                          deltaType: String, row: RowImage.Image)

  /** `onIncident = "fail"` (default) kills the tail at an INCIDENT event;
    * `"ignore"` tails past it — the restart path after an operator has
    * reconciled an acknowledged incident (catch-up replays the whole file
    * set, so without the override a historical incident would re-kill
    * every restarted tailer; same contract as the DSv2 option).
    */
  def start(dir: String, onChange: Change => Unit,
            db: Option[String] = None, table: Option[String] = None,
            charset: Charset = StandardCharsets.ISO_8859_1,
            pollMs: Long = 200L, maxTxnRows: Int = 1000000,
            onIncident: String = "fail"): Tailer =
    new Tailer(Paths.get(dir), onChange, db, table, charset, pollMs, maxTxnRows,
      onIncident)

  final class Tailer private[BinlogTailer] (dir: Path, onChange: Change => Unit,
      dbF: Option[String], tableF: Option[String], charset: Charset, pollMs: Long,
      maxTxnRows: Int, onIncident: String)
    extends AutoCloseable {

    @volatile private var closed = false
    @volatile private var failed: Option[Throwable] = None
    private var file: Path = _

    /** The error that stopped the tail, if any — a CRC mismatch or missing
      * TABLE_MAP kills the tailing thread; consumers poll this (or notice
      * [[isAlive]] false) instead of mistaking a dead tail for a quiet log.
      */
    def failure: Option[Throwable] = failed
    def isAlive: Boolean = failed.isEmpty && !closed && thread.isAlive
    private var pos: Long = 4L
    private var tms: Map[Long, TableMapEvent] = Map.empty
    private var txn = Vector.empty[Change] // committed-only emission
    private var txnOverflowed = false      // oversized txn: stream, xid None
    private val ws: WatchService = FileSystems.getDefault.newWatchService()
    dir.register(ws, StandardWatchEventKinds.ENTRY_MODIFY, StandardWatchEventKinds.ENTRY_CREATE)

    private def binlogFiles(): Vector[Path] = {
      val s = Files.list(dir)
      try s.toArray.toVector.map(_.asInstanceOf[Path])
        // hidden files are never binlogs (mysqld names logs from the
        // log_bin basename): a dot-prefixed temp being staged into the
        // directory must not be discovered mid-write — its numeric
        // suffix could sort it "newest" and crossCrashRotation would
        // chase a file that vanishes on the very next rename
        .filterNot(_.getFileName.toString.startsWith("."))
        .filter(p => Files.isRegularFile(p) && {
          // an encrypted binlog appearing in the tailed directory (server
          // turned binlog_encryption on and rotated) must kill the tailer
          // by name — filtering it as "not a binlog" would leave the
          // tailer waiting on the old file forever, silently missing
          // every change in the new one
          // a file can vanish between the listing and this probe (log
          // purge under a live tail; a temp renamed away) — that is
          // "not a binlog", not a tailer death
          val magic = try BinlogReader.fileMagic(p.toString)
            catch { case _: java.io.FileNotFoundException |
                         _: java.nio.file.NoSuchFileException => None }
          if (magic.exists(java.util.Arrays.equals(_, BinlogReader.EncryptedMagic)))
            throw new IllegalStateException(
              s"binlog '$p' is encrypted (binlog_encryption=ON file magic) — " +
                "this engine reads unencrypted logs only")
          magic.exists(java.util.Arrays.equals(_, BinlogReader.Magic))
        })
        // numeric-extension order (999999 → 1000000 rollover-safe)
        .sortBy(p => (BinlogReader.fileOrdinal(p.toString), p.getFileName.toString))
      finally s.close()
    }

    private def wanted(d: String, t: String): Boolean =
      dbF.forall(_ == d) && tableF.forall(_ == t)

    // log_seq numbering: the shared [[ChangeSeqCounter]] rule; reset on
    // every file change (offset coincidences across files must not
    // continue the previous file's numbering)
    private val seqCounter = new ChangeSeqCounter

    private def emit(re: RowsEvent, base: Int): Unit = {
      val h = re.header
      val f = file.getFileName.toString
      def c(seq: Int, dt: String, img: RowImage.Image) =
        Change(f, h.offset, base + seq, None, re.dbName, re.tableName, dt, img)
      val fresh: Seq[Change] = h.eventType match {
        case t if EventType.isWriteRows(t) =>
          re.rows.zipWithIndex.map { case (r, i) => c(i, "insert", r) }
        case t if EventType.isDeleteRows(t) =>
          re.rows.zipWithIndex.map { case (r, i) => c(i, "delete", r) }
        case t if EventType.isUpdateRows(t) =>
          re.rows.zip(re.afterRows).zipWithIndex.flatMap {
            case ((b, a), i) => Seq(c(2 * i, "update-before", b), c(2 * i + 1, "update", a)) }
        case _ => Nil
      }
      if (txnOverflowed) fresh.foreach(onChange)
      else if (txn.size + fresh.size <= maxTxnRows) txn ++= fresh
      else {
        // oversized txn: flush in log order, degrade xid to None for the
        // whole txn (same policy as the DSv2 source's maxTxnRows)
        txnOverflowed = true
        txn.foreach(onChange)
        txn = Vector.empty
        fresh.foreach(onChange)
      }
    }

    /** Decode everything complete since the last drain; returns true if the
      * tail advanced (more may follow immediately after a rotate).
      */
    private def drain(): Boolean = {
      val start = pos
      // headerless-file race: a freshly created log can be OBSERVED
      // between its creation and the server flushing the 4 magic bytes
      // (rotation races file creation — the visible-but-empty variant of
      // the rotate-not-visible case handled below). The magic check
      // would name it corrupt and kill the tail; it is merely EARLY —
      // wait for the next poll instead. A file that never grows past 4
      // bytes stalls the tail visibly (isAlive stays true, no progress),
      // which is the correct read of "the server created a log and wrote
      // nothing": there is nothing to decode yet.
      // exists→size is NOT atomic: a purge can delete the file between
      // the two probes, and letting NoSuchFileException escape here would
      // kill the tailer with an anonymous death — the very failure mode
      // the guard exists to avoid. Treat a vanish as "nothing to decode";
      // crossCrashRotation owns naming a permanent disappearance.
      val size = try { if (!Files.exists(file)) -1L else Files.size(file) }
        catch { case _: java.io.FileNotFoundException |
                     _: java.nio.file.NoSuchFileException => -1L }
      if (size < 4L) return false
      // the same race one step later: the purge can also land between
      // the size probe and the open. Once the map IS established, a
      // concurrent unlink cannot fault it (POSIX keeps mapped pages
      // valid) — the open is the last vulnerable instant
      val buf = try BinlogReader.mapFile(file.toString)
        catch { case _: java.io.FileNotFoundException |
                     _: java.nio.file.NoSuchFileException => return false }
      var rotateTo: Option[String] = None
      var rotateAt = -1L
      BinlogReader.eventIterator(buf, pos, tms, charset).foreach { e =>
        e match {
          case tm: TableMapEvent => tms = tms.updated(tm.tableId, tm)
          case re: RowsEvent =>
            val base = seqCounter.advance(re)
            if (wanted(re.dbName, re.tableName)) emit(re, base)
          case x: XidEvent =>
            if (txnOverflowed) { txn.foreach(onChange); txnOverflowed = false }
            else txn.foreach(ch => onChange(ch.copy(xid = Some(x.xid))))
            txn = Vector.empty
          case q: QueryEvent if TxnBoundary.closes(q.sql) =>
            // QUERY(COMMIT) ends non-XID transactions (non-transactional /
            // mixed-engine writes); DDL implicitly commits. Flush with no
            // xid — same boundary rule as the DSv2 source — so these rows
            // are neither withheld nor stamped with the NEXT txn's xid.
            txn.foreach(onChange)
            txn = Vector.empty
            txnOverflowed = false
          case e if e.header.eventType == EventType.XaPrepare =>
            // XA branch prepared: rows fully logged here, commit arrives
            // later as its own transaction — flush now (xid None), same
            // rule as the DSv2 source
            txn.foreach(onChange)
            txn = Vector.empty
            txnOverflowed = false
          case r: RotateEvent => rotateTo = Some(r.nextFile); rotateAt = r.header.offset
          case ie: IncidentEvent if onIncident != "ignore" =>
            // catch-up and live rows alike are DELIVERED by this tail, so
            // any incident it decodes covers data a consumer sees: kill the
            // thread (same surfacing contract as a CRC mismatch) rather
            // than silently tailing rows the server itself flagged as
            // possibly incomplete; restart with onIncident="ignore" after
            // reconciling
            throw new IllegalStateException(
              s"INCIDENT event at $file:${ie.header.offset} (${ie.typeName}" +
                (if (ie.message.nonEmpty) s", '${ie.message}'" else "") +
                "): the server recorded a possible replication gap; tail " +
                "stopped — reconcile and restart past it")
          case _ =>
        }
        // v4 next_position = end of this event on disk (trailer included),
        // so it is the correct resume point even on checksummed logs where
        // the decoded header's event_len excludes the CRC trailer. max():
        // the cursor must never move backward — a TRANSACTION_PAYLOAD's
        // inner events all carry the envelope's position
        pos = math.max(pos, if (e.header.nextPos > pos) e.header.nextPos
                            else e.header.offset + e.header.eventLen)
      }
      rotateTo match {
        case Some(next) if Files.exists(dir.resolve(next)) =>
          // rotation at a txn boundary is the normal case; anything still
          // buffered flushes uncommitted (xid None), matching the DSv2
          // source's rotation flush
          txn.foreach(onChange)
          txn = Vector.empty
          txnOverflowed = false
          file = dir.resolve(next)
          pos = 4L
          tms = Map.empty // per-file state, like the reference's scan
          seqCounter.reset()
          true
        case Some(_) =>
          // the rotated-to file is not visible yet (rotation races file
          // creation): rewind to the ROTATE so the next wake re-observes it
          // instead of forgetting the rotation forever
          pos = rotateAt
          rotateAt > start
        case None => pos > start
      }
    }

    /** Crash rotation: a server that died and restarted opens the next
      * file WITHOUT appending a ROTATE to the old one. Once a strictly
      * newer file exists, the current file is final (a server never
      * appends after moving on) — cross to it. Without this the tailer
      * re-reads the old EOF forever: a silent stall.
      *
      * Unlike the explicit-ROTATE path (which flushes buffered rows as
      * uncommitted), a transaction left open at a crash boundary is
      * known-rolled-back — InnoDB recovery undoes it on restart — so the
      * buffer is DROPPED, not flushed: consumers never see phantom
      * changes for a transaction the server itself discarded. (If the
      * same transaction had already overflowed `maxTxnRows`, its head was
      * streamed with xid None before the crash was observable — that
      * xid-absence is the uncommitted marker consumers already handle.)
      *
      * If the current file is no longer listed at all (purged under a
      * live tail), fail loudly through [[failure]] — mirroring the
      * micro-batch source's fileIndexOrFail — instead of re-polling
      * forever on a file that can never advance. Two refinements on that
      * rule (both vanish-vs-fresh disambiguations):
      *  - the current file can be PRESENT but headerless (a just-rotated-to
      *    log whose magic hasn't flushed): discovery's magic filter drops
      *    it from the listing, but that is "early", not "purged" — wait,
      *    unless a strictly newer real log exists (the server moved on;
      *    cross to it, dropping the crash-rolled-back buffer as usual);
      *  - a file absent from BOTH the listing and a direct exists() probe
      *    can still be a transient race (purge script mid-rename), so the
      *    named failure fires only on the second consecutive absent poll.
      */
    private var absentPolls = 0
    private def crossCrashRotation(): Boolean = {
      val fs = binlogFiles()
      val i = fs.indexWhere(_.getFileName == file.getFileName)
      if (i < 0) {
        val present = try Files.exists(file)
          catch { case _: SecurityException => false }
        if (present) {
          absentPolls = 0
          // headerless fresh log: cross only past it if the server already
          // opened a strictly newer real log (numeric-extension order)
          val ord = BinlogReader.fileOrdinal(file.toString)
          val next = fs.find(p => BinlogReader.fileOrdinal(p.toString) > ord)
          next match {
            case Some(n) =>
              txn = Vector.empty
              txnOverflowed = false
              file = n
              pos = 4L
              tms = Map.empty
              seqCounter.reset()
              return true
            case None => return false
          }
        }
        absentPolls += 1
        if (absentPolls >= 2)
          throw new IllegalStateException(
            s"binlog file ${file.getFileName} disappeared from $dir (purged?); " +
              s"remaining: ${fs.map(_.getFileName).mkString("[", ", ", "]")} — " +
              "restart the tailer from a surviving file")
        return false
      }
      absentPolls = 0
      if (i < fs.size - 1) {
        txn = Vector.empty
        txnOverflowed = false
        file = fs(i + 1)
        pos = 4L
        tms = Map.empty
        seqCounter.reset()
        true
      } else false
    }

    private val thread = new Thread(() => {
      try {
        // initial catch-up over pre-existing files, then live-tail the last
        var fs = binlogFiles()
        while (fs.isEmpty && !closed) { Thread.sleep(10); fs = binlogFiles() }
        if (!closed) {
          file = fs.head
          while (drain() || crossCrashRotation()) ()
          while (!closed) {
            val key = ws.poll(pollMs, TimeUnit.MILLISECONDS) // timed poll = NFS fallback
            if (key != null) { key.pollEvents(); key.reset() }
            while (drain() || crossCrashRotation()) ()
          }
        }
      } catch {
        case _: InterruptedException | _: java.nio.file.ClosedWatchServiceException =>
        case e: Throwable if !closed => failed = Some(e)
      }
    }, s"binlog-tailer-$dir")
    thread.setDaemon(true)
    thread.start()

    override def close(): Unit = {
      closed = true
      ws.close()
      thread.interrupt()
      thread.join(5000)
    }
  }
}
