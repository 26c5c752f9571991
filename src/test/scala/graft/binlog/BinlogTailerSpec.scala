package graft.binlog

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite

import BinlogWriter._

/** The WatchService-armed live tail (reference: inotify watcher,
  * `mysql_binlog.clj:833-857`): appended transactions arrive through the
  * callback within the poll budget, only after their commit XID, across
  * rotations, with torn tails held back.
  */
class BinlogTailerSpec extends AnyFunSuite {

  private val cols = Seq(ColSpec.int, ColSpec.varchar(20))

  /** Wait for n callbacks; on timeout, name the tailer's death cause if
    * it died (a bare "got 1" is unadjudicable from a CI log).
    */
  private def await[A](q: ConcurrentLinkedQueue[A], n: Int,
                       t: BinlogTailer.Tailer = null, ms: Long = 45000): Vector[A] = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (q.size < n && System.nanoTime() < deadline &&
      (t == null || t.failure.isEmpty)) Thread.sleep(2)
    assert(q.size >= n, s"expected $n callbacks, got ${q.size}" +
      Option(t).flatMap(_.failure).fold("")(e => s"; tailer died: $e"))
    q.toArray.toVector.map(_.asInstanceOf[A])
  }

  test("appends arrive committed-only, in order, with their xid") {
    val dir = Files.createTempDirectory("tailer")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(0, "seed")), ts = 1)
      .writeXid(1, ts = 1)
    w.save(f1)

    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      val seed = await(got, 1, t)
      assert(seed.head.row(1) === "seed")
      assert(seed.head.xid === Some(1L))

      // append rows + a torn XID: rows must NOT surface yet
      w.writeTableMap(23, "bench", "lat", cols, ts = 2)
        .writeInsert(23, cols, Seq(Seq(1, "one"), Seq(2, "two")), ts = 2)
        .writeXid(2, ts = 2)
      w.saveTruncated(f1, 7)
      Thread.sleep(300)
      assert(got.size === 1, "uncommitted/torn rows leaked")

      w.save(f1) // XID completes -> the txn flushes
      val all = await(got, 3, t)
      assert(all.map(_.row(1)).drop(1) === Vector("one", "two"))
      assert(all.drop(1).forall(_.xid === Some(2L)))
      assert(all.map(c => (c.logPos, c.logSeq)) === all.map(c => (c.logPos, c.logSeq)).sorted)
    } finally t.close()
  }

  test("a hidden staging file with binlog magic is never discovered as a log") {
    val dir = Files.createTempDirectory("tailer-hidden")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
    w.save(f1)
    // a valid full binlog under a dot-name: atomic-save staging, an
    // operator's backup copy — magic matches, name says "not a log".
    // Its numeric tail would sort it newest; discovering it would make
    // crossCrashRotation abandon the real file (and chase a path that
    // vanishes when the stager renames it away)
    Files.write(dir.resolve(".wtmp-999-123456789"),
      new Writer().writeFormatDescription(ts = 9)
        .writeTableMap(23, "bench", "lat", cols, ts = 9)
        .writeInsert(23, cols, Seq(Seq(99, "ghost")), ts = 9)
        .writeXid(9, ts = 9).toBytes)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      await(got, 1, t)
      w.writeTableMap(23, "bench", "lat", cols, ts = 2)
        .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 2)
        .writeXid(2, ts = 2)
        .save(f1)
      val all = await(got, 2, t)
      assert(all.map(_.row(1)) === Vector("a", "b"),
        "the hidden file's rows leaked or the real file was abandoned")
      assert(all.forall(_.logFile === "binlog.000001"))
      assert(t.failure.isEmpty, s"tailer died: ${t.failure}")
    } finally t.close()
  }

  test("rotation: tail follows to the next file") {
    val dir = Files.createTempDirectory("tailer-rot")
    val f1 = dir.resolve("binlog.000001").toString
    new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
      .writeRotate("binlog.000002", ts = 1)
      .save(f1)
    val w2 = new Writer()
      .writeFormatDescription(ts = 2)
      .writeTableMap(23, "bench", "lat", cols, ts = 2)
      .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 2)
      .writeXid(2, ts = 2)
    w2.save(dir.resolve("binlog.000002").toString)

    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      val first = await(got, 2, t)
      assert(first.map(_.row(1)) === Vector("a", "b"))
      assert(first.map(_.logFile) === Vector("binlog.000001", "binlog.000002"))
      // live append to the rotated-to file
      w2.writeTableMap(23, "bench", "lat", cols, ts = 3)
        .writeInsert(23, cols, Seq(Seq(3, "c")), ts = 3)
        .writeXid(3, ts = 3)
        .save(dir.resolve("binlog.000002").toString)
      assert(await(got, 3, t).last.row(1) === "c")
    } finally t.close()
  }

  test("oversized txn streams in order with xid None (maxTxnRows cap)") {
    val dir = Files.createTempDirectory("tailer-overflow")
    val f1 = dir.resolve("binlog.000001").toString
    new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(0, "small")), ts = 1)
      .writeXid(1, ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 2)
      .writeInsert(23, cols, Seq(Seq(1, "a0"), Seq(2, "a1")), ts = 2)
      .writeInsert(23, cols, Seq(Seq(3, "b0"), Seq(4, "b1"), Seq(5, "b2")), ts = 2)
      .writeXid(2, ts = 2)
      .writeTableMap(23, "bench", "lat", cols, ts = 3)
      .writeInsert(23, cols, Seq(Seq(6, "tail")), ts = 3)
      .writeXid(3, ts = 3)
      .save(f1)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50, maxTxnRows = 3)
    try {
      val all = await(got, 7, t)
      assert(all.map(_.row(1)) === Vector("small", "a0", "a1", "b0", "b1", "b2", "tail"))
      assert(all.map(_.xid) ===
        Vector(Some(1L), None, None, None, None, None, Some(3L)))
    } finally t.close()
  }

  test("rotation races file creation: the ROTATE is re-observed, not lost") {
    val dir = Files.createTempDirectory("tailer-rot-race")
    val f1 = dir.resolve("binlog.000001").toString
    new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
      .writeRotate("binlog.000002", ts = 1) // target does NOT exist yet
      .save(f1)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      await(got, 1)
      Thread.sleep(200) // several drains with the rotation target missing
      new Writer()
        .writeFormatDescription(ts = 2)
        .writeTableMap(23, "bench", "lat", cols, ts = 2)
        .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 2)
        .writeXid(2, ts = 2)
        .save(dir.resolve("binlog.000002").toString)
      val all = await(got, 2, t)
      assert(all.last.row(1) === "b")
      assert(all.last.logFile === "binlog.000002")
    } finally t.close()
  }

  test("rotate into a visible-but-headerless file waits for its magic") {
    val dir = Files.createTempDirectory("tailer-headerless")
    val f2 = dir.resolve("binlog.000002")
    Files.createFile(f2) // exists, zero bytes: created but magic not flushed
    new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
      .writeRotate("binlog.000002", ts = 1)
      .save(dir.resolve("binlog.000001").toString)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      await(got, 1, t)
      // several polls with the rotated-to file headerless: discovery's
      // magic filter drops it from the listing, and crossCrashRotation
      // must read that as "early", not "purged" — the old code threw
      // a spurious 'disappeared' here and killed the tail
      Thread.sleep(300)
      assert(t.failure.isEmpty, s"tailer died on a headerless log: ${t.failure}")
      new Writer()
        .writeFormatDescription(ts = 2)
        .writeTableMap(23, "bench", "lat", cols, ts = 2)
        .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 2)
        .writeXid(2, ts = 2)
        .save(f2.toString)
      val all = await(got, 2, t)
      assert(all.last.row(1) === "b")
      assert(all.last.logFile === "binlog.000002")
    } finally t.close()
  }

  test("headerless current file is crossed once a strictly newer log exists") {
    val dir = Files.createTempDirectory("tailer-headerless-cross")
    Files.createFile(dir.resolve("binlog.000002")) // never gets its magic
    new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
      .writeRotate("binlog.000002", ts = 1)
      .save(dir.resolve("binlog.000001").toString)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      await(got, 1, t)
      // the server crashed mid-rotation (000002 never became a log) and
      // after restart opened 000003: the tail must move past the
      // headerless file to the newer real one
      new Writer()
        .writeFormatDescription(ts = 3)
        .writeTableMap(23, "bench", "lat", cols, ts = 3)
        .writeInsert(23, cols, Seq(Seq(3, "c")), ts = 3)
        .writeXid(3, ts = 3)
        .save(dir.resolve("binlog.000003").toString)
      val all = await(got, 2, t)
      assert(all.last.row(1) === "c")
      assert(all.last.logFile === "binlog.000003")
      assert(t.failure.isEmpty, s"tailer died: ${t.failure}")
    } finally t.close()
  }

  test("a purged current file still fails by name, not a silent stall") {
    val dir = Files.createTempDirectory("tailer-purged")
    val f1 = dir.resolve("binlog.000001")
    new Writer()
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
      .save(f1.toString)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      await(got, 1, t)
      Files.delete(f1)
      val deadline = System.nanoTime() + 45000000000L
      while (t.failure.isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
      assert(t.failure.exists(_.getMessage.contains("disappeared")), t.failure)
      assert(!t.isAlive)
    } finally t.close()
  }

  test("decode failure surfaces via failure/isAlive instead of a silent stall") {
    val dir = Files.createTempDirectory("tailer-fail")
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
    val bytes = w.toBytes
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x5a).toByte // corrupt
    Files.write(dir.resolve("binlog.000001"), bytes)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      val deadline = System.nanoTime() + 45000000000L
      while (t.failure.isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
      assert(t.failure.exists(_.getMessage.contains("CRC32 mismatch")), t.failure)
      assert(!t.isAlive)
    } finally t.close()
  }

  test("an INCIDENT kills the tail loudly; committed rows before it land") {
    val dir = Files.createTempDirectory("tailer-incident")
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1)
      .writeXid(1, ts = 1)
      .writeIncident(1, "lost events", ts = 2)
      .writeTableMap(23, "bench", "lat", cols, ts = 3)
      .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 3)
      .writeXid(2, ts = 3)
      .save(dir.resolve("binlog.000001").toString)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      val deadline = System.nanoTime() + 45000000000L
      while (t.failure.isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
      assert(t.failure.exists(m => m.getMessage.contains("INCIDENT") &&
        m.getMessage.contains("LOST_EVENTS")), t.failure)
      assert(!t.isAlive)
      // the committed txn before the incident was delivered; nothing after
      assert(got.toArray.toVector
        .map(_.asInstanceOf[BinlogTailer.Change].row(0)) === Vector(1))
    } finally t.close()
    // the reconciled-restart path: onIncident="ignore" tails past the
    // SAME historical incident and delivers both transactions
    val got2 = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t2 = BinlogTailer.start(dir.toString, got2.add, pollMs = 50,
      onIncident = "ignore")
    try {
      val all = await(got2, 2, t2)
      assert(t2.failure.isEmpty && all.map(_.row(0)) === Vector(1, 2))
    } finally t2.close()
  }

  test("checksummed log tails identically") {
    val dir = Files.createTempDirectory("tailer-crc")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1)
      .writeTableMap(23, "bench", "lat", cols, ts = 1)
      .writeInsert(23, cols, Seq(Seq(7, "crc")), ts = 1)
      .writeXid(9, ts = 1)
    w.save(f1)
    val got = new ConcurrentLinkedQueue[BinlogTailer.Change]()
    val t = BinlogTailer.start(dir.toString, got.add, pollMs = 50)
    try {
      val c = await(got, 1, t).head
      assert(c.row === Vector(7, "crc"))
      assert(c.xid === Some(9L))
    } finally t.close()
  }
}
