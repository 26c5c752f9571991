package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.BinlogWriter._

/** The streaming fast path: the offset walk snapshots TABLE_MAP state so a
  * later micro-batch decodes from its start offset directly (O(delta)),
  * instead of replaying the file prefix (O(file)).
  */
class TableMapSnapshotSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.varchar(20))

  test("maxBytesPerTrigger: batches are bounded, but an open txn always completes") {
    val dir = Files.createTempDirectory("admission")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer().writeFormatDescription(ts = 1000)
    // txn 1: small; txn 2: one 200-row insert (far larger than the budget);
    // txn 3: small
    w.writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1000)
      .writeXid(1, ts = 1000)
    w.writeTableMap(23, "foo", "auto", cols, ts = 1001)
      .writeInsert(23, cols, (100 until 300).map(i => Seq[Any](i, s"bulk$i")), ts = 1001)
      .writeXid(2, ts = 1001)
    w.writeTableMap(23, "foo", "auto", cols, ts = 1002)
      .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 1002)
      .writeXid(3, ts = 1002)
    w.save(f1)

    val schema = BinlogSchemas.forOptions(Map("payloadddl" -> "id INT, value STRING"))
    val stream = new BinlogMicroBatchStream(schema,
      Map("path" -> dir.toString, "payloadddl" -> "id INT, value STRING",
        "maxbytespertrigger" -> "200"), // ~2 small events worth
      None, None, None)
    val o0 = stream.initialOffset().asInstanceOf[BinlogOffset]
    val o1 = stream.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[BinlogOffset]
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable()).asInstanceOf[BinlogOffset]
    val o3 = stream.latestOffset(o2, ReadLimit.allAvailable()).asInstanceOf[BinlogOffset]
    // each step advances (no stall), ends only on txn boundaries, and the
    // giant txn is crossed in one step despite the budget
    assert(o1.pos > o0.pos && o2.pos > o1.pos)
    val fileLen = new java.io.File(f1).length
    assert(o3.pos === fileLen, s"stream did not drain: ${o3.pos} vs $fileLen")
  }

  test("second micro-batch gets a snapshot partition and decodes only the delta") {
    val dir = Files.createTempDirectory("tm-snap")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1000)
      .writeXid(1, ts = 1000)
    w.save(f1)

    val schema = BinlogSchemas.forOptions(Map("payloadddl" -> "id INT, value STRING"))
    val stream = new BinlogMicroBatchStream(schema,
      Map("path" -> dir.toString, "payloadddl" -> "id INT, value STRING"),
      None, None, None)

    val o0 = stream.initialOffset()
    val o1 = stream.latestOffset(o0, ReadLimit.allAvailable())
    // batch 1 consumed everything; now the "database" appends a txn
    w.writeTableMap(23, "foo", "auto", cols, ts = 1001)
      .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 1001)
      .writeXid(2, ts = 1001)
      .save(f1)
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())

    val parts = stream.planInputPartitions(o1, o2)
    assert(parts.length === 1)
    val p = parts.head.asInstanceOf[BinlogInputPartition]
    assert(p.startPos > 4L)
    // the walk from o0 -> o1 snapshotted state at o1; batch 2 must use it
    assert(p.initialTableMaps.nonEmpty,
      s"no table-map snapshot for partition at ${p.startPos}; cache=${stream.tableMapCache.keys}")

    // and the snapshot decode produces exactly the delta rows
    val reader = stream.createReaderFactory().createReader(p)
      .asInstanceOf[org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow]]
    val rows = Iterator.continually(if (reader.next()) Some(reader.get().copy()) else None)
      .takeWhile(_.isDefined).flatten.toVector
    assert(rows.length === 1)
    assert(rows.head.getInt(9) === 2) // payload id of the appended row
  }

  test("commit() prunes table-map snapshots below the committed offset") {
    val dir = Files.createTempDirectory("tm-prune")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer().writeFormatDescription(ts = 1000)
    val schema = BinlogSchemas.forOptions(Map("payloadddl" -> "id INT, value STRING"))
    val stream = new BinlogMicroBatchStream(schema,
      Map("path" -> dir.toString, "payloadddl" -> "id INT, value STRING"),
      None, None, None)

    // a long-running CDC stream: many triggers, each appending one txn —
    // without commit-time pruning the cache grows one entry per trigger
    // for the stream's lifetime (driver leak)
    var off = {
      w.writeTableMap(23, "foo", "auto", cols, ts = 1000)
        .writeInsert(23, cols, Seq(Seq(0, "r")), ts = 1000)
        .writeXid(1, ts = 1000).save(f1)
      stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
        .asInstanceOf[BinlogOffset]
    }
    for (i <- 1 to 50) {
      w.writeTableMap(23, "foo", "auto", cols, ts = 1000 + i)
        .writeInsert(23, cols, Seq(Seq(i, s"r$i")), ts = 1000 + i)
        .writeXid(1 + i, ts = 1000 + i).save(f1)
      val next = stream.latestOffset(off, ReadLimit.allAvailable()).asInstanceOf[BinlogOffset]
      stream.commit(next) // Spark commits each batch after it's durable
      off = next
    }
    // bounded: only the snapshot at (or above) the committed offset survives
    assert(stream.tableMapCache.size <= 2,
      s"cache leaked: ${stream.tableMapCache.size} entries ${stream.tableMapCache.keys}")
    assert(stream.tableMapCache.contains((f1, off.pos)),
      s"snapshot at committed offset evicted; cache=${stream.tableMapCache.keys}")

    // the surviving snapshot still powers the fast path for the next batch
    w.writeTableMap(23, "foo", "auto", cols, ts = 2000)
      .writeInsert(23, cols, Seq(Seq(999, "last")), ts = 2000)
      .writeXid(99, ts = 2000).save(f1)
    val fin = stream.latestOffset(off, ReadLimit.allAvailable())
    val parts = stream.planInputPartitions(off, fin)
    assert(parts.length === 1)
    assert(parts.head.asInstanceOf[BinlogInputPartition].initialTableMaps.nonEmpty)
  }

  test("snapshot persists in the checkpoint: a restarted stream keeps the O(delta) fast path") {
    val dir = Files.createTempDirectory("tm-persist")
    val ckpt = Files.createTempDirectory("tm-persist-ckpt").toString
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer().writeFormatDescription(ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, "a")), ts = 1000)
      .writeXid(1, ts = 1000)
    w.save(f1)
    val opts = Map("path" -> dir.toString, "payloadddl" -> "id INT, value STRING")
    val schema = BinlogSchemas.forOptions(opts)

    val s1 = new BinlogMicroBatchStream(schema, opts, None, None, None, Some(ckpt))
    val o1 = s1.latestOffset(s1.initialOffset(), ReadLimit.allAvailable())
    s1.commit(o1) // writes the snapshot file

    // "driver restart": a brand-new stream instance, empty in-memory cache,
    // same checkpoint — Spark replays the last batch range (o0..o1) or
    // continues (o1..o2); the persisted snapshot must make o1 a fast start
    w.writeTableMap(23, "foo", "auto", cols, ts = 1001)
      .writeInsert(23, cols, Seq(Seq(2, "b")), ts = 1001)
      .writeXid(2, ts = 1001).save(f1)
    val s2 = new BinlogMicroBatchStream(schema, opts, None, None, None, Some(ckpt))
    val o2 = s2.latestOffset(o1, ReadLimit.allAvailable())
    val parts = s2.planInputPartitions(o1, o2)
    assert(parts.length === 1)
    val p = parts.head.asInstanceOf[BinlogInputPartition]
    assert(p.startPos > 4L)
    assert(p.initialTableMaps.nonEmpty,
      s"restarted stream lost the snapshot; cache=${s2.tableMapCache.keys}")
  }

  test("AvailableNow: capture drains to the captured end in bounded steps; later appends excluded") {
    val dir = Files.createTempDirectory("availnow")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer().writeFormatDescription(ts = 1000)
    (0 until 12).foreach { i =>
      w.writeTableMap(23, "foo", "auto", cols, ts = 1000 + i)
        .writeInsert(23, cols, Seq(Seq(i, s"r$i")), ts = 1000 + i)
        .writeXid(i + 1, ts = 1000 + i)
    }
    w.save(f1)

    val stream = new BinlogMicroBatchStream(
      BinlogSchemas.forOptions(Map("payloadddl" -> "id INT, value STRING")),
      Map("path" -> dir.toString, "payloadddl" -> "id INT, value STRING",
        "maxbytespertrigger" -> "300"),
      None, None, None)
    stream.prepareForTriggerAvailableNow()
    val capturedEnd = new java.io.File(f1).length

    // data appended AFTER the capture must not be admitted this run
    val w2 = new Writer().writeFormatDescription(ts = 2000)
    (0 until 5).foreach { i =>
      w2.writeTableMap(23, "foo", "auto", cols, ts = 2000 + i)
        .writeInsert(23, cols, Seq(Seq(100 + i, s"late$i")), ts = 2000 + i)
        .writeXid(100 + i, ts = 2000 + i)
    }
    w2.save(dir.resolve("binlog.000002").toString)

    var off = stream.initialOffset().asInstanceOf[BinlogOffset]
    var steps = 0
    var prev = -1L
    while (off.pos != capturedEnd || off.file != f1) {
      val next = stream.latestOffset(off, ReadLimit.allAvailable())
        .asInstanceOf[BinlogOffset]
      assert(next.pos > prev, s"no progress at $off")
      prev = next.pos
      off = next
      steps += 1
      assert(steps < 50, "drain did not terminate")
    }
    // MULTIPLE bounded batches (the Trigger.Once fallback would need 1),
    // parking exactly at the captured end, never entering file 2
    assert(steps >= 3, s"expected several bounded admission steps, got $steps")
    assert(off.file === f1 && off.pos === capturedEnd)
  }
}
