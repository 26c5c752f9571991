package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog._
import graft.binlog.BinlogWriter._

/** Deterministic single-byte corruption fuzz over a CRC32-checksummed log.
  *
  * Contracts pinned (same 120 seeded flips each run):
  *  - default (`onTornTail=truncate`): a flip either fails the scan
  *    loudly (CRC mismatch / named decode error) or the result is a clean
  *    PREFIX of the uncorrupted baseline in offset order — a flipped
  *    length field can legitimately masquerade as a torn tail (it is
  *    byte-indistinguishable from a crash-rotated or live file), but the
  *    scan must never surface altered values or non-prefix row sets;
  *  - `onTornTail=fail` (the closed-log audit mode): prefix truncation is
  *    also an error, so every flip either throws or leaves the full
  *    20-row result bit-identical.
  *
  * The 2x120 flip loops drive [[BinlogReader.eventIterator]] directly —
  * the decoder IS the contract under test, and a per-flip Spark job would
  * only add scheduler overhead; the rotated-set test goes through the
  * DSv2 source so the `ontorntail` option wiring stays covered.
  */
class CorruptionFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[Path]
  private def tempDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    tempDirs.synchronized { tempDirs += d }
    d
  }
  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))

  override def afterAll(): Unit = {
    spark.stop()
    tempDirs.foreach(deleteTree)
  }

  /** Decode every row image in offset order straight through the
    * iterator — CRC verification and the torn-tail contract included.
    */
  private def decodeRows(file: Path, strict: Boolean): Seq[(Long, String)] =
    BinlogReader.eventIterator(BinlogReader.mapFile(file.toString), 4L,
      failOnTornTail = strict)
      .collect { case re: RowsEvent =>
        (re.header.offset, (re.rows ++ re.afterRows).map(_.mkString("|")).mkString(";"))
      }.toSeq

  private def scanRows(dir: Path, strict: Boolean): Seq[(Long, String)] = {
    val r = spark.read.format("mysql-binlog")
    (if (strict) r.option("ontorntail", "fail") else r)
      .load(dir.toString)
      .collect()
      .map(r => (r.getAs[Long]("log_pos"),
        s"${r.getAs[String]("_delta_type")}:" +
          r.getAs[scala.collection.Seq[String]]("row").mkString("|")))
      .sortBy(_._1).toSeq
  }

  private def writeFixtureBytes(): Array[Byte] = {
    val base = tempDir("fuzz-base")
    val cols = Seq(ColSpec.int, ColSpec.varchar(24))
    val w = new Writer(checksum = true, rowsV2 = true).writeFormatDescription(ts = 1)
    for (i <- 1 to 20) {
      w.writeQuery("bench", "BEGIN", ts = i)
        .writeTableMap(5, "bench", "t", cols, ts = i)
        .writeInsert(5, cols, Seq(Seq[Any](i, s"word$i")), ts = i)
        .writeXid(100L + i, ts = i)
    }
    val file = w.save(base.resolve("binlog.000001").toString)
    Files.readAllBytes(java.nio.file.Paths.get(file))
  }

  private def withMutation(original: Array[Byte], pos: Int, bit: Int)
                          (f: Path => Unit): Unit = {
    val mutated = original.clone()
    mutated(pos) = (mutated(pos) ^ bit).toByte
    val dir = Files.createTempDirectory("fuzz-mut")
    Files.write(dir.resolve("binlog.000001"), mutated)
    try f(dir)
    finally deleteTree(dir)
  }

  private lazy val original = writeFixtureBytes()
  private lazy val baselineFile = {
    val d = tempDir("fuzz-baseline")
    Files.write(d.resolve("binlog.000001"), original)
  }

  test("default mode: flips throw or yield a clean prefix — never altered values") {
    val baseline = decodeRows(baselineFile, strict = false)
    assert(baseline.size === 20)
    val rnd = new scala.util.Random(42)
    var thrown = 0; var full = 0; var prefix = 0
    for (_ <- 1 to 120) {
      val pos = rnd.nextInt(original.length); val bit = 1 << rnd.nextInt(8)
      withMutation(original, pos, bit) { dir =>
        try {
          val rows = decodeRows(dir.resolve("binlog.000001"), strict = false)
          assert(rows === baseline.take(rows.size),
            s"NON-PREFIX result after flipping byte $pos bit $bit")
          if (rows.size == baseline.size) full += 1 else prefix += 1
        } catch {
          case e: org.scalatest.exceptions.TestFailedException => throw e
          case _: Throwable => thrown += 1
        }
      }
    }
    assert(thrown + full + prefix === 120)
    // CRC covers every event: the overwhelming outcome is a loud failure;
    // prefix truncation only from length-field flips
    assert(thrown >= 90, s"only $thrown/120 flips failed loudly (full=$full prefix=$prefix)")
  }

  test("onTornTail=fail does not false-positive on a healthy rotated set") {
    // non-last files end at their ROTATE event (the Some branch of the
    // header walk, not the torn-tail branch) and the last file ends at
    // EOF — strict mode must scan a complete rotated set identically
    val dir = tempDir("strict-rotated")
    val cols = Seq(ColSpec.int)
    val w1 = new Writer(checksum = true, rowsV2 = true).writeFormatDescription(ts = 1)
    for (i <- 1 to 5) {
      w1.writeQuery("d", "BEGIN", ts = i)
        .writeTableMap(5, "d", "t", cols, ts = i)
        .writeInsert(5, cols, Seq(Seq[Any](i)), ts = i)
        .writeXid(10L + i, ts = i)
    }
    w1.writeRotate("binlog.000002", ts = 9)
      .save(dir.resolve("binlog.000001").toString)
    val w2 = new Writer(checksum = true, rowsV2 = true).writeFormatDescription(ts = 10)
    for (i <- 6 to 9) {
      w2.writeQuery("d", "BEGIN", ts = i)
        .writeTableMap(5, "d", "t", cols, ts = i)
        .writeInsert(5, cols, Seq(Seq[Any](i)), ts = i)
        .writeXid(10L + i, ts = i)
    }
    w2.save(dir.resolve("binlog.000002").toString)
    assert(scanRows(dir, strict = true) === scanRows(dir, strict = false))
    assert(scanRows(dir, strict = true).size === 9)
  }

  test("onTornTail=fail: every flip throws or the full result is bit-identical") {
    val baseline = decodeRows(baselineFile, strict = true)
    assert(baseline.size === 20)
    val rnd = new scala.util.Random(42) // same seeded flips as above
    var thrown = 0; var intact = 0
    for (_ <- 1 to 120) {
      val pos = rnd.nextInt(original.length); val bit = 1 << rnd.nextInt(8)
      withMutation(original, pos, bit) { dir =>
        try {
          val rows = decodeRows(dir.resolve("binlog.000001"), strict = true)
          assert(rows === baseline,
            s"flip at byte $pos bit $bit changed a strict-mode scan silently")
          intact += 1
        } catch {
          case e: org.scalatest.exceptions.TestFailedException => throw e
          case _: Throwable => thrown += 1
        }
      }
    }
    assert(thrown + intact === 120)
    assert(intact <= 5, s"$intact/120 flips left the strict scan unchanged — " +
      "every byte of this fixture is CRC-covered, so flips should fail")
  }
}
