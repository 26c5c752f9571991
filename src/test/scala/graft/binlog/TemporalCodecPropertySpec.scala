package graft.binlog

import java.nio.file.Files
import java.time.{Duration, LocalDateTime}
import org.scalatest.funsuite.AnyFunSuite

import BinlogWriter._

/** Randomized round-trip coverage for the 5.6+ packed temporals across
  * EVERY fsp (0..6) — seeds are fixed, values align to the storage unit
  * (100^(3-ceil(fsp/2)) micros), ranges span the documented domains
  * (DATETIME year 1..9999, TIME ±838:59:59, TIMESTAMP 32-bit epoch).
  * The writer and reader implement the my_time.cc layouts independently
  * enough (signed TIME2 vs offset int part) that a systematic error in
  * either shows as a mismatch here.
  */
class TemporalCodecPropertySpec extends AnyFunSuite {

  private def storageUnit(fsp: Int): Int = {
    val n = (fsp + 1) / 2
    math.pow(100, 3 - n).toInt
  }

  test("DATETIME2 round-trips across fsp 0..6 (120 random values each)") {
    val rnd = new scala.util.Random(42)
    for (fsp <- 0 to 6) {
      val unit = storageUnit(fsp)
      val vals = (1 to 120).map { _ =>
        val usec = (rnd.nextInt(1000000) / unit) * unit
        LocalDateTime.of(1 + rnd.nextInt(9999), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28),
          rnd.nextInt(24), rnd.nextInt(60), rnd.nextInt(60), usec * 1000)
      }
      val cols = Seq(ColSpec.datetime2(fsp))
      val dir = Files.createTempDirectory(s"dt2-prop-$fsp")
      val path = new Writer()
        .writeFormatDescription()
        .writeTableMap(5, "d", "t", cols)
        .writeInsert(5, cols, vals.map(Seq[Any](_)))
        .save(dir.resolve("binlog.000001").toString)
      val got = BinlogReader.readBinlog(path).events
        .collectFirst { case r: RowsEvent => r.rows.map(_.head) }.get
      assert(got === vals.toVector, s"fsp=$fsp")
    }
  }

  test("TIME2 round-trips across fsp 0..6 incl. negatives and > 24 h") {
    val rnd = new scala.util.Random(7)
    val maxSec = 838L * 3600 + 59 * 60 + 59
    for (fsp <- 0 to 6) {
      val unit = storageUnit(fsp)
      val vals = (1 to 120).map { _ =>
        val sec = (rnd.nextLong() % (maxSec + 1)).abs
        val usec = (rnd.nextInt(1000000) / unit) * unit
        val d = Duration.ofSeconds(sec, usec * 1000L)
        if (rnd.nextBoolean()) d.negated() else d
      }
      val cols = Seq(ColSpec.time2(fsp))
      val dir = Files.createTempDirectory(s"t2-prop-$fsp")
      val path = new Writer()
        .writeFormatDescription()
        .writeTableMap(5, "d", "t", cols)
        .writeInsert(5, cols, vals.map(Seq[Any](_)))
        .save(dir.resolve("binlog.000001").toString)
      val got = BinlogReader.readBinlog(path).events
        .collectFirst { case r: RowsEvent => r.rows.map(_.head) }.get
      // in-range positive < 24h values legitimately arrive as LocalTime
      val norm = got.map {
        case lt: java.time.LocalTime => Duration.ofNanos(lt.toNanoOfDay)
        case d: Duration => d
      }
      assert(norm === vals.toVector, s"fsp=$fsp")
    }
  }

  test("TIME2 writer truncates unaligned negative micros toward zero (not a whole second off)") {
    // -1.000001 s at fsp=2: sub-unit micros must truncate to -1.00 s;
    // naive packing would floor the int part to -2 s while the frac field
    // dropped its compensating remainder
    val cols = Seq(ColSpec.time2(2), ColSpec.time2(4), ColSpec.time2(0))
    val row = Seq[Any](
      Duration.ofSeconds(-1).minusNanos(1000),      // -1.000001 s -> -1.00
      Duration.ofSeconds(-2).minusNanos(55000),     // -2.000055 s -> -2.0000 (unit 100us)
      Duration.ofSeconds(-3).minusMillis(999))      // -3.999 s -> -3 (fsp 0)
    val dir = Files.createTempDirectory("t2-trunc")
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(5, "d", "t", cols)
      .writeInsert(5, cols, Seq(row))
      .save(dir.resolve("binlog.000001").toString)
    val img = BinlogReader.readBinlog(path).events
      .collectFirst { case r: RowsEvent => r.rows.head }.get
    assert(img(0) === Duration.ofSeconds(-1))
    assert(img(1) === Duration.ofSeconds(-2))
    assert(img(2) === Duration.ofSeconds(-3))
  }

  test("TIMESTAMP2 round-trips across fsp 0..6 over the 32-bit epoch range") {
    val rnd = new scala.util.Random(99)
    for (fsp <- 0 to 6) {
      val unit = storageUnit(fsp)
      val vals = (1 to 120).map { _ =>
        // sec >= 1: epoch 0 is the zero timestamp and decodes as NULL
        val sec = 1L + (rnd.nextLong() % 0xfffffffeL).abs
        val usec = (rnd.nextInt(1000000) / unit) * unit
        LocalDateTime.ofEpochSecond(sec, usec * 1000, java.time.ZoneOffset.UTC)
      }
      val cols = Seq(ColSpec.timestamp2(fsp))
      val dir = Files.createTempDirectory(s"ts2-prop-$fsp")
      val path = new Writer()
        .writeFormatDescription()
        .writeTableMap(5, "d", "t", cols)
        .writeInsert(5, cols, vals.map(Seq[Any](_)))
        .save(dir.resolve("binlog.000001").toString)
      val got = BinlogReader.readBinlog(path).events
        .collectFirst { case r: RowsEvent => r.rows.map(_.head) }.get
      assert(got === vals.toVector, s"fsp=$fsp")
    }
  }
}
