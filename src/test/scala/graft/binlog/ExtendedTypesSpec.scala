package graft.binlog

import java.nio.file.Files
import java.time.{LocalDate, LocalDateTime, LocalTime}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** Types beyond the reference's declared VARCHAR/INT/DECIMAL set (ids
  * enumerated at `mysql_binlog.clj:401-428` but decode throws at `:558`):
  * TINY, SHORT, LONGLONG, FLOAT, DOUBLE, DATE, TIME, DATETIME, TIMESTAMP,
  * YEAR, BLOB, BIT — decoder round-trips plus typed arrival through the
  * DSv2 source.
  */
class ExtendedTypesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("decoder round-trips date/time/datetime/blob/bit/numerics") {
    val cols = Seq(ColSpec.tiny, ColSpec.bigint, ColSpec.double,
      ColSpec.date, ColSpec.time, ColSpec.datetime, ColSpec.blob(2), ColSpec.bit(12))
    val row = Seq[Any](-5, 1234567890123L, 3.25,
      LocalDate.of(2024, 2, 29), LocalTime.of(23, 59, 58),
      LocalDateTime.of(1999, 12, 31, 23, 59, 59),
      Array[Byte](1, 2, 3, 0, -1), 0xABCL)
    val dir = Files.createTempDirectory("ext-types")
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(7, "d", "t", cols)
      .writeInsert(7, cols, Seq(row))
      .save(dir.resolve("binlog.000001").toString)
    val img = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent].rows.head
    assert(img(0) === -5)
    assert(img(1) === 1234567890123L)
    assert(img(2) === 3.25)
    assert(img(3) === LocalDate.of(2024, 2, 29))
    assert(img(4) === LocalTime.of(23, 59, 58))
    assert(img(5) === LocalDateTime.of(1999, 12, 31, 23, 59, 59))
    assert(img(6).asInstanceOf[Array[Byte]].toSeq === Seq[Byte](1, 2, 3, 0, -1))
    assert(img(7) === 0xABCL)
  }

  test("ENUM (ordinal) and SET (bitset) field decode (mysql_binlog.clj:528-536)") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.charset.StandardCharsets.ISO_8859_1
    def buf(bytes: Int*) =
      ByteBuffer.wrap(bytes.map(_.toByte).toArray).order(ByteOrder.LITTLE_ENDIAN)
    assert(BinlogReader.readType(buf(2), ColType.Enum, 1, ISO_8859_1) === 2)
    assert(BinlogReader.readType(buf(0x34, 0x12), ColType.Enum, 2, ISO_8859_1) === 0x1234)
    assert(BinlogReader.readType(buf(5, 1), ColType.Set, 2, ISO_8859_1)
      .asInstanceOf[Array[Byte]].toSeq === Seq[Byte](5, 1))
  }

  test("5.6+ temporals: DATETIME2/TIMESTAMP2/TIME2 with fractional seconds") {
    // big-endian packed formats + fsp frac tails — what every modern server
    // writes for new tables (the v1 temporals above only appear on pre-5.6
    // schemas)
    val cols = Seq(ColSpec.datetime2(6), ColSpec.datetime2(0), ColSpec.datetime2(3),
      ColSpec.timestamp2(4), ColSpec.time2(2), ColSpec.time2(0))
    val row = Seq[Any](
      LocalDateTime.of(2024, 2, 29, 23, 59, 58, 999999000),
      LocalDateTime.of(1970, 1, 1, 0, 0, 1),
      LocalDateTime.of(2099, 12, 31, 12, 0, 0, 123000000),
      LocalDateTime.of(2024, 6, 1, 8, 30, 15, 420000000), // ts2: epoch UTC
      LocalTime.of(13, 14, 15, 990000000),
      LocalTime.of(0, 0, 0))
    val dir = Files.createTempDirectory("v2-temporals")
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(8, "d", "t2", cols)
      .writeInsert(8, cols, Seq(row))
      .save(dir.resolve("binlog.000001").toString)
    val img = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent].rows.head
    assert(img(0) === LocalDateTime.of(2024, 2, 29, 23, 59, 58, 999999000))
    assert(img(1) === LocalDateTime.of(1970, 1, 1, 0, 0, 1))
    assert(img(2) === LocalDateTime.of(2099, 12, 31, 12, 0, 0, 123000000))
    assert(img(3) === LocalDateTime.of(2024, 6, 1, 8, 30, 15, 420000000))
    assert(img(4) === LocalTime.of(13, 14, 15, 990000000))
    assert(img(5) === LocalTime.of(0, 0, 0))
  }

  test("TIME2 durations beyond LocalTime: >= 24h and negative decode as Duration") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.charset.StandardCharsets.ISO_8859_1
    def be3(v: Long): ByteBuffer = ByteBuffer.wrap(Array(
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte))
      .order(ByteOrder.LITTLE_ENDIAN)
    // TIME '100:30:00' — legal MySQL TIME (range ±838:59:59)
    val big = be3(0x800000L + ((100L << 12) | (30L << 6) | 0L))
    assert(BinlogReader.readType(big, ColType.Time2, 0, ISO_8859_1) ===
      java.time.Duration.ofHours(100).plusMinutes(30))
    // TIME '-01:02:03' — signed offset-binary below the 0x800000 midpoint
    val neg = be3(0x800000L - ((1L << 12) | (2L << 6) | 3L))
    assert(BinlogReader.readType(neg, ColType.Time2, 0, ISO_8859_1) ===
      java.time.Duration.ofSeconds(-(3600L + 123L)))
    // in-range values still arrive as LocalTime
    val small = be3(0x800000L + ((13L << 12) | (14L << 6) | 15L))
    assert(BinlogReader.readType(small, ColType.Time2, 0, ISO_8859_1) ===
      LocalTime.of(13, 14, 15))
  }

  test("golden frac bytes: odd fsp (1/3/5) decode from hand-computed my_time.cc layouts") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.charset.StandardCharsets.ISO_8859_1
    def buf(bytes: Int*) =
      ByteBuffer.wrap(bytes.map(_.toByte).toArray).order(ByteOrder.LITTLE_ENDIAN)
    // The frac tail's unit follows the BYTE count (1 byte = micros/10000,
    // 2 = micros/100, 3 = micros), NOT 10^(6-fsp). Every byte below is
    // hand-derived from the format definition — no writer involved.
    //
    // DATETIME2(3) '2024-01-02 03:04:05.5':
    //   ym = 2024*13+1 = 26313; packed = 0x8000000000 +
    //   (26313<<22 | 2<<17 | 3<<12 | 4<<6 | 5) = 0x99B2443105
    //   frac (2 bytes) = 500000/100 = 5000 = 0x1388
    val dt3 = buf(0x99, 0xB2, 0x44, 0x31, 0x05, 0x13, 0x88)
    assert(BinlogReader.readType(dt3, ColType.Datetime2, 3, ISO_8859_1) ===
      LocalDateTime.of(2024, 1, 2, 3, 4, 5, 500000000))
    // DATETIME2(1), same instant: frac (1 byte) = 500000/10000 = 50 = 0x32
    val dt1 = buf(0x99, 0xB2, 0x44, 0x31, 0x05, 0x32)
    assert(BinlogReader.readType(dt1, ColType.Datetime2, 1, ISO_8859_1) ===
      LocalDateTime.of(2024, 1, 2, 3, 4, 5, 500000000))
    // TIMESTAMP2(5) epoch 0x1000000 = 16777216 (1970-07-14T04:20:16Z),
    // frac .12345 -> 123450 micros stored verbatim in 3 bytes = 0x01E23A
    val ts5 = buf(0x01, 0x00, 0x00, 0x00, 0x01, 0xE2, 0x3A)
    assert(BinlogReader.readType(ts5, ColType.Timestamp2, 5, ISO_8859_1) ===
      LocalDateTime.ofEpochSecond(16777216L, 123450000, java.time.ZoneOffset.UTC))
    // TIME2(1) '-00:00:00.2': packed = -200000; int part stored =
    // 0x800000 + (-200000 >> 24) = 0x7FFFFF; frac byte = -20 = 0xEC
    val t1 = buf(0x7F, 0xFF, 0xFF, 0xEC)
    assert(BinlogReader.readType(t1, ColType.Time2, 1, ISO_8859_1) ===
      java.time.Duration.ofMillis(-200))
    // TIME2(5) '-01:02:03.00045': magnitude = ((1<<12|2<<6|3)<<24) + 450
    // = 0x10830001C2; stored (6 bytes) = 0x800000000000 - 0x10830001C2
    // = 0x7FEF7CFFFE3E
    val t5 = buf(0x7F, 0xEF, 0x7C, 0xFF, 0xFE, 0x3E)
    assert(BinlogReader.readType(t5, ColType.Time2, 5, ISO_8859_1) ===
      java.time.Duration.ofSeconds(3723, 450000).negated())
    // TIME2(3) positive '13:14:15.456': int part = 0x800000 + 0xD38F;
    // frac (2 bytes) = 456000/100 = 4560 = 0x11D0
    val t3 = buf(0x80, 0xD3, 0x8F, 0x11, 0xD0)
    assert(BinlogReader.readType(t3, ColType.Time2, 3, ISO_8859_1) ===
      LocalTime.of(13, 14, 15, 456000000))
  }

  test("negative TIME2 with fractional seconds round-trips through the writer") {
    val cols = Seq(ColSpec.time2(2), ColSpec.time2(4), ColSpec.time2(6), ColSpec.time2(1))
    val row = Seq[Any](
      java.time.Duration.ofSeconds(-3723).minusMillis(260),      // -01:02:03.26
      java.time.Duration.ofSeconds(3723, 456700000).negated(),   // -01:02:03.4567
      java.time.Duration.ofSeconds(-(838L * 3600 + 59 * 60 + 58), -999999000), // near range min
      java.time.Duration.ofMillis(-200))                         // -00:00:00.2
    val dir = Files.createTempDirectory("time2-neg")
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(11, "d", "tn", cols)
      .writeInsert(11, cols, Seq(row))
      .save(dir.resolve("binlog.000001").toString)
    val img = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent].rows.head
    assert(img(0) === java.time.Duration.ofSeconds(-3723).minusMillis(260))
    assert(img(1) === java.time.Duration.ofSeconds(3723, 456700000).negated())
    assert(img(2) === java.time.Duration.ofSeconds(838L * 3600 + 59 * 60 + 58, 999999000).negated())
    assert(img(3) === java.time.Duration.ofMillis(-200))
  }

  test("ENUM/SET dictionary decode to labels through the source (SURVEY §1.2)") {
    val cols = Seq(ColSpec.int, ColSpec.enum(3), ColSpec.set(4))
    val dir = Files.createTempDirectory("enum-dict")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(7, "d", "t", cols, ts = 1000)
      .writeInsert(7, cols, Seq(
        Seq[Any](1, 2, 0x5L),  // ordinal 2 = silver; bits 0,2 = {a, c}
        Seq[Any](2, 0, 0x0L)), // ordinal 0 = MySQL '' pseudo-value; empty set
        ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val rows = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, tier STRING, tags ARRAY<STRING>")
      .option("enumDictionaries", "tier:bronze|silver|gold;tags:a|b|c|d")
      .load(dir.toString)
      .orderBy("id").collect()
    assert(rows(0).getAs[String]("tier") === "silver")
    assert(rows(0).getAs[Seq[String]]("tags") === Seq("a", "c"))
    assert(rows(1).getAs[String]("tier") === "")
    assert(rows(1).getAs[Seq[String]]("tags") === Seq.empty)
    // without dictionaries the raw ordinal surfaces (reference parity)
    val raw = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, tier INT, tags BINARY")
      .load(dir.toString)
      .orderBy("id").collect()
    assert(raw(0).getAs[Int]("tier") === 2)
    assert(raw(0).getAs[Array[Byte]]("tags").toSeq === Seq[Byte](5))
  }

  test("writer refuses checksum with a pre-5.6.1 server version") {
    val ex = intercept[IllegalArgumentException] {
      new Writer(checksum = true).writeFormatDescription(serverVersion = "5.1.0-custom")
    }
    assert(ex.getMessage.contains("5.6.1"))
  }

  test("GEOMETRY and JSON arrive as raw bytes (WKB / binary JSON)") {
    val cols = Seq(ColSpec.int, ColSpec(ColType.Geometry, 4), ColSpec(ColType.Json, 4))
    val wkb = Array[Byte](0, 0, 0, 0, 1, 1, 0, 0, 0) // srid prefix + wkb header-ish
    val jsb = Array[Byte](0, 1, 0, 12, 0)
    val dir = Files.createTempDirectory("geo-json")
    val path = new Writer()
      .writeFormatDescription()
      .writeTableMap(9, "d", "gj", cols)
      .writeInsert(9, cols, Seq(Seq[Any](1, wkb, jsb)))
      .save(dir.resolve("binlog.000001").toString)
    val img = BinlogReader.readBinlog(path).events(2).asInstanceOf[RowsEvent].rows.head
    assert(img(1).asInstanceOf[Array[Byte]].toSeq === wkb.toSeq)
    assert(img(2).asInstanceOf[Array[Byte]].toSeq === jsb.toSeq)
  }

  test("typed arrival through the source: DATETIME2(6) as TIMESTAMP with micros") {
    val cols = Seq(ColSpec.int, ColSpec.datetime2(6))
    val dir = Files.createTempDirectory("dt2-src")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(7, "d", "t", cols, ts = 1000)
      .writeInsert(7, cols, Seq(Seq[Any](1,
        LocalDateTime.of(2024, 2, 29, 12, 30, 0, 123456000))), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val r = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, dt TIMESTAMP")
      .load(dir.toString).head()
    assert(r.getAs[java.sql.Timestamp]("dt").toInstant.toString === "2024-02-29T12:30:00.123456Z")
  }

  test("typed arrival through the source: DATE/TIMESTAMP/BINARY/LONG columns") {
    val cols = Seq(ColSpec.int, ColSpec.date, ColSpec.datetime, ColSpec.blob(2), ColSpec.bit(12))
    val dir = Files.createTempDirectory("ext-src")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(7, "d", "t", cols, ts = 1000)
      .writeInsert(7, cols, Seq(Seq[Any](1, LocalDate.of(2024, 2, 29),
        LocalDateTime.of(2024, 2, 29, 12, 30, 0), Array[Byte](9, 8, 7), 5L)), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val df = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, d DATE, dt TIMESTAMP, payload BINARY, flags BIGINT")
      .load(dir.toString)
    val r = df.head()
    assert(r.getAs[java.sql.Date]("d").toString === "2024-02-29")
    assert(r.getAs[java.sql.Timestamp]("dt").toInstant.toString === "2024-02-29T12:30:00Z")
    assert(r.getAs[Array[Byte]]("payload").toSeq === Seq[Byte](9, 8, 7))
    assert(r.getAs[Long]("flags") === 5L)
  }
}
