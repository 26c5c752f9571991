package graft.binlog

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** MySQL binary JSON (json_binary.h) → JSON text. Golden vectors are
  * hand-assembled from the public format description — no encoder
  * round-trip anywhere.
  */
class MySqlJsonSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("scalar docs: literals, ints, uint64, double, string") {
    assert(MySqlJson.decodeToString(bytes(0x04, 0x00)) === "null")
    assert(MySqlJson.decodeToString(bytes(0x04, 0x01)) === "true")
    assert(MySqlJson.decodeToString(bytes(0x04, 0x02)) === "false")
    assert(MySqlJson.decodeToString(bytes(0x05, 0xFF, 0xFF)) === "-1")
    assert(MySqlJson.decodeToString(bytes(0x06, 0xFF, 0xFF)) === "65535")
    assert(MySqlJson.decodeToString(bytes(0x07, 0x2A, 0x00, 0x00, 0x00)) === "42")
    assert(MySqlJson.decodeToString(
      bytes(0x09, 0xFE, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF)) === "-2")
    assert(MySqlJson.decodeToString(
      bytes(0x0A, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF)) === "18446744073709551615")
    // 1.5 = IEEE 0x3FF8000000000000, little-endian
    assert(MySqlJson.decodeToString(
      bytes(0x0B, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xF8, 0x3F)) === "1.5")
    assert(MySqlJson.decodeToString(bytes(0x0C, 0x03, 'a', 'b', 'c')) === "\"abc\"")
  }

  // {"a":1,"b":[true,"x"]} — small object, hand-laid-out:
  //   count=2, size=32; key entries (off 18,len 1)(off 19,len 1);
  //   value entries: (0x05 inline 1)(0x02 offset 20); keys "a","b";
  //   nested small array at 20: count=2, size=12,
  //   entries (0x04 inline true)(0x0C offset 10), "x" at 10.
  private val goldenObj = bytes(
    0x02, 0x00, 0x20, 0x00,
    0x12, 0x00, 0x01, 0x00, 0x13, 0x00, 0x01, 0x00,
    0x05, 0x01, 0x00,
    0x02, 0x14, 0x00,
    'a', 'b',
    0x02, 0x00, 0x0C, 0x00, 0x04, 0x01, 0x00, 0x0C, 0x0A, 0x00, 0x01, 'x')

  test("nested object/array golden vector") {
    assert(MySqlJson.decodeToString(Array(0x00.toByte) ++ goldenObj) ===
      """{"a":1,"b":[true,"x"]}""")
  }

  test("large object (4-byte offsets) golden vector") {
    // {"k":"v"} in the LARGE format: count/size/offsets are u32;
    // header = 4+4 + (4+2 key entry) + (1+4 value entry) = 19;
    // key "k" at 19, string value at 20; total size = 22 = 0x16
    val doc = bytes(0x01,
      0x01, 0x00, 0x00, 0x00, 0x16, 0x00, 0x00, 0x00,
      0x13, 0x00, 0x00, 0x00, 0x01, 0x00,
      0x0C, 0x14, 0x00, 0x00, 0x00,
      'k', 0x01, 'v')
    assert(MySqlJson.decodeToString(doc) === """{"k":"v"}""")
  }

  test("large array with inlined int32") {
    // type 0x03: count=1 (u32), size=13 (u32), entry (0x07 inline 42)
    val doc = bytes(0x03,
      0x01, 0x00, 0x00, 0x00, 0x0D, 0x00, 0x00, 0x00,
      0x07, 0x2A, 0x00, 0x00, 0x00)
    assert(MySqlJson.decodeToString(doc) === "[42]")
  }

  test("large array past 64 KiB: u32 offsets beyond the u16 range decode") {
    // 1000 strings x 100 chars => value entries point past 0xFFFF, which
    // only the 4-byte large-format offsets can express. Assembled directly
    // from json_binary.h's layout (count u32, size u32, [type u8, offset
    // u32] entries, then varint-length string blobs) — no encoder.
    val n = 1000
    val strs = (0 until n).map(i => f"$i%04d" + "x" * 96)
    val blobs = strs.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val headerLen = 8 + 5 * n
    val total = headerLen + blobs.map(_.length + 1).sum
    assert(total > 0x10000, "fixture must actually exceed 64 KiB")
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = (0 until 4).foreach(k => bb.write((v >> (8 * k)) & 0xff))
    bb.write(0x03) // document type: large array
    u32(n); u32(total)
    var off = headerLen
    blobs.foreach { b => bb.write(0x0C); u32(off); off += 1 + b.length }
    blobs.foreach { b => bb.write(b.length); bb.write(b) }
    val expected = strs.map(s => "\"" + s + "\"").mkString("[", ",", "]")
    assert(MySqlJson.decodeToString(bb.toByteArray) === expected)
  }

  test("opaque NEWDECIMAL decodes through MySqlDecimal") {
    val dec = MySqlDecimal.encode(new java.math.BigDecimal("12.5"), 4, 1)
    val doc = bytes(0x0F, 0xF6, dec.length + 2) ++ bytes(4, 1) ++ dec
    assert(MySqlJson.decodeToString(doc) === "12.5")
  }

  test("string escaping: quotes, backslashes, control chars") {
    val s = "a\"b\\c\nd"
    val utf = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val doc = bytes(0x0C, utf.length) ++ utf
    assert(MySqlJson.decodeToString(doc) === "\"a\\\"b\\\\c\\nd\"")
  }

  test("JSON columns arrive as text through the source (jsonColumns option)") {
    val cols = Seq(ColSpec.int, ColSpec(ColType.Json, 4))
    val dir = Files.createTempDirectory("json-src")
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(7, "d", "t", cols, ts = 1000)
      .writeInsert(7, cols, Seq(Seq[Any](1, Array(0x00.toByte) ++ goldenObj)), ts = 1000)
      .writeXid(1, ts = 1000)
      .save(dir.resolve("binlog.000001").toString)
    val r = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, doc STRING")
      .option("jsonColumns", "doc")
      .load(dir.toString).head()
    assert(r.getAs[String]("doc") === """{"a":1,"b":[true,"x"]}""")
    // Spark's JSON functions compose on the decoded text
    import spark.implicits._
    import org.apache.spark.sql.functions.get_json_object
    val v = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, doc STRING")
      .option("jsonColumns", "doc")
      .load(dir.toString)
      .select(get_json_object($"doc", "$.b[1]").as("x")).head()
    assert(v.getAs[String]("x") === "x")
  }
}
