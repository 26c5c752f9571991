package graft.binlog

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._
import MySqlJsonAst._

/** PARTIAL_UPDATE_ROWS (type 39, `binlog_row_value_options=PARTIAL_JSON`):
  * JSON after-images arriving as diff sequences apply against the
  * before-image to surface the FULL document. Pinned here: the AST
  * encoder round-trips against the independent text decoder (small and
  * large formats); REPLACE/INSERT/REMOVE semantics incl. nested paths;
  * a GOLDEN hand-assembled diff blob (no writer in the loop); mixed
  * partial/full rows through writer+reader; and the DSv2 path with
  * `jsonColumns` text decode.
  */
class PartialUpdateRowsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val doc = JObj(Vector(
    "id" -> JInt(7),
    "title" -> JStr("hello"),
    "tags" -> JArr(Vector(JStr("a"), JStr("b"))),
    "meta" -> JObj(Vector("views" -> JInt(70), "lang" -> JStr("en")))))

  test("AST encode round-trips through the independent text decoder") {
    val txt = MySqlJson.decodeToString(encode(doc))
    // server key order: (length, bytes) — id < meta < tags < title
    assert(txt ==
      """{"id":7,"meta":{"lang":"en","views":70},"tags":["a","b"],"title":"hello"}""")
    // decode(encode(x)) is identity up to key sorting
    assert(decode(encode(doc)) == JObj(Vector(
      "id" -> JInt(7),
      "meta" -> JObj(Vector("lang" -> JStr("en"), "views" -> JInt(70))),
      "tags" -> JArr(Vector(JStr("a"), JStr("b"))),
      "title" -> JStr("hello"))))
  }

  test("AST encode picks the large format past u16 limits and round-trips") {
    val big = JArr((0 until 9000).map(i => JStr(s"element-$i-padpadpad")).toVector)
    val enc = encode(big)
    assert((enc(0) & 0xff) == 0x03, "must be a LARGE array")
    assert(decode(enc) == big)
    // the text decoder agrees on a sample
    val txt = MySqlJson.decodeToString(enc)
    assert(txt.startsWith("""["element-0-padpadpad","""))
    assert(txt.endsWith(""""element-8999-padpadpad"]"""))
  }

  test("object key order is (length, memcmp of UTF-8 bytes), not UTF-16 order") {
    // both keys are 4 UTF-8 bytes; memcmp puts U+E000 (EE 80 80 + 'a')
    // before U+10000 (F0 90 80 80), while UTF-16 code-unit comparison
    // would order the surrogate pair (0xD800...) first
    val o = JObj(Vector("𐀀" -> JInt(1), "a" -> JInt(2)))
    assert(MySqlJson.decodeToString(encode(o)) == """{"a":2,"𐀀":1}""" ||
      decode(encode(o)).asInstanceOf[JObj].fields.map(_._1) ==
        Vector("a", "𐀀"))
    assert(decode(encode(o)).asInstanceOf[JObj].fields.map(_._1) ==
      Vector("a", "𐀀"))
  }

  test("diff semantics: replace, nested replace, array insert/append, remove") {
    val out = applyDiffs(doc, Seq(
      JsonDiff(DiffOp.Replace, "$.title", Some(JStr("hi"))),
      JsonDiff(DiffOp.Replace, "$.meta.views", Some(JInt(71))),
      JsonDiff(DiffOp.Insert, "$.tags[1]", Some(JStr("mid"))),
      JsonDiff(DiffOp.Insert, "$.tags[99]", Some(JStr("end"))), // past end: append
      JsonDiff(DiffOp.Remove, "$.meta.lang", None),
      JsonDiff(DiffOp.Insert, "$.meta.pinned", Some(JBool(true)))))
    // member order inside meta: (length, bytes) — "views"(5) < "pinned"(6)
    assert(MySqlJson.decodeToString(encode(out)) ==
      """{"id":7,"meta":{"views":71,"pinned":true},"tags":["a","mid","b","end"],"title":"hi"}""")
  }

  test("non-applicable diffs fail loudly (before-image/diff disagreement)") {
    assert(intercept[IllegalStateException](
      applyDiffs(doc, Seq(JsonDiff(DiffOp.Replace, "$.absent", Some(JNull)))))
      .getMessage.contains("absent"))
    assert(intercept[IllegalStateException](
      applyDiffs(doc, Seq(JsonDiff(DiffOp.Insert, "$.id", Some(JInt(1))))))
      .getMessage.contains("already present"))
    assert(intercept[IllegalStateException](
      applyDiffs(doc, Seq(JsonDiff(DiffOp.Remove, "$.tags[9]", None))))
      .getMessage.contains("past length"))
  }

  test("GOLDEN diff blob: hand-assembled bytes decode and apply (no writer in the loop)") {
    // before = {"a": 1}; diffs: REPLACE $.a -> 2, INSERT $.b -> "x"
    val before = encode(JObj(Vector("a" -> JInt(1))))
    val blob = new ByteArrayOutputStream()
    def packed(v: Int): Unit = blob.write(v) // all lengths < 251 here
    // diff 1: op REPLACE(0), path "$.a", value int16 2 = [0x05, 02 00]
    blob.write(0); packed(3); blob.write("$.a".getBytes("UTF-8"))
    packed(3); blob.write(Array[Byte](0x05, 2, 0))
    // diff 2: op INSERT(1), path "$.b", value string "x" = [0x0c, len 1, 'x']
    blob.write(1); packed(3); blob.write("$.b".getBytes("UTF-8"))
    packed(3); blob.write(Array[Byte](0x0c, 1, 'x'.toByte))
    val diffBytes = blob.toByteArray
    // wrap as the on-wire column value: 4-byte LE length + blob, behind a
    // 1-row partial event assembled via the writer's framing
    val cols = Seq(ColSpec.int, ColSpec.json)
    val dir = Files.createTempDirectory("pj-golden")
    val w = new Writer(rowsV2 = true)
      .writeFormatDescription()
      .writeTableMap(9, "d", "t", cols)
    // hand-build the type-39 event body to keep the GOLDEN bytes authoritative
    val body = new ByteArrayOutputStream()
    def le(n: Int, v: Long): Unit =
      (0 until n).foreach(i => body.write(((v >> (i * 8)) & 0xff).toInt))
    le(6, 9); le(2, 0); le(2, 2) // table id, flags, v2 extra-len
    body.write(2) // packed col count
    body.write(0x03); body.write(0x03) // used bitmaps (2 cols, before+after)
    body.write(0x00) // before nulls
    le(4, 1) // before col 0 (INT id = 1)
    le(4, before.length.toLong); body.write(before) // before col 1 (full JSON)
    body.write(0x01) // value_options: PARTIAL_JSON
    body.write(0x01) // partial_bits: json col 0 partial
    body.write(0x00) // after nulls
    le(4, 1) // after col 0
    le(4, diffBytes.length.toLong); body.write(diffBytes) // after col 1: diffs
    val hdr = new ByteArrayOutputStream()
    val evLen = 19L + body.size()
    (0 until 4).foreach(i => hdr.write(((1000L >> (i * 8)) & 0xff).toInt))
    hdr.write(EventType.PartialUpdateRows)
    (0 until 4).foreach(i => hdr.write(((1L >> (i * 8)) & 0xff).toInt))
    (0 until 4).foreach(i => hdr.write(((evLen >> (i * 8)) & 0xff).toInt))
    (0 until 4).foreach(i => hdr.write((((w.position + evLen) >> (i * 8)) & 0xff).toInt))
    hdr.write(0); hdr.write(0)
    val path = dir.resolve("binlog.000001").toString
    val f = new java.io.FileOutputStream(path)
    try { f.write(w.toBytes); f.write(hdr.toByteArray); f.write(body.toByteArray) }
    finally f.close()
    val re = BinlogReader.readBinlog(path).events.collectFirst { case r: RowsEvent => r }.get
    assert(re.isUpdate)
    assert(MySqlJson.decodeToString(re.afterRows.head(1).asInstanceOf[Array[Byte]]) ==
      """{"a":2,"b":"x"}""")
  }

  test("writer+reader: mixed partial and full after-images, full doc surfaces") {
    val cols = Seq(ColSpec.int, ColSpec.json)
    val before1 = encode(doc)
    val dir = Files.createTempDirectory("pj-rt")
    val p = dir.resolve("binlog.000001").toString
    new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription()
      .writeQuery("d", "BEGIN")
      .writeTableMap(9, "d", "t", cols)
      .writePartialUpdate(9, cols, Seq(
        (Seq[Any](1, before1),
         Seq[Any](1, PartialJson(Seq(
           JsonDiff(DiffOp.Replace, "$.meta.views", Some(JInt(71))),
           JsonDiff(DiffOp.Remove, "$.meta.lang", None))))),
        (Seq[Any](2, encode(JObj(Vector("k" -> JInt(5))))),
         Seq[Any](2, encode(JObj(Vector("k" -> JInt(6)))))))) // full after-image row
      .writeXid(42)
      .save(p)
    val re = BinlogReader.readBinlog(p).events.collectFirst { case r: RowsEvent => r }.get
    assert(MySqlJson.decodeToString(re.afterRows(0)(1).asInstanceOf[Array[Byte]]) ==
      """{"id":7,"meta":{"views":71},"tags":["a","b"],"title":"hello"}""")
    assert(MySqlJson.decodeToString(re.afterRows(1)(1).asInstanceOf[Array[Byte]]) ==
      """{"k":6}""")
  }

  test("DSv2 + jsonColumns: partial updates surface as full JSON text with xid") {
    val cols = Seq(ColSpec.int, ColSpec.json)
    val dir = Files.createTempDirectory("pj-dsv2")
    new Writer(checksum = true, rowsV2 = true)
      .writeFormatDescription()
      .writeQuery("d", "BEGIN")
      .writeTableMap(9, "d", "t", cols)
      .writePartialUpdate(9, cols, Seq(
        (Seq[Any](1, encode(doc)),
         Seq[Any](1, PartialJson(Seq(
           JsonDiff(DiffOp.Insert, "$.tags[2]", Some(JStr("c")))))))))
      .writeXid(42)
      .save(dir.resolve("binlog.000001").toString)
    val rows = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, doc STRING")
      .option("jsonColumns", "doc")
      .load(dir.toString)
      .selectExpr("_delta_type", "xid", "id", "doc")
      .collect().sortBy(_.getString(0))
    assert(rows.length == 2) // update-before + update
    val afterRow = rows.find(_.getString(0) == "update").get
    assert(afterRow.getLong(1) == 42L)
    assert(afterRow.getString(3) ==
      """{"id":7,"meta":{"lang":"en","views":70},"tags":["a","b","c"],"title":"hello"}""")
    val beforeRow = rows.find(_.getString(0) == "update-before").get
    assert(beforeRow.getString(3) ==
      """{"id":7,"meta":{"lang":"en","views":70},"tags":["a","b"],"title":"hello"}""")
  }
}
