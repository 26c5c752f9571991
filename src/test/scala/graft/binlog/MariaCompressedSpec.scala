package graft.binlog

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import BinlogWriter._

/** MariaDB `log_bin_compress=ON` (>= 10.2): QUERY_COMPRESSED (165) and the
  * per-event zlib rows events (166-168). The compressed rows body is the
  * v1 layout behind a plain (table_id, flags) post-header — decode
  * inflates once and shares the row loop, so a compressed twin must
  * produce byte-identical change rows to its uncompressed ground truth.
  */
class MariaCompressedSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(20))
  private val ddl = "id INT, val DECIMAL(12,4), word STRING"

  /** Same logical content, compressed vs plain rows events. */
  private def logDir(compressed: Boolean): String = {
    val dir = Files.createTempDirectory(s"maria-comp-$compressed")
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1, serverVersion = "10.6.14-MariaDB-log")
      .writeMariaGtidList(Nil, ts = 1)
      .writeMariaGtid(0L, 1L, ts = 2)
      .writeTableMap(11, "shop", "orders", cols, ts = 2)
    val ins = (0 until 200).map(i =>
      Seq[Any](i, new JBigDecimal(s"$i.5000"), s"w$i"))
    val upd = (0 until 40).map(i =>
      (Seq[Any](i, new JBigDecimal(s"$i.5000"), s"w$i"),
       Seq[Any](i, new JBigDecimal(s"$i.7500"), s"u$i")))
    val del = (0 until 10).map(i => Seq[Any](i, new JBigDecimal(s"$i.7500"), s"u$i"))
    if (compressed)
      w.writeInsertCompressed(11, cols, ins, ts = 2)
        .writeUpdateCompressed(11, cols, upd, ts = 2)
        .writeDeleteCompressed(11, cols, del, ts = 2)
    else
      w.writeInsert(11, cols, ins, ts = 2)
        .writeUpdate(11, cols, upd, ts = 2)
        .writeDelete(11, cols, del, ts = 2)
    w.writeXid(9, ts = 2)
      .save(dir.resolve("binlog.000001").toString)
    dir.toString
  }

  test("compressed rows events decode to the uncompressed twin's change rows") {
    def content(dir: String): Seq[String] =
      spark.read.format("mysql-binlog").option("payloadDdl", ddl)
        .load(dir)
        .selectExpr("log_seq", "_delta_type", "xid", "id", "CAST(val AS STRING)", "word")
        .collect().map(_.mkString("|")).sorted.toSeq
    val (comp, plain) = (content(logDir(compressed = true)),
      content(logDir(compressed = false)))
    assert(comp.nonEmpty && comp === plain)
  }

  test("events mode names the compressed rows family") {
    val names = spark.read.format("mysql-binlog").option("mode", "events")
      .load(logDir(compressed = true)).select("event_type")
      .collect().map(_.getString(0)).toSet
    assert(names.contains("WRITE_ROWS_COMPRESSED_EVENT_V1"))
    assert(names.contains("UPDATE_ROWS_COMPRESSED_EVENT_V1"))
    assert(names.contains("DELETE_ROWS_COMPRESSED_EVENT_V1"))
  }

  test("QUERY_COMPRESSED decodes and still classifies transaction boundaries") {
    val dir = Files.createTempDirectory("maria-qcomp")
    // a non-transactional group: compressed BEGIN + rows + compressed
    // COMMIT (no XID) — the flush must come from the decompressed SQL
    new Writer(checksum = true)
      .writeFormatDescription(ts = 1, serverVersion = "10.6.14-MariaDB-log")
      .writeQueryCompressed("shop", "BEGIN", ts = 2)
      .writeTableMap(11, "shop", "orders", cols, ts = 2)
      .writeInsert(11, cols, Seq(Seq[Any](1, new JBigDecimal("10.5000"), "ok")), ts = 2)
      .writeQueryCompressed("shop", "COMMIT", ts = 2)
      .save(dir.resolve("binlog.000001").toString)
    val rows = spark.read.format("mysql-binlog").option("payloadDdl", ddl)
      .load(dir.toString).selectExpr("_delta_type", "id").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "insert" &&
      rows.head.getInt(1) == 1)
    val sqls = spark.read.format("mysql-binlog").option("mode", "events")
      .load(dir.toString).where("event_type = 'QUERY_COMPRESSED_EVENT'")
      .select("sql").collect().map(_.getString(0)).toSeq
    assert(sqls === Seq("BEGIN", "COMMIT"))
  }

  test("unknown compression algorithm fails by name") {
    // alg bits live at 4-6 (ctrl = 0x80 | alg << 4 | lenlen): 0x91 is
    // alg = 1 — the value a 0xe0-style mask check would wave through to
    // the inflater as "zlib"
    for (ctrl <- Seq(0x91, 0xa1, 0xf1)) {
      val ex = intercept[IllegalStateException] {
        val bad = java.nio.ByteBuffer.wrap(Array(ctrl.toByte, 1, 0))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        BinlogReader.mariaUncompress(bad, 3L)
      }
      assert(ex.getMessage.contains("algorithm"), s"ctrl=0x${ctrl.toHexString}")
    }
    val ex2 = intercept[IllegalStateException] {
      val bad = java.nio.ByteBuffer.wrap(Array(0x01.toByte, 1, 0))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      BinlogReader.mariaUncompress(bad, 3L)
    }
    assert(ex2.getMessage.contains("bit 7"))
  }

  test("micro-batch boundaries never split a compressed-QUERY transaction") {
    // several txns framed by QUERY_COMPRESSED BEGIN/COMMIT (no XID), read
    // with a tiny byte budget: if lastSafePos failed to classify type 165,
    // a batch could end right after a compressed BEGIN and the split
    // transaction's rows would surface from the uncommitted-tail flush —
    // all rows must arrive exactly once across the micro-batches
    val dir = Files.createTempDirectory("maria-qcomp-stream")
    val w = new Writer(checksum = true)
      .writeFormatDescription(ts = 1, serverVersion = "10.6.14-MariaDB-log")
    (0 until 20).foreach { t =>
      w.writeQueryCompressed("shop", "BEGIN", ts = 2)
        .writeTableMap(11, "shop", "orders", cols, ts = 2)
        .writeInsert(11, cols, (0 until 10).map(k =>
          Seq[Any](t * 10 + k, new JBigDecimal(s"$t.5000"), s"w$t")), ts = 2)
        .writeQueryCompressed("shop", "COMMIT", ts = 2)
    }
    w.save(dir.resolve("binlog.000001").toString)
    val q = spark.readStream.format("mysql-binlog")
      .option("payloadDdl", ddl)
      .option("maxBytesPerTrigger", "700")
      .load(dir.toString)
      .writeStream.format("memory").queryName("maria_qcomp_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("maria_qcomp_mem").select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(ids === (0 until 200))
    } finally q.stop()
  }

  test("corrupt declared length fails by name before allocating") {
    // 4-byte BE length 0xfffffff0 (~4 GB) over a 2-byte payload: must be
    // named corrupt, not attempted as an allocation — and lengths >= 2^31
    // must not surface as NegativeArraySizeException via toInt overflow
    val rec = Array[Byte]((0x80 | 4).toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xf0.toByte, 1, 2)
    val ex = intercept[IllegalStateException] {
      BinlogReader.mariaUncompress(
        java.nio.ByteBuffer.wrap(rec).order(java.nio.ByteOrder.LITTLE_ENDIAN),
        rec.length.toLong)
    }
    assert(ex.getMessage.contains("corrupt uncompressed-length"))
  }

  test("truncated zlib stream fails by name, not with garbage rows") {
    // a valid record, then cut the deflate stream short
    val data = Array.fill[Byte](64)(7)
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf)
    d.end()
    val rec = Array[Byte]((0x80 | 1).toByte, 64.toByte) ++ buf.take(n / 2)
    val ex = intercept[IllegalStateException] {
      BinlogReader.mariaUncompress(
        java.nio.ByteBuffer.wrap(rec).order(java.nio.ByteOrder.LITTLE_ENDIAN),
        rec.length.toLong)
    }
    assert(ex.getMessage.toLowerCase.contains("zlib") ||
      ex.getMessage.contains("inflated"))
  }
}
