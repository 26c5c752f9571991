package graft.sources

import java.nio.file.Files
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.BinlogWriter._

/** Charset handling: latin1 is the reference-parity default
  * (`mysql_binlog.clj:537-544` hardcodes ISO-8859-1); the `charset`
  * option switches decode for utf8-logged databases.
  */
class CharsetSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.varchar(40))

  test("utf8 strings round-trip with charset=UTF-8; latin1 default mangles them") {
    val dir = Files.createTempDirectory("charset")
    new Writer(charset = StandardCharsets.UTF_8)
      .writeFormatDescription()
      .writeTableMap(23, "foo", "auto", cols)
      .writeInsert(23, cols, Seq(Seq(1, "héllo wörld — 你好")))
      .writeXid(1)
      .save(dir.resolve("binlog.000001").toString)

    def readWith(cs: Option[String]): String = {
      var r = spark.read.format("mysql-binlog").option("payloadDdl", "id INT, value STRING")
      cs.foreach(c => r = r.option("charset", c))
      r.load(dir.toString).select("value").head.getString(0)
    }
    assert(readWith(Some("UTF-8")) === "héllo wörld — 你好")
    // reference-parity default: latin1 decode of utf8 bytes differs (and is
    // byte-preserving: re-encoding gives the original bytes back)
    val latin1 = readWith(None)
    assert(latin1 !== "héllo wörld — 你好")
    assert(new String(latin1.getBytes(StandardCharsets.ISO_8859_1),
      StandardCharsets.UTF_8) === "héllo wörld — 你好")
  }
}
