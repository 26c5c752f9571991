package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.BinlogWriter._

/** The reference's JdbcClient session (`JdbcClient.java:39-58`), Spark-
  * native: open a blocking cursor on a binlog dir, consume rows as the
  * "database" appends to the log, close.
  */
class CdcClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cols = Seq(ColSpec.int, ColSpec.varchar(50))

  test("blocking cursor sees rows appended after open (select * from foo.auto)") {
    val dir = Files.createTempDirectory("cdc-client")
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(23, "foo", "auto", cols, ts = 1000)
      .writeInsert(23, cols, Seq(Seq(1, "X")), ts = 1000)
      .writeXid(1, ts = 1000)
    w.save(f1)

    val cur = CdcClient.openChanges(spark, dir.toString,
      "id INT, value STRING", "foo", "auto", deltaType = Some("insert"))
    try {
      val r1 = cur.next() // blocks until first micro-batch lands
      assert(r1.getAs[Int]("id") === 1 && r1.getAs[String]("value") === "X")

      // the "database" writes more rows while the cursor is open
      w.writeTableMap(23, "foo", "auto", cols, ts = 1001)
        .writeInsert(23, cols, Seq(Seq(2, "in ordnung")), ts = 1001)
        .writeXid(2, ts = 1001)
        .save(f1)

      val r2 = cur.next() // blocks until the appended txn is picked up
      assert(r2.getAs[Int]("id") === 2 && r2.getAs[String]("value") === "in ordnung")
    } finally cur.close()
    assert(!cur.hasNext) // closed cursor drains to empty
  }
}
