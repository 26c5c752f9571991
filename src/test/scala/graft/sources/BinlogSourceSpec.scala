package graft.sources

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.BinlogWriter._

/** End-to-end tests of the mysql-binlog DataSource V2 — batch, SQL
  * conformance (the reference's own demo query, `jdbc.clj:117`), filter
  * pushdown, and the micro-batch stream incl. rotation and checkpoint
  * restart (SURVEY §5).
  */
class BinlogSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("binlog-source-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val fooAutoCols = Seq(ColSpec.int, ColSpec.varchar(50))

  private def fixtureDir(): Path = Files.createTempDirectory("binlog-e2e")

  private def writeConformanceFixture(dir: Path): String = {
    // inserts + one update + one delete on foo.auto, plus a second table
    // that must be filtered out by pushdown
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 1000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1000)
      .writeInsert(23, fooAutoCols, Seq(Seq(1, "X"), Seq(2, "in ordnung")), ts = 1000)
      .writeXid(100, ts = 1000)
      .writeQuery("bar", "BEGIN", ts = 1001)
      .writeTableMap(24, "bar", "other", fooAutoCols, ts = 1001)
      .writeInsert(24, fooAutoCols, Seq(Seq(9, "noise")), ts = 1001)
      .writeXid(101, ts = 1001)
      .writeQuery("foo", "BEGIN", ts = 1002)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1002)
      .writeUpdate(23, fooAutoCols, Seq((Seq(1, "X"), Seq(1, "Y"))), ts = 1002)
      .writeDelete(23, fooAutoCols, Seq(Seq(2, "in ordnung")), ts = 1002)
      .writeXid(102, ts = 1002)
      .save(dir.resolve("binlog.000001").toString)
  }

  test("batch read: typed payload, envelope, xid from commit") {
    val dir = fixtureDir()
    writeConformanceFixture(dir)
    val df = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, value STRING")
      .option("database", "foo").option("table", "auto")
      .load(dir.toString)
    val rows = df.orderBy("log_pos", "log_seq").collect()
    assert(rows.map(_.getAs[String]("_delta_type")).toSeq ===
      Seq("insert", "insert", "update-before", "update", "delete"))
    val first = rows.head
    assert(first.getAs[String]("db") === "foo")
    assert(first.getAs[String]("table") === "auto")
    assert(first.getAs[Int]("id") === 1)
    assert(first.getAs[String]("value") === "X")
    assert(first.getAs[Long]("xid") === 100L)
    // update/delete belong to xid 102
    assert(rows.last.getAs[Long]("xid") === 102L)
    // event-time carried through (seconds -> timestamp, UTC)
    assert(first.getAs[java.sql.Timestamp]("ts").getTime === 1000L * 1000)
  }

  test("conformance query via spark.sql (jdbc.clj:117)") {
    val dir = fixtureDir()
    writeConformanceFixture(dir)
    spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, value STRING")
      .load(dir.toString)
      .createOrReplaceTempView("cdc")
    val out = spark.sql(
      """select * from cdc where db = 'foo' and `table` = 'auto' and _delta_type = 'insert'""")
      .collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("value")).sorted.toSeq === Seq("X", "in ordnung"))
  }

  test("filter pushdown reaches the scan (db/table/_delta_type)") {
    val dir = fixtureDir()
    writeConformanceFixture(dir)
    val df = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, value STRING")
      .load(dir.toString)
      .filter(col("db") === "foo" && col("table") === "auto" && col("_delta_type") === "insert")
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("db=Some(foo)") && scanDesc.contains("table=Some(auto)")
      && scanDesc.contains("delta=Some(insert)"), scanDesc)
    assert(df.count() === 2)
  }

  test("dynamic payload mode: positional string row with '_' for unused") {
    val dir = fixtureDir()
    writeConformanceFixture(dir)
    val df = spark.read.format("mysql-binlog").load(dir.toString)
      .filter(col("table") === "auto" && col("_delta_type") === "insert")
    val row = df.orderBy("log_pos").select("row").head.getSeq[String](0)
    assert(row === Seq("1", "X"))
  }

  test("events mode: raw event stream with sql text and xid") {
    val dir = fixtureDir()
    writeConformanceFixture(dir)
    val df = spark.read.format("mysql-binlog").option("mode", "events").load(dir.toString)
    val types = df.orderBy("log_pos").select("event_type").collect().map(_.getString(0))
    assert(types.head === "FORMAT_DESCRIPTION_EVENT")
    assert(types.count(_ == "QUERY_EVENT") === 3)
    assert(types.count(_ == "XID_EVENT") === 3)
    val sqls = df.filter(col("sql").isNotNull).select("sql").collect().map(_.getString(0))
    assert(sqls.forall(_ == "BEGIN"))
  }

  test("decimal payload decodes to DecimalType") {
    val dir = fixtureDir()
    val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(50))
    new Writer()
      .writeFormatDescription()
      .writeTableMap(42, "bench", "big", cols)
      .writeInsert(42, cols, Seq(Seq(1, new JBigDecimal("12345678.9999"), "w")))
      .writeXid(1)
      .save(dir.resolve("binlog.000001").toString)
    val df = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, val DECIMAL(12,4), word STRING")
      .load(dir.toString)
    val v = df.select("val").head.getDecimal(0)
    assert(v.compareTo(new JBigDecimal("12345678.9999")) === 0)
  }

  test("streaming: micro-batches, rotation across files, exactly-once restart") {
    val dir = fixtureDir()
    val f1 = dir.resolve("binlog.000001").toString
    val f2 = dir.resolve("binlog.000002").toString
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1000)
      .writeInsert(23, fooAutoCols, Seq(Seq(1, "a")), ts = 1000)
      .writeXid(1, ts = 1000)
      .writeRotate("binlog.000002", ts = 1000)
      .save(f1)
    new Writer()
      .writeFormatDescription(ts = 2000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 2000)
      .writeInsert(23, fooAutoCols, Seq(Seq(2, "b"), Seq(3, "c")), ts = 2000)
      .writeXid(2, ts = 2000)
      .save(f2)

    val checkpoint = Files.createTempDirectory("binlog-ckpt").toString
    val outDir = Files.createTempDirectory("binlog-sink").toString
    def runStream(): Long = {
      // parquet sink (supports checkpoint recovery; also the realistic
      // CDC-to-lake landing path)
      val stream = spark.readStream.format("mysql-binlog")
        .option("payloadDdl", "id INT, value STRING")
        .load(dir.toString)
      val q = stream.writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).count()
    }
    assert(runStream() === 3L) // both files, rotation crossed

    // append more rows to file 2, restart from checkpoint: only new rows
    val w2 = new Writer()
      .writeFormatDescription(ts = 2000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 2000)
      .writeInsert(23, fooAutoCols, Seq(Seq(2, "b"), Seq(3, "c")), ts = 2000)
      .writeXid(2, ts = 2000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 2001)
      .writeInsert(23, fooAutoCols, Seq(Seq(4, "d")), ts = 2001)
      .writeXid(3, ts = 2001)
    w2.save(f2)
    assert(runStream() === 4L) // 3 old (still in memory sink) + 1 new only
  }

  test("streaming torn tail: incomplete event held back, emitted once complete") {
    val dir = fixtureDir()
    val f1 = dir.resolve("binlog.000001").toString
    val w = new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1000)
      .writeInsert(23, fooAutoCols, Seq(Seq(1, "a")), ts = 1000)
      .writeXid(1, ts = 1000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1001)
      .writeInsert(23, fooAutoCols, Seq(Seq(2, "bb")), ts = 1001)
      .writeXid(2, ts = 1001)
    w.saveTruncated(f1, 7) // last XID half-written

    val checkpoint = Files.createTempDirectory("torn-ckpt").toString
    val outDir = Files.createTempDirectory("torn-sink").toString
    def run(name: String): Long = {
      val q = spark.readStream.format("mysql-binlog")
        .option("payloadDdl", "id INT, value STRING")
        .load(dir.toString)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).count()
    }
    // the second insert is complete on disk but its XID is torn; the offset
    // stops before the torn event, so the insert of id=2 is held back
    assert(run("torn1") === 1L)
    w.save(f1) // now complete
    assert(run("torn2") === 2L)
  }

  test("attachRowsQuery: per-statement SQL attribution, null after txn boundary") {
    val dir = fixtureDir()
    // txn 1 (real server order — ROWS_QUERY precedes its statement's
    // TABLE_MAP): two statements, each with its own ROWS_QUERY, XID
    // commit. txn 2: ends with QUERY(COMMIT) — non-transactional-engine
    // shape, no XID — so its rows flush with xid null. txn 3: the server
    // logged no ROWS_QUERY (feature off) -> rows_query null, never
    // inherited across either boundary kind.
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 1000)
      .writeRowsQuery("INSERT INTO foo.auto VALUES (1, 'a')", ts = 1000)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1000)
      .writeInsert(23, fooAutoCols, Seq(Seq[Any](1, "a")), ts = 1000)
      .writeRowsQuery("UPDATE foo.auto SET v = 'z' WHERE id = 1", ts = 1000)
      .writeUpdate(23, fooAutoCols, Seq(
        (Seq[Any](1, "a"), Seq[Any](1, "z"))), ts = 1000)
      .writeXid(7, ts = 1000)
      .writeQuery("foo", "BEGIN", ts = 1001)
      .writeRowsQuery("INSERT INTO foo.auto VALUES (2, 'b')", ts = 1001)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1001)
      .writeInsert(23, fooAutoCols, Seq(Seq[Any](2, "b")), ts = 1001)
      .writeQuery("foo", "COMMIT", ts = 1001)
      .writeQuery("foo", "BEGIN", ts = 1002)
      .writeTableMap(23, "foo", "auto", fooAutoCols, ts = 1002)
      .writeInsert(23, fooAutoCols, Seq(Seq[Any](3, "c")), ts = 1002)
      .writeXid(9, ts = 1002)
      .save(dir.resolve("binlog.000001").toString)
    val got = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, v STRING")
      .option("attachRowsQuery", "true")
      .load(dir.toString)
      .select("_delta_type", "id", "rows_query", "xid")
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getString(2),
          if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)))).toSeq
    assert(got === Seq(
      ("insert", 1, "INSERT INTO foo.auto VALUES (1, 'a')", 7L: java.lang.Long),
      ("update-before", 1, "UPDATE foo.auto SET v = 'z' WHERE id = 1", 7L: java.lang.Long),
      ("update", 1, "UPDATE foo.auto SET v = 'z' WHERE id = 1", 7L: java.lang.Long),
      ("insert", 2, "INSERT INTO foo.auto VALUES (2, 'b')", null),
      ("insert", 3, null, 9L: java.lang.Long)))
    // without the option the schema is unchanged (no rows_query column)
    val plain = spark.read.format("mysql-binlog")
      .option("payloadDdl", "id INT, v STRING")
      .load(dir.toString)
    assert(!plain.columns.contains("rows_query"))
  }
}
