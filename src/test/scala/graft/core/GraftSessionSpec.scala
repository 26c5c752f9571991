package graft.core

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.binlog.BinlogWriter._

class GraftSessionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("registerTables: spark.sql works over every table incl. graft_dot") {
    GraftSession.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """select count(*) from lineitem join orders on l_orderkey = o_orderkey""")
      .head.getLong(0)
    assert(n > 0)
    val hours = spark.sql(
      "select count(distinct date_trunc('hour', ts)) from events").head.getLong(0)
    assert(hours > 0)
    val d = spark.sql(
      "select graft_dot(embedding, embedding) from embeddings limit 1").head.getDouble(0)
    assert(math.abs(d - 1.0) < 0.05)
  }

  test("registerChangeViews: per-table typed views from one binlog dir") {
    val dir = Files.createTempDirectory("multi-table")
    val colsA = Seq(ColSpec.int, ColSpec.varchar(20))
    val colsB = Seq(ColSpec.int, ColSpec.decimal(10, 2))
    new Writer()
      .writeFormatDescription(ts = 1000)
      .writeTableMap(1, "shop", "users", colsA, ts = 1000)
      .writeInsert(1, colsA, Seq(Seq(1, "ada"), Seq(2, "bob")), ts = 1000)
      .writeXid(1, ts = 1000)
      .writeTableMap(2, "shop", "prices", colsB, ts = 1001)
      .writeInsert(2, colsB, Seq(Seq(10, new java.math.BigDecimal("9.99"))), ts = 1001)
      .writeXid(2, ts = 1001)
      .save(dir.resolve("binlog.000001").toString)

    val views = GraftSession.registerChangeViews(spark, dir.toString, Map(
      "shop.users" -> "id INT, name STRING",
      "shop.prices" -> "id INT, price DECIMAL(10,2)"))
    assert(views.keySet === Set("shop_users_changes", "shop_prices_changes"))
    assert(spark.sql("select count(*) from shop_users_changes").head.getLong(0) === 2L)
    val price = spark.sql(
      "select price from shop_prices_changes where _delta_type = 'insert'").head.getDecimal(0)
    assert(price.compareTo(new java.math.BigDecimal("9.99")) === 0)
    // cross-view SQL: join the two change streams
    val joined = spark.sql(
      """select u.name, p.price from shop_users_changes u
        |join shop_prices_changes p on u.xid < p.xid""".stripMargin).count()
    assert(joined === 2L)
  }
}
