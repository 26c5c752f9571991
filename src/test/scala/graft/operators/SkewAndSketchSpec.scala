package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SkewAndSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of fact rows hit one hot key — the classic straggler shape
    val fact = spark.range(0, 100000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 100).as("k"),
        $"id".as("v"))
    val dim = spark.range(0, 100).select($"id".as("dk"), concat(lit("d"), $"id").as("name"))
    val plain = fact.join(dim, $"k" === $"dk")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val a = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val b = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).sum === 100000L)
  }

  test("approx_count_distinct stays within its configured error bound") {
    import spark.implicits._
    // q20's oracle-checkable form asserts the bound inside the query
    val r = Relational.q20ApproxDistinct(spark, "/root/testdata/sf0.01").head()
    assert(r.getAs[Boolean]("parts_within_5pct"), "parts sketch outside 5%")
    assert(r.getAs[Boolean]("orders_within_5pct"), "orders sketch outside 5%")
    // and the raw sketch values directly, at the configured rsd ~2%
    val raw = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01").agg(
      approx_count_distinct($"l_orderkey", 0.02).as("a"),
      countDistinct($"l_orderkey").as("e")).head()
    val (a, e) = (raw.getAs[Long]("a"), raw.getAs[Long]("e"))
    assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
  }
}
