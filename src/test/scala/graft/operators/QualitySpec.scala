package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The quality suite's two contracts: every declared row-local check
  * evaluates in ONE scan + aggregate (adding checks adds agg columns,
  * never passes), and each constraint counts exactly the rows that break
  * it on crafted edge data.
  */
class QualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def crafted = {
    import spark.implicits._
    Seq(
      (Some(1L), Some(10.0), Some("O"), Some("a@x.com")),
      (None, Some(-5.0), Some("F"), Some("bad")),          // null key, range, regex
      (Some(3L), None, Some("Z"), None),                   // null price (range), domain, null mail
      (Some(3L), Some(2e9), Some("P"), Some("c@y.org"))).  // range high
      toDF("k", "price", "status", "mail")
  }

  test("each constraint counts exactly its violating rows") {
    import spark.implicits._
    val rep = Quality.report(crafted, Seq(
      Quality.notNull("k_null", $"k"),
      Quality.inRange("price_range", $"price", 0.0, 1e6),
      Quality.inSet("status_domain", $"status", Seq("O", "F", "P")),
      Quality.matches("mail_shape", $"mail", "^[^@]+@[^@]+$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep === Map(
      "rows_total" -> 4L, "k_null" -> 1L, "price_range" -> 3L,
      "status_domain" -> 1L, "mail_shape" -> 2L))
  }

  test("the whole row-local suite is one scan + one aggregate") {
    import spark.implicits._
    val rep = Quality.report(crafted, Seq(
      Quality.notNull("k_null", $"k"),
      Quality.inRange("price_range", $"price", 0.0, 1e6),
      Quality.inSet("status_domain", $"status", Seq("O", "F", "P")),
      Quality.matches("mail_shape", $"mail", "^[^@]+@[^@]+$")))
    val plan = rep.queryExecution.executedPlan.toString
    // final + partial physical aggregate pair over ONE source = one pass;
    // a per-check job would show N scans
    assert(plan.split("LocalTableScan|FileScan").length - 1 === 1,
      s"expected exactly one scan, plan:\n$plan")
    assert(!plan.contains("Join"))
  }

  test("orphanCount is exact and zero on a complete parent set") {
    import spark.implicits._
    val child = Seq(1L, 2L, 2L, 9L, 9L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val n = Quality.orphanCount(child, "fk", parent, "pk", "fk_orphans")
      .collect().head
    assert(n.getString(0) === "fk_orphans" && n.getLong(1) === 3L)
    val clean = Quality.orphanCount(child.filter($"fk" < 3), "fk", parent, "pk", "c")
      .collect().head
    assert(clean.getLong(1) === 0L)
  }
}
