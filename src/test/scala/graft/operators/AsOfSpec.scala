package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("as-of picks latest prior row; equal time counts; no prior -> null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"), (2L, 10L, "q1"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 8L, "r8"), (1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "rX"))
      .toDF("k", "t", "v")
    val out = AsOf.join(left, right, "k", "t", Seq("v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 5L, "p0", null),    // nothing at or before t=5
      (1L, 10L, "p1", "r10"),  // equal time counts (<= semantics)
      (1L, 20L, "p2", "r15"),  // latest prior, not first
      (2L, 10L, "q1", null)))  // key with no right rows at all
  }

  test("forward as-of picks earliest following row; equal time counts; none -> null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 30L, "p3"), (2L, 10L, "q1"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, "r10"), (1L, 25L, "r25"), (3L, 1L, "rX"))
      .toDF("k", "t", "v")
    val out = AsOf.joinForward(left, right, "k", "t", Seq("v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 10L, "p1", "r10"),  // equal time counts (>= semantics)
      (1L, 20L, "p2", "r25"),  // earliest following, not last
      (1L, 30L, "p3", null),   // nothing at or after t=30
      (2L, 10L, "q1", null)))  // key with no right rows at all
  }

  test("multiple carried columns") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 7L, "a", 1.5), (1L, 9L, "b", 2.5)).toDF("k", "t", "s", "d")
    val r = AsOf.join(left, right, "k", "t", Seq("s", "d")).head()
    assert(r.getAs[String]("s") === "b" && r.getAs[Double]("d") === 2.5)
  }
}
