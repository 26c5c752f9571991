package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class HeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("merge subtracts the (capacity+1)-th count — heavy items survive light merges") {
    val hh = new HeavyHitters(2, 2)
    // the mergeable-summaries reduction: pivot is the LARGEST EVICTED
    // count (1), not the smallest survivor (99) — otherwise one light
    // merge would slash x from 100 to ~2
    assert(hh.merge(Map("x" -> 100L, "y" -> 99L), Map("z" -> 1L)) ===
      Map("x" -> 99L, "y" -> 98L))
    // no overflow -> plain sum
    assert(hh.merge(Map("x" -> 3L), Map("x" -> 2L, "y" -> 1L)) ===
      Map("x" -> 5L, "y" -> 1L))
    // ties with the pivot drop out
    assert(hh.merge(Map("x" -> 5L, "y" -> 2L), Map("z" -> 2L)) === Map("x" -> 3L))
  }

  test("MG sketch surfaces every true heavy token within the error bound") {
    import spark.implicits._
    val toks = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split($"text", " ")).as("t"))
      .as[String]
    val n = toks.count()
    val capacity = 200
    val sketchTop = toks
      .repartition(8) // force multi-partition partials + merge
      .select(new HeavyHitters(capacity, 20).toColumn.name("top"))
      .head()

    val exact = toks.groupBy($"t").count()
      .orderBy($"count".desc, $"t").limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    val sketchMap = sketchTop.toMap
    exact.foreach { case (tok, c) =>
      assert(sketchMap.contains(tok), s"true heavy hitter '$tok' missing from sketch")
      assert(math.abs(sketchMap(tok) - c) <= n / capacity + 1,
        s"'$tok' sketch=${sketchMap(tok)} exact=$c bound=${n / capacity}")
    }
  }
}
