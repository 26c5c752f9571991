package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** sim14's Lloyd trainer: scale shape of the assignment stage (narrow —
  * no join, no corpus shuffle) and cluster recovery on crafted data. The
  * numeric exactness of the iterations is carried by the DuckDB oracle
  * (gate sim14_kmeans_train replays both iterations in SQL and
  * hash-matches).
  */
class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("assignment is a narrow per-row fold: centroids travel as literals, no join") {
    import spark.implicits._
    val scaled = spark.range(100)
      .selectExpr("id as vec_id", "array(id, id * 2, id * 3) as sv")
    val cents = Seq(0 -> Array(0L, 0L, 0L), 1 -> Array(99L, 198L, 297L))
    val assigned = Similarity.kmeansAssign(scaled, cents)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"assignment must not plan a join, got:\n$plan")
    assert(!plan.contains("Exchange"),
      s"assignment must not shuffle the corpus, got:\n$plan")
    // nearest-centroid sanity with exact integer distances
    val byId = assigned.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId(0L) === 0 && byId(99L) === 1)
    assert(byId(20L) === 0 && byId(80L) === 1)
  }

  test("two Lloyd iterations recover well-separated clusters from bad seeds") {
    import spark.implicits._
    // three tight 1-D clusters around 0, 1000, 2000 (padded to 2 dims);
    // seeds = the 3 smallest vec_ids all sit in the FIRST cluster, so
    // only the iteration updates can pull centroids apart
    val pts = (0 until 30).map { i =>
      val base = (i % 3) * 1000L
      (i.toLong, Seq(base + i / 3, base + i / 3))
    }
    val df = pts.toDF("vec_id", "sv")
    var cents: Seq[(Int, Array[Long])] = df.orderBy($"vec_id").limit(3).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Long](1).toArray) }.toSeq
    (1 to 4).foreach { _ =>
      cents = Similarity.kmeansStats(Similarity.kmeansAssign(df, cents))
        .collect().groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray)
        }
    }
    // the surviving centroids must sit in distinct clusters: every
    // centroid's first coordinate rounds to a distinct multiple of 1000
    val buckets = cents.map { case (_, arr) => (arr(0) + 500) / 1000 }
    assert(buckets.distinct.size === cents.size,
      s"centroids collapsed: ${cents.map(_._2.toSeq)}")
    assert(cents.size >= 2, "Lloyd updates must separate at least two clusters")
  }
}
